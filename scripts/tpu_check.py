#!/usr/bin/env python
"""TPU-vs-golden consistency check.

The test suite runs on CPU (jnp + Pallas interpret mode); the compiled
Mosaic kernels only execute on real hardware.  This script renders a small
whitted frame on the current accelerator and compares it against the
committed CPU golden (tests/golden/whitted_demo_64x48.npy), catching
compiled-kernel divergence the CPU suite cannot see.

    python scripts/tpu_check.py            # render + compare (any backend)
    python scripts/tpu_check.py --update   # regenerate the golden (CPU!)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "whitted_demo_64x48.npy",
)


def render():
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.render import render_whitted
    from raytracer_tpu.scene.presets import demo_camera, demo_scene
    from raytracer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    scene, textures = demo_scene()
    cfg = RenderConfig(width=64, height=48, depth=5, tile_rays=64 * 48)
    img, stats = render_whitted(scene, textures, demo_camera(), cfg)
    assert stats["dropped"] == 0, f"pool overflow: {stats}"
    return np.asarray(img)


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    peak = max(float(b.max()), 1e-6)
    return 10 * np.log10(peak * peak / mse)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true",
                    help="regenerate the golden on the CPU backend")
    # Compiled Mosaic kernels and the CPU path diverge in fp order
    # (broadcast vs matmul contractions, rsqrt/pow approximations), which
    # flips discrete branches (TIR boundaries, speculars) on isolated
    # pixels: measured 42 dB PSNR with 0.6% of pixels >0.1 off — scattered
    # singles, not regions.  A real kernel bug shows up as structured
    # region-level differences and a PSNR collapse.
    ap.add_argument("--min-psnr", type=float, default=38.0)
    ap.add_argument("--max-bad-frac", type=float, default=0.02,
                    help="max fraction of pixels with channel diff > 0.1")
    args = ap.parse_args()

    if args.update:
        import jax

        jax.config.update("jax_platforms", "cpu")
        img = render()
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.save(GOLDEN, img)
        print(f"golden written: {GOLDEN} mean={img.mean():.4f}")
        return 0

    import jax

    img = render()
    golden = np.load(GOLDEN)
    p = psnr(img, golden)
    bad = float((np.abs(img - golden).max(axis=-1) > 0.1).mean())
    ok = p >= args.min_psnr and bad <= args.max_bad_frac
    print(
        f"backend={jax.default_backend()} psnr_vs_cpu_golden={p:.1f} dB "
        f"bad_pixel_frac={bad:.4f} "
        f"({'OK' if ok else 'FAIL'}; thresholds {args.min_psnr} dB / "
        f"{args.max_bad_frac})"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
