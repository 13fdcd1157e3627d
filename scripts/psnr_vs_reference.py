"""Fidelity vs the reference's own golden render.

The reference's de-facto goldens are the PNGs under /root/reference/report/
(report/Report.md:19-45); the headline one is report/out.png — the full
schedule of src/main.rs:1084-1173 (1280x960, depth 5, Whitted pass + 100
stochastic epochs, percentile-renormalized each epoch).

This runner renders that exact schedule with raytracer_tpu and scores the
result against the golden:

  * raw PSNR in 8-bit sRGB space — saturated by MC noise (the golden is
    itself ONE noise realization of a 100-sample estimator), so it bounds
    from below;
  * noise-averaged PSNR: both images box-downsampled k x k (k=4, 8) before
    comparison, averaging the independent per-pixel MC noise away so the
    number measures structural/spectral agreement.

Usage:
  python scripts/psnr_vs_reference.py                    # render + score
  python scripts/psnr_vs_reference.py --use artifacts/out.png   # score only
  python scripts/psnr_vs_reference.py --epochs 20 --out /tmp/o.png

Scores are written to artifacts/PSNR.json (committed) so the regression
test (tests/test_reference_golden.py) can pin them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = "/root/reference/report/out.png"


def psnr_u8(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR between two u8 RGB images (dB)."""
    assert a.shape == b.shape, (a.shape, b.shape)
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0 / np.sqrt(mse)))


def box_down(img: np.ndarray, k: int) -> np.ndarray:
    """k x k box average (float) — averages independent MC pixel noise."""
    h, w = img.shape[0] // k * k, img.shape[1] // k * k
    x = img[:h, :w].astype(np.float64)
    return x.reshape(h // k, k, w // k, k, 3).mean(axis=(1, 3))


def psnr_down(a: np.ndarray, b: np.ndarray, k: int) -> float:
    da, db = box_down(a, k), box_down(b, k)
    mse = np.mean((da - db) ** 2)
    return float(20.0 * np.log10(255.0 / np.sqrt(mse))) if mse else float("inf")


def score(render_path: str, golden_path: str = GOLDEN) -> dict:
    from raytracer_tpu.utils.png import read_png_rgb8

    got = read_png_rgb8(render_path)
    ref = read_png_rgb8(golden_path)
    return {
        "render": render_path,
        "golden": golden_path,
        "shape": list(got.shape),
        "psnr_raw_db": round(psnr_u8(got, ref), 2),
        "psnr_down4_db": round(psnr_down(got, ref, 4), 2),
        "psnr_down8_db": round(psnr_down(got, ref, 8), 2),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--use", default=None, metavar="PNG",
                   help="score an existing render instead of rendering")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--out", default=os.path.join(REPO, "artifacts", "out.png"))
    p.add_argument("--golden", default=GOLDEN)
    p.add_argument("--json", default=os.path.join(REPO, "artifacts", "PSNR.json"))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.use is None:
        from raytracer_tpu.config import RenderConfig
        from raytracer_tpu.parallel.progressive import render_progressive
        from raytracer_tpu.scene.presets import demo_camera, demo_scene
        from raytracer_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()
        scene, textures = demo_scene()
        cfg = RenderConfig(width=1280, height=960, depth=5, epochs=args.epochs)
        t0 = time.time()
        render_progressive(scene, textures, demo_camera(), cfg,
                           out_path=args.out, seed=args.seed)
        print(f"full schedule ({args.epochs} epochs): {time.time() - t0:.1f}s")
        render_path = args.out
    else:
        render_path = args.use

    result = score(render_path, args.golden)
    result["epochs"] = args.epochs if args.use is None else None
    print(json.dumps(result, indent=2))
    if args.json:
        os.makedirs(os.path.dirname(args.json), exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
