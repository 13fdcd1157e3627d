"""A/B the whitted-ladder knobs against the strict whitted+MC step rate
(round 5: whitted_mc_step_mrays_per_sec has sat below the 100 north star
for three rounds; the ladder's compaction scatters and the zombie-laden
tail pool are the named suspects, docs/PERF.md).

Variants are RenderConfig fields, so no kernel recompiles beyond one per
variant: compact_group coarsens the compaction scatter (fewer rows, one
per group — needs capacity headroom, dropped must stay 0), tail/deep
capacity trades pool width against occupancy.

    python scripts/exp_step_tuning.py [--steps 5] [--reps 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()

    from raytracer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax

    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.render import render_steps
    from raytracer_tpu.scene.presets import demo_camera, demo_scene
    from raytracer_tpu.utils.device import wait_for_device

    wait_for_device()
    scene, textures = demo_scene()
    camera = demo_camera()
    base = RenderConfig(width=args.size, height=args.size, depth=5,
                        tile_rays=1 << 16)
    key = jax.random.PRNGKey(0)

    variants = {
        "base": {},
        "group32_narrow": {"compact_group": 32, "tail_capacity": 1.25,
                           "tail_slack": 4096},
        "group32_narrow2": {"compact_group": 32, "tail_capacity": 1.25,
                            "tail_slack": 4096, "deep_capacity": 1.3,
                            "deep_slack": 4096},
        "group64_narrow": {"compact_group": 64, "tail_capacity": 1.25,
                           "tail_slack": 8192},
    }
    out = {}
    for name, kw in variants.items():
        cfg = dataclasses.replace(base, **kw)
        try:
            render_steps(scene, textures, camera, cfg, key, args.steps)
        except Exception as e:
            log(f"{name}: FAILED {e}")
            out[name] = None
            continue
        best = 0.0
        for r in range(args.reps):
            t0 = time.time()
            _, _, st = render_steps(
                scene, textures, camera, cfg,
                jax.random.fold_in(key, 100 + r), args.steps,
            )
            dt = time.time() - t0
            best = max(best, st["casts"] / dt / 1e6)
        out[name] = {"mrays": round(best, 1), "dropped": int(st["dropped"])}
        log(f"{name}: {out[name]}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
