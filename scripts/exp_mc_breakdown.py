"""Decompose the MC mega-kernel's epoch time by ablation (round 5).

The roofline (utils/roofline.py) says the dense MC path runs at ~9% of
the VPU sweep-arithmetic ceiling; PERF.md attributes the loss to dead
lanes, non-sweep per-bounce work and ILP, but no measurement splits the
per-bounce work itself.  This script times the 10-epoch batched headline
workload with individual components STUBBED OUT (wrong image, honest
timing), so the per-component share of the bounce is measured instead of
estimated:

  full       baseline (the bench's headline path)
  noshadow   shadow occlusion sweeps skipped (lights never blocked)
  nomarch    interior march skipped (refract lanes die at the surface)
  nolobe     lobe-sample transcendentals (acos/pow) replaced by copies
  nomat      per-bounce material table lookups reduced to constants

Each variant recompiles (jax.clear_caches between variants).  Results to
stderr + one JSON line; run on an idle host (1 CPU here — nothing else
running) with the real chip attached.

    python scripts/exp_mc_breakdown.py [--epochs 10] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--variants", default="full,noshadow,nomarch,nolobe,nomat")
    ap.add_argument("--mesh", type=int, default=0, metavar="GRID",
                    help="ablate the binned blocked path on mesh_scene(GRID)"
                         " instead of the dense demo scene")
    args = ap.parse_args()

    from raytracer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.ops import kernel_common as kc
    from raytracer_tpu.render import render_epochs
    from raytracer_tpu.scene.presets import demo_camera, demo_scene
    from raytracer_tpu.utils.device import wait_for_device

    wait_for_device()
    if args.mesh:
        from raytracer_tpu.scene.presets import mesh_scene

        scene, textures, camera = mesh_scene(grid=args.mesh)
    else:
        scene, textures = demo_scene()
        camera = demo_camera()
    cfg = RenderConfig(width=args.size, height=args.size, depth=5,
                       tile_rays=1 << 16)
    key = jax.random.PRNGKey(0)

    import raytracer_tpu.ops.mc_binned as mb

    saved = dict(
        blocked_multi=kc._ShadowSweep.blocked_multi,
        blocked_multi_b=kc._BlockedShadowSweep.blocked_multi,
        march_rows=kc.march_rows,
        acos=kc.acos,
        powf=kc.powf,
        eval_material=kc.eval_material,
        sort_state=mb._sort_state,
    )

    def patch(name):
        # restore baseline first
        kc._ShadowSweep.blocked_multi = saved["blocked_multi"]
        kc._BlockedShadowSweep.blocked_multi = saved["blocked_multi_b"]
        kc.march_rows = saved["march_rows"]
        kc.acos = saved["acos"]
        kc.powf = saved["powf"]
        kc.eval_material = saved["eval_material"]
        mb._sort_state = saved["sort_state"]
        if name == "noshadow":
            def no_sweep(self, rays):
                shape = (1, self.px.shape[1])
                return [jnp.zeros(shape, jnp.int32) != 0 for _ in rays]

            kc._ShadowSweep.blocked_multi = no_sweep
            kc._BlockedShadowSweep.blocked_multi = no_sweep
        elif name == "nosort":
            mb._sort_state = (
                lambda state, lo, inv_extent, u_step, mats, cop: state
            )
        elif name == "nomarch":
            def no_march(px, py, pz, nx0, ny0, nz0, dx0, dy0, dz0, k, want,
                         tri, sph, n_tri, n_sph, max_distance, max_retries,
                         tri_T=None, sweep_fn=None):
                shape = (1, px.shape[1])
                z = jnp.zeros(shape, jnp.float32)
                return dict(escaped=jnp.zeros(shape, jnp.int32) != 0,
                            travel=z, ex=px, ey=py, ez=pz,
                            odx=dx0, ody=dy0, odz=dz0,
                            prim=jnp.full(shape, -1, jnp.int32),
                            iters=jnp.zeros(shape, jnp.int32))

            kc.march_rows = no_march
        elif name == "nolobe":
            kc.acos = lambda x: x
            kc.powf = lambda b, e: b
        elif name == "nomat":
            def cheap_mat(mat, textures, obj, u, v, mat_T=None):
                one = jnp.ones((1, obj.shape[1]), jnp.float32)
                half = one * 0.5
                return dict(dr=half, dg=half, db=half, shiness=half,
                            sr=half, sg=half, sb=half, smoothness=half,
                            transparency=one * 0.1, refraction=one * 1.2,
                            decay=half, tnx=one * 0.0, tny=one * 0.0,
                            tnz=one)

            kc.eval_material = cheap_mat

    from raytracer_tpu.render import render_distributed_epoch as rde

    out = {}
    for name in args.variants.split(","):
        patch(name)
        jax.clear_caches()
        t0 = time.time()
        if args.mesh:  # single-epoch dispatches (batching loses here)
            rde(scene, textures, camera, cfg, key)[0].block_until_ready()
        else:
            render_epochs(scene, textures, camera, cfg, key, args.epochs)
        log(f"{name}: compile+first {time.time() - t0:.1f}s")
        best = 1e9
        for r in range(args.reps):
            t0 = time.time()
            if args.mesh:
                _, st = rde(scene, textures, camera, cfg,
                            jax.random.fold_in(key, 100 + r))
                dt = time.time() - t0
            else:
                _, st = render_epochs(scene, textures, camera, cfg,
                                      jax.random.fold_in(key, 100 + r),
                                      args.epochs)
                dt = (time.time() - t0) / args.epochs
            best = min(best, dt)
        out[name] = round(best * 1e3, 2)
        log(f"{name}: {out[name]} ms/epoch (casts={st['casts']})")
    patch("full")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
