"""Command-line driver.

The reference has no CLI — everything is hardcoded in main()
(src/main.rs:809-1174).  This exposes the same schedule (Whitted pass, then
progressive stochastic epochs, PNG after every epoch) with the reference's
defaults, plus the knobs SURVEY.md §5.6 calls for.

    python -m raytracer_tpu --scene demo --epochs 100 --out out.png
"""

from __future__ import annotations

import argparse
import sys

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.parallel.progressive import render_progressive
from raytracer_tpu.scene.presets import PRESETS, demo_camera


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="raytracer_tpu", description=__doc__)
    p.add_argument("--scene", default="demo", choices=sorted(PRESETS.keys()))
    p.add_argument("--scene-file", default=None, metavar="JSON",
                   help="load a JSON scene (scene/serialize.py format) "
                        "instead of a preset; its camera is used if present")
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=960)
    p.add_argument("--depth", type=int, default=5)
    p.add_argument("--epochs", type=int, default=100,
                   help="stochastic epochs after the Whitted pass (0 = Whitted only)")
    p.add_argument("--focus", type=float, default=3.0)
    p.add_argument("--blur", type=float, default=0.04)
    p.add_argument("--out", default="out.png")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", default=None,
                   help="npz path for epoch-granular resume")
    p.add_argument("--tile-rays", type=int, default=1 << 16)
    p.add_argument("--obj", default=None, help="override dodecahedron OBJ path")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="device-trace the render into DIR and print the top"
                        " HLO ops afterwards (jax.profiler / xprof)")
    p.add_argument("--devices", type=int, default=0, metavar="N",
                   help="shard over the first N devices as a (dp, sp) mesh "
                        "(0 = single-device path)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (test mode; the reference "
                        "hints at NaN issues by filtering non-normal "
                        "photons, SURVEY.md §5.2)")
    p.add_argument("--warm-cache", action="store_true",
                   help="compile the render programs for this config into "
                        "the persistent compile cache (tiny 1-epoch run, "
                        "no PNG), then exit — bounds first-run latency on "
                        "machines where cold compiles go through a remote "
                        "compile service (minutes)")
    return p


def main(argv=None) -> int:
    import os

    if os.environ.get("RAYTPU_FORCE_CPU"):
        # This container's sitecustomize preloads a TPU tunnel backend;
        # plain env vars are too late, jax.config is not.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from raytracer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        depth=args.depth,
        epochs=args.epochs,
        focus=args.focus,
        blur=args.blur,
        tile_rays=args.tile_rays,
    )
    if args.scene_file:
        from raytracer_tpu.scene.serialize import load_scene_file

        scene, textures, camera = load_scene_file(args.scene_file)
        if camera is None:
            camera = demo_camera()
    else:
        preset = PRESETS[args.scene]
        try:
            scene, textures = preset(obj_path=args.obj)  # type: ignore[call-arg]
        except TypeError:
            scene, textures = preset()
        camera = demo_camera()
    mesh = None
    if args.devices:
        from raytracer_tpu.parallel.mesh import make_render_mesh

        mesh = make_render_mesh(args.devices)
        print(f"mesh: {dict(mesh.shape)}")
    if args.warm_cache:
        # Compile (and cache) exactly the programs the real run will use
        # (the whitted frame and the fused epoch step at THIS config) by
        # running a 1-epoch schedule to a temp file.  The persistent
        # compile cache keys on the HLO, which does not depend on the
        # epoch count, so the full run later hits the cache.
        import dataclasses
        import os as _os
        import tempfile
        import time

        tmp = _os.path.join(tempfile.gettempdir(), "raytpu_warm.png")
        t0 = time.time()
        render_progressive(
            scene, textures, camera, dataclasses.replace(cfg, epochs=1),
            out_path=tmp, seed=args.seed, mesh=mesh, log=lambda m: None,
        )
        print(f"warm-cache: programs compiled+cached in "
              f"{time.time() - t0:.1f}s")
        return 0
    if args.profile:
        from raytracer_tpu.utils.profiling import print_profile, profile_trace

        with profile_trace(args.profile):
            render_progressive(
                scene, textures, camera, cfg,
                out_path=args.out, seed=args.seed,
                checkpoint_path=args.checkpoint, mesh=mesh,
            )
        print_profile(args.profile)
    else:
        render_progressive(
            scene, textures, camera, cfg,
            out_path=args.out, seed=args.seed, checkpoint_path=args.checkpoint,
            mesh=mesh,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
