"""Per-phase profile of the full reference schedule's epoch loop.

VERDICT r3 weak #2: the driver-captured 1280x960 per-epoch schedule
regressed 44 -> 93 s between the round-3 builder's measurement and the
driver's bench run, with nothing in the repo explaining where the time
went.  This script reproduces a slice of that schedule (default 20
epochs) with the epoch pipeline instrumented: per epoch it separates

  dispatch   — jit call returning device futures (host-side trace cost)
  fetch      — np.asarray(packed): tunnel transfer of the u8 frame
  writer     — PNG encode (+ checkpoint when enabled), on the main
               thread here so it can be timed (the real driver overlaps
               it on the writer thread; if writer > dispatch+fetch the
               pipeline is writer-bound and per-epoch wall ~= writer)

so a regression can be pinned to device work, tunnel bandwidth, or
host-side output cost.  Prints one JSON line with the phase medians.

    python scripts/profile_schedule.py [--epochs 20] [--png-every 1]
"""

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--png-every", type=int, default=1)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=960)
    args = ap.parse_args()

    from raytracer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import numpy as np

    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.parallel.progressive import (
        _epoch_group_packed,
        _epoch_step_packed,
        write_png_atomic,
    )
    from raytracer_tpu.render import _tiled_clips, render_whitted
    from raytracer_tpu.scene.presets import demo_camera, demo_scene
    from raytracer_tpu.utils.device import wait_for_device

    wait_for_device()
    print(f"devices: {jax.devices()}", flush=True)
    cfg = RenderConfig(width=args.width, height=args.height, depth=5,
                       epochs=args.epochs, tile_rays=1 << 16)
    scene, textures = demo_scene()
    camera = demo_camera()

    t0 = time.time()
    img, _ = render_whitted(scene, textures, camera, cfg)
    img.block_until_ready()
    print(f"whitted compile+frame: {time.time() - t0:.1f}s", flush=True)

    clips_tiled, _, inv = _tiled_clips(cfg, block_order=False)
    base_key = jax.random.PRNGKey(0)
    out_png = os.path.join(tempfile.gettempdir(), "profile_schedule.png")

    k = args.png_every
    disp, dev, fetch, writer, total = [], [], [], [], []
    epoch = 0
    while epoch < args.epochs:
        kk = max(1, min(k, args.epochs - epoch))
        t_all = time.time()
        t = time.time()
        if kk > 1:
            img, packed = _epoch_group_packed(
                scene, camera, clips_tiled, img, base_key, epoch, textures,
                cfg, inv, kk,
            )
        else:
            img, packed = _epoch_step_packed(
                scene, camera, clips_tiled, img, base_key, epoch, textures,
                cfg, inv,
            )
        d_disp = time.time() - t
        t = time.time()
        packed.block_until_ready()  # device compute done
        d_dev = time.time() - t
        t = time.time()
        host = np.asarray(packed)  # transfer only
        d_fetch = time.time() - t
        t = time.time()
        write_png_atomic(
            out_png, host[:-8].reshape(cfg.height, cfg.width, 3)
        )
        d_writer = time.time() - t
        d_total = time.time() - t_all
        epoch += kk
        if epoch > kk:  # skip the compile epoch
            disp.append(d_disp)
            dev.append(d_dev)
            fetch.append(d_fetch)
            writer.append(d_writer)
            total.append(d_total)
        print(
            f"epoch {epoch}: dispatch {d_disp * 1e3:.0f} ms, "
            f"device {d_dev * 1e3:.0f} ms, fetch {d_fetch * 1e3:.0f} ms, "
            f"writer {d_writer * 1e3:.0f} ms, total {d_total * 1e3:.0f} ms",
            flush=True,
        )

    med = lambda xs: round(statistics.median(xs), 4) if xs else None
    out = {
        "epochs": args.epochs,
        "png_every": k,
        "dispatch_s": med(disp),
        "device_s": med(dev),
        "fetch_s": med(fetch),
        "writer_s": med(writer),
        "serial_epoch_s": med(total),
        "note": ("real driver overlaps writer on a thread; pipelined "
                 "epoch wall ~= max(dispatch+fetch, writer)"),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
