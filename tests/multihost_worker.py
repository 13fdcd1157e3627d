"""One process of a 2-process jax.distributed CPU dryrun.

Spawned by tests/test_multihost.py:  python multihost_worker.py PORT PID OUT
Each process owns 4 virtual CPU devices; init_multihost joins them into one
8-device world and render_whitted_multihost traces a tiny frame over the
global (dp, sp) mesh — the multi-host flow SURVEY.md §5.8 claims (the
reference is single-host rayon, src/main.rs:1090; this is its pod-scale
generalization).  The rendered image is saved for the parent to compare
against the unsharded single-process render.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    import numpy as np

    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.parallel.mesh import (
        init_multihost,
        make_render_mesh,
        render_whitted_multihost,
    )
    from raytracer_tpu.scene.presets import PRESETS, demo_camera

    init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    scene, textures = PRESETS["01-spheres"]()
    camera = demo_camera()
    cfg = RenderConfig(width=16, height=8, depth=2, tile_rays=128)
    mesh = make_render_mesh()  # all 8 global devices -> (dp=4, sp=2)
    img, stats = render_whitted_multihost(scene, textures, camera, cfg, mesh)
    assert stats["dropped"] == 0, stats
    assert stats["casts"] > 0, stats
    np.savez(out, img=np.asarray(img), casts=stats["casts"])
    print(f"worker {pid}: ok casts={stats['casts']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
