"""Multi-host (multi-process) mesh dryrun — SURVEY.md §5.8.

Two subprocesses, each with 4 virtual CPU devices, join via
jax.distributed.initialize (parallel/mesh.py::init_multihost) into one
8-device world and render the same tiny Whitted frame over the global
(dp, sp) mesh.  Both processes must agree with each other AND with the
unsharded single-process render — the multi-host layer is pure data
plumbing around the same compiled computation.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # two-process jax.distributed world

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_whitted_matches_single_process(tmp_path):
    try:
        port = _free_port()
    except OSError:
        pytest.skip("no local ports available")
    outs = [str(tmp_path / f"w{i}.npz") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), outs[i]],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

    a, b = (np.load(o) for o in outs)
    np.testing.assert_array_equal(a["img"], b["img"])
    assert int(a["casts"]) == int(b["casts"]) > 0

    # single-process unsharded reference (this pytest process: CPU,
    # 8 virtual devices via conftest — the renderer only uses one here)
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.render import render_whitted
    from raytracer_tpu.scene.presets import PRESETS, demo_camera

    scene, textures = PRESETS["01-spheres"]()
    cfg = RenderConfig(width=16, height=8, depth=2, tile_rays=128)
    ref, stats = render_whitted(scene, textures, demo_camera(), cfg)
    np.testing.assert_allclose(a["img"], np.asarray(ref), atol=1e-5)
    assert int(a["casts"]) == stats["casts"]
