"""End-to-end Whitted parity: wavefront tracer vs the recursive oracle."""

import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import render_whitted
from raytracer_tpu.scene.presets import demo_camera, demo_scene, spheres_scene

from tests.oracle import OracleWorld


def _compare(img, ref, max_bad_frac=0.02, atol=4e-3, rtol=0.03):
    img = np.asarray(img, np.float64)
    diff = np.abs(img - ref)
    bad = diff > (atol + rtol * np.abs(ref))
    bad_px = bad.any(axis=-1)
    frac = bad_px.mean()
    assert frac <= max_bad_frac, (
        f"{frac:.3%} pixels differ; worst {diff.max():.4f} at "
        f"{np.unravel_index(diff.argmax(), diff.shape)}"
    )


def test_whitted_spheres_depth1_matches_oracle():
    scene, textures = spheres_scene()
    world = OracleWorld(scene, textures)
    cfg = RenderConfig(width=24, height=18, depth=1, tile_rays=24 * 18)
    img, stats = render_whitted(scene, textures, demo_camera(), cfg)
    ref = world.render_whitted(demo_camera(), cfg.width, cfg.height, depth=1)
    assert stats["dropped"] == 0
    _compare(img, ref)


def test_whitted_demo_depth3_matches_oracle():
    scene, textures = demo_scene()
    world = OracleWorld(scene, textures)
    cfg = RenderConfig(width=20, height=15, depth=3, tile_rays=20 * 15)
    img, stats = render_whitted(scene, textures, demo_camera(), cfg)
    ref = world.render_whitted(demo_camera(), cfg.width, cfg.height, depth=3)
    assert stats["dropped"] == 0
    # glass TIR paths are touchy in f32; allow a slightly larger bad fraction
    _compare(img, ref, max_bad_frac=0.04)


def test_whitted_demo_depth5_runs_and_counts():
    scene, textures = demo_scene()
    cfg = RenderConfig(width=16, height=12, depth=5, tile_rays=16 * 12)
    img, stats = render_whitted(scene, textures, demo_camera(), cfg)
    assert np.isfinite(np.asarray(img)).all()
    assert stats["dropped"] == 0
    # at least one cast per primary ray, plus shadow/bounce amplification
    assert stats["casts"] > stats["primary_rays"] * 2


def test_render_step_matches_separate_calls():
    """render_step (whitted + epoch in one dispatch) must be semantically
    identical to render_whitted followed by render_distributed_epoch with
    the same key."""
    import jax

    from raytracer_tpu.render import (
        render_distributed_epoch,
        render_step,
        render_whitted,
    )
    from raytracer_tpu.scene.presets import demo_camera, demo_scene

    scene, textures = demo_scene()
    cfg = RenderConfig(width=16, height=12, depth=3, tile_rays=16 * 12)
    key = jax.random.PRNGKey(9)
    img1, stats1 = render_whitted(scene, textures, demo_camera(), cfg)
    ph1, mstats1 = render_distributed_epoch(scene, textures, demo_camera(),
                                            cfg, key)
    img2, ph2, stats2 = render_step(scene, textures, demo_camera(), cfg, key)
    # one fused program lets XLA pick different fusions -> last-ulp drift
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ph1), np.asarray(ph2),
                               rtol=2e-4, atol=1e-6)
    assert stats2["casts"] == stats1["casts"] + mstats1["casts"]
    assert stats2["dropped"] == stats1["dropped"]
    assert stats2["filtered"] == mstats1["filtered"]


def test_render_steps_batched_matches_per_step_calls():
    """render_steps (K steps fused in one dispatch, the bench harness path)
    must equal K render_step calls with the same per-step folded keys:
    identical last-step images, counters summed over steps."""
    import jax

    from raytracer_tpu.render import render_step, render_steps
    from raytracer_tpu.scene.presets import demo_camera, demo_scene

    scene, textures = demo_scene()
    cfg = RenderConfig(width=16, height=12, depth=3, tile_rays=16 * 12)
    key = jax.random.PRNGKey(4)
    n_steps = 3
    img_b, ph_b, stats_b = render_steps(
        scene, textures, demo_camera(), cfg, key, n_steps
    )
    casts = dropped = filtered = 0
    for i in range(n_steps):
        img_i, ph_i, st = render_step(
            scene, textures, demo_camera(), cfg, jax.random.fold_in(key, i)
        )
        casts += st["casts"]
        dropped += st["dropped"]
        filtered += st["filtered"]
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_i),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ph_b), np.asarray(ph_i),
                               rtol=2e-4, atol=1e-6)
    assert stats_b["casts"] == casts
    assert stats_b["dropped"] == dropped == 0
    assert stats_b["filtered"] == filtered
    assert stats_b["steps"] == n_steps


def test_render_epochs_matches_per_epoch_calls():
    """render_epochs (K MC epochs accumulated in one dispatch — the bench's
    headline workload, the reference's progressive loop main.rs:1129-1156)
    must equal the sum of K render_distributed_epoch calls with the same
    per-epoch folded keys, with counters summed."""
    import jax

    from raytracer_tpu.render import render_distributed_epoch, render_epochs
    from raytracer_tpu.scene.presets import demo_camera, demo_scene

    scene, textures = demo_scene()
    cfg = RenderConfig(width=16, height=12, depth=3, tile_rays=16 * 12)
    key = jax.random.PRNGKey(9)
    n_epochs = 3
    accum, stats = render_epochs(
        scene, textures, demo_camera(), cfg, key, n_epochs
    )
    total = np.zeros((cfg.height, cfg.width, 3), np.float32)
    casts = filtered = 0
    for i in range(n_epochs):
        ph, st = render_distributed_epoch(
            scene, textures, demo_camera(), cfg, jax.random.fold_in(key, i)
        )
        total += np.asarray(ph)
        casts += st["casts"]
        filtered += st["filtered"]
    np.testing.assert_allclose(np.asarray(accum), total,
                               rtol=2e-4, atol=1e-6)
    assert stats["casts"] == casts
    assert stats["filtered"] == filtered
    assert stats["epochs"] == n_epochs
