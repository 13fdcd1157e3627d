"""Fused Whitted level kernel vs the jnp wavefront level.

Same wavefront structure either way; differences are f32 op ordering
(near-tie winners, TIR boundaries) which may flip an isolated lane's
branch, so the comparison requires near-total pixel agreement plus
matching cast/drop counters (up to those rare flips).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops import intersect
from raytracer_tpu.ops.camera import shoot
from raytracer_tpu.ops.trace import trace_whitted
from raytracer_tpu.render import clip_coords
from raytracer_tpu.scene.presets import demo_camera, demo_scene, spheres_scene


def _trace(mode, scene, textures, o, d, cfg):
    intersect.set_pallas_mode(mode)
    try:
        return trace_whitted(scene, textures, o, d, cfg)
    finally:
        intersect.set_pallas_mode("auto")


@pytest.mark.parametrize("scene_fn", [demo_scene, spheres_scene])
@pytest.mark.heavy  # exhaustive interpret-mode parity; quick tier keeps a small-shape guard
def test_fused_level_matches_jnp_whitted(scene_fn):
    scene, textures = scene_fn()
    cam = demo_camera()
    clips = jnp.asarray(clip_coords(32, 24))
    o, d = shoot(cam, clips)
    cfg = RenderConfig(width=32, height=24, depth=5)

    ref = _trace("0", scene, textures, o, d, cfg)
    got = _trace("interpret", scene, textures, o, d, cfg)

    a, b = np.asarray(got.color), np.asarray(ref.color)
    close = np.all(np.abs(a - b) <= 1e-3 + 2e-2 * np.abs(b), axis=-1)
    # Disagreeing pixels are razor-edge shadow ties: the hit position's
    # last-ulp rounding (FMA chain vs matmul) decides whether a grazing
    # shadow ray re-hits the floor's COPLANAR sibling triangle at t ~ 0+.
    # The reference's exclusion-instead-of-epsilon design (main.rs:190-200)
    # has this same measure-zero edge; its scalar fp lands on one side.
    assert close.mean() >= 0.97, f"only {close.mean():.4f} of pixels agree"
    # tie pixels weigh heavily in a 768-pixel frame; the fraction (and so
    # the mean gap) shrinks with resolution
    np.testing.assert_allclose(a.mean(axis=0), b.mean(axis=0), rtol=0.08,
                               atol=8e-3)
    assert abs(int(got.casts) - int(ref.casts)) <= max(
        0.01 * int(ref.casts), 16
    ), (int(got.casts), int(ref.casts))
    assert int(got.dropped) == 0 and int(ref.dropped) == 0


@pytest.mark.heavy  # exhaustive interpret-mode parity; quick tier keeps a small-shape guard
def test_fused_level_depths():
    scene, textures = demo_scene()
    cam = demo_camera()
    clips = jnp.asarray(clip_coords(16, 12))
    o, d = shoot(cam, clips)
    for depth in (0, 1, 2, 3):
        cfg = RenderConfig(width=16, height=12, depth=depth)
        ref = _trace("0", scene, textures, o, d, cfg)
        got = _trace("interpret", scene, textures, o, d, cfg)
        a, b = np.asarray(got.color), np.asarray(ref.color)
        close = np.all(np.abs(a - b) <= 1e-3 + 2e-2 * np.abs(b), axis=-1)
        assert close.mean() >= 0.98, (depth, close.mean())
        assert abs(int(got.casts) - int(ref.casts)) <= max(
            0.01 * int(ref.casts), 8
        ), depth
