"""Fused MC step kernel vs the jnp roulette walk.

Both paths consume IDENTICAL pre-drawn uniforms (ops/distributed.py), so
they follow the same roulette branches and lobes lane-for-lane; remaining
differences are f32 op-ordering (sweep winners on near-ties, TIR boundary
flips) which may fully decorrelate an isolated lane — the comparison
therefore requires near-total lane agreement rather than exact equality,
plus tight agreement of the batch means.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops import intersect
from raytracer_tpu.ops.camera import shoot_focus
from raytracer_tpu.ops.distributed import trace_distributed
from raytracer_tpu.render import clip_coords
from raytracer_tpu.scene.presets import demo_camera, demo_scene


@pytest.fixture(scope="module")
def demo():
    return demo_scene()


def _primaries(n_side=24, seed=2):
    cam = demo_camera()
    clips = jnp.asarray(clip_coords(n_side, n_side))
    key = jax.random.PRNGKey(seed)
    offsets = jax.random.normal(key, (clips.shape[0], 2), jnp.float32) * 0.04
    return shoot_focus(cam, clips, offsets, 3.0)


def _run(mode, scene, textures, o, d, key, cfg):
    intersect.set_pallas_mode(mode)
    try:
        return trace_distributed(scene, textures, o, d, key, cfg)
    finally:
        intersect.set_pallas_mode("auto")


def test_mc_kernel_matches_jnp_walk(demo):
    scene, textures = demo
    o, d = _primaries()
    key = jax.random.PRNGKey(7)
    cfg = RenderConfig(depth=5)

    ref = _run("0", scene, textures, o, d, key, cfg)
    got = _run("interpret", scene, textures, o, d, key, cfg)

    a = np.asarray(got.photon)
    b = np.asarray(ref.photon)
    close = np.all(np.abs(a - b) <= 1e-3 + 2e-2 * np.abs(b), axis=-1)
    frac = close.mean()
    assert frac >= 0.99, f"only {frac:.4f} of lanes agree"
    # batch means agree tightly (branch-flip lanes are rare and bounded)
    np.testing.assert_allclose(a.mean(axis=0), b.mean(axis=0), rtol=0.05,
                               atol=5e-3)
    # honest cast counters agree up to the same rare branch flips
    assert abs(int(got.casts) - int(ref.casts)) <= max(
        0.01 * int(ref.casts), 16
    ), (int(got.casts), int(ref.casts))
    assert abs(int(got.filtered) - int(ref.filtered)) <= max(
        0.02 * (o.shape[0]), 8
    )


def test_mc_kernel_deterministic(demo):
    scene, textures = demo
    o, d = _primaries(n_side=16)
    key = jax.random.PRNGKey(3)
    cfg = RenderConfig(depth=3)
    r1 = _run("interpret", scene, textures, o, d, key, cfg)
    r2 = _run("interpret", scene, textures, o, d, key, cfg)
    np.testing.assert_array_equal(np.asarray(r1.photon), np.asarray(r2.photon))
    assert int(r1.casts) == int(r2.casts)


def test_mc_kernel_depth0(demo):
    scene, textures = demo
    o, d = _primaries(n_side=8)
    key = jax.random.PRNGKey(1)
    cfg = RenderConfig(depth=0)
    ref = _run("0", scene, textures, o, d, key, cfg)
    got = _run("interpret", scene, textures, o, d, key, cfg)
    a, b = np.asarray(got.photon), np.asarray(ref.photon)
    close = np.all(np.abs(a - b) <= 1e-3 + 2e-2 * np.abs(b), axis=-1)
    assert close.mean() >= 0.99
