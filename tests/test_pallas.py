"""Pallas kernel parity vs the jnp intersector (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.ops import intersect
from raytracer_tpu.ops.intersect import cast, cast_any_hit
from raytracer_tpu.ops.intersect_pallas import any_hit, nearest_hit
from raytracer_tpu.scene.presets import demo_scene
from raytracer_tpu.scene.types import FACE_BACK, Rays


@pytest.fixture(scope="module")
def setup():
    scene, tex = demo_scene()
    rng = np.random.default_rng(0)
    n = 640  # not a multiple of TILE_R: exercises padding
    o = rng.normal(size=(n, 3)).astype(np.float32) * 2 + np.array(
        [0.5, 1, 0.5], np.float32
    )
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(
        o=jnp.asarray(o),
        d=jnp.asarray(d),
        face=jnp.asarray(rng.integers(0, 3, size=n), jnp.int32),
        excl_prim=jnp.asarray(rng.integers(-1, scene.n_prim, size=n), jnp.int32),
        excl_face=jnp.asarray(rng.integers(0, 3, size=n), jnp.int32),
    )
    return scene, rays


def test_nearest_hit_matches_jnp(setup):
    scene, rays = setup
    h = jax.jit(lambda r: cast(scene, r))(rays)
    t, idx, bf, valid = nearest_hit(scene, rays, interpret=True)
    va, hv = np.asarray(valid), np.asarray(h.valid)
    assert np.array_equal(va, hv)
    assert np.array_equal(np.asarray(idx)[va], np.asarray(h.prim)[hv])
    assert np.allclose(np.asarray(t)[va], np.asarray(h.t)[hv], rtol=1e-6)
    assert np.array_equal(np.asarray(bf)[va], np.asarray(h.backface)[hv])


def test_any_hit_matches_jnp(setup):
    scene, rays = setup
    n = rays.o.shape[0]
    limit = jnp.asarray(
        np.random.default_rng(1).uniform(0.1, 10.0, size=n), jnp.float32
    )
    want = cast_any_hit(scene, rays, limit=limit)
    got = any_hit(scene, rays, limit=limit, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    # no-limit variant
    want2 = cast_any_hit(scene, rays)
    got2 = any_hit(scene, rays, interpret=True)
    assert np.array_equal(np.asarray(got2), np.asarray(want2))


def test_cast_dispatches_to_pallas_interpret(setup):
    scene, rays = setup
    h_jnp = jax.jit(lambda r: cast(scene, r))(rays)
    intersect.set_pallas_mode("interpret")
    try:
        h_pl = jax.jit(lambda r: cast(scene, r))(rays)
    finally:
        intersect.set_pallas_mode("auto")
    hv = np.asarray(h_jnp.valid)
    assert np.array_equal(np.asarray(h_pl.valid), hv)
    assert np.array_equal(np.asarray(h_pl.prim)[hv], np.asarray(h_jnp.prim)[hv])
    np.testing.assert_allclose(
        np.asarray(h_pl.normal)[hv], np.asarray(h_jnp.normal)[hv], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_pl.uv)[hv], np.asarray(h_jnp.uv)[hv], atol=1e-5
    )
