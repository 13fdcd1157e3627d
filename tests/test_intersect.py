"""Intersector parity: vectorized cast vs the scalar NumPy oracle,
plus closed-form unit cases for face-direction and exclusion semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.ops.intersect import cast
from raytracer_tpu.scene.builder import MaterialSpec, SceneBuilder, square, triangle
from raytracer_tpu.scene.presets import demo_scene
from raytracer_tpu.scene.types import FACE_BACK, FACE_BOTH, FACE_FRONT, NO_EXCLUDE, Rays

from tests.oracle import OracleWorld

import jax

cast = jax.jit(cast)


def _rays(o, d, face=FACE_FRONT, excl_prim=NO_EXCLUDE, excl_face=FACE_FRONT):
    o = jnp.asarray(o, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(d, jnp.float32).reshape(-1, 3)
    n = o.shape[0]
    mk = lambda v: jnp.full((n,), v, jnp.int32)
    return Rays(o=o, d=d, face=mk(face), excl_prim=mk(excl_prim), excl_face=mk(excl_face))


@pytest.fixture(scope="module")
def simple_scene():
    b = SceneBuilder()
    b.push_object(MaterialSpec(diffuse_color=(1, 0, 0))).push_sphere((0, 0, -3), 1.0)
    # wound so the face normal points +z (toward the origin)
    b.push_object(MaterialSpec(diffuse_color=(0, 1, 0))).push_triangles(
        square([
            ((-2, -2, -6), (0, 0)), ((2, -2, -6), (0, 1)),
            ((2, 2, -6), (1, 0)), ((-2, 2, -6), (1, 1)),
        ])
    )
    b.push_directional_light((0, -1, 0), (1, 1, 1))
    return b.build()


def test_sphere_front_hit(simple_scene):
    h = cast(simple_scene, _rays([0, 0, 0], [0, 0, -1]))
    assert bool(h.valid[0])
    assert float(h.t[0]) == pytest.approx(2.0, abs=1e-5)
    # sphere ids come after triangles
    assert int(h.prim[0]) == simple_scene.n_tri
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-5)
    assert not bool(h.backface[0])


def test_sphere_back_hit_from_inside(simple_scene):
    h = cast(simple_scene, _rays([0, 0, -3], [0, 0, -1], face=FACE_BACK))
    assert bool(h.valid[0])
    assert float(h.t[0]) == pytest.approx(1.0, abs=1e-5)
    assert bool(h.backface[0])
    # backface normal is flipped: points toward the center side
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-5)


def test_face_both_picks_far_shell_inside(simple_scene):
    h = cast(simple_scene, _rays([0, 0, -3], [0, 0, -1], face=FACE_BOTH))
    assert bool(h.valid[0]) and bool(h.backface[0])
    assert float(h.t[0]) == pytest.approx(1.0, abs=1e-5)


def test_triangle_hit_behind_sphere(simple_scene):
    # Ray offset so it misses the sphere, hits the wall at z=-6
    h = cast(simple_scene, _rays([0, 1.5, 0], [0, 0, -1]))
    assert bool(h.valid[0])
    assert float(h.t[0]) == pytest.approx(6.0, abs=1e-4)
    assert int(h.prim[0]) < simple_scene.n_tri


def test_exclusion_suppresses_self_hit(simple_scene):
    sphere_id = simple_scene.n_tri
    # From the sphere surface, shooting outward-front would re-hit t=0-ish;
    # the exclusion on the FRONT face suppresses it.
    h = cast(
        simple_scene,
        _rays([0, 0, -2], [0, 0, -1], face=FACE_FRONT,
              excl_prim=sphere_id, excl_face=FACE_FRONT),
    )
    # goes through to the wall? No: FRONT ray from surface along -z would hit
    # the *far* shell as a backface -> culled for FRONT; so the wall at z=-6.
    assert bool(h.valid[0])
    assert int(h.prim[0]) < simple_scene.n_tri


def test_miss(simple_scene):
    h = cast(simple_scene, _rays([0, 0, 0], [0, 0, 1]))
    assert not bool(h.valid[0])


def test_inactive_lane(simple_scene):
    r = _rays([0, 0, 0], [0, 0, -1])
    h = cast(simple_scene, r, active=jnp.asarray([False]))
    assert not bool(h.valid[0])


def test_backface_cull_front_ray():
    b = SceneBuilder()
    b.push_object(MaterialSpec()).push_triangle(
        triangle([((-1, -1, -2), (0, 0)), ((1, -1, -2), (1, 0)), ((0, 1, -2), (0, 1))])
    )
    scene = b.build()
    # winding normal points +z (toward origin): front hit from +z side
    h = cast(scene, _rays([0, 0, 0], [0, 0, -1], face=FACE_FRONT))
    assert bool(h.valid[0])
    # from behind (-z side) it is a backface: FRONT ray culls, BACK ray hits
    h2 = cast(scene, _rays([0, 0, -4], [0, 0, 1], face=FACE_FRONT))
    assert not bool(h2.valid[0])
    h3 = cast(scene, _rays([0, 0, -4], [0, 0, 1], face=FACE_BACK))
    assert bool(h3.valid[0]) and bool(h3.backface[0])
    # backface-flipped normal points back toward the ray origin
    np.testing.assert_allclose(np.asarray(h3.normal[0]), [0, 0, -1], atol=1e-6)


def test_cast_matches_oracle_on_demo_scene():
    scene, textures = demo_scene()
    world = OracleWorld(scene, textures)
    rng = np.random.default_rng(7)
    n = 256
    # random rays from a shell around the scene pointing inward-ish
    o = rng.normal(size=(n, 3)) * 2.0 + np.array([0.5, 1.0, 0.5])
    target = rng.normal(size=(n, 3)) * 1.0 + np.array([0.0, 0.8, 0.0])
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    faces = rng.integers(0, 3, size=n)

    h = cast(scene, _rays(o, d) if False else Rays(
        o=jnp.asarray(o, jnp.float32),
        d=jnp.asarray(d, jnp.float32),
        face=jnp.asarray(faces, jnp.int32),
        excl_prim=jnp.full((n,), NO_EXCLUDE, jnp.int32),
        excl_face=jnp.full((n,), FACE_FRONT, jnp.int32),
    ))

    mismatch = 0
    for i in range(n):
        ref = world.cast(o[i], d[i], int(faces[i]))
        got_valid = bool(h.valid[i])
        if (ref is not None) != got_valid:
            # f32-vs-f64 tie-break flips can happen on grazing hits; forbid
            # more than a tiny fraction
            mismatch += 1
            continue
        if ref is None:
            continue
        if ref.prim != int(h.prim[i]):
            mismatch += 1
            continue
        assert float(h.t[i]) == pytest.approx(ref.t, rel=2e-4, abs=2e-4)
        np.testing.assert_allclose(np.asarray(h.pos[i]), ref.pos, atol=5e-4)
        np.testing.assert_allclose(np.asarray(h.normal[i]), ref.normal, atol=5e-4)
        np.testing.assert_allclose(np.asarray(h.uv[i]), ref.uv, atol=2e-3)
        assert bool(h.backface[i]) == ref.backface
    assert mismatch <= 2, f"{mismatch} mismatches out of {n}"


def test_cast_with_exclusions_matches_oracle():
    scene, textures = demo_scene()
    world = OracleWorld(scene, textures)
    rng = np.random.default_rng(11)
    n = 128
    o = rng.normal(size=(n, 3)) * 1.5 + np.array([0.3, 1.0, 0.3])
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    faces = rng.integers(0, 3, size=n)
    excl_p = rng.integers(-1, scene.n_prim, size=n)
    excl_f = rng.integers(0, 3, size=n)

    h = cast(scene, Rays(
        o=jnp.asarray(o, jnp.float32),
        d=jnp.asarray(d, jnp.float32),
        face=jnp.asarray(faces, jnp.int32),
        excl_prim=jnp.asarray(excl_p, jnp.int32),
        excl_face=jnp.asarray(excl_f, jnp.int32),
    ))

    mismatch = 0
    for i in range(n):
        ref = world.cast(o[i], d[i], int(faces[i]), int(excl_p[i]), int(excl_f[i]))
        if (ref is not None) != bool(h.valid[i]) or (
            ref is not None and ref.prim != int(h.prim[i])
        ):
            mismatch += 1
            continue
        if ref is not None:
            assert float(h.t[i]) == pytest.approx(ref.t, rel=2e-4, abs=2e-4)
    assert mismatch <= 2
