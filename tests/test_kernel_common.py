"""Row-layout kernel building blocks vs the jnp reference implementations.

kernel_common functions are pure jnp expressions restricted to the Mosaic-
lowerable subset; numerically they must match ops/{intersect,materials,
shade}.py lane-for-lane (acos/atan2 polynomial error stays < 1e-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.ops import kernel_common as kc
from raytracer_tpu.ops import materials as mat_ops
from raytracer_tpu.ops.intersect import cast
from raytracer_tpu.ops.intersect_pallas import pack_sph, pack_tri
from raytracer_tpu.ops.shade import get_shade
from raytracer_tpu.scene.presets import demo_scene
from raytracer_tpu.scene.types import FACE_BACK, FACE_BOTH, FACE_FRONT, Rays
from raytracer_tpu.utils import vec


@pytest.fixture(scope="module")
def demo():
    return demo_scene()


def test_acos_atan2_polynomials():
    x = np.linspace(-1, 1, 20001).astype(np.float32)
    got = np.asarray(kc.acos(jnp.asarray(x[None, :])))[0]
    np.testing.assert_allclose(got, np.arccos(x.astype(np.float64)), atol=2e-6)

    rng = np.random.default_rng(0)
    y = rng.normal(size=50000).astype(np.float32)
    xx = rng.normal(size=50000).astype(np.float32)
    got = np.asarray(kc.atan2(jnp.asarray(y[None, :]), jnp.asarray(xx[None, :])))[0]
    ref = np.arctan2(y.astype(np.float64), xx.astype(np.float64))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_rotate_reflect_refract_rows_match_vec():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    v = rng.normal(size=(256, 3)).astype(np.float32)

    rows = lambda a: tuple(jnp.asarray(a.T[i])[None, :] for i in range(3))
    rx, ry, rz = kc.rotate_from_z(*rows(n), *rows(v))
    ref = np.asarray(vec.rotate_from_z(jnp.asarray(n), jnp.asarray(v)))
    got = np.stack([np.asarray(rx)[0], np.asarray(ry)[0], np.asarray(rz)[0]], -1)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    d = v / np.linalg.norm(v, axis=1, keepdims=True)
    fx, fy, fz = kc.reflect3(*rows(d), *rows(n))
    ref_r = np.asarray(vec.reflect(jnp.asarray(d), jnp.asarray(n)))
    ref_r = ref_r / np.linalg.norm(ref_r, axis=1, keepdims=True)
    got_r = np.stack([np.asarray(fx)[0], np.asarray(fy)[0], np.asarray(fz)[0]], -1)
    np.testing.assert_allclose(got_r, ref_r, atol=1e-5, rtol=1e-5)

    from raytracer_tpu.ops.trace import refract_dir

    k = np.full((256,), 1.6, np.float32)
    tx, ty, tz, ok = kc.refract3(*rows(n), *rows(d), jnp.asarray(k[None, :]))
    ref_t, ref_ok = refract_dir(jnp.asarray(n), jnp.asarray(d), jnp.asarray(k))
    np.testing.assert_array_equal(np.asarray(ok)[0], np.asarray(ref_ok))
    sel = np.asarray(ref_ok)
    got_t = np.stack([np.asarray(tx)[0], np.asarray(ty)[0], np.asarray(tz)[0]], -1)
    np.testing.assert_allclose(got_t[sel], np.asarray(ref_t)[sel], atol=1e-5,
                               rtol=1e-5)


def _random_rays(n, seed=3):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 2.0 + np.float32(
        [1.0, 1.5, 1.0]
    )
    target = rng.normal(size=(n, 3)).astype(np.float32) * 0.8 + np.float32(
        [0.0, 0.8, 0.0]
    )
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    face = rng.choice([FACE_FRONT, FACE_BACK, FACE_BOTH], size=n).astype(np.int32)
    return Rays(
        o=jnp.asarray(o), d=jnp.asarray(d), face=jnp.asarray(face),
        excl_prim=jnp.full((n,), -1, jnp.int32),
        excl_face=jnp.zeros((n,), jnp.int32),
    )


def test_full_sweep_matches_cast(demo):
    scene, textures = demo
    n = 512
    rays = _random_rays(n)
    ref = cast(scene, rays)

    tri, sph = pack_tri(scene), pack_sph(scene)
    rows = lambda a: jnp.asarray(np.asarray(a).T)
    o = tuple(rows(rays.o[:, i])[None, :] for i in range(3))
    d = tuple(rows(rays.d[:, i])[None, :] for i in range(3))
    got = kc.full_sweep(
        o, d, jnp.asarray(rays.face)[None, :],
        jnp.asarray(rays.excl_prim)[None, :],
        jnp.asarray(rays.excl_face)[None, :],
        jnp.ones((1, n), bool), tri, sph, scene.n_tri, scene.n_sph,
    )

    np.testing.assert_array_equal(np.asarray(got["valid"])[0], np.asarray(ref.valid))
    sel = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got["t"])[0][sel],
                               np.asarray(ref.t)[sel], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got["prim"])[0][sel],
                                  np.asarray(ref.prim)[sel])
    np.testing.assert_array_equal(np.asarray(got["obj"])[0][sel],
                                  np.asarray(ref.obj)[sel])
    np.testing.assert_array_equal(np.asarray(got["backface"])[0][sel],
                                  np.asarray(ref.backface)[sel])
    pos = np.stack([np.asarray(got[c])[0] for c in ("px", "py", "pz")], -1)
    np.testing.assert_allclose(pos[sel], np.asarray(ref.pos)[sel], atol=1e-5)
    nrm = np.stack([np.asarray(got[c])[0] for c in ("nx", "ny", "nz")], -1)
    np.testing.assert_allclose(nrm[sel], np.asarray(ref.normal)[sel], atol=1e-4,
                               rtol=1e-4)
    uv = np.stack([np.asarray(got[c])[0] for c in ("u", "v")], -1)
    np.testing.assert_allclose(uv[sel], np.asarray(ref.uv)[sel], atol=1e-5,
                               rtol=1e-4)


def test_eval_material_rows_matches(demo):
    scene, textures = demo
    rng = np.random.default_rng(7)
    n = 512
    obj = rng.integers(0, scene.n_obj, size=n).astype(np.int32)
    uv = rng.uniform(-1.5, 1.5, size=(n, 2)).astype(np.float32)
    ref = mat_ops.eval_material(scene, textures, jnp.asarray(obj), jnp.asarray(uv))

    mat = kc.pack_materials(scene)
    got = kc.eval_material(mat, textures, jnp.asarray(obj)[None, :],
                           jnp.asarray(uv[:, 0])[None, :],
                           jnp.asarray(uv[:, 1])[None, :])
    np.testing.assert_allclose(
        np.stack([np.asarray(got[c])[0] for c in ("dr", "dg", "db")], -1),
        np.asarray(ref.diffuse), atol=1e-6)
    np.testing.assert_allclose(
        np.stack([np.asarray(got[c])[0] for c in ("tnx", "tny", "tnz")], -1),
        np.asarray(ref.normal), atol=1e-6)
    for row, field in [("shiness", "shiness"), ("smoothness", "smoothness"),
                       ("transparency", "transparency"),
                       ("refraction", "refraction"), ("decay", "decay")]:
        np.testing.assert_allclose(np.asarray(got[row])[0],
                                   np.asarray(getattr(ref, field)), atol=1e-6)


def test_get_shade_rows_matches(demo):
    scene, textures = demo
    n = 512
    rays = _random_rays(n, seed=11)
    h = cast(scene, rays)
    ref = get_shade(scene, textures, h.pos, h.normal, h.uv, h.prim, h.obj,
                    rays.d, h.valid)

    tri, sph = pack_tri(scene), pack_sph(scene)
    mat_t = kc.pack_materials(scene)
    lights = kc.pack_lights(scene)
    row = lambda a: jnp.asarray(np.asarray(a))[None, :]

    m = kc.eval_material(mat_t, textures, row(h.obj), row(h.uv[:, 0]),
                         row(h.uv[:, 1]))
    nax, nay, naz = kc.rotate_from_z(
        row(h.normal[:, 0]), row(h.normal[:, 1]), row(h.normal[:, 2]),
        m["tnx"], m["tny"], m["tnz"],
    )
    sweep = kc._ShadowSweep(
        row(h.pos[:, 0]), row(h.pos[:, 1]), row(h.pos[:, 2]),
        row(h.prim), tri, sph, scene.n_tri, scene.n_sph,
    )
    r, g, b, cnt = kc.get_shade(
        m, lights, row(h.pos[:, 0]), row(h.pos[:, 1]), row(h.pos[:, 2]),
        nax, nay, naz,
        row(-rays.d[:, 0]), row(-rays.d[:, 1]), row(-rays.d[:, 2]),
        row(h.valid), sweep, scene.n_light,
    )
    got = np.stack([np.asarray(r)[0], np.asarray(g)[0], np.asarray(b)[0]], -1)
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-3, rtol=2e-2)
