import numpy as np
import jax.numpy as jnp

from raytracer_tpu.utils import vec


def test_dot_cross_norm():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(32, 3)).astype(np.float32)
    b = rng.normal(size=(32, 3)).astype(np.float32)
    np.testing.assert_allclose(vec.dot(a, b), (a * b).sum(-1), rtol=1e-6)
    np.testing.assert_allclose(vec.cross(a, b), np.cross(a, b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vec.norm(a), np.linalg.norm(a, axis=-1), rtol=1e-6)
    n = np.asarray(vec.normalize(a))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)


def test_reflect():
    d = np.array([[1.0, -1.0, 0.0]], np.float32) / np.sqrt(2)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    r = np.asarray(vec.reflect(d, n))
    np.testing.assert_allclose(r, [[1.0 / np.sqrt(2), 1.0 / np.sqrt(2), 0.0]], atol=1e-6)


def test_rotate_from_z_identity():
    # n = +z must act as identity
    v = np.random.default_rng(1).normal(size=(8, 3)).astype(np.float32)
    n = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (8, 1))
    out = np.asarray(vec.rotate_from_z(n, v))
    np.testing.assert_allclose(out, v, atol=1e-6)


def test_rotate_from_z_maps_z_to_n():
    rng = np.random.default_rng(2)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    z = np.tile(np.array([[0.0, 0.0, 1.0]]), (64, 1))
    out = np.asarray(vec.rotate_from_z(n.astype(np.float32), z.astype(np.float32)))
    np.testing.assert_allclose(out, n, atol=1e-5)


def test_rotate_from_z_preserves_length_and_angles():
    rng = np.random.default_rng(3)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = rng.normal(size=(64, 3))
    out = np.asarray(vec.rotate_from_z(n.astype(np.float32), v.astype(np.float32)))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-5
    )
    # angle(v, z) == angle(out, n)
    cos_before = v[:, 2] / np.linalg.norm(v, axis=-1)
    cos_after = (out * n).sum(-1) / np.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(cos_after, cos_before, atol=1e-5)


def test_rotate_from_z_antiparallel():
    # n = -z: cgmath picks axis (0,-1,0), so v -> (-x, y, -z)
    v = np.array([[1.0, 2.0, 3.0]], np.float32)
    n = np.array([[0.0, 0.0, -1.0]], np.float32)
    out = np.asarray(vec.rotate_from_z(n, v))
    np.testing.assert_allclose(out, [[-1.0, 2.0, -3.0]], atol=1e-6)


def test_is_normal_f32():
    x = jnp.asarray([1.0, 0.0, np.inf, -np.inf, np.nan, 1e-45, 1e-37])
    out = np.asarray(vec.is_normal_f32(x))
    assert list(out) == [True, False, False, False, False, False, True]
