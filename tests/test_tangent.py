"""get_up_right (ops/tangent.py) vs a direct scalar port of main.rs:616-649.

The reference function is dead code (SURVEY.md §2 C16) but ships for API
completeness; this pins its math against an independent NumPy oracle
using explicit 2x2 matrix inversion, per primitive kind.
"""

import numpy as np

from raytracer_tpu.ops.tangent import get_up_right
from raytracer_tpu.scene.presets import demo_scene
from raytracer_tpu.scene.types import Hits


def oracle_up_right_triangle(v, uv):
    a = v[1] - v[0]
    b = v[2] - v[0]
    uv1 = uv[1] - uv[0]
    uv2 = uv[2] - uv[0]
    U = np.array([[uv1[0], uv2[0]], [uv1[1], uv2[1]]], np.float64)
    Minv = np.linalg.inv(U)
    ab = np.stack([a, b], axis=1)  # [3, 2]
    up = ab @ Minv[:, 0]
    right = ab @ Minv[:, 1]
    return up / np.linalg.norm(up), right / np.linalg.norm(right)


def oracle_up_right_sphere(normal):
    right = np.cross([0.0, 1.0, 0.0], normal)
    right = right / np.linalg.norm(right)
    up = np.cross(normal, right)
    return up / np.linalg.norm(up), right


def _hits(scene, prims, normals):
    n = len(prims)
    return Hits(
        valid=np.ones(n, bool),
        t=np.ones(n, np.float32),
        prim=np.asarray(prims, np.int32),
        obj=np.zeros(n, np.int32),
        pos=np.zeros((n, 3), np.float32),
        normal=np.asarray(normals, np.float32),
        uv=np.zeros((n, 2), np.float32),
        backface=np.zeros(n, bool),
    )


def test_matches_scalar_oracle_on_demo_scene():
    scene, _ = demo_scene()
    tri_v = np.asarray(scene.tri_v)
    tri_uv = np.asarray(scene.tri_uv)
    n_tri = scene.n_tri

    # every triangle with an invertible uv mapping + every sphere
    prims, normals, expect = [], [], []
    rng = np.random.default_rng(0)
    for ti in range(n_tri):
        uv1 = tri_uv[ti, 1] - tri_uv[ti, 0]
        uv2 = tri_uv[ti, 2] - tri_uv[ti, 0]
        if abs(uv1[0] * uv2[1] - uv2[0] * uv1[1]) < 1e-12:
            continue
        prims.append(ti)
        normals.append([0.0, 0.0, 1.0])  # unused for triangles
        expect.append(oracle_up_right_triangle(
            tri_v[ti].astype(np.float64), tri_uv[ti].astype(np.float64)))
    for si in range(scene.n_sph):
        nrm = rng.normal(size=3)
        nrm[1] *= 0.2  # keep away from +-y (cross with y well-conditioned)
        nrm /= np.linalg.norm(nrm)
        prims.append(n_tri + si)
        normals.append(nrm)
        expect.append(oracle_up_right_sphere(nrm))
    assert len(prims) > 8

    up, right = get_up_right(scene, _hits(scene, prims, normals))
    up, right = np.asarray(up), np.asarray(right)
    for i, (eu, er) in enumerate(expect):
        np.testing.assert_allclose(up[i], eu, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(right[i], er, rtol=2e-5, atol=2e-5)


def test_degenerate_uv_returns_zero_not_nan():
    scene, _ = demo_scene()
    tri_v = np.asarray(scene.tri_v)
    tri_uv = np.asarray(scene.tri_uv)
    # find (or fail to find) a degenerate-uv triangle; if none exists in
    # the demo scene, synthesize the check by passing a sphere lane only
    degenerate = [
        ti for ti in range(scene.n_tri)
        if abs((tri_uv[ti, 1] - tri_uv[ti, 0])[0]
               * (tri_uv[ti, 2] - tri_uv[ti, 0])[1]
               - (tri_uv[ti, 2] - tri_uv[ti, 0])[0]
               * (tri_uv[ti, 1] - tri_uv[ti, 0])[1]) < 1e-12
    ]
    if not degenerate:
        import pytest

        pytest.skip("demo scene has no degenerate-uv triangle")
    up, right = get_up_right(
        scene, _hits(scene, degenerate[:1], [[0.0, 0.0, 1.0]])
    )
    assert np.all(np.asarray(up) == 0.0) and np.all(np.asarray(right) == 0.0)
