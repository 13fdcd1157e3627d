"""Scene construction: builder precomputation, OBJ loader, geometry."""

import os

import numpy as np

from raytracer_tpu.scene.builder import MaterialSpec, SceneBuilder, square, triangle
from raytracer_tpu.scene.geometry import (
    dodecahedron_faces,
    dodecahedron_triangles,
    dodecahedron_vertices,
)
from raytracer_tpu.scene.presets import demo_scene
from raytracer_tpu.utils.obj import load_obj_triangles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSET = os.path.join(REPO, "assets", "dodecahedron.obj")


def test_triangle_flat_normal_from_winding():
    # normal = (v1-v0) x (v2-v1) normalized (reference src/main.rs:730-739)
    tri = triangle([((0, 0, 0), (0, 0)), ((1, 0, 0), (1, 0)), ((0, 1, 0), (0, 1))])
    for v in tri:
        np.testing.assert_allclose(v.normal, [0, 0, 1], atol=1e-7)


def test_square_two_triangles_share_winding_normal():
    sq = square([
        ((0, 0, 0), (0, 0)), ((1, 0, 0), (0, 1)),
        ((1, 1, 0), (1, 0)), ((0, 1, 0), (1, 1)),
    ])
    assert len(sq) == 2
    for tri in sq:
        for v in tri:
            np.testing.assert_allclose(v.normal, [0, 0, 1], atol=1e-7)


def test_builder_precomputation_consistency():
    b = SceneBuilder()
    b.push_object(MaterialSpec()).push_triangle(
        triangle([((0, 0, 0), (0, 0)), ((2, 0, 0), (1, 0)), ((0, 2, 0), (0, 1))])
    )
    b.push_directional_light((0, -1, 0), (1, 1, 1))
    scene = b.build()
    fn = np.asarray(scene.tri_fn[0])
    np.testing.assert_allclose(fn, [0, 0, 1], atol=1e-6)
    assert float(scene.tri_d[0]) == 0.0
    # area2 = |(v1-v0) x (v2-v0) . fn| for this right triangle = 4
    assert float(scene.tri_area2[0]) == 4.0
    # edge-test planes: g_i . v + h_i == 0 at the two anchor vertices of edge i
    g = np.asarray(scene.tri_g[0])
    h = np.asarray(scene.tri_h[0])
    v = np.asarray(scene.tri_v[0])
    anchors = [v[1], v[2], v[0]]
    for e in range(3):
        assert abs(g[e] @ anchors[e] + h[e]) < 1e-6


def test_dodecahedron_geometry():
    verts = dodecahedron_vertices()
    assert verts.shape == (20, 3)
    np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 1.0, atol=1e-6)
    faces = dodecahedron_faces()
    assert len(faces) == 12
    # every pentagon is planar and wound outward
    for ring in faces:
        p = verts[ring].astype(np.float64)
        n = np.cross(p[1] - p[0], p[2] - p[1])
        n /= np.linalg.norm(n)
        center = p.mean(axis=0)
        assert n @ center > 0.5  # outward
        for k in range(5):
            assert abs((p[k] - p[0]) @ n) < 1e-6  # planar


def test_obj_loader_matches_procedural():
    assert os.path.exists(ASSET)
    from_obj = load_obj_triangles(ASSET)
    procedural = dodecahedron_triangles()
    assert len(from_obj) == len(procedural) == 36
    # same triangles in the same order (asset was generated from the
    # procedural model), with flat normals rebuilt by the loader
    for a, b in zip(from_obj, procedural):
        for va, vb in zip(a, b):
            np.testing.assert_allclose(va.position, vb.position, atol=1e-5)
            np.testing.assert_allclose(va.normal, vb.normal, atol=1e-4)
            np.testing.assert_allclose(va.uv, [0, 0])


def test_demo_scene_inventory():
    """The demo scene matches the reference scene inventory
    (src/main.rs:809-1083): 64 triangles, 4 spheres, 9 objects, 3 lights."""
    scene, textures = demo_scene()
    assert scene.n_tri == 36 + 2 + 2 + 12 + 12
    assert scene.n_sph == 4
    assert scene.n_obj == 9
    assert scene.n_light == 3
    assert len(textures) == 3


def test_demo_scene_from_obj_asset_matches_procedural():
    s1, _ = demo_scene()
    s2, _ = demo_scene(obj_path=ASSET)
    np.testing.assert_allclose(np.asarray(s1.tri_v), np.asarray(s2.tri_v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.tri_fn), np.asarray(s2.tri_fn), atol=1e-4)
