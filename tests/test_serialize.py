"""JSON scene format: round trip against the builder-built preset."""

import json
import os

import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import render_whitted
from raytracer_tpu.scene.presets import demo_camera, spheres_scene
from raytracer_tpu.scene.serialize import load_scene_dict, load_scene_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSET = os.path.join(REPO, "assets", "scene_spheres.json")


def test_json_scene_matches_builder_preset():
    scene_j, tex_j, cam_j = load_scene_file(ASSET)
    scene_b, tex_b = spheres_scene()
    assert cam_j is not None
    np.testing.assert_allclose(np.asarray(cam_j.center),
                               np.asarray(demo_camera().center))
    assert scene_j.n_tri == scene_b.n_tri
    assert scene_j.n_sph == scene_b.n_sph
    assert scene_j.n_light == scene_b.n_light
    np.testing.assert_allclose(np.asarray(scene_j.sph_c), np.asarray(scene_b.sph_c))
    np.testing.assert_allclose(np.asarray(scene_j.tri_v), np.asarray(scene_b.tri_v))
    np.testing.assert_allclose(np.asarray(scene_j.mat_diffuse),
                               np.asarray(scene_b.mat_diffuse))
    np.testing.assert_allclose(np.asarray(scene_j.light_color),
                               np.asarray(scene_b.light_color), atol=1e-6)

    cfg = RenderConfig(width=12, height=8, depth=1, tile_rays=96)
    img_j, _ = render_whitted(scene_j, tex_j, cam_j, cfg)
    img_b, _ = render_whitted(scene_b, tex_b, demo_camera(), cfg)
    np.testing.assert_allclose(np.asarray(img_j), np.asarray(img_b),
                               atol=1e-5, rtol=1e-4)


def test_json_scene_obj_and_textures(tmp_path):
    data = {
        "objects": [
            {"material": {"texture": "checker", "shiness": 0.3},
             "spheres": [{"center": [0, 0.5, 0], "radius": 0.5}]},
            {"material": {"diffuse_color": [1, 1, 1], "shiness": 0.1},
             "obj": {"path": os.path.join(REPO, "assets", "dodecahedron.obj"),
                      "scale": 0.5, "offset": [0, 1, 0]}},
        ],
        "lights": [{"type": "directional", "direction": [0, -1, 0],
                     "color": [1, 1, 1]}],
    }
    scene, tex, cam = load_scene_dict(data)
    assert cam is None
    assert scene.n_tri == 36
    assert scene.n_sph == 1
    assert int(scene.mat_tex[0]) == 2  # checker resolved by name


def test_json_scene_errors():
    with pytest.raises(ValueError, match="unknown texture"):
        load_scene_dict({"objects": [{"material": {"texture": "nope"}}]})
    with pytest.raises(ValueError, match="unknown material fields"):
        load_scene_dict({"objects": [{"material": {"glossiness": 1.0}}]})
    with pytest.raises(ValueError, match="unknown light type"):
        load_scene_dict({"lights": [{"type": "area"}]})


def test_dump_load_round_trip():
    from raytracer_tpu.scene.builder import MaterialSpec, SceneBuilder, square
    from raytracer_tpu.scene.serialize import dump_builder

    b = SceneBuilder()
    b.push_object(MaterialSpec(diffuse_color=(1, 0.8, 0.6), shiness=0.5,
                               smoothness=0.01)).push_triangles(square([
        ((-2, 0, -2), (0, 0)), ((-2, 0, 2), (0, 1)),
        ((2, 0, 2), (1, 0)), ((2, 0, -2), (1, 1)),
    ]))
    b.push_object(MaterialSpec(texture=2, shiness=0.3)).push_sphere(
        (0, 0.5, 0), 0.5)
    b.push_spot_light((0, 10, 0), (0, -1, 0), np.deg2rad(60.0), 1.0, (1, 0.5, 0.9))
    b.push_point_light((0, 0.1, 0), (0.8, 0.8, 1.0))
    scene_a = b.build()

    data = dump_builder(b, camera=demo_camera())
    data = json.loads(json.dumps(data))  # force a real JSON round trip
    scene_b2, _, cam = load_scene_dict(data)
    assert cam is not None
    for field in ("tri_v", "tri_n", "tri_uv", "sph_c", "sph_r",
                  "mat_diffuse", "mat_tex", "light_color", "light_angle"):
        np.testing.assert_allclose(
            np.asarray(getattr(scene_a, field)),
            np.asarray(getattr(scene_b2, field)), atol=1e-6,
            err_msg=field,
        )
