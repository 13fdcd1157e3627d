"""Preset scenes (BASELINE.json configs) vs the recursive oracle."""

import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import render_whitted
from raytracer_tpu.scene.presets import (
    demo_camera,
    obj_scene,
    recursive_scene,
    spheres_scene,
    triangles_scene,
)

from tests.oracle import OracleWorld


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - b) ** 2)
    if mse == 0:
        return np.inf
    peak = max(b.max(), 1e-6)
    return 10 * np.log10(peak * peak / mse)


@pytest.mark.parametrize(
    "maker,depth",
    [
        (spheres_scene, 1),  # 01: Phong + shadows
        (triangles_scene, 2),  # 02/05: tris + spheres + textures
        (recursive_scene, 3),  # 03/04: mirror + glass, recursion
        (obj_scene, 2),  # 06/07: OBJ mesh + checker texture
    ],
    ids=["01-spheres", "02-triangles", "03-recursive", "06-obj"],
)
def test_preset_matches_oracle(maker, depth):
    scene, textures = maker()
    world = OracleWorld(scene, textures)
    w, h = 20, 14
    cfg = RenderConfig(width=w, height=h, depth=depth, tile_rays=w * h)
    img, stats = render_whitted(scene, textures, demo_camera(), cfg)
    ref = world.render_whitted(demo_camera(), w, h, depth=depth)
    assert stats["dropped"] == 0
    psnr = _psnr(img, ref)
    assert psnr > 40, f"PSNR {psnr:.1f} dB vs oracle"
