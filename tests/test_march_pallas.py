"""Pallas interior-march kernel vs the XLA while-loop march (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops import materials as mat_ops
from raytracer_tpu.ops.intersect import cast
from raytracer_tpu.ops.march_pallas import march
from raytracer_tpu.ops.trace import refract_march
from raytracer_tpu.ops import camera as camera_ops
from raytracer_tpu.render import clip_coords
from raytracer_tpu.scene.presets import demo_camera, demo_scene
from raytracer_tpu.scene.types import Rays


def test_march_kernel_matches_xla():
    scene, tex = demo_scene()
    cfg = RenderConfig(depth=5)
    cam = demo_camera()
    clips = jnp.asarray(clip_coords(48, 32))  # 1536 rays across the frame
    o, d = camera_ops.shoot(cam, clips)
    rays = Rays.primary(o, d)
    h = jax.jit(lambda r: cast(scene, r))(rays)
    mat = mat_ops.eval_material(scene, tex, h.obj, h.uv)
    want = h.valid & (mat.transparency > 0.0)
    assert int(want.sum()) > 40, "test frame should contain glass hits"

    ref = refract_march(scene, h.pos, h.normal, rays.d, h.prim,
                        mat.refraction, want, cfg)
    esc, travel, esc_o, esc_d, esc_prim, casts = march(
        scene, h.pos, h.normal, rays.d, h.prim, mat.refraction, want,
        max_distance=cfg.max_refract_distance,
        max_retries=cfg.max_tir_retries,
        interpret=True,
    )

    e_ref = np.asarray(ref.escaped)
    e_new = np.asarray(esc)
    # fp-order differences can flip marginal TIR decisions on a few lanes
    disagree = (e_ref != e_new).mean()
    assert disagree < 0.01, f"escape disagreement {disagree:.3%}"

    both = e_ref & e_new
    np.testing.assert_allclose(np.asarray(travel)[both],
                               np.asarray(ref.travel)[both], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(esc_o)[both],
                               np.asarray(ref.esc_o)[both], atol=1e-4)
    np.testing.assert_allclose(np.asarray(esc_d)[both],
                               np.asarray(ref.esc_d)[both], atol=1e-4)
    assert np.array_equal(np.asarray(esc_prim)[both],
                          np.asarray(ref.esc_prim)[both])
    assert int(casts) == int(ref.casts)
