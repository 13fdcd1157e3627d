"""Fused multi-light shadow kernel vs per-light any-hit (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops.intersect import cast, cast_any_hit
from raytracer_tpu.ops.intersect_pallas import shadow_any_hit
from raytracer_tpu.ops.lights import approximate_directional
from raytracer_tpu.scene.presets import demo_camera, demo_scene
from raytracer_tpu.ops import camera as camera_ops
from raytracer_tpu.render import clip_coords
from raytracer_tpu.scene.types import FACE_BACK, Rays
from raytracer_tpu.utils import vec


def test_fused_shadow_matches_per_light():
    scene, tex = demo_scene()
    clips = jnp.asarray(clip_coords(40, 24))
    o, d = camera_ops.shoot(demo_camera(), clips)
    rays = Rays.primary(o, d)
    h = jax.jit(lambda r: cast(scene, r))(rays)
    n = o.shape[0]
    L = scene.n_light

    lights = approximate_directional(scene, h.pos)
    dirs, limits, actives, per_light = [], [], [], []
    for li in range(L):
        ldir = lights.direction[:, li]
        consider = h.valid & lights.valid[:, li]
        has_origin = lights.has_origin[li] > 0.5
        limit = jnp.where(has_origin,
                          vec.distance(h.pos, lights.origin[li][None, :]),
                          jnp.inf)
        dirs.append(-ldir)
        limits.append(limit)
        actives.append(consider)
        shadow = Rays(
            o=h.pos, d=-ldir,
            face=jnp.full((n,), FACE_BACK, jnp.int32),
            excl_prim=h.prim,
            excl_face=jnp.full((n,), FACE_BACK, jnp.int32),
        )
        per_light.append(np.asarray(
            cast_any_hit(scene, shadow, active=consider, limit=limit)
        ))

    fused = np.asarray(shadow_any_hit(
        scene, h.pos, jnp.stack(dirs), h.prim,
        jnp.stack(limits), jnp.stack(actives), interpret=True,
    ))
    for li in range(L):
        assert np.array_equal(fused[li], per_light[li]), f"light {li}"
