"""Direct lighting with batched shadow rays.

TPU-native World::get_shade (src/main.rs:407-464): bump-map the normal,
approximate each light to a directional sample, fire one shadow-ray batch
per light (face=Back, self-excluded on the back side — the reference's
exclusion-based acne avoidance, src/main.rs:425-433), accept occluders only
if nearer than the light origin (435-448), then Lambert + Phong blended by
shiness (450-462).  The per-light loop is a static Python unroll (L is 3 in
the demo scene); each iteration is one masked cast over the whole batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_tpu.ops import materials as mat_ops
from raytracer_tpu.ops.intersect import cast_any_hit
from raytracer_tpu.ops.lights import approximate_directional
from raytracer_tpu.scene.types import FACE_BACK, Hits, Rays, Scene
from raytracer_tpu.utils import vec


def get_shade(
    scene: Scene,
    textures,
    pos,
    normal,
    uv,
    prim,
    obj,
    ray_d,
    active,
    counters=None,
):
    """Direct radiance at a hit batch.

    pos/normal/uv/prim/obj describe the hits; ray_d is the incoming ray
    direction (for the view vector).  Lanes with active=False return 0.
    Returns [N, 3].
    """
    n = pos.shape[0]
    mat = mat_ops.eval_material(scene, textures, obj, uv)
    n_adj = mat_ops.adjust_normal(mat, normal)

    lights = approximate_directional(scene, pos)
    total = jnp.zeros((n, 3), pos.dtype)

    for li in range(scene.n_light):
        ldir = lights.direction[:, li]  # from light toward point
        lcol = lights.color[:, li]
        lvalid = lights.valid[:, li]

        cosine = -vec.dot(ldir, n_adj)
        consider = active & lvalid & (cosine > 0.0)

        shadow_rays = Rays(
            o=pos,
            d=-ldir,
            face=jnp.full((n,), FACE_BACK, jnp.int32),
            excl_prim=prim,
            excl_face=jnp.full((n,), FACE_BACK, jnp.int32),
        )
        # Occluder blocks unless it lies beyond the light origin;
        # directional lights are blocked by any occluder (main.rs:435-448).
        # "nearest hit nearer than the light" == "any hit nearer than the
        # light", so the shadow test is a cheap any-hit predicate.
        has_origin = lights.has_origin[li] > 0.5
        light_dist = vec.distance(pos, lights.origin[li][None, :])
        limit = jnp.where(has_origin, light_dist, jnp.inf)
        blocked = cast_any_hit(scene, shadow_rays, active=consider, limit=limit)
        if counters is not None:
            counters.append(jnp.sum(consider))

        lit = consider & ~blocked
        light_to_point = -ldir  # probe.light_direction (main.rs:453)
        view = -ray_d
        diffuse = mat_ops.get_diffuse(mat, n_adj, light_to_point) * lcol
        specular = mat_ops.get_specular(mat, n_adj, light_to_point, view) * lcol
        contrib = diffuse * (1.0 - mat.shiness)[:, None] + specular * mat.shiness[:, None]
        total = total + jnp.where(lit[:, None], contrib, 0.0)

    return total


def get_shade_hits(scene, textures, hits: Hits, ray_d, active, counters=None):
    return get_shade(
        scene, textures, hits.pos, hits.normal, hits.uv, hits.prim, hits.obj,
        ray_d, active, counters,
    )
