"""Per-hit UV tangent frame — World::get_up_right.

Mirrors /root/reference/src/main.rs:616-649: for a triangle hit, the
(up, right) pair maps the surface's uv axes into world space (the
inverse-uv-matrix tangent construction bump/normal mapping would use);
for a sphere hit, a frame built from the world +y axis and the shading
normal.  The function is DEAD CODE in the reference (nothing calls it —
SURVEY.md §2 C16); it is provided for drop-in API completeness as a
vectorized cold-path utility (plain XLA gathers — it is not part of any
render loop, so it does not belong in the fused kernels).
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_tpu.scene.types import Hits, Scene
from raytracer_tpu.utils import vec


def get_up_right(scene: Scene, hits: Hits):
    """([N, 3] up, [N, 3] right) world-space uv tangent frame per hit.

    Triangle hits (prim < n_tri, main.rs:618-642): with edge matrix
    [a|b] = [v1-v0 | v2-v0] and uv deltas uv1/uv2,
        up    = [a|b] @ inv(U)[:,0],   right = [a|b] @ inv(U)[:,1],
    U = [[uv1.x, uv2.x], [uv1.y, uv2.y]], both normalized.  Degenerate
    uv mappings (det == 0) — where the reference's .invert().unwrap()
    panics — return zero vectors instead.

    Sphere hits (main.rs:643-647): right = normalize(ŷ × n),
    up = normalize(n × right).  Lanes with hits.valid == False return
    garbage like every other Hits consumer; mask downstream.
    """
    n_tri = scene.n_tri
    prim = hits.prim
    is_tri = prim < n_tri
    ti = jnp.clip(prim, 0, max(n_tri - 1, 0))

    if n_tri > 0:
        v = scene.tri_v[ti]  # [N, 3, 3]
        uv = scene.tri_uv[ti]  # [N, 3, 2]
        a = v[:, 1] - v[:, 0]
        b = v[:, 2] - v[:, 0]
        uv1 = uv[:, 1] - uv[:, 0]
        uv2 = uv[:, 2] - uv[:, 0]
        det = uv1[:, 0] * uv2[:, 1] - uv2[:, 0] * uv1[:, 1]
        inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det),
                            0.0)[:, None]
        up_t = (a * uv2[:, 1:2] - b * uv1[:, 1:2]) * inv_det
        right_t = (b * uv1[:, 0:1] - a * uv2[:, 0:1]) * inv_det
        ok = (det != 0.0)[:, None]
        up_t = jnp.where(ok, vec.normalize_safe(up_t, 1e-30), 0.0)
        right_t = jnp.where(ok, vec.normalize_safe(right_t, 1e-30), 0.0)
    else:
        up_t = jnp.zeros_like(hits.normal)
        right_t = jnp.zeros_like(hits.normal)

    y = jnp.zeros_like(hits.normal).at[:, 1].set(1.0)
    right_s = vec.normalize(jnp.cross(y, hits.normal))
    up_s = vec.normalize(jnp.cross(hits.normal, right_s))

    up = jnp.where(is_tri[:, None], up_t, up_s)
    right = jnp.where(is_tri[:, None], right_t, right_s)
    return up, right
