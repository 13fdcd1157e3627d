"""Vectorized nearest-hit intersector.

TPU-native re-design of World::cast (reference: src/main.rs:180-326).  The
reference scans primitives per ray on the CPU call stack; here a whole ray
batch is tested against the whole primitive table at once as masked [N, P]
lane math, the per-ray dot products against all triangle planes are batched
matmuls ([N,3] x [3,T] -> MXU), and the nearest hit is a masked reduction.

Semantic parity notes (all from src/main.rs):
  * face-direction culling (184-188, 273-281): FRONT rays only hit front
    faces of triangles and the near sphere shell; BACK rays only hit back
    faces / far shell; BOTH picks the sphere shell by sign of tc - k.
  * exclusion (190-200, 286-296): a ray may exclude one primitive on one
    side — this replaces epsilon-offset self-hit avoidance and is kept
    exactly (ids compare in a lane, no epsilon anywhere).
  * tie-break (229-233, 298-302): a later primitive replaces an equal-t
    earlier one (update on t <= nearest); spheres come after triangles.
  * triangle inside test (218-227): three signed areas against the face
    normal, reject if any < 0.
  * interpolated triangle normal is NOT renormalized (248-251); it is
    negated on backface hits.  Sphere uv comes from the (already flipped)
    unit normal (310-313).
  * deviation: rays exactly parallel to a triangle plane (N.D == 0) produce
    t = +/-inf in the reference and can record a bogus infinite hit if
    nothing else is hit; we treat non-finite t as a miss instead.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_tpu.scene.types import (
    FACE_BACK,
    FACE_FRONT,
    Hits,
    Rays,
    Scene,
)

_INF = jnp.inf


def _exclusion_mask(excl_prim, excl_face, prim_ids, backface):
    """Replicates the exclusion criteria match (src/main.rs:190-200).

    excl_prim/excl_face: [N]; prim_ids: [P]; backface: [N, P] bool.
    Returns [N, P] bool — True where the primitive must be skipped.
    """
    same = excl_prim[:, None] == prim_ids[None, :]
    ef = excl_face[:, None]
    crit = jnp.where(
        ef == FACE_FRONT,
        ~backface,
        jnp.where(ef == FACE_BACK, backface, True),
    )
    return same & crit


def cast(scene: Scene, rays: Rays, active=None) -> Hits:
    """Nearest-hit cast of a ray batch against the whole scene.

    `active` masks out dead lanes (their result is valid=False).
    """
    n = rays.o.shape[0]
    T, S = scene.n_tri, scene.n_sph
    P = T + S
    if active is None:
        active = jnp.ones((n,), dtype=bool)

    face = rays.face[:, None]
    t_parts = []
    back_parts = []

    if T > 0:
        fnT = scene.tri_fn.T  # [3, T]
        no_d = rays.d @ fnT  # [N, T]  (MXU)
        backface_t = no_d > 0.0
        cull = (backface_t & (face == FACE_FRONT)) | (
            (~backface_t) & (face == FACE_BACK)
        )
        excl = _exclusion_mask(
            rays.excl_prim, rays.excl_face, jnp.arange(T, dtype=jnp.int32), backface_t
        )
        o_fn = rays.o @ fnT  # [N, T]  (MXU)
        t = (scene.tri_d[None, :] - o_fn) / no_d  # [N, T]
        # Signed-area inside test, affine in the hit point p = o + t d:
        #   area_i = g_i.o + h_i + t * (g_i.d)
        G = scene.tri_g.reshape(3 * T, 3)  # [3T, 3]
        og = (rays.o @ G.T).reshape(n, T, 3)
        dg = (rays.d @ G.T).reshape(n, T, 3)
        area = og + scene.tri_h[None, :, :] + t[:, :, None] * dg
        inside = ~jnp.any(area < 0.0, axis=-1)
        valid_t = (
            active[:, None]
            & ~cull
            & ~excl
            & (t > 0.0)
            & jnp.isfinite(t)
            & inside
        )
        t_parts.append(jnp.where(valid_t, t, _INF))
        back_parts.append(backface_t)

    if S > 0:
        w = scene.sph_c[None, :, :] - rays.o[:, None, :]  # [N, S, 3]
        d = rays.d[:, None, :]
        cx = jnp.cross(w, d)
        dist2 = jnp.sum(cx * cx, axis=-1)
        r2 = scene.sph_r[None, :] ** 2
        hit_shell = dist2 <= r2  # line_sphere_distance <= radius (265-268)
        tc = jnp.sum(d * w, axis=-1)
        k = jnp.sqrt(jnp.maximum(r2 - dist2, 0.0))
        backface_s = jnp.where(
            face == FACE_FRONT,
            False,
            jnp.where(face == FACE_BACK, True, tc < k),
        )
        t_s = jnp.where(backface_s, tc + k, tc - k)
        prim_ids = T + jnp.arange(S, dtype=jnp.int32)
        excl = _exclusion_mask(rays.excl_prim, rays.excl_face, prim_ids, backface_s)
        valid_s = (
            active[:, None] & hit_shell & (t_s > 0.0) & ~excl & jnp.isfinite(t_s)
        )
        t_parts.append(jnp.where(valid_s, t_s, _INF))
        back_parts.append(backface_s)

    if P == 0:
        z3 = jnp.zeros((n, 3), rays.o.dtype)
        return Hits(
            valid=jnp.zeros((n,), bool),
            t=jnp.full((n,), _INF, rays.o.dtype),
            prim=jnp.full((n,), -1, jnp.int32),
            obj=jnp.zeros((n,), jnp.int32),
            pos=z3,
            normal=z3,
            uv=jnp.zeros((n, 2), rays.o.dtype),
            backface=jnp.zeros((n,), bool),
        )

    t_all = jnp.concatenate(t_parts, axis=1)  # [N, P]
    back_all = jnp.concatenate(back_parts, axis=1)

    t_min = jnp.min(t_all, axis=1)
    hit_any = jnp.isfinite(t_min)
    # Last index among the minima: reference updates nearest on t <= current
    # so later primitives win exact ties (src/main.rs:229-233, 298-302).
    ids = jnp.arange(P, dtype=jnp.int32)[None, :]
    winner = jnp.where(t_all == t_min[:, None], ids, -1)
    win_idx = jnp.max(winner, axis=1)
    win_safe = jnp.maximum(win_idx, 0)

    pos = rays.o + t_min[:, None] * rays.d
    backface = jnp.take_along_axis(back_all, win_safe[:, None], axis=1)[:, 0]

    # --- reconstruct attributes of the winning primitive ---
    is_tri = win_idx < T if T > 0 else jnp.zeros((n,), bool)

    normal = jnp.zeros((n, 3), rays.o.dtype)
    uv = jnp.zeros((n, 2), rays.o.dtype)

    if T > 0:
        ti = jnp.clip(win_safe, 0, T - 1)
        g = scene.tri_g[ti]  # [N, 3, 3]
        h = scene.tri_h[ti]  # [N, 3]
        area = jnp.einsum("nij,nj->ni", g, pos) + h
        bary = area / scene.tri_area2[ti][:, None]  # (235-236)
        tn = scene.tri_n[ti]  # [N, 3, 3]
        tuv = scene.tri_uv[ti]  # [N, 3, 2]
        n_interp = jnp.einsum("ni,nij->nj", bary, tn)
        n_tri = jnp.where(backface[:, None], -n_interp, n_interp)
        uv_tri = jnp.einsum("ni,nik->nk", bary, tuv)
        normal = jnp.where(is_tri[:, None], n_tri, normal)
        uv = jnp.where(is_tri[:, None], uv_tri, uv)

    if S > 0:
        si = jnp.clip(win_safe - T, 0, S - 1)
        c = scene.sph_c[si]
        n_raw = pos - c
        n_unit = n_raw / jnp.sqrt(jnp.sum(n_raw * n_raw, axis=-1, keepdims=True))
        n_sph = jnp.where(backface[:, None], -n_unit, n_unit)
        # Spherical uv from the flipped unit normal (310-313).
        u = jnp.arccos(jnp.clip(n_sph[:, 1], -1.0, 1.0)) / jnp.pi
        v = jnp.arctan2(n_sph[:, 2], n_sph[:, 0]) / (2.0 * jnp.pi) + 0.5
        uv_sph = jnp.stack([u, v], axis=-1)
        normal = jnp.where(is_tri[:, None], normal, n_sph)
        uv = jnp.where(is_tri[:, None], uv, uv_sph)

    obj = scene.prim_obj[win_safe]
    valid = active & hit_any

    return Hits(
        valid=valid,
        t=t_min,
        prim=jnp.where(valid, win_idx, -1),
        obj=jnp.where(valid, obj, 0),
        pos=pos,
        normal=normal,
        uv=uv,
        backface=backface & valid,
    )
