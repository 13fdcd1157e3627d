"""Pallas TPU kernels for the nearest-hit / any-hit sweeps.

The hot op of the renderer (SURVEY.md §3.3): every bounce tests every live
ray against every primitive.  The jnp path (ops/intersect.py) leaves XLA to
fuse ~10 [N, T] intermediates through HBM; these kernels keep the whole
(primitive-table x ray-tile) sweep resident in VMEM and emit only per-ray
winners.

Layout matters on TPU: rays live on the LANE dimension (128-wide) and
primitives on sublanes, so ray inputs are shipped as [3/4, N] rows (dense
lanes) and the primitive tables as [T, 16] / [S, 8] constants — never a
[N, 3] array whose 3-lane rows would be padded 43x to 128 lanes.

Semantics are bit-for-bit the jnp path's (same face culling, exclusion,
inside test, last-wins tie-break — see ops/intersect.py for the reference
citations); tests compare the two lane-by-lane in interpret mode.
Attribute reconstruction stays in jnp (one-hot contractions are winner-
sized, not sweep-sized).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.scene.types import FACE_BACK, FACE_FRONT, Rays, Scene

# Rays per grid program (lane dimension; multiple of 128).  Finer tiles
# give the march kernel better early-exit granularity, coarser ones less
# per-program overhead; 512 measured best on v5e (35.0 vs 30.1 Mrays/s at
# 2048 — march early exit dominates).
TILE_R = int(os.environ.get("RAYTPU_TILE_R", 512))

_BIG = 3.0e38  # stand-in for +inf (avoids inf-inf NaN traps)


def pack_tri(scene: Scene) -> jnp.ndarray:
    """[T, 34] triangle table.

    cols: fn(0:3), d(3), g0(4:7), g1(7:10), g2(10:13), h(13:16),
          n0(16:19), n1(19:22), n2(22:25), uv0(25:27), uv1(27:29),
          uv2(29:31), area2(31), obj(32), pad(33).  The winner sweep uses
    cols 0:16; the march kernel additionally uses the vertex normals and
    area2 for in-kernel interior-normal reconstruction.
    """
    T = scene.n_tri
    return jnp.concatenate(
        [
            scene.tri_fn,  # 0:3
            scene.tri_d[:, None],  # 3
            scene.tri_g[:, 0, :],  # 4:7
            scene.tri_g[:, 1, :],  # 7:10
            scene.tri_g[:, 2, :],  # 10:13
            scene.tri_h,  # 13:16
            scene.tri_n[:, 0, :],  # 16:19
            scene.tri_n[:, 1, :],  # 19:22
            scene.tri_n[:, 2, :],  # 22:25
            scene.tri_uv[:, 0, :],  # 25:27
            scene.tri_uv[:, 1, :],  # 27:29
            scene.tri_uv[:, 2, :],  # 29:31
            scene.tri_area2[:, None],  # 31
            scene.tri_obj[:, None].astype(jnp.float32),  # 32
            jnp.zeros((T, 1), jnp.float32),  # 33
        ],
        axis=1,
    ).astype(jnp.float32)


def pack_sph(scene: Scene) -> jnp.ndarray:
    """[S, 8] sphere table: cols cx, cy, cz, r^2, obj (+3 pad)."""
    S = scene.n_sph
    return jnp.concatenate(
        [
            scene.sph_c,
            (scene.sph_r**2)[:, None],
            scene.sph_obj[:, None].astype(jnp.float32),
            jnp.zeros((S, 3), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)


def _excl_crit(excl_face, backface):
    """Exclusion side criterion (src/main.rs:192-196) as pure boolean
    algebra (no bool-valued selects — Mosaic rejects i1 truncating
    selects): FRONT matches front faces, BACK back faces, BOTH either."""
    is_front = excl_face == FACE_FRONT
    is_back = excl_face == FACE_BACK
    return (is_front & ~backface) | (is_back & backface) | (~is_front & ~is_back)


def _tri_sweep(o, d, face, excl_prim, excl_face, active, tri):
    """Triangle candidates, [T, R] layout.

    o/d: ([1,R],)*3 component rows; face/excl/active: [1, R];
    tri: [T, 16].  Returns (tm [T,R] with _BIG at invalid, backface [T,R]).
    """
    ox, oy, oz = o
    dx, dy, dz = d
    fn0, fn1, fn2 = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]  # [T, 1]
    dpl = tri[:, 3:4]
    no_d = fn0 * dx + fn1 * dy + fn2 * dz  # [T, R]
    o_fn = fn0 * ox + fn1 * oy + fn2 * oz
    backface = no_d > 0.0
    cull = (backface & (face == FACE_FRONT)) | ((~backface) & (face == FACE_BACK))
    t = (dpl - o_fn) / no_d
    ok = t > 0.0
    for e in range(3):
        g0 = tri[:, 4 + 3 * e : 5 + 3 * e]
        g1 = tri[:, 5 + 3 * e : 6 + 3 * e]
        g2 = tri[:, 6 + 3 * e : 7 + 3 * e]
        h = tri[:, 13 + e : 14 + e]
        og = g0 * ox + g1 * oy + g2 * oz
        dg = g0 * dx + g1 * dy + g2 * dz
        ok = ok & (og + h + t * dg >= 0.0)
    prim = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    excl = (excl_prim == prim) & _excl_crit(excl_face, backface)
    valid = active & ~cull & ~excl & jnp.isfinite(t) & ok
    return jnp.where(valid, t, _BIG), backface


def _sph_sweep(o, d, face, excl_prim, excl_face, active, sph, n_tri):
    """Sphere candidates, [S, R] layout: returns (tm, backface)."""
    ox, oy, oz = o
    dx, dy, dz = d
    cx, cy, cz, r2 = sph[:, 0:1], sph[:, 1:2], sph[:, 2:3], sph[:, 3:4]
    wx = cx - ox
    wy = cy - oy
    wz = cz - oz
    px = wy * dz - wz * dy
    py = wz * dx - wx * dz
    pz = wx * dy - wy * dx
    dist2 = px * px + py * py + pz * pz
    tc = dx * wx + dy * wy + dz * wz
    k = jnp.sqrt(jnp.maximum(r2 - dist2, 0.0))
    is_back = face == FACE_BACK
    is_front = face == FACE_FRONT
    backface = is_back | (~is_front & ~is_back & (tc < k))
    t = jnp.where(backface, tc + k, tc - k)
    prim = n_tri + jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    excl = (excl_prim == prim) & _excl_crit(excl_face, backface)
    valid = active & (dist2 <= r2) & (t > 0.0) & ~excl & jnp.isfinite(t)
    return jnp.where(valid, t, _BIG), backface


def _unpack(o_ref, d_ref, meta_ref):
    o = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :])
    d = (d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])
    face = meta_ref[0:1, :]
    excl_prim = meta_ref[1:2, :]
    excl_face = meta_ref[2:3, :]
    active = meta_ref[3:4, :] != 0
    return o, d, face, excl_prim, excl_face, active


def _winner(tm, backface, base):
    """Nearest + last-wins tie-break over the sublane (primitive) axis."""
    sub = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    t_min = jnp.min(tm, axis=0, keepdims=True)  # [1, R]
    win = jnp.max(jnp.where(tm == t_min, sub, -1), axis=0, keepdims=True)
    bf = jnp.sum(
        jnp.where((sub == win) & backface, 1, 0), axis=0, keepdims=True
    )
    return t_min, base + win, bf


def _kernel(o_ref, d_ref, meta_ref, tri_ref, sph_ref, t_ref, idx_ref, bf_ref,
            *, n_tri: int, n_sph: int):
    """One ray tile vs the whole primitive table.

    meta_ref: [4, R] i32 = (face, excl_prim, excl_face, active).
    Outputs: t [1,R] f32 (_BIG on miss), idx [1,R] i32 (-1 on miss),
    bf [1,R] i32.
    """
    o, d, face, excl_prim, excl_face, active = _unpack(o_ref, d_ref, meta_ref)

    shape = (1, o[0].shape[1])
    best_t = jnp.full(shape, _BIG, jnp.float32)
    best_idx = jnp.full(shape, -1, jnp.int32)
    best_bf = jnp.zeros(shape, jnp.int32)

    if n_tri > 0:
        tm, backface = _tri_sweep(o, d, face, excl_prim, excl_face, active,
                                  tri_ref[:, :])
        t_min, win, bf = _winner(tm, backface, 0)
        found = t_min < _BIG
        best_t = jnp.where(found, t_min, best_t)
        best_idx = jnp.where(found, win, best_idx)
        best_bf = jnp.where(found, bf, best_bf)

    if n_sph > 0:
        tm, backface = _sph_sweep(o, d, face, excl_prim, excl_face, active,
                                  sph_ref[:, :], n_tri)
        t_min, win, bf = _winner(tm, backface, n_tri)
        # Sphere wins ties against triangles (spheres scan later,
        # update-on-<=, src/main.rs:298-302).
        found = (t_min < _BIG) & (t_min <= best_t)
        best_t = jnp.where(found, t_min, best_t)
        best_idx = jnp.where(found, win, best_idx)
        best_bf = jnp.where(found, bf, best_bf)

    t_ref[:, :] = best_t
    idx_ref[:, :] = best_idx
    bf_ref[:, :] = best_bf


def _any_kernel(o_ref, d_ref, meta_ref, limit_ref, tri_ref, sph_ref, out_ref,
                *, n_tri: int, n_sph: int):
    """Occlusion predicate tile: out = any(t_candidate < limit)."""
    o, d, face, excl_prim, excl_face, active = _unpack(o_ref, d_ref, meta_ref)
    limit = limit_ref[0:1, :]

    blocked = jnp.zeros((1, o[0].shape[1]), jnp.int32)
    if n_tri > 0:
        tm, _ = _tri_sweep(o, d, face, excl_prim, excl_face, active, tri_ref[:, :])
        blocked = blocked | jnp.any(tm < limit, axis=0, keepdims=True).astype(
            jnp.int32
        )
    if n_sph > 0:
        tm, _ = _sph_sweep(o, d, face, excl_prim, excl_face, active,
                           sph_ref[:, :], n_tri)
        blocked = blocked | jnp.any(tm < limit, axis=0, keepdims=True).astype(
            jnp.int32
        )
    out_ref[:, :] = blocked


def _pad_lanes(x, n_pad):
    if n_pad == 0:
        return x
    return jnp.pad(x, [(0, 0), (0, n_pad)])


def _prep(scene: Scene, rays: Rays, active, n):
    if active is None:
        active = jnp.ones((n,), bool)
    tile = min(TILE_R, max(128, -(-n // 128) * 128))
    n_pad = (-n) % tile
    o_t = _pad_lanes(rays.o.T, n_pad)  # [3, N']
    d_t = _pad_lanes(rays.d.T, n_pad)
    meta = _pad_lanes(
        jnp.stack(
            [rays.face, rays.excl_prim, rays.excl_face, active.astype(jnp.int32)],
            axis=0,
        ),
        n_pad,
    )  # padded lanes have active=0
    tri = pack_tri(scene) if scene.n_tri > 0 else jnp.zeros((8, 16), jnp.float32)
    sph = pack_sph(scene) if scene.n_sph > 0 else jnp.zeros((8, 8), jnp.float32)
    return o_t, d_t, meta, tri, sph, active, tile, (n + n_pad) // tile


def _ray_specs(tile, tri_shape, sph_shape):
    return [
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(tri_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(sph_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_hit(scene: Scene, rays: Rays, active=None, interpret: bool = False):
    """Winner sweep via Pallas: returns (t [N], idx [N], backface [N], valid [N]).

    t is +inf on miss (converted from the kernel's finite sentinel).
    """
    n = rays.o.shape[0]
    o_t, d_t, meta, tri, sph, active, tile, grid = _prep(scene, rays, active, n)
    npad = o_t.shape[1]

    kernel = functools.partial(_kernel, n_tri=scene.n_tri, n_sph=scene.n_sph)
    specs = _ray_specs(tile, tri.shape, sph.shape)
    out_spec = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    t, idx, bf = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=specs,
        out_specs=[out_spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ],
        interpret=interpret,
    )(o_t, d_t, meta, tri, sph)

    t = t[0, :n]
    idx = idx[0, :n]
    valid = active & (t < _BIG)
    t = jnp.where(valid, t, jnp.inf)
    return t, idx, bf[0, :n] != 0, valid


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit(scene: Scene, rays: Rays, active=None, limit=None,
            interpret: bool = False):
    """Occlusion sweep via Pallas: any valid candidate with t < limit.

    limit: [N] or None (any hit at all).  Returns bool [N].
    """
    n = rays.o.shape[0]
    if limit is None:
        limit = jnp.full((n,), _BIG, jnp.float32)
    else:
        limit = jnp.minimum(limit, _BIG)
    o_t, d_t, meta, tri, sph, active, tile, grid = _prep(scene, rays, active, n)
    lim = _pad_lanes(limit[None, :], o_t.shape[1] - n)

    kernel = functools.partial(_any_kernel, n_tri=scene.n_tri, n_sph=scene.n_sph)
    specs = _ray_specs(tile, tri.shape, sph.shape)
    specs.insert(3, pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM))
    blocked = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, o_t.shape[1]), jnp.int32),
        interpret=interpret,
    )(o_t, d_t, meta, lim, tri, sph)
    return blocked[0, :n] != 0


# ---------------------------------------------------------------------------
# Fused multi-light shadow predicate
# ---------------------------------------------------------------------------


def _shadow_kernel(o_ref, d_ref, excl_ref, limit_ref, tlim_ref, lmeta_ref,
                   act_ref, tri_ref, sph_ref, out_ref, *, n_tri: int,
                   n_sph: int, n_light: int):
    """All lights' shadow sweeps in one launch.

    Shadow rays share their origin (the shading point), so the origin-
    dependent plane terms (fn.o, the edge ogh terms, num = dpl - fn.o)
    are computed once and reused across lights.  The per-light triangle
    terms use the FACTORED-TARGET algebra of kernel_common._ShadowSweep
    (identical expressions — kernel-vs-jnp parity stays bit-exact): a
    shadow ray aims at a fixed light, so its direction-dependent dot
    products factor through per-triangle constants c_fn / c_g built from
    the light's target point (position lights, scaled t in (0,1)) or
    constant direction (directional lights, real-unit t).  Shadow rays
    are face=Back with exclusion (prim, BACK) — against the Back-face-
    only candidate set the exclusion reduces to "not the source
    primitive" (src/main.rs:425-448).  Sphere tests keep the normalized
    per-light direction + real-distance limit.

    o_ref [3,R]; d_ref [3L,R] normalized dirs (spheres); excl [1,R] i32;
    limit [L,R] real-unit limits (spheres); tlim [L,R] triangle t limits;
    lmeta [L,8] (s, tx, ty, tz, ...); act [L,R] i32; out [L,R] i32.
    """
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    excl_prim = excl_ref[0:1, :]

    # origin-dependent terms, shared across lights
    if n_tri > 0:
        tri = tri_ref[:, :]
        fn0, fn1, fn2 = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        dpl = tri[:, 3:4]
        o_fn = fn0 * ox + fn1 * oy + fn2 * oz
        num = dpl - o_fn
        num_pos = num > 0.0
        ogh = []
        for e in range(3):
            g0 = tri[:, 4 + 3 * e : 5 + 3 * e]
            g1 = tri[:, 5 + 3 * e : 6 + 3 * e]
            g2 = tri[:, 6 + 3 * e : 7 + 3 * e]
            h = tri[:, 13 + e : 14 + e]
            ogh.append(g0 * ox + g1 * oy + g2 * oz + h)
        tri_prim = jax.lax.broadcasted_iota(jnp.int32, o_fn.shape, 0)
        not_self_tri = excl_prim != tri_prim
    if n_sph > 0:
        sph = sph_ref[:, :]
        cx, cy, cz, r2 = sph[:, 0:1], sph[:, 1:2], sph[:, 2:3], sph[:, 3:4]
        wx = cx - ox
        wy = cy - oy
        wz = cz - oz
        sph_prim = n_tri + jax.lax.broadcasted_iota(
            jnp.int32, wx.shape, 0
        )
        not_self_sph = excl_prim != sph_prim

    for l in range(n_light):
        active = act_ref[l : l + 1, :] != 0
        blocked = jnp.zeros((1, ox.shape[1]), jnp.int32)

        if n_tri > 0:
            s = lmeta_ref[l : l + 1, 0:1]
            # lane-replicated copy for [T,R] products (Mosaic has no
            # both-axes broadcast; [1,1] -> [1,R] is lanes-only, legal)
            sr = s + jnp.zeros((1, ox.shape[1]), jnp.float32)
            tx = lmeta_ref[l : l + 1, 1:2]
            ty = lmeta_ref[l : l + 1, 2:3]
            tz = lmeta_ref[l : l + 1, 3:4]
            tlim = tlim_ref[l : l + 1, :]
            c_fn = fn0 * tx + fn1 * ty + fn2 * tz  # [T, 1]
            no_d = c_fn - sr * o_fn
            t = num / no_d
            ok = (no_d > 0.0) & num_pos & not_self_tri
            for e in range(3):
                g0 = tri[:, 4 + 3 * e : 5 + 3 * e]
                g1 = tri[:, 5 + 3 * e : 6 + 3 * e]
                g2 = tri[:, 6 + 3 * e : 7 + 3 * e]
                h = tri[:, 13 + e : 14 + e]
                c_g = g0 * tx + g1 * ty + g2 * tz + s * h  # [T, 1]
                ok = ok & (ogh[e] + t * (c_g - sr * ogh[e]) >= 0.0)
            ok = ok & active & jnp.isfinite(t) & (t < tlim)
            blocked = blocked | jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)

        if n_sph > 0:
            dx = d_ref[3 * l : 3 * l + 1, :]
            dy = d_ref[3 * l + 1 : 3 * l + 2, :]
            dz = d_ref[3 * l + 2 : 3 * l + 3, :]
            limit = limit_ref[l : l + 1, :]
            px = wy * dz - wz * dy
            py = wz * dx - wx * dz
            pz = wx * dy - wy * dx
            dist2 = px * px + py * py + pz * pz
            tc = dx * wx + dy * wy + dz * wz
            kk = jnp.sqrt(jnp.maximum(r2 - dist2, 0.0))
            t = tc + kk  # Back rays take the far shell
            ok = (
                active & (dist2 <= r2) & (t > 0.0) & not_self_sph
                & jnp.isfinite(t) & (t < limit)
            )
            blocked = blocked | jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)

        out_ref[l : l + 1, :] = blocked


@functools.partial(jax.jit, static_argnames=("interpret",))
def shadow_any_hit(scene: Scene, pos, dirs, excl_prim, limits, actives,
                   interpret: bool = False):
    """Fused shadow predicate for all lights.

    pos [N,3]; dirs [L,N,3] (normalized, toward each light); excl_prim
    [N] (the shaded primitive, excluded on its back side); limits [L,N]
    real-unit occluder limits; actives [L,N].  Returns blocked [L,N]
    bool.  The light target metadata for the factored triangle algebra
    (s, target point/direction, scaled limit — see _shadow_kernel) is
    derived from the scene's light table here.
    """
    L, n = dirs.shape[0], pos.shape[0]
    tile = min(TILE_R, max(128, -(-n // 128) * 128))
    n_pad = (-n) % tile
    grid = (n + n_pad) // tile

    def pad(x):
        return jnp.pad(x, [(0, 0), (0, n_pad)]) if n_pad else x

    # factored-target light metadata (matches kernel_common.get_shade's
    # occ dict: position lights aim at L with scaled t in (0,1);
    # directional lights keep -light_dir and the real limit — they may
    # still carry an origin, lights.rs:48-52)
    from raytracer_tpu.scene.types import LIGHT_DIRECTIONAL

    is_dir = (scene.light_type == LIGHT_DIRECTIONAL)[:L, None]  # [L, 1]
    tgt = jnp.where(is_dir, -scene.light_dir[:L], scene.light_origin[:L])
    lmeta = jnp.concatenate(
        [jnp.where(is_dir, 0.0, 1.0), tgt,
         jnp.zeros((L, 4), jnp.float32)],
        axis=1,
    ).astype(jnp.float32)  # [L, 8]
    lim_real = jnp.minimum(limits, _BIG)
    tlims = jnp.where(is_dir, lim_real, 1.0)  # [L, N]

    o_t = pad(pos.T)
    d_t = pad(dirs.transpose(0, 2, 1).reshape(3 * L, n))
    e_t = pad(excl_prim[None, :])
    lim_t = pad(lim_real)
    tlim_t = pad(tlims)
    act_t = pad(actives.astype(jnp.int32))
    tri = pack_tri(scene) if scene.n_tri > 0 else jnp.zeros((8, 34), jnp.float32)
    sph = pack_sph(scene) if scene.n_sph > 0 else jnp.zeros((8, 8), jnp.float32)

    kernel = functools.partial(
        _shadow_kernel, n_tri=scene.n_tri, n_sph=scene.n_sph, n_light=L
    )
    row = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    blocked = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            row(3), row(3 * L), row(1), row(L), row(L),
            pl.BlockSpec(lmeta.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            row(L),
            pl.BlockSpec(tri.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sph.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=row(L),
        out_shape=jax.ShapeDtypeStruct((L, o_t.shape[1]), jnp.int32),
        interpret=interpret,
    )(o_t, d_t, e_t, lim_t, tlim_t, lmeta, act_t, tri, sph)
    return blocked[:, :n] != 0
