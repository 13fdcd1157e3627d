"""Fused Whitted bounce-level kernel.

One wavefront level of the flattened ray_trace recursion (ops/trace.py
_process_level == one recursion depth of src/main.rs:466-519) as ONE Pallas
launch per pool: nearest cast with full attributes, direct shading with all
shadow sweeps, the refract child's whole interior march (src/main.rs:343-
405), and both children's emission — all per 512-ray tile in VMEM.  The jnp
path runs the same level as ~6 dispatches (sweep kernel, one-hot attribute
matmuls, material eval, shadow kernel, march kernel, child elementwise)
with every [K]-sized intermediate round-tripping HBM.

Radiance delivery follows the pending chain (ops/trace.py Pool): `direct`
levels (identity-slot or final) emit their radiance through `contrib`;
other pooled levels fold it into exactly one child's `pending` rows so the
framebuffer pays one scatter-add per frame instead of one per level.

Group compaction of the emitted children and the framebuffer scatter-add
stay OUTSIDE (ops/trace.py) — they are cross-tile operations.

`last`/`direct` are STATIC: the final level is peeled out of the tail loop
(trace.py), so each level position compiles its own kernel variant once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops import kernel_common as kc
from raytracer_tpu.ops.intersect_pallas import TILE_R, pack_sph, pack_tri
from raytracer_tpu.scene.types import FACE_BACK, FACE_FRONT, Scene

_BIG = kc._BIG


def _level_kernel(o_ref, d_ref, meta_ref, cs_ref, g1_ref,
                  g2_ref, g3_ref, sph_ref, mat_ref, mat_T_ref, light_ref,
                  contrib_ref, rchild_f_ref, rchild_i_ref, fchild_f_ref,
                  fchild_i_ref, casts_ref,
                  *, last: bool, direct: bool, blocked: bool, n_chunks: int,
                  n_tri: int, n_sph: int, n_light: int, threshold: float,
                  max_distance: float, max_retries: int, textures):
    """meta rows: face, excl_prim, excl_face, slot, alive (i32).
    cs rows: c (contribution), s (scale), pending rgb.
    g1/g2: dense (tri [T,34], tri_T [34,T]) or blocked (tblk [T_pad,48],
    boxes8 [NCH*8,8]) geometry operands (kernel_common Geom strategies).
    Child outputs: floats [11,R] = o(3), d(3), c, s, pending(3); ints
    [5,R] = face, excl_prim, excl_face, slot, alive."""
    o = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :])
    d = (d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])
    face = meta_ref[0:1, :]
    excl_prim = meta_ref[1:2, :]
    excl_face = meta_ref[2:3, :]
    slot = meta_ref[3:4, :]
    alive = meta_ref[4:5, :] != 0
    c = cs_ref[0:1, :]
    s = cs_ref[1:2, :]
    pend = (cs_ref[2:3, :], cs_ref[3:4, :], cs_ref[4:5, :])
    sph = sph_ref[:, :]
    if blocked:
        geom = kc.BlockedGeom(g1_ref, g2_ref, g3_ref, sph, n_tri, n_sph,
                              n_chunks)
    else:
        geom = kc.DenseGeom(g1_ref[:, :], g2_ref[:, :], sph, n_tri, n_sph)
    mat_t = mat_ref[:, :]
    mat_T = mat_T_ref[:, :]
    lights = light_ref[:, :]
    shape = (1, o[0].shape[1])

    # Compaction packs live groups to the FRONT of the pool, so a tile past
    # the live prefix has no rays to trace — skip its sweeps/shade/march
    # for one any() check.  Zombie lanes (alive=0, pending != 0) may still
    # sit here: their pending is delivered (direct) or forwarded on the
    # reflect child (pooled) without any geometry work.
    @pl.when(jnp.logical_not(jnp.any(alive)))
    def _():
        zf = jnp.zeros((1, shape[1]), jnp.float32)
        zi = jnp.zeros((1, shape[1]), jnp.int32)
        for r in range(11):
            rchild_f_ref[r : r + 1, :] = zf
            fchild_f_ref[r : r + 1, :] = zf
        for r in range(5):
            rchild_i_ref[r : r + 1, :] = zi
            fchild_i_ref[r : r + 1, :] = zi
        if direct:
            for r in range(3):
                contrib_ref[r : r + 1, :] = pend[r]
        else:
            for r in range(3):
                contrib_ref[r : r + 1, :] = zf
            for r in range(3):  # pending rides the reflect child
                rchild_f_ref[8 + r : 9 + r, :] = pend[r]
            rchild_i_ref[3:4, :] = slot
        casts_ref[:, :] = zi

    @pl.when(jnp.any(alive))
    def _():
        _level_body(o, d, face, excl_prim, excl_face, slot, alive, c, s,
                    pend, geom, mat_t, mat_T, lights,
                    contrib_ref, rchild_f_ref, rchild_i_ref, fchild_f_ref,
                    fchild_i_ref, casts_ref,
                    last=last, direct=direct, n_light=n_light,
                    threshold=threshold, max_distance=max_distance,
                    max_retries=max_retries, textures=textures)


def _level_body(o, d, face, excl_prim, excl_face, slot, alive, c, s,
                pend, geom, mat_t, mat_T, lights,
                contrib_ref, rchild_f_ref, rchild_i_ref, fchild_f_ref,
                fchild_i_ref, casts_ref,
                *, last, direct, n_light, threshold, max_distance,
                max_retries, textures):
    shape = (1, o[0].shape[1])

    h = geom.nearest(o, d, face, excl_prim, excl_face, alive)
    live = alive & h["valid"]
    casts = alive.astype(jnp.int32)

    m = kc.eval_material(mat_t, textures, h["obj"], h["u"], h["v"], mat_T)
    shade_c = (1.0 - m["shiness"]) * (1.0 - m["transparency"])
    refl_c = m["shiness"] * (1.0 - m["transparency"])
    refr_c = m["transparency"]

    # direct shade iff c*shade_c >= THRESHOLD (main.rs:482); at the last
    # level the local shade weight does not apply (488-490)
    need_shade = live & (c * shade_c >= threshold)
    nax, nay, naz = kc.rotate_from_z(h["nx"], h["ny"], h["nz"],
                                     m["tnx"], m["tny"], m["tnz"])
    sweep = geom.shadow_sweep(h["px"], h["py"], h["pz"], h["prim"])
    shr, shg, shb, cnt = kc.get_shade(
        m, lights, h["px"], h["py"], h["pz"], nax, nay, naz,
        -d[0], -d[1], -d[2], need_shade, sweep, n_light,
    )
    casts = casts + cnt
    coef = s if last else s * shade_c
    p_new = (
        pend[0] + jnp.where(need_shade, shr * coef, 0.0),
        pend[1] + jnp.where(need_shade, shg * coef, 0.0),
        pend[2] + jnp.where(need_shade, shb * coef, 0.0),
    )

    if last:
        # final level: no children (main.rs:488-490) — deliver pending +
        # shade through contrib, skip reflect/march entirely
        zf = jnp.zeros(shape, jnp.float32)
        zi = jnp.zeros(shape, jnp.int32)
        for r in range(11):
            rchild_f_ref[r : r + 1, :] = zf
            fchild_f_ref[r : r + 1, :] = zf
        for r in range(5):
            rchild_i_ref[r : r + 1, :] = zi
            fchild_i_ref[r : r + 1, :] = zi
        for r in range(3):
            contrib_ref[r : r + 1, :] = p_new[r]
        casts_ref[:, :] = casts
        return

    # reflect child (main.rs:493-500, get_reflect 328-341)
    c_r = c * refl_c
    want_r = live & (c_r >= threshold)
    fx, fy, fz = kc.reflect3(d[0], d[1], d[2], h["nx"], h["ny"], h["nz"])
    excl_face_r = jnp.where(h["backface"], FACE_FRONT, FACE_BACK)
    rchild_f_ref[0:1, :] = h["px"]
    rchild_f_ref[1:2, :] = h["py"]
    rchild_f_ref[2:3, :] = h["pz"]
    rchild_f_ref[3:4, :] = fx
    rchild_f_ref[4:5, :] = fy
    rchild_f_ref[5:6, :] = fz
    rchild_f_ref[6:7, :] = c_r
    rchild_f_ref[7:8, :] = s * refl_c
    rchild_i_ref[0:1, :] = face  # child keeps the incoming face (341)
    rchild_i_ref[1:2, :] = h["prim"]
    rchild_i_ref[2:3, :] = excl_face_r
    rchild_i_ref[3:4, :] = slot
    rchild_i_ref[4:5, :] = want_r.astype(jnp.int32)

    # refract child (main.rs:502-514): whole interior march in-kernel
    c_f = c * refr_c
    want_f = live & (c_f > threshold)  # strict > (504)
    mm = geom.march(h["px"], h["py"], h["pz"], h["nx"], h["ny"], h["nz"],
                    d[0], d[1], d[2], m["refraction"], want_f,
                    max_distance, max_retries)
    casts = casts + mm["iters"]
    decay = kc.powf(m["decay"], mm["travel"])  # opaque_decay^travel (508)
    alive_f = want_f & mm["escaped"]
    fchild_f_ref[0:1, :] = mm["ex"]
    fchild_f_ref[1:2, :] = mm["ey"]
    fchild_f_ref[2:3, :] = mm["ez"]
    fchild_f_ref[3:4, :] = mm["odx"]
    fchild_f_ref[4:5, :] = mm["ody"]
    fchild_f_ref[5:6, :] = mm["odz"]
    fchild_f_ref[6:7, :] = c_f
    fchild_f_ref[7:8, :] = s * refr_c * decay
    fchild_i_ref[0:1, :] = jnp.full(shape, FACE_FRONT, jnp.int32)
    fchild_i_ref[1:2, :] = mm["prim"]
    fchild_i_ref[2:3, :] = jnp.full(shape, FACE_BACK, jnp.int32)
    fchild_i_ref[3:4, :] = slot
    fchild_i_ref[4:5, :] = alive_f.astype(jnp.int32)

    # radiance delivery: direct levels emit through contrib; pooled levels
    # ride p_new on exactly one child (reflect by default — including the
    # zombie case where both children died — refract when only it lives)
    zf = jnp.zeros(shape, jnp.float32)
    if direct:
        for r in range(3):
            contrib_ref[r : r + 1, :] = p_new[r]
            rchild_f_ref[8 + r : 9 + r, :] = zf
            fchild_f_ref[8 + r : 9 + r, :] = zf
    else:
        carrier_f = (~want_r) & alive_f
        for r in range(3):
            contrib_ref[r : r + 1, :] = zf
            rchild_f_ref[8 + r : 9 + r, :] = jnp.where(carrier_f, 0.0, p_new[r])
            fchild_f_ref[8 + r : 9 + r, :] = jnp.where(carrier_f, p_new[r], 0.0)

    casts_ref[:, :] = casts


@functools.partial(
    jax.jit,
    static_argnames=("textures", "last", "direct", "threshold",
                     "max_distance", "max_retries", "interpret"),
)
def process_level(scene: Scene, textures, pool_o, pool_d, pool_face,
                  pool_excl_prim, pool_excl_face, pool_slot, pool_c, pool_s,
                  pool_pending, pool_alive, last: bool, direct: bool,
                  threshold: float, max_distance: float,
                  max_retries: int, interpret: bool = False):
    """Run one fused wavefront level over a K-slot pool.

    `last`/`direct` are static bools.  Returns (contrib [K,3],
    reflect_child dict, refract_child dict, casts scalar) with child dicts
    holding the Pool field arrays (ops/trace.py assembles them)."""
    n = pool_o.shape[0]
    tile = min(TILE_R, max(128, -(-n // 128) * 128))
    n_pad = (-n) % tile
    grid = (n + n_pad) // tile

    def prep_rows(x):
        return jnp.pad(x, [(0, 0), (0, n_pad)]) if n_pad else x

    o_t = prep_rows(pool_o.T)
    d_t = prep_rows(pool_d.T)
    meta = prep_rows(jnp.stack([pool_face, pool_excl_prim, pool_excl_face,
                                pool_slot, pool_alive.astype(jnp.int32)]))
    cs = prep_rows(jnp.concatenate(
        [jnp.stack([pool_c, pool_s]), pool_pending.T], axis=0
    ))
    blocked = scene.blk_perm is not None and scene.n_tri > 0
    if blocked:
        g1 = kc.pack_tri_blocked(scene)  # [T_pad, 48]
        g2 = kc.pack_boxes8(scene)  # [NCH*8, 8]
        g3 = kc.pack_sup8(scene)  # [NSUP*8, 8]
        n_chunks = scene.blk_box.shape[0]
    else:
        g1 = pack_tri(scene) if scene.n_tri > 0 else jnp.zeros((8, 34), jnp.float32)
        g2 = g1.T  # winner-attr matmul operand
        g3 = jnp.zeros((8, 8), jnp.float32)
        n_chunks = 0
    sph = pack_sph(scene) if scene.n_sph > 0 else jnp.zeros((8, 8), jnp.float32)
    mat_t = kc.pack_materials(scene)
    mat_T = mat_t.T
    lights = kc.pack_lights(scene)

    kernel = functools.partial(
        _level_kernel, last=last, direct=direct,
        blocked=blocked, n_chunks=n_chunks,
        n_tri=scene.n_tri, n_sph=scene.n_sph,
        n_light=scene.n_light, threshold=threshold,
        max_distance=max_distance, max_retries=max_retries, textures=textures,
    )
    row = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    npad = o_t.shape[1]
    contrib, rch_f, rch_i, fch_f, fch_i, casts = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            row(3), row(3), row(5), row(5),
            const(g1), const(g2), const(g3), const(sph), const(mat_t),
            const(mat_T), const(lights),
        ],
        out_specs=[row(3), row(11), row(5), row(11), row(5), row(1)],
        out_shape=[
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
            jax.ShapeDtypeStruct((11, npad), jnp.float32),
            jax.ShapeDtypeStruct((5, npad), jnp.int32),
            jax.ShapeDtypeStruct((11, npad), jnp.float32),
            jax.ShapeDtypeStruct((5, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ],
        interpret=interpret,
    )(o_t, d_t, meta, cs, g1, g2, g3, sph, mat_t, mat_T, lights)

    def child(f, i):
        return dict(
            o=f[0:3, :n].T, d=f[3:6, :n].T, c=f[6, :n], s=f[7, :n],
            pending=f[8:11, :n].T,
            face=i[0, :n], excl_prim=i[1, :n], excl_face=i[2, :n],
            slot=i[3, :n], alive=i[4, :n] != 0,
        )

    return (contrib[:, :n].T, child(rch_f, rch_i), child(fch_f, fch_i),
            jnp.sum(casts[0, :n]))
