"""Fused Whitted bounce-level kernel.

One wavefront level of the flattened ray_trace recursion (ops/trace.py
_process_level == one recursion depth of src/main.rs:466-519) as ONE Pallas
launch per pool: nearest cast with full attributes, direct shading with all
shadow sweeps, the refract child's whole interior march (src/main.rs:343-
405), and both children's emission — all per 512-ray tile in VMEM.  The jnp
path runs the same level as ~6 dispatches (sweep kernel, one-hot attribute
matmuls, material eval, shadow kernel, march kernel, child elementwise)
with every [K]-sized intermediate round-tripping HBM.

Packed pool layout (the kernel's native row layout, kept END-TO-END by
ops/trace.py so levels chain with no per-field packing/unpacking — the
round-2 profile showed ~50 ms/frame of XLA "data formatting" between
levels, VERDICT r2 weak #1):

  rows 0-2   o (ray origin xyz)          f32
  rows 3-5   d (ray direction xyz)       f32
  row  6     c (contribution)            f32
  row  7     s (accumulated scale)       f32
  rows 8-10  pending radiance rgb        f32
  row  11    face                        i32 bits
  row  12    excl_prim                   i32 bits
  row  13    excl_face                   i32 bits
  row  14    slot (output pixel index)   i32 bits
  row  15    alive                       i32 bits

Int rows ride as raw f32 bit patterns (pltpu.bitcast in-kernel, pure
copies outside) — exactly the trick ops/trace.py's packed compaction
scatter already used, now extended through the kernel boundary.

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

# packed row indices
ROW_O, ROW_D, ROW_C, ROW_S, ROW_PEND = 0, 3, 6, 7, 8
ROW_FACE, ROW_EXCL_PRIM, ROW_EXCL_FACE, ROW_SLOT, ROW_ALIVE = 11, 12, 13, 14, 15
N_ROWS = 16


def _iload(ref, r):
    return pltpu.bitcast(ref[r : r + 1, :], jnp.int32)


def _istore(ref, r, val):
    ref[r : r + 1, :] = pltpu.bitcast(val, jnp.float32)


def _level_kernel(pp_ref, order_ref, g1_ref, g2_ref, g3_ref, sph_ref,
                  mat_ref, mat_T_ref, light_ref,
                  contrib_ref, rch_ref, fch_ref, casts_ref,
                  *scratch,
                  last: bool, direct: bool, blocked: bool, n_chunks: int,
                  n_tri: int, n_sph: int, n_light: int, threshold: float,
                  max_distance: float, max_retries: int, textures):
    """pp: packed pool rows (see module docstring).  Children come out in
    the SAME packed layout, ready for the group-compaction scatter.
    `scratch` (chunk VMEM buffer + DMA semaphore) is present only when the
    blocked table is HBM-streamed (kernel_common.ChunkTable)."""
    if scratch:
        g1_ref = kc.ChunkTable(g1_ref, scratch[0], scratch[1])
    alive = _iload(pp_ref, ROW_ALIVE) != 0
    pend = (pp_ref[8:9, :], pp_ref[9:10, :], pp_ref[10:11, :])
    shape = (1, pp_ref.shape[1])
    # program_id is only lowerable at kernel top level (kc._order_row);
    # the pl.when bodies below must not read it themselves
    row8 = kc._order_row(order_ref, "levels")

    # Compaction packs live groups to the FRONT of the pool, so a tile past
    # the live prefix has no rays to trace — skip its sweeps/shade/march
    # for one any() check.  Zombie lanes (alive=0, pending != 0) may still
    # sit here: their pending is delivered (direct) or forwarded on the
    # reflect child (pooled) without any geometry work.
    @pl.when(jnp.logical_not(jnp.any(alive)))
    def _():
        zf = jnp.zeros(shape, jnp.float32)
        for r in range(N_ROWS):
            rch_ref[r : r + 1, :] = zf
            fch_ref[r : r + 1, :] = zf
        if direct:
            for r in range(3):
                contrib_ref[r : r + 1, :] = pend[r]
        else:
            for r in range(3):
                contrib_ref[r : r + 1, :] = zf
            for r in range(3):  # pending rides the (dead) reflect child
                rch_ref[ROW_PEND + r : ROW_PEND + r + 1, :] = pend[r]
            rch_ref[ROW_SLOT : ROW_SLOT + 1, :] = pp_ref[ROW_SLOT : ROW_SLOT + 1, :]
        casts_ref[:, :] = jnp.zeros(shape, jnp.int32)

    @pl.when(jnp.any(alive))
    def _():
        _level_body(pp_ref, alive, pend, order_ref, g1_ref, g2_ref, g3_ref,
                    sph_ref, mat_ref, mat_T_ref, light_ref,
                    contrib_ref, rch_ref, fch_ref, casts_ref,
                    row8=row8, last=last, direct=direct, blocked=blocked,
                    n_chunks=n_chunks, n_tri=n_tri, n_sph=n_sph,
                    n_light=n_light, threshold=threshold,
                    max_distance=max_distance, max_retries=max_retries,
                    textures=textures)


def _level_body(pp_ref, alive, pend, order_ref, g1_ref, g2_ref, g3_ref,
                sph_ref, mat_ref, mat_T_ref, light_ref,
                contrib_ref, rch_ref, fch_ref, casts_ref,
                *, row8, last, direct, blocked, n_chunks, n_tri, n_sph,
                n_light, threshold, max_distance, max_retries, textures):
    o = (pp_ref[0:1, :], pp_ref[1:2, :], pp_ref[2:3, :])
    d = (pp_ref[3:4, :], pp_ref[4:5, :], pp_ref[5:6, :])
    c = pp_ref[6:7, :]
    s = pp_ref[7:8, :]
    face = _iload(pp_ref, ROW_FACE)
    excl_prim = _iload(pp_ref, ROW_EXCL_PRIM)
    excl_face = _iload(pp_ref, ROW_EXCL_FACE)
    sph = sph_ref[:, :]
    if blocked:
        geom = kc.BlockedGeom(g1_ref, g2_ref, g3_ref, sph, n_tri, n_sph,
                              n_chunks, order_ref=order_ref, row8=row8,
                              family="levels")
    else:
        geom = kc.DenseGeom(g1_ref[:, :], g2_ref[:, :], sph, n_tri, n_sph)
    mat_t = mat_ref[:, :]
    mat_T = mat_T_ref[:, :]
    lights = light_ref[:, :]
    shape = (1, pp_ref.shape[1])

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
        for r in range(N_ROWS):
            rch_ref[r : r + 1, :] = zf
            fch_ref[r : r + 1, :] = zf
        for r in range(3):
            contrib_ref[r : r + 1, :] = p_new[r]
        casts_ref[:, :] = casts
        return

    # reflect child (main.rs:493-500, get_reflect 328-341)
    c_r = c * refl_c
    want_r = live & (c_r >= threshold)
    fx, fy, fz = kc.reflect3(d[0], d[1], d[2], h["nx"], h["ny"], h["nz"])
    excl_face_r = jnp.where(h["backface"], FACE_FRONT, FACE_BACK)
    rch_ref[0:1, :] = h["px"]
    rch_ref[1:2, :] = h["py"]
    rch_ref[2:3, :] = h["pz"]
    rch_ref[3:4, :] = fx
    rch_ref[4:5, :] = fy
    rch_ref[5:6, :] = fz
    rch_ref[6:7, :] = c_r
    rch_ref[7:8, :] = s * refl_c
    # child keeps the incoming face (341): copy the raw bits
    rch_ref[ROW_FACE : ROW_FACE + 1, :] = pp_ref[ROW_FACE : ROW_FACE + 1, :]
    _istore(rch_ref, ROW_EXCL_PRIM, h["prim"])
    _istore(rch_ref, ROW_EXCL_FACE, excl_face_r)
    rch_ref[ROW_SLOT : ROW_SLOT + 1, :] = pp_ref[ROW_SLOT : ROW_SLOT + 1, :]
    _istore(rch_ref, ROW_ALIVE, want_r.astype(jnp.int32))

    # refract child (main.rs:502-514): whole interior march in-kernel
    c_f = c * refr_c
    want_f = live & (c_f > threshold)  # strict > (504)
    mm = geom.march(h["px"], h["py"], h["pz"], h["nx"], h["ny"], h["nz"],
                    d[0], d[1], d[2], m["refraction"], want_f,
                    max_distance, max_retries)
    casts = casts + mm["iters"]
    decay = kc.powf(m["decay"], mm["travel"])  # opaque_decay^travel (508)
    alive_f = want_f & mm["escaped"]
    fch_ref[0:1, :] = mm["ex"]
    fch_ref[1:2, :] = mm["ey"]
    fch_ref[2:3, :] = mm["ez"]
    fch_ref[3:4, :] = mm["odx"]
    fch_ref[4:5, :] = mm["ody"]
    fch_ref[5:6, :] = mm["odz"]
    fch_ref[6:7, :] = c_f
    fch_ref[7:8, :] = s * refr_c * decay
    _istore(fch_ref, ROW_FACE, jnp.full(shape, FACE_FRONT, jnp.int32))
    _istore(fch_ref, ROW_EXCL_PRIM, mm["prim"])
    _istore(fch_ref, ROW_EXCL_FACE, jnp.full(shape, FACE_BACK, jnp.int32))
    fch_ref[ROW_SLOT : ROW_SLOT + 1, :] = pp_ref[ROW_SLOT : ROW_SLOT + 1, :]
    _istore(fch_ref, ROW_ALIVE, alive_f.astype(jnp.int32))

    # radiance delivery: direct levels emit through contrib; pooled levels
    # ride p_new on exactly one child (reflect by default — including the
    # zombie case where both children died — refract when only it lives)
    zf = jnp.zeros(shape, jnp.float32)
    if direct:
        for r in range(3):
            contrib_ref[r : r + 1, :] = p_new[r]
            rch_ref[ROW_PEND + r : ROW_PEND + r + 1, :] = zf
            fch_ref[ROW_PEND + r : ROW_PEND + r + 1, :] = zf
    else:
        carrier_f = (~want_r) & alive_f
        for r in range(3):
            contrib_ref[r : r + 1, :] = zf
            rch_ref[ROW_PEND + r : ROW_PEND + r + 1, :] = jnp.where(
                carrier_f, 0.0, p_new[r]
            )
            fch_ref[ROW_PEND + r : ROW_PEND + r + 1, :] = jnp.where(
                carrier_f, p_new[r], 0.0
            )

    casts_ref[:, :] = casts


@functools.partial(
    jax.jit,
    static_argnames=("textures", "last", "direct", "threshold",
                     "max_distance", "max_retries", "interpret"),
)
def process_level(scene: Scene, textures, pool_packed, last: bool,
                  direct: bool, threshold: float, max_distance: float,
                  max_retries: int, interpret: bool = False):
    """Run one fused wavefront level over a packed [16, K] pool.

    `last`/`direct` are static bools.  Returns (contrib [3, K],
    reflect_child [16, K], refract_child [16, K], casts scalar) — children
    in the same packed layout (ops/trace.py compacts them)."""
    n = pool_packed.shape[1]
    tile = min(TILE_R, max(128, -(-n // 128) * 128))
    n_pad = (-n) % tile
    grid = (n + n_pad) // tile

    pp = jnp.pad(pool_packed, [(0, 0), (0, n_pad)]) if n_pad else pool_packed
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
    # Large blocked tables stay in HBM; the kernel DMAs one chunk at a
    # time into a VMEM scratch (kernel_common.ChunkTable) — only chunks
    # some lane's ray enters pay the copy.
    g1, g1_spec, scratch_shapes = kc.stream_spec(g1, blocked)
    npad = pp.shape[1]
    # per-tile supergroup visit order (front-to-back from the tile's
    # alive-origin centroid, kc.sup_visit_order) so the blocked sweeps'
    # tmax prunes the chunks behind the first hits; dense scenes get a
    # 1-column dummy the kernel never reads
    if blocked and kc.sup_order_on("levels"):
        alive_row = jax.lax.bitcast_convert_type(
            pp[ROW_ALIVE : ROW_ALIVE + 1], jnp.int32
        ) != 0
        w = alive_row.reshape(grid, tile).astype(jnp.float32)
        pos = pp[ROW_O : ROW_O + 3].reshape(3, grid, tile)
        cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        cen = (jnp.sum(pos * w[None], axis=2) / cnt[None]).T
        order = kc.sup_visit_order(cen, g3)
    else:
        order = jnp.zeros((grid, 1), jnp.int32)
    order, sord = kc.pack_sup_order(order)
    contrib, rch, fch, casts = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            row(N_ROWS), sord,
            g1_spec, const(g2), const(g3), const(sph), const(mat_t),
            const(mat_T), const(lights),
        ],
        out_specs=[row(3), row(N_ROWS), row(N_ROWS), row(1)],
        out_shape=[
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
            jax.ShapeDtypeStruct((N_ROWS, npad), jnp.float32),
            jax.ShapeDtypeStruct((N_ROWS, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(pp, order, g1, g2, g3, sph, mat_t, mat_T, lights)

    return (contrib[:, :n], rch[:, :n], fch[:, :n],
            jnp.sum(casts[0, :n]))
