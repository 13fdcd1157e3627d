"""Fused Monte-Carlo step kernel: one stochastic epoch bounce-walk per ray,
entirely inside one Pallas kernel.

The jnp path (ops/distributed.py) runs each bounce of the roulette walk as
~6 device ops (material eval, lobe, march kernel, advance cast, fused
shadow kernel, recurrence update) with full-pool HBM traffic between them.
Here the whole walk — primary cast, `depth` roulette bounces each with its
interior march and next-hit shading, and the final depth-exhausted shade
(src/main.rs:521-614, 1150-1156) — runs per 512-ray tile in VMEM.

RNG: the three per-bounce draws (roulette select, lobe phi, lobe theta)
are precomputed OUTSIDE with the same counter-based jax.random keys the
jnp path uses and streamed in as a [3*depth, R] operand — so kernel and
jnp path consume IDENTICAL randomness and their photons match lane for
lane (tests/test_mc_pallas.py), which a device-side pltpu PRNG could not
offer (and interpret mode lacks one anyway).  The draw cost is three
[N]-sized threefry calls per bounce, noise next to the sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops import kernel_common as kc
from raytracer_tpu.ops.intersect_pallas import TILE_R, pack_sph, pack_tri
from raytracer_tpu.scene.types import FACE_BACK, FACE_FRONT, Scene

_BIG = kc._BIG

# Packed per-lane MC walk state (the binned per-bounce path,
# ops/mc_binned.py, carries exactly these rows between bounce kernels;
# int fields are bitcast to f32).  Order matters: _pack_state /
# _unpack_state below and the binned kernels index by these constants.
ST_ALIVE = 0  # int
ST_AR, ST_AG, ST_AB = 1, 2, 3
ST_SR, ST_SG, ST_SB = 4, 5, 6
ST_PX, ST_PY, ST_PZ = 7, 8, 9
ST_NX, ST_NY, ST_NZ = 10, 11, 12
ST_U, ST_V = 13, 14
ST_PRIM, ST_OBJ, ST_BACK = 15, 16, 17  # int, int, int
ST_DX, ST_DY, ST_DZ = 18, 19, 20
ST_SLOT = 21  # int
N_ST = 22
_ST_INT = (ST_ALIVE, ST_PRIM, ST_OBJ, ST_BACK, ST_SLOT)
# Deferred-shading extension rows (mc_step_deferred, binned path only):
# blend factor f = select(is_rb, 0.5, decay) and the PRE-update scale of
# the bounce that deferred its hit-shade.
ST_DF, ST_PR, ST_PG, ST_PB = 22, 23, 24, 25
N_ST_DEF = 26


def mc_step(geom, mat_t, mat_T, lights, n_light: int, textures,
            max_distance: float, max_retries: int, st: dict,
            u_sel, u_phi, theta, mat_in=None):
    """ONE roulette bounce of the distributed walk (main.rs:521-614).

    `st` holds the walk state as [1, R] rows: alive, accum a{r,g,b},
    scale s{r,g,b}, current hit (p, n, uv, prim, obj, back) and the
    incoming direction d.  Returns (new_st, casts_delta, mat_next).
    Shared by the whole-walk mega-kernel (_mc_kernel) and the binned
    per-bounce path (ops/mc_binned.py) so both consume identical math +
    randomness.

    `mat_in`: the CURRENT hit's material sample, if the caller already
    has it.  For every lane that survives a bounce the next bounce's
    entry material equals this bounce's next-hit sample m2 (the shade
    evaluated s_obj/s_u/s_v ARE the carried hit for use_next lanes, and
    dead lanes' values are never consumed), so the unrolled mega-kernel
    threads `mat_next` through and pays ONE eval_material per bounce
    instead of two — bit-identical results (same function of equal
    inputs).  The binned per-bounce path passes None (carrying 14 more
    state rows between kernels would cost more than the eval).
    """
    alive = st["alive"]
    ar, ag, ab = st["ar"], st["ag"], st["ab"]
    sr, sg, sb = st["sr"], st["sg"], st["sb"]
    cpx, cpy, cpz = st["cpx"], st["cpy"], st["cpz"]
    cnx, cny, cnz = st["cnx"], st["cny"], st["cnz"]
    cu, cv = st["cu"], st["cv"]
    cprim, cobj, cback = st["cprim"], st["cobj"], st["cback"]
    cdx, cdy, cdz = st["cdx"], st["cdy"], st["cdz"]
    shape = alive.shape
    front = jnp.zeros(shape, jnp.int32)

    m = (mat_in if mat_in is not None
         else kc.eval_material(mat_t, textures, cobj, cu, cv, mat_T))
    w0 = (1.0 - m["shiness"]) * (1.0 - m["transparency"])
    w1 = m["shiness"] * (1.0 - m["transparency"])
    w2 = m["transparency"]
    r = u_sel * (w0 + w1 + w2)  # weighted_select (main.rs:652-666)
    sel_d = r < w0
    sel_r = ~sel_d & (r < w0 + w1)
    sel_f = ~sel_d & ~sel_r

    # scatter_hit lobe (main.rs:539-554): diffuse around -normal exp 1,
    # glossy around the incoming direction exp smoothness (558/577/596)
    expo = jnp.where(sel_d, 1.0, m["smoothness"])
    axx = jnp.where(sel_d, -cnx, cdx)
    axy = jnp.where(sel_d, -cny, cdy)
    axz = jnp.where(sel_d, -cnz, cdz)
    axx, axy, axz = kc.normalize3(axx, axy, axz)
    phi = kc.acos(kc.powf(1.0 - u_phi, expo))
    sp = jnp.sin(phi)
    lx = sp * jnp.cos(theta)
    ly = sp * jnp.sin(theta)
    lz = jnp.cos(phi)
    sdx, sdy, sdz = kc.rotate_from_z(axx, axy, axz, lx, ly, lz)

    cosine = -(cnx * sdx + cny * sdy + cnz * sdz)
    live = alive & (cosine > 0.0)  # main.rs:560/579/598

    fx, fy, fz = kc.reflect3(sdx, sdy, sdz, cnx, cny, cnz)
    excl_face_r = jnp.where(cback, FACE_FRONT, FACE_BACK)

    want_f = live & sel_f
    # NOTE: for blocked geometries a march-free tile is already cheap
    # without any outer cond — the interior sweep's chunk slab gates
    # include the active mask (no want_f lane -> zero chunks entered)
    # and the TIR while_loop exits on its first any(pending) check.
    # The between-bounce refr-bit sort (mc_binned._sort_state) makes
    # most tiles march-free.  (An explicit lax.cond around the blocked
    # march was tried and blew Mosaic compile time up >20x.)
    mm = geom.march(cpx, cpy, cpz, cnx, cny, cnz, sdx, sdy, sdz,
                    m["refraction"], want_f, max_distance, max_retries)
    casts = mm["iters"]

    adv_ox = jnp.where(sel_f, mm["ex"], cpx)
    adv_oy = jnp.where(sel_f, mm["ey"], cpy)
    adv_oz = jnp.where(sel_f, mm["ez"], cpz)
    adv_dx = jnp.where(sel_f, mm["odx"], fx)
    adv_dy = jnp.where(sel_f, mm["ody"], fy)
    adv_dz = jnp.where(sel_f, mm["odz"], fz)
    adv_excl_prim = jnp.where(sel_f, mm["prim"], cprim)
    adv_excl_face = jnp.where(sel_f, FACE_BACK, excl_face_r)
    adv_active = live & (~sel_f | mm["escaped"])

    nxt = geom.nearest(
        (adv_ox, adv_oy, adv_oz), (adv_dx, adv_dy, adv_dz),
        front, adv_excl_prim, adv_excl_face, adv_active,
    )
    casts = casts + adv_active.astype(jnp.int32)
    use_next = nxt["valid"]

    # merged shade: next hit where the advance cast hit, else the
    # scattered self-shade (miss terminals 571-573/590-592); refract
    # lanes whose escape cast missed contribute black (607)
    s_px = jnp.where(use_next, nxt["px"], cpx)
    s_py = jnp.where(use_next, nxt["py"], cpy)
    s_pz = jnp.where(use_next, nxt["pz"], cpz)
    s_nx = jnp.where(use_next, nxt["nx"], cnx)
    s_ny = jnp.where(use_next, nxt["ny"], cny)
    s_nz = jnp.where(use_next, nxt["nz"], cnz)
    s_u = jnp.where(use_next, nxt["u"], cu)
    s_v = jnp.where(use_next, nxt["v"], cv)
    s_prim = jnp.where(use_next, nxt["prim"], cprim)
    s_obj = jnp.where(use_next, nxt["obj"], cobj)
    s_rdx = jnp.where(use_next, adv_dx, sdx)
    s_rdy = jnp.where(use_next, adv_dy, sdy)
    s_rdz = jnp.where(use_next, adv_dz, sdz)
    need_shade = adv_active & (use_next | ~sel_f)

    m2 = kc.eval_material(mat_t, textures, s_obj, s_u, s_v, mat_T)
    nax, nay, naz = kc.rotate_from_z(s_nx, s_ny, s_nz,
                                     m2["tnx"], m2["tny"], m2["tnz"])
    sweep = geom.shadow_sweep(s_px, s_py, s_pz, s_prim)
    shr, shg, shb, cnt = kc.get_shade(
        m2, lights, s_px, s_py, s_pz, nax, nay, naz,
        -s_rdx, -s_rdy, -s_rdz, need_shade, sweep, n_light,
    )
    casts = casts + cnt

    # BRDF against the unadjusted hit normal (566-570/585-589)
    lam = fx * cnx + fy * cny + fz * cnz
    pos_lam = lam > 0.0
    bdr = jnp.where(pos_lam, m["dr"] * lam, 0.0)
    bdg = jnp.where(pos_lam, m["dg"] * lam, 0.0)
    bdb = jnp.where(pos_lam, m["db"] * lam, 0.0)
    e = 1.0 / (m["smoothness"] + kc.F32_EPS)
    energy = (e + 8.0) / np.float32(8.0 * np.pi)
    rfx = 2.0 * lam * cnx - fx
    rfy = 2.0 * lam * cny - fy
    rfz = 2.0 * lam * cnz - fz
    amount = kc.powf(
        jnp.maximum(-(rfx * cdx + rfy * cdy + rfz * cdz), 0.0), e
    ) * energy
    bsr = jnp.where(pos_lam, m["sr"] * amount, 0.0)
    bsg = jnp.where(pos_lam, m["sg"] * amount, 0.0)
    bsb = jnp.where(pos_lam, m["sb"] * amount, 0.0)
    brr = jnp.where(sel_d, bdr, bsr)
    brg = jnp.where(sel_d, bdg, bsg)
    brb = jnp.where(sel_d, bdb, bsb)
    decay = kc.powf(m["decay"], mm["travel"])

    half = jnp.float32(0.5)
    is_rb = ~sel_f  # diffuse / reflect branch
    hit_scale = jnp.where(use_next, half, 1.0)
    Ar = jnp.where(is_rb, hit_scale * shr, decay * shr)
    Ag = jnp.where(is_rb, hit_scale * shg, decay * shg)
    Ab = jnp.where(is_rb, hit_scale * shb, decay * shb)
    B_base = jnp.where(use_next, half, 0.0)
    Br = jnp.where(is_rb, B_base * brr, decay)
    Bg = jnp.where(is_rb, B_base * brg, decay)
    Bb = jnp.where(is_rb, B_base * brb, decay)

    ns = need_shade
    ar = ar + jnp.where(ns, sr * Ar, 0.0)
    ag = ag + jnp.where(ns, sg * Ag, 0.0)
    ab = ab + jnp.where(ns, sb * Ab, 0.0)
    aa = adv_active
    sr = sr * jnp.where(aa, Br, 0.0)
    sg = sg * jnp.where(aa, Bg, 0.0)
    sb = sb * jnp.where(aa, Bb, 0.0)

    new_st = dict(
        alive=adv_active & use_next,
        ar=ar, ag=ag, ab=ab, sr=sr, sg=sg, sb=sb,
        cpx=nxt["px"], cpy=nxt["py"], cpz=nxt["pz"],
        cnx=nxt["nx"], cny=nxt["ny"], cnz=nxt["nz"],
        cu=nxt["u"], cv=nxt["v"],
        cprim=nxt["prim"], cobj=nxt["obj"], cback=nxt["backface"],
        cdx=adv_dx, cdy=adv_dy, cdz=adv_dz,
    )
    return new_st, casts, m2


def mc_step_deferred(geom, mat_t, mat_T, lights, n_light: int, textures,
                     max_distance: float, max_retries: int, st: dict,
                     u_sel, u_phi, theta, first: bool):
    """mc_step with DEFERRED hit shading (binned per-bounce path only).

    The binned path sorts lanes by the chunk of the CURRENT hit between
    bounces (mc_binned._sort_state); mc_step however shades the NEXT hit
    — one segment past what the sort clustered — so its shadow sweeps
    traverse from unclustered origins (measured: the largest component
    of the 11k MC epoch).  This variant moves each hit's shade to the
    bounce where that hit is CURRENT (i.e. right after the sort that
    clustered it):

      * entry: one shade sweep at the current hit applies the DEFERRED
        contribution carried from the previous bounce —
        accum += sr_prev * (f * shade(current)), with f =
        select(is_rb, 0.5, decay) carried in `df` and the PRE-update
        scale in `pr/pg/pb`.  Skipped statically on the first bounce
        (`first=True`: nothing is deferred yet).
      * after the advance cast: miss lanes (scattered self-shade,
        main.rs:571-573/590-592) shade immediately — their shade
        position is the current hit too, so this sweep is also
        clustered and its active set is small.
      * surviving lanes defer: df' = select(is_rb, 0.5, decay),
        pr' = sr (pre-update), applied by the NEXT bounce or the
        terminal.

    Bit-identical photons to mc_step (select distributes over multiply;
    per-lane accumulation order is unchanged) and identical cast
    counters (each reference shade's shadow considers are counted at
    the kernel that performs — or, at the shared terminal sweep,
    accounts for — them).  tests/test_mc_binned.py pins this against
    the mega-kernel lane for lane.
    """
    alive = st["alive"]
    ar, ag, ab = st["ar"], st["ag"], st["ab"]
    sr, sg, sb = st["sr"], st["sg"], st["sb"]
    cpx, cpy, cpz = st["cpx"], st["cpy"], st["cpz"]
    cnx, cny, cnz = st["cnx"], st["cny"], st["cnz"]
    cu, cv = st["cu"], st["cv"]
    cprim, cobj, cback = st["cprim"], st["cobj"], st["cback"]
    cdx, cdy, cdz = st["cdx"], st["cdy"], st["cdz"]
    shape = alive.shape
    front = jnp.zeros(shape, jnp.int32)

    m = kc.eval_material(mat_t, textures, cobj, cu, cv, mat_T)
    # adjusted normal at the current hit — shared by the deferred and the
    # miss-self shade (identical expressions to mc_step's m2-based ones:
    # the current material IS last bounce's next-hit sample)
    nax, nay, naz = kc.rotate_from_z(cnx, cny, cnz,
                                     m["tnx"], m["tny"], m["tnz"])
    casts = jnp.zeros(shape, jnp.int32)

    if not first:
        # deferred contribution from the previous bounce (its hit-shade,
        # view = the direction the advance cast arrived along = -cd)
        sweep1 = geom.shadow_sweep(cpx, cpy, cpz, cprim)
        dr, dg_, db_, cnt1 = kc.get_shade(
            m, lights, cpx, cpy, cpz, nax, nay, naz,
            -cdx, -cdy, -cdz, alive, sweep1, n_light,
        )
        casts = casts + cnt1
        df = st["df"]
        ar = ar + jnp.where(alive, st["pr"] * (df * dr), 0.0)
        ag = ag + jnp.where(alive, st["pg"] * (df * dg_), 0.0)
        ab = ab + jnp.where(alive, st["pb"] * (df * db_), 0.0)

    w0 = (1.0 - m["shiness"]) * (1.0 - m["transparency"])
    w1 = m["shiness"] * (1.0 - m["transparency"])
    w2 = m["transparency"]
    r = u_sel * (w0 + w1 + w2)
    sel_d = r < w0
    sel_r = ~sel_d & (r < w0 + w1)
    sel_f = ~sel_d & ~sel_r

    expo = jnp.where(sel_d, 1.0, m["smoothness"])
    axx = jnp.where(sel_d, -cnx, cdx)
    axy = jnp.where(sel_d, -cny, cdy)
    axz = jnp.where(sel_d, -cnz, cdz)
    axx, axy, axz = kc.normalize3(axx, axy, axz)
    phi = kc.acos(kc.powf(1.0 - u_phi, expo))
    sp = jnp.sin(phi)
    lx = sp * jnp.cos(theta)
    ly = sp * jnp.sin(theta)
    lz = jnp.cos(phi)
    sdx, sdy, sdz = kc.rotate_from_z(axx, axy, axz, lx, ly, lz)

    cosine = -(cnx * sdx + cny * sdy + cnz * sdz)
    live = alive & (cosine > 0.0)

    fx, fy, fz = kc.reflect3(sdx, sdy, sdz, cnx, cny, cnz)
    excl_face_r = jnp.where(cback, FACE_FRONT, FACE_BACK)

    want_f = live & sel_f
    mm = geom.march(cpx, cpy, cpz, cnx, cny, cnz, sdx, sdy, sdz,
                    m["refraction"], want_f, max_distance, max_retries)
    casts = casts + mm["iters"]

    adv_ox = jnp.where(sel_f, mm["ex"], cpx)
    adv_oy = jnp.where(sel_f, mm["ey"], cpy)
    adv_oz = jnp.where(sel_f, mm["ez"], cpz)
    adv_dx = jnp.where(sel_f, mm["odx"], fx)
    adv_dy = jnp.where(sel_f, mm["ody"], fy)
    adv_dz = jnp.where(sel_f, mm["odz"], fz)
    adv_excl_prim = jnp.where(sel_f, mm["prim"], cprim)
    adv_excl_face = jnp.where(sel_f, FACE_BACK, excl_face_r)
    adv_active = live & (~sel_f | mm["escaped"])

    nxt = geom.nearest(
        (adv_ox, adv_oy, adv_oz), (adv_dx, adv_dy, adv_dz),
        front, adv_excl_prim, adv_excl_face, adv_active,
    )
    casts = casts + adv_active.astype(jnp.int32)
    use_next = nxt["valid"]

    is_rb = ~sel_f
    # miss lanes shade the scattered SELF immediately (their position is
    # the current hit — already clustered; refract-escape misses are
    # black, main.rs:607): view = -scattered direction, hit_scale = 1
    ns_miss = adv_active & ~use_next & is_rb
    sweep2 = geom.shadow_sweep(cpx, cpy, cpz, cprim)
    shr, shg, shb, cnt2 = kc.get_shade(
        m, lights, cpx, cpy, cpz, nax, nay, naz,
        -sdx, -sdy, -sdz, ns_miss, sweep2, n_light,
    )
    casts = casts + cnt2
    ar = ar + jnp.where(ns_miss, sr * shr, 0.0)
    ag = ag + jnp.where(ns_miss, sg * shg, 0.0)
    ab = ab + jnp.where(ns_miss, sb * shb, 0.0)

    # BRDF + scale recurrence — identical to mc_step
    lam = fx * cnx + fy * cny + fz * cnz
    pos_lam = lam > 0.0
    bdr = jnp.where(pos_lam, m["dr"] * lam, 0.0)
    bdg = jnp.where(pos_lam, m["dg"] * lam, 0.0)
    bdb = jnp.where(pos_lam, m["db"] * lam, 0.0)
    e = 1.0 / (m["smoothness"] + kc.F32_EPS)
    energy = (e + 8.0) / np.float32(8.0 * np.pi)
    rfx = 2.0 * lam * cnx - fx
    rfy = 2.0 * lam * cny - fy
    rfz = 2.0 * lam * cnz - fz
    amount = kc.powf(
        jnp.maximum(-(rfx * cdx + rfy * cdy + rfz * cdz), 0.0), e
    ) * energy
    bsr = jnp.where(pos_lam, m["sr"] * amount, 0.0)
    bsg = jnp.where(pos_lam, m["sg"] * amount, 0.0)
    bsb = jnp.where(pos_lam, m["sb"] * amount, 0.0)
    brr = jnp.where(sel_d, bdr, bsr)
    brg = jnp.where(sel_d, bdg, bsg)
    brb = jnp.where(sel_d, bdb, bsb)
    decay = kc.powf(m["decay"], mm["travel"])

    half = jnp.float32(0.5)
    B_base = jnp.where(use_next, half, 0.0)
    Br = jnp.where(is_rb, B_base * brr, decay)
    Bg = jnp.where(is_rb, B_base * brg, decay)
    Bb = jnp.where(is_rb, B_base * brb, decay)

    # defer the hit-shade: f = select(is_rb, 0.5, decay); the pre-update
    # scale rides along so the next kernel reproduces sr * (f * shade)
    # in mc_step's exact association
    df_new = jnp.where(is_rb, half, decay)
    pr_new, pg_new, pb_new = sr, sg, sb

    aa = adv_active
    sr = sr * jnp.where(aa, Br, 0.0)
    sg = sg * jnp.where(aa, Bg, 0.0)
    sb = sb * jnp.where(aa, Bb, 0.0)

    new_st = dict(
        alive=adv_active & use_next,
        ar=ar, ag=ag, ab=ab, sr=sr, sg=sg, sb=sb,
        cpx=nxt["px"], cpy=nxt["py"], cpz=nxt["pz"],
        cnx=nxt["nx"], cny=nxt["ny"], cnz=nxt["nz"],
        cu=nxt["u"], cv=nxt["v"],
        cprim=nxt["prim"], cobj=nxt["obj"], cback=nxt["backface"],
        cdx=adv_dx, cdy=adv_dy, cdz=adv_dz,
        df=df_new, pr=pr_new, pg=pg_new, pb=pb_new,
    )
    return new_st, casts


def mc_terminal_deferred(geom, mat_t, mat_T, lights, n_light: int,
                         textures, st: dict, first: bool = False):
    """Terminal for the deferred-shading walk: ONE shade sweep at the
    current hit serves BOTH the carried deferred contribution and the
    depth-exhausted terminal shade (the reference computes the same
    shade(hit, ray) twice across its recursion boundary,
    main.rs:563-570 + 524-527 — identical inputs, so one sweep suffices;
    the cast counters still account for both, matching mc_step +
    mc_terminal exactly).  `first=True` (depth 0) has nothing deferred."""
    alive = st["alive"]
    cpx, cpy, cpz = st["cpx"], st["cpy"], st["cpz"]
    cnx, cny, cnz = st["cnx"], st["cny"], st["cnz"]
    cdx, cdy, cdz = st["cdx"], st["cdy"], st["cdz"]
    m3 = kc.eval_material(mat_t, textures, st["cobj"], st["cu"], st["cv"],
                          mat_T)
    nax, nay, naz = kc.rotate_from_z(cnx, cny, cnz,
                                     m3["tnx"], m3["tny"], m3["tnz"])
    sweep = geom.shadow_sweep(cpx, cpy, cpz, st["cprim"])
    shr, shg, shb, cnt = kc.get_shade(
        m3, lights, cpx, cpy, cpz, nax, nay, naz, -cdx, -cdy, -cdz,
        alive, sweep, n_light,
    )
    ar, ag, ab = st["ar"], st["ag"], st["ab"]
    if not first:
        df = st["df"]
        ar = ar + jnp.where(alive, st["pr"] * (df * shr), 0.0)
        ag = ag + jnp.where(alive, st["pg"] * (df * shg), 0.0)
        ab = ab + jnp.where(alive, st["pb"] * (df * shb), 0.0)
        cnt = cnt + cnt  # the deferred shade's considers (same mask)
    ar = ar + jnp.where(alive, st["sr"] * shr, 0.0)
    ag = ag + jnp.where(alive, st["sg"] * shg, 0.0)
    ab = ab + jnp.where(alive, st["sb"] * shb, 0.0)
    return ar, ag, ab, cnt


def mc_terminal(geom, mat_t, mat_T, lights, n_light: int, textures,
                st: dict, mat_in=None):
    """Depth-exhausted terminal shade (main.rs:524-527): accum +=
    scale * shade(self) on still-alive lanes.  Returns (ar, ag, ab,
    casts_delta).  `mat_in`: carried current-hit material (see mc_step)."""
    alive = st["alive"]
    cpx, cpy, cpz = st["cpx"], st["cpy"], st["cpz"]
    cnx, cny, cnz = st["cnx"], st["cny"], st["cnz"]
    cdx, cdy, cdz = st["cdx"], st["cdy"], st["cdz"]
    m3 = (mat_in if mat_in is not None
          else kc.eval_material(mat_t, textures, st["cobj"], st["cu"],
                                st["cv"], mat_T))
    nax, nay, naz = kc.rotate_from_z(cnx, cny, cnz,
                                     m3["tnx"], m3["tny"], m3["tnz"])
    sweep = geom.shadow_sweep(cpx, cpy, cpz, st["cprim"])
    shr, shg, shb, cnt = kc.get_shade(
        m3, lights, cpx, cpy, cpz, nax, nay, naz, -cdx, -cdy, -cdz,
        alive, sweep, n_light,
    )
    ar = st["ar"] + jnp.where(alive, st["sr"] * shr, 0.0)
    ag = st["ag"] + jnp.where(alive, st["sg"] * shg, 0.0)
    ab = st["ab"] + jnp.where(alive, st["sb"] * shb, 0.0)
    return ar, ag, ab, cnt


def _mc_kernel(o_ref, d_ref, unif_ref, order_ref, g1_ref, g2_ref, g3_ref,
               sph_ref, mat_ref, mat_T_ref, light_ref,
               photon_ref, casts_ref, *scratch, blocked: bool, n_chunks: int,
               n_tri: int, n_sph: int,
               n_light: int, depth: int, max_distance: float,
               max_retries: int, textures):
    if scratch:  # HBM-streamed blocked table (kernel_common.ChunkTable)
        g1_ref = kc.ChunkTable(g1_ref, scratch[0], scratch[1])
    o = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :])
    d = (d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])
    sph = sph_ref[:, :]
    if blocked:
        geom = kc.BlockedGeom(g1_ref, g2_ref, g3_ref, sph, n_tri, n_sph,
                              n_chunks, order_ref=order_ref, family="mega")
    else:
        geom = kc.DenseGeom(g1_ref[:, :], g2_ref[:, :], sph, n_tri, n_sph)
    mat_t = mat_ref[:, :]
    mat_T = mat_T_ref[:, :]
    lights = light_ref[:, :]
    shape = (1, o[0].shape[1])
    front = jnp.zeros(shape, jnp.int32)
    no_excl = jnp.full(shape, -1, jnp.int32)

    # primary cast (main.rs:1150)
    h = geom.nearest(o, d, front, no_excl, front, jnp.ones(shape, bool))
    casts = jnp.ones(shape, jnp.int32)

    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    st = dict(
        alive=h["valid"],
        ar=zero, ag=zero, ab=zero, sr=one, sg=one, sb=one,
        cpx=h["px"], cpy=h["py"], cpz=h["pz"],
        cnx=h["nx"], cny=h["ny"], cnz=h["nz"],
        cu=h["u"], cv=h["v"],
        cprim=h["prim"], cobj=h["obj"], cback=h["backface"],
        cdx=d[0], cdy=d[1], cdz=d[2],
    )

    mat = None  # carried current-hit material (see mc_step)
    for step in range(depth):
        st, dc, mat = mc_step(
            geom, mat_t, mat_T, lights, n_light, textures,
            max_distance, max_retries, st,
            unif_ref[3 * step : 3 * step + 1, :],
            unif_ref[3 * step + 1 : 3 * step + 2, :],
            unif_ref[3 * step + 2 : 3 * step + 3, :],
            mat_in=mat,
        )
        casts = casts + dc

    # depth exhausted: terminate with shade(self) (main.rs:524-527)
    ar, ag, ab, cnt = mc_terminal(geom, mat_t, mat_T, lights, n_light,
                                  textures, st, mat_in=mat)
    casts = casts + cnt

    photon_ref[0:1, :] = ar
    photon_ref[1:2, :] = ag
    photon_ref[2:3, :] = ab
    casts_ref[:, :] = casts


@functools.partial(
    jax.jit,
    static_argnames=("textures", "depth", "max_distance", "max_retries",
                     "interpret"),
)
def trace(scene: Scene, textures, ray_o, ray_d, unifs, depth: int,
          max_distance: float, max_retries: int, interpret: bool = False):
    """One MC sample per primary ray, fused.

    unifs: [depth, 3, N] f32 — (roulette u, lobe u_phi, lobe theta) per
    bounce, generated by the caller (ops/distributed.py) with the same keys
    as the jnp path.  Returns (photon [N, 3] UNfiltered, casts scalar).
    """
    n = ray_o.shape[0]
    tile = min(TILE_R, max(128, -(-n // 128) * 128))
    n_pad = (-n) % tile
    grid = (n + n_pad) // tile

    def prep(x):
        x = x.T if x.ndim == 2 else x[None, :]
        return jnp.pad(x, [(0, 0), (0, n_pad)]) if n_pad else x

    o_t = prep(ray_o)
    d_t = prep(ray_d)
    if depth > 0:  # already row-layout [3*depth, N]; pad lanes only
        u_t = unifs.reshape(3 * depth, n)
        if n_pad:
            u_t = jnp.pad(u_t, [(0, 0), (0, n_pad)])
    else:  # degenerate: block specs need >= 1 row
        u_t = jnp.zeros((1, o_t.shape[1]), jnp.float32)
    blocked = scene.blk_perm is not None and scene.n_tri > 0
    if blocked:
        g1 = kc.pack_tri_blocked(scene)
        g2 = kc.pack_boxes8(scene)
        g3 = kc.pack_sup8(scene)
        n_chunks = scene.blk_box.shape[0]
    else:
        g1 = pack_tri(scene) if scene.n_tri > 0 else jnp.zeros((8, 34), jnp.float32)
        g2 = g1.T
        g3 = jnp.zeros((8, 8), jnp.float32)
        n_chunks = 0
    sph = pack_sph(scene) if scene.n_sph > 0 else jnp.zeros((8, 8), jnp.float32)
    mat_t = kc.pack_materials(scene)
    mat_T = mat_t.T
    lights = kc.pack_lights(scene)

    kernel = functools.partial(
        _mc_kernel, blocked=blocked, n_chunks=n_chunks,
        n_tri=scene.n_tri, n_sph=scene.n_sph,
        n_light=scene.n_light, depth=depth, max_distance=max_distance,
        max_retries=max_retries, textures=textures,
    )
    row = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    npad = o_t.shape[1]
    g1, g1_spec, scratch_shapes = kc.stream_spec(g1, blocked)
    # per-tile supergroup visit order from the PRIMARY origins' centroid
    # (kc.sup_visit_order) — bounces drift from it, but the first casts
    # dominate and any order is bit-exact; dense scenes get a dummy
    if blocked and kc.sup_order_on("mega"):
        pos = o_t.reshape(3, grid, tile)
        cen = jnp.mean(pos, axis=2).T
        order = kc.sup_visit_order(cen, g3)
    else:
        order = jnp.zeros((grid, 1), jnp.int32)
    order, sord = kc.pack_sup_order(order)
    photon, casts = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[row(3), row(3), row(u_t.shape[0]), sord,
                  g1_spec, const(g2), const(g3), const(sph), const(mat_t),
                  const(mat_T), const(lights)],
        out_specs=[row(3), row(1)],
        out_shape=[
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(o_t, d_t, u_t, order, g1, g2, g3, sph, mat_t, mat_T, lights)

    return photon[:, :n].T, jnp.sum(casts[0, :n])
