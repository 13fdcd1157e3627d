"""Binned per-bounce Monte-Carlo path for blocked (large-mesh) scenes.

The whole-walk mega-kernel (ops/mc_pallas.py) is the right shape for
dense scenes, but on large blocked meshes the bounce casts defeat the
chunk/supergroup AABB gating: after one lobe scatter a 512-lane kernel
tile holds rays pointing every which way from every part of the image,
so every chunk is entered by SOME lane and the gated sweep degenerates
to brute force (docs/PERF.md "Large meshes"; the reference pays the same
brute-force cost per ray, src/main.rs:183-262, just scalar).

This path restores per-tile coherence BETWEEN bounces instead: the walk
state (exactly the rows of ops/mc_pallas.mc_step) lives in one packed
[N_ST, N] f32 array (int lanes bitcast); after the primary cast, and
again after every bounce, lanes are sorted by a coherence key —
     (dead?, origin cell on an 8x8x8 scene-bbox grid, direction octant)
— so each 512-lane kernel tile sees rays with nearby origins heading
roughly the same way and the AABB gates fire again.  Dead lanes sort to
the tail where whole tiles skip the bounce via a scalar any-alive check
(cheap pass-through copy; unlike the rejected round-2 in-kernel
per-step cond, no loop carry crosses a branch here).

Randomness: the same [depth, 3, N] uniforms as the other MC paths,
drawn in slot order and gathered through the permutation by each lane's
carried slot id — so every primary ray consumes the identical draw
sequence and the photons match the mega-kernel lane for lane
(tests/test_mc_binned.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops import kernel_common as kc
from raytracer_tpu.ops import mc_pallas as mp
from raytracer_tpu.ops.intersect_pallas import TILE_R, pack_sph
from raytracer_tpu.scene.types import Scene

N_ST = mp.N_ST_DEF  # walk state + deferred-shade rows (mc_step_deferred)
_INT_ROWS = mp._ST_INT

# Blocked scenes at or above this triangle count route MC epochs through
# this binned path (ops/distributed.py); below it the mega-kernel's single
# dispatch wins (sort overhead > gating savings on small chunk tables).
# Tuned on the real chip: see docs/PERF.md "Large-mesh MC".
BINNED_MIN_TRIS = 4096

# Kernel tile width (lanes) for the binned bounce kernels.  Narrower tiles
# than the global TILE_R pay more grid steps but see a SINGLE
# (origin-cell, direction-octant) sort group per tile, so the chunk/
# supergroup gates fire far more often on scattered bounce rays.  Tuned on
# the real chip (docs/PERF.md "Large-mesh MC"); RT_BINNED_TILE overrides.
BINNED_TILE = int(os.environ.get("RT_BINNED_TILE", 0)) or None

# Between-bounce sort key family (RT_BINNED_KEY):
#   "chunk" (default) — major key is the ORIGIN CHUNK: the blocked-layout
#       chunk (BVH leaf group) containing the lane's current hit primitive.
#       Bounce origins sit ON scene geometry, so the carried hit prim maps
#       each lane to the exact leaf AABB its next cast starts from — far
#       tighter than any uniform grid, and aligned with the traversal
#       granularity the gates prune at (VERDICT r4 item 1: bounce-
#       granularity origin-chunk-sorted binning).  Sphere hits get
#       pseudo-chunks past the triangle chunks.
#   "cell" — the r3/r4 key: origin cell on an 8x8x8 scene-bbox grid.
BINNED_KEY = os.environ.get("RT_BINNED_KEY", "chunk")


def _iload(ref_or_arr, r):
    row = ref_or_arr[r : r + 1, :]
    return jax.lax.bitcast_convert_type(row, jnp.int32)


def _f(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _st_from_rows(st_ref):
    """Unpack a [N_ST, R] ref/array into the mc_step_deferred state dict."""
    g = lambda r: st_ref[r : r + 1, :]
    return dict(
        alive=_iload(st_ref, mp.ST_ALIVE) != 0,
        ar=g(mp.ST_AR), ag=g(mp.ST_AG), ab=g(mp.ST_AB),
        sr=g(mp.ST_SR), sg=g(mp.ST_SG), sb=g(mp.ST_SB),
        cpx=g(mp.ST_PX), cpy=g(mp.ST_PY), cpz=g(mp.ST_PZ),
        cnx=g(mp.ST_NX), cny=g(mp.ST_NY), cnz=g(mp.ST_NZ),
        cu=g(mp.ST_U), cv=g(mp.ST_V),
        cprim=_iload(st_ref, mp.ST_PRIM),
        cobj=_iload(st_ref, mp.ST_OBJ),
        cback=_iload(st_ref, mp.ST_BACK) != 0,
        cdx=g(mp.ST_DX), cdy=g(mp.ST_DY), cdz=g(mp.ST_DZ),
        df=g(mp.ST_DF), pr=g(mp.ST_PR), pg=g(mp.ST_PG), pb=g(mp.ST_PB),
    )


def _write_state(out_ref, st, slot_i32):
    out_ref[mp.ST_ALIVE : mp.ST_ALIVE + 1, :] = _f(
        st["alive"].astype(jnp.int32)
    )
    for r, k in ((mp.ST_AR, "ar"), (mp.ST_AG, "ag"), (mp.ST_AB, "ab"),
                 (mp.ST_SR, "sr"), (mp.ST_SG, "sg"), (mp.ST_SB, "sb"),
                 (mp.ST_PX, "cpx"), (mp.ST_PY, "cpy"), (mp.ST_PZ, "cpz"),
                 (mp.ST_NX, "cnx"), (mp.ST_NY, "cny"), (mp.ST_NZ, "cnz"),
                 (mp.ST_U, "cu"), (mp.ST_V, "cv"),
                 (mp.ST_DX, "cdx"), (mp.ST_DY, "cdy"), (mp.ST_DZ, "cdz"),
                 (mp.ST_DF, "df"), (mp.ST_PR, "pr"), (mp.ST_PG, "pg"),
                 (mp.ST_PB, "pb")):
        out_ref[r : r + 1, :] = st[k]
    out_ref[mp.ST_PRIM : mp.ST_PRIM + 1, :] = _f(st["cprim"])
    out_ref[mp.ST_OBJ : mp.ST_OBJ + 1, :] = _f(st["cobj"])
    out_ref[mp.ST_BACK : mp.ST_BACK + 1, :] = _f(
        st["cback"].astype(jnp.int32)
    )
    out_ref[mp.ST_SLOT : mp.ST_SLOT + 1, :] = _f(slot_i32)


def _geom_of(g1_ref, g2_ref, g3_ref, sph_ref, scratch, n_tri, n_sph,
             n_chunks, order_ref=None, row8=None):
    if scratch:
        g1_ref = kc.ChunkTable(g1_ref, scratch[0], scratch[1])
    return kc.BlockedGeom(g1_ref, g2_ref, g3_ref, sph_ref[:, :], n_tri,
                          n_sph, n_chunks, family="binned",
                          order_ref=order_ref, row8=row8)


def _primary_kernel(o_ref, d_ref, slot_ref, order_ref, g1_ref, g2_ref,
                    g3_ref, sph_ref, st_ref, casts_ref, *scratch,
                    n_chunks: int, n_tri: int, n_sph: int):
    """Primary cast -> initial packed walk state (main.rs:1150)."""
    geom = _geom_of(g1_ref, g2_ref, g3_ref, sph_ref, scratch, n_tri, n_sph,
                    n_chunks, order_ref)
    o = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :])
    d = (d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])
    shape = (1, o[0].shape[1])
    front = jnp.zeros(shape, jnp.int32)
    no_excl = jnp.full(shape, -1, jnp.int32)
    h = geom.nearest(o, d, front, no_excl, front, jnp.ones(shape, bool))
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    st = dict(
        alive=h["valid"], ar=zero, ag=zero, ab=zero, sr=one, sg=one, sb=one,
        cpx=h["px"], cpy=h["py"], cpz=h["pz"],
        cnx=h["nx"], cny=h["ny"], cnz=h["nz"], cu=h["u"], cv=h["v"],
        cprim=h["prim"], cobj=h["obj"], cback=h["backface"],
        cdx=d[0], cdy=d[1], cdz=d[2],
        df=zero, pr=zero, pg=zero, pb=zero,  # nothing deferred yet
    )
    _write_state(st_ref, st, _iload(slot_ref, 0))
    casts_ref[:, :] = jnp.ones(shape, jnp.int32)


def _bounce_kernel(st_in_ref, unif_ref, order_ref, g1_ref, g2_ref, g3_ref,
                   sph_ref, mat_ref, mat_T_ref, light_ref, st_out_ref,
                   casts_ref, *scratch, n_chunks: int, n_tri: int,
                   n_sph: int, n_light: int, max_distance: float,
                   max_retries: int, textures, first: bool):
    """One deferred-shading bounce over a state tile (mc_step_deferred;
    `first` statically skips the deferred sweep on bounce 0); dead tiles
    pass through."""
    any_alive = jnp.any(_iload(st_in_ref, mp.ST_ALIVE) != 0)
    # program_id is only lowerable at kernel top level (kc._order_row);
    # the pl.when bodies below must not read it themselves
    row8 = kc._order_row(order_ref, "binned")

    @pl.when(any_alive)
    def _run():
        geom = _geom_of(g1_ref, g2_ref, g3_ref, sph_ref, scratch, n_tri,
                        n_sph, n_chunks, order_ref, row8)
        st = _st_from_rows(st_in_ref)
        new_st, dc = mp.mc_step_deferred(
            geom, mat_ref[:, :], mat_T_ref[:, :], light_ref[:, :], n_light,
            textures, max_distance, max_retries, st,
            unif_ref[0:1, :], unif_ref[1:2, :], unif_ref[2:3, :],
            first=first,
        )
        _write_state(st_out_ref, new_st, _iload(st_in_ref, mp.ST_SLOT))
        casts_ref[:, :] = dc

    @pl.when(~any_alive)
    def _skip():
        st_out_ref[:, :] = st_in_ref[:, :]
        casts_ref[:, :] = jnp.zeros_like(casts_ref)


def _terminal_kernel(st_ref, order_ref, g1_ref, g2_ref, g3_ref, sph_ref,
                     mat_ref, mat_T_ref, light_ref, photon_ref, casts_ref,
                     *scratch, n_chunks: int, n_tri: int, n_sph: int,
                     n_light: int, textures, first: bool):
    """Depth-exhausted terminal shade (main.rs:524-527) + the last
    bounce's deferred hit-shade in ONE sweep (mc_terminal_deferred);
    photons come out in the CURRENT (sorted) lane order — the caller
    scatters by slot."""
    any_alive = jnp.any(_iload(st_ref, mp.ST_ALIVE) != 0)
    row8 = kc._order_row(order_ref, "binned")  # top level only, see _bounce_kernel

    @pl.when(any_alive)
    def _run():
        geom = _geom_of(g1_ref, g2_ref, g3_ref, sph_ref, scratch, n_tri,
                        n_sph, n_chunks, order_ref, row8)
        st = _st_from_rows(st_ref)
        ar, ag, ab, cnt = mp.mc_terminal_deferred(
            geom, mat_ref[:, :], mat_T_ref[:, :], light_ref[:, :], n_light,
            textures, st, first=first,
        )
        photon_ref[0:1, :] = ar
        photon_ref[1:2, :] = ag
        photon_ref[2:3, :] = ab
        casts_ref[:, :] = cnt

    @pl.when(~any_alive)
    def _done():
        # accum is final for dead lanes; no shade, no casts
        photon_ref[0:1, :] = st_ref[mp.ST_AR : mp.ST_AR + 1, :]
        photon_ref[1:2, :] = st_ref[mp.ST_AG : mp.ST_AG + 1, :]
        photon_ref[2:3, :] = st_ref[mp.ST_AB : mp.ST_AB + 1, :]
        casts_ref[:, :] = jnp.zeros_like(casts_ref)


def _predict_out_dir(state, u_step, mats):
    """Predict the direction the NEXT bounce kernel will advance along.

    Replays mc_step's roulette + lobe sample in plain jnp from the carried
    state and this bounce's pre-drawn uniforms: branch weights come from
    the material table only (textures override diffuse/normal, never the
    roulette weights, src/materials.rs:85-103), the lobe axis is -normal
    (diffuse) / incoming (glossy), and the non-refract advance direction
    is the REFLECTION of the sampled lobe about the hit normal
    (mc_pallas.mc_step: reflect3(sd, n), mirroring main.rs:563/582 where
    get_reflect re-reflects the perturbed hit).  Refract lanes advance
    along the march's exit ray — unknowable here — so they keep the lobe
    sample as a proxy.  This feeds the SORT KEY only: any permutation is
    correct (photons scatter back by slot), so 1-ulp disagreements with
    the in-kernel math can only cost coherence, never parity.
    """
    sh, tr, sm = mats
    slot = jax.lax.bitcast_convert_type(state[mp.ST_SLOT], jnp.int32)
    u_sel, u_phi, theta = (u_step[0, slot], u_step[1, slot],
                           u_step[2, slot])
    cobj = jnp.clip(
        jax.lax.bitcast_convert_type(state[mp.ST_OBJ], jnp.int32),
        0, sh.shape[0] - 1,
    )
    shin, transp, smooth = sh[cobj], tr[cobj], sm[cobj]
    w0 = (1.0 - shin) * (1.0 - transp)
    w1 = shin * (1.0 - transp)
    r = u_sel * (w0 + w1 + transp)
    sel_d = r < w0
    sel_f = ~sel_d & (r >= w0 + w1)
    nx, ny, nz = (state[mp.ST_NX], state[mp.ST_NY], state[mp.ST_NZ])
    dx, dy, dz = (state[mp.ST_DX], state[mp.ST_DY], state[mp.ST_DZ])
    expo = jnp.where(sel_d, 1.0, smooth)
    ax = jnp.where(sel_d, -nx, dx)
    ay = jnp.where(sel_d, -ny, dy)
    az = jnp.where(sel_d, -nz, dz)
    ax, ay, az = kc.normalize3(ax, ay, az)
    phi = kc.acos(kc.powf(1.0 - u_phi, expo))
    sp = jnp.sin(phi)
    sdx, sdy, sdz = kc.rotate_from_z(
        ax, ay, az, sp * jnp.cos(theta), sp * jnp.sin(theta), jnp.cos(phi)
    )
    fx, fy, fz = kc.reflect3(sdx, sdy, sdz, nx, ny, nz)
    return (jnp.where(sel_f, sdx, fx), jnp.where(sel_f, sdy, fy),
            jnp.where(sel_f, sdz, fz), sel_f)


def _sort_state(state, lo, inv_extent, u_step, mats, chunk_of_prim):
    """Sort lanes by (dead?, origin locality, predicted outgoing octant).

    Origin locality (major key): the ORIGIN CHUNK when BINNED_KEY is
    "chunk" — chunk_of_prim maps the lane's carried hit primitive to the
    blocked-layout chunk (BVH leaf group) whose AABB contains the bounce
    origin, so lanes grouped together start their next cast from the SAME
    leaf box and the per-tile front-to-back visit order + tmax pruning
    act like per-ray traversal.  "cell" keeps the r3/r4 8x8x8 scene-bbox
    grid (A/B reference).  Octant (minor key): sign bits of the direction
    the bounce will actually cast along (_predict_out_dir — keying on the
    stale INCOMING direction was measured a weak proxy for diffuse lanes,
    whose lobe hugs -normal).  Dead lanes get the top bit so they cluster
    into skippable tail tiles.  One stable argsort of int32 keys + one
    wide row-gather of the packed state.
    (16^3 cells were measured ~5% WORSE on the 51k terrain despite its
    ~400 chunks: the finer cell dominates the key and fragments octant
    coherence without changing chunk entry much.)
    """
    dead = jax.lax.bitcast_convert_type(
        state[mp.ST_ALIVE], jnp.int32
    ) == 0
    if BINNED_KEY == "chunk":
        prim = jnp.clip(
            jax.lax.bitcast_convert_type(state[mp.ST_PRIM], jnp.int32),
            0, chunk_of_prim.shape[0] - 1,
        )
        locality = chunk_of_prim[prim]
    else:
        q = []
        for r in (mp.ST_PX, mp.ST_PY, mp.ST_PZ):
            axis = r - mp.ST_PX
            t = (state[r] - lo[axis]) * inv_extent[axis]
            q.append(jnp.clip((t * 8.0).astype(jnp.int32), 0, 7))
        locality = (q[0] << 6) | (q[1] << 3) | q[2]
    pdx, pdy, pdz, sel_f = _predict_out_dir(state, u_step, mats)
    octant = (
        (pdx < 0).astype(jnp.int32) << 2
        | (pdy < 0).astype(jnp.int32) << 1
        | (pdz < 0).astype(jnp.int32)
    )
    # refract bit above the octant: the next bounce kernel's interior
    # march is whole-tile (its TIR while_loop runs for the worst lane and
    # its entry sweep is gated on any(refract lane)), so clustering the
    # roulette's refract picks makes most tiles march-free
    refr = sel_f.astype(jnp.int32)
    key = jnp.where(dead, jnp.int32(1 << 30),
                    (locality << 4) | (refr << 3) | octant)
    perm = jnp.argsort(key, stable=True)
    return state.T[perm].T


@functools.partial(
    jax.jit,
    static_argnames=("textures", "depth", "max_distance", "max_retries",
                     "interpret"),
)
def trace(scene: Scene, textures, ray_o, ray_d, unifs, depth: int,
          max_distance: float, max_retries: int, interpret: bool = False):
    """Binned per-bounce MC walk (blocked scenes only).

    Same contract as mc_pallas.trace: unifs [depth, 3, N] in slot order;
    returns (photon [N, 3] UNfiltered, casts scalar).
    """
    assert scene.blk_perm is not None and scene.n_tri > 0
    n = ray_o.shape[0]
    tile = min(BINNED_TILE or TILE_R, max(128, -(-n // 128) * 128))
    n_pad = (-n) % tile
    npad = n + n_pad
    grid = npad // tile

    g1 = kc.pack_tri_blocked(scene)
    g2 = kc.pack_boxes8(scene)
    g3 = kc.pack_sup8(scene)
    n_chunks = scene.blk_box.shape[0]
    sph = (pack_sph(scene) if scene.n_sph > 0
           else jnp.zeros((8, 8), jnp.float32))
    mat_t = kc.pack_materials(scene)
    mat_T = mat_t.T
    lights = kc.pack_lights(scene)

    g1, g1_spec, scratch_shapes = kc.stream_spec(g1)
    row = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    # per-tile supergroup visit order (kc.sup_visit_order: front-to-back
    # from the tile's origins so tmax prunes the chunks behind the first
    # hits), delivered as 8-row SMEM windows (kc.pack_sup_order)

    def tile_centroids(pos, w):
        """[3, grid, tile] positions + [grid, tile] weights -> [grid, 3]."""
        cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        return (jnp.sum(pos * w[None], axis=2) / cnt[None]).T

    def state_order(state):
        if not kc.sup_order_on("binned"):
            order, _ = kc.pack_sup_order(jnp.zeros((grid, 1), jnp.int32))
            return order
        alive = jax.lax.bitcast_convert_type(
            state[mp.ST_ALIVE : mp.ST_ALIVE + 1], jnp.int32
        ) != 0
        pos = state[mp.ST_PX : mp.ST_PZ + 1].reshape(3, grid, tile)
        w = alive.reshape(grid, tile).astype(jnp.float32)
        order, _ = kc.pack_sup_order(
            kc.sup_visit_order(tile_centroids(pos, w), g3)
        )
        return order

    def prep(x):
        x = x.T if x.ndim == 2 else x[None, :]
        return jnp.pad(x, [(0, 0), (0, n_pad)]) if n_pad else x

    # pad slots to n (a dead scatter target row we never read)
    slots = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32),
         jnp.full((n_pad,), 0, jnp.int32)]
    )[None, :]

    # --- primary cast ---
    o_t, d_t = prep(ray_o), prep(ray_d)
    if kc.sup_order_on("binned"):
        order0, sord = kc.pack_sup_order(kc.sup_visit_order(
            tile_centroids(o_t.reshape(3, grid, tile),
                           jnp.ones((grid, tile), jnp.float32)),
            g3,
        ))
    else:
        order0, sord = kc.pack_sup_order(jnp.zeros((grid, 1), jnp.int32))
    pk = functools.partial(_primary_kernel, n_chunks=n_chunks,
                           n_tri=scene.n_tri, n_sph=scene.n_sph)
    state, casts0 = pl.pallas_call(
        pk,
        grid=(grid,),
        in_specs=[row(3), row(3), row(1), sord, g1_spec, const(g2),
                  const(g3), const(sph)],
        out_specs=[row(N_ST), row(1)],
        out_shape=[
            jax.ShapeDtypeStruct((N_ST, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(o_t, d_t, jax.lax.bitcast_convert_type(
        slots, jnp.float32), order0, g1, g2, g3, sph)
    # padded lanes: mark dead so they never pay bounce work (their zero
    # accum + dead state make the final slot-0 scatter-add a no-op)
    if n_pad:
        lane = jnp.arange(npad)[None, :]
        dead_f = jax.lax.bitcast_convert_type(
            jnp.zeros((1, npad), jnp.int32), jnp.float32
        )
        alive_row = jnp.where(
            lane < n, state[mp.ST_ALIVE : mp.ST_ALIVE + 1], dead_f
        )
        state = state.at[mp.ST_ALIVE : mp.ST_ALIVE + 1].set(alive_row)
    casts = jnp.sum(jnp.where(jnp.arange(npad)[None, :] < n, casts0, 0))

    # coherence-grid bbox from the chunk boxes (device values; computed
    # once under jit — the mesh AABB, which is where bounce origins live)
    bb = scene.blk_box
    lo = jnp.min(bb[:, 0:3], axis=0)
    ext = jnp.maximum(jnp.max(bb[:, 3:6], axis=0) - lo, 1e-6)
    inv_extent = 1.0 / ext

    # prim -> origin chunk for the "chunk" sort key: invert blk_perm
    # (blocked row -> orig tri id) to orig id -> blocked chunk; sphere
    # hits get pseudo-chunks past the triangle chunks.  Pad rows carry
    # perm == -1 and scatter out of bounds (dropped).
    perm_rows = scene.blk_perm
    rows = jnp.arange(perm_rows.shape[0], dtype=jnp.int32)
    idx = jnp.where(perm_rows >= 0, perm_rows, scene.n_tri)
    chunk_of_tri = jnp.zeros((scene.n_tri,), jnp.int32).at[idx].set(
        rows // kc.BLK_CHUNK, mode="drop"
    )
    chunk_of_prim = jnp.concatenate(
        [chunk_of_tri,
         n_chunks + jnp.arange(max(scene.n_sph, 1), dtype=jnp.int32)]
    )

    bk_base = functools.partial(
        _bounce_kernel, n_chunks=n_chunks, n_tri=scene.n_tri,
        n_sph=scene.n_sph, n_light=scene.n_light,
        max_distance=max_distance, max_retries=max_retries,
        textures=textures,
    )

    def bounce(state, u_step, first):
        bk = functools.partial(bk_base, first=first)
        # gather this bounce's 3 uniform rows by carried slot id
        slot = jax.lax.bitcast_convert_type(
            state[mp.ST_SLOT], jnp.int32
        )
        u = u_step[:, slot]  # [3, npad]
        return pl.pallas_call(
            bk,
            grid=(grid,),
            in_specs=[row(N_ST), row(3), sord, g1_spec, const(g2),
                      const(g3), const(sph), const(mat_t), const(mat_T),
                      const(lights)],
            out_specs=[row(N_ST), row(1)],
            out_shape=[
                jax.ShapeDtypeStruct((N_ST, npad), jnp.float32),
                jax.ShapeDtypeStruct((1, npad), jnp.int32),
            ],
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(state, u, state_order(state), g1, g2, g3, sph, mat_t, mat_T,
          lights)

    u_pad = jnp.pad(unifs, [(0, 0), (0, 0), (0, n_pad)]) if n_pad else unifs
    mats = (scene.mat_shiness, scene.mat_transparency, scene.mat_smoothness)
    for step in range(depth):
        state = _sort_state(state, lo, inv_extent, u_pad[step], mats,
                            chunk_of_prim)
        state, dc = bounce(state, u_pad[step], first=(step == 0))
        casts = casts + jnp.sum(dc)

    tk = functools.partial(
        _terminal_kernel, n_chunks=n_chunks, n_tri=scene.n_tri,
        n_sph=scene.n_sph, n_light=scene.n_light, textures=textures,
        first=(depth == 0),
    )
    photon_rows, dc = pl.pallas_call(
        tk,
        grid=(grid,),
        in_specs=[row(N_ST), sord, g1_spec, const(g2), const(g3),
                  const(sph), const(mat_t), const(mat_T), const(lights)],
        out_specs=[row(3), row(1)],
        out_shape=[
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(state, state_order(state), g1, g2, g3, sph, mat_t, mat_T, lights)
    casts = casts + jnp.sum(dc)

    # un-permute: scatter-add photons back to slot order.  Pad lanes were
    # pinned to slot 0 with dead state and zero accum, so .add (never
    # .set) keeps them from clobbering the real slot-0 photon.
    slot = jax.lax.bitcast_convert_type(state[mp.ST_SLOT], jnp.int32)
    photon = jnp.zeros((n, 3), jnp.float32).at[slot].add(
        photon_rows.T, mode="drop"
    )
    return photon, casts
