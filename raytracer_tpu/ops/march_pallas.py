"""Pallas kernel for the total-internal-reflection interior march.

World::get_refract (reference: src/main.rs:343-405) is a data-dependent
loop: refract in, then bounce reflectively inside the dielectric (<= 10
retries, distance budget) until Snell lets the ray out.  The XLA version
(ops/trace.refract_march) runs each iteration as full-width device ops —
every iteration pays kernel launches and HBM round-trips across the whole
pool even though only glass lanes march.

Here the WHOLE march runs inside one kernel: each 2048-lane grid program
loops over its own tile with a lax.while_loop, so programs whose tile has
no marching lanes pay one scalar any() check and exit.  The sweep reuses the [prims x lanes] tables of
intersect_pallas; interior hits reconstruct their (backface-flipped,
unnormalized-interpolation) shading normal in-kernel via one-hot masked
reduces over the triangle table.

Parity notes:
  * Interior rays are face=Back with exclusion (prim, FRONT), and escape
    rays face=Front with exclusion (prim, BACK).  Against Back-face-only /
    Front-face-only candidate sets those exclusions can never fire
    (FRONT criterion needs a front-face candidate and vice versa,
    src/main.rs:190-200), so the specialized Back sweep omits exclusion
    entirely — a no-op removed, not a semantic change.
  * Loop condition order matches the reference (343-405): travel and retry
    are checked before each bounce; exhaustion with no exit => Trapped;
    any interior miss => Infinite; both are escaped=False for callers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.scene.types import Scene
from raytracer_tpu.ops.intersect_pallas import TILE_R, pack_sph, pack_tri

_BIG = 3.0e38


def _refract_rows(nx, ny, nz, dx, dy, dz, k):
    """Snell refraction on [1,R] rows (src/main.rs:344-352).

    Returns (tx, ty, tz, ok); ok=False is total internal reflection.
    """
    cos = -(dx * nx + dy * ny + dz * nz)
    sin2 = 1.0 - cos * cos
    ok = k * k >= sin2
    inner = jnp.maximum(1.0 - sin2 / (k * k), 0.0)
    root = jnp.sqrt(inner)
    tx = (dx + nx * cos) / k - nx * root
    ty = (dy + ny * cos) / k - ny * root
    tz = (dz + nz * cos) / k - nz * root
    inv = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-30))
    return tx * inv, ty * inv, tz * inv, ok


def _back_sweep_with_normal(px, py, pz, dx, dy, dz, active, tri, sph,
                            n_tri, n_sph):
    """Back-face nearest sweep + interior normal, [prims, R] layout.

    Returns (t [1,R] _BIG on miss, prim [1,R], nx, ny, nz) where the normal
    is the backface-flipped shading normal at the hit (triangles:
    -interpolated vertex normals via barycentric, unnormalized,
    src/main.rs:248-251; spheres: -(p-c)/|p-c|, src/main.rs:305-308).
    """
    shape = (1, px.shape[1])
    best_t = jnp.full(shape, _BIG, jnp.float32)
    best_i = jnp.full(shape, -1, jnp.int32)

    if n_tri > 0:
        fn0, fn1, fn2 = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        dpl = tri[:, 3:4]
        no_d = fn0 * dx + fn1 * dy + fn2 * dz
        backface = no_d > 0.0  # Back rays only hit backfaces (main.rs:184-188)
        t = (dpl - (fn0 * px + fn1 * py + fn2 * pz)) / no_d
        ok = backface & (t > 0.0)
        for e in range(3):
            g0 = tri[:, 4 + 3 * e : 5 + 3 * e]
            g1 = tri[:, 5 + 3 * e : 6 + 3 * e]
            g2 = tri[:, 6 + 3 * e : 7 + 3 * e]
            h = tri[:, 13 + e : 14 + e]
            og = g0 * px + g1 * py + g2 * pz
            dg = g0 * dx + g1 * dy + g2 * dz
            ok = ok & (og + h + t * dg >= 0.0)
        ok = ok & active & jnp.isfinite(t)
        tm_tri = jnp.where(ok, t, _BIG)
        sub = jax.lax.broadcasted_iota(jnp.int32, tm_tri.shape, 0)
        t_min = jnp.min(tm_tri, axis=0, keepdims=True)
        win = jnp.max(jnp.where(tm_tri == t_min, sub, -1), axis=0, keepdims=True)
        found = t_min < _BIG
        best_t = jnp.where(found, t_min, best_t)
        best_i = jnp.where(found, win, best_i)

    if n_sph > 0:
        cx, cy, cz, r2 = sph[:, 0:1], sph[:, 1:2], sph[:, 2:3], sph[:, 3:4]
        wx = cx - px
        wy = cy - py
        wz = cz - pz
        qx = wy * dz - wz * dy
        qy = wz * dx - wx * dz
        qz = wx * dy - wy * dx
        dist2 = qx * qx + qy * qy + qz * qz
        tc = dx * wx + dy * wy + dz * wz
        kk = jnp.sqrt(jnp.maximum(r2 - dist2, 0.0))
        t = tc + kk  # Back rays take the far shell (main.rs:273-281)
        ok = active & (dist2 <= r2) & (t > 0.0) & jnp.isfinite(t)
        tm = jnp.where(ok, t, _BIG)
        sub = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
        t_min = jnp.min(tm, axis=0, keepdims=True)
        win = jnp.max(jnp.where(tm == t_min, sub, -1), axis=0, keepdims=True)
        found = (t_min < _BIG) & (t_min <= best_t)
        best_t = jnp.where(found, t_min, best_t)
        best_i = jnp.where(found, n_tri + win, best_i)

    hx = px + best_t * dx
    hy = py + best_t * dy
    hz = pz + best_t * dz

    nx = jnp.zeros(shape, jnp.float32)
    ny = jnp.zeros(shape, jnp.float32)
    nz = jnp.zeros(shape, jnp.float32)

    if n_tri > 0:
        sub = jax.lax.broadcasted_iota(jnp.int32, (tri.shape[0], shape[1]), 0)
        oh = ((sub == best_i) & (best_i >= 0)).astype(jnp.float32)

        def col(c):
            return jnp.sum(oh * tri[:, c : c + 1], axis=0, keepdims=True)

        area2 = col(31)
        inv_a2 = 1.0 / jnp.where(area2 != 0.0, area2, 1.0)
        for e in range(3):
            gx, gy, gz = col(4 + 3 * e), col(5 + 3 * e), col(6 + 3 * e)
            h = col(13 + e)
            bary = (gx * hx + gy * hy + gz * hz + h) * inv_a2
            nx = nx + bary * col(16 + 3 * e)
            ny = ny + bary * col(17 + 3 * e)
            nz = nz + bary * col(18 + 3 * e)
        # backface hit: flipped (negated) interpolated normal
        nx, ny, nz = -nx, -ny, -nz

    if n_sph > 0:
        is_sph = best_i >= n_tri if n_tri > 0 else best_i >= 0
        sub = jax.lax.broadcasted_iota(jnp.int32, (sph.shape[0], shape[1]), 0)
        oh = ((sub + n_tri == best_i) & is_sph).astype(jnp.float32)
        cx = jnp.sum(oh * sph[:, 0:1], axis=0, keepdims=True)
        cy = jnp.sum(oh * sph[:, 1:2], axis=0, keepdims=True)
        cz = jnp.sum(oh * sph[:, 2:3], axis=0, keepdims=True)
        wx = hx - cx
        wy = hy - cy
        wz = hz - cz
        inv = jax.lax.rsqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-30))
        nx = jnp.where(is_sph, -wx * inv, nx)
        ny = jnp.where(is_sph, -wy * inv, ny)
        nz = jnp.where(is_sph, -wz * inv, nz)

    return best_t, best_i, hx, hy, hz, nx, ny, nz


def _march_kernel(pos_ref, nrm_ref, dir_ref, k_ref, want_ref, tri_ref, sph_ref,
                  esc_ref, prim_ref, scal_ref, iters_ref,
                  *, n_tri: int, n_sph: int, max_distance: float,
                  max_retries: int):
    """Full interior march for one ray tile.

    Outputs: esc [6,R] f32 = esc_pos(3), esc_dir(3); prim [1,R] i32;
    scal [2,R] f32 = (escaped, travel); iters [1,R] i32 (pending count
    per lane, for the cast statistics).
    """
    px, py, pz = pos_ref[0:1, :], pos_ref[1:2, :], pos_ref[2:3, :]
    nx0, ny0, nz0 = nrm_ref[0:1, :], nrm_ref[1:2, :], nrm_ref[2:3, :]
    dx0, dy0, dz0 = dir_ref[0:1, :], dir_ref[1:2, :], dir_ref[2:3, :]
    k = k_ref[0:1, :]
    want = want_ref[0:1, :] != 0
    tri = tri_ref[:, :] if n_tri > 0 else None
    sph = sph_ref[:, :] if n_sph > 0 else None
    shape = (1, px.shape[1])

    zero = jnp.zeros(shape, jnp.float32)
    izero = jnp.zeros(shape, jnp.int32)

    def all_dead():
        esc_ref[:, :] = jnp.zeros((6, shape[1]), jnp.float32)
        prim_ref[:, :] = izero
        scal_ref[:, :] = jnp.zeros((2, shape[1]), jnp.float32)
        iters_ref[:, :] = izero

    # Entry refraction (TIR at entry -> Trapped, main.rs:354-358)
    rx, ry, rz, ok_in = _refract_rows(nx0, ny0, nz0, dx0, dy0, dz0, k)
    active0 = want & ok_in

    @pl.when(jnp.logical_not(jnp.any(active0)))
    def _():
        all_dead()

    @pl.when(jnp.any(active0))
    def _():
        # First interior leg (main.rs:360-376)
        t, prim, hx, hy, hz, nix, niy, niz = _back_sweep_with_normal(
            px, py, pz, rx, ry, rz, active0, tri, sph, n_tri, n_sph
        )
        alive = active0 & (t < _BIG)  # miss -> Infinite -> dead
        travel = jnp.where(alive, t, 0.0)  # |hit - entry| = t (unit dir)
        ox, oy, oz, has_out = _refract_rows(nix, niy, niz, rx, ry, rz, 1.0 / k)
        has_out = alive & has_out

        # loop carries are i32, not i1 — Mosaic cannot yield bool vectors
        state = dict(
            cx=hx, cy=hy, cz=hz, nx=nix, ny=niy, nz=niz,
            dx=rx, dy=ry, dz=rz, ox=ox, oy=oy, oz=oz,
            prim=prim, alive=alive.astype(jnp.int32),
            has_out=has_out.astype(jnp.int32), travel=travel,
            retry=izero, iters=izero,
        )

        def pending(s):
            return (
                (s["alive"] != 0) & (s["has_out"] == 0)
                & (s["travel"] <= max_distance) & (s["retry"] < max_retries)
            )

        def body(s):
            p = pending(s)

            def step(s):
                # get_reflect on the interior hit (main.rs:380): mirror the
                # interior direction about the flipped normal
                dn = s["dx"] * s["nx"] + s["dy"] * s["ny"] + s["dz"] * s["nz"]
                fx = s["dx"] - 2.0 * dn * s["nx"]
                fy = s["dy"] - 2.0 * dn * s["ny"]
                fz = s["dz"] - 2.0 * dn * s["nz"]
                inv = jax.lax.rsqrt(jnp.maximum(fx * fx + fy * fy + fz * fz, 1e-30))
                fx, fy, fz = fx * inv, fy * inv, fz * inv

                t2, prim2, hx2, hy2, hz2, nx2, ny2, nz2 = (
                    _back_sweep_with_normal(
                        s["cx"], s["cy"], s["cz"], fx, fy, fz, p, tri, sph,
                        n_tri, n_sph,
                    )
                )
                step_alive = p & (t2 < _BIG)
                travel2 = s["travel"] + jnp.where(step_alive, t2, 0.0)
                ox2, oy2, oz2, ok2 = _refract_rows(nx2, ny2, nz2, fx, fy, fz,
                                                   1.0 / k)

                def upd(new, old):
                    return jnp.where(step_alive, new, old)

                # boolean updates via algebra, not select (Mosaic rejects
                # i1-truncating selects)
                return dict(
                    cx=upd(hx2, s["cx"]), cy=upd(hy2, s["cy"]), cz=upd(hz2, s["cz"]),
                    nx=upd(nx2, s["nx"]), ny=upd(ny2, s["ny"]), nz=upd(nz2, s["nz"]),
                    dx=upd(fx, s["dx"]), dy=upd(fy, s["dy"]), dz=upd(fz, s["dz"]),
                    ox=upd(ox2, s["ox"]), oy=upd(oy2, s["oy"]), oz=upd(oz2, s["oz"]),
                    prim=jnp.where(step_alive, prim2, s["prim"]),
                    alive=((p & step_alive) | (~p & (s["alive"] != 0))).astype(jnp.int32),
                    has_out=((step_alive & ok2) | (~step_alive & (s["has_out"] != 0))).astype(jnp.int32),
                    travel=jnp.where(step_alive, travel2, s["travel"]),
                    retry=s["retry"] + p.astype(jnp.int32),
                    iters=s["iters"] + p.astype(jnp.int32),
                )

            return step(s)

        # while_loop gives the early exit (a tile with no marching lanes
        # pays one scalar any() check); retry < max_retries bounds it.
        state = jax.lax.while_loop(
            lambda s: jnp.any(pending(s)), body, state
        )

        escaped = (state["alive"] != 0) & (state["has_out"] != 0)
        esc_ref[0:1, :] = state["cx"]
        esc_ref[1:2, :] = state["cy"]
        esc_ref[2:3, :] = state["cz"]
        esc_ref[3:4, :] = state["ox"]
        esc_ref[4:5, :] = state["oy"]
        esc_ref[5:6, :] = state["oz"]
        prim_ref[:, :] = state["prim"]
        scal_ref[0:1, :] = escaped.astype(jnp.float32)
        scal_ref[1:2, :] = state["travel"]
        iters_ref[:, :] = state["iters"] + active0.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_distance", "max_retries",
                                              "interpret"))
def march(scene: Scene, pos, normal, ray_d, prim, k, want,
          max_distance: float, max_retries: int, interpret: bool = False):
    """Pallas interior march over a ray batch.

    Returns (escaped [N] bool, travel [N], esc_o [N,3], esc_d [N,3],
    esc_prim [N] i32, casts [() i32]).
    `prim` (the entry primitive) is accepted for interface parity but
    unused: interior-ray exclusions are provable no-ops (module docstring).
    """
    del prim
    n = pos.shape[0]
    tile = min(TILE_R, max(128, -(-n // 128) * 128))
    n_pad = (-n) % tile
    grid = (n + n_pad) // tile

    def prep(x):
        x = x.T if x.ndim == 2 else x[None, :]
        return jnp.pad(x, [(0, 0), (0, n_pad)]) if n_pad else x

    pos_t = prep(pos)
    nrm_t = prep(normal)
    dir_t = prep(ray_d)
    k_t = prep(k)
    want_t = prep(want.astype(jnp.int32))
    tri = pack_tri(scene) if scene.n_tri > 0 else jnp.zeros((8, 34), jnp.float32)
    sph = pack_sph(scene) if scene.n_sph > 0 else jnp.zeros((8, 8), jnp.float32)

    kernel = functools.partial(
        _march_kernel, n_tri=scene.n_tri, n_sph=scene.n_sph,
        max_distance=max_distance, max_retries=max_retries,
    )
    row_spec = lambda rows: pl.BlockSpec((rows, tile), lambda i: (0, i),
                                         memory_space=pltpu.VMEM)
    np_ = pos_t.shape[1]
    esc, eprim, scal, iters = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            row_spec(3), row_spec(3), row_spec(3), row_spec(1), row_spec(1),
            pl.BlockSpec(tri.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sph.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec(6), row_spec(1), row_spec(2), row_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((6, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
            jax.ShapeDtypeStruct((2, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
        ],
        interpret=interpret,
    )(pos_t, nrm_t, dir_t, k_t, want_t, tri, sph)

    return (
        scal[0, :n] > 0.5,
        scal[1, :n],
        esc[0:3, :n].T,
        esc[3:6, :n].T,
        eprim[0, :n],
        jnp.sum(iters[0, :n]),
    )
