"""Binned per-bounce MC path (ops/mc_binned.py) vs the whole-walk
mega-kernel (ops/mc_pallas.py).

Both consume the same [depth, 3, N] slot-ordered uniforms, so each
primary ray walks the identical roulette path; the binned path merely
re-orders lanes between bounces (sort by origin cell x direction
octant) and un-permutes at the end.  Photons must therefore agree
lane-for-lane (f32 op-ordering tolerance only) and cast counters must
match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops import intersect, mc_binned, mc_pallas
from raytracer_tpu.ops.camera import shoot
from raytracer_tpu.render import clip_coords
from raytracer_tpu.scene.presets import mesh_scene


@pytest.fixture(scope="module")
def mesh():
    return mesh_scene(grid=24)


def _unifs(key, depth, n):
    draws = []
    for step in range(depth):
        kstep = jax.random.fold_in(key, step)
        k_sel, k_phi, k_theta = jax.random.split(kstep, 3)
        draws.append(jnp.stack([
            jax.random.uniform(k_sel, (n,), jnp.float32),
            jax.random.uniform(k_phi, (n,), jnp.float32),
            jax.random.uniform(k_theta, (n,), jnp.float32,
                               minval=-np.pi, maxval=np.pi),
        ]))
    return jnp.stack(draws)


@pytest.mark.parametrize(
    "depth",
    [1, pytest.param(3, marks=pytest.mark.heavy)],  # depth-3 walk is the
    # exhaustive variant; the quick tier keeps the depth-1 lane-exact gate
)
def test_binned_matches_mega_kernel(mesh, depth):
    scene, textures, cam = mesh
    w, h = 24, 16
    clips = jnp.asarray(clip_coords(w, h))
    o, d = shoot(cam, clips)
    cfg = RenderConfig(width=w, height=h, depth=depth)
    unifs = _unifs(jax.random.PRNGKey(7), depth, w * h)

    intersect.set_pallas_mode("interpret")
    try:
        ph_mega, c_mega = mc_pallas.trace(
            scene, textures, o, d, unifs, depth,
            cfg.max_refract_distance, cfg.max_tir_retries, interpret=True,
        )
        ph_bin, c_bin = mc_binned.trace(
            scene, textures, o, d, unifs, depth,
            cfg.max_refract_distance, cfg.max_tir_retries, interpret=True,
        )
    finally:
        intersect.set_pallas_mode("auto")

    a, b = np.asarray(ph_mega), np.asarray(ph_bin)
    assert np.isfinite(b).all()
    close = np.all(np.isclose(a, b, rtol=1e-4, atol=1e-5), axis=-1)
    assert close.mean() >= 0.995, f"only {close.mean():.4f} lanes agree"
    assert int(c_mega) == int(c_bin)


@pytest.mark.heavy  # exhaustive interpret-mode parity; quick tier keeps a small-shape guard
def test_render_epochs_routes_blocked_scene_through_binned(mesh, monkeypatch):
    """render_epochs (K MC epochs in one fori dispatch) over a blocked
    scene must equal the sum of K render_distributed_epoch calls when the
    scene routes through the binned per-bounce path — exercises the
    between-bounce sort + slot un-permute INSIDE a fori_loop carry, which
    the direct trace-level parity test above cannot.

    Tolerance is per-pixel agreement (>= 99.5%), not allclose: XLA fuses
    the fori-loop body differently from the standalone epoch program, so
    last-ulp f32 differences can flip a roulette branch on rare lanes
    (measured: the UNBINNED mega-kernel route flips ~1 pixel per 280 at
    this size too, so this is dispatch-shape nondeterminism, not a
    binned-path defect).  Flipped lanes walk different paths, so the cast
    counters may differ by a few per flipped pixel."""
    from raytracer_tpu.ops import distributed, mc_binned as mb
    from raytracer_tpu.render import render_distributed_epoch, render_epochs

    scene, textures, cam = mesh
    assert scene.n_tri < mb.BINNED_MIN_TRIS  # small mesh: force the route
    monkeypatch.setattr(mb, "BINNED_MIN_TRIS", 64)

    cfg = RenderConfig(width=20, height=14, depth=2, tile_rays=20 * 14)
    key = jax.random.PRNGKey(11)
    intersect.set_pallas_mode("interpret")
    try:
        accum, stats = render_epochs(scene, textures, cam, cfg, key, 2)
        total = np.zeros((cfg.height, cfg.width, 3), np.float32)
        casts = 0
        for i in range(2):
            ph, st = render_distributed_epoch(
                scene, textures, cam, cfg, jax.random.fold_in(key, i)
            )
            total += np.asarray(ph)
            casts += st["casts"]
    finally:
        intersect.set_pallas_mode("auto")
    a = np.asarray(accum)
    close = np.all(np.isclose(a, total, rtol=2e-4, atol=1e-6), axis=-1)
    n_bad = int((~close).sum())
    assert close.mean() >= 0.995, f"only {close.mean():.4f} pixels agree"
    assert abs(stats["casts"] - casts) <= 16 * max(1, n_bad) * 2, (
        stats["casts"], casts, n_bad)
