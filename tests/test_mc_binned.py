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


@pytest.mark.parametrize("depth", [1, 3])
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
