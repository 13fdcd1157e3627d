"""High-level render API.

Composes the camera, the wavefront Whitted tracer, and (for the stochastic
pass) the distributed tracer into whole-frame renders, tiling the pixel
grid so device buffers stay bounded.  This is the TPU-native counterpart of
the reference's driver loops in main() (src/main.rs:1084-1173), minus the
progressive accumulation which lives in parallel/progressive.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops import camera as camera_ops
from raytracer_tpu.ops.distributed import trace_distributed
from raytracer_tpu.ops.trace import trace_whitted
from raytracer_tpu.scene.types import Camera, Scene


def clip_coords(width: int, height: int) -> np.ndarray:
    """Pixel grid -> clip coords [H*W, 2], row-major (y, x) like the
    reference's iproduct!(0..h, 0..w) (src/main.rs:1089, 1094-1095)."""
    ys, xs = np.mgrid[0:height, 0:width]
    clip_x = (xs - width / 2.0) / height
    clip_y = (height / 2.0 - ys) / height
    return np.stack([clip_x, clip_y], axis=-1).reshape(-1, 2).astype(np.float32)


@partial(jax.jit, static_argnums=(3, 4))
def _whitted_tile(scene: Scene, camera: Camera, clip, textures, cfg: RenderConfig):
    o, d = camera_ops.shoot(camera, clip)
    return trace_whitted(scene, textures, o, d, cfg)


@partial(jax.jit, static_argnums=(4, 5))
def _mc_tile(scene: Scene, camera: Camera, clip, key, textures, cfg: RenderConfig):
    """One stochastic sample per pixel: thin-lens primaries + MC trace
    (reference epoch body, src/main.rs:1131-1156)."""
    k_lens, k_path = jax.random.split(key)
    offsets = (
        jax.random.normal(k_lens, (clip.shape[0], 2), clip.dtype) * cfg.blur
    )
    o, d = camera_ops.shoot_focus(camera, clip, offsets, cfg.focus)
    return trace_distributed(scene, textures, o, d, k_path, cfg)


def render_whitted(
    scene: Scene, textures, camera: Camera, cfg: RenderConfig
) -> Tuple[jnp.ndarray, dict]:
    """Whitted pass over the full frame.  Returns ([H, W, 3], stats)."""
    clips = clip_coords(cfg.width, cfg.height)
    n = clips.shape[0]
    tile = min(cfg.tile_rays, n)

    out = []
    stats = []
    # Enqueue every tile before syncing — a host sync per tile would
    # serialize dispatch round-trips.
    for start in range(0, n, tile):
        chunk = clips[start : start + tile]
        pad = tile - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, 2), np.float32)])
        res = _whitted_tile(scene, camera, jnp.asarray(chunk), textures, cfg)
        out.append(res.color[: tile - pad] if pad else res.color)
        stats.append((res.casts, res.dropped))

    img = jnp.concatenate(out, axis=0).reshape(cfg.height, cfg.width, 3)
    casts = sum(int(c) for c, _ in stats)
    dropped = sum(int(d) for _, d in stats)
    return img, {"casts": casts, "dropped": dropped, "primary_rays": n}


def render_distributed_epoch(
    scene: Scene, textures, camera: Camera, cfg: RenderConfig, key
) -> Tuple[jnp.ndarray, dict]:
    """One epoch of the stochastic pass: one photon per pixel.

    Returns ([H, W, 3] photons — is_normal-filtered like main.rs:1157-1160 —
    plus stats).  Accumulation/tone-normalization is the caller's job
    (parallel/progressive.py), matching the reference's epoch loop.
    """
    clips = clip_coords(cfg.width, cfg.height)
    n = clips.shape[0]
    tile = min(cfg.tile_rays, n)

    out = []
    stats = []
    for ti, start in enumerate(range(0, n, tile)):
        chunk = clips[start : start + tile]
        pad = tile - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, 2), np.float32)])
        tkey = jax.random.fold_in(key, ti)
        res = _mc_tile(scene, camera, jnp.asarray(chunk), tkey, textures, cfg)
        out.append(res.photon[: tile - pad] if pad else res.photon)
        stats.append((res.casts, res.filtered))

    img = jnp.concatenate(out, axis=0).reshape(cfg.height, cfg.width, 3)
    casts = sum(int(c) for c, _ in stats)
    filtered = sum(int(f) for _, f in stats)
    return img, {"casts": casts, "filtered": filtered, "primary_rays": n}
