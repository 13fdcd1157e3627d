"""Progressive accumulation driver with checkpoint/resume.

The reference's main() (src/main.rs:1084-1173): Whitted pass accumulates
into the framebuffer, then 100 stochastic epochs each add one photon per
pixel, re-run the percentile normalizer on the ACCUMULATED buffer in place
(repeated renormalization is part of the observed output behavior,
main.rs:1171), and atomically rewrite out.png — so killing the process at
any point leaves a valid image (report/Report.md blesses exactly that
workflow).

This driver adds what the reference lacks (SURVEY.md §5.3-5.4): epoch-
granular checkpointing of (accumulator, epoch, seed), so a progressive
render is resumable — trivial here because RNG keys are counter-based,
unlike the reference's 1.2M in-memory IsaacRng states which die with the
process.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops.tonemap import post_process
from raytracer_tpu.render import render_distributed_epoch, render_whitted
from raytracer_tpu.scene.types import Camera, Scene
from raytracer_tpu.utils import color as color_utils
from raytracer_tpu.utils.png import write_png_atomic


@dataclasses.dataclass
class ProgressiveState:
    img: jnp.ndarray  # [H, W, 3] accumulated (and renormalized) buffer
    epoch: int
    seed: int


def save_checkpoint(path: str, state: ProgressiveState) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, img=np.asarray(state.img), epoch=state.epoch, seed=state.seed)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[ProgressiveState]:
    if not os.path.exists(path):
        return None
    data = np.load(path)
    return ProgressiveState(
        img=jnp.asarray(data["img"]),
        epoch=int(data["epoch"]),
        seed=int(data["seed"]),
    )


def write_image(path: str, img) -> None:
    """Linear accumulated buffer -> sRGB u8 PNG, atomic (main.rs:764-776)."""
    u8 = np.asarray(color_utils.linear_to_u8(img))
    write_png_atomic(path, u8)


def render_progressive(
    scene: Scene,
    textures,
    camera: Camera,
    cfg: RenderConfig,
    out_path: str = "out.png",
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    on_epoch: Optional[Callable[[int, dict], None]] = None,
    log: Callable[[str], None] = print,
    mesh=None,
) -> ProgressiveState:
    """Full reference schedule: Whitted pass + cfg.epochs stochastic epochs,
    progressive PNG after each, optional checkpoint each epoch.

    With a `mesh` (parallel/mesh.make_render_mesh), the whitted pass shards
    pixel tiles over the dp axis and each epoch gathers |sp| samples per
    pixel over ICI — the multi-chip analogue of the reference's rayon pool.
    """
    state = load_checkpoint(checkpoint_path) if checkpoint_path else None

    if mesh is not None:
        from raytracer_tpu.parallel.mesh import (
            render_mc_epoch_sharded,
            render_whitted_sharded,
        )

        whitted_fn = lambda: render_whitted_sharded(
            scene, textures, camera, cfg, mesh
        )
        epoch_fn = lambda key: render_mc_epoch_sharded(
            scene, textures, camera, cfg, mesh, key
        )
    else:
        whitted_fn = lambda: render_whitted(scene, textures, camera, cfg)
        epoch_fn = lambda key: render_distributed_epoch(
            scene, textures, camera, cfg, key
        )

    if state is None:
        t0 = time.time()
        img, stats = whitted_fn()
        dt = max(time.time() - t0, 1e-9)
        log(
            f"{stats['primary_rays']} rays in {dt * 1e3:.0f} ms "
            f"({stats['casts'] / dt:,.0f} casts/s)"
        )
        img = post_process(img, cfg.percentile)
        write_image(out_path, img)
        state = ProgressiveState(img=img, epoch=0, seed=seed)
        if checkpoint_path:
            save_checkpoint(checkpoint_path, state)
    else:
        log(f"resumed at epoch {state.epoch}")

    base_key = jax.random.PRNGKey(state.seed)
    while state.epoch < cfg.epochs:
        t0 = time.time()
        ekey = jax.random.fold_in(base_key, state.epoch)
        photons, stats = epoch_fn(ekey)
        img = state.img + photons  # accumulate on top (main.rs:1163-1166)
        img = post_process(img, cfg.percentile)  # in-place renorm (1171)
        dt = max(time.time() - t0, 1e-9)
        kept = stats["primary_rays"] - stats["filtered"]
        log(
            f"{kept} rays in {dt * 1e3:.0f} ms "
            f"({stats['casts'] / dt:,.0f} casts/s)"
        )
        write_image(out_path, img)
        state = ProgressiveState(img=img, epoch=state.epoch + 1, seed=state.seed)
        if checkpoint_path:
            save_checkpoint(checkpoint_path, state)
        if on_epoch:
            on_epoch(state.epoch, stats)
    return state
