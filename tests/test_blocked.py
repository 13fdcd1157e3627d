"""Blocked large-mesh layout: host tables + chunk-gated fused kernels.

The blocked path must match the dense brute-force semantics (the exact
World::cast scan, src/main.rs:180-326) on the SAME geometry.  The dense
oracle is obtained by stripping the BVH/blocked fields from the built
scene, which routes every consumer to the [T x R] sweep / jnp reference
path.  Kernel-vs-jnp comparisons use the same near-total-lane-agreement
criterion as tests/test_level_pallas.py (f32 op-ordering may flip
razor-edge winners on isolated lanes).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.ops import intersect
from raytracer_tpu.ops.camera import shoot, shoot_focus
from raytracer_tpu.ops.distributed import trace_distributed
from raytracer_tpu.ops.trace import trace_whitted
from raytracer_tpu.render import clip_coords
from raytracer_tpu.scene.blocked import BLK_CHUNK, validate_blocked
from raytracer_tpu.scene.presets import mesh_scene


@pytest.fixture(scope="module")
def mesh():
    scene, textures, cam = mesh_scene(grid=24)
    return scene, textures, cam


def _strip(scene):
    """Dense brute-force oracle view of the same geometry."""
    return dataclasses.replace(
        scene, bvh_node_min=None, bvh_node_max=None, bvh_node_right=None,
        bvh_node_count=None, bvh_prim_order=None, bvh_depth=0,
        blk_perm=None, blk_box=None,
    )


def _mode(mode, fn, *args):
    intersect.set_pallas_mode(mode)
    try:
        return fn(*args)
    finally:
        intersect.set_pallas_mode("auto")


def test_blocked_tables(mesh):
    scene, _, _ = mesh
    assert scene.blk_perm is not None and scene.blk_box is not None
    perm = np.asarray(scene.blk_perm)
    boxes = np.asarray(scene.blk_box)
    assert perm.shape[0] % BLK_CHUNK == 0
    validate_blocked(perm, boxes, np.asarray(scene.tri_v))


@pytest.mark.heavy  # exhaustive interpret-mode parity; quick tier keeps a small-shape guard
def test_blocked_streams_above_vmem_limit():
    """Scenes past STREAM_BLK_TRIS (16,384) still get blocked tables; the
    fused kernels keep the table in HBM and DMA chunks into a VMEM scratch
    (kernel_common.ChunkTable).  Parity vs the XLA-BVH fallback on the
    same scene pins the streamed traversal (VERDICT r2 item 4: the
    16k-triangle ceiling is retired)."""
    from raytracer_tpu.ops.kernel_common import STREAM_BLK_TRIS
    from raytracer_tpu.scene.presets import mesh_scene as ms

    # grid=96 -> 18,444 tris > 16,384
    scene, textures, cam = ms(grid=96)
    assert scene.n_tri > STREAM_BLK_TRIS
    assert scene.blk_perm is not None and scene.bvh_node_min is not None

    clips = jnp.asarray(clip_coords(16, 12))
    o, d = shoot(cam, clips)
    cfg = RenderConfig(width=16, height=12, depth=2)
    ref = _mode("0", trace_whitted, scene, textures, o, d, cfg)  # XLA BVH
    got = _mode("interpret", trace_whitted, scene, textures, o, d, cfg)
    frac = _close_fraction(np.asarray(got.color), np.asarray(ref.color))
    assert frac >= 0.97, f"only {frac:.4f} of pixels agree"
    assert int(got.dropped) == 0


def _close_fraction(a, b):
    return np.all(np.abs(a - b) <= 1e-3 + 2e-2 * np.abs(b), axis=-1).mean()


@pytest.mark.heavy  # exhaustive interpret-mode parity; quick tier keeps a small-shape guard
def test_blocked_whitted_matches_dense_jnp(mesh):
    scene, textures, cam = mesh
    clips = jnp.asarray(clip_coords(32, 24))
    o, d = shoot(cam, clips)
    cfg = RenderConfig(width=32, height=24, depth=4)

    ref = _mode("0", trace_whitted, _strip(scene), textures, o, d, cfg)
    got = _mode("interpret", trace_whitted, scene, textures, o, d, cfg)

    a, b = np.asarray(got.color), np.asarray(ref.color)
    frac = _close_fraction(a, b)
    assert frac >= 0.97, f"only {frac:.4f} of pixels agree"
    np.testing.assert_allclose(a.mean(axis=0), b.mean(axis=0), rtol=0.08,
                               atol=8e-3)
    assert abs(int(got.casts) - int(ref.casts)) <= max(
        0.01 * int(ref.casts), 16
    ), (int(got.casts), int(ref.casts))
    assert int(got.dropped) == 0 and int(ref.dropped) == 0


@pytest.mark.heavy  # exhaustive interpret-mode parity; quick tier keeps a small-shape guard
def test_blocked_whitted_matches_xla_bvh(mesh):
    """The jnp fallback on the SAME blocked scene (XLA gather traversal)
    agrees with the blocked kernels — pins the two large-mesh paths to
    each other, not just both to the dense oracle."""
    scene, textures, cam = mesh
    clips = jnp.asarray(clip_coords(24, 18))
    o, d = shoot(cam, clips)
    cfg = RenderConfig(width=24, height=18, depth=3)

    ref = _mode("0", trace_whitted, scene, textures, o, d, cfg)
    got = _mode("interpret", trace_whitted, scene, textures, o, d, cfg)
    frac = _close_fraction(np.asarray(got.color), np.asarray(ref.color))
    assert frac >= 0.97, f"only {frac:.4f} of pixels agree"


@pytest.mark.heavy  # exhaustive interpret-mode parity; quick tier keeps a small-shape guard
def test_blocked_mc_matches_dense_jnp(mesh):
    scene, textures, cam = mesh
    clips = jnp.asarray(clip_coords(24, 24))
    key = jax.random.PRNGKey(5)
    offsets = jax.random.normal(key, (clips.shape[0], 2), jnp.float32) * 0.04
    o, d = shoot_focus(cam, clips, offsets, 3.0)
    cfg = RenderConfig(depth=5)

    ref = _mode("0", trace_distributed, _strip(scene), textures, o, d, key,
                cfg)
    got = _mode("interpret", trace_distributed, scene, textures, o, d, key,
                cfg)

    a, b = np.asarray(got.photon), np.asarray(ref.photon)
    frac = _close_fraction(a, b)
    assert frac >= 0.98, f"only {frac:.4f} of lanes agree"
    np.testing.assert_allclose(a.mean(axis=0), b.mean(axis=0), rtol=0.06,
                               atol=6e-3)
    assert abs(int(got.casts) - int(ref.casts)) <= max(
        0.015 * int(ref.casts), 16
    ), (int(got.casts), int(ref.casts))


def test_blocked_gate_prunes_casts_not_semantics(mesh):
    """Chunk gating must not change which primitives are hittable: random
    rays from inside the scene bounds, blocked cast (XLA path on blk
    scene uses the BVH; compare dense vs bvh jnp casts lane by lane)."""
    scene, _, _ = mesh
    rng = np.random.default_rng(3)
    n = 512
    o = jnp.asarray(rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    d = jnp.asarray(dirs)
    from raytracer_tpu.scene.types import Rays

    rays = Rays.primary(o, d)
    h_bvh = _mode("0", intersect.cast, scene, rays)
    h_dense = _mode("0", intersect.cast, _strip(scene), rays)
    np.testing.assert_array_equal(np.asarray(h_bvh.valid),
                                  np.asarray(h_dense.valid))
    agree = (np.asarray(h_bvh.prim) == np.asarray(h_dense.prim)).mean()
    assert agree >= 0.995, agree
