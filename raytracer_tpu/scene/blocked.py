"""Blocked triangle layout: the TPU-native spatial index for large meshes.

The reference brute-forces every primitive per ray (src/main.rs:183-324);
this framework's dense [tris x ray-lanes] sweep keeps that semantics and is
optimal up to a few hundred triangles.  Past that, a pointer-chasing BVH
(the GPU answer) is wrong for the TPU: per-lane stacks and gathers fight
the vector unit.  Instead large meshes use a *blocked* layout — the BVH's
depth-first leaf order (scene/bvh.py) chunked into contiguous groups of
`BLK_CHUNK` triangles with a precomputed AABB per chunk.  In-kernel
traversal is a `fori_loop` over chunks: one vectorized slab test of the
chunk AABB against all ray lanes, and a `lax.cond` that runs the dense
8-row-tiled triangle test only for chunks some lane's ray enters
(ops/kernel_common.py `blocked_*`).  Coherent ray tiles skip the vast
majority of chunks; fully incoherent tiles degrade to the dense sweep plus
a ~9% gate overhead — never asymptotically worse.

Host side (this file): derive the chunk permutation + AABB tables from the
already-built BVH.  The blocked tables are shipped with the scene pytree
and consumed by the fused Pallas kernels, which keep the whole permuted
triangle table VMEM-resident (practical up to ~16k triangles; larger
scenes fall back to the XLA gather traversal in ops/intersect_bvh.py).
"""

from __future__ import annotations

import numpy as np

# Triangles per gated chunk.  128 rows = 16 sublane tiles per test; the
# box-gate saves ~16x on chunks no ray enters (measured: a miss costs one
# [1,R] slab test + any(); a full-hit sweep pays ~9% over ungated).
BLK_CHUNK = 128
# Chunks per supergroup: the kernels gate 8 chunks (1024 tris) with one
# outer slab test before testing the chunks individually.
SUP_CHUNKS = 8

# NOTE: there is no triangle-count ceiling on the blocked layout.  Up to
# kernel_common.STREAM_BLK_TRIS (=16384) the permuted [T_pad, 48] table is
# VMEM-resident (lane-padded ~0.5 KB/triangle, ~8.4 MB at the threshold);
# larger tables stay in HBM and the fused kernels DMA one chunk at a time
# into a VMEM scratch (kernel_common.ChunkTable), gated by the same
# chunk/supergroup AABB tests.


def build_blocked(tri_v: np.ndarray, prim_order: np.ndarray):
    """Blocked tables from triangle vertices + BVH DFS leaf order.

    Returns (perm [T_pad] i32, boxes [NCH, 8] f32):
      perm[i]  = original triangle id of blocked row i (-1 = padding)
      boxes[c] = chunk AABB: min xyz (0:3), max xyz (3:6), pad (6:8)
    T_pad = NCH * BLK_CHUNK.  Padding rows are degenerate (the packer
    emits all-zero rows whose plane test yields NaN -> filtered).
    """
    prim_order = np.asarray(prim_order, np.int32)
    t = prim_order.shape[0]
    # chunk count padded to a multiple of SUP_CHUNKS so the kernels'
    # supergroup tier (8 chunks per gated outer iteration) needs no edge
    # masking; pad chunks carry inverted boxes that never pass the slab
    nch = -(-max(1, -(-t // BLK_CHUNK)) // SUP_CHUNKS) * SUP_CHUNKS
    t_pad = nch * BLK_CHUNK
    perm = np.full(t_pad, -1, np.int32)
    perm[:t] = prim_order

    lo_all = np.asarray(tri_v, np.float64).min(axis=1)  # [T, 3]
    hi_all = np.asarray(tri_v, np.float64).max(axis=1)
    boxes = np.zeros((nch, 8), np.float32)
    big = np.float32(3.0e38)
    for c in range(nch):
        ids = prim_order[c * BLK_CHUNK : (c + 1) * BLK_CHUNK]
        if ids.size == 0:  # empty scene: inverted box never passes the slab
            boxes[c, 0:3] = big
            boxes[c, 3:6] = -big
            continue
        # Round outward when narrowing f64 bounds to f32: round-to-nearest
        # could pull a bound inward past a razor-edge triangle extent, and
        # the kernels' f32 slab test would then skip a chunk containing a
        # legitimate hit that the dense sweep finds.
        lo32 = lo_all[ids].min(axis=0).astype(np.float32)
        hi32 = hi_all[ids].max(axis=0).astype(np.float32)
        boxes[c, 0:3] = np.nextafter(lo32, np.float32(-np.inf), dtype=np.float32)
        boxes[c, 3:6] = np.nextafter(hi32, np.float32(np.inf), dtype=np.float32)
    return perm, boxes


def validate_blocked(perm: np.ndarray, boxes: np.ndarray,
                     tri_v: np.ndarray) -> None:
    """Invariants (used by tests): permutation coverage + containment."""
    t = tri_v.shape[0]
    live = perm[perm >= 0]
    assert np.array_equal(np.sort(live), np.arange(t)), "perm covers all tris"
    assert perm.shape[0] % BLK_CHUNK == 0
    assert boxes.shape == (perm.shape[0] // BLK_CHUNK, 8)
    # Exact f32 containment: build_blocked rounds boxes outward, so the
    # f32 triangle bounds must sit inside the box with NO tolerance.
    lo = tri_v.astype(np.float32).min(axis=1)
    hi = tri_v.astype(np.float32).max(axis=1)
    for c in range(boxes.shape[0]):
        ids = perm[c * BLK_CHUNK : (c + 1) * BLK_CHUNK]
        ids = ids[ids >= 0]
        if ids.size:
            assert (lo[ids] >= boxes[c, 0:3]).all()
            assert (hi[ids] <= boxes[c, 3:6]).all()
