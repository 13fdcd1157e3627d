"""Profiling / observability utilities.

The reference's only observability is a stopwatch print per pass
(SURVEY.md §5.1, src/main.rs:1110-1111); this framework keeps those
counters (rays, ms, casts/s — parallel/progressive.py) and adds real
device tracing: `profile_trace()` wraps any render call in a
jax.profiler trace whose xplane can be summarized with `top_ops()`
(no TensorBoard needed — used by the perf work in this repo's history).
"""

from __future__ import annotations

import contextlib
import glob
import os
from typing import List, Optional, Tuple


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Context manager: device-trace everything inside to `log_dir`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def latest_xplane(log_dir: str) -> Optional[str]:
    files = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                             recursive=True))
    return files[-1] if files else None


def top_ops(xplane_path: str, limit: int = 20) -> List[Tuple[float, str, str]]:
    """[(self_time_ms, hlo_op, framework_op)] sorted descending.

    Requires the xprof package (present in this image); protobuf may need
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python.
    """
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import json

    from xprof.convert import raw_to_tool_data as rtd

    out, _ = rtd.xspace_to_tool_data([xplane_path], "hlo_stats", {})
    if isinstance(out, bytes):
        out = out.decode()
    data = json.loads(out)
    cols = [c["label"] for c in data["cols"]]
    j_self = cols.index("Total self time (us)")
    j_hlo = cols.index("HLO op name")
    j_fw = cols.index("Framework op name")

    def cell(r, j):
        v = r["c"][j]
        return v["v"] if v else None

    items = [
        (float(cell(r, j_self) or 0) / 1e3, str(cell(r, j_hlo)),
         str(cell(r, j_fw) or ""))
        for r in data["rows"]
    ]
    items.sort(reverse=True)
    return items[:limit]


def print_profile(log_dir: str, limit: int = 20) -> None:
    path = latest_xplane(log_dir)
    if path is None:
        print(f"no xplane trace found under {log_dir}")
        return
    print(f"top {limit} HLO ops by self time ({path}):")
    for ms, hlo, fw in top_ops(path, limit):
        print(f"  {ms:9.2f} ms  {hlo:28} {fw[:70]}")
