"""Units for round-5 harness machinery: the bench regression gate and the
auto compaction-group selection."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_prior_round_deltas_flags_direction_aware(tmp_path, monkeypatch):
    """Seconds metrics flag when they grow, rate metrics when they shrink;
    <=10% drifts pass silently (VERDICT r4 item 8)."""
    m = _bench()
    prev = {"parsed": {"mesh51k_mc_epoch_seconds": 1.0, "value": 100.0,
                       "roofline_frac": 0.10, "whitted_mc_step_mrays_per_sec": 90.0}}
    f = tmp_path / "BENCH_r99.json"
    f.write_text(json.dumps(prev))
    monkeypatch.setattr(m.os.path, "dirname", lambda p: str(tmp_path))
    out = m._prior_round_deltas({
        "mesh51k_mc_epoch_seconds": 1.2,   # 20% slower -> flag
        "value": 120.0,                     # faster -> no flag
        "roofline_frac": 0.085,             # 15% lower -> flag
        "whitted_mc_step_mrays_per_sec": 89.0,  # 1% lower -> no flag
    })
    assert out["prev_round_file"] == "BENCH_r99.json"
    assert set(out["regressions"]) == {"mesh51k_mc_epoch_seconds",
                                       "roofline_frac"}
    assert out["regressions"]["mesh51k_mc_epoch_seconds"]["worse_pct"] == 20.0


def test_prior_round_deltas_absent_file(tmp_path, monkeypatch):
    m = _bench()
    monkeypatch.setattr(m.os.path, "dirname", lambda p: str(tmp_path))
    assert m._prior_round_deltas({"value": 1.0}) == {}


def test_auto_compact_group_by_tile_size():
    """32-wide groups overflow sparse small frames (measured: 260 dropped
    at 64x48 before the auto split); full bench tiles take 32."""
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.ops.trace import _group

    cfg = RenderConfig()
    assert _group(cfg, 64 * 48) == 8
    assert _group(cfg, 1 << 16) == 32
    assert _group(RenderConfig(compact_group=16), 64 * 48) == 16
