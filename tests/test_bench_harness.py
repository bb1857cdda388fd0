"""bench.py instrument invariants (VERDICT r11 #2/#4): the compact
stdout line must be provably bounded at any registry size, and the
drift-adjudication flag threshold must be scale-invariant."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _enc_len(d: dict) -> int:
    return len(json.dumps(d, separators=(",", ":")))


def _record(n_queries: int) -> dict:
    return {
        "metric": "headline_suite_wall_seconds",
        "value": 123.456,
        "unit": "sec",
        "queries": {
            f"some_query_name_{i:04d}": 0.5 + (i % 37) * 0.173
            for i in range(n_queries)
        },
        "sf": 0.1,
        "cdc_events_per_sec": 123456,
        "cdc_apply_events_per_sec": 45678,
        "detail_file": "BENCH_DETAIL_latest.json",
    }


def test_compact_line_fits_at_current_registry_size():
    """Today's headline (the REAL entry names) must fit WITHOUT
    shedding."""
    rec = _record(0)
    rec["queries"] = {
        name: 0.5 + (i % 37) * 0.173 for i, name in enumerate(bench.HEADLINE)
    }
    compact, dp = bench.bounded_compact_line(rec)
    assert _enc_len(compact) <= 1900
    assert dp in (2, 1)
    assert "queries_omitted" not in compact
    assert len(compact["queries"]) == len(rec["queries"])


def test_compact_line_bounded_at_any_registry_size(capsys):
    """VERDICT r11 #4: even an absurd registry (500 / 5000 entries)
    yields a line under the driver's stdout budget — the warning fires
    and the SMALLEST rows shed first, so the big movers survive."""
    for n in (200, 500, 5000):
        rec = _record(n)
        compact, dp = bench.bounded_compact_line(rec)
        assert _enc_len(compact) <= 1900, f"{n} entries: {_enc_len(compact)}"
        assert compact["queries_omitted"] == n - len(compact["queries"]) > 0
        assert dp == "1dp-top-movers"
        # suite-level keys survive intact
        assert compact["value"] == rec["value"]
        assert compact["detail_file"] == rec["detail_file"]
        # shedding keeps the largest walls: every kept value >= every
        # shed value
        kept = set(compact["queries"])
        shed_max = max(
            (v for k, v in rec["queries"].items() if k not in kept),
            default=float("-inf"),
        )
        assert all(v >= shed_max - 0.051 for v in compact["queries"].values())
    assert "WARNING" in capsys.readouterr().err


def test_drift_band_is_scale_invariant():
    """VERDICT r11 #2: the flag threshold must not multiply the whole
    prior value by the canary spread — a 74% regression on a 1.4s
    query (r11's timeseries_gap_fill) must flag even when the suite
    ran on a loaded host (spread ~1.11)."""
    # the band formula, as _auto_adjudicate computes it
    band = max(0.5, 1.4 * 0.4)
    assert 3.1 - 1.4 > band  # r11's escaped regression now flags
    # and small-prev queries keep the 0.5s absolute floor
    assert max(0.5, 0.2 * 0.4) == 0.5


def test_quiet_rebaseline_anchors_drift_band(tmp_path):
    """VERDICT r12 what's-wrong #1: when the newest round shipped a
    loaded driver artifact AND a quiet re-baseline, the next round's
    prev_q must take the per-query MIN across them — a loaded
    same-round artifact can never inflate the band a regression must
    exceed."""
    loaded = {
        "sf": 0.1,
        "queries_best": {"bm25_index_add": 7.5, "bm25_remove_serve": 5.8},
    }
    quiet = {
        "sf": 0.1,
        "queries_best": {"bm25_index_add": 5.0, "bm25_remove_serve": 3.6},
    }
    (tmp_path / "BENCH_r42.json").write_text(json.dumps(loaded))
    (tmp_path / "BENCH_QUIET_r42.json").write_text(json.dumps(quiet))
    # an older round must NOT contribute (only the newest round anchors)
    (tmp_path / "BENCH_r41.json").write_text(
        json.dumps({"sf": 0.1, "queries_best": {"bm25_index_add": 1.0}})
    )
    cur = {"bm25_index_add": 7.2, "bm25_remove_serve": 5.0}
    prev_name, delta, prev_q = bench._delta_vs_previous_round(
        cur, "0.1", root=tmp_path
    )
    assert "BENCH_r42.json" in prev_name
    assert "BENCH_QUIET_r42.json" in prev_name
    assert "r41" not in prev_name
    assert prev_q == {"bm25_index_add": 5.0, "bm25_remove_serve": 3.6}
    assert delta["bm25_index_add"] == 2.2
    # the band anchors on the QUIET best, so the 7.2s run is a flagged
    # drift (7.2 - 5.0 > max(0.5, 5.0*0.4)) — against the loaded 7.5
    # it would have read as an improvement
    assert 7.2 - prev_q["bm25_index_add"] > max(
        0.5, prev_q["bm25_index_add"] * 0.4
    ) > 7.2 - 7.5


def test_prev_bench_series_separates_sf1_and_quiet(tmp_path):
    """sf1 runs anchor on the BENCH_SF1_*/BENCH_QUIET_SF1_* series
    only, and vice versa — cross-sf deltas stay impossible (VERDICT
    r9 #2) with the quiet artifacts included."""
    for name in (
        "BENCH_r42.json",
        "BENCH_QUIET_r42.json",
        "BENCH_SF1_r42.json",
        "BENCH_QUIET_SF1_r42.json",
    ):
        (tmp_path / name).write_text(
            json.dumps({"sf": 1.0, "queries_best": {"q": 1.0}})
        )
    small = [p.rsplit("/", 1)[-1] for p in bench._prev_bench_paths("0.1", root=tmp_path)]
    big = [p.rsplit("/", 1)[-1] for p in bench._prev_bench_paths("1", root=tmp_path)]
    assert small == ["BENCH_QUIET_r42.json", "BENCH_r42.json"]
    assert big == ["BENCH_QUIET_SF1_r42.json", "BENCH_SF1_r42.json"]
