"""The bench artifact contract: the ONE emitted JSON line must stay under
the driver's ~2000-char tail capture (round 3 emitted a 4KB+ line with the
full pairs[] array and the driver recorded ``parsed: null`` despite rc 0).
Full detail goes to BENCH/last_run_detail.json instead."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def _r3_shaped_result() -> dict:
    return {
        "metric": "headline-suite seconds (queries + CDC replay) at sf; "
        "replay.events_per_sec is the north-star throughput",
        "value": 40.123,
        "unit": "sec",
        "sf": 0.1,
        "scratch": "/dev/shm/x",
        "budget_sec": 1200,
        "queries": {f"q{i}_some_long_query_name": 1.2345 for i in range(14)},
        "replay": {
            "sec": 25.1,
            "events": 2_000_000,
            "chunk": 500_000,
            "mode": "mor",
            "dedup": "prefilter",
            "events_per_sec": 79681.3,
            "attempts": 1,
            "steal_frac": 0.0004,
            "samples": [{"big": "x" * 100}] * 5,
        },
        "scaling": {
            "cores_lo": 1,
            "cores_hi": 4,
            "events": 1_000_000,
            "mode": "mor",
            "dedup": "max_by",
            "events_per_sec_lo": 15827.5,
            "events_per_sec_hi": 47709.3,
            "scaling_efficiency": 0.743,
            "efficiency_best": 0.743,
            "headline_events": 1_000_000,
            "headline_pairs": 3,
            "evidence_tier": "clean",
            "clean_pairs": 4,
            "budget_stop": False,
            "ambient": {"dram_mbps": 8798.4, "fault_mbps": 2285.5, "disk_mbps": 155.5},
            "pairs": [{"round": i, "t1_sec": 60.0, "filler": "x" * 300} for i in range(6)],
        },
        "disk_mbps": 155.5,
        "elapsed_sec": 587.0,
    }


def test_emitted_line_fits_driver_tail():
    line = json.dumps(bench._compact_result(_r3_shaped_result()))
    assert len(line) < 1500, f"{len(line)} chars: {line[:200]}"
    d = json.loads(line)
    # the driver-graded numbers survive compaction
    assert d["value"] == 40.123
    assert d["replay"]["events_per_sec"] == 79681.3
    sc = d["scaling"]
    assert sc["scaling_efficiency"] == 0.743
    assert sc["clean_pairs"] == 4 and sc["evidence_tier"] == "clean"
    assert sc["headline_events"] == 1_000_000
    # the bulk detail does not
    assert "pairs" not in sc and "ambient" not in sc
    assert "samples" not in d["replay"]


def test_compaction_never_empties_headline_keys():
    """Even a pathological result (hundreds of queries) keeps the headline
    keys and stays under the cap by dropping per-query detail."""
    res = _r3_shaped_result()
    res["queries"] = {f"very_long_query_name_number_{i:04d}": 1.23456 for i in range(200)}
    line = json.dumps(bench._compact_result(res))
    assert len(line) < 1500
    d = json.loads(line)
    assert d["replay"]["events_per_sec"] == 79681.3
    assert d["scaling"]["scaling_efficiency"] == 0.743
