"""bench.py's LAST stdout line must parse alone inside the driver's
~2000-char stdout tail (VERDICT r1 item 5) — pinned so the budget can't
silently regress as the suite grows."""

import json

import bench


def _fake_suite(n_queries: int) -> dict:
    return {
        "metric": "suite",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"query_name_{i:03d}": i * 0.1234 for i in range(n_queries)},
        "sf": 0.1,
        "num_cpus": 32,
        "host_first_touch_200mb_s": 0.5,
    }


def test_compact_line_fits_driver_tail():
    for n in (10, 73, 200, 500):
        line = json.dumps(bench._compact(_fake_suite(n)))
        assert len(line) <= 1900, (n, len(line))
        parsed = json.loads(line)
        assert parsed["value"] == 123.456
        # trimming is explicit, never silent
        if n > len(parsed["queries"]):
            assert parsed["queries_omitted"] == n - len(parsed["queries"])


def test_compact_keeps_slowest_queries():
    out = bench._compact(_fake_suite(500))
    kept = out["queries"]
    # the slowest query always survives trimming
    assert "query_name_499" in kept
