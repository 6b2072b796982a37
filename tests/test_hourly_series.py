"""Gap-filled dense (event_type, hour) series: hand-computed grid with
an empty middle hour; the DuckDB gate covers sf-scale."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.sessions import HOUR_US, hourly_type_series


def _ts(dates):
    return pa.array(np.array(dates, dtype="datetime64[us]"))


def test_hourly_series_zero_fills_gaps(ray_session):
    import ray.data as rd

    # span 10:00-13:00 (4 hours); type a misses 11:00+12:00, type b
    # misses 10:00+12:00+13:00 — all must appear with n_events=0
    events = pa.table({
        "event_type": pa.array(["a", "a", "b", "a"]),
        "ts": _ts(["2024-01-01T10:05", "2024-01-01T10:50",
                   "2024-01-01T11:10", "2024-01-01T13:59"]),
    })
    out = hourly_type_series(
        rd.from_arrow(events).repartition(2)).to_pandas()
    assert len(out) == 8  # 2 types x 4 hours
    base = np.datetime64("2024-01-01T10:00", "us").astype(np.int64)
    grid = {(r.event_type, int((r.hour_us - base) // HOUR_US)): r.n_events
            for r in out.itertuples()}
    assert grid == {
        ("a", 0): 2, ("a", 1): 0, ("a", 2): 0, ("a", 3): 1,
        ("b", 0): 0, ("b", 1): 1, ("b", 2): 0, ("b", 3): 0,
    }


def test_hourly_series_partition_invariant(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 500
    ts = (np.datetime64("2024-03-01", "us").astype(np.int64)
          + rng.integers(0, 72 * HOUR_US, n))
    events = pa.table({
        "event_type": pa.array(rng.choice(["x", "y", "z"], n).tolist()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    a = hourly_type_series(rd.from_arrow(events).repartition(2)).to_pandas()
    b = hourly_type_series(rd.from_arrow(events).repartition(9)).to_pandas()
    assert a.equals(b)
    assert (a.groupby("event_type")["n_events"].sum().sum()) == n


def test_hourly_anomalies_planted_spike(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fastcdc_rs_ray.stages.sessions import HOUR_US, hourly_anomalies

    rng = np.random.default_rng(5)
    # 200 quiet hours at ~10 events, one hour at 200 events
    ts_l, ty_l = [], []
    base = (1_700_000_000 * 1_000_000 // HOUR_US) * HOUR_US  # hour-aligned
    for h in range(200):
        for _ in range(int(rng.integers(8, 13))):
            ts_l.append(base + h * HOUR_US + int(rng.integers(0, HOUR_US)))
            ty_l.append("click")
    spike_h = 77
    for _ in range(200):
        ts_l.append(base + spike_h * HOUR_US + int(rng.integers(0, HOUR_US)))
        ty_l.append("click")
    t = pa.table({"event_type": pa.array(ty_l, pa.string()),
                  "ts": pa.array(np.array(ts_l, np.int64),
                                 pa.timestamp("us"))})
    out = hourly_anomalies(rd.from_arrow(t).repartition(4))
    rows = out.to_pylist()
    assert any(r["hour_us"] == base + spike_h * HOUR_US for r in rows)
    # the quiet hours stay unflagged (spike inflates std; z=3 keeps them out)
    assert all(r["n_events"] >= 100 for r in rows)
    # determinism across block counts
    out2 = hourly_anomalies(rd.from_arrow(t).repartition(1))
    assert sorted(map(tuple, (r.values() for r in out2.to_pylist()))) == \
           sorted(map(tuple, (r.values() for r in rows)))
