"""concurrent_events: bucket-replication interval join vs a brute-force
reference — boundary-exact (|dt| == delta kept), bucket-crossing pairs,
same-user exclusion, no duplicates under any partitioning."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.intervaljoin import concurrent_events

US = 1_000_000
DELTA = 60 * US


def test_interval_join_exact(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(37)
    n = 800
    base = np.datetime64("2024-06-01T00:00:00", "us").astype(np.int64)
    ts = base + np.sort(rng.integers(0, 3600 * US * 4, n))
    # plant exact-boundary pairs (dt == DELTA) and a bucket-boundary pair
    ts[10] = base + 10 * DELTA
    ts[11] = ts[10] + DELTA          # exactly delta apart -> KEPT
    ts[20] = base + 30 * DELTA - US  # one second before a bucket edge
    ts[21] = base + 30 * DELTA + US  # one second after  -> crossing pair
    uid = rng.integers(0, 12, n).astype(np.int64)
    uid[10], uid[11] = 1, 2
    uid[20], uid[21] = 3, 4
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({
        "event_id": pa.array(ids),
        "user_id": pa.array(uid),
        "ts": pa.array(ts.view("datetime64[us]")),
    })
    path = str(tmp_path / "ev.parquet")
    pq.write_table(t, path)

    out = concurrent_events(
        rd.read_parquet(path).repartition(7), delta_us=DELTA,
        num_partitions=4,
    ).to_pandas()
    got = sorted(map(tuple, out[["src", "dst"]].to_numpy()))
    assert len(got) == len(set(got))  # no duplicate pairs

    dt = np.abs(ts[:, None] - ts[None, :])
    ii, jj = np.nonzero(np.triu((dt <= DELTA) & (uid[:, None] != uid[None, :]), 1))
    ref = sorted(zip(ii.tolist(), jj.tolist()))
    assert got == ref
    assert (10, 11) in set(got) and (20, 21) in set(got)
