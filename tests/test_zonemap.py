"""Zone-map pruning: the planned file list is strictly smaller than the
staged shard set AND the pruned scan equals the full-scan filter
(sources/zonemap.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.sources.zonemap import (
    ensure_sorted_shards,
    plan_files,
    window_bounds_us,
    zonemap_scan,
)


def _events(n: int = 5000, seed: int = 4) -> pa.Table:
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(1_600_000_000_000_000,
                              1_600_086_400_000_000, n))
    rng.shuffle(ts)  # arrival order unsorted — staging must sort
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "event_type": pa.array(
            np.array(["a", "b", "c"])[rng.integers(0, 3, n)].tolist()),
        "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
        "props": pa.array(["{}"] * n),
    })


def test_pruning_is_real_and_lossless(ray_session, tmp_path):
    import ray.data as rd

    t = _events()
    out_dir = str(tmp_path / "shards")
    ds = rd.from_arrow(t)
    ensure_sorted_shards(ds, out_dir)
    lo, hi = window_bounds_us(out_dir)
    files, total = plan_files(out_dir, lo, hi)
    assert total == 16
    assert 0 < len(files) < total  # pruning actually skipped shards

    got = zonemap_scan(rd.from_arrow(t), out_dir).to_pandas()

    # brute force on the raw table
    ts = t["ts"].cast(pa.int64()).to_numpy()
    m = (ts >= lo) & (ts <= hi)
    et = np.asarray(t["event_type"].to_pylist())[m]
    val = np.round(np.asarray(t["value"].to_pylist())[m] * 100).astype(
        np.int64)
    for k in ("a", "b", "c"):
        row = got[got.event_type == k]
        sel = et == k
        assert int(row.n.iloc[0]) == int(sel.sum())
        assert int(row.sum_value_c.iloc[0]) == int(val[sel].sum())
