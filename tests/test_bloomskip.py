"""Bloom file skipping: sidecar planning skips shards, result lossless
vs brute force (sources/bloomskip.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.sources.bloomskip import (
    bloom_skip_scan,
    ensure_bloom_shards,
    plan_shards,
    probe_ids_from,
)


def _events(n: int = 8000, seed: int = 5) -> pa.Table:
    rng = np.random.default_rng(seed)
    ts = rng.integers(1_600_000_000_000_000, 1_600_086_400_000_000, n)
    return pa.table({
        "event_id": pa.array(rng.permutation(n).astype(np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
    })


def test_bloom_pruning_real_and_lossless(ray_session, tmp_path):
    import ray.data as rd

    t = _events()
    out = str(tmp_path / "shards")
    ensure_bloom_shards(rd.from_arrow(t), out)
    mod = 2099  # ~4 probe ids over 8000 -> most shards skippable
    probes = probe_ids_from(out, mod)
    files, total = plan_shards(out, probes)
    assert total == 16
    assert 0 < len(files) < total, (len(files), total)

    got = bloom_skip_scan(rd.from_arrow(t), out, mod=mod).to_pandas()
    ids = t["event_id"].to_numpy()
    m = ids % mod == 0
    val = np.round(np.asarray(t["value"].to_pylist())[m] * 100).astype(
        np.int64)
    assert int(got.n.iloc[0]) == int(m.sum())
    assert int(got.sum_value_c.iloc[0]) == int(val.sum())
