"""Bloom file skipping: per-shard Bloom indexes prune point lookups on
columns the layout is NOT sorted by.

The fourth layout-level technique: zone maps (zonemap_scan) skip shards
by RANGE on the sort column; a per-shard Bloom over a high-cardinality
column skips shards for POINT predicates on any other column.  Staging
writes ts-ordered shards plus one tiny sidecar per shard: the Bloom
words over that shard's event_id set (functions/bloom.py, the
Kirsch-Mitzenmacher double-hash kernel).  The query planner loads the
sidecars (KBs, never data), keeps only shards whose Bloom MIGHT contain
a probe id, and the residual in-task filter keeps the result exact under
false positives — pruning changes IO, never answers.

Output: one row (n, sum_value_c) over the probe set (event_id % 9973 ==
0); plain-filter SQL oracle.  pytest proves the pruning skips shards and
stays lossless vs the brute-force filter.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.bloom import BloomFilter
from .zonemap import _col_range_us, ensure_sorted_shards

N_SHARDS = 16
PROBE_MOD = 9973


def ensure_bloom_shards(events_ds, out_dir: str, n_shards: int = N_SHARDS,
                        fingerprint: str = "static"):
    """zonemap's ts-sorted staging + one Bloom sidecar per shard."""

    def write_bloom(i: int, sl: pa.Table, shard_dir: str) -> None:
        ids = sl["event_id"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
        bf = BloomFilter.build(ids, log2_bits=17, k=4)
        with open(os.path.join(shard_dir, f"{i:04d}.bloom"), "wb") as f:
            pickle.dump((bf.words, bf.log2_bits, bf.k), f)

    ensure_sorted_shards(events_ds, out_dir, n_shards, sidecar=write_bloom,
                         fingerprint=fingerprint)


def plan_shards(out_dir: str, probe_ids: np.ndarray) -> tuple[list[str],
                                                              int]:
    """Sidecar-only planning: shards whose Bloom might contain any probe."""
    names = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    keep = []
    for f in names:
        with open(os.path.join(out_dir, f[:-8] + ".bloom"), "rb") as fh:
            words, lb, k = pickle.load(fh)
        bf = BloomFilter(words, lb, k)
        if bf.contains(probe_ids.astype(np.uint64)).any():
            keep.append(os.path.join(out_dir, f))
    return keep, len(names)


def probe_ids_from(out_dir: str, mod: int = PROBE_MOD) -> np.ndarray:
    """The probe set: event ids divisible by PROBE_MOD, derived from the
    staged shards' id range (footer stats — no data read)."""
    names = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    lo, hi = None, None
    for f in names:
        md = pq.ParquetFile(os.path.join(out_dir, f)).metadata
        # event_id is NOT sorted within ts-sorted shards: aggregate the
        # range over every row group of every shard
        mn, mx = _col_range_us(md, "event_id")
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    first = ((lo + mod - 1) // mod) * mod
    return np.arange(first, hi + 1, mod, dtype=np.int64)


def bloom_skip_scan(events_ds, out_dir: str, mod: int = PROBE_MOD,
                    fingerprint: str = "static"):
    import ray.data as rd

    ensure_bloom_shards(events_ds, out_dir, fingerprint=fingerprint)
    probes = probe_ids_from(out_dir, mod)
    files, _total = plan_shards(out_dir, probes)
    if not files:  # nothing can match: exact zero row, no read at all
        return pa.table({"n": pa.array([0], pa.int64()),
                         "sum_value_c": pa.array([0], pa.int64())})

    ds = rd.read_parquet(files, columns=["event_id", "value"])

    def rollup(t: pa.Table) -> pa.Table:
        ids = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        m = ids % mod == 0  # exact residual — Bloom FPs never leak
        val = np.round(t["value"].combine_chunks().to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        return pa.table({
            "n": pa.array([int(m.sum())], pa.int64()),
            "sum_value_c": pa.array([int(val.sum())], pa.int64()),
        })

    n = s = 0
    for b in ds.map_batches(rollup, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for i in range(b.num_rows):
            n += b["n"][i].as_py()
            s += b["sum_value_c"][i].as_py()
    return pa.table({"n": pa.array([n], pa.int64()),
                     "sum_value_c": pa.array([s], pa.int64())})


BLOOM_SKIP_SCAN_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)), 0) AS BIGINT)
           AS sum_value_c
FROM events WHERE event_id % {PROBE_MOD} = 0
"""
