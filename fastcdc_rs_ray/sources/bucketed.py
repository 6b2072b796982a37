"""Bucketed (co-partitioned) storage join — the layout that deletes the
shuffle.

Hive bucketing / Iceberg bucket-transform: both join sides are staged
ONCE into B bucket files by the same deterministic hash of the join key
(splitmix64 of o_orderkey / l_orderkey mod B).  At query time the join
runs bucket-by-bucket with ZERO exchange: one Ray task per bucket opens
its two co-partitioned files (the custom-source idiom — a bucket index
Dataset drives `map_batches`, pyarrow reads inside the task), joins
locally with a vectorized dense/searchsorted lookup, and emits a
grid-sized partial.  At 100 TB the staging cost is paid once per layout
generation and every keyed query after that is shuffle-free — the
counterpart of zonemap_scan's footer pruning on the time axis.

Output: (o_orderstatus, n_lines, revenue_c) — exact cents; the SQL
oracle is the plain join + rollup on the unsharded tables.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..util import mix64
from .staging import staged

N_BUCKETS = 8


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (mix64(keys.astype(np.uint64)) % np.uint64(n_buckets)).astype(
        np.int64)


def ensure_bucketed(sf_dir: str, out_dir: str, n_buckets: int = N_BUCKETS,
                    fingerprint: str = "static"):
    """Stage orders and lineitem into co-partitioned bucket files
    (once, crash-safe — staging.staged).  Distributed writers would
    hash-shuffle each table by the key and write one file per bucket —
    the layout CONTRACT (same hash, same B, one file per bucket per
    table) is what the join relies on."""
    def dump(tmp: str) -> None:
        for name, key, cols in (
            ("orders", "o_orderkey", ["o_orderkey", "o_orderstatus"]),
            ("lineitem", "l_orderkey", ["l_orderkey", "l_extendedprice"]),
        ):
            t = pq.read_table(f"{sf_dir}/{name}.parquet", columns=cols)
            k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            b = _bucket_of(k, n_buckets)
            for i in range(n_buckets):
                idx = np.flatnonzero(b == i)
                pq.write_table(
                    t.take(pa.array(idx, pa.int64())),
                    os.path.join(tmp, f"{name}_{i:03d}.parquet"))

    staged(out_dir, dump, fingerprint)


def bucketed_join_rollup(sf_dir: str, out_dir: str,
                         n_buckets: int = N_BUCKETS,
                         fingerprint: str = "static"):
    import ray.data as rd

    ensure_bucketed(sf_dir, out_dir, n_buckets, fingerprint)
    buckets = rd.from_items(list(range(n_buckets)),
                            override_num_blocks=n_buckets)

    def join_bucket(t: pa.Table, _dir=out_dir) -> pa.Table:
        out = {"o_orderstatus": [], "n_lines": [], "revenue_c": []}
        for i in t["item"].to_pylist():
            o = pq.read_table(os.path.join(_dir, f"orders_{i:03d}.parquet"))
            li = pq.read_table(
                os.path.join(_dir, f"lineitem_{i:03d}.parquet"))
            ok = o["o_orderkey"].to_numpy(zero_copy_only=False)
            st = o["o_orderstatus"].to_numpy(zero_copy_only=False)
            lk = li["l_orderkey"].to_numpy(zero_copy_only=False)
            price_c = np.round(li["l_extendedprice"].to_numpy(
                zero_copy_only=False) * 100).astype(np.int64)
            order = np.argsort(ok, kind="stable")
            ok_s, st_s = ok[order], st[order]
            pos = np.searchsorted(ok_s, lk)
            # co-partitioning contract: every lineitem's order is in this
            # bucket; RAISE on violation rather than dropping rows
            if len(lk) and (
                    len(ok_s) == 0 or (pos >= len(ok_s)).any() or
                    (ok_s[np.minimum(pos, len(ok_s) - 1)] != lk).any()):
                raise ValueError(
                    f"bucket {i}: lineitem order key missing from the "
                    f"co-partitioned orders bucket — layout contract broken")
            stat = st_s[pos]
            uniq, inv = np.unique(stat, return_inverse=True)
            n = np.bincount(inv).astype(np.int64)
            # int64 accumulation (np.add.at), NOT bincount float weights:
            # a bucket partial over 2^53 cents would silently lose cents
            # in the float64 accumulator at 100 TB scale
            s = np.zeros(len(uniq), np.int64)
            np.add.at(s, inv, price_c)
            out["o_orderstatus"].extend(uniq.tolist())
            out["n_lines"].extend(n.tolist())
            out["revenue_c"].extend(s.tolist())
        return pa.table({
            "o_orderstatus": pa.array(out["o_orderstatus"], pa.string()),
            "n_lines": pa.array(out["n_lines"], pa.int64()),
            "revenue_c": pa.array(out["revenue_c"], pa.int64()),
        })

    parts = buckets.map_batches(join_bucket, batch_format="pyarrow")
    acc: dict[str, list[int]] = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for st, n, s in zip(b["o_orderstatus"].to_pylist(),
                            b["n_lines"].to_pylist(),
                            b["revenue_c"].to_pylist()):
            a = acc.setdefault(st, [0, 0])
            a[0] += n
            a[1] += s
    ks = sorted(acc)
    return pa.table({
        "o_orderstatus": pa.array(ks, pa.string()),
        "n_lines": pa.array([acc[k][0] for k in ks], pa.int64()),
        "revenue_c": pa.array([acc[k][1] for k in ks], pa.int64()),
    })


BUCKETED_JOIN_SQL = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_c
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
"""
