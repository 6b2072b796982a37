"""Bloom-prefiltered broadcast semi-join: lineitem rows whose part passes
a dimension predicate, rolled up per returnflag.

The scale path for semi-joins whose build side outgrows an exact broadcast
set: ship a Bloom filter (few MB regardless of key count) to every probe
task, drop the certain-misses there, and verify only the survivors —
here against the exact sorted key array (also broadcast, since the build
side is small at test scale); at 100 TB the residual check becomes a keyed
exchange of the ~FPR-sized survivor stream instead.  Result is exact
either way — the bloom only prunes, never decides.

No reference counterpart (fastcdc-rs has no joins — SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bloom import BloomFilter

_OUT = pa.schema([
    ("l_returnflag", pa.string()), ("n_items", pa.int64()),
    ("sum_qty", pa.int64()),
])


def bloom_semi_stats(lineitem_ds, part_ds, min_size: int = 48,
                     log2_bits: int = 16):
    """-> (l_returnflag, n_items, sum_qty) over lineitems of parts with
    p_size >= min_size."""
    import ray

    keys_t = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in part_ds.filter(expr=f"p_size >= {min_size}")
        .select_columns(["p_partkey"]).iter_batches(batch_format="pyarrow")
    )
    keys = np.sort(
        keys_t["p_partkey"].combine_chunks().to_numpy(zero_copy_only=False))
    bloom = BloomFilter.build(keys, log2_bits=log2_bits, k=4)
    bref = ray.put(bloom)
    kref = ray.put(keys)

    def partial(t: pa.Table) -> pa.Table:
        bf: BloomFilter = ray.get(bref)
        pk = t["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        cand = bf.contains(pk)                      # certain-miss pruning
        if not cand.any():
            return _OUT.empty_table()
        exact = ray.get(kref)
        idx = np.flatnonzero(cand)
        pos = np.searchsorted(exact, pk[idx])
        pos_c = np.minimum(pos, len(exact) - 1)
        hit = exact[pos_c] == pk[idx]               # kill false positives
        sel = idx[hit]
        if len(sel) == 0:
            return _OUT.empty_table()
        sub = t.take(pa.array(sel, pa.int64()))
        rf = sub["l_returnflag"].combine_chunks().dictionary_encode()
        codes = rf.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        qty = sub["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        nk = len(rf.dictionary)
        return pa.table({
            "l_returnflag": rf.dictionary,
            "n_items": pa.array(
                np.bincount(codes, minlength=nk).astype(np.int64), pa.int64()),
            "sum_qty": pa.array(
                np.bincount(codes, weights=qty, minlength=nk).astype(np.int64),
                pa.int64()),
        }).cast(_OUT)

    parts = lineitem_ds.map_batches(partial, batch_format="pyarrow")
    t = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in parts.iter_batches(batch_format="pyarrow")]
        + [_OUT.empty_table()]
    )
    if len(t) == 0:
        return _OUT.empty_table()
    rf = t["l_returnflag"].combine_chunks().dictionary_encode()
    codes = rf.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nk = len(rf.dictionary)
    n = np.zeros(nk, np.int64)
    s = np.zeros(nk, np.int64)
    np.add.at(n, codes, t["n_items"].to_numpy(zero_copy_only=False))
    np.add.at(s, codes, t["sum_qty"].to_numpy(zero_copy_only=False))
    return pa.table({
        "l_returnflag": rf.dictionary,
        "n_items": pa.array(n, pa.int64()),
        "sum_qty": pa.array(s, pa.int64()),
    }).cast(_OUT)


BLOOM_SEMI_STATS_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 48)
GROUP BY l_returnflag
"""
