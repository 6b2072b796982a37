"""Hierarchical (tree) aggregate: subtree sums over a category tree.

The org-chart / category-taxonomy rollup: every node's total includes
all of its descendants.  The tree is deterministic arithmetic on the
part key (parent = partkey // FANOUT — a complete FANOUT-ary taxonomy
over the part dimension), so the DuckDB oracle recomputes the same
rollup with a recursive ancestor CTE and the result is exact int64
cents.

Distributed shape: level-by-level upward accumulation — each of the
log_FANOUT(max key) rounds (~8 at 20 k parts) moves every node's pending
mass one level up, pre-reduced per block to at most one row per distinct
parent (rows shrink geometrically as mass concentrates).  The taxonomy
is dimension-sized by construction, so the per-level fold happens on the
driver (|nodes| ints); a corpus-sized hierarchy would instead tag-union
each wave through a node-keyed exchange — same per-round plan the CC
loop uses, with the wave rows in place of label candidates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FANOUT = 4

_ROW = pa.schema([("node", pa.int64()), ("mass", pa.int64())])


def category_rollup(part_ds, fanout: int = FANOUT):
    """part -> (node, subtree_c): exact subtree sums of retail-price
    cents over the parent = key // fanout taxonomy."""
    from .cc import _sever

    def own(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _ROW.empty_table()
        ids = pc.cast(t["p_partkey"], pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.round(
            t["p_retailprice"].combine_chunks().to_numpy(
                zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"node": pa.array(ids, pa.int64()),
                         "mass": pa.array(cents, pa.int64())}).cast(_ROW)

    def up(t: pa.Table, _f=fanout) -> pa.Table:
        if len(t) == 0:
            return _ROW.empty_table()
        nd = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
        ms = t["mass"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = nd != 0  # mass at the root has nowhere further to go
        par = nd[keep] // _f
        upn, inv = np.unique(par, return_inverse=True)
        s = np.zeros(len(upn), np.int64)
        np.add.at(s, inv, ms[keep])
        return pa.table({"node": pa.array(upn, pa.int64()),
                         "mass": pa.array(s, pa.int64())}).cast(_ROW)

    acc: dict[int, int] = {}

    def fold(ds) -> int:
        """Add a wave into the accumulator; return its row count."""
        rows = 0
        for b in ds.iter_batches(batch_format="pyarrow"):
            nd = b["node"].to_numpy(zero_copy_only=False)
            ms = b["mass"].to_numpy(zero_copy_only=False)
            rows += len(nd)
            for n, m in zip(nd.tolist(), ms.tolist()):
                acc[n] = acc.get(n, 0) + m
        return rows

    pending = _sever(part_ds.select_columns(
        ["p_partkey", "p_retailprice"]).map_batches(
        own, batch_format="pyarrow").materialize())
    while fold(pending):
        pending = _sever(pending.map_batches(
            up, batch_format="pyarrow").materialize())

    nodes = sorted(acc)
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "subtree_c": pa.array([acc[n] for n in nodes], pa.int64()),
    })


def category_rollup_sql(fanout: int = FANOUT) -> str:
    return f"""
WITH RECURSIVE anc(node, a) AS (
  SELECT p_partkey, p_partkey FROM part
  UNION ALL
  SELECT node, a // {fanout} FROM anc WHERE a > 0
)
SELECT CAST(a AS BIGINT) AS node,
       CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
           AS subtree_c
FROM anc JOIN part ON anc.node = part.p_partkey
GROUP BY a
"""
