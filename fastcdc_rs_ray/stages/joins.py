"""As-of join: each left row picks up the latest right row at-or-before
its timestamp, per key — the canonical time-series join Ray Data has no
native operator for (reference has no joins at all, SURVEY.md §2.4).

Implementation is the engine's standard exchange shape: tag-union both
sides into one schema, ONE keyed repartition on the join key co-locates
every key's rows, then a vectorized per-block merge (lexsort + per-key
``np.searchsorted``) emits matches.  No ``Dataset.join`` (see
pipelines.neardup: its finalize breaks on schema-less empty partitions),
no driver state.

Partitioning assumption (documented per SURVEY §2.10): all rows of one
key fit in one block — the same assumption every keyed stage here makes;
a key whose history exceeds block budget would need range-bucketed
sub-splitting with boundary carry (the S4 pattern)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def asof_join(left_ds, right_ds, key: str, left_ts: str, right_ts: str,
              right_cols: list[str], num_partitions: int = 8):
    """Inner as-of join: left rows joined to the latest right row with
    ``right_ts <= left_ts`` for the same ``key``; left rows with no prior
    right row are dropped (inner semantics, matching DuckDB ``ASOF JOIN``).

    Result columns: every left column, plus ``right_cols`` from the
    matched right row.
    """
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    lnames = list(left_schema.names)
    ltypes = dict(zip(left_schema.names, left_schema.types))
    rtypes = dict(zip(right_schema.names, right_schema.types))

    fields = [("jkey", pa.int64()), ("jts", pa.int64()), ("tag", pa.int8())]
    fields += [(f"l_{c}", ltypes[c]) for c in lnames]
    fields += [(f"r_{c}", rtypes[c]) for c in right_cols]
    schema = pa.schema(fields)

    def left_side(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {
            "jkey": pa.compute.cast(t[key], pa.int64()),
            "jts": pa.compute.cast(t[left_ts], pa.int64()),
            "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
            **{f"l_{c}": t[c] for c in lnames},
            **{f"r_{c}": pa.nulls(n, rtypes[c]) for c in right_cols},
        }
        return pa.table({f.name: cols[f.name] for f in schema}).cast(schema)

    def right_side(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {
            "jkey": pa.compute.cast(t[key], pa.int64()),
            "jts": pa.compute.cast(t[right_ts], pa.int64()),
            "tag": pa.array(np.ones(n, np.int8), pa.int8()),
            **{f"l_{c}": pa.nulls(n, ltypes[c]) for c in lnames},
            **{f"r_{c}": t[c] for c in right_cols},
        }
        return pa.table({f.name: cols[f.name] for f in schema}).cast(schema)

    mixed = left_ds.map_batches(left_side, batch_format="pyarrow").union(
        right_ds.map_batches(right_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    out_fields = [(c, ltypes[c]) for c in lnames] + [
        (c, rtypes[c]) for c in right_cols
    ]
    out_schema = pa.schema(out_fields)

    def merge_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["jts"].combine_chunks().to_numpy(zero_copy_only=False)
        lsel = np.flatnonzero(tag == 0)
        rsel = np.flatnonzero(tag == 1)
        if len(lsel) == 0 or len(rsel) == 0:
            return out_schema.empty_table()
        lk, lt = k[lsel], ts[lsel]
        rk, rt = k[rsel], ts[rsel]
        lorder = np.lexsort((lt, lk))
        rorder = np.lexsort((rt, rk))
        lk, lt = lk[lorder], lt[lorder]
        rk, rt = rk[rorder], rt[rorder]
        # per-key merge: for each left key segment, searchsorted into the
        # right key segment (keys per block are bounded by the exchange)
        match = np.full(len(lk), -1, dtype=np.int64)
        lstarts = np.concatenate([[0], np.flatnonzero(lk[1:] != lk[:-1]) + 1, [len(lk)]])
        rkeys_sorted = rk
        for a, b in zip(lstarts[:-1], lstarts[1:]):
            key_val = lk[a]
            r0 = np.searchsorted(rkeys_sorted, key_val, side="left")
            r1 = np.searchsorted(rkeys_sorted, key_val, side="right")
            if r0 == r1:
                continue
            idx = np.searchsorted(rt[r0:r1], lt[a:b], side="right") - 1
            ok = idx >= 0
            match[a:b][ok] = r0 + idx[ok]
        hit = np.flatnonzero(match >= 0)
        if len(hit) == 0:
            return out_schema.empty_table()
        lrows = pa.array(lsel[lorder][hit], pa.int64())
        rrows = pa.array(rsel[rorder][match[hit]], pa.int64())
        cols = {}
        for c in lnames:
            cols[c] = t[f"l_{c}"].combine_chunks().take(lrows)
        for c in right_cols:
            cols[c] = t[f"r_{c}"].combine_chunks().take(rrows)
        return pa.table({f.name: cols[f.name] for f in out_schema}).cast(out_schema)

    return mixed.map_batches(merge_block, batch_format="pyarrow", batch_size=None)
