"""Distributed set operations (INTERSECT / EXCEPT) on key sets.

The reference has no set ops (SURVEY.md §2.7 — it is a chunking library);
these complete the engine's SQL-surface parity for dedup-style work:
"users who did A and also B" (INTERSECT) / "users who did A but never B"
(EXCEPT) are the membership queries a training-data pipeline runs between
source snapshots (e.g. "docs in crawl N not in crawl N-1").

Plan shape: per-block distinct shrinks each block to unique
(key, side-bitmask) rows, ONE keyed exchange on the key co-locates every
occurrence, and a per-block OR-fold of the bitmask decides membership.
Both set ops come out of the same single exchange — the membership fold
is a byte comparison, so asking for INTERSECT and EXCEPT together costs
one shuffle, not two.

Partitioning assumption: the distinct-key universe per partition fits in
a block (the same two-level distinct plan as
sessions.distinct_users_per_type); hot keys are impossible by
construction — keys are unique after the fold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def key_set_op(ds, key: str, side_col: str, side_a: str, side_b: str,
               op: str, num_partitions: int = 8):
    """Distinct ``key`` s in side A (rows where ``side_col == side_a``)
    combined with side B per ``op``:

    - ``"intersect"``: keys present in BOTH sides
    - ``"except"``: keys in A and NOT in B

    Returns a Dataset with one ``key`` column (int64), one row per
    qualifying key.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")

    def distinct_flags(t: pa.Table) -> pa.Table:
        sv = t[side_col].combine_chunks()
        in_a = pc.equal(sv, side_a).to_numpy(zero_copy_only=False)
        in_b = pc.equal(sv, side_b).to_numpy(zero_copy_only=False)
        keep = in_a | in_b
        keys = t[key].combine_chunks().to_numpy(zero_copy_only=False)[keep]
        flags = np.where(in_a[keep], 1, 0) | np.where(in_b[keep], 2, 0)
        # OR-fold duplicates within the block before the exchange
        uk, inv = np.unique(keys, return_inverse=True)
        folded = np.zeros(len(uk), dtype=np.int8)
        np.bitwise_or.at(folded, inv, flags.astype(np.int8))
        return pa.table(
            {key: pa.array(uk, pa.int64()), "flags": pa.array(folded, pa.int8())}
        )

    ds = ds.map_batches(distinct_flags, batch_format="pyarrow")
    ds = ds.repartition(num_blocks=num_partitions, keys=[key])

    want = 3 if op == "intersect" else 1

    def fold(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({key: pa.array([], pa.int64())})
        keys = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        flags = t["flags"].combine_chunks().to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        folded = np.zeros(len(uk), dtype=np.int8)
        np.bitwise_or.at(folded, inv, flags)
        return pa.table({key: pa.array(uk[folded == want], pa.int64())})

    return ds.map_batches(fold, batch_format="pyarrow", batch_size=None)
