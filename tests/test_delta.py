"""Snapshot chunk delta: the CDC shift-resistance property, pinned.

An insertion early in a document shifts every downstream byte; fixed-size
blocking would invalidate every downstream block, but content-defined cut
points re-synchronize within ~one chunk, so shared-byte volume stays
proportional to the edit.  These tests pin that property plus the identity
and disjoint extremes and partition invariance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.cdc import ChunkerConfig
from fastcdc_rs_ray.stages.delta import (
    chunk_delta,
    docs_as_payload,
    mutate_snapshot,
)

CFG = ChunkerConfig(min_size=64, avg_size=256, max_size=1024)


def _docs_table(n_docs: int = 40, doc_len: int = 8000) -> pa.Table:
    rng = np.random.default_rng(7)
    texts = [
        "".join(chr(c) for c in rng.integers(97, 123, size=doc_len))
        for _ in range(n_docs)
    ]
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _payload_ds(tbl: pa.Table, blocks: int = 4):
    import ray.data as rd

    return docs_as_payload(rd.from_arrow(tbl).repartition(blocks))


def test_identity_snapshot_fully_shared(ray_session):
    tbl = _docs_table()
    out = chunk_delta(_payload_ds(tbl), _payload_ds(tbl), CFG).to_pydict()
    assert out["dedup_bp"] == [10000]
    assert out["new_bytes_b"] == [0]
    assert out["chunks_a"] == out["chunks_b"]


def test_disjoint_snapshot_nothing_shared(ray_session):
    a = _docs_table()
    rng = np.random.default_rng(99)
    b = pa.table({
        "doc_id": a["doc_id"],
        "text": pa.array(
            ["".join(chr(c) for c in rng.integers(65, 91, size=8000))
             for _ in range(len(a))], pa.string()),
    })
    out = chunk_delta(_payload_ds(a), _payload_ds(b), CFG).to_pydict()
    assert out["shared_bytes_b"] == [0]
    assert out["dedup_bp"] == [0]


def test_midpoint_insertion_mostly_shared(ray_session):
    """One marker inserted at each doc's midpoint: every byte after the
    midpoint shifts, yet CDC keeps the vast majority of chunk bytes
    shared (fixed-size blocking would lose ~half)."""
    import ray.data as rd

    tbl = _docs_table()
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    # force every doc into the "insert at midpoint" mutation class
    shifted = pa.table({
        "doc_id": pa.array(ids * 5 + 1, pa.int64()),
        "text": tbl["text"],
    })
    a = docs_as_payload(rd.from_arrow(shifted).repartition(4))
    b = mutate_snapshot(rd.from_arrow(shifted).repartition(4))
    out = chunk_delta(a, b, CFG).to_pydict()
    assert out["dedup_bp"][0] >= 8500, out


def test_partition_invariance(ray_session):
    tbl = _docs_table(24)
    outs = []
    for blocks, parts in ((1, 1), (6, 5)):
        out = chunk_delta(
            _payload_ds(tbl, blocks),
            mutate_snapshot(_payload_ds_raw(tbl, blocks)),
            CFG, num_partitions=parts,
        ).to_pydict()
        outs.append(out)
    assert outs[0] == outs[1]


def _payload_ds_raw(tbl: pa.Table, blocks: int):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)
