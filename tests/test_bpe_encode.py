"""bpe_encode_stats: per-doc n_bpe parity with a pure-Python encoder,
byte accounting, partition invariance (stages/bpe.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.bpe import (
    bpe_encode_reference,
    bpe_encode_stats,
    bpe_train,
)

DOCS = [
    "the the the cat sat on the mat",
    "the theme theater there",
    "aaaa aa aaaa",                       # a==b overlap resolution
    "cat cat cat dog dog banana",
    "",                                   # empty doc
    "unique words only here today",
]


def _docs_table():
    return pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string()),
    })


def test_encode_matches_python_replica(ray_session):
    import ray.data as rd

    t = _docs_table()
    mt = bpe_train(rd.from_arrow(t), n_merges=12)
    merges = list(zip(mt["left"].to_pylist(), mt["right"].to_pylist()))
    assert merges, "training found no merges"
    for nblocks in (1, 3):
        out = bpe_encode_stats(
            rd.from_arrow(t).repartition(nblocks), merges
        ).to_pandas().sort_values("doc_id")
        for doc_id, text in enumerate(DOCS):
            row = out[out.doc_id == doc_id].iloc[0]
            assert row.n_bpe == bpe_encode_reference(text, merges), (
                doc_id, text)
            assert row.n_words == len(text.split())
            assert row.n_bytes == sum(
                len(w.encode()) for w in text.split())
            assert row.n_bpe <= row.n_bytes


def test_merges_actually_compress(ray_session):
    import ray.data as rd

    t = _docs_table()
    mt = bpe_train(rd.from_arrow(t), n_merges=12)
    merges = list(zip(mt["left"].to_pylist(), mt["right"].to_pylist()))
    out = bpe_encode_stats(rd.from_arrow(t), merges).to_pandas()
    assert out.n_bpe.sum() < out.n_bytes.sum()
