"""Deterministic weighted sample (rational race): hand-checked selection
plus retry/partition stability; the DuckDB gate covers sf-scale."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.sample import SAMPLE_MULT, weighted_sample_docs


def _docs(ids, texts):
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _scores(ids, texts):
    h = (np.asarray(ids, np.uint64) * np.uint64(SAMPLE_MULT)).astype(
        np.float64)
    w = np.array([len(t) for t in texts], np.float64)
    return h / w


def test_weighted_sample_matches_numpy_reference(ray_session):
    import ray.data as rd

    ids = list(range(1, 41))
    texts = ["x" * (10 + 97 * i % 400) for i in ids]
    want_order = np.lexsort((np.asarray(ids), _scores(ids, texts)))[:5]
    want_ids = [ids[i] for i in want_order]
    out = weighted_sample_docs(
        rd.from_arrow(_docs(ids, texts)).repartition(4), k=5)
    assert sorted(out["doc_id"].to_pylist()) == sorted(want_ids)
    assert out["n_chars"].to_pylist() == [len(texts[i - 1])
                                          for i in out["doc_id"].to_pylist()]


def test_weighted_sample_partition_invariant(ray_session):
    import ray.data as rd

    ids = list(range(1, 101))
    texts = ["y" * (5 + 31 * i % 200) for i in ids]
    t = _docs(ids, texts)
    a = weighted_sample_docs(rd.from_arrow(t).repartition(2), k=10)
    b = weighted_sample_docs(rd.from_arrow(t).repartition(7), k=10)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()


def test_weight_monotonicity(ray_session):
    import ray.data as rd

    # same hash, 100x the weight -> 100x smaller score: the long twin of
    # every id pair must win before its short twin does
    ids = list(range(1, 21))
    long_ids = [i for i in ids if i % 2 == 0]
    texts = ["z" * (2000 if i % 2 == 0 else 20) for i in ids]
    out = weighted_sample_docs(
        rd.from_arrow(_docs(ids, texts)).repartition(3), k=10)
    got = set(out["doc_id"].to_pylist())
    # all 10 heavy docs fit in k=10; they dominate unless a light doc's
    # hash is ~100x smaller — verify against the exact scores, not luck
    want = set(np.asarray(ids)[np.lexsort(
        (np.asarray(ids), _scores(ids, texts)))[:10]].tolist())
    assert got == want
    assert len(got & set(long_ids)) >= 8  # weight actually matters
