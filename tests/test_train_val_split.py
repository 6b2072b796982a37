"""train_val_split: deterministic hash-bucket corpus split — python
replica oracle + stability across repartitioning; the DuckDB gate covers
sf-scale via tools/verify_queries.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.sample import SAMPLE_MULT, train_val_split


def _docs(n: int) -> pa.Table:
    rng = np.random.default_rng(7)
    ids = np.arange(1, n + 1, dtype=np.int64)
    texts = ["x" * int(k) for k in rng.integers(1, 50, n)]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _replica(t: pa.Table, train_pm=980, val_pm=10):
    did = t["doc_id"].to_numpy().astype(np.uint64)
    bucket = (did * np.uint64(SAMPLE_MULT)) % np.uint64(1000)
    sid = np.where(bucket < train_pm, 0,
                   np.where(bucket < train_pm + val_pm, 1, 2))
    chars = np.array([len(s) for s in t["text"].to_pylist()], np.int64)
    out = {}
    for i, name in enumerate(["train", "val", "test"]):
        m = sid == i
        if m.any():
            out[name] = (int(m.sum()), int(chars[m].sum()))
    return out


def test_train_val_split_matches_replica_and_partitioning(ray_session):
    import ray.data as rd

    t = _docs(3000)
    want = _replica(t)
    for nparts in (1, 7):
        got_t = train_val_split(rd.from_arrow(t).repartition(nparts))
        got = {
            r["split"]: (r["n_docs"], r["sum_chars"])
            for r in got_t.to_pylist()
        }
        assert got == want
    # sanity: the 980/10/10 per-mille thresholds roughly hold
    assert want["train"][0] > 2800
    assert 0 < want["val"][0] < 100
