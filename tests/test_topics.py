"""cluster_terms: planted vocab-disjoint blobs recovered; determinism
across partitionings (stages/topics.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.topics import cluster_terms


def _planted(n_per: int = 60, dim: int = 8, seed: int = 6):
    rng = np.random.default_rng(seed)
    a = rng.normal(0, 0.05, (n_per, dim)) + np.array([1.0] + [0] * (dim - 1))
    b = rng.normal(0, 0.05, (n_per, dim)) + np.array([-1.0] + [0] * (dim - 1))
    emb = np.vstack([a, b]).astype(np.float32)
    n = 2 * n_per
    ids = np.arange(n, dtype=np.int64)
    texts = []
    for i in range(n):
        # shared filler + blob-specific vocabulary
        blob = "alpha beta" if i < n_per else "gamma delta"
        texts.append(f"the common filler {blob} {blob}")
    docs = pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})
    embs = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), dim),
    })
    return docs, embs, n_per


def test_recovers_blob_vocab_and_is_deterministic(ray_session):
    import ray.data as rd

    docs, embs, n_per = _planted()
    outs = []
    for nblocks in (1, 5):
        out = cluster_terms(
            rd.from_arrow(docs).repartition(nblocks),
            rd.from_arrow(embs).repartition(nblocks),
            k=2, n_iter=8, top_n=2,
        ).to_pandas()
        outs.append(out)
    assert outs[0].equals(outs[1])
    out = outs[0]
    # two clusters, each naming exactly its blob's vocabulary first
    by_cluster = {c: list(g.sort_values("rank").token)
                  for c, g in out.groupby("cluster")}
    assert len(by_cluster) == 2
    vocabs = sorted(tuple(sorted(v)) for v in by_cluster.values())
    assert vocabs == [("alpha", "beta"), ("delta", "gamma")]
    # distinctive terms beat the shared filler despite equal counts
    assert "the" not in out.token.values
    assert "filler" not in out.token.values
