"""Hot-band skew stress: thousands of IDENTICAL docs collapse every band
into one massive equal-key group — the boilerplate-skew case the north rule
calls out.  The sort-link exchange must stay linear (consecutive linking
emits O(n) edges per band, never the O(n^2) pair explosion a naive
per-group pair emission would produce) while connectivity survives the
range partitioner splitting the hot run across blocks (that split IS the
salting).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.pipelines.neardup import doc_neardup_clusters, doc_signatures
from fastcdc_rs_ray.stages.lsh import N_BANDS, candidate_edges

N_HOT = 3000
N_NORMAL = 50
VOCAB = [f"w{i}" for i in range(300)]


def _corpus() -> pa.Table:
    rng = np.random.default_rng(7)
    hot = " ".join(rng.choice(VOCAB, size=80))  # one boilerplate doc x3000
    normal = [" ".join(rng.choice(VOCAB, size=80)) for _ in range(N_NORMAL)]
    return pa.table({
        "doc_id": pa.array(np.arange(N_HOT + N_NORMAL), pa.int64()),
        "text": pa.array([hot] * N_HOT + normal),
    })


def test_hot_band_edges_linear(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_corpus()).repartition(8)
    edges = candidate_edges(doc_signatures(ds)).to_pandas()
    # identical docs share all N_BANDS bands; consecutive linking bounds the
    # edge count by ~n per band (plus stitches), never n^2/2 = 4.5M
    assert len(edges) <= N_HOT * N_BANDS + 1000
    assert len(edges) >= N_HOT - 1  # enough edges to connect the hot run


def test_hot_band_single_cluster(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_corpus()).repartition(8)
    out = doc_neardup_clusters(ds, verify_threshold=0.5).to_pandas()
    out["doc_id"] = out["conv_id"].astype(int)
    hot = out[out["doc_id"] < N_HOT]
    assert len(hot) == N_HOT
    # all identical docs in ONE cluster despite the block splits
    assert hot["cluster_id"].nunique() == 1
    # normal docs must not be absorbed into the hot cluster
    hot_cluster = hot["cluster_id"].iloc[0]
    normal = out[out["doc_id"] >= N_HOT]
    assert (normal["cluster_id"] != hot_cluster).all()
