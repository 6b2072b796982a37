"""embedding_pca_projection: numpy-replica parity, partition invariance,
and that the projection actually finds a planted dominant direction
(stages/vecagg.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.vecagg import embedding_pca_projection


def _table(emb: np.ndarray, ids: np.ndarray, dim: int) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), dim),
    })


def _numpy_replica(emb: np.ndarray, quant: float = 1e6,
                   n_iter: int = 64) -> np.ndarray:
    q = np.floor(emb.astype(np.float64) * quant).astype(np.int64)
    g = (q.T @ q).astype(np.float64)
    dim = emb.shape[1]
    v = np.ones(dim, np.float64) / np.sqrt(dim)
    for _ in range(n_iter):
        v = g @ v
        v = v / np.linalg.norm(v)
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    w = np.floor(v * quant).astype(np.int64)
    return q @ w


def test_matches_replica_across_partitionings(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    dim, n = 16, 300
    emb = rng.normal(0, 0.2, (n, dim)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    want = _numpy_replica(emb)
    t = _table(emb, ids, dim)
    for nblocks in (1, 9):
        out = embedding_pca_projection(
            rd.from_arrow(t).repartition(nblocks), dim=dim
        ).to_pandas().sort_values("vec_id")
        assert out.proj_q.to_numpy().tolist() == want.tolist()


def test_finds_planted_direction(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    dim, n = 8, 400
    direction = np.zeros(dim); direction[3] = 1.0
    coef = rng.normal(0, 1.0, n)
    emb = (np.outer(coef, direction)
           + rng.normal(0, 0.01, (n, dim))).astype(np.float32)
    t = _table(emb, np.arange(n, dtype=np.int64), dim)
    out = embedding_pca_projection(rd.from_arrow(t), dim=dim).to_pandas()
    out = out.sort_values("vec_id")
    # projection must correlate almost perfectly with the planted coefs
    p = out.proj_q.to_numpy().astype(np.float64)
    r = np.corrcoef(p, coef)[0, 1]
    assert abs(r) > 0.999, r
