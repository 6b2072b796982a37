"""ridge_fit_scores: numpy-replica parity, partition invariance, and
recovery of a planted linear signal (stages/vecagg.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.vecagg import ridge_fit_scores


def _table(emb: np.ndarray, ids: np.ndarray, labels: np.ndarray,
           dim: int) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), dim),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })


def _replica(emb: np.ndarray, labels: np.ndarray, quant: float = 1e6,
             lam_q2: int = 10**12) -> np.ndarray:
    dim = emb.shape[1]
    q = np.floor(emb.astype(np.float64) * quant).astype(np.int64)
    g = (q.T @ q).astype(np.float64)
    b = (q.T @ labels.astype(np.int64)).astype(np.float64)
    w = np.linalg.solve(g + float(lam_q2) * np.eye(dim), b)
    w = w / np.max(np.abs(w))
    wq = np.floor(w * quant).astype(np.int64)
    return q @ wq


def test_matches_replica_across_partitionings(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    dim, n = 12, 250
    emb = rng.normal(0, 0.2, (n, dim)).astype(np.float32)
    labels = rng.integers(0, 5, n)
    ids = np.arange(n, dtype=np.int64)
    want = _replica(emb, labels)
    t = _table(emb, ids, labels, dim)
    for nblocks in (1, 8):
        out = ridge_fit_scores(
            rd.from_arrow(t).repartition(nblocks), dim=dim
        ).to_pandas().sort_values("vec_id")
        assert out.score_q.to_numpy().tolist() == want.tolist()


def test_recovers_planted_signal(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    dim, n = 8, 400
    emb = rng.normal(0, 0.3, (n, dim)).astype(np.float32)
    # label is (a noisy threshold of) a fixed linear functional
    truth = np.zeros(dim); truth[2], truth[5] = 1.0, -0.5
    y = (emb.astype(np.float64) @ truth > 0).astype(np.int64)
    t = _table(emb, np.arange(n, dtype=np.int64), y, dim)
    out = ridge_fit_scores(rd.from_arrow(t), dim=dim).to_pandas()
    out = out.sort_values("vec_id")
    s = out.score_q.to_numpy().astype(np.float64)
    # scores must separate the classes: AUC-style check via rank sums
    pos, neg = s[y == 1], s[y == 0]
    auc = (pos[:, None] > neg[None, :]).mean()
    assert auc > 0.95, auc
