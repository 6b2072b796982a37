"""Hyperplane-LSH embedding near-dup: recall against planted twins, exact
precision (candidates are verified with exact cosine)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.ann import _normalize, embedding_matrix
from fastcdc_rs_ray.stages.embed_lsh import embed_neardup_lsh


def _planted_corpus(tmp_path, n_base=400, n_twins=80, dim=64, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim)).astype(np.float32)
    twin_src = rng.choice(n_base, size=n_twins, replace=False)
    twins = base[twin_src] + 0.12 * rng.standard_normal((n_twins, dim)).astype(
        np.float32
    )
    mat = np.vstack([base, twins])
    ids = np.arange(len(mat), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        }
    )
    path = str(tmp_path / "emb.parquet")
    pq.write_table(t, path)
    return path, ids, mat


def test_lsh_recall_and_exact_precision(ray_session, tmp_path):
    import ray.data as rd

    path, ids, mat = _planted_corpus(tmp_path)
    nm = _normalize(mat.astype(np.float64))
    sims = nm @ nm.T
    ii, jj = np.nonzero(np.triu(sims >= 0.9, k=1))
    exact = set(zip(ids[ii].tolist(), ids[jj].tolist()))
    assert len(exact) >= 60  # twins actually landed above tau

    ds = rd.read_parquet(path)
    got = set()
    for r in embed_neardup_lsh(ds, 0.9, num_partitions=4).take_all():
        got.add((min(r["src"], r["dst"]), max(r["src"], r["dst"])))
    # precision is exact by construction (cosine verification)
    assert got <= exact
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(exact)} pairs"


def test_lsh_empty_on_orthogonal_corpus(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = embed_neardup_lsh(ds, 0.9, num_partitions=4).take_all()
    assert out == []  # matches the exact variant: no natural near-dups
