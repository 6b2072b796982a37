"""Distributed Lloyd's k-means: bit-identical to the single-matrix numpy
reference under multi-block partitioning, and recovers planted blobs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.kmeans import kmeans, kmeans_numpy_reference


def _blob_corpus(tmp_path, n_per=120, k=4, dim=12, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim)) * 8.0
    ids = np.arange(n_per * k, dtype=np.int64)
    truth = ids // n_per
    # hash-seeding picks ids [196 472 295 320] (fixed by hash64, data-free);
    # move 320 to blob 0 so every blob gets exactly one seed and plain
    # Lloyd's provably recovers the planted structure
    truth = truth.copy()
    truth[320] = 0
    mat = (centers[truth] + rng.standard_normal((len(ids), dim))).astype(
        np.float32)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
    })
    path = str(tmp_path / "emb.parquet")
    pq.write_table(t, path)
    return path, ids, mat, truth


def test_kmeans_matches_reference_and_recovers_blobs(ray_session, tmp_path):
    import ray.data as rd

    path, ids, mat, truth = _blob_corpus(tmp_path)
    ds = rd.read_parquet(path).repartition(7)  # force multi-block partials

    out_ds, cent = kmeans(ds, k=4, n_iter=10)
    out = out_ds.to_pandas().sort_values("vec_id")
    got = out["cluster"].to_numpy()

    ref_assign, ref_cent = kmeans_numpy_reference(ids, mat, k=4, n_iter=10)
    assert (got == ref_assign).all()
    assert np.array_equal(cent, ref_cent)

    # blob recovery: every true blob maps to exactly one predicted cluster
    for b in range(4):
        pred = got[truth == b]
        assert (pred == pred[0]).all()
    assert len(set(got[truth == b][0] for b in range(4))) == 4
