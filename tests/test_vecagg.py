"""embedding_centroids: per-group quantized component sums equal a numpy
reference on a synthetic two-table corpus (including docs with no vector
and vectors with no doc — inner-join semantics)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.vecagg import QUANT, embedding_centroids


def test_centroid_sums_match_numpy(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n, dim = 300, 16
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, n)]

    emb_t = pa.table({
        # vector 299 has no doc; doc 0..298 plus an extra doc 900 w/o vector
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
    })
    doc_t = pa.table({
        "doc_id": pa.array(np.r_[np.arange(n - 1), 900], pa.int64()),
        "lang": pa.array(list(langs[: n - 1]) + ["zz"], pa.string()),
    })
    ep, dp = str(tmp_path / "e.parquet"), str(tmp_path / "d.parquet")
    pq.write_table(emb_t, ep)
    pq.write_table(doc_t, dp)

    out = embedding_centroids(
        rd.read_parquet(ep), rd.read_parquet(dp), num_partitions=4
    ).to_pandas()

    q = np.floor(mat[: n - 1].astype(np.float64) * QUANT).astype(np.int64)
    for lang in ["en", "de", "fr"]:
        sel = langs[: n - 1] == lang
        ref_sum = q[sel].sum(axis=0)
        sub = out[out["lang"] == lang].sort_values("dim_no")
        assert len(sub) == dim
        assert (sub["n"].to_numpy() == sel.sum()).all()
        assert (sub["sum_q"].to_numpy() == ref_sum).all()
    assert "zz" not in set(out["lang"])  # doc without vector contributes 0 rows
    assert len(out) == 3 * dim
