"""Equivalence of the three edge-verification strategies and the
embedding near-dup operator with planted duplicates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.cdc import ChunkerConfig
from fastcdc_rs_ray.pipelines.neardup import (
    dedupe_edges,
    signatures_pipeline,
    verify_edges,
    verify_edges_shuffle,
)
from fastcdc_rs_ray.stages.lsh import candidate_edges
from fastcdc_rs_ray.sources.transcripts import synth_transcripts

CFG = ChunkerConfig(64, 256, 1024)


def test_shuffle_verify_equals_driver_verify(ray_session):
    import ray.data as rd

    transcripts, _ = synth_transcripts(n_convs=100, seed=31, dup_frac=0.4)
    sigs = signatures_pipeline(
        rd.from_arrow(transcripts).repartition(4), cfg=CFG, num_partitions=8
    ).materialize()
    edges = candidate_edges(sigs, num_partitions=8).materialize()
    assert edges.count() > 0

    via_driver = verify_edges(edges, sigs, 0.4).to_pandas()
    ded = dedupe_edges(edges, num_partitions=4)
    via_shuffle = verify_edges_shuffle(ded, sigs, 0.4, num_partitions=8).to_pandas()

    def norm(df):
        return {tuple(sorted(p)) for p in zip(df.src, df.dst)}

    assert norm(via_driver) == norm(via_shuffle)
    assert len(norm(via_driver)) > 0


def test_embed_neardup_with_planted_duplicates(ray_session):
    import ray
    import ray.data as rd

    from fastcdc_rs_ray.pipelines.queries import q_embed_neardup

    rng = np.random.default_rng(7)
    n, dim = 300, 32
    m = rng.normal(size=(n, dim)).astype(np.float32)
    m[10] = m[3] + rng.normal(scale=0.01, size=dim).astype(np.float32)  # near-dup
    m[20] = m[5]  # exact dup
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), pa.float32()), dim
            ),
        }
    )
    import os
    import pyarrow.parquet as pq
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(t, os.path.join(td, "embeddings.parquet"))
        pairs = q_embed_neardup(td, tau=0.95).to_pandas()
    got = {tuple(p) for p in zip(pairs.src, pairs.dst)}
    # cosine of the planted pairs is >= 0.999 (tau 0.95) — include the
    # actual similarities in the message so an in-suite failure is
    # diagnosable (environmental vs numeric)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    diag = (f"n_pairs={len(got)} sims: (3,10)={mn[3] @ mn[10]:.6f} "
            f"(5,20)={mn[5] @ mn[20]:.6f} sample={sorted(got)[:6]}")
    assert (3, 10) in got, diag
    assert (5, 20) in got, diag
