"""decontaminate: planted benchmark-substring leaks are caught, clean docs
pass, benchmark docs themselves are never reported."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.decontam import decontaminate


def test_planted_contamination(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(41)

    def rand_text(n):
        return "".join(chr(c) for c in rng.integers(97, 123, n))

    docs = {}
    # benchmark docs: ids 0, 50 (doc_id % 50 == 0)
    docs[0] = rand_text(120)
    docs[50] = rand_text(120)
    # leaked: contain a 40-char span of a benchmark doc
    docs[7] = rand_text(30) + docs[0][40:80] + rand_text(30)
    docs[123] = docs[50][10:55] + rand_text(60)
    # clean training docs
    for i in [1, 2, 3, 101, 149]:
        docs[i] = rand_text(100)
    # too short to hold a 30-gram: never contaminated
    docs[9] = "tiny"

    ids = sorted(docs)
    t = pa.table({
        "doc_id": pa.array(np.array(ids, np.int64)),
        "text": pa.array([docs[i] for i in ids], pa.string()),
    })
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)

    out = decontaminate(
        rd.read_parquet(path).repartition(4), L=30, bench_mod=50,
        log2_bits=12,
    ).to_pandas()

    assert sorted(out["doc_id"]) == [7, 123]
