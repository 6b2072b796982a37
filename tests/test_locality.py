"""locality_compression: SimHash-ordered shards compress strictly smaller
than hash-of-id shards on a twin-bearing corpus; totals deterministic."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.locality import locality_compression


def _corpus(n=300, seed=12) -> pa.Table:
    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    texts = []
    for i in range(n):
        body = " ".join(rng.choice(words, 60))
        texts.append(body)
    # plant exact twins far apart in id order: doc i and doc i + n
    twins = texts[: n // 3]
    all_texts = texts + twins
    return pa.table({
        "doc_id": pa.array(range(len(all_texts)), pa.int64()),
        "text": pa.array(all_texts, pa.string()),
    })


def test_simhash_order_compresses_smaller(ray_session):
    import ray.data as rd

    t = _corpus()
    out = locality_compression(
        rd.from_arrow(t).repartition(4), num_partitions=4
    ).to_pandas().set_index("ordering")
    assert out.loc["doc_id", "n_docs"] == out.loc["simhash", "n_docs"] == len(t)
    assert out.loc["doc_id", "raw_bytes"] == out.loc["simhash", "raw_bytes"]
    # twins sit ~n ids apart -> scattered in id order, adjacent in simhash
    assert out.loc["simhash", "gz_bytes"] < out.loc["doc_id", "gz_bytes"]

    # deterministic totals under a different input partitioning
    out2 = locality_compression(
        rd.from_arrow(t).repartition(7), num_partitions=4
    ).to_pandas().set_index("ordering")
    assert out2.equals(out)
