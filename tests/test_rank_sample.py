"""Group-wise top-k ranking, exact nearest-rank percentiles, and
deterministic hash sampling — hand-computed oracles on crafted frames."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.sample import SAMPLE_MULT, hash_bucket, hash_sample
from fastcdc_rs_ray.stages.sessions import top_events_per_user, value_percentiles


def test_top_events_ranking_and_ties(ray_session):
    import ray.data as rd

    # user 1: values 3.00, 3.00 (tie -> event_id asc), 2.00, 1.00 ; user 2: one event
    events = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "event_id": pa.array([104, 101, 103, 102, 201], pa.int64()),
            "value": pa.array([1.0, 3.0, 2.0, 3.0, 7.5]),
        }
    )
    out = top_events_per_user(
        rd.from_arrow(events), k=3, num_partitions=4
    ).to_pandas().sort_values(["user_id", "rk"]).reset_index(drop=True)
    assert out["event_id"].tolist() == [101, 102, 103, 201]
    assert out["rk"].tolist() == [1, 2, 3, 1]
    assert out["value_c"].tolist() == [300, 300, 200, 750]


def test_value_percentiles_nearest_rank(ray_session):
    import ray.data as rd

    # sorted cents: 100, 200, 300, 400 ; N=4
    # q=0.5 -> rank ceil(2.0)=2 -> 200 ; q=0.9 -> rank 4 -> 400 ; q=0.99 -> 4
    events = pa.table({"value": pa.array([3.0, 1.0, 4.0, 2.0])})
    t = value_percentiles(rd.from_arrow(events), qs=(0.5, 0.9, 0.99))
    assert t["q"].to_pylist() == [0.5, 0.9, 0.99]
    assert t["value_c"].to_pylist() == [200, 400, 400]


def test_value_percentiles_duplicate_heavy(ray_session):
    import ray.data as rd

    # 9 copies of 1.00 and one 5.00: q=0.5 -> rank 5 -> 100; q=0.99 -> rank 10 -> 500
    events = pa.table({"value": pa.array([1.0] * 9 + [5.0])})
    t = value_percentiles(rd.from_arrow(events), qs=(0.5, 0.99))
    assert t["value_c"].to_pylist() == [100, 500]


def test_hash_sample_deterministic_and_exact(ray_session):
    import ray.data as rd

    ids = np.arange(1000, dtype=np.int64)
    docs = pa.table({"doc_id": pa.array(ids, pa.int64())})
    expect = ids[hash_bucket(ids) < 10]
    got1 = np.sort(
        hash_sample(rd.from_arrow(docs), key="doc_id", pct=10)
        .to_pandas()["doc_id"].to_numpy()
    )
    got2 = np.sort(
        hash_sample(rd.from_arrow(docs), key="doc_id", pct=10)
        .to_pandas()["doc_id"].to_numpy()
    )
    assert np.array_equal(got1, np.sort(expect))
    assert np.array_equal(got1, got2)  # reproducible across runs
    # ~10% +- sampling noise of a bijective hash over a dense range
    assert 50 <= len(got1) <= 150


def test_hash_bucket_matches_hugeint_formula():
    # the numpy wraparound path equals the SQL (k * MULT) % 2^64 % 100
    ids = np.array([0, 1, 2, 977, 123456789, 2**62 + 3], dtype=np.uint64)
    expect = [(int(k) * SAMPLE_MULT) % (1 << 64) % 100 for k in ids]
    assert hash_bucket(ids).tolist() == expect
