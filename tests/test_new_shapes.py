"""Hand-computed oracles for the Q18-shape HAVING join, the sliding
window-frame sum, the pivot/crosstab, the stratified sample, and the
word-count top-k — all on crafted frames (the DuckDB gate covers them at
sf scale via tools/verify_queries.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.joins import large_orders
from fastcdc_rs_ray.stages.sample import SAMPLE_MULT, stratified_sample_events
from fastcdc_rs_ray.stages.sessions import events_pivot, moving_sums
from fastcdc_rs_ray.stages.wordcount import top_tokens


def test_large_orders_having_filter(ray_session):
    import ray.data as rd

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([10, 20, 30], pa.int64()),
            "o_totalprice": pa.array([5.0, 6.0, 7.0]),
        }
    )
    # order 1: 60+50=110 > 100 keep; order 2: 100 (not >) drop; order 3: 99.5 drop
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_quantity": pa.array([60.0, 50.0, 100.0, 99.5]),
        }
    )
    out = large_orders(
        rd.from_arrow(orders).repartition(2),
        rd.from_arrow(lineitem).repartition(2),
        min_qty=100,
        num_partitions=3,
    ).to_pandas()
    assert out["o_orderkey"].tolist() == [1]
    assert out["sum_qty"].tolist() == [110.0]
    assert out["o_custkey"].tolist() == [10]


def test_moving_sums_frame_clamps_at_segment_start(ray_session):
    import ray.data as rd

    # user 1: values 1..9 at increasing ts -> frame-7 sums; user 2 single row
    events = pa.table(
        {
            "event_id": pa.array(list(range(9)) + [99], pa.int64()),
            "user_id": pa.array([1] * 9 + [2], pa.int64()),
            "ts": pa.array(
                np.arange(10, dtype=np.int64).view("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "value": pa.array([float(i + 1) for i in range(9)] + [5.0]),
        }
    )
    out = (
        moving_sums(rd.from_arrow(events).repartition(3), num_partitions=2)
        .to_pandas()
        .sort_values(["user_id", "ts"])
    )
    # frame 7: rows 0-6 cumulative; row 7 = 2+..+8 = 35; row 8 = 3+..+9 = 42
    assert out[out.user_id == 1]["mov_sum"].tolist() == [
        1.0, 3.0, 6.0, 10.0, 15.0, 21.0, 28.0, 35.0, 42.0,
    ]
    assert out[out.user_id == 2]["mov_sum"].tolist() == [5.0]


def test_events_pivot_counts_and_purchase_cents(ray_session):
    import ray.data as rd

    events = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(
                ["click", "purchase", "purchase", "view", "unknown"], pa.string()
            ),
            "value": pa.array([9.99, 1.25, 2.50, 3.0, 4.0]),
        }
    )
    out = (
        events_pivot(rd.from_arrow(events).repartition(3), num_partitions=2)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["n_click"].tolist() == [1, 0]
    assert out["n_purchase"].tolist() == [2, 0]
    assert out["n_view"].tolist() == [0, 1]
    # unknown type counted nowhere
    assert out[["n_click", "n_error", "n_purchase", "n_signup", "n_view"]].to_numpy().sum() == 4
    assert out["purchase_value"].tolist() == [3.75, 0.0]


def test_stratified_sample_matches_hash_order(ray_session):
    import ray.data as rd

    n = 200
    eids = np.arange(n, dtype=np.int64)
    types = np.array(["a", "b"])[eids % 2]
    events = pa.table(
        {
            "event_id": pa.array(eids, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "user_id": pa.array(eids % 7, pa.int64()),
        }
    )
    out = stratified_sample_events(
        rd.from_arrow(events).repartition(5), n=10, num_partitions=2
    ).to_pandas()
    hv = eids.astype(np.uint64) * np.uint64(SAMPLE_MULT)
    for ty in ("a", "b"):
        mask = types == ty
        expect = set(eids[mask][np.argsort(hv[mask])[:10]].tolist())
        got = set(out[out.event_type == ty]["event_id"].tolist())
        assert got == expect, ty


def test_top_tokens_counts_and_tiebreak(ray_session):
    import ray.data as rd

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["b a a", "a b\tc", "c b  d"], pa.string()
            ),
        }
    )
    out = top_tokens(rd.from_arrow(docs).repartition(2), k=3, num_partitions=2)
    # counts: a=3, b=3, c=2, d=1 ; ties by token asc
    assert out["token"].to_pylist() == ["a", "b", "c"]
    assert out["cnt"].to_pylist() == [3, 3, 2]
