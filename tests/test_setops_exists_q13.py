"""Hand-computed oracles for the set-op stage (INTERSECT / EXCEPT), the
Q4-shape EXISTS semi-join count, the Q13-shape order-count distribution,
and the grouped exact median — crafted frames; the DuckDB gate covers the
sf-scale versions via tools/verify_queries.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.joins import customer_order_counts, exists_order_counts
from fastcdc_rs_ray.stages.sessions import median_value_by_type
from fastcdc_rs_ray.stages.setops import key_set_op


def _events(rows):
    uid, et = zip(*rows)
    return pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
        }
    )


def test_key_set_op_intersect_and_except(ray_session):
    import ray.data as rd

    rows = [
        (1, "a"), (1, "b"),          # both
        (2, "a"),                     # a only
        (3, "b"),                     # b only
        (4, "a"), (4, "a"), (4, "b"),  # both, dup rows
        (5, "c"),                     # neither side
    ]
    ds = rd.from_arrow(_events(rows)).repartition(3)
    inter = key_set_op(ds, key="user_id", side_col="event_type",
                       side_a="a", side_b="b", op="intersect",
                       num_partitions=2).to_pandas()
    assert sorted(inter["user_id"]) == [1, 4]
    exc = key_set_op(rd.from_arrow(_events(rows)).repartition(3),
                     key="user_id", side_col="event_type",
                     side_a="a", side_b="b", op="except",
                     num_partitions=2).to_pandas()
    assert sorted(exc["user_id"]) == [2]


def test_exists_order_counts_semantics(ray_session):
    import ray.data as rd

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderpriority": pa.array(["HI", "HI", "LO", "LO"]),
        }
    )
    # evidence (already predicate-filtered): orders 1 (twice -> counted
    # once) and 3; order 9 has no orders row
    lineitem = pa.table({"l_orderkey": pa.array([1, 1, 3, 9], pa.int64())})
    out = exists_order_counts(
        rd.from_arrow(orders).repartition(2),
        rd.from_arrow(lineitem).repartition(2),
        num_partitions=3,
    ).to_pandas().sort_values("o_orderpriority")
    assert out["o_orderpriority"].tolist() == ["HI", "LO"]
    assert out["order_count"].tolist() == [1, 1]


def test_customer_order_counts_distribution_with_zero_bucket(ray_session):
    import ray.data as rd

    customer = pa.table({"c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64())})
    # cust 1 -> 3 orders, cust 2 -> 1, cust 3 -> 1, cust 4/5 -> 0
    orders = pa.table({"o_custkey": pa.array([1, 1, 1, 2, 3], pa.int64())})
    out = customer_order_counts(
        rd.from_arrow(customer).repartition(2),
        rd.from_arrow(orders).repartition(2),
        num_partitions=3,
    ).to_pandas().sort_values("c_count")
    assert out["c_count"].tolist() == [0, 1, 3]
    assert out["custdist"].tolist() == [2, 2, 1]


def test_median_value_by_type_lower_middle(ray_session):
    import ray.data as rd

    # even count -> lower middle (quantile_disc rule); odd -> exact middle
    t = pa.table(
        {
            "event_type": pa.array(["x"] * 4 + ["y"] * 3),
            "value": pa.array([4.0, 1.0, 3.0, 2.0, 9.5, 7.5, 8.5]),
        }
    )
    out = median_value_by_type(rd.from_arrow(t).repartition(3)).to_pandas()
    got = dict(zip(out["event_type"], out["median_value"]))
    assert got == {"x": 2.0, "y": 8.5}


def test_user_spend_rank_ties_share_rank(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.sessions import user_spend_rank

    # totals: u1=3.00, u2=3.00 (tie -> rank 1), u3=5.00 (rank 3), u4=9.00
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 3, 4], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0, 5.0, 9.0]),
        }
    )
    out = (
        user_spend_rank(rd.from_arrow(t).repartition(3), num_partitions=2)
        .to_pandas()
        .sort_values("user_id")
    )
    assert out["total_c"].tolist() == [300, 300, 500, 900]
    assert out["rnk"].tolist() == [1, 1, 3, 4]
    assert out["pct_rank"].tolist() == [0.0, 0.0, 2 / 3, 1.0]


def test_pricing_cube_grouping_sets(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.aggregate import pricing_cube

    t = pa.table(
        {
            "l_returnflag": pa.array(["A", "A", "B"]),
            "l_linestatus": pa.array(["F", "O", "F"]),
            "l_quantity": pa.array([1.0, 2.0, 4.0]),
        }
    )
    out = pricing_cube(rd.from_arrow(t).repartition(2), num_partitions=2).to_pandas()
    got = {
        (r.l_returnflag, r.l_linestatus): (r.count_order, r.sum_qty_c)
        for r in out.itertuples()
    }
    assert got == {
        ("A", "F"): (1, 100), ("A", "O"): (1, 200), ("B", "F"): (1, 400),
        ("A", None): (2, 300), ("B", None): (1, 400),
        (None, "F"): (2, 500), (None, "O"): (1, 200),
        (None, None): (3, 700),
    }


def test_below_avg_revenue_integer_predicate(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.joins import below_avg_revenue

    # part 1: qtys 10, 20, 30 (avg 20; below half-avg < 10: none... use 4)
    # part 1: qtys 4, 20, 30 (sum 54, half-avg 9: 4 qualifies, price 7.0)
    # part 2: qtys 5, 5 (half-avg 2.5: none)
    t = pa.table(
        {
            "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "l_quantity": pa.array([4.0, 20.0, 30.0, 5.0, 5.0]),
            "l_extendedprice": pa.array([7.0, 1.0, 1.0, 1.0, 1.0]),
        }
    )
    out = below_avg_revenue(rd.from_arrow(t).repartition(3), num_partitions=2)
    assert out["n_items"].to_pylist() == [1]
    assert out["revenue_c"].to_pylist() == [700]


def test_props_k_stats_extraction(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.aggregate import props_k_stats

    t = pa.table(
        {
            "props": pa.array(['{"k": 7}', '{"k": 7}', '{"k":12}']),
            "value": pa.array([1.5, 2.25, 4.0]),
        }
    )
    out = props_k_stats(rd.from_arrow(t).repartition(2)).to_pandas()
    got = {r.k: (r.n_events, r.sum_value_c) for r in out.itertuples()}
    assert got == {7: (2, 375), 12: (1, 400)}
