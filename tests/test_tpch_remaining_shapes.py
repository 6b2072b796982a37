"""Hand-computed oracles for the Q6/Q11/Q12/Q10 shapes
(forecast_revenue, part_value_share, line_priority_counts,
returned_item_revenue); the DuckDB gate covers sf-scale."""

from __future__ import annotations

import pyarrow as pa

from fastcdc_rs_ray.stages.aggregate import (
    forecast_revenue,
    part_value_share,
)
from fastcdc_rs_ray.stages.joins import (
    line_priority_counts,
    returned_item_revenue,
)


def _ts(dates):
    import numpy as np

    return pa.array(np.array(dates, dtype="datetime64[us]"))


def test_forecast_revenue_filter_sum(ray_session):
    import ray.data as rd

    # rows: (in-window, disc 5, qty 10) -> rev 1000*5; (disc 8) out;
    # (qty 24) out (not < 24); (1995 date) out.
    lineitem = pa.table({
        "l_shipdate": _ts(["1996-03-01", "1996-03-01", "1996-03-01",
                           "1995-03-01"]),
        "l_discount": pa.array([0.05, 0.08, 0.06, 0.05]),
        "l_quantity": pa.array([10.0, 10.0, 24.0, 10.0]),
        "l_extendedprice": pa.array([10.0, 10.0, 10.0, 10.0]),
    })
    out = forecast_revenue(rd.from_arrow(lineitem).repartition(2))
    assert out["revenue_u4"].to_pylist() == [5000]
    assert out["n_items"].to_pylist() == [1]


def test_part_value_share_scalar_threshold(ray_session):
    import ray.data as rd

    # values: p1 = 100*100*2 = 20000+? -> compute: qty_u2*price_u2
    # p1: 1.0*1.00 + 1.0*1.00 = 2*(100*100) = 20000
    # p2: 4.0*1.00 = 400*100 = 40000; p3: 1.0*1.00 = 10000
    # total 70000, n=3, avg ~23333; keep val*3*4 > 5*70000=350000:
    # p1 240000 no; p2 480000 yes; p3 120000 no.
    lineitem = pa.table({
        "l_partkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_quantity": pa.array([1.0, 1.0, 4.0, 1.0]),
        "l_extendedprice": pa.array([1.0, 1.0, 1.0, 1.0]),
    })
    out = part_value_share(rd.from_arrow(lineitem).repartition(2))
    assert out["l_partkey"].to_pylist() == [2]
    assert out["value_u4"].to_pylist() == [40000]


def test_line_priority_counts_grid(ray_session):
    import ray.data as rd

    orders = pa.table({
        "o_orderkey": pa.array([10, 20, 30], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "2-HIGH"]),
    })
    # o10 high: F in-window x2, O in-window x1; o20 low: O x1;
    # o30 high: F but 1995 (out of window).
    lineitem = pa.table({
        "l_orderkey": pa.array([10, 10, 10, 20, 30], pa.int64()),
        "l_linestatus": pa.array(["F", "F", "O", "O", "F"]),
        "l_shipdate": _ts(["1996-02-01", "1996-03-01", "1996-04-01",
                           "1996-05-01", "1995-01-01"]),
    })
    out = line_priority_counts(
        rd.from_arrow(orders).repartition(2),
        rd.from_arrow(lineitem).repartition(2),
        year=1996, num_partitions=2,
    )
    assert out["l_linestatus"].to_pylist() == ["F", "O"]
    assert out["high_line_count"].to_pylist() == [2, 1]
    assert out["low_line_count"].to_pylist() == [0, 1]


def test_returned_item_revenue_topk_joinback(ray_session):
    import ray.data as rd

    customer = pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["C1", "C2"]),
        "c_acctbal": pa.array([1.5, -2.0]),
        "c_nationkey": pa.array([0, 1], pa.int32()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["NATION_0", "NATION_1"]),
    })
    # o10 (c1, in window): R items rev 100*100 + 200*95; N item ignored.
    # o20 (c2, in window): R rev 50*100. o30 (c1): out of window.
    orders = pa.table({
        "o_orderkey": pa.array([10, 20, 30], pa.int64()),
        "o_custkey": pa.array([1, 2, 1], pa.int64()),
        "o_orderdate": _ts(["1996-02-01", "1996-03-01", "1996-06-01"]),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array([10, 10, 10, 20, 30], pa.int64()),
        "l_returnflag": pa.array(["R", "R", "N", "R", "R"]),
        "l_extendedprice": pa.array([1.0, 2.0, 9.0, 0.5, 7.0]),
        "l_discount": pa.array([0.0, 0.05, 0.0, 0.0, 0.0]),
    })
    out = returned_item_revenue(
        rd.from_arrow(orders).repartition(2),
        rd.from_arrow(lineitem).repartition(3),
        customer, nation,
        window_lo="1996-01-01", window_hi="1996-04-01",
        k=20, num_partitions=2,
    )
    assert out["c_custkey"].to_pylist() == [1, 2]
    assert out["revenue_u4"].to_pylist() == [100 * 100 + 200 * 95, 50 * 100]
    assert out["c_name"].to_pylist() == ["C1", "C2"]
    assert out["c_acctbal_u2"].to_pylist() == [150, -200]
    assert out["n_name"].to_pylist() == ["NATION_0", "NATION_1"]
