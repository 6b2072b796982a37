"""Hand-computed oracles for the Q8/Q2/Q22 shapes (market_share,
min_cost_supplier, idle_balance_by_segment); the DuckDB gate covers
sf-scale."""

from __future__ import annotations

import pyarrow as pa

from fastcdc_rs_ray.stages.aggregate import market_share
from fastcdc_rs_ray.stages.joins import (
    idle_balance_by_segment,
    min_cost_supplier,
)


def _ts(dates):
    import numpy as np

    return pa.array(np.array(dates, dtype="datetime64[us]"))


def test_market_share_num_den(ray_session):
    import ray.data as rd

    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["MEDIUM", "LARGE"]),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([3, 4], pa.int32()),  # s1 is the target
    })
    nation = pa.table({
        "n_nationkey": pa.array([3, 4, 5], pa.int32()),
        "n_name": pa.array(["NATION_3", "NATION_4", "NATION_5"]),
        "n_regionkey": pa.array([2, 2, 0], pa.int32()),
    })
    region = pa.table({
        "r_regionkey": pa.array([0, 2], pa.int32()),
        "r_name": pa.array(["AMERICA", "ASIA"]),
    })
    # customers 1 (ASIA via nation 4) and 2 (AMERICA via nation 5)
    customer = pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([4, 5], pa.int32()),
    })
    orders = pa.table({
        "o_orderkey": pa.array([10, 20], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": _ts(["1996-04-01", "1996-05-01"]),
    })
    # order 10 (in-region): part-1 items from s1 (target, rev 100*100)
    # and s2 (rev 200*100); part-2 item ignored; order 20 out of region.
    lineitem = pa.table({
        "l_orderkey": pa.array([10, 10, 10, 20], pa.int64()),
        "l_partkey": pa.array([1, 1, 2, 1], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 1], pa.int64()),
        "l_extendedprice": pa.array([1.0, 2.0, 9.0, 5.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
    })
    out = market_share(
        rd.from_arrow(orders).repartition(2),
        rd.from_arrow(lineitem).repartition(2),
        customer, supplier, nation, region, part,
        p_type="MEDIUM", target_nation="NATION_3", cust_region="ASIA",
        num_partitions=2,
    )
    assert out["o_year"].to_pylist() == [1996]
    assert out["share_num_u4"].to_pylist() == [100 * 100]
    assert out["share_den_u4"].to_pylist() == [300 * 100]


def test_min_cost_supplier_equality_joinback(ray_session):
    import ray.data as rd

    part = pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_size": pa.array([25, 25, 7], pa.int64()),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["S1", "S2"]),
        "s_nationkey": pa.array([0, 1], pa.int32()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["NATION_0", "NATION_1"]),
    })
    # part 1: s1 min 3.00, s2 min 3.00 -> tie, both kept;
    # part 2: s1 min 5.00, s2 min 4.00 -> s2; part 3 filtered by size.
    lineitem = pa.table({
        "l_partkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 1, 2, 1], pa.int64()),
        "l_extendedprice": pa.array([3.0, 8.0, 3.0, 5.0, 4.0, 1.0]),
    })
    out = min_cost_supplier(
        rd.from_arrow(lineitem).repartition(3), part, supplier, nation,
        p_size=25, num_partitions=2,
    )
    rows = list(zip(out["p_partkey"].to_pylist(),
                    out["s_suppkey"].to_pylist(),
                    out["min_price_u2"].to_pylist()))
    assert rows == [(1, 1, 300), (1, 2, 300), (2, 2, 400)]
    assert out["s_nation"].to_pylist() == ["NATION_0", "NATION_1",
                                           "NATION_1"]


def test_idle_balance_by_segment(ray_session):
    import ray.data as rd

    # positive balances u2: 300, 300, 100 -> sum 700, cnt 3; "rich" =
    # bal_u2 * 3 > 700. c1 (300*3=900) rich + only a pre-cutoff order ->
    # counted (seg A); c2 rich but has a recent order; c3 (100*3=300)
    # and c4 (<0) not rich.
    customer = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_acctbal": pa.array([3.0, 3.0, 1.0, -0.5]),
        "c_mktsegment": pa.array(["A", "B", "A", "B"]),
    })
    orders = pa.table({
        "o_custkey": pa.array([1, 2, 2], pa.int64()),
        "o_orderdate": _ts(["1999-06-01", "2000-03-01", "2001-01-01"]),
    })
    out = idle_balance_by_segment(
        rd.from_arrow(customer).repartition(2),
        rd.from_arrow(orders).repartition(2),
    )
    assert out["c_mktsegment"].to_pylist() == ["A"]
    assert out["numcust"].to_pylist() == [1]
    assert out["totacctbal_u2"].to_pylist() == [300]
