"""Hand-computed oracles for the Q17/Q9/Q20 correlated-aggregate
shapes (small_qty_revenue, product_profit, surplus_suppliers); the
DuckDB gate covers sf-scale."""

from __future__ import annotations

import pyarrow as pa

from fastcdc_rs_ray.stages.aggregate import (
    product_profit,
    small_qty_revenue,
    surplus_suppliers,
)


def _ts(dates):
    import numpy as np

    return pa.array(np.array(dates, dtype="datetime64[us]"))


def test_small_qty_revenue_correlated_avg(ray_session):
    import ray.data as rd

    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["Brand#4", "Brand#9"]),
    })
    # part 1: qtys 1,10,10,10 -> sum_u2=3100, cnt=4; 5*100*4=2000 < 3100
    # so only the qty-1 row qualifies; part 2 is out of brand.
    lineitem = pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_quantity": pa.array([1.0, 10.0, 10.0, 10.0, 1.0]),
        "l_extendedprice": pa.array([3.5, 9.0, 9.0, 9.0, 2.0]),
    })
    out = small_qty_revenue(
        rd.from_arrow(lineitem).repartition(3), part, brand="Brand#4"
    )
    assert out["total_price_u2"][0].as_py() == 350
    assert out["n_items"][0].as_py() == 1


def test_product_profit_nation_year_grid(ray_session):
    import ray.data as rd

    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"]),
        "p_retailprice": pa.array([2.0, 9.0]),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["NATION_0", "NATION_1"]),
    })
    lineitem = pa.table({
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1], pa.int64()),
        "l_shipdate": _ts(["1995-03-01", "1996-07-02", "1995-01-01"]),
        "l_quantity": pa.array([2.0, 1.0, 3.0]),
        "l_extendedprice": pa.array([10.0, 5.0, 27.0]),
        "l_discount": pa.array([0.05, 0.0, 0.0]),
    })
    out = product_profit(
        rd.from_arrow(lineitem).repartition(2), part, supplier, nation,
        token="red",
    ).to_pandas().set_index(["nation", "o_year"])
    # s1/1995: 1000*95 - 200*200 = 55000; s2/1996: 500*100 - 200*100 = 30000
    assert out.loc[("NATION_0", 1995), "amount_u4"] == 55000
    assert out.loc[("NATION_1", 1996), "amount_u4"] == 30000
    assert len(out) == 2


def test_surplus_suppliers_correlated_window(ray_session):
    import ray.data as rd

    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["red ring", "blue bolt"]),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"]),
        "s_nationkey": pa.array([0, 0, 1], pa.int32()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["NATION_0", "NATION_1"]),
    })
    # s1: 30 in 1997 vs 20 elsewhere -> 2*30 > 50 keep;
    # s2: 10 in 1997 vs 30 elsewhere -> drop; s3 ships only part 2.
    lineitem = pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_shipdate": _ts(["1997-05-01", "1996-01-01", "1997-02-01",
                           "1998-03-01", "1997-06-01"]),
        "l_quantity": pa.array([30.0, 20.0, 10.0, 30.0, 99.0]),
    })
    out = surplus_suppliers(
        rd.from_arrow(lineitem).repartition(2), part, supplier, nation,
        prefix="red", year=1997, mult=2,
    )
    assert out["s_suppkey"].to_pylist() == [1]
    assert out["s_name"].to_pylist() == ["S1"]
    assert out["win_qty_u2"].to_pylist() == [3000]
    assert out["tot_qty_u2"].to_pylist() == [5000]
