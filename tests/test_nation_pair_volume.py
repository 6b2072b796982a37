"""Hand-computed oracle for the Q7-shape nation-pair volume rollup
(group attributes from both sides of a wide-wide join); the DuckDB gate
covers sf-scale via tools/verify_queries.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.aggregate import (
    local_supplier_volume,
    nation_pair_volume,
)

US_DAY = 86_400_000_000


def _ts(days):
    return pa.array(np.asarray(days, np.int64) * US_DAY, pa.timestamp("us"))


def test_nation_pair_volume_semantics(ray_session):
    import ray.data as rd

    # nations 0 (US), 1 (FR); customers c1->US, c2->FR; suppliers s1->FR,
    # s2->US
    customer = pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([0, 1], pa.int64()),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([1, 0], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["US", "FR"]),
    })
    orders = pa.table({
        "o_orderkey": pa.array([10, 20], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
    })
    # order 10 (cust US): s1 ships twice in 1995 (FR->US merges), s2 once
    # in 1996 (US->US); order 20 (cust FR): s1 in 1995 (FR->FR)
    epoch = np.datetime64("1970-01-01")
    d1995 = int((np.datetime64("1995-06-01") - epoch).astype(int))
    d1996 = int((np.datetime64("1996-02-01") - epoch).astype(int))
    lineitem = pa.table({
        "l_orderkey": pa.array([10, 10, 10, 20], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 1], pa.int64()),
        "l_shipdate": _ts([d1995, d1995 + 1, d1996, d1995]),
        "l_extendedprice": pa.array([10.0, 20.0, 5.0, 7.0]),
        "l_discount": pa.array([0.0, 0.1, 0.0, 0.05]),
    })
    out = nation_pair_volume(
        rd.from_arrow(orders).repartition(2),
        rd.from_arrow(lineitem).repartition(3),
        customer, supplier, nation, num_partitions=2,
    ).to_pandas().set_index(["supp_nation", "cust_nation", "l_year"])
    # u4 units: round(price*100) * (100 - round(disc*100))
    assert out.loc[("FR", "US", 1995)].tolist() == [2, 1000 * 100 + 2000 * 90]
    assert out.loc[("US", "US", 1996)].tolist() == [1, 500 * 100]
    assert out.loc[("FR", "FR", 1995)].tolist() == [1, 700 * 95]
    assert len(out) == 3


def test_local_supplier_volume_is_diagonal(ray_session):
    import ray.data as rd

    customer = pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([0, 1], pa.int64()),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([1, 0], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["US", "FR"]),
    })
    orders = pa.table({
        "o_orderkey": pa.array([10, 20], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
    })
    epoch = np.datetime64("1970-01-01")
    d1995 = int((np.datetime64("1995-06-01") - epoch).astype(int))
    d1996 = int((np.datetime64("1996-02-01") - epoch).astype(int))
    lineitem = pa.table({
        "l_orderkey": pa.array([10, 10, 10, 20], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 1], pa.int64()),
        "l_shipdate": _ts([d1995, d1995 + 1, d1996, d1995]),
        "l_extendedprice": pa.array([10.0, 20.0, 5.0, 7.0]),
        "l_discount": pa.array([0.0, 0.1, 0.0, 0.05]),
    })
    out = local_supplier_volume(
        rd.from_arrow(orders).repartition(2),
        rd.from_arrow(lineitem).repartition(3),
        customer, supplier, nation, num_partitions=2,
    ).to_pandas().set_index(["nation", "l_year"])
    # only the same-nation pairs survive: US-US 1996 and FR-FR 1995
    assert out.loc[("US", 1996)].tolist() == [1, 500 * 100]
    assert out.loc[("FR", 1995)].tolist() == [1, 700 * 95]
    assert len(out) == 2
