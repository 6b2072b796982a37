"""Hand-computed oracle for the Q21-shape multi-correlated existence
join (waiting_suppliers): the EXISTS (another supplier) + NOT-EXISTS
(another late supplier) pair decided group-locally per order; the DuckDB
gate covers sf-scale via tools/verify_queries.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.joins import waiting_suppliers

US_DAY = 86_400_000_000


def _ts(days):
    return pa.array(np.asarray(days, np.int64) * US_DAY, pa.timestamp("us"))


def test_waiting_suppliers_semantics(ray_session):
    import ray.data as rd

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "O", "F", "F"]),
        "o_orderdate": _ts([0, 0, 0, 0, 0]),
    })
    # (orderkey, suppkey, shipdate-days)
    rows = [
        (1, 1, 100), (1, 1, 1), (1, 2, 1),   # s1 sole-late in F order 1
        (2, 2, 100), (2, 1, 1),              # s2 sole-late in F order 2
        (3, 1, 100), (3, 2, 1),              # order 3 not 'F' -> excluded
        (4, 1, 100),                          # single-supplier order -> excluded
        (5, 1, 100), (5, 3, 100),            # two late suppliers -> excluded
    ]
    ok, sk, ship = zip(*rows)
    lineitem = pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_shipdate": _ts(ship),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([3, 1, 2], pa.int64()),
        "s_name": pa.array(["C", "A", "B"]),
    })
    # 4 blocks so order 1's early/late s1 lines land in different source
    # blocks — exercises the cross-block MAX merge in the combine
    out = waiting_suppliers(
        rd.from_arrow(orders).repartition(2),
        rd.from_arrow(lineitem).repartition(4),
        supplier, late_days=60, num_partitions=2,
    )
    assert out.column("s_name").to_pylist() == ["A", "B"]
    assert out.column("numwait").to_pylist() == [1, 1]


def test_waiting_suppliers_empty(ray_session):
    import ray.data as rd

    orders = pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_orderstatus": pa.array(["O"]),
        "o_orderdate": _ts([0]),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_suppkey": pa.array([1], pa.int64()),
        "l_shipdate": _ts([100]),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["A"]),
    })
    out = waiting_suppliers(
        rd.from_arrow(orders), rd.from_arrow(lineitem), supplier,
        late_days=60, num_partitions=2,
    )
    assert len(out) == 0
