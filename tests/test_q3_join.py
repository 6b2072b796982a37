"""order_revenue_topk (Q3-shape three-table join): hand-computed oracle on
crafted frames — inner-join semantics through the tag-union exchange, exact
integer revenue units, deterministic tie-break at the k boundary, and the
empty-segment degenerate case."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.joins import Q3_CUTOFF, Q3_SEGMENT, order_revenue_topk

TS = pa.timestamp("us")


def _ts(day: str):
    return np.datetime64(day, "us").astype("datetime64[us]")


def _tables():
    customer = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_mktsegment": pa.array(
                [Q3_SEGMENT, "MACHINERY", Q3_SEGMENT, Q3_SEGMENT], pa.string()
            ),
        }
    )
    # o1/o2/o3 owned by segment customers; o2 is dated after the cutoff
    # (excluded); o4 belongs to a non-segment customer (excluded);
    # o5 has no post-cutoff lineitems (inner join drops it)
    orders = pa.table(
        {
            "o_orderkey": pa.array([10, 20, 30, 40, 50], pa.int64()),
            "o_custkey": pa.array([1, 3, 3, 2, 4], pa.int64()),
            "o_orderdate": pa.array(
                [_ts("1997-01-01"), _ts("1999-01-01"), _ts("1998-01-01"),
                 _ts("1997-06-01"), _ts("1997-03-01")],
                TS,
            ),
            "o_orderpriority": pa.array(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW", "5-LOW"], pa.string()
            ),
        }
    )
    # revenue_u4 = round(price*100) * (100 - round(disc*100))
    # order 10: 100.00 @ 10% + 50.00 @ 0%  -> 10000*90 + 5000*100 = 1_400_000
    # order 30: 140.00 @ 0%                -> 14000*100          = 1_400_000
    #   (exact tie with order 10 -> broken by ascending orderkey)
    # order 20: would be biggest but its order is post-cutoff
    # order 50: lineitem shipped BEFORE cutoff -> filtered out
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([10, 10, 30, 20, 50], pa.int64()),
            "l_extendedprice": pa.array([100.0, 50.0, 140.0, 999.0, 10.0]),
            "l_discount": pa.array([0.10, 0.0, 0.0, 0.0, 0.0]),
            "l_shipdate": pa.array(
                [_ts("1998-07-01"), _ts("1998-08-01"), _ts("1998-09-01"),
                 _ts("1998-07-15"), _ts("1998-01-01")],
                TS,
            ),
        }
    )
    return customer, orders, lineitem


def test_q3_crafted_oracle(ray_session):
    import ray.data as rd

    customer, orders, lineitem = _tables()
    out = order_revenue_topk(
        rd.from_arrow(customer), rd.from_arrow(orders), rd.from_arrow(lineitem),
        k=10, num_partitions=4,
    )
    assert out["l_orderkey"].to_pylist() == [10, 30]  # tie -> orderkey asc
    assert out["revenue_u4"].to_pylist() == [1_400_000, 1_400_000]
    assert out["o_orderpriority"].to_pylist() == ["1-URGENT", "3-MEDIUM"]
    assert out.schema.field("o_orderdate").type == TS


def test_q3_k_truncates(ray_session):
    import ray.data as rd

    customer, orders, lineitem = _tables()
    out = order_revenue_topk(
        rd.from_arrow(customer), rd.from_arrow(orders), rd.from_arrow(lineitem),
        k=1, num_partitions=4,
    )
    assert out["l_orderkey"].to_pylist() == [10]


def test_q3_empty_segment(ray_session):
    import ray.data as rd

    customer, orders, lineitem = _tables()
    out = order_revenue_topk(
        rd.from_arrow(customer), rd.from_arrow(orders), rd.from_arrow(lineitem),
        segment="NO-SUCH-SEGMENT", num_partitions=4,
    )
    assert len(out) == 0
    assert out.schema.names == [
        "l_orderkey", "o_orderdate", "o_orderpriority", "revenue_u4"
    ]
