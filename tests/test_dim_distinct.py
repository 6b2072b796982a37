"""Broadcast dimension join rollup + distributed COUNT DISTINCT —
hand-computed oracles on crafted frames, with pairs duplicated across
blocks to exercise the cross-block distinct."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.aggregate import region_customer_stats
from fastcdc_rs_ray.stages.sessions import distinct_users_per_type


def test_region_rollup_crafted(ray_session):
    import ray.data as rd

    nation = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int32()),
            "n_name": pa.array(["N0", "N1", "N2"], pa.string()),
            "n_regionkey": pa.array([0, 0, 1], pa.int32()),
        }
    )
    region = pa.table(
        {
            "r_regionkey": pa.array([0, 1, 2], pa.int32()),
            "r_name": pa.array(["R0", "R1", "R2-empty"], pa.string()),
        }
    )
    customer = pa.table(
        {
            "c_nationkey": pa.array([0, 1, 1, 2], pa.int32()),
            "c_acctbal": pa.array([10.00, 20.00, 30.00, 5.50]),
        }
    )
    t = region_customer_stats(rd.from_arrow(customer), nation, region)
    got = dict(zip(t["r_name"].to_pylist(),
                   zip(t["n_customers"].to_pylist(), t["sum_acctbal_c"].to_pylist())))
    # R0 = nations 0,1 -> 3 customers, 6000 cents; R1 = nation 2; R2 absent
    assert got == {"R0": (3, 6000), "R1": (1, 550)}


def test_distinct_users_cross_block(ray_session):
    import ray.data as rd

    # user 1 fires type 'a' many times spread over blocks: must count once
    events = pa.table(
        {
            "event_type": pa.array(["a"] * 6 + ["b", "b", "a"], pa.string()),
            "user_id": pa.array([1, 1, 1, 2, 2, 3, 1, 1, 4], pa.int64()),
        }
    )
    ds = rd.from_arrow(events).repartition(3)
    t = distinct_users_per_type(ds, num_partitions=4)
    got = dict(zip(t["event_type"].to_pylist(), t["n_users"].to_pylist()))
    assert got == {"a": 4, "b": 1}
