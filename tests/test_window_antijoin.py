"""Window-function stage (running sum + LAG delta) and distributed
anti-join vs local pandas references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from fastcdc_rs_ray.stages.joins import anti_join
from fastcdc_rs_ray.stages.sessions import running_totals

SF_DIR = "/root/testdata/sf0.001"


def test_running_totals_matches_pandas(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    df = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).to_pandas()
    df["value_c"] = (df["value"] * 100).round().astype("int64")
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    df["run_c"] = df.groupby("user_id")["value_c"].cumsum()
    df["delta_c"] = df.groupby("user_id")["value_c"].diff()

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    got = (
        running_totals(ds, num_partitions=4)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["event_id"] == want["event_id"]).all()
    assert (got["value_c"] == want["value_c"]).all()
    assert (got["run_c"] == want["run_c"]).all()
    # LAG: NULL exactly on each user's first event, exact deltas elsewhere
    assert got["delta_c"].isna().equals(want["delta_c"].isna())
    ok = ~want["delta_c"].isna()
    assert (got.loc[ok, "delta_c"] == want.loc[ok, "delta_c"]).all()
    # users with >1 event actually accumulate
    assert (got["run_c"] > got["value_c"]).any()


def test_anti_join_small(ray_session):
    import ray.data as rd

    left = pa.table(
        {"k": pa.array([1, 2, 3, 4, 5], pa.int64()),
         "name": ["a", "b", "c", "d", "e"]}
    )
    right = pa.table({"rk": pa.array([2, 2, 4, 9], pa.int64())})
    out = anti_join(
        rd.from_arrow(left), rd.from_arrow(right),
        left_key="k", right_key="rk", keep_cols=["k", "name"],
        num_partitions=2,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [1, 3, 5]
    assert list(out["name"]) == ["a", "c", "e"]


def test_anti_join_all_matched_empty(ray_session):
    import ray.data as rd

    left = pa.table({"k": pa.array([1, 2], pa.int64()), "name": ["a", "b"]})
    right = pa.table({"rk": pa.array([1, 2], pa.int64())})
    out = anti_join(
        rd.from_arrow(left), rd.from_arrow(right),
        left_key="k", right_key="rk", keep_cols=["k", "name"],
        num_partitions=2,
    ).to_pandas()
    assert len(out) == 0


def test_anti_join_customers_vs_duckdb(ray_session):
    import duckdb
    import pyarrow.compute as pc
    import ray.data as rd

    con = duckdb.connect()
    want = con.execute(
        f"""SELECT c_custkey FROM '{SF_DIR}/customer.parquet'
            WHERE c_custkey NOT IN (
              SELECT o_custkey FROM '{SF_DIR}/orders.parquet'
              WHERE o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""
    ).fetchdf()
    customer = rd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    orders = rd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    )
    got = anti_join(
        customer, orders, left_key="c_custkey", right_key="o_custkey",
        keep_cols=["c_custkey", "c_name", "c_acctbal"], num_partitions=4,
    ).to_pandas().sort_values("c_custkey").reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["c_custkey"].to_numpy() == want["c_custkey"].to_numpy()).all()
