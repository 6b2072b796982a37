"""Ordered string_agg (LISTAGG) and calendar-month rollup vs DuckDB.

Both shapes are new disciplines: user_event_paths is an order-sensitive
aggregate (no commutative partial exists — keyed exchange + per-block
ListArray binary_join); monthly_revenue is a calendar-unit bucket
(floor_temporal month, not fixed-width epoch arithmetic).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from fastcdc_rs_ray.stages.aggregate import MONTHLY_REVENUE_SQL, monthly_revenue
from fastcdc_rs_ray.stages.sessions import USER_EVENT_PATHS_SQL, user_event_paths

SF_DIR = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    return con.execute(sql).fetchdf()


def test_user_event_paths_matches_duckdb(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    got = (
        user_event_paths(ds, num_partitions=5)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(USER_EVENT_PATHS_SQL)
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_user_event_paths_partition_invariant(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    a = (
        user_event_paths(ds, num_partitions=1)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    b = (
        user_event_paths(ds, num_partitions=7)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_monthly_revenue_matches_duckdb(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    got = (
        monthly_revenue(ds)
        .to_pandas()
        .sort_values("month_us")
        .reset_index(drop=True)
    )
    want = (
        _oracle(MONTHLY_REVENUE_SQL).sort_values("month_us").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
