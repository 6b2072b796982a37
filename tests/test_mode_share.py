"""Grouped mode/argmax and ratio-to-report vs DuckDB.

favorite_event_type is the deterministic ROW_NUMBER-over-count-DESC shape
(total tie-break on the type string); nation_revenue_share is the
``SUM(x) OVER ()`` global-total window in exact integer cents (the fact
table never shuffles — broadcast dense dim map + bincount partials).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.aggregate import (
    NATION_REVENUE_SHARE_SQL,
    nation_revenue_share,
)
from fastcdc_rs_ray.stages.sessions import (
    FAVORITE_EVENT_TYPE_SQL,
    favorite_event_type,
)

SF_DIR = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def test_favorite_event_type_matches_duckdb(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"]
    )
    got = (
        favorite_event_type(ds, num_partitions=5)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(FAVORITE_EVENT_TYPE_SQL)
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_favorite_event_type_partition_invariant(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"]
    )
    frames = []
    for parts, blocks in ((1, None), (7, 13)):
        d = ds if blocks is None else ds.repartition(blocks)
        frames.append(
            favorite_event_type(d, num_partitions=parts)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_nation_revenue_share_matches_duckdb(ray_session):
    import ray.data as rd

    orders = rd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = pq.read_table(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{SF_DIR}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    got = (
        nation_revenue_share(orders.repartition(9), customer, nation)
        .to_pandas()
        .sort_values("nation")
        .reset_index(drop=True)
    )
    want = (
        _oracle(NATION_REVENUE_SHARE_SQL)
        .sort_values("nation")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the window really is global: one total, shares sum to ~10000 bp
    assert got["total_cents"].nunique() == 1
    assert 10000 - 25 <= got["share_bp"].sum() <= 10000
