"""Q15 argmax-over-view, Q19 disjunctive predicate, LAG-over-rollup and
FIRST_VALUE shapes vs DuckDB.

top_supplier_revenue: max of a per-supplier aggregate + join-back, fact
table never shuffles.  special_revenue: OR-of-ANDs across a broadcast
part bitmask, no join/no shuffle.  monthly_revenue_growth: LAG window on
the tiny rollup.  first_event_type: per-user argmin by (ts, event_id)
through one keyed exchange with an idempotent combine.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.aggregate import (
    MONTHLY_REVENUE_GROWTH_SQL,
    SPECIAL_REVENUE_SQL,
    TOP_SUPPLIER_REVENUE_SQL,
    monthly_revenue_growth,
    special_revenue,
    top_supplier_revenue,
)
from fastcdc_rs_ray.stages.sessions import (
    FIRST_EVENT_TYPE_SQL,
    first_event_type,
)

SF_DIR = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("lineitem", "supplier", "part", "orders", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def test_top_supplier_revenue_matches_duckdb(ray_session):
    import ray.data as rd

    lineitem = rd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    supplier = pq.read_table(
        f"{SF_DIR}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    got = (
        top_supplier_revenue(lineitem, supplier)
        .to_pandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    want = (
        _oracle(TOP_SUPPLIER_REVENUE_SQL)
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    assert len(got) >= 1
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_special_revenue_matches_duckdb(ray_session):
    import ray.data as rd

    lineitem = rd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = pq.read_table(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    got = special_revenue(lineitem, part).to_pandas()
    want = _oracle(SPECIAL_REVENUE_SQL)
    assert int(got["n_items"][0]) > 0  # brackets must actually select rows
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_monthly_revenue_growth_matches_duckdb(ray_session):
    import ray.data as rd

    orders = rd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    got = (
        monthly_revenue_growth(orders)
        .to_pandas()
        .sort_values("month_us")
        .reset_index(drop=True)
    )
    want = (
        _oracle(MONTHLY_REVENUE_GROWTH_SQL)
        .sort_values("month_us")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # window identity: delta telescopes back to the monthly series
    assert (got["revenue_c"] - got["prev_revenue_c"] == got["delta_c"]).all()


def test_first_event_type_matches_duckdb(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    got = (
        first_event_type(ds, num_partitions=5)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(FIRST_EVENT_TYPE_SQL)
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_first_event_type_partition_invariant(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    a = (
        first_event_type(ds, num_partitions=2)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    b = (
        first_event_type(ds.repartition(13), num_partitions=7)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_value_quartiles_cont_matches_duckdb(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.sessions import (
        VALUE_QUARTILES_CONT_SQL,
        value_quartiles_cont,
    )

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    got = (
        value_quartiles_cont(ds)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = (
        _oracle(VALUE_QUARTILES_CONT_SQL)
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # interpolation sits between the straddling order statistics
    assert (got["p25_u4"] <= got["p50_u4"]).all()
    assert (got["p50_u4"] <= got["p75_u4"]).all()


def test_value_quartiles_cont_partition_invariant(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.sessions import value_quartiles_cont

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    a = value_quartiles_cont(ds).to_pandas().sort_values("event_type")
    b = value_quartiles_cont(ds.repartition(11)).to_pandas().sort_values(
        "event_type")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_login_streaks_matches_duckdb(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.sessions import (
        LOGIN_STREAKS_SQL,
        login_streaks,
    )

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"])
    got = (
        login_streaks(ds, num_partitions=5)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(LOGIN_STREAKS_SQL)
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert (got["longest_streak"] <= got["n_active_days"]).all()


def test_login_streaks_partition_invariant(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.sessions import login_streaks

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"])
    a = login_streaks(ds, num_partitions=3).to_pandas().sort_values("user_id")
    b = login_streaks(ds.repartition(9), num_partitions=6).to_pandas(
        ).sort_values("user_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
