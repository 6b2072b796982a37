"""Wide-aggregation patterns: Q1-style partial+combine groupby and the
broadcast range join, vs local pandas ground truth (exact integer units —
results must be bit-identical regardless of partitioning)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.aggregate import (
    QUANTITY_BANDS,
    pricing_summary,
    quantity_band_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _lineitem_df():
    return pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()


def test_pricing_summary_matches_pandas(ray_session):
    import ray.data as rd

    df = _lineitem_df()
    for c, u in (("l_quantity", "qty_c"), ("l_extendedprice", "price_c"),
                 ("l_discount", "disc_c"), ("l_tax", "tax_c")):
        df[u] = np.round(df[c] * 100).astype(np.int64)
    df["disc_price_u4"] = df["price_c"] * (100 - df["disc_c"])
    df["charge_u6"] = df["disc_price_u4"] * (100 + df["tax_c"])
    want = (
        df.groupby(["l_returnflag", "l_linestatus"])
        .agg(
            count_order=("qty_c", "size"),
            sum_qty_c=("qty_c", "sum"),
            sum_price_c=("price_c", "sum"),
            sum_disc_c=("disc_c", "sum"),
            sum_disc_price_u4=("disc_price_u4", "sum"),
            sum_charge_u6=("charge_u6", "sum"),
        )
        .reset_index()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    ds = rd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    got = (
        pricing_summary(ds, num_partitions=3)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_quantity_bands_matches_pandas(ray_session):
    import ray.data as rd

    df = _lineitem_df()
    lo = np.array([b[0] for b in QUANTITY_BANDS])
    labels = [b[2] for b in QUANTITY_BANDS]
    idx = np.searchsorted(lo, df["l_quantity"].to_numpy(), side="right") - 1
    df["band"] = [labels[i] for i in idx]
    df["price_c"] = np.round(df["l_extendedprice"] * 100).astype(np.int64)
    want = (
        df.groupby("band")
        .agg(n=("price_c", "size"), sum_price_c=("price_c", "sum"))
        .reset_index()
        .sort_values("band")
        .reset_index(drop=True)
    )
    ds = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    got = (
        quantity_band_counts(ds)
        .to_pandas()
        .sort_values("band")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_promo_revenue_crafted(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.aggregate import promo_revenue_by_month

    part = pa.table(
        {
            "p_partkey": pa.array([0, 1, 2], pa.int64()),
            "p_type": pa.array(["PROMO", "SMALL", "PROMO"], pa.string()),
        }
    )
    ts = pa.timestamp("us")
    li = pa.table(
        {
            "l_partkey": pa.array([0, 1, 2, 1], pa.int64()),
            "l_extendedprice": pa.array([10.00, 20.00, 5.00, 1.00]),
            "l_discount": pa.array([0.10, 0.0, 0.0, 0.0]),
            "l_shipdate": pa.array(
                np.array(
                    ["1998-01-15", "1998-01-31", "1998-02-01", "1998-02-28"],
                    dtype="datetime64[us]",
                ),
                ts,
            ),
        }
    )
    t = promo_revenue_by_month(rd.from_arrow(li), part)
    months = [str(m)[:7] for m in t["month"].to_pylist()]
    assert months == ["1998-01", "1998-02"]
    # jan: promo = 1000*90 = 90000, total = 90000 + 2000*100 = 290000
    # feb: promo = 500*100 = 50000, total = 50000 + 100*100 = 60000
    assert t["promo_rev_u4"].to_pylist() == [90_000, 50_000]
    assert t["total_rev_u4"].to_pylist() == [290_000, 60_000]


def test_supplier_nation_revenue_crafted(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.aggregate import supplier_nation_revenue

    supplier = pa.table(
        {
            "s_suppkey": pa.array([0, 1, 2], pa.int64()),
            "s_nationkey": pa.array([7, 7, 3], pa.int32()),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([3, 7], pa.int32()),
            "n_name": pa.array(["N3", "N7"], pa.string()),
        }
    )
    li = pa.table(
        {
            "l_suppkey": pa.array([0, 1, 2, 0], pa.int64()),
            "l_extendedprice": pa.array([1.00, 2.00, 3.00, 4.00]),
            "l_discount": pa.array([0.0, 0.0, 0.50, 0.0]),
        }
    )
    t = supplier_nation_revenue(rd.from_arrow(li), supplier, nation)
    got = dict(zip(t["n_name"].to_pylist(),
                   zip(t["n_items"].to_pylist(), t["revenue_u4"].to_pylist())))
    # N7: supp 0,1 -> items 3, rev = 100*100 + 200*100 + 400*100 = 70000
    # N3: supp 2 -> rev = 300*50 = 15000
    assert got == {"N7": (3, 70_000), "N3": (1, 15_000)}


def test_pricing_rollup_levels(ray_session):
    """All three ROLLUP levels present and internally consistent: leaf
    rows sum to their flag subtotal, subtotals sum to the grand total."""
    import ray.data as rd

    from fastcdc_rs_ray.stages.aggregate import pricing_rollup

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    df = pricing_rollup(ds, num_partitions=4).to_pandas()
    leaf = df[df.l_linestatus.notna()]
    sub = df[df.l_returnflag.notna() & df.l_linestatus.isna()]
    total = df[df.l_returnflag.isna()]
    assert len(total) == 1 and total.l_linestatus.isna().all()
    assert len(sub) == leaf.l_returnflag.nunique()
    for flag, g in leaf.groupby("l_returnflag"):
        row = sub[sub.l_returnflag == flag]
        assert int(g.count_order.sum()) == int(row.count_order.iloc[0])
        assert int(g.sum_qty_c.sum()) == int(row.sum_qty_c.iloc[0])
    assert int(sub.count_order.sum()) == int(total.count_order.iloc[0])
    assert int(sub.sum_qty_c.sum()) == int(total.sum_qty_c.iloc[0])
