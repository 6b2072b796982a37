"""Wide-aggregation patterns: Q1-style partial+combine groupby and the
broadcast range join, vs local pandas ground truth (exact integer units —
results must be bit-identical regardless of partitioning)."""

from __future__ import annotations

import numpy as np
import pandas as pd
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
