"""value_dispersion: grouped VAR_SAMP / COVAR_SAMP via exact integer
sufficient statistics — checked against the DuckDB oracle SQL and pinned
partition-invariant (the whole point of the exact-int discipline)."""

from __future__ import annotations

import duckdb

from fastcdc_rs_ray.stages.aggregate import VALUE_DISPERSION_SQL, value_dispersion

SF_DIR = "/root/testdata/sf0.001"


def _oracle():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    return (
        con.execute(VALUE_DISPERSION_SQL)
        .df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def _run(n_blocks: int):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value", "ts"]
    ).repartition(n_blocks)
    return (
        value_dispersion(ds)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def test_value_dispersion_matches_duckdb(ray_session):
    import pandas as pd

    want = _oracle()
    got = _run(4)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_value_dispersion_partition_invariant(ray_session):
    import pandas as pd

    a = _run(1)
    b = _run(7)
    pd.testing.assert_frame_equal(a, b)
    # variance must be positive on real data; covariance finite
    assert (a["var_c2"] > 0).all()
    assert (a["n"] >= 2).all()
