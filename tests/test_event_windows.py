"""Tumbling-window aggregate over the events table (partial + keyed
exchange + distributed combine) vs a local pandas groupby."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fastcdc_rs_ray.stages.sessions import WINDOW_US, event_windows

SF_DIR = "/root/testdata/sf0.001"


def test_event_windows_matches_pandas(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"])
    df = t.to_pandas()
    df["w_start"] = (
        df["ts"].astype("int64") // WINDOW_US * WINDOW_US
    )
    want = (
        df.groupby(["user_id", "w_start"])
        .agg(n_events=("value", "size"), total_value=("value", "sum"))
        .reset_index()
    )
    want["total_value"] = want["total_value"].round(6)

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"])
    got = (
        event_windows(ds, num_partitions=4)
        .to_pandas()
        .sort_values(["user_id", "w_start"])
        .reset_index(drop=True)
    )
    want = want.sort_values(["user_id", "w_start"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["user_id"] == want["user_id"]).all()
    assert (got["w_start"] == want["w_start"]).all()
    assert (got["n_events"] == want["n_events"]).all()
    assert np.allclose(got["total_value"], want["total_value"], atol=1e-6)
    # multiple windows per user exist (the op actually windows)
    assert got.groupby("user_id").size().max() > 1


def test_hopping_windows_matches_pandas(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from fastcdc_rs_ray.stages.sessions import HOP_US, hopping_windows

    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"])
    df = t.to_pandas()
    df["value_c"] = (df["value"] * 100).round().astype("int64")
    ts = df["ts"].astype("int64")
    k = WINDOW_US // HOP_US
    assert k == 4
    frames = []
    for i in range(k):
        g = df.copy()
        g["w_start"] = (ts // HOP_US) * HOP_US - i * HOP_US
        frames.append(g)
    expl = pd.concat(frames)
    want = (
        expl.groupby(["user_id", "w_start"])
        .agg(n_events=("value_c", "size"), total_c=("value_c", "sum"))
        .reset_index()
        .sort_values(["user_id", "w_start"])
        .reset_index(drop=True)
    )

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"])
    got = (
        hopping_windows(ds, num_partitions=4)
        .to_pandas()
        .sort_values(["user_id", "w_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("user_id", "w_start", "n_events", "total_c"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # overlap is real: hopping windows outnumber tumbling windows
    tumbling = event_windows(ds, num_partitions=4).count()
    assert len(got) > tumbling
