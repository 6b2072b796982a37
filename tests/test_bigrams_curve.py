"""user_event_bigrams + new_users_curve: pandas-replica equality on a
multi-day synthetic log, partition invariance, and edge semantics (single-
event users emit no bigram; a user's first day counts once even when their
events span many blocks)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from fastcdc_rs_ray.stages.sessions import new_users_curve, user_event_bigrams

US = 1_000_000
DAY_US = 86_400_000_000


def _synth_events(n_users=60, n_events=900, seed=7) -> pa.Table:
    rng = np.random.default_rng(seed)
    uid = rng.integers(0, n_users, n_events).astype(np.int64)
    base = np.datetime64("2024-03-01T00:00:00", "us").astype(np.int64)
    ts = base + rng.integers(0, 9 * DAY_US, n_events)
    # exact-tie timestamps to exercise the event_id tie-break
    ts[10] = ts[11]
    uid[10] = uid[11]
    et = np.array(["signup", "click", "purchase", "error"])[
        rng.integers(0, 4, n_events)
    ]
    # one single-event user far out of range: no bigram, new user on its day
    uid[0] = n_users + 5
    return pa.table(
        {
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "ts": pa.array(ts.view("datetime64[us]")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
        }
    )


def _bigrams_pd(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["next_type"] = df.groupby("user_id")["event_type"].shift(-1)
    out = (
        df.dropna(subset=["next_type"])
        .groupby(["event_type", "next_type"])
        .size()
        .reset_index(name="n_pairs")
        .rename(columns={"event_type": "prev_type"})
    )
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def _curve_pd(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    day = (df["ts"].astype("int64") // DAY_US).astype("int64")
    first = day.groupby(df["user_id"]).min()
    nu = first.value_counts().sort_index()
    return pd.DataFrame(
        {"day": nu.index.astype("int64"), "new_users": nu.values.astype("int64"),
         "cum_users": nu.cumsum().values.astype("int64")}
    )


def test_bigrams_matches_pandas(ray_session):
    import ray.data as rd

    t = _synth_events()
    for nparts in (1, 7):
        got = (
            user_event_bigrams(rd.from_arrow(t), num_partitions=nparts)
            .to_pandas()
            .sort_values(["prev_type", "next_type"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, _bigrams_pd(t), check_dtype=False)


def test_bigrams_total_is_rows_minus_users(ray_session):
    import ray.data as rd

    t = _synth_events()
    got = user_event_bigrams(rd.from_arrow(t), num_partitions=4)
    n_users = len(np.unique(t["user_id"].to_numpy()))
    assert got["n_pairs"].combine_chunks().to_numpy().sum() == len(t) - n_users


def test_new_users_curve_matches_pandas(ray_session):
    import ray.data as rd

    t = _synth_events()
    for nparts in (1, 5):
        got = new_users_curve(rd.from_arrow(t), num_partitions=nparts).to_pandas()
        pd.testing.assert_frame_equal(got, _curve_pd(t), check_dtype=False)
    # the curve ends at the distinct-user total and is monotone
    cum = got["cum_users"].to_numpy()
    assert cum[-1] == len(np.unique(t["user_id"].to_numpy()))
    assert (np.diff(cum) > 0).all()
