"""As-of join operator: per-key latest-at-or-before matching, inner
semantics, verified against a hand-computed oracle on crafted frames and
against sessionization on the real events table."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.joins import asof_join

SF_DIR = "/root/testdata/sf0.001"


def test_asof_crafted_edges(ray_session):
    import ray.data as rd

    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "ts": pa.array([5, 10, 20, 7, 3, 9], pa.int64()),
            "val": pa.array(["a", "b", "c", "d", "e", "f"], pa.string()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "rts": pa.array([5, 15, 6], pa.int64()),
            "tag": pa.array(["x5", "x15", "y6"], pa.string()),
        }
    )
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        key="k", left_ts="ts", right_ts="rts", right_cols=["tag"],
        num_partitions=2,
    ).take_all()
    got = sorted((r["k"], r["ts"], r["val"], r["tag"]) for r in out)
    # k=1: ts=5 ties rts=5 (>= matches), ts=10 -> x5, ts=20 -> x15
    # k=2: ts=7 -> y6; ts=3 has no prior row -> dropped (inner)
    # k=3: no right rows -> dropped
    assert got == [
        (1, 5, "a", "x5"),
        (1, 10, "b", "x5"),
        (1, 20, "c", "x15"),
        (2, 7, "d", "y6"),
    ]


def test_asof_events_to_sessions_total_and_consistent(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.sessions import sessionize

    events = rd.read_parquet(f"{SF_DIR}/events.parquet",
                             columns=["event_id", "user_id", "ts"])
    sessions = sessionize(
        rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"]),
        num_partitions=4,
    ).materialize()
    n_events = rd.read_parquet(f"{SF_DIR}/events.parquet").count()
    out = asof_join(events, sessions, key="user_id", left_ts="ts",
                    right_ts="start_ts", right_cols=["session_id", "n_events"],
                    num_partitions=4).take_all()
    # every event starts at-or-after its session start -> total join
    assert len(out) == n_events
    # per-session event counts from the join equal the session's n_events
    from collections import Counter

    per = Counter((r["user_id"], r["session_id"]) for r in out)
    declared = {(r["user_id"], r["session_id"]): r["n_events"] for r in out}
    assert all(per[ks] == declared[ks] for ks in per)
