"""funnel_conversions: sentinel/merge semantics on a crafted event log —
non-converters, purchase-before-signup, exact-tie ts (strictly-after rule),
purchase-only users, multi-block user splits."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.funnel import funnel_conversions

US = 1_000_000


def _events(tmp_path):
    base = np.datetime64("2024-03-01T00:00:00", "us").astype(np.int64)
    day = 86_400_000_000
    rows = [
        # u1: converts (purchase after first signup), second signup later
        (1, base + 10 * US, "signup"), (1, base + 20 * US, "purchase"),
        (1, base + 30 * US, "signup"),
        # u2: purchase BEFORE signup only -> not converted
        (2, base + 5 * US, "purchase"), (2, base + 50 * US, "signup"),
        # u3: purchase at EXACTLY first-signup ts -> strictly-after, not conv
        (3, base + day + 7 * US, "signup"),
        (3, base + day + 7 * US, "purchase"),
        # u4: signup only, next day
        (4, base + day + 9 * US, "signup"),
        # u5: purchase only -> excluded entirely
        (5, base + 1 * US, "purchase"),
        # u6: noise event types only
        (6, base + 2 * US, "click"),
        # u7: converts on day 2 (events interleaved to span blocks)
        (7, base + day + 1 * US, "signup"), (7, base + day + 2 * US, "purchase"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            np.array([r[1] for r in rows], np.int64).view("datetime64[us]")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    path = str(tmp_path / "events.parquet")
    pq.write_table(t, path)
    return path


def test_funnel_semantics(ray_session, tmp_path):
    import ray.data as rd

    path = _events(tmp_path)
    # 1-row blocks force per-user partials to merge across blocks
    out = funnel_conversions(
        rd.read_parquet(path).repartition(12), num_partitions=4
    ).to_pandas().sort_values("signup_day").reset_index(drop=True)

    assert list(out["signup_day"].dt.strftime("%Y-%m-%d")) == [
        "2024-03-01", "2024-03-02"]
    # day 1: u1 (conv), u2 (not)   day 2: u3 (tie, not), u4 (not), u7 (conv)
    assert list(out["n_signup_users"]) == [2, 3]
    assert list(out["n_converted"]) == [1, 1]
