"""Hand-computed oracle for the cohort retention matrix; the DuckDB gate
covers sf-scale via tools/verify_queries.py (sf events span one month, so
the multi-month triangle is pinned here)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.sessions import cohort_retention


def _us(datestr: str) -> int:
    return int(np.datetime64(datestr).astype("datetime64[us]").astype(np.int64))


def test_cohort_retention_triangle(ray_session):
    import ray.data as rd

    # u1: Jan, Feb, Mar (two Jan events -> distinct); u2: Feb; u3: Jan, Mar
    rows = [
        (1, "2024-01-05"), (1, "2024-01-20"), (1, "2024-02-10"),
        (1, "2024-03-01"),
        (2, "2024-02-15"),
        (3, "2024-01-31"), (3, "2024-03-30"),
    ]
    uid, d = zip(*rows)
    events = pa.table({
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array([_us(x) for x in d], pa.timestamp("us")),
    })
    out = cohort_retention(
        rd.from_arrow(events).repartition(3), num_partitions=2
    ).to_pandas().set_index(["cohort_us", "month_us"])["n_users"]
    jan, feb, mar = _us("2024-01-01"), _us("2024-02-01"), _us("2024-03-01")
    assert out.loc[(jan, jan)] == 2          # u1 + u3 born in Jan
    assert out.loc[(jan, feb)] == 1          # only u1 retained in Feb
    assert out.loc[(jan, mar)] == 2          # u1 + u3 back in Mar
    assert out.loc[(feb, feb)] == 1          # u2's cohort
    assert len(out) == 4
