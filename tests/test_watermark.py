"""watermark_windows: late classification on a crafted arrival sequence —
the candidate-chain prefix-max must equal a sequential replay."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.watermark import watermark_windows

US = 1_000_000


def test_watermark_replay_equivalence(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(31)
    n = 4000
    base = np.datetime64("2024-05-01T00:00:00", "us").astype(np.int64)
    # arrival i carries event time ~ i seconds with heavy-tailed backdating:
    # some events arrive hours after their event time -> genuinely late
    ts = base + np.arange(n) * US - (
        rng.pareto(1.5, n) * 60 * US).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(ts.view("datetime64[us]")),
    })
    path = str(tmp_path / "ev.parquet")
    pq.write_table(t, path)

    window_us, lateness_us = 3_600_000_000, 600_000_000
    out = watermark_windows(
        rd.read_parquet(path).repartition(11),
        window_us=window_us, lateness_us=lateness_us,
    ).to_pandas().sort_values("win").reset_index(drop=True)

    # sequential replay reference
    wm = np.maximum.accumulate(ts)
    late = ts < wm - lateness_us
    win = ts // window_us
    import collections
    ref = collections.Counter()
    for w, l in zip(win, late):
        ref[(int(w), bool(l))] += 1
    assert late.sum() > 20  # the corpus really has late arrivals
    for _, row in out.iterrows():
        assert row["n_late"] == ref[(row["win"], True)]
        assert row["n_on_time"] == ref[(row["win"], False)]
    assert out["n_late"].sum() == late.sum()
    assert (out["n_on_time"].sum() + out["n_late"].sum()) == n
