"""Fault-injection: a map task that CRASHES on its first attempt must be
retried by Ray and produce bit-identical results — the determinism claims
(retry-stable sampling, partition-invariant aggregates) only matter if
the engine actually survives task failure.

The injected fault is a hard process kill (os._exit), not a Python
exception — exercising Ray's worker-crash retry path, which is what a
real cluster sees (OOM-killed worker, node loss)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _marker(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("fault")
    return os.path.join(d, "crashed_once")


def test_map_batches_survives_worker_crash_bit_identical(
        ray_session, tmp_path_factory):
    import numpy as np
    import ray.data as rd

    marker = _marker(tmp_path_factory)

    def flaky(t: pa.Table) -> pa.Table:
        ids = t["x"].to_numpy(zero_copy_only=False)
        # exactly one block carries x == 7; its FIRST attempt dies hard
        if 7 in ids and not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            os._exit(1)  # simulate OOM-kill / node loss
        return pa.table({"x": t["x"],
                         "y": pa.array(ids * 3 + 1, pa.int64())})

    ds = rd.from_arrow(pa.table({"x": pa.array(range(64), pa.int64())}))
    out = ds.repartition(8).map_batches(
        flaky, batch_format="pyarrow"
    ).to_pandas().sort_values("x").reset_index(drop=True)

    assert os.path.exists(marker), "fault was never injected"
    assert len(out) == 64
    assert (out.y == out.x * 3 + 1).all()


def test_keyed_exchange_survives_crash_and_matches_clean_run(
        ray_session, tmp_path_factory):
    """Crash inside the post-shuffle reduce: the retried partition must
    re-reduce to the same per-key minima as a clean run (first-wins dedup
    semantics are retry-safe because the reduce is idempotent)."""
    import numpy as np
    import ray.data as rd

    marker = _marker(tmp_path_factory)
    t = pa.table({
        "k": pa.array([i % 10 for i in range(200)], pa.int64()),
        "v": pa.array(range(200), pa.int64()),
    })

    def make_reduce(crash: bool):
        def reduce(tb: pa.Table) -> pa.Table:
            k = tb["k"].to_numpy(zero_copy_only=False)
            v = tb["v"].to_numpy(zero_copy_only=False)
            if crash and 3 in k and not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("x")
                os._exit(1)
            uk = np.unique(k)
            mins = np.array([v[k == kk].min() for kk in uk])
            return pa.table({"k": pa.array(uk, pa.int64()),
                             "v": pa.array(mins, pa.int64())})
        return reduce

    def run(crash: bool):
        ds = rd.from_arrow(t).repartition(num_blocks=4, keys=["k"])
        return ds.map_batches(
            make_reduce(crash), batch_format="pyarrow", batch_size=None
        ).to_pandas().sort_values("k").reset_index(drop=True)

    clean = run(crash=False)
    faulted = run(crash=True)
    assert os.path.exists(marker), "fault was never injected"
    assert clean.equals(faulted)
