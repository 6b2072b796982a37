"""HLL distinct-count sketch: accuracy vs exact, merge associativity /
split invariance, and the Dataset partial+merge path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fastcdc_rs_ray.stages.sketch import (
    hll_estimate,
    hll_merge,
    hll_registers,
    ndv_sketch,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hll_accuracy_ladder():
    for n in (1_000, 50_000, 500_000):
        est = hll_estimate(hll_registers(np.arange(n, dtype=np.int64)))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_duplicates_dont_inflate():
    keys = np.tile(np.arange(1_000, dtype=np.int64), 50)  # 50x duplicated
    est = hll_estimate(hll_registers(keys))
    assert abs(est - 1_000) / 1_000 < 0.05


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32), st.integers(1, 5_000), st.integers(1, 4_999))
def test_hll_split_invariant(seed, n, cut):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**63, size=n, dtype=np.int64)
    cut = cut % n if n else 0
    whole = hll_registers(keys)
    split = hll_merge(hll_registers(keys[:cut]), hll_registers(keys[cut:]))
    assert np.array_equal(whole, split)


def test_ndv_sketch_on_events(ray_session):
    import duckdb
    import ray.data as rd

    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    est = ndv_sketch(ds, key="user_id")["ndv_estimate"].to_pylist()[0]
    assert abs(est - exact) / exact < 0.05, (exact, est)
