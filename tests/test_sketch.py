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


def test_mg_guarantee_zipf_universe_much_larger_than_capacity():
    """Misra-Gries bound on a skewed stream: every key with true count
    > n/(m+1) survives compression, and estimates undercount by at most
    n/(m+1) — with a key universe 100x the summary capacity."""
    from fastcdc_rs_ray.stages.sketch import mg_compress, mg_merge

    rng = np.random.default_rng(3)
    m = 64
    # zipf-ish: a few planted heavy keys over a big uniform universe
    heavy = np.repeat(np.arange(10, dtype=np.int64), 2000)          # 10 x 2000
    tail = rng.integers(100, 6500, size=30_000).astype(np.int64)    # ~6400 keys
    stream = np.concatenate([heavy, tail])
    rng.shuffle(stream)
    n = len(stream)

    # simulate distributed blocks: 16 partial summaries merged pairwise
    mk = np.empty(0, np.int64)
    mc = np.empty(0, np.int64)
    for blk in np.array_split(stream, 16):
        uk, cnt = np.unique(blk, return_counts=True)
        uk, cnt = mg_compress(uk, cnt.astype(np.int64), m)
        mk, mc = mg_merge(mk, mc, uk, cnt, m)
    assert len(mk) <= m
    bound = n / (m + 1)
    true_k, true_c = np.unique(stream, return_counts=True)
    must_survive = true_k[true_c > bound]
    assert set(must_survive).issubset(set(mk.tolist()))
    # all 10 planted heavies clear the bound and survive
    assert set(range(10)).issubset(set(mk.tolist()))
    # estimate error bound
    est = dict(zip(mk.tolist(), mc.tolist()))
    true = dict(zip(true_k.tolist(), true_c.tolist()))
    for kk, ee in est.items():
        assert 0 < ee <= true[kk]
        assert true[kk] - ee <= bound


def test_heavy_hitters_exact_matches_full_count(ray_session):
    """Second-pass recount makes the output exact whenever the k-th key
    clears the MG bar — compare against a brute-force count, with summary
    capacity far below the distinct universe."""
    import ray.data as rd

    from fastcdc_rs_ray.stages.sketch import heavy_hitters_exact

    rng = np.random.default_rng(11)
    heavy = np.repeat(np.arange(5, dtype=np.int64) + 1000, 500)
    tail = rng.integers(0, 900, size=8000).astype(np.int64)
    stream = np.concatenate([heavy, tail])
    rng.shuffle(stream)
    ds = rd.from_arrow(pa.table({"user_id": pa.array(stream, pa.int64())})).repartition(8)
    got = heavy_hitters_exact(ds, key="user_id", k=5, m=64).to_pandas()
    uk, cnt = np.unique(stream, return_counts=True)
    order = np.lexsort((uk, -cnt))[:5]
    assert list(got["user_id"]) == list(uk[order])
    assert list(got["n_events"]) == list(cnt[order])


def test_ndv_grouped_sketch(ray_session):
    import duckdb
    import ray.data as rd

    from fastcdc_rs_ray.stages.sketch import ndv_grouped_sketch

    exact = duckdb.sql(
        f"""SELECT event_type, COUNT(DISTINCT user_id) AS n
            FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_type", "user_id"])
    got1 = ndv_grouped_sketch(ds.repartition(1))
    got7 = ndv_grouped_sketch(ds.repartition(7))
    # exact-merge determinism: identical estimates at any block count
    assert got1.equals(got7)
    est = dict(zip(got7["event_type"].to_pylist(),
                   got7["ndv_estimate"].to_pylist()))
    assert sorted(est) == [g for g, _ in exact]
    for g, n in exact:
        assert abs(est[g] - n) / n < 0.05, (g, n, est[g])


def test_freq_cms(ray_session):
    import duckdb
    import ray.data as rd

    from fastcdc_rs_ray.stages.sketch import CMS_W, freq_cms

    n_total, = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/events.parquet'").fetchone()
    exact = dict(duckdb.sql(
        f"""SELECT user_id, count(*) FROM '{SF_DIR}/events.parquet'
            WHERE user_id < 10 GROUP BY 1""").fetchall())

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    probes = np.arange(10, dtype=np.int64)
    got1 = freq_cms(ds.repartition(1), "user_id", probes)
    got7 = freq_cms(ds.repartition(7), "user_id", probes)
    assert got1.equals(got7)  # exact add-merge: block-count invariant
    est = dict(zip(got7["user_id"].to_pylist(), got7["est_count"].to_pylist()))
    for u in range(10):
        t = exact.get(u, 0)
        assert est[u] >= t
        assert est[u] - t <= max(4, 2 * n_total // CMS_W), (u, t, est[u])
