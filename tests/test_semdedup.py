"""semantic_dedup (SemDeDup-style): planted duplicate embeddings are
dropped to the min-id representative; distinct vectors survive; the
decision is invariant to block layout."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.semdedup import semantic_dedup


def _table(m: np.ndarray) -> pa.Table:
    n, d = m.shape
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), d),
    })


def _run(ray, t: pa.Table, blocks: int, **kw) -> dict[int, tuple[int, int]]:
    import ray.data as rd

    out = semantic_dedup(rd.from_arrow(t).repartition(blocks), **kw)
    tab = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in out.iter_batches(batch_format="pyarrow")])
    return {v: (k, r) for v, k, r in zip(tab["vec_id"].to_pylist(),
                                         tab["keep"].to_pylist(),
                                         tab["rep"].to_pylist())}


def test_semantic_dedup_planted_duplicates(ray_session):
    import ray

    rng = np.random.default_rng(13)
    n, d = 200, 16
    m = rng.normal(size=(n, d)).astype(np.float32)
    m[50] = m[7]                                   # exact duplicate
    m[51] = m[7] + rng.normal(scale=1e-3, size=d).astype(np.float32)
    # near-dup at the same magnitude (a 2.5x-scaled copy can land in a
    # different k-means cluster — the documented SemDeDup limitation:
    # only WITHIN-cluster duplicates are found)
    m[120] = m[30] + rng.normal(scale=1e-3, size=d).astype(np.float32)
    got = _run(ray, _table(m), blocks=5, k=6, tau=0.97, num_partitions=4)
    assert len(got) == n
    # duplicate group {7, 50, 51}: 7 kept as representative
    assert got[7] == (1, 7)
    assert got[50] == (0, 7)
    assert got[51] == (0, 7)
    assert got[120] == (0, 30) and got[30] == (1, 30)
    # a random vector far from everything survives
    kept = sum(1 for k, _ in got.values() if k == 1)
    assert kept == n - 3

    # partition invariance
    got2 = _run(ray, _table(m), blocks=2, k=6, tau=0.97, num_partitions=3)
    assert got2 == got


def test_semantic_dedup_oversized_cluster_flagged(ray_session):
    """A cluster over max_cluster is skipped (everyone kept, no dedup) but
    every member carries oversized=1 — degradation is recorded, not silent."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    n, d = 60, 8
    m = rng.normal(size=(n, d)).astype(np.float32)
    m[10] = m[3]  # planted duplicate that the cap will hide
    out = semantic_dedup(rd.from_arrow(_table(m)).repartition(3),
                         k=1, tau=0.97, num_partitions=2, max_cluster=8)
    tab = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in out.iter_batches(batch_format="pyarrow")])
    assert tab["oversized"].to_pylist() == [1] * n
    assert tab["keep"].to_pylist() == [1] * n  # nothing deduped
    # and with the cap lifted the same corpus is deduped and unflagged
    out2 = semantic_dedup(rd.from_arrow(_table(m)).repartition(3),
                          k=1, tau=0.97, num_partitions=2)
    tab2 = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in out2.iter_batches(batch_format="pyarrow")])
    by_id = {v: (k, o) for v, k, o in zip(tab2["vec_id"].to_pylist(),
                                          tab2["keep"].to_pylist(),
                                          tab2["oversized"].to_pylist())}
    assert by_id[10] == (0, 0) and by_id[3] == (1, 0)


def test_semantic_dedup_auto_k_survives_small_cap(ray_session):
    """VERDICT r3 item 4: with a cap that k=8 would overflow (every
    bucket oversized -> visible no-op), the auto-k default scales the
    cluster count so oversized == 0 and every planted exact duplicate
    is still dropped."""
    import ray.data as rd

    rng = np.random.default_rng(31)
    n, d, cap = 1200, 16, 64
    m = rng.normal(size=(n, d)).astype(np.float32)
    twins = {}
    for base in range(0, 200, 10):        # 20 planted exact copies
        m[base + 600] = m[base]
        twins[base + 600] = base

    # forced k=8: mean bucket 150 >> cap 64 -> degraded, flagged
    out8 = semantic_dedup(rd.from_arrow(_table(m)).repartition(5),
                          k=8, max_cluster=cap).to_pandas()
    assert out8["oversized"].sum() > 0

    # auto-k: ceil(1200/16) = 75 clusters, mean 16 <= cap
    auto = semantic_dedup(rd.from_arrow(_table(m)).repartition(5),
                          max_cluster=cap).to_pandas()
    assert auto["oversized"].sum() == 0
    rec = auto.set_index("vec_id")
    for copy, base in twins.items():
        assert rec.loc[copy, "keep"] == 0
        assert rec.loc[copy, "rep"] == base
