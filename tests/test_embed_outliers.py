"""embed_outliers input discipline (round-2 verdict item 2).

The engine and the DuckDB oracle must agree — or BOTH fail — on every
input: non-finite embedding values RAISE (np.floor(nan).astype(int64)
silently wraps to INT64_MIN where SQL yields NULL), and int64 overflow
in the n*q - S arithmetic RAISES (the oracle's BIGINT multiply raises
there too).  Plus a clean-case hash parity pin vs DuckDB.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from fastcdc_rs_ray.stages.vecagg import EMBED_OUTLIERS_SQL, embed_outliers

DIM = 64


def _emb_table(vals: np.ndarray, labels) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(range(len(vals)), pa.int64()),
        "embedding": pa.array(
            [row.tolist() for row in vals.astype(np.float32)],
            pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })


def _run(t: pa.Table):
    import ray.data as rd

    return embed_outliers(rd.from_arrow(t), dim=DIM).to_pandas()


def test_clean_case_matches_duckdb(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.normal(scale=0.3, size=(60, DIM))
    t = _emb_table(vals, [i % 4 for i in range(60)])
    got = _run(t).sort_values("vec_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("embeddings", t)
    want = con.execute(
        EMBED_OUTLIERS_SQL + " ORDER BY vec_id").fetchdf()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["label"].tolist() == want["label"].tolist()
    assert got.sort_values("vec_id")["dist2"].tolist() == \
        want["dist2"].tolist()


def test_nan_embedding_raises(ray_session):
    vals = np.zeros((8, DIM))
    vals[3, 17] = np.nan
    t = _emb_table(vals, [0] * 8)
    with pytest.raises(Exception, match="non-finite"):
        _run(t)


def test_inf_embedding_raises(ray_session):
    vals = np.zeros((8, DIM))
    vals[5, 2] = np.inf
    t = _emb_table(vals, [0] * 8)
    with pytest.raises(Exception, match="non-finite"):
        _run(t)


def test_overflow_raises_not_wraps(ray_session):
    """Components large enough that (n*q - S)^2 summed over dim exceeds
    int64: the engine must RAISE (as the oracle's BIGINT multiply
    would), never emit wrapped values."""
    vals = np.zeros((4, DIM))
    vals[0, :] = 2.0e15   # q = 2e18 -> dim * (n*q)^2 >> 2^63
    vals[1, :] = -2.0e15
    t = _emb_table(vals, [0, 0, 1, 1])
    with pytest.raises(Exception, match="overflow|exceeds int64"):
        _run(t)


def test_oracle_raises_on_same_overflow():
    """The SQL side of the contract: DuckDB's BIGINT arithmetic errors
    on the overflow case rather than wrapping — so engine RAISE keeps
    agree-or-both-fail semantics."""
    vals = np.zeros((4, DIM))
    vals[0, :] = 2.0e15
    vals[1, :] = -2.0e15
    t = _emb_table(vals, [0, 0, 1, 1])
    con = duckdb.connect()
    con.register("embeddings", t)
    with pytest.raises(Exception):
        con.execute(EMBED_OUTLIERS_SQL).fetchall()


def test_merge_exact_under_tiny_coalesced_partials(ray_session):
    """Round-4 regression for the driver's two-round red row: with many
    tiny input blocks the per-block (label x dim) partials are small
    enough that a default-sized iter_batches batch COALESCES several
    partials — the old merge used numpy fancy-index += (drops duplicate
    (label, i) indices) and took one block's count via n[m][0], so the
    same label arriving from two partials in one batch silently
    corrupted S and N.  The replica's 8-cpu block layout happened to
    align 640-row partials with 256-row batches, which is why two
    rounds of sf-sweeps stayed green while the driver's 32-cpu window
    was red.  All rows share ONE label here so ANY coalescing corrupts
    the old merge; the row-exact merge (np.add.at + i==0 count rows +
    block-sized batches) must match the single-matrix reference under a
    200-block layout."""
    import ray.data as rd

    from fastcdc_rs_ray.stages.vecagg import embed_outliers

    rng = np.random.default_rng(61)
    n, dim = 200, 64
    m = rng.normal(scale=0.5, size=(n, dim)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), dim).cast(
            pa.list_(pa.float32())),
        "label": pa.array([0] * n, pa.int32()),
    })
    out = embed_outliers(
        rd.from_arrow(t).repartition(200)).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)

    q = np.floor(m.astype(np.float64) * 1000.0).astype(np.int64)
    S = q.sum(axis=0)
    diff = np.int64(n) * q - S
    want = np.einsum("ij,ij->i", diff, diff)
    assert (out["dist2"].to_numpy() == want).all()
    # and the layout must not matter at all
    one = embed_outliers(rd.from_arrow(t)).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert one.equals(out)
