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
