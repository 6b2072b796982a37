"""Broadcast-model batch scoring — the "model inference" stage shape
with an EXACT oracle.

A linear scorer over token counts stands in for any per-doc model whose
state broadcasts (quality classifiers, fastText-style linear heads):
the weight table is built ONCE per actor in ``__init__`` (the K7
rechunk lesson / actor-pool house rule), every batch scores vectorized
(``pc.index_in`` against the vocab + one scatter-add per doc — no
Python token loop), and integer weights make the score bit-exact so
the DuckDB oracle hash-matches.  Zero shuffle: scoring is embarrassingly
parallel; at 100 TB this stage is read-bound.

A real learned model slots into the same seam (weights from a file via
``ray.put`` instead of the literal table); the deterministic literal
vocab here keeps the gate oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import _flat_tokens

#: literal (token, weight) model — mirrored verbatim in the oracle SQL
MODEL_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("the", 3), ("and", 2), ("of", 2), ("to", 1), ("a", 1),
    ("in", 1), ("is", -1), ("for", -2), ("on", -3), ("with", -4),
)
MODEL_BIAS = 7


class LinearScorer:
    """Actor-pool stage: (doc_id, text) -> (doc_id, score) with
    score = bias + Σ count(token) * weight(token), exact int64."""

    def __init__(self, weights=MODEL_WEIGHTS, bias: int = MODEL_BIAS):
        self.vocab = pa.array([w for w, _ in weights], pa.string())
        self.w = np.fromiter((v for _, v in weights), dtype=np.int64)
        self.bias = bias

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(ids)
        score = np.full(n, self.bias, np.int64)
        flat, row_of, _ = _flat_tokens(t["text"])
        if len(flat):
            hit = pc.index_in(flat, value_set=self.vocab)
            idx = hit.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
            m = idx >= 0
            np.add.at(score, row_of[m], self.w[idx[m]])
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "score": pa.array(score, pa.int64()),
        })


def model_score(docs_ds, batch_size: int = 4096, concurrency=(2, 8)):
    """documents -> (doc_id, score): broadcast-weight linear scoring on
    an actor pool."""
    return docs_ds.map_batches(LinearScorer, batch_size=batch_size,
                               batch_format="pyarrow",
                               concurrency=concurrency)


MODEL_SCORE_SQL = """
WITH w(t, wt) AS (VALUES
  ('the', 3), ('and', 2), ('of', 2), ('to', 1), ('a', 1),
  ('in', 1), ('is', -1), ('for', -2), ('on', -3), ('with', -4)
),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_RE}')) AS t
  FROM documents
),
hits AS (
  SELECT tok.doc_id, SUM(w.wt) AS s FROM tok JOIN w USING (t)
  GROUP BY tok.doc_id
)
SELECT d.doc_id, CAST(COALESCE(hits.s, 0) + 7 AS BIGINT) AS score
FROM documents d LEFT JOIN hits USING (doc_id)
"""
