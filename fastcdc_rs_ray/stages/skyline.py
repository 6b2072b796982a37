"""Skyline (Pareto-front) query over per-document quality signals.

The multi-criteria curation selector: keep every document NOT dominated
on (stopword share, token count) — "no other doc is at least as fluent
AND at least as long, strictly better in one".  The skyline is the exact
Pareto front the length-vs-fluency curation tradeoff walks; unlike a
weighted score it needs no weights.

Dims (both exact int64, maximize):
  q  = stopword occurrences * 1000 // max(n_words, 1)   (fluency proxy)
  nt = n_words

Distributed shape (the skyline-of-skylines law — local dominance implies
global dominance, so block-local pruning is lossless):
1. one streaming pass reduces each block to its LOCAL pair skyline
   ((q, nt) pairs only — at most one survivor pair per distinct q);
2. the driver merges the tiny pair sets and re-runs the same pair-level
   sweep for the global front;
3. surviving pairs broadcast back; one filter pass emits every doc row
   whose (q, nt) sits on the front (equal pairs are mutually
   non-dominating and all survive).

ZERO keyed exchange; SQL oracle is the textbook NOT EXISTS dominance
anti-join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import STOPWORDS, TOKEN_RE, token_membership_count

_OUT = pa.schema([
    ("doc_id", pa.int64()), ("q", pa.int64()), ("nt", pa.int64()),
])


def _signals(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
    nw = pc.count_substring_regex(t["text"], TOKEN_RE).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ns = token_membership_count(t["text"], STOPWORDS["en"]).astype(np.int64)
    q = ns * 1000 // np.maximum(nw, 1)
    return ids, q, nw


def _pair_skyline(q: np.ndarray, nt: np.ndarray) -> tuple[np.ndarray,
                                                          np.ndarray]:
    """Unique (q, nt) pairs on the Pareto front (maximize both)."""
    if len(q) == 0:
        return q, nt
    key = q * np.int64(1 << 32) + nt  # nt < 2^32 (token counts)
    uk = np.unique(key)
    uq, unt = uk >> np.int64(32), uk & np.int64((1 << 32) - 1)
    # per distinct q, the max-nt pair; survives iff nt > max nt at any
    # strictly higher q (prefix max over q descending)
    order = np.argsort(-uq, kind="stable")
    uq, unt = uq[order], unt[order]
    newq = np.concatenate([[True], uq[1:] != uq[:-1]])
    starts = np.flatnonzero(newq)
    # pairs sorted by q desc then nt asc within q (unique keys ascending
    # then reversed by q) — take per-q max nt explicitly
    maxnt = np.maximum.reduceat(unt, starts)
    qs = uq[starts]
    better = np.concatenate([[np.int64(-1)],
                             np.maximum.accumulate(maxnt)[:-1]])
    keep = maxnt > better
    return qs[keep], maxnt[keep]


def pareto_docs(documents_ds):
    import ray

    def local_front(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"q": pa.array([], pa.int64()),
                             "nt": pa.array([], pa.int64())})
        _, q, nt = _signals(t)
        fq, fnt = _pair_skyline(q, nt)
        return pa.table({"q": pa.array(fq, pa.int64()),
                         "nt": pa.array(fnt, pa.int64())})

    src = documents_ds.select_columns(["doc_id", "text"])
    qs, nts = [], []
    for b in src.map_batches(local_front, batch_format="pyarrow"
                             ).iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            qs.append(b["q"].to_numpy(zero_copy_only=False))
            nts.append(b["nt"].to_numpy(zero_copy_only=False))
    if not qs:
        return _OUT.empty_table()
    gq, gnt = _pair_skyline(np.concatenate(qs), np.concatenate(nts))
    front = ray.put(gq * np.int64(1 << 32) + gnt)

    def emit(t: pa.Table, _fref=front) -> pa.Table:
        if len(t) == 0:
            return _OUT.empty_table()
        fr = ray.get(_fref)
        ids, q, nt = _signals(t)
        m = np.isin(q * np.int64(1 << 32) + nt, fr)
        return pa.table({
            "doc_id": pa.array(ids[m], pa.int64()),
            "q": pa.array(q[m], pa.int64()),
            "nt": pa.array(nt[m], pa.int64()),
        }).cast(_OUT)

    return src.map_batches(emit, batch_format="pyarrow")


PARETO_DOCS_SQL_TEMPLATE = """
WITH m AS (
  SELECT doc_id,
         len(list_filter(regexp_extract_all(text, '{token_re}'),
                         x -> x IN ({stopwords}))) * 1000
           // greatest(len(regexp_extract_all(text, '{token_re}')), 1) AS q,
         len(regexp_extract_all(text, '{token_re}')) AS nt
  FROM documents
)
SELECT a.doc_id, CAST(a.q AS BIGINT) AS q, CAST(a.nt AS BIGINT) AS nt
FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.q >= a.q AND b.nt >= a.nt AND (b.q > a.q OR b.nt > a.nt)
)
"""
