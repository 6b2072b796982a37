"""BM25 relevance components for a fixed query over the corpus.

The IR scoring op of a retrieval/curation pipeline: for a query token set
Q, every document containing a query token gets one row per matched token
with the EXACT integer components of BM25 —

    (doc_id, token, tf, df, dl)

tf = occurrences of the token in the doc, df = number of corpus docs
containing the token, dl = the doc's token count.  The float score
``idf(df) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` is the consumer's
choice of (k1, b) away — emitting the integer sufficient statistics keeps
the operator bit-exact and lets the DuckDB oracle hash-match it (the
dsir_weights / value_dispersion discipline: never put a float in the
gate).

Shape (the decontaminate broadcast plan — ZERO keyed exchange):

1. pass A: one streaming map reduces each block to |Q|-bounded
   (token, df_partial) rows — documents are whole rows, so a block-local
   distinct-doc count per token is a correct df partial; the driver merges
   |Q| x blocks tiny rows and broadcasts the df map via ``ray.put``.
2. pass B: one streaming map emits the per-doc rows: tokenize (the
   shared ``_flat_tokens`` kernel == RE2 ``regexp_extract_all``), count
   query-token hits vectorized, attach dl and the broadcast df.

The 100 TB story: the corpus streams twice with no shuffle; driver/
broadcast state is |Q|-sized.  Reference has no string ops (SURVEY §2.8);
this extends the doc_rarity/tfidf curation tier with the query-side view.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import _flat_tokens

#: default query: frequent-but-not-universal corpus tokens (the gate only
#: needs a deterministic, reproducible query set)
BM25_QUERY = ("join", "scan", "window", "shuffle")

_OUT = pa.schema([
    ("doc_id", pa.int64()), ("token", pa.string()),
    ("tf", pa.int64()), ("df", pa.int64()), ("dl", pa.int64()),
])


def _hits(t: pa.Table, query: tuple[str, ...]):
    """(doc ids, token-code per occurrence, dl per row) for one block."""
    flat, row_of, n_rows = _flat_tokens(t["text"])
    ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    dl = np.bincount(row_of, minlength=n_rows).astype(np.int64)
    qarr = pa.array(list(query), pa.string())
    code = pc.index_in(flat, value_set=qarr)  # null for non-query tokens
    hit = pc.is_valid(code).to_numpy(zero_copy_only=False)
    qcode = code.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
    return ids, row_of[hit], qcode, dl


def bm25_components(documents_ds, query: tuple[str, ...] = BM25_QUERY,
                    num_partitions: int = 16):
    import ray

    nq = len(query)

    def df_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"q": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        _, hrow, qcode, _ = _hits(t, query)
        # distinct docs per query token within the block (docs are whole
        # rows -> block partials sum to the global df)
        key = qcode * np.int64(1 << 32) + hrow
        ukey = np.unique(key)
        dfp = np.bincount((ukey >> np.int64(32)).astype(np.int64),
                          minlength=nq).astype(np.int64)
        return pa.table({"q": pa.array(np.arange(nq), pa.int64()),
                         "df": pa.array(dfp, pa.int64())})

    df = np.zeros(nq, np.int64)
    for b in documents_ds.select_columns(["doc_id", "text"]).map_batches(
            df_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        if b.num_rows:
            np.add.at(df, b["q"].to_numpy(zero_copy_only=False),
                      b["df"].to_numpy(zero_copy_only=False))
    df_ref = ray.put(df)

    def emit(t: pa.Table, _dref=df_ref) -> pa.Table:
        if len(t) == 0:
            return _OUT.empty_table()
        dfv = ray.get(_dref)
        ids, hrow, qcode, dl = _hits(t, query)
        if len(qcode) == 0:
            return _OUT.empty_table()
        key = qcode * np.int64(1 << 32) + hrow
        ukey, tf = np.unique(key, return_counts=True)
        uq = (ukey >> np.int64(32)).astype(np.int64)
        urow = (ukey & np.int64((1 << 32) - 1)).astype(np.int64)
        qarr = pa.array(list(query), pa.string())
        return pa.table({
            "doc_id": pa.array(ids[urow], pa.int64()),
            "token": qarr.take(pa.array(uq, pa.int64())),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
            "df": pa.array(dfv[uq], pa.int64()),
            "dl": pa.array(dl[urow], pa.int64()),
        }).cast(_OUT)

    return documents_ds.select_columns(["doc_id", "text"]).map_batches(
        emit, batch_format="pyarrow")


def bm25_sql(query: tuple[str, ...], token_re: str) -> str:
    vals = ", ".join(f"('{q}')" for q in query)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{token_re}')) AS t
  FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), qt(t) AS (VALUES {vals}),
tf AS (
  SELECT doc_id, t, COUNT(*) AS tf FROM tok JOIN qt USING (t)
  GROUP BY doc_id, t
), df AS (
  SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok JOIN qt USING (t)
  GROUP BY t
)
SELECT tf.doc_id, tf.t AS token, CAST(tf.tf AS BIGINT) AS tf,
       CAST(df.df AS BIGINT) AS df, CAST(dl.dl AS BIGINT) AS dl
FROM tf JOIN df USING (t) JOIN dl USING (doc_id)
"""
