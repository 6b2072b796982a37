"""Corpus-frequency rarity score per document — integer-exact.

The curation signal next to tf-idf's term view (stages/tfidf.py): per
DOCUMENT, how common are its tokens in the whole corpus?  A document of
frequent boilerplate tokens scores high, a document of rare/noisy tokens
scores low — both tails get curated.  Emitted as exact int64 components
(freq_sum = Σ over token occurrences of that token's corpus occurrence
count, plus n_tokens), so the ratio is the consumer's choice and the SQL
oracle hash-matches bit-for-bit (no log, no float drift).

Shape discipline:
- per-block partials: ONE row per distinct token (its block occurrence
  count, kind 0) and ONE row per distinct (doc, token) pair (its in-doc
  occurrence count, kind 1) — both bounded by block content, not corpus;
- ONE tag-union keyed exchange on token co-locates each token's global
  count partials with every document occurrence of that token;
- contributions fold per document inside the block, then ONE keyed
  exchange on doc_id sums the per-block document partials (each row is
  3 int64s; rows per doc bounded by blocks-that-touch-its-tokens).

Two keyed exchanges total, no broadcast state, no driver-side vocab.
Reference has no string ops (SURVEY.md §2.8) — this is the
beyond-reference LLM-curation tier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import _flat_tokens

_MID = pa.schema([
    ("token", pa.string()), ("kind", pa.int8()),
    ("doc_id", pa.int64()), ("v", pa.int64()),
])

_PARTIAL = pa.schema([
    ("doc_id", pa.int64()), ("freq_sum", pa.int64()),
    ("n_tokens", pa.int64()),
])


def _explode(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _MID.empty_table()
    flat, row_of, n_rows = _flat_tokens(t["text"])
    if len(flat) == 0:
        return _MID.empty_table()
    ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    tenc = flat.dictionary_encode()
    tcode = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nt = len(tenc.dictionary)
    # kind 0: per-token block occurrence count
    cnt = np.bincount(tcode, minlength=nt)
    # kind 1: per (doc-row, token) occurrence count
    pair = tcode * n_rows + row_of
    upair, pcnt = np.unique(pair, return_counts=True)
    utok = upair // n_rows
    udoc = ids[upair % n_rows]
    def _arr(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    tok0 = _arr(tenc.dictionary.take(pa.array(np.arange(nt), pa.int64())))
    tok1 = _arr(tenc.dictionary.take(pa.array(utok, pa.int64())))
    return pa.table({
        "token": pa.concat_arrays([tok0, tok1]),
        "kind": pa.array(np.concatenate(
            [np.zeros(nt, np.int8), np.ones(len(utok), np.int8)]), pa.int8()),
        "doc_id": pa.array(np.concatenate(
            [np.zeros(nt, np.int64), udoc]), pa.int64()),
        "v": pa.array(np.concatenate([cnt, pcnt]), pa.int64()),
    }).cast(_MID)


def _join_block(t: pa.Table) -> pa.Table:
    """All rows of any token are here: global count = Σ kind-0 partials;
    each kind-1 occurrence row contributes occ * global to its doc."""
    if len(t) == 0:
        return _PARTIAL.empty_table()
    tok = t["token"].combine_chunks().dictionary_encode()
    inv = tok.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nt = len(tok.dictionary)
    kind = t["kind"].combine_chunks().to_numpy(zero_copy_only=False)
    doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
    total = np.zeros(nt, np.int64)
    m0 = kind == 0
    np.add.at(total, inv[m0], v[m0])
    m1 = ~m0
    if not m1.any():
        return _PARTIAL.empty_table()
    contrib = v[m1] * total[inv[m1]]
    udoc, dinv = np.unique(doc[m1], return_inverse=True)
    fs = np.zeros(len(udoc), np.int64)
    ntk = np.zeros(len(udoc), np.int64)
    np.add.at(fs, dinv, contrib)
    np.add.at(ntk, dinv, v[m1])
    return pa.table({
        "doc_id": pa.array(udoc, pa.int64()),
        "freq_sum": pa.array(fs, pa.int64()),
        "n_tokens": pa.array(ntk, pa.int64()),
    }).cast(_PARTIAL)


def _final_block(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _PARTIAL.empty_table()
    doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    fs = t["freq_sum"].combine_chunks().to_numpy(zero_copy_only=False)
    ntk = t["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
    udoc, dinv = np.unique(doc, return_inverse=True)
    ofs = np.zeros(len(udoc), np.int64)
    ont = np.zeros(len(udoc), np.int64)
    np.add.at(ofs, dinv, fs)
    np.add.at(ont, dinv, ntk)
    return pa.table({
        "doc_id": pa.array(udoc, pa.int64()),
        "freq_sum": pa.array(ofs, pa.int64()),
        "n_tokens": pa.array(ont, pa.int64()),
    }).cast(_PARTIAL)


def doc_rarity(documents_ds, num_partitions: int = 16):
    """documents -> (doc_id, freq_sum, n_tokens) exact int64."""
    mid = documents_ds.map_batches(_explode, batch_format="pyarrow")
    mid = mid.repartition(num_blocks=num_partitions, keys=["token"])
    parts = mid.map_batches(_join_block, batch_format="pyarrow",
                            batch_size=None)
    parts = parts.repartition(num_blocks=max(4, num_partitions // 2),
                              keys=["doc_id"])
    return parts.map_batches(_final_block, batch_format="pyarrow",
                             batch_size=None)


DOC_RARITY_SQL_TEMPLATE = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{token_re}')) AS t
  FROM documents
), cf AS (
  SELECT t, COUNT(*) AS c FROM tok GROUP BY t
)
SELECT tok.doc_id, CAST(SUM(cf.c) AS BIGINT) AS freq_sum,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM tok JOIN cf USING (t) GROUP BY tok.doc_id
"""
