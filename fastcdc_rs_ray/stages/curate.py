"""End-to-end document curation: the composed keep/drop pass a training-
data pipeline runs before tokenization (quality gate -> language gate ->
exact dedup first-wins), expressed as ONE fused map_batches pass plus ONE
keyed exchange.

Composition discipline (what makes this 100 TB-shaped):

- All per-doc signals (token/punct/stopword counts, language argmax) are
  computed in a single vectorized pass over each block — the text is read
  once and never leaves the block it was scanned in.
- The keep predicate is integer cross-multiplied (``20*n_stopwords >=
  n_words``, ``5*n_punct <= n_chars``) — no float thresholds, so the
  decision is bit-identical under any partitioning.
- Only survivors' (content_hash, doc_id, stats) rows — already reduced to
  per-block distinct — ride the exchange; the dedup combine keeps the
  minimum doc_id per content hash (first-wins, deterministic).

The reference's CDC is the *mechanism* for dedup (README.md:3); this stage
is the curation *policy* layer above it, fully DuckDB-oracle-checkable
because every signal kernel (RE2 regex counts, stopword membership,
argmax tie-break) was chosen to have an exact SQL twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import (
    PUNCT_CLASS,
    STOPWORDS,
    TOKEN_RE,
    token_membership_count,
)
from ..util import hash_str_array_u64

# integer-exact keep thresholds (shared with the SQL literal below):
# >= MIN_WORDS tokens, stopword fraction >= 1/20, punct fraction <= 1/5
MIN_WORDS = 10
STOP_DEN = 20
PUNCT_DEN = 5
KEEP_LANG = "en"


def curate_docs(documents_ds, num_partitions: int = 16):
    """documents -> curated survivors (doc_id, lang_pred, n_words, n_chars).

    One fused scan computes every signal; one keyed exchange dedups exact
    copies among the survivors (min doc_id per content hash).
    """
    langs = sorted(STOPWORDS)

    def scan(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("content_hash", pa.uint64()), ("doc_id", pa.int64()),
            ("lang_pred", pa.string()), ("n_words", pa.int64()),
            ("n_chars", pa.int64()),
        ])
        if len(t) == 0:
            return out_schema.empty_table()
        text = t["text"]
        n_chars = pc.binary_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = pc.count_substring_regex(text, TOKEN_RE).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_punct = pc.count_substring_regex(text, PUNCT_CLASS).to_numpy(
            zero_copy_only=False).astype(np.int64)
        counts = np.zeros((len(t), len(langs)), np.int64)
        for j, lang in enumerate(langs):
            counts[:, j] = token_membership_count(text, STOPWORDS[lang])
        best = np.argmax(counts, axis=1)  # first max wins, ties by code asc
        n_stop_en = counts[:, langs.index(KEEP_LANG)]
        is_en = (np.array(langs, dtype=object)[best] == KEEP_LANG) & (
            counts.max(axis=1) > 0)
        keep = (
            is_en
            & (n_words >= MIN_WORDS)
            & (STOP_DEN * n_stop_en >= n_words)
            & (PUNCT_DEN * n_punct <= n_chars)
        )
        idx = np.flatnonzero(keep)
        h = hash_str_array_u64(text)[idx]
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)[idx]
        # per-block distinct: min doc_id per content hash before the exchange
        order = np.lexsort((ids, h))
        h, ids = h[order], ids[order]
        sel = idx[order]
        first = np.concatenate([[True], h[1:] != h[:-1]]) if len(h) else np.empty(0, bool)
        return pa.table({
            "content_hash": pa.array(h[first], pa.uint64()),
            "doc_id": pa.array(ids[first], pa.int64()),
            "lang_pred": pa.array([KEEP_LANG] * int(first.sum()), pa.string()),
            "n_words": pa.array(n_words[sel][first], pa.int64()),
            "n_chars": pa.array(n_chars[sel][first], pa.int64()),
        }).cast(out_schema)

    partials = documents_ds.map_batches(scan, batch_format="pyarrow")
    located = partials.repartition(num_blocks=num_partitions,
                                   keys=["content_hash"])

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("lang_pred", pa.string()),
        ("n_words", pa.int64()), ("n_chars", pa.int64()),
    ])

    def dedup_min(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        h = t["content_hash"].combine_chunks().to_numpy()
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        first = np.concatenate([[True], h[order][1:] != h[order][:-1]])
        idx = pa.array(order[first], pa.int64())
        return pa.table({
            "doc_id": t["doc_id"].take(idx),
            "lang_pred": t["lang_pred"].take(idx),
            "n_words": t["n_words"].take(idx),
            "n_chars": t["n_chars"].take(idx),
        }).cast(out_schema)

    return located.map_batches(dedup_min, batch_format="pyarrow",
                               batch_size=None)


def _langs_values_sql() -> str:
    return ",\n  ".join(
        "('{}', [{}])".format(
            lang, ", ".join("'" + w + "'" for w in STOPWORDS[lang]))
        for lang in sorted(STOPWORDS)
    )


CURATE_DOCS_SQL = f"""
WITH langs(lang, words) AS (VALUES
  {_langs_values_sql()}),
scored AS (
  SELECT d.doc_id, l.lang,
         len(list_filter(regexp_extract_all(d.text, '{TOKEN_RE}'),
                         x -> list_contains(l.words, x))) AS c
  FROM documents d CROSS JOIN langs l
),
pred AS (
  SELECT doc_id, CASE WHEN c = 0 THEN 'und' ELSE lang END AS lang_pred
  FROM scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, lang ASC) = 1
),
q AS (
  SELECT doc_id, text,
         strlen(text) AS n_chars,
         len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_words,
         len(regexp_extract_all(text, '{PUNCT_CLASS}')) AS n_punct,
         len(list_filter(regexp_extract_all(text, '{TOKEN_RE}'),
             x -> x IN ({", ".join("'" + w + "'" for w in STOPWORDS[KEEP_LANG])})))
           AS n_stopwords
  FROM documents
),
kept AS (
  SELECT q.*, p.lang_pred
  FROM q JOIN pred p USING (doc_id)
  WHERE p.lang_pred = '{KEEP_LANG}'
    AND q.n_words >= {MIN_WORDS}
    AND {STOP_DEN} * q.n_stopwords >= q.n_words
    AND {PUNCT_DEN} * q.n_punct <= q.n_chars
)
SELECT MIN(doc_id) AS doc_id,
       ANY_VALUE(lang_pred) AS lang_pred,
       ANY_VALUE(n_words) AS n_words,
       ANY_VALUE(n_chars) AS n_chars
FROM kept
GROUP BY text
"""
