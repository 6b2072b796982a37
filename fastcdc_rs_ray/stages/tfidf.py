"""TF-IDF distinctive terms per language — integer-exact scoring.

The vocabulary-analysis op a curation pipeline runs after word-count: which
tokens are *over-represented* in each language slice.  Score is the
integer-exact surrogate ``score = (c_lang * 1_000_000) // df`` (term count
in the lang, scaled, floor-divided by global document frequency) — rank-
equivalent to tf-idf's tf * 1/df factor at fixed corpus size and exactly
reproducible in SQL (both sides floor positive int64 division; no log, no
float drift).

Shape discipline (same as stages/wordcount.py):
- per-block partials emit ONE row per (token, lang) — occurrence counts AND
  per-block distinct-doc counts (docs are whole rows, so block doc-counts
  sum to the exact global df; no distinct pass is needed),
- ONE keyed exchange on token co-locates each token's rows,
- per-lang top-k candidates per block + a driver merge of
  k x langs x partitions rows (each token lives in exactly one block, so
  the block-local top-k is a valid partial).

Reference has no string ops at all (SURVEY.md §2.8); cites
src/v2020/mod.rs only as the no-op baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import TOKEN_RE, _flat_tokens

TFIDF_K = 10
_SCALE = 1_000_000

_MID = pa.schema([
    ("token", pa.string()), ("lang", pa.string()),
    ("c", pa.int64()), ("d", pa.int64()),
])

_OUT = pa.schema([
    ("lang", pa.string()), ("token", pa.string()), ("score", pa.int64()),
])


def _partial(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _MID.empty_table()
    flat, row_of, n_rows = _flat_tokens(t["text"])
    if len(flat) == 0:
        return _MID.empty_table()
    tenc = flat.dictionary_encode()
    tcode = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    lenc = t["lang"].combine_chunks().dictionary_encode()
    lang_of_row = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nl = len(lenc.dictionary)
    nt = len(tenc.dictionary)

    key = tcode * nl + lang_of_row[row_of]          # (token, lang) occurrence
    c = np.bincount(key, minlength=nt * nl)
    # distinct docs per (token, lang): dedupe (token, row) pairs first
    pair = tcode * n_rows + row_of
    upair = np.unique(pair)
    urow = upair % n_rows
    ukey = (upair // n_rows) * nl + lang_of_row[urow]
    d = np.bincount(ukey, minlength=nt * nl)
    live = np.flatnonzero(c > 0)
    return pa.table({
        "token": tenc.dictionary.take(pa.array(live // nl, pa.int64())),
        "lang": lenc.dictionary.take(pa.array(live % nl, pa.int64())),
        "c": pa.array(c[live], pa.int64()),
        "d": pa.array(d[live], pa.int64()),
    }).cast(_MID)


def _score_and_topk(t: pa.Table, k: int) -> pa.Table:
    """All rows of any token are in ``t``: compute df, score, per-lang
    top-k (score desc, token asc)."""
    if len(t) == 0:
        return _OUT.empty_table()
    g = t.group_by(["token", "lang"]).aggregate([("c", "sum"), ("d", "sum")])
    dfg = t.group_by("token").aggregate([("d", "sum")])
    pos = pc.index_in(
        g["token"].combine_chunks(), value_set=dfg["token"].combine_chunks()
    ).to_numpy(zero_copy_only=False)
    df = dfg["d_sum"].combine_chunks().to_numpy(zero_copy_only=False)[pos]
    c = g["c_sum"].combine_chunks().to_numpy(zero_copy_only=False)
    score = (c * _SCALE) // df
    scored = pa.table({
        "lang": g["lang"], "token": g["token"],
        "score": pa.array(score, pa.int64()),
    }).cast(_OUT)
    return _per_lang_topk(scored, k)


def _per_lang_topk(t: pa.Table, k: int) -> pa.Table:
    if len(t) == 0:
        return _OUT.empty_table()
    order = pc.sort_indices(t, sort_keys=[
        ("lang", "ascending"), ("score", "descending"), ("token", "ascending")])
    t = t.take(order)
    lenc = t["lang"].combine_chunks().dictionary_encode()
    codes = lenc.indices.to_numpy(zero_copy_only=False)
    # rank within each (sorted-contiguous) lang run
    starts = np.r_[0, 1 + np.flatnonzero(np.diff(codes))]
    rank = np.arange(len(codes)) - np.repeat(starts, np.diff(np.r_[starts, len(codes)]))
    return t.filter(pa.array(rank < k))


def tfidf_terms(documents_ds, k: int = TFIDF_K, num_partitions: int = 8):
    """documents -> (lang, token, score): top-k distinctive tokens per
    language by the integer tf/df surrogate score."""
    partials = documents_ds.map_batches(_partial, batch_format="pyarrow")
    ex = partials.repartition(num_blocks=num_partitions, keys=["token"])
    cands = ex.map_batches(
        lambda t: _score_and_topk(t, k), batch_format="pyarrow",
        batch_size=None,
    )
    final = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in cands.iter_batches(batch_format="pyarrow")]
        + [_OUT.empty_table()]
    )
    return _per_lang_topk(final, k)


TFIDF_TERMS_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(text, '{TOKEN_RE}')) AS token
  FROM documents
),
cl AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
df AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS d
  FROM tok GROUP BY 1
)
SELECT lang, token, CAST((c * {_SCALE}) // d AS BIGINT) AS score
FROM cl JOIN df USING (token)
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY score DESC, token ASC) <= {TFIDF_K}
"""
