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


# --------------------------------------------------------------------------
# bigram_novelty — rare-bigram fraction per document
# --------------------------------------------------------------------------

#: a bigram is "rare" when its corpus occurrence count is <= this
NOVELTY_RARE_MAX = 1

_BG_PAIR = pa.schema([
    ("bh", pa.uint64()), ("doc_id", pa.int64()), ("cnt", pa.int64()),
])

_BG_TAGGED = pa.schema([
    ("doc_id", pa.int64()), ("n", pa.int64()), ("kind", pa.int8()),
])

_BG_OUT = pa.schema([
    ("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
    ("n_rare", pa.int64()), ("novel_permille", pa.int64()),
])

_BG_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bigram_hashes(t: pa.Table):
    """(bigram hash array, doc_id per bigram) for a documents block.
    Bigram identity = order-sensitive mix of the two adjacent token
    hashes; like the token tier, hash collisions are impossible at
    oracle-checked scales and a 128-bit upgrade is a key-width change."""
    from ..util import hash_str_array_u64

    flat, row_of, _ = _flat_tokens(t["text"])
    if len(flat) < 2:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    h = hash_str_array_u64(flat)
    adj = row_of[1:] == row_of[:-1]
    h1, h2 = h[:-1][adj], h[1:][adj]
    bh = (h1 * _BG_MIX) ^ (h2 + _BG_MIX)
    bh ^= bh >> np.uint64(29)
    bh *= _BG_MIX
    return bh, ids[row_of[:-1][adj]]


def _bg_pair_partials(t: pa.Table) -> pa.Table:
    """Block pre-reduce: distinct (bigram-hash, doc) pairs with counts."""
    bh, doc = _bigram_hashes(t)
    if len(bh) == 0:
        return _BG_PAIR.empty_table()
    order = np.lexsort((doc, bh))
    bh, doc = bh[order], doc[order]
    new = np.concatenate([[True], (bh[1:] != bh[:-1]) | (doc[1:] != doc[:-1])])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, len(bh)))
    return pa.table({
        "bh": pa.array(bh[starts], pa.uint64()),
        "doc_id": pa.array(doc[starts], pa.int64()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    }).cast(_BG_PAIR)


def _bg_totals(t: pa.Table) -> pa.Table:
    """Per-doc bigram totals (documents rows are globally unique, so the
    total is complete in-block — no partial summing needed)."""
    bh, doc = _bigram_hashes(t)
    if len(bh) == 0:
        return _BG_TAGGED.empty_table()
    udoc, cnt = np.unique(doc, return_counts=True)
    return pa.table({
        "doc_id": pa.array(udoc, pa.int64()),
        "n": pa.array(cnt.astype(np.int64), pa.int64()),
        "kind": pa.array(np.zeros(len(udoc), np.int8), pa.int8()),
    }).cast(_BG_TAGGED)


def _bg_rare_counts(t: pa.Table) -> pa.Table:
    """Partition reduce after the bh exchange: collapse (bh, doc)
    partials; a bigram whose corpus total is <= NOVELTY_RARE_MAX
    contributes its occurrence count to each owning doc."""
    if t.num_rows == 0:
        return _BG_TAGGED.empty_table()
    bh = t["bh"].combine_chunks().to_numpy()
    doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, bh))
    bh, doc, cnt = bh[order], doc[order], cnt[order]
    new_pair = np.concatenate(
        [[True], (bh[1:] != bh[:-1]) | (doc[1:] != doc[:-1])]
    )
    p_starts = np.flatnonzero(new_pair)
    pair_cnt = np.add.reduceat(cnt.astype(np.int64), p_starts)
    pbh, pdoc = bh[p_starts], doc[p_starts]
    new_h = np.concatenate([[True], pbh[1:] != pbh[:-1]])
    h_of_pair = np.cumsum(new_h) - 1
    total = np.bincount(h_of_pair, weights=pair_cnt).astype(np.int64)
    rare = total[h_of_pair] <= NOVELTY_RARE_MAX
    return pa.table({
        "doc_id": pa.array(pdoc[rare], pa.int64()),
        "n": pa.array(pair_cnt[rare], pa.int64()),
        "kind": pa.array(np.ones(int(rare.sum()), np.int8), pa.int8()),
    }).cast(_BG_TAGGED)


def _bg_reduce(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _BG_OUT.empty_table()
    doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
    kind = t["kind"].combine_chunks().to_numpy(zero_copy_only=False)
    udoc, inv = np.unique(doc, return_inverse=True)
    n_bg = np.bincount(inv, weights=np.where(kind == 0, n, 0),
                       minlength=len(udoc)).astype(np.int64)
    n_rare = np.bincount(inv, weights=np.where(kind == 1, n, 0),
                         minlength=len(udoc)).astype(np.int64)
    permille = n_rare * 1000 // np.maximum(n_bg, 1)
    return pa.table({
        "doc_id": pa.array(udoc, pa.int64()),
        "n_bigrams": pa.array(n_bg, pa.int64()),
        "n_rare": pa.array(n_rare, pa.int64()),
        "novel_permille": pa.array(permille.astype(np.int64), pa.int64()),
    }).cast(_BG_OUT)


def bigram_novelty(documents_ds, num_partitions: int = 16):
    """Rare-bigram fraction per document — the bigram-tier boilerplate
    detector next to the unigram :func:`doc_rarity` (CCNet-flavored LM
    quality proxy kept integer-exact: instead of float log-probs, count
    the bigram occurrences whose corpus frequency is <= NOVELTY_RARE_MAX).

    Returns (doc_id, n_bigrams, n_rare, novel_permille) for every doc
    with at least one bigram (>= 2 tokens); novel_permille =
    n_rare * 1000 // n_bigrams.  Two keyed exchanges, neither moving
    text: (bh, doc, cnt) pair partials by bigram hash, then int8-tagged
    counts by doc_id — the dup_turn_ratio plan shape one n-gram order up.
    """
    pairs = documents_ds.map_batches(_bg_pair_partials, batch_format="pyarrow")
    pairs = pairs.repartition(num_blocks=num_partitions, keys=["bh"])
    rare = pairs.map_batches(_bg_rare_counts, batch_format="pyarrow",
                             batch_size=None)
    tagged = documents_ds.map_batches(_bg_totals, batch_format="pyarrow").union(rare)
    tagged = tagged.repartition(num_blocks=max(4, num_partitions // 2),
                                keys=["doc_id"])
    return tagged.map_batches(_bg_reduce, batch_format="pyarrow",
                              batch_size=None)


# chr(1) as the pair separator: tokens are non-whitespace runs, so the
# only ambiguity would need a \x01 byte inside a token — absent from the
# driver corpora (engine side pairs token HASHES, which is separator-free)
BIGRAM_NOVELTY_SQL_TEMPLATE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '{token_re}') AS ts FROM documents
), pos AS (
  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS p FROM toks
), bg AS (
  SELECT a.doc_id, a.tok || chr(1) || b.tok AS gram
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
), cf AS (
  SELECT gram, COUNT(*) AS c FROM bg GROUP BY gram
)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN cf.c <= {rare_max} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rare,
       CAST(SUM(CASE WHEN cf.c <= {rare_max} THEN 1 ELSE 0 END) * 1000
            // COUNT(*) AS BIGINT) AS novel_permille
FROM bg JOIN cf USING (gram) GROUP BY bg.doc_id
"""


# --------------------------------------------------------------------------
# dsir_weights — importance-resampling weight components (DSIR family)
# --------------------------------------------------------------------------

#: target slice = benchmark docs (same convention as stages/decontam.py)
DSIR_TARGET_MOD = 50

_DSIR_MID = pa.schema([
    ("token", pa.string()), ("kind", pa.int8()),
    ("doc_id", pa.int64()), ("v", pa.int64()),
])

_DSIR_PARTIAL = pa.schema([
    ("doc_id", pa.int64()), ("tgt_mass", pa.int64()),
    ("raw_mass", pa.int64()), ("n_tokens", pa.int64()),
])


def _dsir_explode(target_mod: int):
    """Per-block partials: kind 0 = corpus token count, kind 2 = TARGET-
    slice token count, kind 1 = per (non-target doc, token) occurrence
    count.  All three bounded by block content."""

    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _DSIR_MID.empty_table()
        flat, row_of, n_rows = _flat_tokens(t["text"])
        if len(flat) == 0:
            return _DSIR_MID.empty_table()
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        is_tgt_row = (ids % target_mod) == 0
        tenc = flat.dictionary_encode()
        tcode = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = len(tenc.dictionary)
        occ_tgt_row = is_tgt_row[row_of]
        cnt_all = np.bincount(tcode, minlength=nt)
        cnt_tgt = np.bincount(tcode[occ_tgt_row], minlength=nt)
        # kind 1 over non-target docs only (the scored set)
        sel = ~occ_tgt_row
        pair = tcode[sel] * n_rows + row_of[sel]
        upair, pcnt = np.unique(pair, return_counts=True)
        utok = upair // n_rows
        udoc = ids[upair % n_rows]

        def _arr(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

        idx_all = pa.array(np.arange(nt), pa.int64())
        keep_tgt = np.flatnonzero(cnt_tgt)
        tok0 = _arr(tenc.dictionary.take(idx_all))
        tok2 = _arr(tenc.dictionary.take(pa.array(keep_tgt, pa.int64())))
        tok1 = _arr(tenc.dictionary.take(pa.array(utok, pa.int64())))
        return pa.table({
            "token": pa.concat_arrays([tok0, tok2, tok1]),
            "kind": pa.array(np.concatenate([
                np.zeros(nt, np.int8),
                np.full(len(keep_tgt), 2, np.int8),
                np.ones(len(utok), np.int8)]), pa.int8()),
            "doc_id": pa.array(np.concatenate([
                np.zeros(nt + len(keep_tgt), np.int64), udoc]), pa.int64()),
            "v": pa.array(np.concatenate(
                [cnt_all, cnt_tgt[keep_tgt], pcnt]), pa.int64()),
        }).cast(_DSIR_MID)

    return f


def _dsir_join_block(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _DSIR_PARTIAL.empty_table()
    tok = t["token"].combine_chunks().dictionary_encode()
    inv = tok.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nt = len(tok.dictionary)
    kind = t["kind"].combine_chunks().to_numpy(zero_copy_only=False)
    doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
    raw = np.zeros(nt, np.int64)
    tgt = np.zeros(nt, np.int64)
    np.add.at(raw, inv[kind == 0], v[kind == 0])
    np.add.at(tgt, inv[kind == 2], v[kind == 2])
    m1 = kind == 1
    if not m1.any():
        return _DSIR_PARTIAL.empty_table()
    occ = v[m1]
    c_raw = occ * raw[inv[m1]]
    c_tgt = occ * tgt[inv[m1]]
    udoc, dinv = np.unique(doc[m1], return_inverse=True)
    o_t = np.zeros(len(udoc), np.int64)
    o_r = np.zeros(len(udoc), np.int64)
    o_n = np.zeros(len(udoc), np.int64)
    np.add.at(o_t, dinv, c_tgt)
    np.add.at(o_r, dinv, c_raw)
    np.add.at(o_n, dinv, occ)
    return pa.table({
        "doc_id": pa.array(udoc, pa.int64()),
        "tgt_mass": pa.array(o_t, pa.int64()),
        "raw_mass": pa.array(o_r, pa.int64()),
        "n_tokens": pa.array(o_n, pa.int64()),
    }).cast(_DSIR_PARTIAL)


def _dsir_final_block(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _DSIR_PARTIAL.empty_table()
    doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    udoc, dinv = np.unique(doc, return_inverse=True)
    out = {"doc_id": pa.array(udoc, pa.int64())}
    for c in ("tgt_mass", "raw_mass", "n_tokens"):
        acc = np.zeros(len(udoc), np.int64)
        np.add.at(acc, dinv,
                  t[c].combine_chunks().to_numpy(zero_copy_only=False))
        out[c] = pa.array(acc, pa.int64())
    return pa.table(out).cast(_DSIR_PARTIAL)


def dsir_weights(documents_ds, num_partitions: int = 16,
                 target_mod: int = DSIR_TARGET_MOD):
    """Importance-resampling weight components per non-target document
    (Xie et al. 2023 DSIR, integer-exact variant): tgt_mass = Σ over the
    doc's token occurrences of that token's count in the TARGET slice
    (doc_id % target_mod == 0), raw_mass = the same against the whole
    corpus, n_tokens — the log-likelihood-ratio numerator/denominator
    masses emitted as exact int64 so ranking/resampling is the
    consumer's choice and the SQL oracle hash-matches bit-for-bit.
    Same two-exchange plan as :func:`doc_rarity` (one extra tagged
    partial kind riding the same token exchange)."""
    mid = documents_ds.map_batches(_dsir_explode(target_mod),
                                   batch_format="pyarrow")
    mid = mid.repartition(num_blocks=num_partitions, keys=["token"])
    parts = mid.map_batches(_dsir_join_block, batch_format="pyarrow",
                            batch_size=None)
    parts = parts.repartition(num_blocks=max(4, num_partitions // 2),
                              keys=["doc_id"])
    return parts.map_batches(_dsir_final_block, batch_format="pyarrow",
                             batch_size=None)
