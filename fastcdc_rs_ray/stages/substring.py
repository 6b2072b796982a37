"""Suffix-array-substring dedup tier: duplicated substrings of length >= L.

The north rule names three near-dup families — MinHash, SimHash and
"suffix-array substring".  This stage is the third: find every character
position covered by a substring of length >= L that occurs more than once
anywhere in the corpus (the training-data dedup formulation of Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better", which
computes the same relation with a monolithic suffix array).  A position is
covered by a duplicate span of length >= L iff it is covered by some
duplicated L-gram, so duplicated fixed-length grams give the *exact* same
coverage/spans as the suffix-array formulation while decomposing into Ray
Data exchanges.

Pipeline (all Arrow, all vectorized):

1. ``gram_rows``       map_batches: rolling 64-bit polynomial hash of every
                       L-char window, computed zero-copy over the Arrow
                       string values buffer (same buffer-walk discipline as
                       the CDC gear kernel, reference src/v2020/mod.rs
                       350-409 — hash state never crosses a row boundary).
2. repartition(keys=["gram_key"])   hash-exchange co-locates equal grams.
3. ``_mark_dup_block`` per block: sort, keep rows of globally-duplicated
                       grams (run length >= 2).  Output is proportional to
                       *duplicated* content only.
4. repartition(keys=["doc_id"])     co-locate each document's dup rows.
5. ``_doc_spans_block`` / ``_doc_counts_block``: merged-interval maximal
                       spans, or per-doc (dup_grams, dup_chars).

Exactness: two distinct grams colliding in the 64-bit hash could mark a
unique gram as duplicated; at P(collision) ~ G^2/2^65 this is negligible
for the oracle-checked scales and self-correcting downstream (a verifier
may re-check bytes).  Positions are emitted 1-based to match SQL
``substring`` semantics, and L counts characters == bytes (corpus is
ASCII; a non-ASCII corpus would chunk on bytes and report byte offsets).

Scale path (100 TB): step 2 exchanges one 20-byte row per character —
exact but traffic-heavy.  The documented mitigation is a winnowing
prefilter (Schleimer et al. 2003: window w = L - k + 1 over k-gram hashes
guarantees every duplicate of length >= L shares a fingerprint), which
exchanges ~2/(w+1) of the rows to find candidate doc pairs, then extends
matches exactly per co-located pair; same output, 1/w the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import mix64, string_buffers

L_DEFAULT = 30
# odd multiplier => invertible mod 2^64 (golden-ratio constant)
_B = np.uint64(0x9E3779B97F4A7C15)
_B_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def _empty_gram_table() -> pa.Table:
    return pa.table(
        {
            "gram_key": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int32()),
        }
    )


# cap on the uint64 temporaries (pw/ipw/pre/terms are each 8x the text
# bytes): one slice of rows is processed per <=8 MiB of text
_BYTE_BUDGET = 8 << 20


def segment_wide_rows(t: pa.Table, window: int,
                      budget: int = _BYTE_BUDGET) -> tuple[pa.Table, np.ndarray]:
    """Split rows whose text exceeds ``budget`` bytes into overlapping
    segments so any window-of-``window``-bytes kernel stays memory-bounded.

    Segment i covers window starts [i*budget, (i+1)*budget) of the original
    row, so its text is the byte range [i*budget, (i+1)*budget + window - 1)
    — exact for any kernel whose output at start p depends only on bytes
    [p, p + window).  Returns the (possibly expanded) table plus a per-row
    int64 position offset to add to kernel outputs.  The common case (no
    oversized rows) returns ``t`` unchanged with zero offsets.
    """
    offsets, _ = string_buffers(t["text"])
    lens = np.diff(offsets)
    wide = np.flatnonzero(lens > budget + window - 1)
    if len(wide) == 0:
        return t, np.zeros(len(t), dtype=np.int64)
    texts = t["text"].combine_chunks()
    docs = t["doc_id"].combine_chunks()
    out_ids, out_txt, out_off = [], [], []
    wide_set = set(wide.tolist())
    for i in range(len(t)):
        if i not in wide_set:
            out_ids.append(docs[i].as_py())
            out_txt.append(texts[i].as_py())
            out_off.append(0)
            continue
        s = texts[i].as_py()
        d = docs[i].as_py()
        for a in range(0, max(len(s) - window + 1, 1), budget):
            out_ids.append(d)
            out_txt.append(s[a : a + budget + window - 1])
            out_off.append(a)
    t2 = pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "text": pa.array(out_txt, pa.string()),
        }
    )
    return t2, np.asarray(out_off, dtype=np.int64)


def iter_row_slices(t: pa.Table, budget: int = _BYTE_BUDGET):
    """Yield row-contiguous table slices each holding <= ``budget`` text
    bytes (single rows may exceed it; pre-split those with
    :func:`segment_wide_rows`)."""
    offsets, _ = string_buffers(t["text"])
    total_bytes = int(offsets[-1] - offsets[0])
    if total_bytes <= budget or len(t) <= 1:
        yield t, 0
        return
    bounds = np.searchsorted(
        offsets - offsets[0], np.arange(budget, total_bytes, budget)
    )
    prev = 0
    for b in list(np.unique(np.clip(bounds, 1, len(t)))) + [len(t)]:
        if b > prev:
            yield t.slice(prev, b - prev), prev
            prev = b


def gram_rows(t: pa.Table, L: int = L_DEFAULT) -> pa.Table:
    """One row per L-char window: (gram_key, doc_id, pos[0-based]).

    Rolling polynomial hash over the batch's values buffer in O(n): with
    prefix sums ``pre[i] = sum_{j<i} data[j] * B^j (mod 2^64)``, the
    window hash is ``(pre[i+L] - pre[i]) * B^-i`` — exact uint64
    wraparound, no per-row Python loop, independent of neighboring rows.
    Oversized rows are segmented (overlap L-1) and batches processed in
    row slices, so the uint64 temporaries stay bounded regardless of
    document size.
    """
    if len(t) == 0:
        return _empty_gram_table()
    t, seg_off = segment_wide_rows(t, L, _BYTE_BUDGET)
    parts = []
    for sl, row0 in iter_row_slices(t, _BYTE_BUDGET):
        keys, row_idx, pos = window_hashes(sl, L)
        if len(keys) == 0:
            continue
        docs = sl["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        off = seg_off[row0 : row0 + len(sl)]
        if off.any():  # re-base positions of segmented rows
            pos = pos + off[row_idx]
        parts.append(
            pa.table(
                {
                    "gram_key": pa.array(keys, pa.uint64()),
                    "doc_id": pa.array(docs[row_idx], pa.int64()),
                    "pos": pa.array(pos.astype(np.int32), pa.int32()),
                }
            )
        )
    if not parts:
        return _empty_gram_table()
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]


def window_hashes(t: pa.Table, L: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mixed 64-bit hash of every L-char window of every row of ``t``.

    Returns ``(keys u64, row_idx i64, pos i64)`` — one entry per valid
    window, grouped by row in position order.  Shared core of the exact
    substring tier and the winnowing prefilter.
    """
    offsets, data = string_buffers(t["text"])
    lo, hi = int(offsets[0]), int(offsets[-1])
    lens = np.diff(offsets)
    cnt = np.maximum(lens - L + 1, 0)
    total = int(cnt.sum())
    e = np.empty(0, dtype=np.int64)
    if total == 0:
        return e.astype(np.uint64), e, e
    window = data[lo:hi].astype(np.uint64)
    n = hi - lo
    # B^0..B^(n-1) and B^-0..B^-(n-1) via wrapping cumulative products
    pw = np.empty(n, dtype=np.uint64)
    pw[0] = 1
    if n > 1:
        np.multiply.accumulate(np.full(n - 1, _B, dtype=np.uint64), out=pw[1:])
    ipw = np.empty(n, dtype=np.uint64)
    ipw[0] = 1
    if n > 1:
        np.multiply.accumulate(np.full(n - 1, _B_INV, dtype=np.uint64), out=ipw[1:])
    pre = np.empty(n + 1, dtype=np.uint64)
    pre[0] = 0
    np.add.accumulate(window * pw, out=pre[1:])
    # valid gram starts: for each row, [row_start, row_end - L]
    row_rel = (offsets[:-1] - lo).astype(np.int64)
    row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), cnt)
    shift = np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
    pos = (np.arange(total, dtype=np.int64) - shift).astype(np.int64)
    g = np.repeat(row_rel, cnt) + pos
    h = (pre[g + L] - pre[g]) * ipw[g]
    return mix64(h), row_idx, pos




def _mark_dup_block(t: pa.Table) -> pa.Table:
    """Keyed-colocated block -> rows whose gram occurs >= 2 times globally
    (equal keys never straddle blocks after the keyed repartition)."""
    n = len(t)
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int32())}
        )
    keys = t["gram_key"].combine_chunks().to_numpy()
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    brk = np.concatenate(([True], ks[1:] != ks[:-1]))
    run_id = np.cumsum(brk) - 1
    run_len = np.bincount(run_id)
    dup = run_len[run_id] >= 2
    sel = pa.array(order[dup], pa.int64())
    return pa.table(
        {
            "doc_id": t["doc_id"].combine_chunks().take(sel),
            "pos": t["pos"].combine_chunks().take(sel),
        }
    )


def _sorted_dup_rows(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    p = t["pos"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((p, d))
    return d[order], p[order]


def _doc_spans_block(t: pa.Table, L: int) -> pa.Table:
    """Doc-colocated dup rows -> maximal duplicate spans (1-based starts).

    Fixed-length intervals [pos, pos+L) sorted by pos merge iff the gap
    between consecutive starts is <= L; the merged islands are exactly the
    maximal substrings every position of which lies in some duplicated
    L-gram.
    """
    if len(t) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_len": pa.array([], pa.int64()),
            }
        )
    d, p = _sorted_dup_rows(t)
    new_doc = d[1:] != d[:-1]
    gap = (p[1:] - p[:-1]) > L
    brk = np.concatenate(([True], new_doc | gap))
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], len(d)) - 1
    return pa.table(
        {
            "doc_id": pa.array(d[starts], pa.int64()),
            "span_start": pa.array(p[starts] + 1, pa.int64()),
            "span_len": pa.array(p[ends] + L - p[starts], pa.int64()),
        }
    )


def _doc_counts_block(t: pa.Table, L: int) -> pa.Table:
    """Doc-colocated dup rows -> (doc_id, dup_grams, dup_chars)."""
    if len(t) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "dup_grams": pa.array([], pa.int64()),
                "dup_chars": pa.array([], pa.int64()),
            }
        )
    d, p = _sorted_dup_rows(t)
    new_doc = np.concatenate(([True], d[1:] != d[:-1]))
    doc_starts = np.flatnonzero(new_doc)
    dup_grams = np.diff(np.append(doc_starts, len(d)))
    # per-gram marginal coverage: min(next_start - start, L) within a doc,
    # L for the doc's last gram -> sum per doc == merged-interval coverage
    marg = np.full(len(d), L, dtype=np.int64)
    same = ~(np.concatenate((d[1:] != d[:-1], [True])))
    nxt = np.empty(len(d), dtype=np.int64)
    nxt[:-1] = p[1:] - p[:-1]
    nxt[-1] = L
    marg[same] = np.minimum(nxt[same], L)
    dup_chars = np.add.reduceat(marg, doc_starts)
    return pa.table(
        {
            "doc_id": pa.array(d[doc_starts], pa.int64()),
            "dup_grams": pa.array(dup_grams, pa.int64()),
            "dup_chars": pa.array(dup_chars, pa.int64()),
        }
    )


def _dup_rows_raw(docs_ds, L: int, num_partitions: int):
    """documents -> un-colocated (doc_id, pos) rows of duplicated L-grams
    (one gram_key exchange)."""
    rows = docs_ds.map_batches(
        lambda t: gram_rows(t, L), batch_format="pyarrow", batch_size=1024
    )
    rows = rows.repartition(num_blocks=num_partitions, keys=["gram_key"])
    return rows.map_batches(_mark_dup_block, batch_format="pyarrow", batch_size=None)


def duplicated_gram_rows(docs_ds, L: int = L_DEFAULT, num_partitions: int = 16):
    """documents Dataset -> doc-colocated (doc_id, pos) rows of duplicated
    L-grams.  Two keyed exchanges: gram_key (wide), then doc_id (narrow —
    proportional to duplicated content only)."""
    dup = _dup_rows_raw(docs_ds, L, num_partitions)
    return dup.repartition(num_blocks=max(4, num_partitions // 2), keys=["doc_id"])


def substring_spans(docs_ds, L: int = L_DEFAULT, num_partitions: int = 16):
    """Maximal duplicated substrings >= L: (doc_id, span_start[1-based],
    span_len) — what a training-data dedup pass would cut."""
    dup = duplicated_gram_rows(docs_ds, L, num_partitions)
    return dup.map_batches(
        lambda t: _doc_spans_block(t, L), batch_format="pyarrow", batch_size=None
    )


def substring_dups(docs_ds, L: int = L_DEFAULT, num_partitions: int = 16):
    """Per-document duplicated-substring accounting: (doc_id, dup_grams,
    dup_chars) for every document containing a duplicated L-gram."""
    dup = duplicated_gram_rows(docs_ds, L, num_partitions)
    return dup.map_batches(
        lambda t: _doc_counts_block(t, L), batch_format="pyarrow", batch_size=None
    )


def substring_clean(docs_ds, L: int = L_DEFAULT, num_partitions: int = 16):
    """The dedup *action*: every document with its duplicate-covered
    positions removed (Lee et al. 2022's training-data cut), unchanged docs
    passed through.  (doc_id, clean_text).

    One tag-union keyed exchange co-locates each document's text row with
    its duplicated-gram rows; the per-block cut walks merged spans per doc.
    """
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("pos", pa.int32()),
            ("text", pa.string()),
            ("tag", pa.int8()),
        ]
    )

    def dup_side(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pos": t["pos"],
                "text": pa.nulls(n, pa.string()),
                "tag": pa.array(np.ones(n, np.int8), pa.int8()),
            }
        ).cast(schema)

    def text_side(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pos": pa.nulls(n, pa.int32()),
                "text": t["text"],
                "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        ).cast(schema)

    dup = _dup_rows_raw(docs_ds, L, num_partitions)
    mixed = dup.map_batches(dup_side, batch_format="pyarrow").union(
        docs_ds.map_batches(text_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=max(4, num_partitions // 2), keys=["doc_id"])

    def cut_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "clean_text": pa.array([], pa.string())}
        )
        if len(t) == 0:
            return empty
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tsel = np.flatnonzero(tag == 0)
        if len(tsel) == 0:
            return empty
        dsel = np.flatnonzero(tag == 1)
        texts = t["text"].combine_chunks()
        # spans per doc from its sorted dup positions
        spans: dict[int, list[tuple[int, int]]] = {}
        if len(dsel):
            dd = did[dsel]
            pp = t["pos"].combine_chunks().to_numpy(zero_copy_only=False)[dsel]
            order = np.lexsort((pp, dd))
            dd, pp = dd[order], pp[order]
            brk = np.concatenate(
                ([True], (dd[1:] != dd[:-1]) | ((pp[1:] - pp[:-1]) > L))
            )
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], len(dd)) - 1
            for s, e in zip(starts, ends):
                spans.setdefault(int(dd[s]), []).append((int(pp[s]), int(pp[e]) + L))
        # untouched docs (the common case) pass through zero-copy; only
        # docs that actually have spans go through Python string surgery
        has_span = np.array([int(did[j]) in spans for j in tsel])
        clean_sel = tsel[~has_span]
        out = [
            pa.table(
                {
                    "doc_id": pa.array(did[clean_sel], pa.int64()),
                    "clean_text": texts.take(pa.array(clean_sel, pa.int64())),
                }
            )
        ]
        out_ids, out_txt = [], []
        for j in tsel[has_span]:
            d = int(did[j])
            s = texts[j].as_py()
            parts, prev = [], 0
            for a, b in spans[d]:
                parts.append(s[prev:a])
                prev = b
            parts.append(s[prev:])
            out_ids.append(d)
            out_txt.append("".join(parts))
        if out_ids:
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(out_ids, pa.int64()),
                        "clean_text": pa.array(out_txt, pa.string()),
                    }
                )
            )
        return pa.concat_tables(out)

    return mixed.map_batches(cut_block, batch_format="pyarrow", batch_size=None)
