"""Distributed byte-level BPE vocabulary training (Sennrich et al. 2016;
the GPT-2 byte-level formulation) — third member of the iterative-
algorithm family (stages/kmeans.py, stages/pagerank.py).

Training never touches token OCCURRENCES after the first exchange: the
corpus reduces to the WORD-TYPE table (distinct whitespace token, count)
— Zipf-bounded, orders of magnitude smaller than the corpus — via one
keyed exchange of per-block ``value_counts`` partials (the wordcount
discipline).  Merge learning then follows the kmeans broadcast pattern:
the immutable word-type table is scanned once per merge round; each
block REPLAYS the merge list so far (broadcast via the task closure,
<= n_merges pairs) over its words, counts adjacent symbol pairs
vectorized (flat int32 symbol buffer + word-id mask, np.unique +
int64 scatter-add — no per-word Python), and ships one (pair, count)
partial per distinct pair per block.  The driver merges dimension-sized
partials, elects argmax with a total deterministic tie-break
(count DESC, pair key ASC), and appends the merge.

Bit-deterministic under any partitioning: integer counts, total
tie-break order, and the replay makes every round a pure function of
(word types, merge list).  pytest pins equality against a single-dict
pure-Python replica.

Symbols: initial ids = UTF-8 byte values 0..255; merge rank r creates
id 256 + r.  The printable ``token`` column decodes the merged byte
string via latin-1 (total, reversible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import _flat_tokens

_WT = pa.schema([("token", pa.string()), ("cnt", pa.int64())])


def word_types(docs_ds, num_partitions: int = 8, text_col: str = "text"):
    """documents -> (token, cnt) word-type Dataset: per-block
    value_counts partials, one token-keyed exchange, per-block combine
    (each token then lives in exactly one block)."""

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = _flat_tokens(t[text_col])
        vc = pc.value_counts(flat)
        return pa.table({
            "token": pc.cast(vc.field("values"), pa.string()),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        }).cast(_WT)

    parts = docs_ds.map_batches(partial, batch_format="pyarrow")
    ex = parts.repartition(num_blocks=num_partitions, keys=["token"])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _WT.empty_table()
        g = t.group_by("token").aggregate([("cnt", "sum")])
        return pa.table({
            "token": g["token"], "cnt": pc.cast(g["cnt_sum"], pa.int64()),
        }).cast(_WT)

    return ex.map_batches(combine, batch_format="pyarrow", batch_size=None)


def _words_to_symbols(tokens: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """string array -> (flat int32 UTF-8 byte symbols, word lengths)."""
    arr = tokens.cast(pa.string())
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset: arr.offset + len(arr) + 1]
    flat = buf[off[0]: off[-1]].astype(np.int32)
    lens = np.diff(off).astype(np.int64)
    return flat, lens


def _apply_merge(flat: np.ndarray, lens: np.ndarray,
                 a: int, b: int, nid: int) -> tuple[np.ndarray, np.ndarray]:
    """Replace every non-overlapping left-to-right (a, b) adjacency
    inside a word with symbol nid.  Vectorized match; overlap resolution
    loops only when a == b (the only case two matches can share a
    position)."""
    n = len(flat)
    if n < 2:
        return flat, lens
    wid = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    match = (flat[:-1] == a) & (flat[1:] == b) & (wid[:-1] == wid[1:])
    p = np.flatnonzero(match)
    if len(p) == 0:
        return flat, lens
    if a == b:
        kept = []
        last = -2
        for i in p:
            if i > last + 1:
                kept.append(i)
                last = i
        p = np.asarray(kept, dtype=np.int64)
    out = flat.copy()
    out[p] = nid
    keep = np.ones(n, bool)
    keep[p + 1] = False
    new_lens = lens - np.bincount(wid[p], minlength=len(lens)).astype(np.int64)
    return out[keep], new_lens


def _pair_counts(flat: np.ndarray, lens: np.ndarray,
                 cnt: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (pair keys int64 (left<<32|right), weighted counts int64)."""
    if len(flat) < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    wid = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    m = wid[:-1] == wid[1:]
    key = (flat[:-1][m].astype(np.int64) << 32) | flat[1:][m].astype(np.int64)
    w = cnt[wid[:-1][m]]
    uniq, inv = np.unique(key, return_inverse=True)
    tot = np.zeros(len(uniq), np.int64)
    np.add.at(tot, inv, w)
    return uniq, tot


def _count_partial_fn(merges: list[tuple[int, int]]):
    def f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        flat, lens = _words_to_symbols(t["token"].combine_chunks())
        cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        for r, (a, b) in enumerate(merges):
            flat, lens = _apply_merge(flat, lens, a, b, 256 + r)
        key, n = _pair_counts(flat, lens, cnt)
        return pa.table({"key": pa.array(key, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    return f


def bpe_train(docs_ds, n_merges: int = 30, num_partitions: int = 8,
              text_col: str = "text") -> pa.Table:
    """documents -> BPE merge table (rank, left, right, new_id, n,
    token): n_merges rounds, each one scan of the materialized word-type
    table with the merge list replayed per block.  Driver work per round
    is dimension-sized (distinct pairs across blocks)."""
    wt = word_types(docs_ds, num_partitions=num_partitions,
                    text_col=text_col).materialize()
    merges: list[tuple[int, int]] = []
    rows = []
    sym_bytes: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    for r in range(n_merges):
        parts = wt.map_batches(_count_partial_fn(list(merges)),
                               batch_format="pyarrow")
        key_l, n_l = [], []
        for b in parts.iter_batches(batch_format="pyarrow"):
            t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            if "key" in t.column_names and len(t):
                key_l.append(t["key"].to_numpy())
                n_l.append(t["n"].to_numpy())
        if not key_l:
            break
        key = np.concatenate(key_l)
        n = np.concatenate(n_l)
        uniq, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, n)
        best = int(tot.max())
        if best < 2:  # nothing left worth merging
            break
        cand = uniq[tot == best]
        k = int(cand.min())  # total tie-break: count DESC, key ASC
        a, b_ = k >> 32, k & 0xFFFFFFFF
        nid = 256 + r
        sym_bytes[nid] = sym_bytes[a] + sym_bytes[b_]
        merges.append((a, b_))
        rows.append((r, a, b_, nid, best,
                     sym_bytes[nid].decode("latin-1")))
    if not rows:
        return pa.table({c: pa.array([], t) for c, t in (
            ("rank", pa.int64()), ("left", pa.int64()), ("right", pa.int64()),
            ("new_id", pa.int64()), ("n", pa.int64()), ("token", pa.string()))})
    rk, lf, rt, ni, nn, tk = zip(*rows)
    return pa.table({
        "rank": pa.array(rk, pa.int64()), "left": pa.array(lf, pa.int64()),
        "right": pa.array(rt, pa.int64()), "new_id": pa.array(ni, pa.int64()),
        "n": pa.array(nn, pa.int64()), "token": pa.array(tk, pa.string()),
    })


def bpe_train_reference(word_counts: dict[str, int],
                        n_merges: int = 30) -> list[tuple[int, int, int]]:
    """Single-dict pure-Python replica (same tie-break): returns
    [(left, right, count), ...] for pytest equality."""
    words = {w: [int(x) for x in w.encode("utf-8")] for w in word_counts}
    out = []
    for r in range(n_merges):
        counts: dict[tuple[int, int], int] = {}
        for w, syms in words.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                counts[pr] = counts.get(pr, 0) + c
        if not counts:
            break
        best = max(counts.values())
        if best < 2:
            break
        a, b = min(p for p, v in counts.items() if v == best)
        nid = 256 + r
        for w, syms in words.items():
            i, ns = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(nid)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            words[w] = ns
        out.append((a, b, best))
    return out


_ENC = pa.schema([
    ("doc_id", pa.int64()), ("n_words", pa.int64()),
    ("n_bytes", pa.int64()), ("n_bpe", pa.int64()),
])


def bpe_encode_stats(docs_ds, merges: list[tuple[int, int]],
                     text_col: str = "text"):
    """documents -> (doc_id, n_words, n_bytes, n_bpe): encode every doc
    with a TRAINED merge list and report the tokenizer-fertility stats
    (n_bpe = symbol count after all merges; n_bytes = UTF-8 token bytes
    before merging; bytes-per-token = the compression the tokenizer
    achieves on this doc — the curation signal for tokenizer-hostile
    text).

    One streaming pass, zero exchange: the merge list broadcasts in the
    task closure (<= n_merges pairs); each block encodes its DISTINCT
    words once (dictionary encode, then the same _apply_merge replay the
    trainer uses) and scatters the per-word encoded lengths back to docs
    with one bincount.  Deterministic: encoding is a pure function of
    (word, merge list)."""
    merges = list(merges)

    def enc(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _ENC.empty_table()
        flat_words, row_of, n_rows = _flat_tokens(t[text_col])
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(flat_words) == 0:
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(np.zeros(n_rows, np.int64), pa.int64()),
                "n_bytes": pa.array(np.zeros(n_rows, np.int64), pa.int64()),
                "n_bpe": pa.array(np.zeros(n_rows, np.int64), pa.int64()),
            }).cast(_ENC)
        dec = flat_words.dictionary_encode()
        wcode = dec.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = dec.dictionary
        flat, lens = _words_to_symbols(uniq)
        raw_len = lens.copy()
        for r, (a, b) in enumerate(merges):
            flat, lens = _apply_merge(flat, lens, a, b, 256 + r)
        n_words = np.bincount(row_of, minlength=n_rows).astype(np.int64)
        n_bytes = np.bincount(row_of, weights=raw_len[wcode],
                              minlength=n_rows).astype(np.int64)
        n_bpe = np.bincount(row_of, weights=lens[wcode],
                            minlength=n_rows).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "n_bpe": pa.array(n_bpe, pa.int64()),
        }).cast(_ENC)

    return docs_ds.select_columns(["doc_id", text_col]).map_batches(
        enc, batch_format="pyarrow")


def bpe_encode_reference(text: str, merges: list[tuple[int, int]]) -> int:
    """Pure-Python per-doc n_bpe replica for pytest."""
    total = 0
    for word in text.split():
        syms = list(word.encode("utf-8"))
        for r, (a, b) in enumerate(merges):
            nid = 256 + r
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(nid)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        total += len(syms)
    return total
