"""Deduplication operators over a documents-style table.

The dedup tier of a training-data pipeline, each expressed Ray-Data-first:

- :func:`exact_dedup` — identical-content dedup: hash-partition on a
  content hash, keep the minimum id per group.  One shuffle, no driver
  state; the classic CDC application (reference README.md:3 "data
  deduplication") lifted to table scale.
- :func:`simhash_signatures` / :func:`simhash_pairs` — 64-bit SimHash over
  token hashes; near-dup candidates = signatures within ``max_hamming``
  bits, found by the standard 4-block Hamming trick (any pair within
  distance 3 shares at least one of 4 16-bit blocks exactly — pigeonhole),
  i.e. 4 hash-partitioned groupbys, never an O(n^2) scan.
- :func:`ngram_jaccard_pairs` — word n-gram (shingle) Jaccard similarity
  join: explode distinct shingles, hash-shuffle on shingle, emit pair
  intersection counts per group, aggregate, filter on Jaccard >= tau.
  Mirrored exactly by a DuckDB oracle (pipelines.queries).

Scale notes (10^12-row deployment): the pair-count aggregate keys on
(src, dst) — a second shuffle; shingle groups are bounded by stopword-like
hot shingles, so `max_group` caps group pair fan-out (hot shingles carry
negligible Jaccard evidence; the cap is recorded in the stage's metrics
rather than silently dropped).  Doc shingle-set sizes travel with the pair
rows (no driver-side size map).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import tokenize_hashes
from ..util import U64, hash_str_array_u64, mix64


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 32):
    """Keep the minimum ``id_col`` row id per distinct ``text_col`` value.

    Returns a Dataset with a single ``doc_id`` column (the survivors).
    Partial per-batch reduction before the shuffle keeps the exchange
    proportional to the number of *distinct* texts per block, not rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        h = hash_str_array_u64(t[text_col])
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        h, ids = h[order], ids[order]
        first = np.concatenate([[True], h[1:] != h[:-1]])
        return pa.table(
            {
                "content_hash": pa.array(h[first], pa.uint64()),
                id_col: pa.array(ids[first], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    partials = partials.repartition(num_blocks=num_partitions, keys=["content_hash"])

    def final(t: pa.Table) -> pa.Table:
        h = t["content_hash"].combine_chunks().to_numpy()
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        h, ids = h[order], ids[order]
        first = np.concatenate([[True], h[1:] != h[:-1]]) if len(h) else np.empty(0, bool)
        return pa.table({id_col: pa.array(ids[first], pa.int64())})

    return partials.map_batches(final, batch_format="pyarrow", batch_size=None)


def normalized_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                     num_partitions: int = 32):
    """Exact dedup keyed on a NORMALIZED text form (lowercase + whitespace
    runs collapsed to one space + trimmed) — the near-exact tier between
    byte-identical dedup and MinHash: catches reflow/case variants of the
    same document that :func:`exact_dedup` misses, at the identical
    one-exchange cost.

    The normalization kernels are vectorized Arrow compute (RE2
    ``replace_substring_regex`` + ``utf8_lower``), the same regex engine
    and pattern the DuckDB oracle's ``regexp_replace`` runs, so the
    grouping keys agree byte-for-byte.  The normalized string never leaves
    the block: the partial reduces it to a 64-bit key immediately (same
    scale posture as exact_dedup; a strong 128-bit key is the documented
    swap if 64-bit birthday collisions matter at 10^12 rows).
    """

    def norm(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t[text_col].combine_chunks())
        x = pc.replace_substring_regex(x, pattern="[ \\t\\r\\n]+",
                                       replacement=" ")
        x = pc.utf8_trim(x, " ")
        return pa.table({id_col: t[id_col], text_col: x})

    return exact_dedup(ds.map_batches(norm, batch_format="pyarrow"),
                       text_col=text_col, id_col=id_col,
                       num_partitions=num_partitions)


NORMALIZED_DEDUP_SQL = """
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
FROM documents
GROUP BY lower(trim(regexp_replace(text, '[ \\t\\r\\n]+', ' ', 'g'), ' '))
"""


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_batch(t: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """documents batch -> (doc_id, simhash uint64).

    Bit b of the signature is 1 iff the sum over the document's tokens of
    (+1 if token_hash bit b else -1) is positive.  Fully vectorized:
    unpack token-hash bits to a (tokens, 64) matrix, segment-sum per doc.
    """
    th, offsets = tokenize_hashes(t, text_col)
    n = len(t)
    bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    signed = bits.astype(np.int32) * 2 - 1  # (tokens, 64)
    sums = np.zeros((n, 64), dtype=np.int64)
    nonempty = np.diff(offsets) > 0
    if len(th):
        red = np.add.reduceat(signed, offsets[:-1][nonempty], axis=0)
        sums[nonempty] = red
    sig_bits = (sums > 0).astype(np.uint8)
    sig = np.packbits(sig_bits, axis=1, bitorder="little").copy().view(np.uint64).reshape(n)
    return pa.table(
        {
            id_col: t[id_col],
            "simhash": pa.array(sig, pa.uint64()),
        }
    )


def simhash_signatures(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda t: simhash_batch(t, id_col, text_col), batch_format="pyarrow"
    )


_N_BLOCKS = 4  # 16-bit blocks -> exact recall for hamming distance <= 3


def simhash_pairs(sig_ds, max_hamming: int = 3, num_partitions: int = 16,
                  id_col: str = "doc_id"):
    """signatures -> candidate near-dup pairs (src, dst) with
    hamming(simhash) <= max_hamming (<= _N_BLOCKS - 1 for exact recall).

    Pigeonhole: distance <= 3 implies at least one of the 4 16-bit blocks
    matches exactly; one groupby per block, verification inside the group.
    """
    if max_hamming >= 16 * (_N_BLOCKS - 1):
        raise ValueError("max_hamming too large for the 4-block scheme")

    def explode(t: pa.Table) -> pa.Table:
        n = len(t)
        sig = t["simhash"].combine_chunks().to_numpy()
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        blocks = np.arange(_N_BLOCKS, dtype=np.uint64)
        key = (sig[:, None] >> (blocks[None, :] * U64(16))) & U64(0xFFFF)
        key = key | (blocks[None, :] << U64(48))  # disambiguate block id
        return pa.table(
            {
                "block_key": pa.array(key.reshape(-1), pa.uint64()),
                id_col: pa.array(np.repeat(ids, _N_BLOCKS), pa.int64()),
                "simhash": pa.array(np.repeat(sig, _N_BLOCKS), pa.uint64()),
            }
        )

    exploded = sig_ds.map_batches(explode, batch_format="pyarrow")
    exploded = exploded.repartition(num_blocks=num_partitions, keys=["block_key"])

    def emit(t: pa.Table) -> pa.Table:
        n = len(t)
        empty = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        if n < 2:
            return empty
        key = t["block_key"].combine_chunks().to_numpy()
        sig = t["simhash"].combine_chunks().to_numpy()
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key))
        key, sig, ids = key[order], sig[order], ids[order]
        starts = np.concatenate([[0], np.flatnonzero(key[1:] != key[:-1]) + 1, [n]])
        src_l, dst_l = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            if e - s < 2:
                continue
            gs, gi = sig[s:e], ids[s:e]
            x = gs[:, None] ^ gs[None, :]
            # vectorized popcount via uint8 view
            d = np.unpackbits(x.view(np.uint8), axis=-1).reshape(len(gs), len(gs), 64).sum(-1)
            ii, jj = np.nonzero(np.triu(d <= max_hamming, k=1))
            src_l.append(np.minimum(gi[ii], gi[jj]))
            dst_l.append(np.maximum(gi[ii], gi[jj]))
        if not src_l:
            return empty
        src = np.concatenate(src_l)
        dst = np.concatenate(dst_l)
        pair = src.astype(np.uint64) << U64(32) | dst.astype(np.uint64)
        _, uniq = np.unique(pair, return_index=True)
        return pa.table(
            {
                "src": pa.array(src[uniq], pa.int64()),
                "dst": pa.array(dst[uniq], pa.int64()),
            }
        )

    pairs = exploded.map_batches(emit, batch_format="pyarrow", batch_size=None)
    # blocks can duplicate a pair across block groups -> global distinct via
    # one keyed shuffle + a vectorized per-block unique (Ray's generic hash
    # aggregate is overkill for this shape)
    pairs = pairs.repartition(num_blocks=max(4, num_partitions // 4),
                              keys=["src", "dst"])

    def distinct(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        first = np.concatenate(
            [[True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
        )
        return pa.table(
            {"src": pa.array(src[first], pa.int64()), "dst": pa.array(dst[first], pa.int64())}
        )

    return pairs.map_batches(distinct, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# n-gram Jaccard similarity join
# --------------------------------------------------------------------------


def _shingles_per_row(th: np.ndarray, offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct word-k-gram hashes per row.

    Returns (flat shingle hashes, per-row offsets).  A row with fewer than
    ``k`` tokens contributes no shingles (mirrors the SQL oracle, whose
    generate_series is empty then).
    """
    counts = np.diff(offsets)
    sh_counts = np.maximum(counts - (k - 1), 0)
    out_h, out_off = [], np.zeros(len(counts) + 1, dtype=np.int64)
    acc = 0
    for i, (s, c, m) in enumerate(zip(offsets[:-1], counts, sh_counts)):
        if m > 0:
            seg = th[s : s + c]
            sh = mix64(seg[:m].copy())
            for j in range(1, k):
                sh = mix64(sh ^ seg[j : j + m])
            sh = np.unique(sh)
            out_h.append(sh)
            acc += len(sh)
        out_off[i + 1] = acc
    flat = np.concatenate(out_h) if out_h else np.empty(0, np.uint64)
    return flat, out_off


def ngram_jaccard_pairs(ds, k: int = 3, tau: float = 0.8, num_partitions: int = 32,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_group: int = 4096):
    """documents -> (src, dst) pairs with word-k-gram Jaccard >= tau.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) over *distinct* shingles, computed
    without ever holding a doc-size map on the driver: each exploded shingle
    row carries its document's shingle-set size, so the per-pair aggregate
    has everything it needs.  Shingle groups larger than ``max_group`` are
    dropped (hot boilerplate shingles — the one O(g^2) blowup in the tier);
    set-size denominators still count them, so computed Jaccard is a lower
    bound of the true value and the cap only ever LOWERS recall, never
    precision.  The cap is part of the defined semantics: the ngram_dups
    SQL oracle applies the identical exclusion (queries.NGRAM_MAX_GROUP).
    """

    def explode(t: pa.Table) -> pa.Table:
        th, offsets = tokenize_hashes(t, text_col)
        flat, off = _shingles_per_row(th, offsets, k)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sizes = np.diff(off)
        return pa.table(
            {
                "shingle": pa.array(flat, pa.uint64()),
                id_col: pa.array(np.repeat(ids, sizes), pa.int64()),
                "set_size": pa.array(np.repeat(sizes, sizes), pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    exploded = exploded.repartition(num_blocks=num_partitions, keys=["shingle"])

    def emit_pairs(t: pa.Table) -> pa.Table:
        n = len(t)
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "src_size": pa.array([], pa.int64()),
                "dst_size": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        sh = t["shingle"].combine_chunks().to_numpy()
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sz = t["set_size"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sh))
        sh, ids, sz = sh[order], ids[order], sz[order]
        starts = np.concatenate([[0], np.flatnonzero(sh[1:] != sh[:-1]) + 1, [n]])
        src_l, dst_l, ss_l, ds_l = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            g = e - s
            if g < 2 or g > max_group:
                continue
            gi, gz = ids[s:e], sz[s:e]
            ii, jj = np.triu_indices(g, k=1)
            src_l.append(gi[ii]); dst_l.append(gi[jj])
            ss_l.append(gz[ii]); ds_l.append(gz[jj])
        if not src_l:
            return empty
        return pa.table(
            {
                "src": pa.array(np.concatenate(src_l), pa.int64()),
                "dst": pa.array(np.concatenate(dst_l), pa.int64()),
                "src_size": pa.array(np.concatenate(ss_l), pa.int64()),
                "dst_size": pa.array(np.concatenate(ds_l), pa.int64()),
            }
        )

    pairs = exploded.map_batches(emit_pairs, batch_format="pyarrow", batch_size=None)
    # pair-intersection counting: one keyed shuffle co-locates all rows of a
    # (src, dst) pair, then a vectorized per-block count + Jaccard filter
    # (sizes ride along on every row, so no driver state and no join)
    pairs = pairs.repartition(num_blocks=max(4, num_partitions // 4),
                              keys=["src", "dst"])

    def combine_filter(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        n = len(t)
        if n == 0:
            return empty
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        a = t["src_size"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["dst_size"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst, a, b = src[order], dst[order], a[order], b[order]
        new = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        firsts = np.concatenate([[0], np.flatnonzero(new) + 1])
        counts = np.diff(np.concatenate([firsts, [n]])).astype(np.float64)
        av = a[firsts].astype(np.float64)
        bv = b[firsts].astype(np.float64)
        jac = counts / (av + bv - counts)
        keep = firsts[jac >= tau]
        return pa.table(
            {"src": pa.array(src[keep], pa.int64()), "dst": pa.array(dst[keep], pa.int64())}
        )

    return pairs.map_batches(combine_filter, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# chunk-set Jaccard similarity join (CDC-native file similarity)
# --------------------------------------------------------------------------


def chunk_jaccard_pairs(chunks_ds, tau_milli: int = 500,
                        num_partitions: int = 16, max_group: int = 4096):
    """Conversation pairs whose CDC chunk sets overlap with Jaccard >=
    tau_milli/1000 — the classic backup/crawl "file similarity by chunk
    overlap" analysis (the exact-tier counterpart of the MinHash flagship:
    same evidence, no approximation; viable while shared-chunk groups stay
    bounded, which content-defined chunks — unlike word shingles — are:
    the element universe grows with the corpus, so a chunk hash recurring
    across many documents IS the duplication being measured).

    Element identity mixes the chunk length into the gear hash
    (``mix64(hash ^ mix64(length))``) because the reference's sub-min runt
    chunks all carry hash 0 (src/v2020/mod.rs:429-432) and would alias
    across conversations.  Per-block per-conv distinct relies on the chunk
    stage's conv-atomicity (one conversation's chunks never split across
    blocks).  Pairing/combine discipline = :func:`ngram_jaccard_pairs`
    (explode with set_size riding along, KR(elem), pair partials,
    KR(src,dst) combine) with the keep predicate cross-multiplied in
    integers: ``1000*c >= tau_milli*(na + nb - c)`` — no float boundary.
    conv_id strings re-attach at the end from one broadcast-filtered scan
    (endpoint set is candidate-sized).

    Returns a driver-side ``pa.Table`` (src, dst) of conv_id pairs,
    src < dst lexicographically.
    """
    import ray

    chunks_ds = chunks_ds.materialize()  # pairing pass + endpoint attach pass

    def explode(t: pa.Table) -> pa.Table:
        ck = hash_str_array_u64(t["conv_id"])
        h = t["hash"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = t["length"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
        elem = mix64(h.astype(np.uint64) ^ mix64(ln))
        order = np.lexsort((elem, ck))
        ck, elem = ck[order], elem[order]
        first = np.concatenate([[True], (ck[1:] != ck[:-1]) |
                                (elem[1:] != elem[:-1])]) \
            if len(ck) else np.empty(0, bool)
        ck, elem = ck[first], elem[first]
        starts = np.concatenate([[0], np.flatnonzero(ck[1:] != ck[:-1]) + 1,
                                 [len(ck)]]) if len(ck) else np.zeros(1, np.int64)
        sizes = np.diff(starts)
        return pa.table({
            "elem": pa.array(elem, pa.uint64()),
            "ck": pa.array(ck, pa.uint64()),
            "set_size": pa.array(np.repeat(sizes, sizes), pa.int64()),
        })

    exploded = chunks_ds.map_batches(explode, batch_format="pyarrow")
    exploded = exploded.repartition(num_blocks=num_partitions, keys=["elem"])

    pair_schema = pa.schema([
        ("src", pa.uint64()), ("dst", pa.uint64()),
        ("src_size", pa.int64()), ("dst_size", pa.int64()),
    ])

    def emit_pairs(t: pa.Table) -> pa.Table:
        n = len(t)
        if n < 2:
            return pair_schema.empty_table()
        el = t["elem"].combine_chunks().to_numpy()
        ck = t["ck"].combine_chunks().to_numpy()
        sz = t["set_size"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, el))
        el, ck, sz = el[order], ck[order], sz[order]
        starts = np.concatenate([[0], np.flatnonzero(el[1:] != el[:-1]) + 1, [n]])
        src_l, dst_l, ss_l, ds_l = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            g = e - s
            if g < 2 or g > max_group:
                continue
            gi, gz = ck[s:e], sz[s:e]
            ii, jj = np.triu_indices(g, k=1)
            src_l.append(gi[ii]); dst_l.append(gi[jj])
            ss_l.append(gz[ii]); ds_l.append(gz[jj])
        if not src_l:
            return pair_schema.empty_table()
        return pa.table({
            "src": pa.array(np.concatenate(src_l), pa.uint64()),
            "dst": pa.array(np.concatenate(dst_l), pa.uint64()),
            "src_size": pa.array(np.concatenate(ss_l), pa.int64()),
            "dst_size": pa.array(np.concatenate(ds_l), pa.int64()),
        })

    pairs = exploded.map_batches(emit_pairs, batch_format="pyarrow",
                                 batch_size=None)
    pairs = pairs.repartition(num_blocks=max(4, num_partitions // 4),
                              keys=["src", "dst"])

    def combine_filter(t: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.uint64()),
                          "dst": pa.array([], pa.uint64())})
        n = len(t)
        if n == 0:
            return empty
        src = t["src"].combine_chunks().to_numpy()
        dst = t["dst"].combine_chunks().to_numpy()
        a = t["src_size"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["dst_size"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst, a, b = src[order], dst[order], a[order], b[order]
        new = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        firsts = np.concatenate([[0], np.flatnonzero(new) + 1])
        c = np.diff(np.concatenate([firsts, [n]])).astype(np.int64)
        av, bv = a[firsts], b[firsts]
        keep = firsts[1000 * c >= tau_milli * (av + bv - c)]
        return pa.table({"src": pa.array(src[keep], pa.uint64()),
                         "dst": pa.array(dst[keep], pa.uint64())})

    out = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in pairs.map_batches(combine_filter, batch_format="pyarrow",
                                   batch_size=None)
        .iter_batches(batch_format="pyarrow"))

    src_k = out["src"].to_numpy(zero_copy_only=False) if len(out) else np.empty(0, np.uint64)
    dst_k = out["dst"].to_numpy(zero_copy_only=False) if len(out) else np.empty(0, np.uint64)
    keys = np.unique(np.concatenate([src_k, dst_k]))
    kref = ray.put(keys)

    def endpoint_ids(t: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        cid = t["conv_id"].combine_chunks()
        ck = hash_str_array_u64(cid)
        u, idx = np.unique(ck, return_index=True)
        pos = np.searchsorted(ks, u)
        hit = (pos < len(ks)) & (ks[np.minimum(pos, max(len(ks) - 1, 0))] == u) \
            if len(ks) else np.zeros(len(u), bool)
        sel = idx[hit]
        return pa.table({"ck": pa.array(ck[sel], pa.uint64()),
                         "conv_id": cid.take(pa.array(sel, pa.int64()))})

    id_t = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in chunks_ds.map_batches(endpoint_ids, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    key2id = dict(zip(id_t["ck"].to_pylist(), id_t["conv_id"].to_pylist()))
    s_ids = [key2id[int(k)] for k in src_k]
    d_ids = [key2id[int(k)] for k in dst_k]
    lo = [min(x, y) for x, y in zip(s_ids, d_ids)]
    hi = [max(x, y) for x, y in zip(s_ids, d_ids)]
    order = sorted(range(len(lo)), key=lambda i: (lo[i], hi[i]))
    return pa.table({
        "src": pa.array([lo[i] for i in order], pa.string()),
        "dst": pa.array([hi[i] for i in order], pa.string()),
    })
