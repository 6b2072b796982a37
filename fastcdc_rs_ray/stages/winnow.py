"""Winnowing fingerprints (Schleimer et al. 2003): the substring tier's
scale prefilter, and a MOSS-style document-similarity candidate generator.

Guarantee (the winnowing theorem): selecting the minimum k-gram hash in
every sliding window of w consecutive k-grams fingerprints every document
such that ANY two documents sharing a substring of length
>= t = w + k - 1 share at least one selected fingerprint.  So with
``w = L - k + 1`` the fingerprint exchange finds a superset of all doc
pairs the exact substring tier (stages/substring.py) would link at length
L, while exchanging only ~2/(w+1) of the rows — this is the documented
100 TB traffic reduction for that tier: winnow -> candidate doc pairs ->
co-locate pair texts -> exact extension.

Pipeline: ``window_hashes`` (shared rolling-hash core, zero-copy over the
Arrow values buffer) -> per-doc sliding-window min (vectorized
``sliding_window_view``; windows never cross a row boundary) -> distinct
(fp_key, doc_id) rows -> keyed exchange on fp_key -> per-group pair
emission -> distinct pairs.  Like the CDC gear kernel (reference
src/v2020/mod.rs:350-409) the selection is content-defined: insertions
far from a shared region never perturb which fingerprints the region
selects, which is what makes the guarantee position-independent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .substring import _BYTE_BUDGET, L_DEFAULT, window_hashes

# noise threshold: matches shorter than k never fingerprint.  Higher k =
# denser fingerprints (2/(w+1) of grams) but far fewer spurious candidate
# pairs on templated text (measured on the synthetic corpus at L=30:
# k=8 -> 84k candidate pairs for 33 true; k=20 -> 622; k=24 -> 115)
K_DEFAULT = 20


def _fingerprints_slice(t: pa.Table, k: int, w: int,
                        pos_off: np.ndarray | None = None) -> pa.Table:
    """One row per selected fingerprint: (fp_key, doc_id, pos[0-based]).

    Rows shorter than k + w - 1 chars have no full window and are skipped
    (they cannot contain a match of length >= t, so the guarantee is
    unaffected).  ``pos_off`` re-bases positions of segmented wide rows."""
    empty = pa.table(
        {
            "fp_key": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int32()),
        }
    )
    if len(t) == 0:
        return empty
    keys, row_idx, pos = window_hashes(t, k)
    m = len(keys)
    if m < w:
        return empty
    # per-row gram counts -> valid window starts (windows stay inside a row)
    grams_per_row = np.bincount(row_idx, minlength=len(t)).astype(np.int64)
    wcnt = np.maximum(grams_per_row - w + 1, 0)
    total = int(wcnt.sum())
    if total == 0:
        return empty
    row_first = np.concatenate(([0], np.cumsum(grams_per_row)[:-1]))
    shift = np.repeat(np.concatenate(([0], np.cumsum(wcnt)[:-1])), wcnt)
    wstart = np.repeat(row_first, wcnt) + (np.arange(total, dtype=np.int64) - shift)
    # sliding min over the flat key array: argmin reduces the strided view
    # without materializing it (O(m*w) reads, O(m) output); cross-row
    # windows are computed then excluded by wstart selection
    sw = np.lib.stride_tricks.sliding_window_view(keys, w)
    amin = np.argmin(sw, axis=1).astype(np.int64)
    sel = wstart + amin[wstart]
    # consecutive windows mostly re-select the same gram: sel indexes a
    # unique (row, position) already, so dedupe on sel alone
    sel_u = np.unique(sel)
    docs = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    out_pos = pos[sel_u]
    if pos_off is not None:
        out_pos = out_pos + pos_off[row_idx[sel_u]]
    return pa.table(
        {
            "fp_key": pa.array(keys[sel_u], pa.uint64()),
            "doc_id": pa.array(docs[row_idx[sel_u]], pa.int64()),
            "pos": pa.array(out_pos.astype(np.int32), pa.int32()),
        }
    )


def fingerprint_rows(t: pa.Table, L: int = L_DEFAULT, k: int = K_DEFAULT) -> pa.Table:
    """Batch kernel: winnowing fingerprints at guarantee length L (window
    w = L - k + 1), byte-budget sliced and wide-row segmented like the
    exact gram kernel (a fingerprint window spans L bytes, so segment
    overlap L-1 is exact; the same gram selected from windows in two
    adjacent segments can emit a duplicate row, deduped below — harmless
    for the guarantee either way)."""
    w = L - k + 1
    if w < 1:
        raise ValueError(f"k={k} must be <= L={L}")
    if len(t) == 0:
        return _fingerprints_slice(t, k, w)
    from . import substring as _ss

    t2, seg_off = _ss.segment_wide_rows(t, L, _ss._BYTE_BUDGET)
    segmented = seg_off.any()
    parts = []
    for sl, row0 in _ss.iter_row_slices(t2, _ss._BYTE_BUDGET):
        off = seg_off[row0 : row0 + len(sl)]
        parts.append(_fingerprints_slice(sl, k, w, off if off.any() else None))
    out = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
    if segmented and out.num_rows:
        d = out["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        p = out["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        keep = np.concatenate(
            ([True], (d[order][1:] != d[order][:-1]) | (p[order][1:] != p[order][:-1]))
        )
        out = out.take(pa.array(order[keep], pa.int64()))
    return out


def _emit_group_pairs(t: pa.Table, max_group: int, self_pairs: bool = False) -> pa.Table:
    """fp_key-colocated block -> doc pairs sharing a fingerprint."""
    empty = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    n = len(t)
    if n < 2:
        return empty
    fp = t["fp_key"].combine_chunks().to_numpy()
    ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, fp))
    fp, ids = fp[order], ids[order]
    starts = np.concatenate([[0], np.flatnonzero(fp[1:] != fp[:-1]) + 1, [n]])
    # singleton groups dominate on real corpora: skip them vectorized, the
    # Python loop below only ever sees groups with >= 2 rows
    glens = np.diff(starts)
    multi = np.flatnonzero(glens >= 2)
    src_l, dst_l = [], []
    for s, e in zip(starts[multi], starts[multi + 1]):
        gids = ids[s:e]
        gi = np.unique(gids)
        g = len(gi)
        if g > max_group:
            continue  # documented recall knob for boilerplate fingerprints
        if self_pairs and len(gids) > g:
            # a doc holding this fp at >=2 positions (rows are distinct
            # (doc, pos) by construction)
            rep = gi[np.bincount(np.searchsorted(gi, gids)) >= 2]
            src_l.append(rep)
            dst_l.append(rep)
        if g >= 2:
            ii, jj = np.triu_indices(g, k=1)
            src_l.append(gi[ii])
            dst_l.append(gi[jj])
    if not src_l:
        return empty
    return pa.table(
        {
            "src": pa.array(np.concatenate(src_l), pa.int64()),
            "dst": pa.array(np.concatenate(dst_l), pa.int64()),
        }
    )


def _distinct_pairs_block(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return t.select(["src", "dst"])
    src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
    dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    keep = np.concatenate(([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])))
    return pa.table(
        {
            "src": pa.array(src[keep], pa.int64()),
            "dst": pa.array(dst[keep], pa.int64()),
        }
    )


def winnow_fingerprints(docs_ds, L: int = L_DEFAULT, k: int = K_DEFAULT):
    """documents Dataset -> (fp_key, doc_id, pos) fingerprint rows."""
    return docs_ds.map_batches(
        lambda t: fingerprint_rows(t, L, k), batch_format="pyarrow", batch_size=1024
    )


def winnow_candidates(docs_ds, L: int = L_DEFAULT, k: int = K_DEFAULT,
                      num_partitions: int = 8, max_group: int = 4096,
                      self_pairs: bool = False):
    """Distinct doc pairs (src < dst) sharing a winnowing fingerprint — a
    guaranteed superset of pairs sharing any substring of length >= L
    (fingerprint groups larger than ``max_group`` are dropped, a documented
    recall knob for boilerplate-heavy corpora; disabled at test scale).

    ``self_pairs=True`` additionally emits (d, d) for documents whose
    fingerprint set contains the same fp_key at >= 2 distinct positions —
    the within-document duplication signal the prefiltered substring path
    needs.

    Groups genuinely need all-pairs emission (unlike the LSH band stage,
    where consecutive linking preserves connectivity): sharing a k-gram
    fingerprint does not imply sharing the L-gram that selected it, so a
    star over the group could miss a pair whose only shared content is an
    L-gram private to that pair.  ``max_group`` therefore caps the
    quadratic blowup on boilerplate fingerprints instead; positions in a
    capped group are still marked whenever any surviving pair shares them."""
    fps = winnow_fingerprints(docs_ds, L, k)
    fps = fps.repartition(num_blocks=num_partitions, keys=["fp_key"])
    pairs = fps.map_batches(
        lambda t: _emit_group_pairs(t, max_group, self_pairs=self_pairs),
        batch_format="pyarrow",
        batch_size=None,
    )
    pairs = pairs.repartition(num_blocks=max(4, num_partitions // 2), keys=["src", "dst"])
    return pairs.map_batches(
        _distinct_pairs_block, batch_format="pyarrow", batch_size=None
    )


# --------------------------------------------------------------------------
# prefiltered exact substring path: winnow candidates -> per-pair extension
# --------------------------------------------------------------------------


def _attach_text_round(pairs_ds, texts_ds, key_col: str, out_name: str,
                       carry: list[tuple[str, pa.DataType]], num_partitions: int):
    """Tag-union keyed exchange: each pair row picks up the text of its
    ``key_col`` endpoint as column ``out_name``.  No Dataset.join (see
    pipelines.neardup: join breaks on schema-less empty partitions)."""
    fields = [("akey", pa.int64()), ("src", pa.int64()), ("dst", pa.int64())]
    fields += carry + [("doc_text", pa.string()), ("tag", pa.int8())]
    schema = pa.schema(fields)

    def pair_side(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {
            "akey": t[key_col],
            "src": t["src"],
            "dst": t["dst"],
            **{c: t[c] for c, _ in carry},
            "doc_text": pa.nulls(n, pa.string()),
            "tag": pa.array(np.ones(n, np.int8), pa.int8()),
        }
        return pa.table({f.name: cols[f.name] for f in schema}).cast(schema)

    def text_side(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {
            "akey": t["doc_id"],
            "src": pa.nulls(n, pa.int64()),
            "dst": pa.nulls(n, pa.int64()),
            **{c: pa.nulls(n, dt) for c, dt in carry},
            "doc_text": t["text"],
            "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
        }
        return pa.table({f.name: cols[f.name] for f in schema}).cast(schema)

    mixed = pairs_ds.map_batches(pair_side, batch_format="pyarrow").union(
        texts_ds.map_batches(text_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["akey"])

    out_fields = [("src", pa.int64()), ("dst", pa.int64())] + carry + [
        (out_name, pa.string())
    ]
    out_schema = pa.schema(out_fields)

    def attach(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        tsel = np.flatnonzero(tag == 0)
        psel = np.flatnonzero(tag == 1)
        if len(psel) == 0:
            return out_schema.empty_table()
        akey = t["akey"].combine_chunks().to_numpy(zero_copy_only=False)
        tkeys = akey[tsel]
        torder = np.argsort(tkeys, kind="stable")
        tkeys = tkeys[torder]
        idx = np.searchsorted(tkeys, akey[psel])
        # every pair endpoint has a text row by construction (endpoints are
        # drawn from the documents table)
        text_col = t["doc_text"].combine_chunks().take(
            pa.array(tsel[torder][idx], pa.int64())
        )
        sel = pa.array(psel, pa.int64())
        cols = {
            "src": t["src"].combine_chunks().take(sel),
            "dst": t["dst"].combine_chunks().take(sel),
            **{c: t[c].combine_chunks().take(sel) for c, _ in carry},
            out_name: text_col,
        }
        return pa.table({f.name: cols[f.name] for f in out_schema}).cast(out_schema)

    return mixed.map_batches(attach, batch_format="pyarrow", batch_size=None)


def _extend_pairs_slice(t: pa.Table, L: int) -> pa.Table:
    """Pair rows (src, dst, src_text, dst_text) -> (doc_id, pos) rows of
    every L-gram of either side whose gram also occurs on the other side
    (or >= 2 times on the same side, for self-pairs)."""
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int32())}
    )
    n = len(t)
    if n == 0:
        return empty
    both = pa.table(
        {
            "text": pa.concat_arrays(
                [t["src_text"].combine_chunks(), t["dst_text"].combine_chunks()]
            )
        }
    )
    keys, row_idx, pos = window_hashes(both, L)
    cnt = np.bincount(row_idx, minlength=2 * n).astype(np.int64)
    off = np.concatenate(([0], np.cumsum(cnt)))
    src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
    dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
    out_doc, out_pos = [], []
    for i in range(n):
        A = keys[off[i] : off[i + 1]]
        pA = pos[off[i] : off[i + 1]]
        if src[i] == dst[i]:
            sA = np.sort(A)
            dup_vals = sA[:-1][sA[1:] == sA[:-1]] if len(sA) > 1 else sA[:0]
            if len(dup_vals):
                m = np.isin(A, dup_vals)
                out_doc.append(np.full(int(m.sum()), src[i], np.int64))
                out_pos.append(pA[m])
            continue
        B = keys[off[n + i] : off[n + i + 1]]
        pB = pos[off[n + i] : off[n + i + 1]]
        mA = np.isin(A, B)
        mB = np.isin(B, A)
        if mA.any():
            out_doc.append(np.full(int(mA.sum()), src[i], np.int64))
            out_pos.append(pA[mA])
        if mB.any():
            out_doc.append(np.full(int(mB.sum()), dst[i], np.int64))
            out_pos.append(pB[mB])
    if not out_doc:
        return empty
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            "pos": pa.array(np.concatenate(out_pos).astype(np.int32), pa.int32()),
        }
    )


def _extend_pairs_block(t: pa.Table, L: int) -> pa.Table:
    """Byte-budget row slicing around _extend_pairs_slice (pair text
    payloads can be wide)."""
    if len(t) <= 1:
        return _extend_pairs_slice(t, L)
    import pyarrow.compute as pc

    nb = pc.binary_length(t["src_text"]).to_numpy() + pc.binary_length(
        t["dst_text"]
    ).to_numpy()
    cum = np.cumsum(nb)
    if cum[-1] <= _BYTE_BUDGET:
        return _extend_pairs_slice(t, L)
    bounds = np.searchsorted(cum, np.arange(_BYTE_BUDGET, cum[-1], _BYTE_BUDGET))
    parts, prev = [], 0
    for b in list(np.unique(np.clip(bounds, 1, len(t)))) + [len(t)]:
        if b > prev:
            parts.append(_extend_pairs_slice(t.slice(prev, b - prev), L))
            prev = b
    return pa.concat_tables(parts)


def _unique_doc_pos_block(t: pa.Table) -> pa.Table:
    """Doc-colocated (doc_id, pos) rows -> distinct rows (a position can be
    marked by several pairs)."""
    if len(t) == 0:
        return t.select(["doc_id", "pos"])
    d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    p = t["pos"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((p, d))
    d, p = d[order], p[order]
    keep = np.concatenate(([True], (d[1:] != d[:-1]) | (p[1:] != p[:-1])))
    return pa.table(
        {
            "doc_id": pa.array(d[keep], pa.int64()),
            "pos": pa.array(p[keep], pa.int32()),
        }
    )


def prefiltered_dup_rows(docs_ds, L: int = L_DEFAULT, k: int = K_DEFAULT,
                         num_partitions: int = 8, max_group: int = 4096):
    """The scale path of the exact substring tier: winnow candidates ->
    broadcast-filter endpoint texts -> tag-union attach -> per-pair exact
    gram intersection -> distinct doc-colocated (doc_id, pos) rows.

    Produces EXACTLY the relation of stages.substring.duplicated_gram_rows
    (every position of a globally duplicated L-gram) while exchanging
    fingerprints (~2/(w+1) of grams) plus candidate-endpoint texts instead
    of every gram: the winnowing guarantee makes the candidate set a
    superset, and the per-pair intersection restores exactness — exact up
    to ``max_group``: a fingerprint shared by more documents than the cap
    stops generating pairs (quadratic blowup guard; the exact tier handles
    such boilerplate linearly and is the right path for corpora dominated
    by it)."""
    import ray
    import ray.data as rd

    pairs = winnow_candidates(
        docs_ds, L, k, num_partitions=num_partitions, max_group=max_group,
        self_pairs=True,
    ).materialize()
    # endpoint id set is candidate-sized -> driver + broadcast filter
    eps = []
    for b in pairs.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            eps.append(b["src"].combine_chunks().to_numpy(zero_copy_only=False))
            eps.append(b["dst"].combine_chunks().to_numpy(zero_copy_only=False))
    empty_rows = pa.table(
        {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int32())}
    )
    if not eps:
        return rd.from_arrow(empty_rows)
    ref = ray.put(np.unique(np.concatenate(eps)))

    def keep_endpoints(t: pa.Table) -> pa.Table:
        e = ray.get(ref)
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(e, ids)
        idx[idx == len(e)] = 0
        sel = np.flatnonzero(e[idx] == ids)
        return t.take(pa.array(sel, pa.int64())).select(["doc_id", "text"])

    texts = docs_ds.map_batches(keep_endpoints, batch_format="pyarrow")
    withsrc = _attach_text_round(pairs, texts, "src", "src_text", [],
                                 num_partitions)
    withboth = _attach_text_round(
        withsrc, texts, "dst", "dst_text", [("src_text", pa.string())],
        num_partitions,
    )
    rows = withboth.map_batches(
        lambda t: _extend_pairs_block(t, L), batch_format="pyarrow",
        batch_size=None,
    )
    rows = rows.repartition(num_blocks=max(4, num_partitions // 2), keys=["doc_id"])
    return rows.map_batches(
        _unique_doc_pos_block, batch_format="pyarrow", batch_size=None
    )


def substring_dups_winnowed(docs_ds, L: int = L_DEFAULT, k: int = K_DEFAULT,
                            num_partitions: int = 8):
    """(doc_id, dup_grams, dup_chars) via the prefiltered scale path —
    same output (and same SQL oracle) as stages.substring.substring_dups."""
    from .substring import _doc_counts_block

    rows = prefiltered_dup_rows(docs_ds, L, k, num_partitions)
    return rows.map_batches(
        lambda t: _doc_counts_block(t, L), batch_format="pyarrow", batch_size=None
    )


def substring_spans_winnowed(docs_ds, L: int = L_DEFAULT, k: int = K_DEFAULT,
                             num_partitions: int = 8):
    """Maximal duplicate spans via the prefiltered scale path — same output
    (and same SQL oracle) as stages.substring.substring_spans."""
    from .substring import _doc_spans_block

    rows = prefiltered_dup_rows(docs_ds, L, k, num_partitions)
    return rows.map_batches(
        lambda t: _doc_spans_block(t, L), batch_format="pyarrow", batch_size=None
    )
