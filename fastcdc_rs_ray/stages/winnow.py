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


def _fingerprints_slice(t: pa.Table, k: int, w: int) -> pa.Table:
    """One row per selected fingerprint: (fp_key, doc_id, pos[0-based]).

    Rows shorter than k + w - 1 chars have no full window and are skipped
    (they cannot contain a match of length >= t, so the guarantee is
    unaffected)."""
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
    return pa.table(
        {
            "fp_key": pa.array(keys[sel_u], pa.uint64()),
            "doc_id": pa.array(docs[row_idx[sel_u]], pa.int64()),
            "pos": pa.array(pos[sel_u].astype(np.int32), pa.int32()),
        }
    )


def fingerprint_rows(t: pa.Table, L: int = L_DEFAULT, k: int = K_DEFAULT) -> pa.Table:
    """Batch kernel: winnowing fingerprints at guarantee length L (window
    w = L - k + 1), byte-budget sliced like the exact gram kernel."""
    w = L - k + 1
    if w < 1:
        raise ValueError(f"k={k} must be <= L={L}")
    from ..util import string_buffers

    if len(t) == 0:
        return _fingerprints_slice(t, k, w)
    offsets, _ = string_buffers(t["text"])
    total_bytes = int(offsets[-1] - offsets[0])
    if total_bytes > _BYTE_BUDGET and len(t) > 1:
        bounds = np.searchsorted(
            offsets - offsets[0],
            np.arange(_BYTE_BUDGET, total_bytes, _BYTE_BUDGET),
        )
        parts, prev = [], 0
        for b in list(np.unique(np.clip(bounds, 1, len(t)))) + [len(t)]:
            if b > prev:
                parts.append(_fingerprints_slice(t.slice(prev, b - prev), k, w))
                prev = b
        return pa.concat_tables(parts)
    return _fingerprints_slice(t, k, w)


def _emit_group_pairs(t: pa.Table, max_group: int) -> pa.Table:
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
    src_l, dst_l = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        gi = np.unique(ids[s:e])
        g = len(gi)
        if g < 2 or g > max_group:
            continue
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
                      num_partitions: int = 8, max_group: int = 4096):
    """Distinct doc pairs (src < dst) sharing a winnowing fingerprint — a
    guaranteed superset of pairs sharing any substring of length >= L
    (fingerprint groups larger than ``max_group`` are dropped, a documented
    recall knob for boilerplate-heavy corpora; disabled at test scale)."""
    fps = winnow_fingerprints(docs_ds, L, k)
    fps = fps.repartition(num_blocks=num_partitions, keys=["fp_key"])
    pairs = fps.map_batches(
        lambda t: _emit_group_pairs(t, max_group),
        batch_format="pyarrow",
        batch_size=None,
    )
    pairs = pairs.repartition(num_blocks=max(4, num_partitions // 2), keys=["src", "dst"])
    return pairs.map_batches(
        _distinct_pairs_block, batch_format="pyarrow", batch_size=None
    )
