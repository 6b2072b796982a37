"""Monolithic suffix array + the gram≡suffix-array parity gate.

The north rule names the third near-dup family "suffix-array substring".
The production tier (stages/substring.py) computes the Lee et al. 2022
duplicated-substring relation through a decomposable L-gram exchange and
ARGUES the equivalence ("a position is covered by a duplicate span of
length >= L iff it is covered by some duplicated L-gram").  This module
makes that argument falsifiable: a genuine Manber–Myers suffix array —
the reference formulation, the same structure Lee et al.'s monolithic
dedup builds — recomputes the duplicated-position set independently, and
:func:`sa_gram_parity` driver-hashes the three-way agreement (suffix
array vs gram exchange vs the DuckDB self-join oracle).

The suffix array here is a VERIFICATION reference, not the 100 TB path:
it materializes the corpus slice it checks (documented bound — the gate
corpus; at scale it runs per-shard on samples).  The production claim it
certifies is exactly why the engine does NOT need a distributed suffix
array: equal L-grams land in one partition after a hash exchange, which
is the decomposition a monolithic SA cannot give.

Construction is pure vectorized NumPy prefix doubling (O(n log^2 n):
log n rounds of lexsort), and the LCP >= L test is a direct L-byte
window comparison of SA-adjacent suffixes — suffixes sharing a prefix of
length >= L are contiguous in SA order, so adjacent comparison is
complete (standard suffix-array property; no Kasai pass needed for a
fixed threshold).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SEP_LEN = 9  # 0x00 + 8-byte big-endian doc ordinal: unique per boundary


def build_suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8 array by prefix doubling (Manber–Myers).

    Returns int64 positions sorted by suffix.  Vectorized: each round is
    one np.lexsort over (rank, rank-shifted-by-k) with -1 past the end.
    """
    n = len(data)
    if n == 0:
        return np.empty(0, np.int64)
    rank = data.astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r_ord, k2_ord = rank[order], key2[order]
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = (r_ord[1:] != r_ord[:-1]) | (k2_ord[1:] != k2_ord[:-1])
        nr = np.cumsum(new) - 1
        rank = np.empty(n, np.int64)
        rank[order] = nr
        if nr[-1] == n - 1:
            return order.astype(np.int64)
        k *= 2


def duplicated_positions_sa(doc_ids: np.ndarray, texts: list[bytes],
                            L: int) -> pa.Table:
    """All (doc_id, pos) 1-based starts of L-grams that occur >= 2 times
    anywhere in the corpus, computed via one monolithic suffix array.

    Docs are joined with per-boundary-unique separators (0x00 + ordinal;
    corpus bytes are ASCII so no content window can equal a window that
    crosses a boundary), so cross-doc windows never create duplicates.
    """
    parts, starts, pos = [], [], 0
    for i, b in enumerate(texts):
        starts.append(pos)
        parts.append(np.frombuffer(b, np.uint8))
        pos += len(b)
        sep = np.frombuffer(b"\x00" + int(i).to_bytes(8, "big"), np.uint8)
        parts.append(sep)
        pos += _SEP_LEN
    # tail pad: strictly increasing high bytes -> no padded window equals
    # any other window (content is ASCII < 0xF0)
    parts.append((np.arange(L) % 16 + 0xF0).astype(np.uint8))
    data = np.concatenate(parts) if parts else np.empty(0, np.uint8)
    starts = np.asarray(starts, np.int64)
    lens = np.asarray([len(b) for b in texts], np.int64)
    n = len(data) - L  # suffix positions that have a full L-window
    if n <= 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int32())})

    sa = build_suffix_array(data)
    sa = sa[sa < n]  # keep positions with a full L-byte window
    # windows: |sa| x L gathered bytes; adjacent-row equality == LCP >= L
    win = data[sa[:, None] + np.arange(L)[None, :]]
    eq = (win[1:] == win[:-1]).all(axis=1)
    dup = np.zeros(len(sa), bool)
    dup[1:] |= eq
    dup[:-1] |= eq
    cand = sa[dup]
    # restrict to in-doc windows: pos and pos+L inside one document
    d = np.searchsorted(starts, cand, side="right") - 1
    off = cand - starts[d]
    ok = off + L <= lens[d]
    d, off = d[ok], off[ok]
    out = np.rec.fromarrays(
        [np.asarray(doc_ids, np.int64)[d], (off + 1).astype(np.int32)],
        names=["doc_id", "pos"],
    )
    out.sort()
    return pa.table({"doc_id": pa.array(out.doc_id, pa.int64()),
                     "pos": pa.array(out.pos, pa.int32())})


#: hard cap on the corpus the verification gate may pull driver-side —
#: the monolithic SA is O(n log^2 n) driver memory/CPU by design; past
#: this the gate RAISES rather than OOMing the driver (advice r02: the
#: bound was documented but unenforced).
SA_GATE_MAX_BYTES = 256 * 1024 * 1024


def sa_gram_parity(docs_ds, L: int = 30, num_partitions: int = 8,
                   sa_L: int | None = None,
                   max_bytes: int = SA_GATE_MAX_BYTES) -> pa.Table:
    """Three-way parity gate: the duplicated-position set computed by the
    distributed gram exchange must equal the set computed by a genuine
    monolithic suffix array (and the count equals the oracle's DuckDB
    gram self-join).  One row: n_dup_positions (the agreed set size),
    n_gram_only, n_sa_only (both 0 when the equivalence holds).

    ``sa_L`` lets the pytest plant a violation (mismatched thresholds
    make the gate COUNT a nonzero difference — falsifiability hook).
    The gate pulls the gate corpus driver-side for the reference SA —
    a verification-only materialization with an ENFORCED byte budget:
    the corpus size is measured with a distributed pass first, and a
    corpus over ``max_bytes`` RAISES (run the gate on a bounded slice
    instead; the production tier never materializes at all).
    """
    import pyarrow.compute as pc

    from .substring import duplicated_gram_rows

    total = 0
    for b in docs_ds.map_batches(
            lambda t: pa.table({"b": pa.array(
                [pc.sum(pc.binary_length(
                    t["text"].combine_chunks().cast(pa.binary()))).as_py()
                 or 0], pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        total += sum(b["b"].to_pylist())
    if total > max_bytes:
        raise ValueError(
            f"sa_gram_parity: gate corpus is {total} bytes > max_bytes="
            f"{max_bytes}; the monolithic reference SA is driver-side by "
            f"design — run the gate on a bounded corpus slice")

    gram = duplicated_gram_rows(docs_ds, L=L, num_partitions=num_partitions)
    gt = gram.to_pandas()
    # gram_rows positions are 0-based (stages/substring.py:gram_rows);
    # this gate and the SQL oracle speak 1-based substring() positions
    gram_set = set(zip(gt["doc_id"].astype(int), gt["pos"].astype(int) + 1))

    docs = docs_ds.to_pandas().sort_values("doc_id")
    sat = duplicated_positions_sa(
        docs["doc_id"].to_numpy(),
        [t.encode() for t in docs["text"].tolist()],
        sa_L if sa_L is not None else L,
    ).to_pandas()
    sa_set = set(zip(sat["doc_id"].astype(int), sat["pos"].astype(int)))

    both = gram_set & sa_set
    return pa.table(
        {
            "n_dup_positions": pa.array([len(both)], pa.int64()),
            "n_gram_only": pa.array([len(gram_set - both)], pa.int64()),
            "n_sa_only": pa.array([len(sa_set - both)], pa.int64()),
        }
    )
