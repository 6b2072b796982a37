"""Snapshot chunk delta: the canonical CDC application (backup / crawl
dedup) — how many of snapshot B's content-defined chunks already exist in
snapshot A, by count and by byte volume.

This is WHY content-defined chunking exists (reference README.md:3 "data
deduplication"): an insertion or deletion early in a document shifts every
downstream byte, so fixed-size blocks all change, but gear-hash cut points
re-synchronize within one chunk — the delta stays proportional to the edit,
not to the file.  The test suite pins exactly that property (an edit in the
middle of a doc leaves the majority of chunk bytes shared).

Discipline: both snapshots chunk through the same stateless gear kernel,
but chunk IDENTITY is a strong polynomial span hash of the chunk bytes
(computed in the same pass, O(1) per chunk from prefix arrays) — the gear
hash is deliberately NOT the store key, because it is not collision-safe
and the reference's runt-chunk hash-0 semantics would alias every
trailing runt.  Each side pre-reduces per block to distinct content keys
with instance counts/bytes, ONE keyed exchange on the key co-locates A
and B occurrences, and per-block partials sum driver-side into ONE
summary row — nothing about the result depends on partitioning.
Rows-only (CDC chunk keys are not SQL-expressible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..cdc import ChunkerConfig
from ..util import mix64
from .chunk import DEFAULT_CONFIG

_MARKER = b"[SNAPSHOT-B-EDIT marker text inserted deterministically]"


def docs_as_payload(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """documents -> (conv_id:int64, payload:large_binary) for the chunker."""

    def conv(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": t[id_col].combine_chunks().cast(pa.int64()),
            "payload": t[text_col].combine_chunks().cast(pa.large_binary()),
        })

    return docs_ds.map_batches(conv, batch_format="pyarrow")


def mutate_snapshot(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """Deterministic snapshot-B derivation: per doc_id % 5 — 0: unchanged,
    1: marker inserted at the byte midpoint, 2: marker appended, 3: 16
    bytes deleted at the midpoint, 4: replaced by a fresh synthetic doc of
    the same length.  Byte surgery keyed only on doc_id, so B is identical
    under any partitioning.

    This is snapshot SCAFFOLDING for the single-table query/test surface —
    in production B is a real second crawl and this function never runs —
    so the per-row splice loop here is not a data-path stage.
    """

    def mut(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64())
        payload = t[text_col].combine_chunks().cast(pa.large_binary())
        idn = ids.to_numpy(zero_copy_only=False)
        kind = idn % 5
        out = []
        for i in range(len(idn)):
            k = kind[i]
            b = payload[i].as_py()
            m = len(b) // 2
            if k == 1:
                b = b[:m] + _MARKER + b[m:]
            elif k == 2:
                b = b + _MARKER
            elif k == 3:
                b = b[:m] + b[m + 16:]
            elif k == 4:
                seed = int(idn[i]) * 0x9E3779B97F4A7C15 % (1 << 63)
                rng = np.random.default_rng(seed)
                b = rng.integers(32, 127, size=max(len(b), 64),
                                 dtype=np.uint8).tobytes()
            out.append(b)
        return pa.table({
            "conv_id": ids,
            "payload": pa.array(out, pa.large_binary()),
        })

    return docs_ds.map_batches(mut, batch_format="pyarrow")


_POLY_B = np.uint64(0x9E3779B97F4A7C15 | 1)  # odd -> invertible mod 2^64
_POLY_BINV = np.uint64(pow(int(_POLY_B), -1, 1 << 64))
_SLICE_BUDGET = 8 << 20  # payload bytes per span-hash slice (temporaries ~32x)


def _span_keys(data: np.ndarray, starts: np.ndarray,
               ends: np.ndarray) -> np.ndarray:
    """Exact-uint64 polynomial content hash of arbitrary [start, end) spans
    of ``data`` in O(n + spans): with prefix sums
    ``pre[i] = sum_{j<i} data[j] * B^j (mod 2^64)`` the span hash is
    ``(pre[e] - pre[s]) * B^-s`` (the substring tier's window hash,
    generalized to variable-length spans), mixed with the span length."""
    n = len(data)
    pw = np.empty(n, np.uint64)
    pwinv = np.empty(n, np.uint64)
    if n:
        pw[0] = 1
        pwinv[0] = 1
        np.cumprod(np.full(n - 1, _POLY_B, np.uint64), out=pw[1:])
        np.cumprod(np.full(n - 1, _POLY_BINV, np.uint64), out=pwinv[1:])
    pre = np.zeros(n + 1, np.uint64)
    np.cumsum((data.astype(np.uint64) + np.uint64(1)) * pw, out=pre[1:])
    h = (pre[ends] - pre[starts]) * pwinv[starts]
    return mix64(h ^ mix64((ends - starts).astype(np.uint64)))


def _chunk_key_partials(payload_ds, cfg: ChunkerConfig, snap: int):
    """(conv_id, payload) -> per-block distinct chunk CONTENT keys:
    (key, length, snap, n, bytes).

    Boundaries come from the gear kernel; chunk IDENTITY is the strong
    span hash of the chunk bytes (the gear hash is not collision-safe for
    a dedup store — notably the reference's runt-chunk hash-0 semantics,
    src/v2020/mod.rs:429-432, would alias every trailing runt of equal
    length).  Rows are processed in byte-budgeted slices so the uint64
    prefix temporaries stay bounded regardless of block size.
    """
    from ..cdc import chunk_rows
    from .chunk import _binary_column_as_buffer

    def partial(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("key", pa.uint64()), ("length", pa.int64()),
            ("snap", pa.int8()), ("n", pa.int64()), ("bytes", pa.int64())])
        if len(t) == 0:
            return out_schema.empty_table()
        keys_parts, len_parts = [], []
        # slice rows so each slice's payload bytes stay under budget
        payload = t["payload"].combine_chunks()
        sizes = pc.binary_length(payload).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        row0 = 0
        while row0 < len(t):
            row1, acc = row0, 0
            while row1 < len(t) and (acc == 0 or acc + sizes[row1] <= _SLICE_BUDGET):
                acc += sizes[row1]
                row1 += 1
            data, offs = _binary_column_as_buffer(payload.slice(row0, row1 - row0))
            # rebase to the slice so the span-hash prefix arrays are
            # slice-sized (a sliced Arrow array keeps the full values buffer)
            base = offs[0]
            data = data[base:offs[-1]]
            offs = offs - base
            row_idx, _gear, off, ln = chunk_rows(data, offs, cfg)
            gstart = offs[row_idx] + off  # row-relative -> slice-global
            keys_parts.append(_span_keys(data, gstart, gstart + ln))
            len_parts.append(ln)
            row0 = row1
        k = np.concatenate(keys_parts)
        ln = np.concatenate(len_parts)
        if len(k) == 0:  # block of only empty payloads
            return out_schema.empty_table()
        order = np.argsort(k, kind="stable")
        k, ln = k[order], ln[order]
        new = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k))
        n = (ends - starts).astype(np.int64)
        return pa.table({
            "key": pa.array(k[starts], pa.uint64()),
            "length": pa.array(ln[starts], pa.int64()),
            "snap": pa.array(np.full(len(starts), snap, np.int8), pa.int8()),
            "n": pa.array(n, pa.int64()),
            "bytes": pa.array(ln[starts] * n, pa.int64()),
        }).cast(out_schema)

    return payload_ds.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None)


def chunk_delta(payload_a_ds, payload_b_ds,
                cfg: ChunkerConfig | None = None,
                num_partitions: int = 8) -> pa.Table:
    """Two (conv_id, payload) snapshots -> ONE summary row:
    (chunks_a, bytes_a, chunks_b, bytes_b, shared_chunks_b, shared_bytes_b,
    new_chunks_b, new_bytes_b, dedup_bp).

    shared = a B chunk instance whose content key occurs anywhere in A;
    dedup_bp = floor(shared_bytes_b * 10000 / bytes_b) — the fraction of
    snapshot B's volume a deduplicating store would NOT re-write.
    """
    cfg = cfg or DEFAULT_CONFIG
    tagged = _chunk_key_partials(payload_a_ds, cfg, 0).union(
        _chunk_key_partials(payload_b_ds, cfg, 1))
    located = tagged.repartition(num_blocks=num_partitions, keys=["key"])

    cols = ["chunks_a", "bytes_a", "chunks_b", "bytes_b",
            "shared_chunks_b", "shared_bytes_b"]

    def block_summary(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        h = t["key"].combine_chunks().to_numpy(zero_copy_only=False)
        sn = t["snap"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        by = t["bytes"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((sn, h))
        h, sn, n, by = h[order], sn[order], n[order], by[order]
        new = np.concatenate([[True], h[1:] != h[:-1]])
        gid = np.cumsum(new) - 1
        ngroups = gid[-1] + 1
        in_a = np.zeros(ngroups, bool)
        np.logical_or.at(in_a, gid, sn == 0)
        is_b = sn == 1
        b_shared = is_b & in_a[gid]
        return pa.table({
            "chunks_a": pa.array([int(n[~is_b].sum())], pa.int64()),
            "bytes_a": pa.array([int(by[~is_b].sum())], pa.int64()),
            "chunks_b": pa.array([int(n[is_b].sum())], pa.int64()),
            "bytes_b": pa.array([int(by[is_b].sum())], pa.int64()),
            "shared_chunks_b": pa.array([int(n[b_shared].sum())], pa.int64()),
            "shared_bytes_b": pa.array([int(by[b_shared].sum())], pa.int64()),
        })

    parts = located.map_batches(block_summary, batch_format="pyarrow",
                                batch_size=None)
    tot = {c: 0 for c in cols}
    for b in parts.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for c in cols:
            tot[c] += int(pc.sum(t[c]).as_py() or 0)
    new_chunks = tot["chunks_b"] - tot["shared_chunks_b"]
    new_bytes = tot["bytes_b"] - tot["shared_bytes_b"]
    dedup_bp = tot["shared_bytes_b"] * 10000 // max(tot["bytes_b"], 1)
    return pa.table({
        **{c: pa.array([tot[c]], pa.int64()) for c in cols},
        "new_chunks_b": pa.array([new_chunks], pa.int64()),
        "new_bytes_b": pa.array([new_bytes], pa.int64()),
        "dedup_bp": pa.array([dedup_bp], pa.int64()),
    })


#: default sweep: the reference's canonical 3 size classes
#: (examples run 16/32/64 KiB; scaled down x4 to bite on transcript-sized
#: payloads while keeping the same min:avg:max = 1:4:16 shape)
SWEEP_CONFIGS = (
    (1024, 4096, 16384),
    (4096, 16384, 65535),
    (16384, 65536, 262144),
)


def chunk_param_sweep(docs_ds, configs=SWEEP_CONFIGS, num_partitions: int = 8):
    """-> one row per chunker config: (avg_size, total_chunks,
    distinct_chunks, total_bytes, distinct_bytes, dedup_bp) — the
    chunk-size vs dedup-ratio tradeoff curve a backup / crawl-store
    operator tunes against (smaller chunks find more shared bytes, cost
    more index entries; the fundamental CDC knob).

    Plan: per config, the snapshot-delta tier's fused scan
    (:func:`_chunk_key_partials`: gear boundaries + strong span-hash
    chunk identity + per-block distinct pre-reduce, ``snap`` = config
    index); the per-config partials UNION into ONE key-keyed exchange
    (any one chunk key exists under one config only in expectation, and
    per-partition distinct is correct regardless); per-partition reduce
    emits per-config scalar partials; driver merges |configs|-sized
    rows.  total_bytes is the corpus byte count for EVERY config — the
    coverage invariant across the sweep (pytest-pinned, along with
    finer-chunks-find-at-least-as-many-shared-bytes on a planted
    partial-overlap corpus)."""
    from ..util import shuffle_safe_partitions

    num_partitions = shuffle_safe_partitions(num_partitions)
    parts = None
    for i, (mn, av, mx) in enumerate(configs):
        cfg = ChunkerConfig(min_size=mn, avg_size=av, max_size=mx)
        p = _chunk_key_partials(docs_ds, cfg, snap=i)
        parts = p if parts is None else parts.union(p)
    ex = parts.repartition(num_blocks=num_partitions, keys=["key"])

    def reduce(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("snap", pa.int8()), ("total_chunks", pa.int64()),
            ("distinct_chunks", pa.int64()), ("total_bytes", pa.int64()),
            ("distinct_bytes", pa.int64())])
        if len(t) == 0:
            return out_schema.empty_table()
        snap = t["snap"].combine_chunks().to_numpy(zero_copy_only=False)
        key = t["key"].combine_chunks().to_numpy()
        ln = t["length"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        byts = t["bytes"].combine_chunks().to_numpy(zero_copy_only=False)
        rows = []
        for s in np.unique(snap):
            m = snap == s
            uk, first = np.unique(key[m], return_index=True)
            rows.append((
                int(s), int(n[m].sum()), len(uk), int(byts[m].sum()),
                int(ln[m][first].sum())))
        sn, tc, dc, tb, db = zip(*rows)
        return pa.table({
            "snap": pa.array(sn, pa.int8()),
            "total_chunks": pa.array(tc, pa.int64()),
            "distinct_chunks": pa.array(dc, pa.int64()),
            "total_bytes": pa.array(tb, pa.int64()),
            "distinct_bytes": pa.array(db, pa.int64()),
        }).cast(out_schema)

    acc = {i: [0, 0, 0, 0] for i in range(len(configs))}
    for b in ex.map_batches(reduce, batch_format="pyarrow",
                            batch_size=None).iter_batches(
            batch_format="pyarrow"):
        for i in range(b.num_rows):
            a = acc[int(b["snap"][i].as_py())]
            a[0] += b["total_chunks"][i].as_py()
            a[1] += b["distinct_chunks"][i].as_py()
            a[2] += b["total_bytes"][i].as_py()
            a[3] += b["distinct_bytes"][i].as_py()
    rows = []
    for i, (mn, av, mx) in enumerate(configs):
        tc, dc, tb, db = acc[i]
        dedup_bp = (tb - db) * 10000 // tb if tb else 0
        rows.append((av, tc, dc, tb, db, dedup_bp))
    av, tc, dc, tb, db, bp = zip(*rows)
    return pa.table({
        "avg_size": pa.array(av, pa.int64()),
        "total_chunks": pa.array(tc, pa.int64()),
        "distinct_chunks": pa.array(dc, pa.int64()),
        "total_bytes": pa.array(tb, pa.int64()),
        "distinct_bytes": pa.array(db, pa.int64()),
        "dedup_bp": pa.array(bp, pa.int64()),
    })
