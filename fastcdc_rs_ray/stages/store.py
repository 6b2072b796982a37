"""Content-addressable chunk store round trip — the reference's raison
d'être (README.md:3 "data deduplication" for backup/storage) demonstrated
end to end, distributed, with a lossless-reconstruction proof.

Three stages over (conv_id, payload):

1. **chunk+carry**: the gear kernel cuts every payload; chunk IDENTITY is
   the strong span hash (stages/delta.py rationale — gear hashes are not
   collision-safe and runts alias), and the chunk BYTES column is
   zero-copy: chunks tile each block's payload buffer contiguously, so the
   `data` LargeBinary array reuses that buffer with offsets = cumsum of
   chunk lengths (no per-chunk copy).  This is the reference's
   `ChunkData.data` (src/v2020/mod.rs:710-719) materialized only in the
   stage that needs it (SURVEY.md §1.2).
2. **store**: per-block distinct (key, data) -> KR(key) -> per-partition
   distinct = the unique-chunk store, plus (n_unique, bytes_unique)
   accounting partials.
3. **reconstruct**: chunk refs (no bytes) and store rows tag-union through
   KR(key) to re-attach bytes, then KR(conv_key) reassembles each
   conversation — after the sort by (conv_key, chunk_idx) the Arrow
   binary values buffer IS the concatenation, so the rebuilt payload hash
   is one `_span_keys` call over conv boundaries, no Python joins — and
   equality against the original payload's span hash is counted.

Returns ONE summary row; `n_equal == n_convs` is the lossless proof, and
`bytes_unique < bytes_total` on any corpus with duplicated content is the
dedup-ratio evidence.  Three keyed exchanges, two carrying binary payloads
— the honest cost of a store build; refs and accounting rows are
fixed-width u64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..cdc import ChunkerConfig, chunk_rows
from ..util import hash_str_array_u64
from .chunk import _binary_column_as_buffer
from .delta import _SLICE_BUDGET, _span_keys

_CHUNKED = pa.schema([
    ("conv_key", pa.uint64()), ("chunk_idx", pa.int32()),
    ("key", pa.uint64()), ("conv_hash", pa.uint64()),
    ("data", pa.large_binary()),
])
_STORE = pa.schema([("key", pa.uint64()), ("data", pa.large_binary())])
_TAGGED = pa.schema([
    ("key", pa.uint64()), ("conv_key", pa.uint64()),
    ("chunk_idx", pa.int32()), ("conv_hash", pa.uint64()),
    ("data", pa.large_binary()), ("tag", pa.int8()),
])


def _binary_from_spans(data: np.ndarray, lengths: np.ndarray) -> pa.Array:
    """Zero-copy LargeBinary array over ``data`` whose rows are the
    contiguous spans of the given lengths (they must tile ``data``)."""
    offs = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=offs[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(lengths),
        [None, pa.py_buffer(offs), pa.py_buffer(data)])


def _chunk_with_bytes(payload_ds, cfg: ChunkerConfig):
    """(conv_id, payload) -> _CHUNKED rows (chunk bytes zero-copy)."""

    def stage(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _CHUNKED.empty_table()
        conv_key = hash_str_array_u64(t["conv_id"])
        payload = t["payload"].combine_chunks()
        sizes = pc.binary_length(payload).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        parts = []
        row0 = 0
        while row0 < len(t):
            row1, acc = row0, 0
            while row1 < len(t) and (acc == 0 or acc + sizes[row1] <= _SLICE_BUDGET):
                acc += sizes[row1]
                row1 += 1
            data, offs = _binary_column_as_buffer(payload.slice(row0, row1 - row0))
            base = offs[0]
            data = data[base:offs[-1]].copy()  # owned: rides the exchange
            offs = offs - base
            row_idx, _gear, off, ln = chunk_rows(data, offs, cfg)
            gstart = offs[row_idx] + off
            keys = _span_keys(data, gstart, gstart + ln)
            conv_hash = _span_keys(data, offs[:-1], offs[1:])
            # chunk_idx within each conversation
            brk = np.concatenate([[0], np.flatnonzero(
                row_idx[1:] != row_idx[:-1]) + 1]) if len(row_idx) else np.zeros(0, np.int64)
            cidx = (np.arange(len(row_idx)) -
                    np.repeat(brk, np.diff(np.append(brk, len(row_idx)))))
            parts.append(pa.table({
                "conv_key": pa.array(conv_key[row0:row1][row_idx], pa.uint64()),
                "chunk_idx": pa.array(cidx.astype(np.int32), pa.int32()),
                "key": pa.array(keys, pa.uint64()),
                "conv_hash": pa.array(conv_hash[row_idx], pa.uint64()),
                "data": _binary_from_spans(data, ln),
            }).cast(_CHUNKED))
            row0 = row1
        return pa.concat_tables(parts)

    return payload_ds.map_batches(stage, batch_format="pyarrow",
                                  batch_size=None)


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow"))


def chunk_store_roundtrip(payload_ds, cfg: ChunkerConfig | None = None,
                          num_partitions: int = 8) -> pa.Table:
    """Build the unique-chunk store, reconstruct every conversation from
    it, and prove losslessness.  See module docstring."""
    cfg = cfg or ChunkerConfig(64, 256, 1024)
    chunked = _chunk_with_bytes(payload_ds, cfg).materialize()

    # ---- accounting over the chunked form (block partials) ----
    def total_partial(t: pa.Table) -> pa.Table:
        ln = pc.binary_length(t["data"].combine_chunks()).cast(pa.int64())
        return pa.table({
            "n_chunks": pa.array([len(t)], pa.int64()),
            "bytes_total": pa.array(
                [int(pc.sum(ln).as_py() or 0)], pa.int64()),
            "n_convs": pa.array([len(np.unique(
                t["conv_key"].combine_chunks().to_numpy()))], pa.int64()),
        })

    tot = _collect(chunked.map_batches(total_partial, batch_format="pyarrow",
                                       batch_size=None))
    n_chunks = int(tot["n_chunks"].to_numpy().sum())
    bytes_total = int(tot["bytes_total"].to_numpy().sum())

    # ---- store: global distinct on key ----
    def local_distinct(t: pa.Table) -> pa.Table:
        k = t["key"].combine_chunks().to_numpy()
        _u, idx = np.unique(k, return_index=True)
        sel = pa.array(np.sort(idx), pa.int64())
        return pa.table({"key": t["key"].take(sel),
                         "data": t["data"].take(sel)}).cast(_STORE)

    store = chunked.map_batches(local_distinct, batch_format="pyarrow",
                                batch_size=None)
    store = store.repartition(num_blocks=num_partitions, keys=["key"])
    store = store.map_batches(local_distinct, batch_format="pyarrow",
                              batch_size=None).materialize()

    def uniq_partial(t: pa.Table) -> pa.Table:
        ln = pc.binary_length(t["data"].combine_chunks()).cast(pa.int64())
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "b": pa.array([int(pc.sum(ln).as_py() or 0)], pa.int64()),
        })

    up = _collect(store.map_batches(uniq_partial, batch_format="pyarrow",
                                    batch_size=None))
    n_unique = int(up["n"].to_numpy().sum())
    bytes_unique = int(up["b"].to_numpy().sum())

    # ---- reconstruct: refs + store rows tag-union on key ----
    def ref_rows(t: pa.Table) -> pa.Table:
        empty = pa.array([b""] * len(t), pa.large_binary())
        return pa.table({
            "key": t["key"], "conv_key": t["conv_key"],
            "chunk_idx": t["chunk_idx"], "conv_hash": t["conv_hash"],
            "data": empty,
            "tag": pa.array(np.zeros(len(t), np.int8), pa.int8()),
        }).cast(_TAGGED)

    def store_rows(t: pa.Table) -> pa.Table:
        z64 = pa.array(np.zeros(len(t), np.uint64), pa.uint64())
        return pa.table({
            "key": t["key"], "conv_key": z64,
            "chunk_idx": pa.array(np.zeros(len(t), np.int32), pa.int32()),
            "conv_hash": z64, "data": t["data"],
            "tag": pa.array(np.ones(len(t), np.int8), pa.int8()),
        }).cast(_TAGGED)

    mixed = chunked.map_batches(ref_rows, batch_format="pyarrow").union(
        store.map_batches(store_rows, batch_format="pyarrow"))
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["key"])

    attach_schema = pa.schema([
        ("conv_key", pa.uint64()), ("chunk_idx", pa.int32()),
        ("conv_hash", pa.uint64()), ("data", pa.large_binary()),
    ])

    def attach(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return attach_schema.empty_table()
        k = t["key"].combine_chunks().to_numpy()
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        st = np.flatnonzero(tag == 1)
        sk = k[st]
        order = np.argsort(sk, kind="stable")
        sk, st = sk[order], st[order]
        rf = np.flatnonzero(tag == 0)
        pos = np.searchsorted(sk, k[rf])
        # every ref key exists in the store by construction
        data_rows = t["data"].take(pa.array(st[pos], pa.int64()))
        sel = pa.array(rf, pa.int64())
        return pa.table({
            "conv_key": t["conv_key"].take(sel),
            "chunk_idx": t["chunk_idx"].take(sel),
            "conv_hash": t["conv_hash"].take(sel),
            "data": data_rows,
        }).cast(attach_schema)

    attached = mixed.map_batches(attach, batch_format="pyarrow",
                                 batch_size=None)
    attached = attached.repartition(num_blocks=num_partitions,
                                    keys=["conv_key"])

    def reassemble(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n_convs": pa.array([], pa.int64()),
                             "n_equal": pa.array([], pa.int64())})
        ck = t["conv_key"].combine_chunks().to_numpy()
        ci = t["chunk_idx"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ci, ck))
        sel = pa.array(order, pa.int64())
        data_col = t["data"].take(sel).combine_chunks()
        ck = ck[order]
        ch = t["conv_hash"].combine_chunks().to_numpy()[order]
        data, offs = _binary_column_as_buffer(data_col)
        # conv boundaries over the sorted chunk rows; the values buffer is
        # already the concatenation in (conv, chunk_idx) order
        starts = np.concatenate([[0], np.flatnonzero(ck[1:] != ck[:-1]) + 1])
        ends = np.append(starts[1:], len(ck))
        rebuilt = _span_keys(data, offs[starts], offs[ends])
        want = ch[starts]
        return pa.table({
            "n_convs": pa.array([len(starts)], pa.int64()),
            "n_equal": pa.array([int((rebuilt == want).sum())], pa.int64()),
        })

    rc = _collect(attached.map_batches(reassemble, batch_format="pyarrow",
                                       batch_size=None))
    n_convs = int(rc["n_convs"].to_numpy().sum())
    n_equal = int(rc["n_equal"].to_numpy().sum())
    dedup_bp = (10000 * (bytes_total - bytes_unique) // bytes_total
                if bytes_total else 0)
    return pa.table({
        "n_convs": pa.array([n_convs], pa.int64()),
        "n_equal": pa.array([n_equal], pa.int64()),
        "n_chunks": pa.array([n_chunks], pa.int64()),
        "n_unique_chunks": pa.array([n_unique], pa.int64()),
        "bytes_total": pa.array([bytes_total], pa.int64()),
        "bytes_unique": pa.array([bytes_unique], pa.int64()),
        "dedup_bp": pa.array([dedup_bp], pa.int64()),
    })
