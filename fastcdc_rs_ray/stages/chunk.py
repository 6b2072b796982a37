"""Chunk stage: conv_bytes -> chunks via the FastCDC kernel.

The stateless ``map_batches`` kernel of the north star: per batch, the
``payload`` column's Arrow values buffer is viewed as one contiguous uint8
array (zero copy) and every row is chunked by :func:`fastcdc_rs_ray.cdc.chunk_rows`
(native C loop when available, exact NumPy scan otherwise).  Gear tables and
masks are built once per process (module cache — the reference's ``rechunk``
reuse pattern, src/v2020/mod.rs:627-632); chunk state never crosses rows
(hash resets to 0 at each chunk start, src/v2020/mod.rs:381), so results are
independent of batch/block boundaries.

Output schema (F5): conv_id, chunk_idx:int32, hash:uint64, offset:int64,
length:int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cdc import ChunkerConfig, chunk_rows

# Default transcript-scale config: conversations are KBs, not GBs, so the
# chunk sizes sit well below the reference CLI defaults while staying inside
# the reference's validated bounds (src/v2020/mod.rs:55-65).
DEFAULT_CONFIG = ChunkerConfig(min_size=64, avg_size=256, max_size=1024)


def _binary_column_as_buffer(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(values uint8 view, per-row int64 offsets) of a binary/string column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    odt = (
        np.int64
        if pa.types.is_large_binary(col.type) or pa.types.is_large_string(col.type)
        else np.int32
    )
    offs = np.frombuffer(col.buffers()[1], dtype=odt, count=n + 1 + col.offset)
    offs = offs[col.offset : col.offset + n + 1].astype(np.int64)
    databuf = col.buffers()[2]
    data = (
        np.frombuffer(databuf, dtype=np.uint8)
        if databuf is not None
        else np.empty(0, dtype=np.uint8)
    )
    return data, offs


class ChunkStage:
    """Callable for ``map_batches``: conv_bytes -> chunks.

    A plain function would do (state is a 4 KiB table); the class form keeps
    config construction out of the per-batch path and documents the pattern
    for heavier stages.
    """

    def __init__(self, cfg: ChunkerConfig | None = None, impl: str = "auto"):
        self.cfg = cfg or DEFAULT_CONFIG
        self.impl = impl

    def __call__(self, t: pa.Table) -> pa.Table:
        conv = t["conv_id"]
        payload = t["payload"].combine_chunks() if "payload" in t.column_names else None
        data, offs = _binary_column_as_buffer(payload)
        row_idx, hashes, offsets, lengths = chunk_rows(data, offs, self.cfg, impl=self.impl)
        # chunk_idx within each row: ordinal since chunks are emitted in order
        k = len(row_idx)
        if k:
            first = np.empty(k, dtype=bool)
            first[0] = True
            np.not_equal(row_idx[1:], row_idx[:-1], out=first[1:])
            idx = np.arange(k, dtype=np.int64)
            idx -= np.maximum.accumulate(np.where(first, idx, 0))
        else:
            idx = np.empty(0, dtype=np.int64)
        conv_rep = (
            conv.combine_chunks().take(pa.array(row_idx, pa.int64()))
            if k
            else pa.array([], conv.type)
        )
        return pa.table(
            {
                "conv_id": conv_rep,
                "chunk_idx": pa.array(idx.astype(np.int32), pa.int32()),
                "hash": pa.array(hashes, pa.uint64()),
                "offset": pa.array(offsets, pa.int64()),
                "length": pa.array(lengths, pa.int64()),
            }
        )


def chunk(conv_ds, cfg: ChunkerConfig | None = None, impl: str = "auto"):
    """conv_bytes Dataset -> chunks Dataset (stateless tasks, vectorized)."""
    return conv_ds.map_batches(
        ChunkStage(cfg, impl), batch_format="pyarrow", batch_size=None
    )


def chunk_size_histogram(conv_ds, norm_levels: tuple[int, ...] = (0, 1, 3),
                         base_cfg: ChunkerConfig | None = None) -> pa.Table:
    """Per-normalization-level log2 histogram of chunk sizes — the size
    distribution the 2020 paper's normalized chunking narrows around
    avg_size (reference norm levels src/v2020/mod.rs:433-461; criterion's
    avg_size group benchmarks the same axis, benches/chunking.rs).

    One pass per level over the same payloads (stateless map, no shuffle);
    per-block bincount partials over the ~60 log2 buckets merge
    driver-side.  Output rows: (norm_level, bucket_lo, n_chunks, bytes)
    with bucket_lo = 2^floor(log2(size)).  Rows-only (chunk sizes are not
    SQL-expressible); the spread-narrowing property is pytest-pinned.
    """
    base = base_cfg or DEFAULT_CONFIG
    out = {"norm_level": [], "bucket_lo": [], "n_chunks": [], "bytes": []}
    for lvl in norm_levels:
        cfg = ChunkerConfig(
            min_size=base.min_size, avg_size=base.avg_size,
            max_size=base.max_size, algo=base.algo, seed=base.seed,
            norm_level=lvl)
        chunks = chunk(conv_ds, cfg)

        def partial(t: pa.Table) -> pa.Table:
            ln = t["length"].combine_chunks().to_numpy(zero_copy_only=False)
            ln = ln[ln > 0]
            bucket = np.floor(np.log2(ln)).astype(np.int64)
            n = np.bincount(bucket, minlength=64).astype(np.int64)
            by = np.zeros(64, np.int64)
            np.add.at(by, bucket, ln)
            keep = np.flatnonzero(n)
            return pa.table({
                "bucket": pa.array(keep, pa.int64()),
                "n": pa.array(n[keep], pa.int64()),
                "bytes": pa.array(by[keep], pa.int64()),
            })

        n_tot = np.zeros(64, np.int64)
        b_tot = np.zeros(64, np.int64)
        for b in chunks.map_batches(
                partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            k = t["bucket"].to_numpy(zero_copy_only=False)
            np.add.at(n_tot, k, t["n"].to_numpy(zero_copy_only=False))
            np.add.at(b_tot, k, t["bytes"].to_numpy(zero_copy_only=False))
        for k in np.flatnonzero(n_tot):
            out["norm_level"].append(lvl)
            out["bucket_lo"].append(1 << int(k))
            out["n_chunks"].append(int(n_tot[k]))
            out["bytes"].append(int(b_tot[k]))
    return pa.table({
        "norm_level": pa.array(out["norm_level"], pa.int64()),
        "bucket_lo": pa.array(out["bucket_lo"], pa.int64()),
        "n_chunks": pa.array(out["n_chunks"], pa.int64()),
        "bytes": pa.array(out["bytes"], pa.int64()),
    })
