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
