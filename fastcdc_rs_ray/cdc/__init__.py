"""CDC kernel package: config, tables, and three interchangeable kernels.

- :mod:`.kernel` — pure-Python scalar, the conformance baseline.
- :mod:`.kernel_np` — exact NumPy windowed-scan kernel (no compiler needed).
- :mod:`._native` — exact C loop compiled at first use when `cc` exists.

:func:`chunk_rows` picks the fastest available exact implementation.
"""

from __future__ import annotations

import numpy as np

from .config import ChunkerConfig
from ._native import chunk_rows_native
from .kernel_np import chunk_rows as chunk_rows_np


def chunk_rows(
    buf: np.ndarray,
    row_offsets: np.ndarray,
    cfg: ChunkerConfig,
    impl: str = "auto",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Chunk all rows of a concatenated uint8 buffer.

    Returns ``(row_ordinal int32, hash uint64, offset int64, length int64)``.
    ``impl`` is ``auto`` (native if available, else numpy), ``native``, or
    ``numpy``.  All implementations are bit-exact (property-tested against
    the scalar kernel and the reference golden vectors).
    """
    if impl in ("auto", "native"):
        res = chunk_rows_native(buf, row_offsets, cfg)
        if res is not None:
            return res
        if impl == "native":
            raise RuntimeError("native kernel unavailable (no C compiler?)")
    return chunk_rows_np(buf, row_offsets, cfg)


__all__ = [
    "ChunkerConfig", "chunk_rows", "chunk_rows_np", "chunk_rows_native",
    "StreamChunker", "stream_chunks", "stream_chunks_async", "cut_one",
]


def __getattr__(name):
    # Lazy: stream imports this package (chunk_rows) at module load.
    if name in ("StreamChunker", "stream_chunks", "stream_chunks_async"):
        from . import stream

        return getattr(stream, name)
    if name == "cut_one":
        from .kernel import cut_one

        return cut_one
    raise AttributeError(name)
