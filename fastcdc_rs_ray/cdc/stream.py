"""Incremental (streaming) chunking — the reference's StreamCDC semantics.

The reference's streaming chunkers (``StreamCDC`` src/v2020/mod.rs:741-915,
``AsyncStreamCDC`` src/v2020/async_stream_cdc.rs:59-250) hold a bounded
buffer, fill it from a reader, cut once, drain the chunk, repeat — and are
pinned to produce exactly the whole-slice boundaries
(src/v2020/mod.rs:1277-1329).  The invariant that makes this exact: a cut
decision never looks past ``max_size`` bytes from the chunk start, and the
runt short-circuit (``remaining <= min_size`` → hash 0) only fires at EOF
when the buffer can no longer be refilled.

Our :class:`StreamChunker` batches that protocol: it runs the vectorized
whole-buffer kernel (:func:`..cdc.chunk_rows`) over the buffered window and
accepts every chunk whose start had full ``max_size`` lookahead
(``offset + max_size <= len(buffer)``) — those decisions cannot change with
more data.  The unsafe tail (< ``max_size`` bytes) is carried and rescanned
after the next refill; with a refill window of K×max_size the rescan
overhead is ~1/K.  At EOF the tail is flushed with the ordinary kernel,
which reproduces the sub-minimum / truncated-fallback semantics exactly.

This is the bounded-memory path for payloads far larger than an Arrow
block — one task streams one file while Ray parallelizes across files
(see :func:`..sources.files.chunk_files_streamed`).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np

from . import chunk_rows
from .config import ChunkerConfig
from .kernel import Chunk


class EmptyStream(Exception):
    """Zero-byte source under ``strict_empty=True`` — the parity twin of
    the reference's ``Error::Empty`` (src/v2020/mod.rs:669-704): its
    ``StreamCDC.read_chunk`` returns ``Err(Error::Empty)`` when the very
    first fill reads no data, so a caller iterating a zero-byte source
    observes the distinguished end-of-source error rather than a silent
    zero-chunk stream.  Table semantics prefer the silent form (empty
    payload -> zero rows), so strict mode is opt-in."""


class StreamChunker:
    """Feed bytes incrementally; collect chunks bit-identical to whole-buffer
    chunking of the concatenation.

    >>> sc = StreamChunker(cfg)
    >>> out = []
    >>> for piece in reader:
    ...     out += sc.update(piece)
    >>> out += sc.finalize()

    Offsets in the emitted :class:`Chunk` records are GLOBAL (relative to the
    start of the stream).  Memory held is at most the unconsumed buffer:
    one refill window plus an unsafe tail < ``max_size``.
    """

    def __init__(self, cfg: ChunkerConfig | None = None, impl: str = "auto",
                 min_scan_bytes: int | None = None,
                 strict_empty: bool = False):
        self.cfg = cfg or ChunkerConfig()
        self.impl = impl
        self.strict_empty = strict_empty
        # Don't run the kernel until this many bytes are buffered (amortizes
        # the rescan of the unsafe tail); EOF always flushes.
        self.min_scan_bytes = (
            min_scan_bytes if min_scan_bytes is not None
            else 8 * self.cfg.max_size
        )
        # The safe-cut rule (accept chunks with full max_size lookahead)
        # is only sound when min <= avg <= max: with avg > max the phase-1
        # center depends on `remaining`, which changes with more data.
        # ChunkerConfig deliberately mirrors the reference (independent
        # per-field bounds only), so the streaming layer validates ordering.
        if not (self.cfg.min_size <= self.cfg.avg_size <= self.cfg.max_size):
            raise ValueError(
                f"StreamChunker requires min_size <= avg_size <= max_size, "
                f"got {self.cfg.min_size}/{self.cfg.avg_size}/"
                f"{self.cfg.max_size}")
        self._buf = bytearray()
        self._base = 0  # global offset of _buf[0]
        self._finalized = False

    def update(self, data: bytes | bytearray | memoryview) -> list[Chunk]:
        """Append bytes; return chunks finalized by this refill."""
        if self._finalized:
            raise RuntimeError("StreamChunker already finalized")
        self._buf += data
        if len(self._buf) < max(self.min_scan_bytes, self.cfg.max_size + 1):
            return []
        return self._cut(eof=False)

    def finalize(self) -> list[Chunk]:
        """Signal EOF; return the remaining chunks (tail semantics apply).
        Under ``strict_empty=True`` a stream that never carried a byte
        raises :class:`EmptyStream` (reference ``Error::Empty`` parity)."""
        if self._finalized:
            return []
        self._finalized = True
        if self.strict_empty and self._base == 0 and not self._buf:
            raise EmptyStream("zero-byte source (reference Error::Empty)")
        return self._cut(eof=True)

    def _cut(self, eof: bool) -> list[Chunk]:
        n = len(self._buf)
        if n == 0:
            return []
        buf = np.frombuffer(self._buf, dtype=np.uint8)
        offsets = np.array([0, n], dtype=np.int64)
        _, h, off, ln = chunk_rows(buf, offsets, self.cfg, impl=self.impl)
        del buf  # release the bytearray export so the drain below can resize
        if not eof:
            # A chunk is final iff its cut decision saw full max_size
            # lookahead; the first unsafe start invalidates everything after.
            keep = int(np.searchsorted(off, n - self.cfg.max_size, side="right"))
            h, off, ln = h[:keep], off[:keep], ln[:keep]
            if keep == 0:
                return []
        out = [
            Chunk(int(hv), self._base + int(o), int(l))
            for hv, o, l in zip(h, off, ln)
        ]
        consumed = int(off[-1] + ln[-1])
        del self._buf[:consumed]
        self._base += consumed
        return out


def stream_chunks(source, cfg: ChunkerConfig | None = None, *,
                  impl: str = "auto", read_size: int = 4 << 20,
                  strict_empty: bool = False) -> Iterator[Chunk]:
    """Chunk a byte stream with bounded memory (StreamCDC/AsyncStreamCDC as
    one generator — Ray tasks are the async fan-out, SURVEY §2.1 S2/S3).

    ``source`` is a file-like object (``.read(n)``) or an iterable of byte
    pieces.  Yields :class:`Chunk` records with global offsets, bit-identical
    to whole-buffer chunking.  ``strict_empty=True`` raises
    :class:`EmptyStream` on a zero-byte source (``Error::Empty`` parity).
    """
    sc = StreamChunker(cfg, impl, strict_empty=strict_empty)
    if isinstance(source, (bytes, bytearray, memoryview)):
        # iterating raw bytes yields ints — treat a single buffer as one piece
        source = [bytes(source)]
    if hasattr(source, "read"):
        def pieces() -> Iterable[bytes]:
            while True:
                piece = source.read(read_size)
                if not piece:
                    return
                yield piece
        it = pieces()
    else:
        it = source
    for piece in it:
        yield from sc.update(piece)
    yield from sc.finalize()


async def stream_chunks_async(source, cfg: ChunkerConfig | None = None, *,
                              impl: str = "auto",
                              read_size: int = 4 << 20,
                              strict_empty: bool = False):
    """Async generator over a byte stream — the asyncio-facing drop-in
    for the reference's ``AsyncStreamCDC::as_stream()``
    (src/v2020/async_stream_cdc.rs:222-249): ``async for chunk in
    stream_chunks_async(reader, cfg)``.

    ``source`` may be an async iterable of byte pieces, an object with an
    async ``read(n)`` coroutine (``asyncio.StreamReader``, aiofiles), or
    any of the synchronous sources :func:`stream_chunks` accepts (wrapped
    without blocking the loop beyond one piece).

    Mask parity: the reference's async variant derives its masks with
    FLOORED ilog2 (src/v2020/async_stream_cdc.rs:124) where the sync
    chunkers round (src/v2020/mod.rs:414-416); pass
    ``ChunkerConfig(mask_select="floored")`` to reproduce AsyncStreamCDC
    bit-for-bit at any ``avg_size``, or leave "rounded" for sync parity —
    at a power-of-two ``avg_size`` the two coincide
    (tests/test_async_stream_parity.py pins both).  Chunk records and
    global offsets are identical to the sync paths; only the driving
    protocol differs.
    """
    sc = StreamChunker(cfg, impl, strict_empty=strict_empty)
    if isinstance(source, (bytes, bytearray, memoryview)):
        for c in sc.update(bytes(source)):
            yield c
        for c in sc.finalize():
            yield c
        return
    # read(n) takes priority over __aiter__: asyncio.StreamReader defines
    # BOTH, and its async iteration is readline-based — newline-free
    # binary data past the reader limit would raise ('Separator is not
    # found') instead of chunking.  read(n) is the byte-stream protocol.
    if hasattr(source, "read"):
        import inspect

        async_read = inspect.iscoroutinefunction(source.read)
        while True:
            piece = (await source.read(read_size)) if async_read \
                else source.read(read_size)
            if not piece:
                break
            for c in sc.update(piece):
                yield c
    elif hasattr(source, "__aiter__"):
        async for piece in source:
            for c in sc.update(piece):
                yield c
    else:
        for piece in source:
            for c in sc.update(piece):
                yield c
    for c in sc.finalize():
        yield c
