"""AsyncStreamCDC (S3) parity — the reference's async streaming variant.

The reference's async chunker shares the cut kernel with StreamCDC but
derives its masks with FLOORED ilog2 (src/v2020/async_stream_cdc.rs:124
``avg_size.ilog2()``) where the sync paths round
(src/v2020/mod.rs:414-416 ``log2().round()``).  Two consequences, both
pinned here:

1. At a power-of-two ``avg_size`` the two derivations coincide, so the
   async test vectors (src/v2020/async_stream_cdc.rs:325-386, 16 KiB avg
   over SekienAkashita.jpg) must be bit-identical to our StreamChunker —
   in BOTH mask_select modes.  The reference pins blake3 digests for
   chunk content; blake3 isn't in this sandbox, so content is pinned by
   sha256 instead (bytes equality is what matters, not the digest algo).
2. At a non-power-of-two ``avg_size`` the derivations genuinely diverge
   (bits differ once frac(log2) >= 0.5), so async-vs-sync parity is a
   power-of-two-only claim — asserted, not argued.
"""

from __future__ import annotations

import hashlib

from fastcdc_rs_ray.cdc.config import (
    ChunkerConfig,
    logarithm2,
    logarithm2_floored,
)
from fastcdc_rs_ray.cdc.kernel import chunk_bytes
from fastcdc_rs_ray.cdc.stream import stream_chunks

# src/v2020/async_stream_cdc.rs:325-386 (test_iter_sekien_16k_chunks):
# (hash, offset, length) exactly as the reference pins them.
ASYNC_EXPECTED_16K = [
    (17968276318003433923, 0, 21325),
    (8197189939299398838, 21325, 17140),
    (13019990849178155730, 38465, 28084),
    (4509236223063678303, 66549, 18217),
    (2504464741100432583, 84766, 24700),
]

# sha256 of the same fixture slices whose blake3 digests the reference
# pins (blake3 isn't in this sandbox; pinning a digest of the bytes is
# the same content guarantee).
ASYNC_EXPECTED_SHA256 = [
    "695429afe5937d6c75099f6e587267065a64e9dd83596a3d7386df3ef5a792c2",
    "17119f7abc183375afdb652248aad0c7211618d263335cc4e4ffc9a31e719bcb",
    "1545925739c6bfbd6609752a0e6ab61854f14d1fdb9773f08a7f52a13f9362d8",
    "bbd5b0b284d4e3c2098e92e8e2897e738c669113d06472560188d99a288872a3",
    "ede34e1a6cb287766e857eb0ed45b9f4b5ad83bb93c597be880c3a2ac91cddbe",
]


def _run_stream(data: bytes, cfg: ChunkerConfig, read_size: int):
    pieces = [data[i: i + read_size] for i in range(0, len(data), read_size)]
    return list(stream_chunks(iter(pieces), cfg))


def test_async_digests_power_of_two_parity(sekien):
    """StreamChunker reproduces the AsyncStreamCDC vectors at 16 KiB avg
    (power of two -> floored ilog2 == rounded log2) for both mask modes
    and for several read granularities (async reads are arbitrary-sized)."""
    for mask_select in ("rounded", "floored"):
        cfg = ChunkerConfig(4096, 16384, 65535, mask_select=mask_select)
        for read_size in (1337, 4096, 65536):
            got = _run_stream(sekien, cfg, read_size)
            assert [(c.hash, c.offset, c.length) for c in got] == \
                ASYNC_EXPECTED_16K, (mask_select, read_size)
            # content pinned by digest, like the reference's blake3 list
            for c, want in zip(got, ASYNC_EXPECTED_SHA256):
                piece = sekien[c.offset: c.offset + c.length]
                assert hashlib.sha256(piece).hexdigest() == want


def test_floored_vs_rounded_mask_divergence(sekien):
    """At non-power-of-two avg the async (floored) and sync (rounded)
    mask derivations differ: logarithm2(24000)=15 vs ilog2(24000)=14
    (reference async_stream_cdc.rs:124 vs mod.rs:414-416), and the two
    configs genuinely cut the fixture differently."""
    assert logarithm2(24000) == 15
    assert logarithm2_floored(24000) == 14
    # at powers of two they agree, by construction
    for v in (4096, 16384, 65536):
        assert logarithm2(v) == logarithm2_floored(v)

    cut_rounded = chunk_bytes(
        sekien, ChunkerConfig(4096, 24000, 65535, mask_select="rounded"))
    cut_floored = chunk_bytes(
        sekien, ChunkerConfig(4096, 24000, 65535, mask_select="floored"))
    assert [(c.offset, c.length) for c in cut_rounded] != \
        [(c.offset, c.length) for c in cut_floored]
    # each is still internally stream-consistent
    assert _run_stream(
        sekien, ChunkerConfig(4096, 24000, 65535, mask_select="floored"), 999
    ) == cut_floored


def test_asyncio_wrapper_matches_async_vectors(sekien):
    """stream_chunks_async (the asyncio-facing AsyncStreamCDC drop-in)
    reproduces the reference's 16 KiB async vectors in BOTH mask modes,
    fed through a genuine async iterator."""
    import asyncio

    async def byte_pieces(data: bytes, n: int):
        for i in range(0, len(data), n):
            await asyncio.sleep(0)
            yield data[i: i + n]

    from fastcdc_rs_ray.cdc.stream import stream_chunks_async

    for mode in ("rounded", "floored"):
        cfg = ChunkerConfig(min_size=8192, avg_size=16384, max_size=32768,
                            mask_select=mode)

        async def run(cfg=cfg):
            out = []
            async for c in stream_chunks_async(
                    byte_pieces(sekien, 65536), cfg):
                out.append(c)
            return out

        got = asyncio.run(run())
        assert [(c.hash, c.offset, c.length) for c in got] == \
            ASYNC_EXPECTED_16K
        for c, want in zip(got, ASYNC_EXPECTED_SHA256):
            assert hashlib.sha256(
                sekien[c.offset: c.offset + c.length]).hexdigest() == want


def test_asyncio_wrapper_async_read_object(sekien):
    """An object exposing an async read(n) coroutine (the
    asyncio.StreamReader shape) drives the same boundaries."""
    import asyncio

    from fastcdc_rs_ray.cdc.stream import stream_chunks_async

    class AsyncReader:
        def __init__(self, data: bytes, n: int = 50000):
            self.data, self.pos, self.n = data, 0, n

        async def read(self, _size: int):
            await asyncio.sleep(0)
            piece = self.data[self.pos: self.pos + self.n]
            self.pos += len(piece)
            return piece

    cfg = ChunkerConfig(min_size=8192, avg_size=16384, max_size=32768)

    async def run():
        return [c async for c in stream_chunks_async(
            AsyncReader(sekien), cfg)]

    got = asyncio.run(run())
    assert [(c.hash, c.offset, c.length) for c in got] == ASYNC_EXPECTED_16K


def test_asyncio_wrapper_real_streamreader_binary(sekien):
    """A genuine asyncio.StreamReader carrying newline-free binary data:
    the wrapper must use read(n), NOT the reader's readline-based async
    iteration (which raises 'Separator is not found' past the limit)."""
    import asyncio

    from fastcdc_rs_ray.cdc.stream import stream_chunks_async

    cfg = ChunkerConfig(min_size=8192, avg_size=16384, max_size=32768)

    async def run():
        reader = asyncio.StreamReader(limit=65536)
        reader.feed_data(sekien)
        reader.feed_eof()
        return [c async for c in stream_chunks_async(reader, cfg)]

    got = asyncio.run(run())
    assert [(c.hash, c.offset, c.length) for c in got] == ASYNC_EXPECTED_16K
