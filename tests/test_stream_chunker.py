"""Production streaming chunker (cdc.stream) parity: StreamChunker /
stream_chunks / cut_one / chunk_files_streamed must be bit-identical to
whole-buffer chunking (reference stream-vs-slice contract,
src/v2020/mod.rs:1277-1329; caller-driven cut src/v2020/mod.rs:591-606)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from fastcdc_rs_ray.cdc.config import ChunkerConfig
from fastcdc_rs_ray.cdc.kernel import chunk_bytes, cut_one
from fastcdc_rs_ray.cdc.stream import StreamChunker, stream_chunks

CFG = ChunkerConfig(64, 256, 1024)


def _data(n, seed=7):
    return np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8).tobytes()


@pytest.mark.parametrize("algo", ["v2020", "v2016", "ronomon"])
@pytest.mark.parametrize("read_size", [1, 37, 1000, 4096, 100_000])
def test_stream_matches_whole_buffer(algo, read_size):
    cfg = ChunkerConfig(64, 256, 1024, algo=algo)
    data = _data(50_000)
    expected = chunk_bytes(data, cfg)
    pieces = [data[i : i + read_size] for i in range(0, len(data), read_size)]
    got = list(stream_chunks(iter(pieces), cfg))
    assert got == expected


def test_stream_file_like_and_sizes():
    import io

    data = _data(30_000, seed=3)
    got = list(stream_chunks(io.BytesIO(data), CFG, read_size=777))
    assert got == chunk_bytes(data, CFG)
    # offsets are global + contiguous, lengths cover the input
    assert got[0].offset == 0
    for a, b in zip(got, got[1:]):
        assert a.offset + a.length == b.offset
    assert sum(c.length for c in got) == len(data)


def test_stream_empty_and_tiny():
    assert list(stream_chunks(iter([]), CFG)) == []
    tiny = b"xy"  # below min_size: one runt chunk, hash 0
    assert list(stream_chunks(iter([tiny]), CFG)) == chunk_bytes(tiny, CFG)


def test_finalize_is_idempotent_and_guards_update():
    sc = StreamChunker(CFG)
    sc.update(_data(5_000))
    sc.finalize()
    assert sc.finalize() == []
    with pytest.raises(RuntimeError):
        sc.update(b"more")


@pytest.mark.parametrize("algo", ["v2020", "v2016", "ronomon"])
def test_cut_one_drives_full_chunking(algo):
    cfg = ChunkerConfig(64, 256, 1024, algo=algo)
    data = _data(20_000, seed=11)
    expected = chunk_bytes(data, cfg)
    got, pos = [], 0
    while pos < len(data):
        h, n = cut_one(data, cfg, offset=pos)
        assert n > 0
        got.append((h, pos, n))
        pos += n
    assert [tuple(c) for c in expected] == got


def test_cut_one_ronomon_needs_more_data_sentinel():
    cfg = ChunkerConfig(64, 256, 1024, algo="ronomon")
    data = _data(3_000, seed=5)
    # Non-terminal short window -> (hash, 0) "refill" sentinel (S4)
    h, n = cut_one(data, cfg, offset=len(data) - 200, eof=False)
    assert n == 0
    h, n = cut_one(data, cfg, offset=len(data) - 200, eof=True)
    assert n == 200 or 0 < n <= 200


def test_chunk_files_streamed_matches_chunk_files(ray_session, tmp_path):
    from fastcdc_rs_ray.sources.files import chunk_files, chunk_files_streamed

    rng = np.random.default_rng(9)
    paths = []
    for i, size in enumerate([0, 150, 20_000, 300_000]):
        p = os.path.join(str(tmp_path), f"s{i}.bin")
        with open(p, "wb") as f:
            f.write(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
        paths.append(p)

    def norm(ds):
        df = ds.to_pandas()
        return (
            df.sort_values(["path", "chunk_idx"]).reset_index(drop=True)
        )

    a = norm(chunk_files_streamed(paths, CFG, read_size=64 << 10, emit_rows=50))
    b = norm(chunk_files(paths, CFG))
    assert a.equals(b[a.columns.tolist()])
    assert (a["path"] != paths[0]).all()  # empty file contributes no rows
    assert len(a) > 0


def test_strict_empty_error_parity():
    """Reference Error::Empty parity (src/v2020/mod.rs:669-704): a
    zero-byte source raises EmptyStream under strict_empty=True, stays
    a silent zero-chunk stream by default, and never fires once a byte
    has been seen — even when the final buffer is already drained."""
    import asyncio

    from fastcdc_rs_ray.cdc.stream import EmptyStream, stream_chunks_async

    cfg = ChunkerConfig(min_size=64, avg_size=256, max_size=1024)
    # default: silent empty
    assert list(stream_chunks(b"", cfg)) == []
    sc = StreamChunker(cfg)
    assert sc.update(b"") == [] and sc.finalize() == []

    # strict: raises on truly empty
    with pytest.raises(EmptyStream):
        list(stream_chunks(b"", cfg, strict_empty=True))
    sc = StreamChunker(cfg, strict_empty=True)
    sc.update(b"")
    with pytest.raises(EmptyStream):
        sc.finalize()

    # strict + non-empty: normal semantics, bit-identical to default
    data = bytes(np.random.default_rng(3).integers(0, 256, 5000,
                                                   dtype=np.uint8))
    a = list(stream_chunks(data, cfg))
    b = list(stream_chunks(data, cfg, strict_empty=True))
    assert a == b and len(a) > 0

    # async twin
    async def drain(src, **kw):
        return [c async for c in stream_chunks_async(src, cfg, **kw)]

    assert asyncio.run(drain(b"")) == []
    with pytest.raises(EmptyStream):
        asyncio.run(drain(b"", strict_empty=True))
    assert asyncio.run(drain(data, strict_empty=True)) == a
