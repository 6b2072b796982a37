"""StreamCDC / AsyncStreamCDC parity (reference src/v2020/mod.rs:1277-1329,
src/v2020/async_stream_cdc.rs:325-386): chunking through a bounded refill
buffer must reproduce the whole-slice boundaries, hashes and content.

The reference's streaming chunkers hold a ``max_size`` buffer, fill it from
the reader, cut once, drain the chunk, compact, repeat
(src/v2020/mod.rs:831-901).  A cut decision never needs more than
``max_size`` lookahead, so chunk-at-a-time refill is exact; our engine
relies on the same invariant when a conversation's bytes are assembled per
row (batch boundaries cannot change results)."""

from __future__ import annotations

import hashlib

import pytest

from fastcdc_rs_ray.cdc.config import ChunkerConfig
from fastcdc_rs_ray.cdc.kernel import chunk_bytes, cut_v2016, cut_v2020


def _make_cut(cfg: ChunkerConfig):
    if cfg.algo == "v2016":
        gear, _ = cfg.gear_tables()
        g = gear.tolist()
        return lambda b: cut_v2016(
            b, cfg.min_size, cfg.avg_size, cfg.max_size, cfg.mask_s, cfg.mask_l, g
        )
    gear, gear_ls = cfg.gear_tables()
    g, gl = gear.tolist(), gear_ls.tolist()
    return lambda b: cut_v2020(
        b, cfg.min_size, cfg.avg_size, cfg.max_size,
        cfg.mask_s, cfg.mask_l, cfg.mask_s_ls, cfg.mask_l_ls, g, gl,
    )


def _stream_chunks(data: bytes, cfg: ChunkerConfig, read_size: int):
    """Emulate StreamCDC: refill a bounded buffer in ``read_size`` steps,
    cut against the buffered window only, drain, compact, repeat.  The
    window is max_size+1 bytes — exactly the slice the whole-buffer driver
    hands the cut kernel per chunk (kernel.iter_chunks)."""
    cut = _make_cut(cfg)
    window = cfg.max_size + 1
    out = []
    buf = b""
    pos = 0
    eof = False
    while True:
        while not eof and len(buf) < window:
            piece = data[pos : pos + read_size]
            pos += len(piece)
            if not piece:
                eof = True
            buf += piece
        if not buf:
            break
        h, n = cut(memoryview(buf)[:window])
        out.append((h, n, bytes(buf[:n])))
        buf = buf[n:]
    return out


@pytest.mark.parametrize("read_size", [1024, 4096, 65536])
def test_v2020_stream_equals_slice(sekien, read_size):
    cfg = ChunkerConfig(4096, 16384, 65535)
    whole = chunk_bytes(sekien, cfg)
    streamed = _stream_chunks(sekien, cfg, read_size)
    assert [(c.hash, c.length) for c in whole] == [(h, n) for h, n, _ in streamed]
    # content parity (the reference pins digests of each chunk's bytes)
    offs = 0
    for c, (_, _, payload) in zip(whole, streamed):
        assert sekien[offs : offs + c.length] == payload
        offs += c.length
    assert offs == len(sekien)


def test_v2020_stream_seeded(sekien):
    cfg = ChunkerConfig(4096, 16384, 65535, seed=666)
    whole = chunk_bytes(sekien, cfg)
    streamed = _stream_chunks(sekien, cfg, 8192)
    assert [(c.hash, c.length) for c in whole] == [(h, n) for h, n, _ in streamed]


def test_v2016_stream_equals_slice(sekien):
    cfg = ChunkerConfig(4096, 16384, 65535, algo="v2016")
    whole = chunk_bytes(sekien, cfg)
    streamed = _stream_chunks(sekien, cfg, 4096)
    assert [(c.hash, c.length) for c in whole] == [(h, n) for h, n, _ in streamed]


def test_stream_digest_chain(sekien):
    """Whole-stream content digest equality — mirrors the reference's
    blake3-digest streaming fixtures with sha256."""
    cfg = ChunkerConfig(8192, 32768, 131072)
    whole = hashlib.sha256()
    for c in chunk_bytes(sekien, cfg):
        whole.update(sekien[c.offset : c.offset + c.length])
    streamed = hashlib.sha256()
    for _, _, payload in _stream_chunks(sekien, cfg, 10_000):
        streamed.update(payload)
    assert whole.hexdigest() == streamed.hexdigest()
