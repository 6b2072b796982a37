"""Vectorized kernel ≡ scalar kernel ≡ reference vectors.

The scalar kernel is the conformance baseline (tests of record in
test_kernel_golden.py); here the NumPy kernel is property-tested against it
over the reference's deterministic generator corpus
(benches/chunking.rs:42-117 semantics) plus the fixture, across the config
matrix of the reference tests.
"""

from __future__ import annotations

import numpy as np
import pytest

from fastcdc_rs_ray.cdc.config import ChunkerConfig
from fastcdc_rs_ray.cdc.kernel import chunk_bytes
from fastcdc_rs_ray.cdc.kernel_np import chunk_bytes_fast, chunk_rows
from fastcdc_rs_ray.functions.gen import gen_mixed, gen_random, gen_text, gen_zeros

CONFIGS = [
    ChunkerConfig(64, 256, 1024),
    ChunkerConfig(4096, 16384, 65535),
    ChunkerConfig(4096, 16384, 65535, seed=666),
    ChunkerConfig(4096, 16384, 65535, norm_level=0),
    ChunkerConfig(8192, 16384, 32768, norm_level=3),
    ChunkerConfig(8192, 32768, 131072),
    ChunkerConfig(64, 256, 1024, algo="v2016"),
    ChunkerConfig(4096, 16384, 65535, algo="v2016"),
    ChunkerConfig(4096, 16384, 65535, algo="v2016", norm_level=0),
    ChunkerConfig(4096, 16384, 65535, algo="v2016", norm_level=3),
]


def _inputs():
    yield "fixture", open("/root/reference/test/fixtures/SekienAkashita.jpg", "rb").read()
    yield "random", gen_random(300_000, 42)
    yield "text", gen_text(300_000, 42)
    yield "zeros", gen_zeros(150_000)
    yield "mixed", gen_mixed(300_000, 42)
    yield "tiny", gen_random(100, 7)
    yield "exact_min", gen_random(4096, 7)
    yield "odd_len", gen_random(300_001, 9)
    yield "empty", b""


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: f"{c.algo}-{c.avg_size}-nc{c.norm_level}-s{c.seed}")
def test_vectorized_equals_scalar(cfg):
    for name, data in _inputs():
        expect = [(c.hash, c.offset, c.length) for c in chunk_bytes(data, cfg)]
        got = chunk_bytes_fast(data, cfg)
        assert got == expect, f"mismatch on {name} with {cfg}"


def test_chunk_rows_multirow_and_slab_invariance():
    # Rows must chunk independently and identically regardless of how they
    # are packed into one buffer (the buffer-size-invariance guarantee,
    # src/v2020/mod.rs:1277-1329 transposed to rows).
    cfg = ChunkerConfig(256, 1024, 4096)
    rows = [
        gen_random(10_000, 1),
        gen_text(5_000, 2),
        b"",
        gen_zeros(9_000),
        gen_random(123, 3),
        gen_mixed(50_000, 4),
    ]
    buf = np.frombuffer(b"".join(rows), dtype=np.uint8)
    offsets = np.cumsum([0] + [len(r) for r in rows])
    row_idx, hs, offs, lens = chunk_rows(buf, offsets, cfg)
    for r, data in enumerate(rows):
        mask = row_idx == r
        got = list(zip(hs[mask].tolist(), offs[mask].tolist(), lens[mask].tolist()))
        expect = [(c.hash, c.offset, c.length) for c in chunk_bytes(data, cfg)]
        assert got == expect, f"row {r}"
    # coverage: per-row lengths sum to row size
    for r, data in enumerate(rows):
        assert lens[row_idx == r].sum() == len(data)


def test_chunk_rows_slab_split_boundary():
    # force multiple slabs by shrinking the slab size
    import fastcdc_rs_ray.cdc.kernel_np as knp

    cfg = ChunkerConfig(256, 1024, 4096)
    rows = [gen_mixed(40_000, i) for i in range(8)]
    buf = np.frombuffer(b"".join(rows), dtype=np.uint8)
    offsets = np.cumsum([0] + [len(r) for r in rows])
    base = chunk_rows(buf, offsets, cfg)
    old = knp._SLAB_BYTES
    try:
        knp._SLAB_BYTES = 50_000  # a couple rows per slab
        small = chunk_rows(buf, offsets, cfg)
    finally:
        knp._SLAB_BYTES = old
    for a, b in zip(base, small):
        assert (a == b).all()


def test_ronomon_chunk_rows_matches_scalar():
    cfg = ChunkerConfig(64, 256, 1024, algo="ronomon")
    rows = [gen_random(5_000, 1), gen_zeros(3_000)]
    buf = np.frombuffer(b"".join(rows), dtype=np.uint8)
    offsets = np.cumsum([0] + [len(r) for r in rows])
    row_idx, hs, offs, lens = chunk_rows(buf, offsets, cfg)
    for r, data in enumerate(rows):
        mask = row_idx == r
        got = list(zip(hs[mask].tolist(), offs[mask].tolist(), lens[mask].tolist()))
        expect = [(c.hash, c.offset, c.length) for c in chunk_bytes(data, cfg)]
        assert got == expect


def test_native_equals_scalar():
    # native C kernel (if a compiler exists) must equal the scalar baseline
    from fastcdc_rs_ray.cdc._native import chunk_rows_native

    sek = open("/root/reference/test/fixtures/SekienAkashita.jpg", "rb").read()
    inputs = [gen_random(100_000, 1), gen_text(50_000, 2), gen_zeros(30_000),
              gen_mixed(120_001, 3), b"", bytes(10), sek]
    cfgs = CONFIGS + [
        ChunkerConfig(64, 256, 1024, algo="ronomon"),
        ChunkerConfig(8192, 16384, 32768, algo="ronomon"),
    ]
    for cfg in cfgs:
        for data in inputs:
            buf = np.frombuffer(data, dtype=np.uint8)
            offs = np.array([0, len(buf)], dtype=np.int64)
            res = chunk_rows_native(buf, offs, cfg)
            if res is None:
                pytest.skip("no C compiler available")
            got = list(zip(res[1].tolist(), res[2].tolist(), res[3].tolist()))
            exp = [(c.hash, c.offset, c.length) for c in chunk_bytes(data, cfg)]
            assert got == exp, f"{cfg} len={len(data)}"


def test_native_multirow():
    from fastcdc_rs_ray.cdc import chunk_rows as chunk_rows_auto

    cfg = ChunkerConfig(256, 1024, 4096)
    rows = [gen_random(10_000, 1), b"", gen_zeros(9_000), gen_mixed(50_000, 4)]
    buf = np.frombuffer(b"".join(rows), dtype=np.uint8)
    offsets = np.cumsum([0] + [len(r) for r in rows])
    row_idx, hs, offs, lens = chunk_rows_auto(buf, offsets, cfg)
    for r, data in enumerate(rows):
        mask = row_idx == r
        got = list(zip(hs[mask].tolist(), offs[mask].tolist(), lens[mask].tolist()))
        expect = [(c.hash, c.offset, c.length) for c in chunk_bytes(data, cfg)]
        assert got == expect, f"row {r}"


# ---------------------------------------------------------------------------
# hypothesis generalization (SURVEY §5.4): coverage + scalar/fast parity over
# RANDOM inputs and RANDOM valid configs, not just the fixed matrix above
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _random_cfg(draw):
    algo = draw(st.sampled_from(["v2020", "v2016", "ronomon"]))
    avg_bits = draw(st.integers(8, 12))          # avg 256..4096
    avg = 1 << avg_bits
    min_size = draw(st.integers(64, avg // 2))
    max_size = draw(st.integers(max(1024, avg * 2), avg * 8))
    if algo == "ronomon":
        # ronomon requires min>=64, avg>=256, max<=1GiB (wider bounds)
        return ChunkerConfig(min_size, avg, max_size, algo=algo)
    norm = draw(st.sampled_from([0, 1, 2, 3]))
    seed = draw(st.sampled_from([0, 666]))
    return ChunkerConfig(min_size, avg, max_size, algo=algo,
                         norm_level=norm, seed=seed)


@st.composite
def _random_payload(draw):
    kind = draw(st.sampled_from(["random", "text", "zeros", "mixed", "runs"]))
    n = draw(st.integers(0, 20_000))
    seed = draw(st.integers(0, 2**31 - 1))
    if kind == "random":
        return bytes(gen_random(n, seed))
    if kind == "text":
        return bytes(gen_text(n, seed))
    if kind == "zeros":
        return bytes(n)
    if kind == "runs":
        # long byte runs stress the max-size fallback path
        rng = np.random.default_rng(seed)
        vals = rng.integers(0, 256, size=max(1, n // 512 + 1), dtype=np.uint8)
        return bytes(np.repeat(vals, 512)[:n].tobytes())
    return bytes(gen_mixed(n, seed))


@settings(max_examples=40, deadline=None)
@given(cfg=_random_cfg(), data=_random_payload())
def test_hypothesis_coverage_and_parity(cfg, data):
    got = chunk_bytes(data, cfg)
    # coverage: contiguous, non-empty, every byte exactly once
    pos = 0
    for c in got:
        assert c.offset == pos and 0 < c.length <= cfg.max_size
        pos += c.length
    assert pos == len(data)
    # Non-final chunks respect the size floor — with the reference's own
    # quirk: v2020 scans two bytes per roll from index = min_size/2
    # (src/v2020/mod.rs:380), so for ODD min_size a cut can land at
    # min_size - 1 (the first judged position is floor(min/2)*2).
    floor = cfg.min_size - (1 if cfg.algo == "v2020" and cfg.min_size % 2 else 0)
    for c in got[:-1]:
        assert c.length >= floor
    # fast path (native/NumPy) must agree bit-for-bit with the scalar kernel
    fast = chunk_bytes_fast(data, cfg)  # list[(hash, offset, length)]
    assert [(c.hash, c.offset, c.length) for c in got] == fast
