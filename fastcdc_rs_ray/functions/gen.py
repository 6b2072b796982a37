"""Deterministic content generators (semantics of benches/chunking.rs:42-117).

SplitMix64-driven random / text / zeros / mixed byte streams, used for
scalar-vs-vectorized kernel equivalence tests and benchmark inputs.  All
vectorized with NumPy; byte-for-byte equal to the reference generators.
"""

from __future__ import annotations

import numpy as np

_M = (1 << 64) - 1
_GOLDEN = 0x9E3779B97F4A7C15
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB

_WORDS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "lorem",
    "ipsum", "dolor", "sit", "amet", "fn", "let", "mut", "return", "struct",
    "impl", "self", "match", "async", "await", "value", "offset", "length",
]


def splitmix64_stream(count: int, seed: int) -> np.ndarray:
    """First ``count`` outputs of SplitMix64(seed), vectorized (uint64)."""
    u = np.uint64
    state = (np.arange(1, count + 1, dtype=np.uint64) * u(_GOLDEN)) + u(seed & _M)
    z = state
    z = (z ^ (z >> u(30))) * u(_MIX1)
    z = (z ^ (z >> u(27))) * u(_MIX2)
    return z ^ (z >> u(31))


def gen_random(length: int, seed: int) -> bytes:
    """High-entropy bytes: u64 LE words, then single low bytes to fill."""
    nwords = length // 8
    words = splitmix64_stream(nwords, seed)
    out = bytearray(words.astype("<u8").tobytes())
    if len(out) < length:
        tail = splitmix64_stream(nwords + (length - len(out)), seed)[nwords:]
        out.extend((tail & np.uint64(0xFF)).astype(np.uint8).tobytes())
    return bytes(out)


def gen_text(length: int, seed: int) -> bytes:
    """Word-pool text with space/newline separators at col > 64."""
    # generate enough words: min word len 2 (+1 sep) => length//3 + slack
    est = length // 3 + 16
    out = bytearray()
    col = 0
    idx = 0
    words = splitmix64_stream(est, seed)
    while len(out) < length:
        if idx >= len(words):
            est *= 2
            words = splitmix64_stream(est, seed)
        w = _WORDS[int(words[idx]) % len(_WORDS)]
        idx += 1
        out.extend(w.encode())
        col += len(w)
        if col > 64:
            out.append(0x0A)
            col = 0
        else:
            out.append(0x20)
    return bytes(out[:length])


def gen_zeros(length: int) -> bytes:
    return bytes(length)


def gen_mixed(length: int, seed: int) -> bytes:
    """Alternating ~64 KiB runs of random and text."""
    out = bytearray()
    s = seed & _M
    toggle = False
    while len(out) < length:
        take = min(64 * 1024, length - len(out))
        block = gen_text(take, s) if toggle else gen_random(take, s)
        out.extend(block)
        toggle = not toggle
        s = (s + 0x123456789ABCDEF0) & _M
    return bytes(out)
