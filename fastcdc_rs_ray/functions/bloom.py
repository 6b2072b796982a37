"""Vectorized Bloom filter over int64/uint64 keys — the broadcast
semi-join prefilter for when the build side's exact key set is too large
to ship per task but a few-MB bit array is not.

Double hashing (Kirsch-Mitzenmatcher): probe_i = h1 + i*h2 with h1, h2
independent splitmix64 mixes (h2 forced odd), so k probes cost two mixes.
All build/probe paths are numpy-vectorized over whole key arrays; the
filter is a plain uint64 word array — ``ray.put`` once, zero-copy read in
every map task.

No reference counterpart (fastcdc-rs has no joins at all — SURVEY.md §2.4);
this is public-textbook material (Bloom 1970; Kirsch & Mitzenmacher 2006).
"""

from __future__ import annotations

import numpy as np

from ..util import U64, mix64

_H2_SALT = U64(0xA24BAED4963EE407)


class BloomFilter:
    """Immutable after build; pickles/``ray.put``s as (words, log2_bits, k)."""

    __slots__ = ("words", "log2_bits", "k")

    def __init__(self, words: np.ndarray, log2_bits: int, k: int):
        self.words = words
        self.log2_bits = log2_bits
        self.k = k

    @classmethod
    def build(cls, keys: np.ndarray, log2_bits: int = 20, k: int = 4
              ) -> "BloomFilter":
        words = np.zeros(1 << max(log2_bits - 6, 0), np.uint64)
        bf = cls(words, log2_bits, k)
        if len(keys):
            for idx in bf._probes(keys):
                np.bitwise_or.at(words, idx >> np.uint64(6),
                                 np.uint64(1) << (idx & np.uint64(63)))
        return bf

    def _probes(self, keys: np.ndarray):
        mask = U64((1 << self.log2_bits) - 1)
        h1 = mix64(np.asarray(keys, np.uint64))
        h2 = mix64(h1 ^ _H2_SALT) | np.uint64(1)
        for i in range(self.k):
            yield (h1 + np.uint64(i) * h2) & mask

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership test: False is certain, True may be a
        false positive (rate ~ (1 - e^{-kn/m})^k)."""
        if len(keys) == 0:
            return np.zeros(0, bool)
        out = np.ones(len(keys), bool)
        w = self.words
        for idx in self._probes(keys):
            hit = (w[idx >> np.uint64(6)]
                   >> (idx & np.uint64(63))) & np.uint64(1)
            out &= hit.astype(bool)
            if not out.any():
                break
        return out
