"""MinHash stage: chunks -> signatures (actor pool, 128 permutations).

Per conversation, the shingle set is the k-gram (default k=3) sequence over
the conversation's ordered chunk hashes (the north star's "shingled chunk
hashes"; the reference blesses downstream use of the chunk hash at
src/v2020/mod.rs:25-30).  Each of the 128 hash functions is an independent
keyed SplitMix64 avalanche; the signature component is the min over the
conversation's shingles.  Conversations with fewer than k chunks shingle
over what they have (>=1 shingle; empty conversations get an all-max
sentinel signature).

Stateful stage: the 128 keys and scratch are built once per actor
(``__init__``), applied per batch (``__call__``) — the actor-pool pattern
the north star names explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import U64, mix64

N_PERMS = 128
SHINGLE_K = 3
_PERM_BLOCK = 16  # perms per vector pass; bounds scratch at BLOCK x shingles


def shingle_hashes(hashes: np.ndarray, k: int = SHINGLE_K) -> np.ndarray:
    """k-gram rolling combine of a chunk-hash sequence (order-sensitive)."""
    h = np.asarray(hashes, dtype=np.uint64)
    m = len(h)
    if m == 0:
        return h
    if m < k:
        k = m
    out = mix64(h[: m - k + 1])
    for j in range(1, k):
        out = mix64(out ^ h[j : m - k + 1 + j])
    return out


class MinHasher:
    """chunks (sorted batches per conv NOT required) -> signatures."""

    def __init__(self, n_perms: int = N_PERMS, k: int = SHINGLE_K, seed: int = 7):
        self.n_perms = n_perms
        self.k = k
        self.keys = mix64(np.arange(seed, seed + n_perms, dtype=np.uint64) * U64(0x9E3779B97F4A7C15))

    def signatures_for_segments(
        self, shingles: np.ndarray, seg_starts: np.ndarray
    ) -> np.ndarray:
        """(G, n_perms) uint64 signature matrix for concatenated shingle
        segments (seg_starts: int64 start index per segment, strictly
        increasing, all segments non-empty)."""
        from ..cdc._native import minhash_sigs_native

        native = minhash_sigs_native(shingles, seg_starts, self.keys)
        if native is not None:
            return native
        G = len(seg_starts)
        sig = np.empty((G, self.n_perms), dtype=np.uint64)
        for b0 in range(0, self.n_perms, _PERM_BLOCK):
            kb = self.keys[b0 : b0 + _PERM_BLOCK]
            y = mix64(shingles[None, :] ^ kb[:, None])  # (B, m)
            red = np.minimum.reduceat(y, seg_starts, axis=1)  # (B, G)
            sig[:, b0 : b0 + _PERM_BLOCK] = red.T
        return sig

    def _shingles_all_segments(
        self, hashes: np.ndarray, starts: np.ndarray, ends: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-segment k-gram shingles, vectorized across segments.

        One global k-gram pass over the concatenated hash array covers every
        segment with >= k elements (positions whose window crosses a segment
        boundary are simply never gathered); segments shorter than k fall
        back to :func:`shingle_hashes` (rare: conversations with < k
        chunks).  Output is bit-identical to the per-segment loop."""
        k = self.k
        m_seg = ends - starts
        G = len(starts)
        N = len(hashes)
        L = max(N - k + 1, 0)
        if L:
            g = mix64(hashes[:L].copy())
            for j in range(1, k):
                g = mix64(g ^ hashes[j : L + j])
        else:
            g = np.empty(0, np.uint64)
        big = m_seg >= k
        cnt_big = np.where(big, m_seg - k + 1, 0)
        out_cnt = np.where(big, cnt_big, 1)
        seg_starts = np.concatenate([[0], np.cumsum(out_cnt)[:-1]]).astype(np.int64)
        out = np.empty(int(out_cnt.sum()), dtype=np.uint64)
        if big.any():
            tot = int(cnt_big.sum())
            base = np.repeat(starts[big], cnt_big[big])
            off0 = np.concatenate([[0], np.cumsum(cnt_big[big])[:-1]])
            within = np.arange(tot, dtype=np.int64) - np.repeat(off0, cnt_big[big])
            gathered = g[base + within]
            opos = np.repeat(seg_starts[big], cnt_big[big]) + within
            out[opos] = gathered
        for gi in np.flatnonzero(~big):
            out[seg_starts[gi]] = shingle_hashes(
                hashes[starts[gi] : ends[gi]], k
            )[0]
        return out, seg_starts

    def __call__(self, t: pa.Table) -> pa.Table:
        # group by conv within the batch (batches contain whole conversations:
        # the chunk stage preserves assembly's conv-per-block layout)
        import pyarrow.compute as pc

        if len(t) == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "minhash": pa.array([], pa.list_(pa.uint64(), self.n_perms)),
                }
            )
        order = pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("chunk_idx", "ascending")]
        )
        t = t.take(order)
        conv = t["conv_id"].combine_chunks()
        hashes = t["hash"].combine_chunks().to_numpy()
        n = len(t)
        neq = pc.not_equal(conv.slice(1), conv.slice(0, n - 1))
        bounds = np.flatnonzero(neq.to_numpy(zero_copy_only=False))
        starts = np.concatenate([[0], bounds + 1]).astype(np.int64)
        ends = np.concatenate([starts[1:], [n]]).astype(np.int64)

        shingles, seg_starts = self._shingles_all_segments(hashes, starts, ends)
        sig = self.signatures_for_segments(shingles, seg_starts)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(starts, pa.int64())),
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.reshape(-1), pa.uint64()), self.n_perms
                ),
            }
        )


_HASHER_CACHE: dict[tuple, MinHasher] = {}


def _cached_hasher(n_perms: int, k: int, seed: int) -> MinHasher:
    key = (n_perms, k, seed)
    h = _HASHER_CACHE.get(key)
    if h is None:
        h = _HASHER_CACHE[key] = MinHasher(n_perms, k, seed)
    return h


def minhash(chunks_ds, n_perms: int = N_PERMS, k: int = SHINGLE_K, seed: int = 7,
            concurrency=None):
    """chunks Dataset -> signatures Dataset.

    Stateless tasks with a module-level per-worker hasher cache (the
    ``rechunk`` reuse pattern): MinHash state is a 1 KiB key vector, so an
    actor pool would only add spawn latency.  Pass ``concurrency=(lo, hi)``
    to force the actor-pool form for genuinely heavy per-worker state
    (e.g. a learned model re-ranking stage).
    """
    if concurrency is not None:
        return chunks_ds.map_batches(
            MinHasher,
            fn_constructor_kwargs={"n_perms": n_perms, "k": k, "seed": seed},
            batch_format="pyarrow",
            batch_size=None,
            concurrency=concurrency,
        )

    def apply(t: pa.Table) -> pa.Table:
        return _cached_hasher(n_perms, k, seed)(t)

    return chunks_ds.map_batches(apply, batch_format="pyarrow", batch_size=None)
