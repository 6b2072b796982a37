"""Vectorized (NumPy) FastCDC kernels — exact, batch-oriented.

Why this is exact
-----------------
The v2020 gear roll (``src/v2020/mod.rs:384-400``) is, per byte-pair ``p``
with ``S[p] = GEAR_LS[even_byte] + GEAR[odd_byte]`` (wrapping u64):

    h_odd[p]  = 4 * h_odd[p-1] + S[p]        (mod 2^64)
    h_even[p] = h_odd[p] - GEAR[odd_byte_p]

Because each older pair is left-shifted 2 more bits, any pair more than 31
positions back contributes ``x << 64 == 0 (mod 2^64)``: the recurrence has a
hard 32-pair window.  A Kogge-Stone scan (5 passes: strides 1,2,4,8,16)
therefore computes ``W[p] = sum_{k=0..31} S[p-k] << 2k`` — the *exact* roll
state at every position — in O(5n) vector ops.  A chunk scan that started at
pair ``i0`` agrees with the global windowed value from ``i0 + 31`` onward;
the first 31 pairs of each scan (62 bytes) are fixed up with the scalar
kernel.  The same argument applies to v2016 with a 64-byte window (6 passes,
strides 1..32).

Hit detection uses a candidate filter: a position can satisfy
``(h & mask) == 0`` for either tier only if it satisfies it for
``common = mask_s & mask_l``, so one masked compare finds all candidates
(rate ~2^-popcount(common)) and the exact per-tier judgment runs on those
few positions only.

The ronomon variant uses a *right* shift with carry-propagating addition
(``h = (h >> 1) + TABLE[b]``, ``src/ronomon/mod.rs:150``), which is not
linear mod 2^32 — there is no exact windowed form, so it falls back to the
scalar kernel (it is the compatibility variant, not the performance path).

Inputs are a single contiguous uint8 buffer plus row offsets — exactly the
layout of a pyarrow string/large_binary column's values buffer, so the
chunking stage is zero-copy from Arrow (SURVEY.md §7.3).

All large temporaries come from a per-process scratch pool (first-touch
page faults are ~26 us/page in this sandbox; see fastcdc_rs_ray._mem).
"""

from __future__ import annotations

from bisect import bisect_left

import numpy as np

from .config import ChunkerConfig
from .kernel import chunk_bytes as _scalar_chunk_bytes

_U64 = (1 << 64) - 1
_SLAB_BYTES = 4 * 1024 * 1024  # precompute granularity; rows never split

# per-process scratch buffers, reused across batches (keyed by name)
_scratch: dict = {}


def _buf(name: str, n: int, dtype) -> np.ndarray:
    a = _scratch.get(name)
    if a is None or a.dtype != dtype or len(a) < n:
        a = np.empty(max(n, 1), dtype=dtype)
        _scratch[name] = a
    return a[:n]


class _TierHits:
    """Sorted hit positions for one mask tier, precedence-resolved."""

    __slots__ = ("idx", "even", "hval")

    def __init__(self, idx, even, hval):
        self.idx = idx  # global pair/byte index (list[int], sorted)
        self.even = even  # v2020 only: True -> cut at even half
        self.hval = hval  # resolved hash value


# --------------------------------------------------------------------------
# v2020
# --------------------------------------------------------------------------


def _precompute_v2020(buf: np.ndarray, cfg: ChunkerConfig, gear, gear_ls):
    """Per-parity windowed hashes + per-tier hit lists for one slab."""
    n = len(buf)
    u = np.uint64
    common = u(cfg.mask_s & cfg.mask_l)
    common_ls = u(cfg.mask_s_ls & cfg.mask_l_ls)
    out = []
    for sigma in (0, 1):
        npairs = (n - sigma) // 2
        if npairs <= 0:
            empty = _TierHits([], [], [])
            out.append((np.empty(0, dtype=np.uint64), empty, empty))
            continue
        evens = _buf(f"ev{sigma}", npairs, np.uint8)
        odds = _buf(f"od{sigma}", npairs, np.uint8)
        np.copyto(evens, buf[sigma : sigma + 2 * npairs : 2])
        np.copyto(odds, buf[sigma + 1 : sigma + 1 + 2 * npairs : 2])
        C = _buf("C", npairs, np.uint64)
        D = _buf("D", npairs, np.uint64)
        # fancy indexing: np.take(..., out=) hits a ~50x slower numpy path
        C[:] = gear_ls[evens]
        D[:] = gear[odds]
        # W (persistent per parity): scan of S = C + D
        W = _buf(f"W{sigma}", npairs, np.uint64)
        np.add(C, D, out=W)
        SH = _buf("SH", npairs, np.uint64)
        for s in (1, 2, 4, 8, 16):
            m = npairs - s
            if m <= 0:
                break
            np.left_shift(W[:m], u(2 * s), out=SH[:m])
            np.add(W[s:], SH[:m], out=W[s:])
        # E = h_even = W - D (reuse C's buffer: C is dead now)
        E = C
        np.subtract(W, D, out=E)
        # candidate filter: either tier hit at either half implies common fires
        band = _buf("band", npairs, np.uint64)
        hitb = _buf("hitb", npairs, np.bool_)
        np.bitwise_and(W, common, out=band)
        np.equal(band, u(0), out=hitb)
        cand_odd = np.flatnonzero(hitb)
        np.bitwise_and(E, common_ls, out=band)
        np.equal(band, u(0), out=hitb)
        cand_even = np.flatnonzero(hitb)
        # exact per-tier refinement on the (rare) candidates
        Ec, Wc = E[cand_even], W[cand_odd]
        tiers = []
        for mask, mask_ls in ((cfg.mask_s, cfg.mask_s_ls), (cfg.mask_l, cfg.mask_l_ls)):
            ev_q = cand_even[(Ec & u(mask_ls)) == 0]
            od_q = cand_odd[(Wc & u(mask)) == 0]
            # merge, even takes precedence within a pair
            q = np.union1d(ev_q, od_q)
            is_even = np.isin(q, ev_q, assume_unique=True)
            hval = np.where(is_even, E[q], W[q])
            tiers.append(_TierHits(q.tolist(), is_even.tolist(), hval.tolist()))
        out.append((W, tiers[0], tiers[1]))
    return out


def _walk_v2020(buf: np.ndarray, lo: int, hi: int, cfg: ChunkerConfig, pre, gear_l, gear_ls_l):
    """Chunk one row [lo, hi) of the slab using precomputed hit lists."""
    min_size, avg_size, max_size = cfg.min_size, cfg.avg_size, cfg.max_size
    mask_s, mask_l = cfg.mask_s, cfg.mask_l
    mask_s_ls, mask_l_ls = cfg.mask_s_ls, cfg.mask_l_ls
    i0 = min_size // 2
    hashes, lengths = [], []
    pos = lo
    while pos < hi:
        remaining = hi - pos
        if remaining <= min_size:
            hashes.append(0)
            lengths.append(remaining)
            break
        rem = remaining if remaining <= max_size else max_size
        center = avg_size if remaining >= avg_size else remaining
        limit1 = center // 2
        limit2 = rem // 2
        ramp_end = i0 + 31
        if ramp_end > limit2:
            ramp_end = limit2
        # --- scalar ramp: pairs [i0, ramp_end) (true hash has < full window) ---
        h = 0
        cut_h = cut_n = None
        i = i0
        while i < ramp_end:
            a = pos + 2 * i
            if i < limit1:
                m, m_ls = mask_s, mask_s_ls
            else:
                m, m_ls = mask_l, mask_l_ls
            h = ((h << 2) + gear_ls_l[buf[a]]) & _U64
            if (h & m_ls) == 0:
                cut_h, cut_n = h, 2 * i
                break
            h = (h + gear_l[buf[a + 1]]) & _U64
            if (h & m) == 0:
                cut_h, cut_n = h, 2 * i + 1
                break
            i += 1
        if cut_n is None:
            if ramp_end == limit2:
                cut_h, cut_n = h, rem  # whole scan was scalar; max fallback
            else:
                sigma = pos & 1
                qoff = pos >> 1
                W, hits_s, hits_l = pre[sigma]
                qa = qoff + ramp_end
                q1 = qoff + limit1
                q2 = qoff + limit2
                if qa < q1:
                    j = bisect_left(hits_s.idx, qa)
                    if j < len(hits_s.idx) and hits_s.idx[j] < q1:
                        q = hits_s.idx[j]
                        i = q - qoff
                        cut_n = 2 * i if hits_s.even[j] else 2 * i + 1
                        cut_h = hits_s.hval[j]
                if cut_n is None:
                    qb = qa if qa > q1 else q1
                    j = bisect_left(hits_l.idx, qb)
                    if j < len(hits_l.idx) and hits_l.idx[j] < q2:
                        q = hits_l.idx[j]
                        i = q - qoff
                        cut_n = 2 * i if hits_l.even[j] else 2 * i + 1
                        cut_h = hits_l.hval[j]
                if cut_n is None:
                    cut_h, cut_n = int(W[q2 - 1]), rem
        hashes.append(cut_h)
        lengths.append(cut_n)
        pos += cut_n
    return hashes, lengths


# --------------------------------------------------------------------------
# v2016
# --------------------------------------------------------------------------


def _precompute_v2016(buf: np.ndarray, cfg: ChunkerConfig, gear):
    u = np.uint64
    n = len(buf)
    V = _buf("V16", n, np.uint64)
    V[:] = gear[buf]  # np.take(out=) is ~50x slower
    SH = _buf("SH16", n, np.uint64)
    for s in (1, 2, 4, 8, 16, 32):
        m = n - s
        if m <= 0:
            break
        np.left_shift(V[:m], u(s), out=SH[:m])
        np.add(V[s:], SH[:m], out=V[s:])
    common = u(cfg.mask_s & cfg.mask_l)
    band = _buf("band16", n, np.uint64)
    hitb = _buf("hitb16", n, np.bool_)
    np.bitwise_and(V, common, out=band)
    np.equal(band, u(0), out=hitb)
    cand = np.flatnonzero(hitb)
    Vc = V[cand]
    tiers = []
    for mask in (cfg.mask_s, cfg.mask_l):
        g = cand[(Vc & u(mask)) == 0]
        tiers.append((g.tolist(), V[g].tolist()))
    return V, tiers


def _walk_v2016(buf: np.ndarray, lo: int, hi: int, cfg: ChunkerConfig, pre, gear_l):
    min_size, avg_size, max_size = cfg.min_size, cfg.avg_size, cfg.max_size
    mask_s, mask_l = cfg.mask_s, cfg.mask_l
    V, ((sidx, sval), (lidx, lval)) = pre
    hashes, lengths = [], []
    pos = lo
    while pos < hi:
        remaining = hi - pos
        if remaining <= min_size:
            hashes.append(0)
            lengths.append(remaining)
            break
        rem = remaining if remaining <= max_size else max_size
        center = avg_size if remaining >= avg_size else remaining
        ramp_end = min(min_size + 63, rem)
        h = 0
        cut_h = cut_n = None
        i = min_size
        while i < ramp_end:
            h = ((h << 1) + gear_l[buf[pos + i]]) & _U64
            if (h & (mask_s if i < center else mask_l)) == 0:
                cut_h, cut_n = h, i
                break
            i += 1
        if cut_n is None:
            if ramp_end == rem:
                cut_h, cut_n = h, rem
            else:
                ga = pos + ramp_end
                g1 = pos + center
                g2 = pos + rem
                if ga < g1:
                    j = bisect_left(sidx, ga)
                    if j < len(sidx) and sidx[j] < g1:
                        cut_h, cut_n = sval[j], sidx[j] - pos
                if cut_n is None:
                    gb = ga if ga > g1 else g1
                    j = bisect_left(lidx, gb)
                    if j < len(lidx) and lidx[j] < g2:
                        cut_h, cut_n = lval[j], lidx[j] - pos
                if cut_n is None:
                    cut_h, cut_n = int(V[g2 - 1]), rem
        hashes.append(cut_h)
        lengths.append(cut_n)
        pos += cut_n
    return hashes, lengths


# --------------------------------------------------------------------------
# public batch API
# --------------------------------------------------------------------------


def chunk_rows(
    buf: np.ndarray, row_offsets: np.ndarray, cfg: ChunkerConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Chunk every row of a concatenated buffer.

    ``buf`` is a uint8 array holding all rows back to back (e.g. a pyarrow
    string column's values buffer, zero-copy); ``row_offsets`` (len R+1,
    monotonically nondecreasing) delimits rows.  Returns
    ``(row_ordinal int32, hash uint64, offset int64, length int64)`` arrays,
    offsets relative to each row's start, chunks in order within each row.

    Rows are grouped into ~4 MiB slabs for the windowed precompute; rows
    never split across slabs, so results are independent of slab layout
    (mirrors the reference's buffer-size-invariance guarantee,
    src/v2020/mod.rs:1277-1329).
    """
    if buf.dtype != np.uint8:
        buf = buf.view(np.uint8)
    nrows = len(row_offsets) - 1
    if cfg.algo == "ronomon":
        rows, hs, offs, lens = [], [], [], []
        data = buf.tobytes()
        for r in range(nrows):
            lo, hi = int(row_offsets[r]), int(row_offsets[r + 1])
            for c in _scalar_chunk_bytes(data[lo:hi], cfg):
                rows.append(r)
                hs.append(c.hash)
                offs.append(c.offset)
                lens.append(c.length)
        return (
            np.asarray(rows, dtype=np.int32),
            np.asarray(hs, dtype=np.uint64),
            np.asarray(offs, dtype=np.int64),
            np.asarray(lens, dtype=np.int64),
        )

    gear_np, gear_ls_np = cfg.gear_tables()
    gear_l = gear_np.tolist()
    gear_ls_l = gear_ls_np.tolist()
    rows_out: list = []
    hs_out: list = []
    offs_out: list = []
    lens_out: list = []
    r = 0
    while r < nrows:
        # grow a slab of whole rows up to ~_SLAB_BYTES
        slab_lo = int(row_offsets[r])
        r_end = r
        while r_end < nrows and int(row_offsets[r_end + 1]) - slab_lo < _SLAB_BYTES:
            r_end += 1
        if r_end == r:
            r_end = r + 1  # single oversized row gets its own slab
        slab_hi = int(row_offsets[r_end])
        slab = np.ascontiguousarray(buf[slab_lo:slab_hi])
        if cfg.algo == "v2020":
            pre = _precompute_v2020(slab, cfg, gear_np, gear_ls_np)
        else:
            pre = _precompute_v2016(slab, cfg, gear_np)
        sbytes = slab.tobytes()  # fast scalar indexing for the ramp
        for ri in range(r, r_end):
            lo = int(row_offsets[ri]) - slab_lo
            hi = int(row_offsets[ri + 1]) - slab_lo
            if cfg.algo == "v2020":
                hs, lens = _walk_v2020(sbytes, lo, hi, cfg, pre, gear_l, gear_ls_l)
            else:
                hs, lens = _walk_v2016(sbytes, lo, hi, cfg, pre, gear_l)
            k = len(hs)
            rows_out.extend([ri] * k)
            hs_out.extend(hs)
            if k:
                offs = np.empty(k, dtype=np.int64)
                offs[0] = 0
                np.cumsum(lens[:-1], out=offs[1:])
                offs_out.append(offs)
            lens_out.extend(lens)
        r = r_end
    return (
        np.asarray(rows_out, dtype=np.int32),
        np.asarray(hs_out, dtype=np.uint64),
        np.concatenate(offs_out) if offs_out else np.empty(0, dtype=np.int64),
        np.asarray(lens_out, dtype=np.int64),
    )


def chunk_bytes_fast(data, cfg: ChunkerConfig):
    """Single-buffer convenience wrapper; returns list[(hash, offset, length)]."""
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    offsets = np.array([0, len(buf)], dtype=np.int64)
    _, hs, offs, lens = chunk_rows(buf, offsets, cfg)
    return list(zip(hs.tolist(), offs.tolist(), lens.tolist()))
