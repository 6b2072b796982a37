"""Scalar (pure-Python) FastCDC cut kernels — the exact-semantics baseline.

These reproduce the reference cut routines bit-for-bit:

- ``cut_v2020``: two-bytes-per-roll gear hash with left-shifted twin table
  (``src/v2020/mod.rs:350-409``).
- ``cut_v2016``: one byte per roll, ``h = (h << 1) +w GEAR[b]``
  (``src/v2016/mod.rs:159-203``).
- ``cut_ronomon``: 31-bit variant ``h = (h >> 1) + TABLE[b]`` with the
  matched byte *included* in the chunk and the multi-block ``eof``
  sentinel protocol (``src/ronomon/mod.rs:132-175``).

All three share the invariants that make distribution trivial: the hash
state resets to zero at every chunk start and a cut decision never looks at
more than ``max_size`` bytes, so chunking a buffer is a pure deterministic
function of its bytes (``src/v2020/mod.rs:1253-1274`` coverage property).

The vectorized kernel in :mod:`.kernel_np` is property-tested against these
functions; tests of record always go through this module.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

from .config import ChunkerConfig, center_size

_U64 = (1 << 64) - 1


class Chunk(NamedTuple):
    """Mirror of the reference's ``Chunk`` struct (src/v2020/mod.rs:467-474)."""

    hash: int
    offset: int
    length: int


def cut_v2020(
    src,
    min_size: int,
    avg_size: int,
    max_size: int,
    mask_s: int,
    mask_l: int,
    mask_s_ls: int,
    mask_l_ls: int,
    gear,
    gear_ls,
) -> tuple[int, int]:
    """One cut decision over ``src`` (bytes-like); returns (hash, cutpoint).

    Exact port of semantics at src/v2020/mod.rs:350-409: phase 1 scans pairs
    to ``center/2`` with the harder masks, phase 2 to ``remaining/2`` with
    the easier masks; sub-minimum inputs short-circuit to ``(0, len)``; the
    matched byte is excluded from the chunk; with an odd remaining count the
    final byte is never hashed (``limit2 = remaining // 2``).
    """
    remaining = len(src)
    if remaining <= min_size:
        return (0, remaining)
    center = avg_size
    if remaining > max_size:
        remaining = max_size
    elif remaining < center:
        center = remaining
    limit1 = center // 2
    limit2 = remaining // 2
    index = min_size // 2
    h = 0
    while index < limit1:
        a = index * 2
        h = ((h << 2) + gear_ls[src[a]]) & _U64
        if (h & mask_s_ls) == 0:
            return (h, a)
        h = (h + gear[src[a + 1]]) & _U64
        if (h & mask_s) == 0:
            return (h, a + 1)
        index += 1
    while index < limit2:
        a = index * 2
        h = ((h << 2) + gear_ls[src[a]]) & _U64
        if (h & mask_l_ls) == 0:
            return (h, a)
        h = (h + gear[src[a + 1]]) & _U64
        if (h & mask_l) == 0:
            return (h, a + 1)
        index += 1
    return (h, remaining)


def cut_v2016(
    src,
    min_size: int,
    avg_size: int,
    max_size: int,
    mask_s: int,
    mask_l: int,
    gear,
) -> tuple[int, int]:
    """Exact port of semantics at src/v2016/mod.rs:159-203 (one byte per
    roll, matched byte excluded from the chunk)."""
    remaining = len(src)
    if remaining <= min_size:
        return (0, remaining)
    center = avg_size
    if remaining > max_size:
        remaining = max_size
    elif remaining < center:
        center = remaining
    index = min_size
    h = 0
    while index < center:
        h = ((h << 1) + gear[src[index]]) & _U64
        if (h & mask_s) == 0:
            return (h, index)
        index += 1
    while index < remaining:
        h = ((h << 1) + gear[src[index]]) & _U64
        if (h & mask_l) == 0:
            return (h, index)
        index += 1
    return (h, index)


def cut_ronomon(
    src,
    offset: int,
    size: int,
    min_size: int,
    avg_size: int,
    max_size: int,
    mask_s: int,
    mask_l: int,
    table,
    eof: bool,
) -> tuple[int, int]:
    """Exact port of semantics at src/ronomon/mod.rs:132-175.

    Returns (u32 hash, chunk size).  ``(hash, 0)`` is the "need more data"
    sentinel when ``eof`` is False and the buffer might not contain a full
    cut (the S4 multi-block protocol).  The matched byte is *included* in
    the chunk (increment before judgment), unlike v2016/v2020.
    """
    if size <= min_size:
        return (0, size) if eof else (0, 0)
    if size > max_size:
        size = max_size
    start = offset
    len1 = offset + center_size(avg_size, min_size, size)
    len2 = offset + size
    h = 0
    offset += min_size
    while offset < len1:
        b = src[offset]
        offset += 1
        h = (h >> 1) + table[b]
        if (h & mask_s) == 0:
            return (h, offset - start)
    while offset < len2:
        b = src[offset]
        offset += 1
        h = (h >> 1) + table[b]
        if (h & mask_l) == 0:
            return (h, offset - start)
    if not eof and size < max_size:
        return (h, 0)
    return (h, size)


def iter_chunks(data, cfg: ChunkerConfig) -> Iterator[Chunk]:
    """Drive the configured cut kernel across ``data``, yielding contiguous
    ``Chunk`` records exactly as the reference's ``Iterator`` impls do
    (src/v2020/mod.rs:635-663, src/v2016/mod.rs:375-403,
    src/ronomon/mod.rs:178-205)."""
    data = bytes(data)
    n = len(data)
    if cfg.algo == "ronomon":
        table = cfg.ronomon_table().tolist()
        processed = 0
        while processed < n:
            h, size = cut_ronomon(
                data,
                processed,
                n - processed,
                cfg.min_size,
                cfg.avg_size,
                cfg.max_size,
                cfg.mask_s,
                cfg.mask_l,
                table,
                eof=True,
            )
            if size == 0:
                break
            yield Chunk(h, processed, size)
            processed += size
        return

    gear_np, gear_ls_np = cfg.gear_tables()
    gear = gear_np.tolist()
    if cfg.algo == "v2020":
        gear_ls = gear_ls_np.tolist()
        processed = 0
        while processed < n:
            h, cutpoint = cut_v2020(
                memoryview(data)[processed : processed + cfg.max_size + 1],
                cfg.min_size,
                cfg.avg_size,
                cfg.max_size,
                cfg.mask_s,
                cfg.mask_l,
                cfg.mask_s_ls,
                cfg.mask_l_ls,
                gear,
                gear_ls,
            )
            if cutpoint == 0:
                break
            yield Chunk(h, processed, cutpoint)
            processed += cutpoint
    else:  # v2016
        processed = 0
        while processed < n:
            h, cutpoint = cut_v2016(
                memoryview(data)[processed : processed + cfg.max_size + 1],
                cfg.min_size,
                cfg.avg_size,
                cfg.max_size,
                cfg.mask_s,
                cfg.mask_l,
                gear,
            )
            if cutpoint == 0:
                break
            yield Chunk(h, processed, cutpoint)
            processed += cutpoint


def chunk_bytes(data, cfg: ChunkerConfig) -> list[Chunk]:
    """Whole-buffer chunking with the scalar kernel (correctness baseline)."""
    return list(iter_chunks(data, cfg))


def cut_one(data, cfg: ChunkerConfig, offset: int = 0,
            remaining: int | None = None, eof: bool = True) -> tuple[int, int]:
    """Single caller-driven cut — the reference's public ``cut()`` API
    (src/v2020/mod.rs:591-606, K6; example usage examples/v2020_cut.rs:37-69;
    ronomon ``with_eof`` sentinel src/ronomon/mod.rs:102-129, S4).

    Returns ``(hash, count)``: the next chunk is ``data[offset:offset+count]``.
    ``count == 0`` (ronomon with ``eof=False`` only) means "need more data" —
    refill and call again, exactly the reference's multi-block protocol.
    Callers manage ``offset``/``remaining`` themselves (RapidCDC/SuperCDC-style
    cut-point prediction, src/v2020/mod.rs:25-30).
    """
    data = bytes(data)
    if remaining is None:
        remaining = len(data) - offset
    if cfg.algo == "ronomon":
        return cut_ronomon(
            data, offset, remaining, cfg.min_size, cfg.avg_size, cfg.max_size,
            cfg.mask_s, cfg.mask_l, cfg.ronomon_table().tolist(), eof=eof,
        )
    window = memoryview(data)[offset : offset + remaining]
    gear_np, gear_ls_np = cfg.gear_tables()
    if cfg.algo == "v2020":
        return cut_v2020(
            window, cfg.min_size, cfg.avg_size, cfg.max_size,
            cfg.mask_s, cfg.mask_l, cfg.mask_s_ls, cfg.mask_l_ls,
            gear_np.tolist(), gear_ls_np.tolist(),
        )
    return cut_v2016(
        window, cfg.min_size, cfg.avg_size, cfg.max_size,
        cfg.mask_s, cfg.mask_l, gear_np.tolist(),
    )
