"""Shared hash/mixing utilities (vectorized uint64)."""

from __future__ import annotations

import numpy as np

_M = (1 << 64) - 1
U64 = np.uint64


def mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public-domain avalanche function): uniform
    64-bit mixing, vectorized, wrapping uint64."""
    u = U64
    z = np.asarray(x, dtype=np.uint64) + u(0x9E3779B97F4A7C15)
    z = (z ^ (z >> u(30))) * u(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> u(27))) * u(0x94D049BB133111EB)
    return z ^ (z >> u(31))


def mix64_scalar(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & _M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M
    return z ^ (z >> 31)


def string_buffers(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets int64, data uint8) views of a pyarrow
    string/binary array's buffers, normalized for a possible array offset
    (sliced arrays).  ``offsets`` indexes into ``data`` (the full values
    buffer); row k's bytes are ``data[offsets[k]:offsets[k+1]]``."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    odt = (
        np.int64
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
        else np.int32
    )
    offsets = np.frombuffer(arr.buffers()[1], dtype=odt, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    databuf = arr.buffers()[2]
    data = (
        np.frombuffer(databuf, dtype=np.uint8)
        if databuf is not None and len(databuf) > 0
        else np.empty(0, dtype=np.uint8)
    )
    return offsets, data


def hash_str_array_u64(arr) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a pyarrow string/binary array.

    Per-row position-weighted sum of mixed bytes (order-sensitive), then a
    final mix.  Used for salting and bucketing, not content identity.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    odt = (
        np.int64
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
        else np.int32
    )
    offsets = np.frombuffer(arr.buffers()[1], dtype=odt, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    databuf = arr.buffers()[2]
    data = (
        np.frombuffer(databuf, dtype=np.uint8)
        if databuf is not None and len(databuf) > 0
        else np.empty(0, dtype=np.uint8)
    )
    lens = np.diff(offsets)
    n = len(arr)
    total = int(offsets[-1] - offsets[0])
    if total == 0:
        return mix64(np.zeros(n, dtype=np.uint64))
    seg = np.repeat(offsets[:-1], lens)  # row start per byte position
    pos = np.arange(int(offsets[0]), int(offsets[-1]), dtype=np.int64) - seg
    vals = mix64(
        data[int(offsets[0]) : int(offsets[-1])].astype(np.uint64)
        + (pos.astype(np.uint64) << U64(8))
    )
    row_starts = (offsets[:-1] - offsets[0]).astype(np.int64)
    sums = np.zeros(n, dtype=np.uint64)
    nz = lens > 0
    if nz.any():
        red = np.add.reduceat(vals, row_starts[nz])
        sums[nz] = red
    return mix64(sums + lens.astype(np.uint64))


def shuffle_safe_partitions(requested: int, concurrent_shuffles: float = 2.25,
                            aggregator_cpu: float = 0.1,
                            budget_frac: float = 0.6) -> int:
    """Clamp a shuffle partition count so a multi-shuffle streaming plan
    cannot deadlock on a small cluster.

    Every hash-shuffle aggregator actor holds ``aggregator_cpu`` CPUs for
    the life of its stage (``ensure_data_context``); a plan with several
    hash shuffles live at once (e.g. the dedupe -> attach -> pair-meet
    verify pipeline: 0.25x + 1x + 1x partitions) can reserve nearly every
    CPU in aggregators, leaving none for the 1-CPU map tasks that feed
    them — a scheduling deadlock, observed at num_partitions=32 x 3
    shuffles on an 8-CPU session.  Cap so aggregators across the plan use
    at most ``budget_frac`` of the cluster.  No-op when Ray is absent or
    the budget already accommodates ``requested``.
    """
    try:
        import ray

        cpus = float(ray.cluster_resources().get("CPU", 0.0))
    except Exception:
        return requested
    if cpus <= 0:
        return requested
    cap = int(cpus * budget_frac / (aggregator_cpu * concurrent_shuffles))
    return max(4, min(requested, cap))
