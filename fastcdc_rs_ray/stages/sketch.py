"""HyperLogLog distinct-count sketch — the mergeable-partial aggregate
shape for COUNT DISTINCT when the distinct universe itself is too large to
shuffle (the two-level exact plan in ``sessions.distinct_users_per_type``
moves the distinct-pair universe; at 100 TB with billions of keys even
that exchange is heavy — an HLL register bank is a fixed 2^p bytes per
block regardless of cardinality).

Classic Flajolet et al. HLL with the standard bias correction and
small-range (linear counting) fallback; register index = top p bits of a
mixed 64-bit key hash, rank = leading-zero count of the rest.  Merge is an
elementwise ``max`` — associative and commutative, so any block split /
combine order yields the identical register bank (tested).

Estimate quality: standard error ~= 1.04 / sqrt(2^p); p=12 (4 KiB) gives
~1.6%.  The driver gate records this query rows-only (an estimate can't
hash-match SQL); the pytest asserts the estimate lands within 5% of the
exact count and that the register bank is split-invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import mix64

HLL_P = 12  # 4096 registers
_M = 1 << HLL_P


def hll_registers(keys: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Register bank (uint8[2^p]) for a block of int/uint keys."""
    m = 1 << p
    h = mix64(keys.astype(np.uint64, copy=False))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # guard: rank <= 64-p
    # rank = leading zeros of `rest` + 1, vectorized via float64 exponent
    # trick being unsafe for exact zeros — use bit_length instead:
    # leading_zeros(x) = 64 - bit_length(x); bit_length via log2 is
    # float-unsafe at 2^53, so shift-count loop over the 6 bit levels.
    bl = np.zeros(len(rest), dtype=np.uint64)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += np.uint64(shift)
        x[mask] >>= np.uint64(shift)
    bl += np.uint64(1)  # bit_length of a nonzero value
    rank = (np.uint64(64) - bl + np.uint64(1)).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray, p: int = HLL_P) -> float:
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)  # linear counting
    return float(est)


def ndv_sketch(ds, key: str = "user_id", p: int = HLL_P):
    """Dataset -> one-row table (ndv_estimate float64): per-block register
    banks, merged driver-side (2^p bytes x blocks moves, never keys)."""

    def partial(t: pa.Table) -> pa.Table:
        kv = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        regs = hll_registers(kv, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in partials.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for buf in t["regs"].to_pylist():
            merged = hll_merge(merged, np.frombuffer(buf, dtype=np.uint8))
    return pa.table({"ndv_estimate": pa.array([hll_estimate(merged, p)], pa.float64())})
