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
from .sample import SAMPLE_MULT

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


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries) + exact second pass
# --------------------------------------------------------------------------

MG_CAPACITY = 2048


def mg_compress(keys: np.ndarray, counts: np.ndarray, m: int):
    """Compress an exact (key, count) frequency table to at most ``m``
    entries with the Misra-Gries decrement rule: subtract the (m+1)-th
    largest count from every entry and drop the non-positive remainder
    (Agarwal et al., "Mergeable Summaries" — the merge of two summaries is
    concat + group-sum + this compress).  Every surviving count
    underestimates the true count by at most the cumulative subtracted
    amount, which over any merge tree is <= n_total / (m + 1)."""
    if len(keys) <= m:
        return keys, counts
    kth = np.partition(counts, len(counts) - m - 1)[len(counts) - m - 1]
    kept = counts > kth
    return keys[kept], counts[kept] - kth


def mg_merge(a_keys, a_counts, b_keys, b_counts, m: int):
    """Merge two MG summaries: group-sum shared keys, then compress."""
    keys = np.concatenate([a_keys, b_keys])
    counts = np.concatenate([a_counts, b_counts])
    uk, inv = np.unique(keys, return_inverse=True)
    summed = np.bincount(inv, weights=counts).astype(np.int64)
    return mg_compress(uk, summed, m)


def heavy_hitters_exact(ds, key: str = "user_id", k: int = 5,
                        m: int = MG_CAPACITY):
    """Exact top-k frequent keys with BOUNDED memory everywhere: pass 1
    builds an m-entry Misra-Gries summary (per-block np.unique partials,
    m-capped; driver merge is m-bounded regardless of key universe — the
    scale story vs ``top_users``' full per-block count tables); pass 2
    recounts only the m candidates exactly (broadcast membership filter +
    partial counts) and takes the true top-k.

    Correctness condition (asserted by the sketch guarantee): every key
    with true count > n/(m+1) survives pass 1, so the exact top-k is in
    the candidate set whenever the k-th most frequent key clears that
    bar — the heavy-hitter regime the operator is for.  Output:
    (user_id, n_events), count-desc / key-asc deterministic order.
    """
    import ray

    def partial(t: pa.Table) -> pa.Table:
        kv = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(kv, return_counts=True)
        uk, cnt = mg_compress(uk, cnt.astype(np.int64), m)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "c": pa.array(cnt, pa.int64())})

    # driver-side merge of m-bounded summaries (sequential fold is the
    # same associative merge a tree reduce would run)
    mk = np.empty(0, np.int64)
    mc = np.empty(0, np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if len(t) == 0:
            continue
        mk, mc = mg_merge(mk, mc, t["k"].to_numpy(), t["c"].to_numpy(), m)

    cand = np.sort(mk)
    cand_ref = ray.put(cand)

    def recount(t: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        kv = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        kv = kv[np.isin(kv, c)]
        uk, cnt = np.unique(kv, return_counts=True)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    totals = {}
    for b in ds.map_batches(recount, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for kk, cc in zip(t["k"].to_numpy(), t["c"].to_numpy()):
            totals[int(kk)] = totals.get(int(kk), 0) + int(cc)
    order = sorted(totals.items(), key=lambda kv_: (-kv_[1], kv_[0]))[:k]
    return pa.table({
        "user_id": pa.array([o[0] for o in order], pa.int64()),
        "n_events": pa.array([o[1] for o in order], pa.int64()),
    })


HEAVY_USERS_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id ASC
LIMIT 5
"""


# --------------------------------------------------------------------------
# quantile sketch: deterministic hash-sample + exact small quantile
# --------------------------------------------------------------------------

SKETCH_RATE_PM = 100  # per-mille sample rate (10%)
SKETCH_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def value_quantiles_sketch(events_ds, rate_pm: int = SKETCH_RATE_PM,
                           qs: tuple[float, ...] = SKETCH_QS) -> pa.Table:
    """Mergeable approximate quantiles for an UNBOUNDED value domain —
    completes the sketch tier (HLL = distinct, Misra-Gries = heavy
    hitters, this = quantiles).

    The sketch is a deterministic multiplicative-hash row sample
    (``mix(event_id) per-mille < rate``): mergeable by construction
    (a union of per-block samples IS the global sample), retry-stable
    (re-executed blocks pick the same rows — no RNG), and SQL-expressible,
    so unlike classic KLL the oracle can check it EXACTLY; accuracy is the
    standard sample-quantile bound (~1/sqrt(rate * N)).  Quantile over the
    sample reuses the nearest-rank formulation of
    stages/sessions.py:value_percentiles.
    """

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"value_c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        eid = t["event_id"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
        keep = (eid * np.uint64(SAMPLE_MULT)) % np.uint64(1000) \
            < np.uint64(rate_pm)
        val = t["value"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep]
        vc = np.round(val * 100).astype(np.int64)
        u, c = np.unique(vc, return_counts=True)
        return pa.table({"value_c": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    import math

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    if not tabs:  # zero-batch input: concat_tables(()) raises
        tabs = [pa.table({"value_c": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})]
    t = pa.concat_tables(tabs)
    v = t["value_c"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    v, n = v[order], n[order]
    starts = np.concatenate([[0], np.flatnonzero(v[1:] != v[:-1]) + 1]) \
        if len(v) else np.array([], np.int64)
    vals = v[starts] if len(v) else v
    cum = np.cumsum(np.add.reduceat(n, starts)) if len(v) else n
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if total == 0:
            continue
        rank = max(1, math.ceil(q * total))
        ix = int(np.searchsorted(cum, rank))
        out_q.append(q)
        out_v.append(int(vals[ix]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value_c": pa.array(out_v, pa.int64())})


_SKETCH_QS_VALUES = ", ".join(f"({q})" for q in SKETCH_QS)

VALUE_QUANTILES_SKETCH_SQL = f"""
WITH qs(q) AS (VALUES {_SKETCH_QS_VALUES}),
s0 AS (
  SELECT value FROM events
  WHERE (CAST(event_id AS HUGEINT) * {SAMPLE_MULT})
        % 18446744073709551616 % 1000 < {SKETCH_RATE_PM}
),
s AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY CAST(ROUND(value * 100) AS BIGINT)) AS rn,
         COUNT(*) OVER () AS n
  FROM s0
)
SELECT q, CAST(MIN(v) AS BIGINT) AS value_c
FROM s JOIN qs ON s.rn >= CEIL(qs.q * s.n)
GROUP BY q
"""


def ndv_grouped_sketch(ds, group: str = "event_type", key: str = "user_id",
                       p: int = HLL_P):
    """Grouped approximate COUNT DISTINCT: one HLL register bank PER GROUP
    — the mergeable-sketch-per-group pattern (per-domain / per-language
    distinct-doc counts at crawl scale, where per-block distinct sets are
    too big for the exact two-level path of distinct_users_per_type).

    Every block emits (group, 2^p-byte register bank) — |groups| rows per
    block regardless of row count — and the driver's elementwise-max merge
    is exact, so the estimate is bit-identical under any partitioning /
    retry schedule.  Zero keyed exchange; the estimate's error is the
    standard 1.04/sqrt(2^p).

    Output: (group, ndv_estimate float64, sketch_bytes int64) sorted by
    group.
    """
    part_schema = pa.schema([("g", pa.string()), ("regs", pa.binary())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        enc = t[group].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kv = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        gs, bufs = [], []
        for c, g in enumerate(enc.dictionary.to_pylist()):
            gs.append(g)
            bufs.append(hll_registers(kv[codes == c], p).tobytes())
        return pa.table({"g": pa.array(gs, pa.string()),
                         "regs": pa.array(bufs, pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    banks: dict[str, np.ndarray] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for g, buf in zip(t["g"].to_pylist(), t["regs"].to_pylist()):
            regs = np.frombuffer(buf, dtype=np.uint8)
            banks[g] = hll_merge(banks[g], regs) if g in banks else regs
    gs = sorted(banks)
    return pa.table(
        {
            group: pa.array(gs, pa.string()),
            "ndv_estimate": pa.array(
                [hll_estimate(banks[g], p) for g in gs], pa.float64()),
            "sketch_bytes": pa.array([1 << p] * len(gs), pa.int64()),
        }
    )


CMS_D = 4      # hash rows
CMS_W = 8192   # counters per row


def cms_counts(keys: np.ndarray, d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    """Count-min table (int64[d, w]) for a block of int keys: row i uses
    mix64(key XOR seed_i) % w.  Merging blocks = elementwise ADD (exact),
    so the sketch is bit-identical under any partitioning."""
    k = keys.astype(np.uint64, copy=False)
    out = np.zeros((d, w), dtype=np.int64)
    for i in range(d):
        h = mix64(k ^ np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF))
        out[i] += np.bincount(
            (h % np.uint64(w)).astype(np.int64), minlength=w
        ).astype(np.int64)
    return out


def cms_estimate(table: np.ndarray, probes: np.ndarray,
                 w: int = CMS_W) -> np.ndarray:
    """Point-frequency estimates (min over rows) for probe keys — always
    >= the true count, over by at most ~2n/w w.h.p."""
    d = table.shape[0]
    p = probes.astype(np.uint64, copy=False)
    est = np.full(len(p), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(d):
        h = mix64(p ^ np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF))
        est = np.minimum(est, table[i, (h % np.uint64(w)).astype(np.int64)])
    return est


def freq_cms(ds, key: str, probes: np.ndarray,
             d: int = CMS_D, w: int = CMS_W) -> pa.Table:
    """Count-min point-frequency estimation: the bounded-memory answer to
    "how often does THIS key occur" over a stream too wide for exact
    per-key counts (Misra-Gries finds the heavy keys; CMS answers
    arbitrary point queries).  Every block emits one d*w int64 table —
    fixed size regardless of rows — and the driver's elementwise ADD
    merge is exact, so estimates are bit-identical under any
    partitioning / retry schedule.  Zero keyed exchange.

    Output: (key, est_count) for each probe, est >= true always.
    """
    def partial(t: pa.Table) -> pa.Table:
        kv = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {"cms": pa.array([cms_counts(kv, d, w).tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = np.zeros((d, w), dtype=np.int64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for buf in t["cms"].to_pylist():
            merged += np.frombuffer(buf, dtype=np.int64).reshape(d, w)
    probes = np.asarray(probes, dtype=np.int64)
    return pa.table(
        {
            key: pa.array(probes, pa.int64()),
            "est_count": pa.array(cms_estimate(merged, probes, w), pa.int64()),
        }
    )
