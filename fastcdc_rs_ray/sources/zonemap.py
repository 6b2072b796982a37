"""Zone-map scan pruning: skip parquet shards by footer statistics.

"Prune at the read" beyond column projection: a 100 TB corpus laid out
as time-sorted shards lets a time-range query open only the shards whose
footer [min, max] overlaps the predicate — the driver reads FOOTERS
(bytes, not data), plans the file list, and Ray's distributed
read_parquet touches nothing else.  The residual filter inside
map_batches keeps the result exact at shard boundaries.

Staging (once, deterministic): events sorted by ts into N equal-row
shards — the layout a zone-mapped store maintains anyway.  pytest proves
the pruning is REAL (files opened strictly fewer than files staged) and
LOSSLESS (equal to the full-scan filter); the SQL oracle checks the
rollup against the unsharded original.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .staging import staged

N_SHARDS = 16

#: predicate: the middle third of the event-time span
WINDOW_LO_FRAC, WINDOW_HI_FRAC = (1, 3), (2, 3)


def ensure_sorted_shards(events_ds, out_dir: str, n_shards: int = N_SHARDS,
                         sidecar=None, fingerprint: str = "static"):
    """Stage events as ts-sorted equal-row parquet shards (once,
    crash-safe — staging.staged).  ``sidecar(shard_index, shard_table,
    shard_dir)`` — optional per-shard extra artifact writer (bloomskip's
    Bloom sidecars reuse this staging)."""
    def dump(tmp: str) -> None:
        # the events table is benchmark-scale here; a 100 TB deployment
        # writes shards from a range-sorted Dataset (corpus_shuffle's
        # plan) — the LAYOUT contract (sorted, footer stats) is what
        # matters
        t = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in events_ds.iter_batches(batch_format="pyarrow"))
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        t = t.take(pa.array(order, pa.int64()))
        n = len(t)
        per = (n + n_shards - 1) // n_shards
        for i in range(n_shards):
            lo = i * per
            if lo >= n:
                break
            sl = t.slice(lo, per)
            pq.write_table(sl, os.path.join(tmp, f"{i:04d}.parquet"))
            if sidecar is not None:
                sidecar(i, sl, tmp)

    staged(out_dir, dump, fingerprint)


def _col_range_us(md, col: str) -> tuple[int, int]:
    """Exact [min, max] of an int64-physical column over ALL row groups
    of one footer (min_raw/max_raw are the raw int64 epoch-us values —
    the converted .min/.max are NAIVE datetimes whose .timestamp() is
    timezone-dependent and float-truncated)."""
    idx = md.schema.to_arrow_schema().get_field_index(col)
    lo = hi = None
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx).statistics
        mn, mx = int(st.min_raw), int(st.max_raw)
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    return lo, hi


def plan_files(out_dir: str, lo_us: int, hi_us: int) -> tuple[list[str],
                                                              int]:
    """Footer-only planning: shards whose ts range overlaps [lo, hi]."""
    names = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    keep = []
    for f in names:
        path = os.path.join(out_dir, f)
        mn_us, mx_us = _col_range_us(pq.ParquetFile(path).metadata, "ts")
        if mx_us >= lo_us and mn_us <= hi_us:
            keep.append(path)
    return keep, len(names)


def window_bounds_us(out_dir: str) -> tuple[int, int]:
    """[lo, hi] = the middle third of the staged span (exact raw-int
    footer stats; shards are ts-sorted so first/last files bound it)."""
    names = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    mn, _ = _col_range_us(
        pq.ParquetFile(os.path.join(out_dir, names[0])).metadata, "ts")
    _, mx = _col_range_us(
        pq.ParquetFile(os.path.join(out_dir, names[-1])).metadata, "ts")
    span = mx - mn
    lo = mn + span * WINDOW_LO_FRAC[0] // WINDOW_LO_FRAC[1]
    hi = mn + span * WINDOW_HI_FRAC[0] // WINDOW_HI_FRAC[1]
    return lo, hi


def zonemap_scan(events_ds, out_dir: str, fingerprint: str = "static"):
    """-> (event_type, n, sum_value_c): rollup of events inside the
    middle-third time window, reading ONLY footer-overlapping shards."""
    import ray.data as rd

    ensure_sorted_shards(events_ds, out_dir, fingerprint=fingerprint)
    lo, hi = window_bounds_us(out_dir)
    files, _total = plan_files(out_dir, lo, hi)

    ds = rd.read_parquet(files, columns=["ts", "event_type", "value"])

    def rollup(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        m = (ts >= lo) & (ts <= hi)  # residual filter (shard edges)
        et = t["event_type"].combine_chunks().filter(
            pa.array(m)).dictionary_encode()
        val = np.round(t["value"].combine_chunks().to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = len(et.dictionary)
        if nt == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "sum_value_c": pa.array([], pa.int64())})
        n = np.bincount(codes, minlength=nt).astype(np.int64)
        # int64 accumulation, not float bincount weights: partial cent
        # sums past 2^53 would silently lose precision at scale
        s = np.zeros(nt, np.int64)
        np.add.at(s, codes, val)
        d = et.dictionary
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        return pa.table({"event_type": d,
                         "n": pa.array(n, pa.int64()),
                         "sum_value_c": pa.array(s, pa.int64())})

    parts = ds.map_batches(rollup, batch_format="pyarrow")
    acc: dict[str, list[int]] = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for et, n, s in zip(b["event_type"].to_pylist(),
                            b["n"].to_pylist(), b["sum_value_c"].to_pylist()):
            a = acc.setdefault(et, [0, 0])
            a[0] += n
            a[1] += s
    ks = sorted(acc)
    return pa.table({
        "event_type": pa.array(ks, pa.string()),
        "n": pa.array([acc[k][0] for k in ks], pa.int64()),
        "sum_value_c": pa.array([acc[k][1] for k in ks], pa.int64()),
    })


#: the oracle derives the SAME middle-third bounds from the events table
#: itself (footer min/max == true min/max; integer floor division on
#: both sides)
ZONEMAP_SCAN_SQL = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_c
FROM events, b
WHERE epoch_us(ts) >= b.mn + (b.mx - b.mn) * 1 // 3
  AND epoch_us(ts) <= b.mn + (b.mx - b.mn) * 2 // 3
GROUP BY event_type
"""
