"""Interval coalescing: union length of overlapping intervals per key.

The continuous-time sibling of login_streaks' day-grain islands: each
event opens a fixed window [ts, ts + WINDOW_US), a user's overlapping
windows merge, and the operator reports the total COVERED time and the
island count — the "active seconds" metric session length sums
over-count whenever windows overlap.

Shape: ONE keyed exchange on user_id of (user, ts) int64 rows (the
window end is arithmetic, so only the start travels); per partition a
single lexsort + running-max sweep coalesces every user's islands
vectorized (no per-row Python).  Exact integer microseconds end to end;
the SQL oracle is the classic cummax-window islands formulation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WINDOW_US = 300_000_000  # 300 s

_OUT = pa.schema([
    ("user_id", pa.int64()), ("covered_us", pa.int64()),
    ("n_islands", pa.int64()),
])


def interval_coverage(events_ds, window_us: int = WINDOW_US,
                      num_partitions: int = 8):
    from ..util import shuffle_safe_partitions

    num_partitions = shuffle_safe_partitions(num_partitions)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts_us": pc.cast(t["ts"], pa.int64()),
        })

    ex = events_ds.select_columns(["user_id", "ts"]).map_batches(
        project, batch_format="pyarrow"
    ).repartition(num_blocks=num_partitions, keys=["user_id"])

    def sweep(t: pa.Table, _w=window_us) -> pa.Table:
        if len(t) == 0:
            return _OUT.empty_table()
        u = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((s, u))
        u, s = u[order], s[order]
        base = s.min()  # rebase so the segmented-cummax offsets (seg *
        s = s - base    # big) cannot overflow int64: spans are corpus
        e = s + _w      # time ranges (~1e12 us), not absolute epochs
        # running max of interval end within each user run
        cme = np.maximum.accumulate(e)
        newu = np.concatenate([[True], u[1:] != u[:-1]])
        # reset the cummax at user boundaries: subtract-and-redo per
        # segment via the standard segmented-cummax trick
        seg = np.cumsum(newu) - 1
        # segmented cummax: e shifted by a per-segment offset so a plain
        # cummax never leaks across user segments
        big = (e.max() + 1) if len(e) else 0
        off = seg * big
        cme = np.maximum.accumulate(e + off) - off
        brk = np.concatenate([[True], (s[1:] > cme[:-1]) | newu[1:]])
        isl = np.cumsum(brk) - 1
        # island end = max e within island; island start = first s
        n_isl = isl[-1] + 1
        isl_end = np.zeros(n_isl, np.int64)
        np.maximum.at(isl_end, isl, e)
        isl_start = s[np.flatnonzero(brk)]
        isl_user = u[np.flatnonzero(brk)]
        cov = isl_end - isl_start
        uu, inv = np.unique(isl_user, return_inverse=True)
        covered = np.zeros(len(uu), np.int64)
        np.add.at(covered, inv, cov)
        n_i = np.bincount(inv).astype(np.int64)
        return pa.table({
            "user_id": pa.array(uu, pa.int64()),
            "covered_us": pa.array(covered, pa.int64()),
            "n_islands": pa.array(n_i, pa.int64()),
        }).cast(_OUT)

    return ex.map_batches(sweep, batch_format="pyarrow", batch_size=None)


def interval_coverage_sql(window_us: int = WINDOW_US) -> str:
    return f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {window_us} AS e
  FROM events
), o AS (
  SELECT user_id, s, e,
         CASE WHEN s <= MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS brk
  FROM iv
), g AS (
  SELECT user_id, s, e,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e) AS grp
  FROM o
), isl AS (
  SELECT user_id, grp, MIN(s) AS st, MAX(e) AS en
  FROM g GROUP BY user_id, grp
)
SELECT user_id, CAST(SUM(en - st) AS BIGINT) AS covered_us,
       CAST(COUNT(*) AS BIGINT) AS n_islands
FROM isl GROUP BY user_id
"""
