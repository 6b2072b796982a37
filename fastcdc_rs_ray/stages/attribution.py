"""Last-touch attribution — the temporal stream-stream join.

For every conversion event ('purchase'), find the SAME user's most
recent touch event ('click') that happened at-or-before it and within a
trailing window W — the production attribution join (and the streaming
interval-join shape: each right row matches at most one left row chosen
by recency).  Distinct from event_session_asof (which joins two
different tables by as-of key): here both sides live in ONE stream and
the predicate is type-conditional recency with a window bound.

Plan: ONE keyed exchange on user_id co-locates each user's history; a
vectorized per-block lexsort over (user, ts, event_id) + cummax-style
forward-fill of the latest click index answers every purchase in one
pass (no per-row Python).  Tie order (ts, event_id) and the at-or-
before rule are mirrored in the SQL oracle's IGNORE NULLS window.

Output: (n_purchases, n_attributed, attributed_value_c) — attributed
value in exact cents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: attribution window: touch within 30 min before the conversion
ATTR_WINDOW_US = 1_800 * 1_000_000

TOUCH = "click"
CONVERSION = "purchase"


def last_touch_attribution(events_ds, window_us: int = ATTR_WINDOW_US,
                           num_partitions: int = 8) -> pa.Table:
    ds = events_ds.select_columns(
        ["event_id", "user_id", "event_type", "ts", "value"]
    ).repartition(num_blocks=num_partitions, keys=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n_purchases": pa.array([0], pa.int64()),
                             "n_attributed": pa.array([0], pa.int64()),
                             "attributed_value_c": pa.array([0],
                                                            pa.int64())})
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = t["event_type"].combine_chunks().to_numpy(
            zero_copy_only=False)
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, et, val = uid[order], ts[order], et[order], val[order]
        is_touch = et == TOUCH
        is_conv = et == CONVERSION
        # forward-fill the latest touch position within each user run:
        # np.maximum.accumulate over (touch ? index : -1), reset at user
        # boundaries by segmenting on user change
        n = len(uid)
        idx = np.where(is_touch, np.arange(n, dtype=np.int64),
                       np.int64(-1))
        # segment-aware cummax: subtract a big offset per user segment so
        # fills never cross users — equivalently, run cummax on
        # (segment_base + idx) and invalidate fills from other segments
        seg = np.concatenate([[0], np.cumsum(uid[1:] != uid[:-1])])
        key = seg * np.int64(n + 1)
        filled = np.maximum.accumulate(np.where(idx >= 0, key + idx,
                                                np.int64(-1)))
        have = (filled >= 0) & ((filled // np.int64(n + 1)) == seg)
        touch_pos = np.where(have, filled % np.int64(n + 1), -1)
        conv = np.flatnonzero(is_conv)
        tp = touch_pos[conv]
        ok = (tp >= 0) & (ts[conv] - np.where(tp >= 0, ts[tp], 0)
                          <= window_us)
        # floor(x*100 + 0.5) = SQL ROUND's half-AWAY-FROM-ZERO for the
        # non-negative values here; np.round is half-to-even and would
        # silently drift one cent from the oracle on inputs finer than
        # 2 decimals (ADVICE r3)
        v_c = np.floor(val[conv[ok]] * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "n_purchases": pa.array([len(conv)], pa.int64()),
            "n_attributed": pa.array([int(ok.sum())], pa.int64()),
            "attributed_value_c": pa.array([int(v_c.sum())], pa.int64()),
        })

    np_ = na = av = 0
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None).iter_batches(
            batch_format="pyarrow"):
        np_ += sum(b["n_purchases"].to_pylist())
        na += sum(b["n_attributed"].to_pylist())
        av += sum(b["attributed_value_c"].to_pylist())
    return pa.table({
        "n_purchases": pa.array([np_], pa.int64()),
        "n_attributed": pa.array([na], pa.int64()),
        "attributed_value_c": pa.array([av], pa.int64()),
    })


LAST_TOUCH_SQL = f"""
WITH ordered AS (
  SELECT event_type, value, epoch_us(ts) AS us,
         last_value(CASE WHEN event_type = '{TOUCH}'
                         THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_touch_us
  FROM events
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN last_touch_us IS NOT NULL
                      AND us - last_touch_us <= {ATTR_WINDOW_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       CAST(COALESCE(SUM(CASE WHEN last_touch_us IS NOT NULL
                      AND us - last_touch_us <= {ATTR_WINDOW_US}
                     THEN CAST(ROUND(value * 100) AS BIGINT) END), 0)
            AS BIGINT) AS attributed_value_c
FROM ordered WHERE event_type = '{CONVERSION}'
"""
