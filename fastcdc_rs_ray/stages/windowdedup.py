"""Time-windowed dedup — refetch/replay suppression within a trailing
window.

Crawl-dedup semantics the exact tier doesn't cover: a record is a
WINDOW-DUPLICATE if the same key occurred within the previous W time
units; the same key re-seen after the window is fresh again (the policy
a crawler uses to keep re-fetches while dropping immediate replays, and
a telemetry pipeline uses to suppress retry storms).  The reference has
no temporal operators at all (its sources are byte buffers,
src/v2020/mod.rs:516) — this is part of the training-data engine tier.

Plan (the sessionize discipline, stages/sessions.py): ONE keyed
repartition on user_id co-locates each user's history, then a
vectorized per-block lexsort over (user, key, ts, event_id) makes the
previous-same-key timestamp a shifted-array comparison — no per-row
Python, no window library.  Tie order (ts, event_id) is mirrored in the
SQL oracle's LAG ordering so duplicates are bit-deterministic.

Output: (event_type, n_events, n_window_dups) — dimension-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: trailing window: same (user, event_type) within 10 min = duplicate
WINDOW_DUP_US = 600 * 1_000_000

_OUT = pa.schema([
    ("event_type", pa.string()),
    ("n_events", pa.int64()),
    ("n_window_dups", pa.int64()),
])


def windowed_dedup_rollup(events_ds, window_us: int = WINDOW_DUP_US,
                          num_partitions: int = 8) -> pa.Table:
    ds = events_ds.select_columns(
        ["event_id", "user_id", "event_type", "ts"]
    ).repartition(num_blocks=num_partitions, keys=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _OUT.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = t["event_type"].combine_chunks().dictionary_encode()
        code = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, code, uid))
        u_s, c_s, t_s = uid[order], code[order], ts[order]
        same = np.zeros(len(u_s), bool)
        if len(u_s) > 1:
            same[1:] = (u_s[1:] == u_s[:-1]) & (c_s[1:] == c_s[:-1]) & \
                (t_s[1:] - t_s[:-1] <= window_us)
        k = len(et.dictionary)
        n = np.bincount(c_s, minlength=k).astype(np.int64)
        d = np.zeros(k, np.int64)
        np.add.at(d, c_s, same.astype(np.int64))
        dic = et.dictionary
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        return pa.table({
            "event_type": dic,
            "n_events": pa.array(n, pa.int64()),
            "n_window_dups": pa.array(d, pa.int64()),
        }).cast(_OUT)

    acc: dict[str, list[int]] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None).iter_batches(
            batch_format="pyarrow"):
        for et, n, d in zip(b["event_type"].to_pylist(),
                            b["n_events"].to_pylist(),
                            b["n_window_dups"].to_pylist()):
            a = acc.setdefault(et, [0, 0])
            a[0] += n
            a[1] += d
    ks = sorted(acc)
    return pa.table({
        "event_type": pa.array(ks, pa.string()),
        "n_events": pa.array([acc[k][0] for k in ks], pa.int64()),
        "n_window_dups": pa.array([acc[k][1] for k in ks], pa.int64()),
    })


WINDOWED_DEDUP_SQL = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN prev_us IS NOT NULL
                      AND epoch_us(ts) - prev_us <= {WINDOW_DUP_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_window_dups
FROM (
  SELECT event_type, ts,
         LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts, event_id) AS prev_us
  FROM events
)
GROUP BY event_type
"""
