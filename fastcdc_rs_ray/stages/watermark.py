"""Event-time watermark semantics in batch: which events would a streaming
engine have dropped as late, and per-window on-time/late counts.

SURVEY.md §2.9: the reference's "streaming" is incremental IO — no event
time, no watermarks.  This op adds the real thing, deterministically
replayable from the batch log: arrival order is the event_id sequence, the
watermark after arrival i is ``max(ts of events with event_id <= i) -
allowed_lateness``, and an event is late iff its own ts is below that
watermark (its own arrival advances the watermark first, so an event can
never out-late itself).

Distributed shape — NO global sort and NO sequential scan:
- pass 1: each block reduces to its id-ordered strict prefix-max chain of
  (event_id, ts) — the only records that can ever advance the global
  running max.  For randomly-ordered ts that chain is O(log block) rows
  (expected); the worst case (ts already monotone in id) degrades to the
  block itself, documented skew assumption.
- driver merges the chains into one global step function (sort + prefix
  max over ~log-sized input) and broadcasts it via ``ray.put``.
- pass 2: every block classifies its events with two vectorized
  ``searchsorted`` lookups and bincounts per tumbling window.

The same two-pass candidate-chain trick implements any distributed
prefix-extremum (running max/min over a global order) without a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

WINDOW_US = 3_600_000_000        # 1 h tumbling windows
LATENESS_US = 600_000_000        # 10 min allowed lateness

_CAND = pa.schema([("event_id", pa.int64()), ("ts_us", pa.int64())])


def _ids_ts(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
    ts = (t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
          .astype("datetime64[us]").view(np.int64))
    return ids, ts


def watermark_windows(events_ds, window_us: int = WINDOW_US,
                      lateness_us: int = LATENESS_US) -> pa.Table:
    """-> (win, n_on_time, n_late): per tumbling event-time window, events
    a watermark-driven streaming run would have kept vs dropped."""
    import ray

    events_ds = events_ds.materialize()

    def chain(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _CAND.empty_table()
        ids, ts = _ids_ts(t)
        order = np.argsort(ids, kind="stable")
        ids, ts = ids[order], ts[order]
        run = np.maximum.accumulate(ts)
        keep = np.r_[True, run[1:] > run[:-1]]    # strict prefix maxima
        return pa.table({
            "event_id": pa.array(ids[keep], pa.int64()),
            "ts_us": pa.array(ts[keep], pa.int64()),
        }).cast(_CAND)

    cand = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in events_ds.map_batches(chain, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]
        + [_CAND.empty_table()]
    )
    cid = cand["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
    cts = cand["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(cid, kind="stable")
    cid, cts = cid[order], np.maximum.accumulate(cts[order])
    sref = ray.put({"ids": cid, "maxes": cts})

    out_schema = pa.schema([
        ("win", pa.int64()), ("n_on_time", pa.int64()),
        ("n_late", pa.int64()),
    ])

    def classify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        step = ray.get(sref)
        ids, ts = _ids_ts(t)
        pos = np.searchsorted(step["ids"], ids, side="right") - 1
        wm = step["maxes"][pos] - lateness_us   # pos >= 0: own id is <= max
        late = ts < wm
        win = ts // window_us
        uw, inv = np.unique(win, return_inverse=True)
        n_late = np.bincount(inv, weights=late, minlength=len(uw)).astype(
            np.int64)
        n_all = np.bincount(inv, minlength=len(uw)).astype(np.int64)
        return pa.table({
            "win": pa.array(uw, pa.int64()),
            "n_on_time": pa.array(n_all - n_late, pa.int64()),
            "n_late": pa.array(n_late, pa.int64()),
        }).cast(out_schema)

    parts = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in events_ds.map_batches(classify, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]
        + [out_schema.empty_table()]
    )
    win = parts["win"].combine_chunks().to_numpy(zero_copy_only=False)
    uw, inv = np.unique(win, return_inverse=True)
    on = np.zeros(len(uw), np.int64)
    la = np.zeros(len(uw), np.int64)
    np.add.at(on, inv, parts["n_on_time"].to_numpy(zero_copy_only=False))
    np.add.at(la, inv, parts["n_late"].to_numpy(zero_copy_only=False))
    return pa.table({
        "win": pa.array(uw, pa.int64()),
        "n_on_time": pa.array(on, pa.int64()),
        "n_late": pa.array(la, pa.int64()),
    })


WATERMARK_WINDOWS_SQL = f"""
WITH w AS (
  SELECT ts,
         epoch_us(ts) < max(epoch_us(ts)) OVER (ORDER BY event_id)
           - {LATENESS_US} AS late
  FROM events
)
SELECT CAST(epoch_us(ts) // {WINDOW_US} AS BIGINT) AS win,
       CAST(count(*) FILTER (NOT late) AS BIGINT) AS n_on_time,
       CAST(count(*) FILTER (late) AS BIGINT) AS n_late
FROM w
GROUP BY 1
"""
