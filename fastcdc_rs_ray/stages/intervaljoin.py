"""Interval (band) self-join: pairs of events from different users within
``delta`` of each other — the time-proximity join class (distinct from
as-of = nearest-one-side and from static range joins).

Shape: bucket the timeline at ``delta`` granularity; every event is
replicated to buckets ``b`` and ``b+1`` (any pair within ``delta`` has
bucket distance <= 1, so both members co-locate in at least one bucket);
ONE keyed exchange on bucket; per block a sorted two-pointer window
(vectorized searchsorted + repeat/cumsum expansion, no Python pair loop)
emits candidates.  Dedup rule: a pair is attributed to the bucket of its
LATER event (``floor(max(ts)/delta) == block bucket``) — each pair then
appears exactly once globally under any partitioning.

Replication factor is exactly 2 regardless of data; the exchange carries
(bucket, event_id, user_id, ts) int64 rows only.  Dense-window skew (many
events in one delta) makes that block's pair expansion quadratic — the
same inherent blowup as the SQL band join; cap or pre-aggregate upstream
if a timeline hotspot is expected.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_OUT = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def concurrent_events(events_ds, delta_us: int = 60_000_000,
                      num_partitions: int = 8):
    """-> (src, dst) event_id pairs (src < dst), different users,
    |ts difference| <= delta_us."""
    mid = pa.schema([
        ("bucket", pa.int64()), ("event_id", pa.int64()),
        ("user_id", pa.int64()), ("ts_us", pa.int64()),
    ])

    def replicate(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return mid.empty_table()
        ids = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = (t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        b = ts // delta_us
        return pa.table({
            "bucket": pa.array(np.concatenate([b, b + 1]), pa.int64()),
            "event_id": pa.array(np.tile(ids, 2), pa.int64()),
            "user_id": pa.array(np.tile(uid, 2), pa.int64()),
            "ts_us": pa.array(np.tile(ts, 2), pa.int64()),
        }).cast(mid)

    ex = events_ds.map_batches(replicate, batch_format="pyarrow").repartition(
        num_blocks=num_partitions, keys=["bucket"])

    def pairs(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _OUT.empty_table()
        bkt = t["bucket"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        # a hash-partitioned block holds many buckets.  Encode one sort key
        # whose bucket regions never overlap: offset = ts - bkt*delta is in
        # [-delta, delta) (replicas from the bucket below are negative), so
        # key = bkt*4delta + offset + delta lies in [bkt*4delta,
        # bkt*4delta + 2delta) and a +delta window query stays inside the
        # region — one global searchsorted covers every bucket, no loop.
        order = np.lexsort((ts, bkt))
        bkt, ids, uid, ts = bkt[order], ids[order], uid[order], ts[order]
        span = 4 * delta_us
        key = bkt * span + (ts - bkt * delta_us + delta_us)
        hi = np.searchsorted(key, key + delta_us, side="right")
        lo = np.arange(1, len(key) + 1)
        cnt = np.maximum(hi - lo, 0)
        total = int(cnt.sum())
        if total == 0:
            return _OUT.empty_table()
        i = np.repeat(np.arange(len(key)), cnt)
        shift = np.repeat(np.r_[0, np.cumsum(cnt)[:-1]], cnt)
        j = (np.arange(total) - shift) + i + 1
        keep = (uid[i] != uid[j]) & (
            np.maximum(ts[i], ts[j]) // delta_us == bkt[i])
        i, j = i[keep], j[keep]
        if len(i) == 0:
            return _OUT.empty_table()
        a, b = ids[i], ids[j]
        return pa.table({
            "src": pa.array(np.minimum(a, b), pa.int64()),
            "dst": pa.array(np.maximum(a, b), pa.int64()),
        }).cast(_OUT)

    return ex.map_batches(pairs, batch_format="pyarrow", batch_size=None)


CONCURRENT_EVENTS_SQL = """
SELECT a.event_id AS src, b.event_id AS dst
FROM events a JOIN events b
ON a.event_id < b.event_id AND a.user_id <> b.user_id
   AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
"""
