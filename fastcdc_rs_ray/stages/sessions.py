"""Event-stream operators: gap-based sessionization + top-k.

The reference has no event-time semantics (SURVEY.md §2.9) — these are the
windowed/ordered operators a training-data pipeline needs around it, built
on the same partitioning discipline as the flagship: one keyed repartition
co-locates each user's events, then everything is a vectorized per-block
pass (sort, lag, cumulative sum).  Both are SQL-expressible and
oracle-checked by the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def sessionize(events_ds, gap_us: int = SESSION_GAP_US, num_partitions: int = 16):
    """events -> (user_id, session_id, n_events, start_ts, end_ts).

    session_id is the 0-based ordinal of the session within its user
    (a new session starts when the gap to the previous event exceeds
    ``gap_us``) — the classic LAG + cumulative-sum window, vectorized.
    """
    ds = events_ds.repartition(num_blocks=num_partitions, keys=["user_id"])

    def per_block(t: pa.Table) -> pa.Table:
        n = len(t)
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_ts": pa.array([], pa.timestamp("us")),
                "end_ts": pa.array([], pa.timestamp("us")),
            }
        )
        if n == 0:
            return empty
        order = pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]
        )
        t = t.take(order)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[0], ts[1:] - ts[:-1]])
        new_session = new_user | (gap > gap_us)
        # session ordinal within user: cumsum of new_session, rebased per user
        sess_cum = np.cumsum(new_session)
        user_base = np.maximum.accumulate(np.where(new_user, sess_cum, 0))
        session_id = sess_cum - user_base  # 0-based within user
        starts = np.flatnonzero(new_session)
        ends = np.concatenate([starts[1:], [n]])
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_id": pa.array(session_id[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "start_ts": pa.array(ts[starts].view("datetime64[us]")),
                "end_ts": pa.array(ts[ends - 1].view("datetime64[us]")),
            }
        )

    return ds.map_batches(per_block, batch_format="pyarrow", batch_size=None)


SESSIONIZE_SQL = f"""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) - 1
              AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS start_ts,
       MAX(ts) AS end_ts
FROM s GROUP BY user_id, session_id
"""


def top_users(events_ds, k: int = 10):
    """Top-k users by event count with total value (groupby + sort + limit).

    Partial per-block counting keeps the exchange at one row per
    (block, user); the final merge handles a driver-sized user universe
    (top-k of a larger key space would keep per-block top-k' candidates)."""

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, val = uid[order], val[order]
        starts = np.concatenate([[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1])
        counts = np.diff(np.concatenate([starts, [len(uid)]]))
        sums = np.add.reduceat(val, starts) if len(uid) else np.empty(0)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "total_value": pa.array(sums, pa.float64()),
            }
        )

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    # final combine is tiny (distinct users x blocks rows)
    rows = [b for b in partials.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b]) for b in rows]
    )
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    cnt = t["n_events"].to_numpy(zero_copy_only=False)
    val = t["total_value"].to_numpy(zero_copy_only=False)
    order = np.argsort(uid, kind="stable")
    uid, cnt, val = uid[order], cnt[order], val[order]
    starts = np.concatenate([[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1])
    counts = np.add.reduceat(cnt, starts)
    sums = np.add.reduceat(val, starts)
    users = uid[starts]
    top = np.lexsort((users, -counts))[:k]
    return pa.table(
        {
            "user_id": pa.array(users[top], pa.int64()),
            "n_events": pa.array(counts[top], pa.int64()),
            "total_value": pa.array(np.round(sums[top], 6), pa.float64()),
        }
    )


TOP_USERS_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT 10
"""

WINDOW_US = 3_600 * 1_000_000  # 1 h tumbling windows


def event_windows(events_ds, width_us: int = WINDOW_US, num_partitions: int = 8):
    """Tumbling-window aggregate: (user_id, w_start[us epoch], n_events,
    total_value) — the partial-combine + keyed-exchange shape: per-block
    pre-aggregation shrinks the exchange to one row per (block, user,
    window); the final combine is distributed (the (user, window) key
    space grows with the corpus, so no driver merge)."""

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"].combine_chunks(), pa.int64()).to_numpy()
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        w = (ts // width_us) * width_us
        order = np.lexsort((w, uid))
        uid, w, val = uid[order], w[order], val[order]
        brk = np.concatenate(([True], (uid[1:] != uid[:-1]) | (w[1:] != w[:-1])))
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(uid)))
        sums = np.add.reduceat(val, starts) if len(uid) else np.empty(0)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "w_start": pa.array(w[starts], pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "total_value": pa.array(sums, pa.float64()),
            }
        )

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    partials = partials.repartition(
        num_blocks=num_partitions, keys=["user_id", "w_start"]
    )

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "w_start": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "total_value": pa.array([], pa.float64()),
                }
            )
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        w = t["w_start"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = t["n_events"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["total_value"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((w, uid))
        uid, w, cnt, val = uid[order], w[order], cnt[order], val[order]
        brk = np.concatenate(([True], (uid[1:] != uid[:-1]) | (w[1:] != w[:-1])))
        starts = np.flatnonzero(brk)
        counts = np.add.reduceat(cnt, starts)
        sums = np.add.reduceat(val, starts)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "w_start": pa.array(w[starts], pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "total_value": pa.array(np.round(sums, 6), pa.float64()),
            }
        )

    return partials.map_batches(combine, batch_format="pyarrow", batch_size=None)


EVENT_WINDOWS_SQL = f"""
SELECT user_id,
       (epoch_us(ts) // {WINDOW_US}) * {WINDOW_US} AS w_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM events
GROUP BY user_id, (epoch_us(ts) // {WINDOW_US}) * {WINDOW_US}
"""


def top_events_per_user(events_ds, k: int = 3, num_partitions: int = 16):
    """Group-wise top-k: each user's k highest-value events — the
    windowed-ranking shape (``ROW_NUMBER() OVER (PARTITION BY ...)``
    with ``QUALIFY``) Ray Data has no native operator for.

    ONE keyed repartition on user_id co-locates each user's events, then
    ranking is a single vectorized lexsort per block (value cents desc,
    event_id asc — deterministic ties).  Unlike :func:`top_users` the
    result is proportional to the user universe (k rows per user), so no
    stage ever sees more than its own partition — scale-safe for any
    number of users, assuming one user's events fit in a block (same
    assumption as every keyed stage here).

    Output: (user_id, event_id, value_c, rk) with 1-based rank; value in
    exact int64 cents (2-decimal inputs).
    """
    ds = events_ds.repartition(num_blocks=num_partitions, keys=["user_id"])

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("event_id", pa.int64()),
         ("value_c", pa.int64()), ("rk", pa.int64())]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        vc = np.round(val * 100).astype(np.int64)
        order = np.lexsort((eid, -vc, uid))
        uid_s = uid[order]
        starts = np.concatenate([[0], np.flatnonzero(uid_s[1:] != uid_s[:-1]) + 1])
        rk = np.arange(len(uid_s), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(uid_s)))
        ) + 1
        keep = rk <= k
        sel = pa.array(order[keep], pa.int64())
        return pa.table(
            {
                "user_id": pa.array(uid_s[keep], pa.int64()),
                "event_id": t["event_id"].combine_chunks().take(sel),
                "value_c": pa.array(vc[order][keep], pa.int64()),
                "rk": pa.array(rk[keep], pa.int64()),
            }
        ).cast(out_schema)

    return ds.map_batches(per_block, batch_format="pyarrow", batch_size=None)


TOP_EVENTS_PER_USER_SQL = """
SELECT user_id, event_id,
       CAST(ROUND(value * 100) AS BIGINT) AS value_c,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY user_id
         ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC, event_id ASC
       ) AS BIGINT) AS rk
FROM events
QUALIFY rk <= 3
"""

PERCENTILE_QS = (0.5, 0.9, 0.99)


def value_percentiles(events_ds, qs: tuple[float, ...] = PERCENTILE_QS):
    """Exact distributed nearest-rank percentiles of event value via a
    VALUE-HISTOGRAM aggregate: values are 2-decimal, so the distinct
    universe of int64 cents is small-bounded regardless of row count —
    each block emits (value_c, count) partials, the driver merges a
    histogram and reads quantiles off the cumulative sum.  The shuffle
    moves O(distinct values x blocks) rows, never the data; this is the
    sketch-shaped aggregate pattern (an exact one, because the domain is
    discrete) for percentile/median at 100 TB.

    Answer for q = smallest v with cdf(v) >= ceil(q * N) (nearest-rank),
    mirrored exactly by the SQL oracle's ROW_NUMBER formulation.
    """
    import math

    def partial(t: pa.Table) -> pa.Table:
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        vc = np.round(val * 100).astype(np.int64)
        u, c = np.unique(vc, return_counts=True)
        return pa.table(
            {"value_c": pa.array(u, pa.int64()),
             "n": pa.array(c.astype(np.int64), pa.int64())}
        )

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    v = t["value_c"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    v, n = v[order], n[order]
    starts = np.concatenate([[0], np.flatnonzero(v[1:] != v[:-1]) + 1])
    vals = v[starts]
    cum = np.cumsum(np.add.reduceat(n, starts))
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if total == 0:
            continue
        rank = math.ceil(q * total)  # same IEEE double expr as SQL CEIL(q*n)
        out_q.append(q)
        out_v.append(vals[np.searchsorted(cum, rank, side="left")])
    return pa.table(
        {"q": pa.array(out_q, pa.float64()),
         "value_c": pa.array(np.asarray(out_v, np.int64), pa.int64())}
    )


_QS_VALUES = ", ".join(f"({q})" for q in PERCENTILE_QS)

VALUE_PERCENTILES_SQL = f"""
WITH qs(q) AS (VALUES {_QS_VALUES}),
s AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY CAST(ROUND(value * 100) AS BIGINT)) AS rn,
         COUNT(*) OVER () AS n
  FROM events
)
SELECT q, CAST(MIN(v) AS BIGINT) AS value_c
FROM s JOIN qs ON s.rn >= CEIL(qs.q * s.n)
GROUP BY q
"""


def distinct_users_per_type(events_ds, num_partitions: int = 8):
    """Distributed COUNT(DISTINCT): users per event_type.

    Per-block distinct shrinks each block to its unique (type, user)
    pairs, ONE keyed exchange on user_id co-locates every occurrence of a
    user (so a pair seen in many blocks lands in exactly one partition),
    a second per-block distinct + count yields per-type partials, and the
    driver merges |types| x partitions rows.  The exchange never carries
    more than the distinct-pair universe — the standard two-level
    distinct-aggregate plan for high-cardinality COUNT DISTINCT at scale.
    """

    def distinct_pairs(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([uid, codes], axis=1), axis=0)
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "event_type": enc.dictionary.take(pa.array(pairs[:, 1], pa.int64())),
            }
        )

    ds = events_ds.map_batches(distinct_pairs, batch_format="pyarrow")
    ds = ds.repartition(num_blocks=num_partitions, keys=["user_id"])

    def count_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "n_users": pa.array([], pa.int64())}
            )
        et = t["event_type"].combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([uid, codes], axis=1), axis=0)
        cnt = np.bincount(pairs[:, 1], minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table(
            {"event_type": enc.dictionary,
             "n_users": pa.array(cnt, pa.int64())}
        )

    partials = ds.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    et = t["event_type"].combine_chunks()
    enc = et.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.zeros(len(enc.dictionary), dtype=np.int64)
    np.add.at(n, codes, t["n_users"].combine_chunks().to_numpy(zero_copy_only=False))
    return pa.table(
        {"event_type": enc.dictionary, "n_users": pa.array(n, pa.int64())}
    )


DISTINCT_USERS_PER_TYPE_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
"""


def running_totals(events_ds, num_partitions: int = 16):
    """Per-user cumulative window functions: running sum + lag delta.

    The SQL-window-function shape (``SUM(...) OVER (PARTITION BY user
    ORDER BY ts)`` / ``LAG``) Ray Data has no native operator for, built
    on the engine's standard discipline: ONE keyed repartition on user_id
    co-locates each user's history, then one vectorized per-block pass —
    lexsort (ts, event_id tie-break), segment-offset cumulative sum, and
    a shifted-difference lag.  Output rows == input rows, so every stage
    is partition-local and the operator scales with the user universe
    (same one-user-fits-a-block assumption as sessionize, documented per
    SURVEY §2.10).

    Monetary values in exact int64 cents (2-decimal inputs) so the
    cumulative sums are bit-identical under any partitioning — the float
    drift rule every aggregate here follows.

    Output: (event_id, user_id, value_c, run_c, delta_c); delta_c is
    NULL on each user's first event (LAG semantics).
    """
    ds = events_ds.repartition(num_blocks=num_partitions, keys=["user_id"])

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("value_c", pa.int64()), ("run_c", pa.int64()),
         ("delta_c", pa.int64())]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        vc = np.round(
            t["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid_s, vc_s = uid[order], vc[order]
        n = len(uid_s)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = uid_s[1:] != uid_s[:-1]
        starts = np.flatnonzero(first)
        cum = np.cumsum(vc_s)
        seg_off = np.zeros(len(starts), dtype=np.int64)
        seg_off[1:] = cum[starts[1:] - 1]
        run = cum - np.repeat(seg_off, np.diff(np.append(starts, n)))
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = vc_s[:-1]
        prev[0] = 0
        delta = pa.array(vc_s - prev, pa.int64(), mask=first)
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "value_c": pa.array(vc_s, pa.int64()),
                "run_c": pa.array(run, pa.int64()),
                "delta_c": delta,
            }
        ).cast(out_schema)

    return ds.map_batches(per_block, batch_format="pyarrow", batch_size=None)


RUNNING_TOTALS_SQL = """
SELECT event_id, user_id,
       CAST(ROUND(value * 100) AS BIGINT) AS value_c,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS run_c,
       CAST(CAST(ROUND(value * 100) AS BIGINT)
            - LAG(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS delta_c
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


HOP_US = 900 * 1_000_000  # 15 min hop; with WINDOW_US=1h each event hits 4 windows


def hopping_windows(events_ds, width_us: int = WINDOW_US, hop_us: int = HOP_US,
                    num_partitions: int = 8):
    """Hopping (sliding) window aggregate: every window of ``width_us``
    whose start lies on the ``hop_us`` grid and covers the event — each
    event lands in exactly ``width/hop`` overlapping windows (width must
    be a multiple of hop).

    The overlap is materialized as a constant-factor per-block EXPLODE
    (vectorized broadcast, k = width//hop copies) *before* the partial
    aggregation, so the exchange still moves one row per (block, user,
    window) — the explode never crosses the wire unaggregated.  Sums in
    exact int64 cents, so combines are order-independent.

    Output: (user_id, w_start[us epoch], n_events, total_c).
    """
    if width_us % hop_us:
        raise ValueError("width_us must be a multiple of hop_us")
    k = width_us // hop_us

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("w_start", pa.int64()),
         ("n_events", pa.int64()), ("total_c", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"].combine_chunks(), pa.int64()).to_numpy()
        vc = np.round(
            t["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        base = (ts // hop_us) * hop_us
        w = (base[:, None] - hop_us * np.arange(k, dtype=np.int64)[None, :]).ravel()
        uid = np.repeat(uid, k)
        vc = np.repeat(vc, k)
        order = np.lexsort((w, uid))
        uid, w, vc = uid[order], w[order], vc[order]
        brk = np.concatenate(([True], (uid[1:] != uid[:-1]) | (w[1:] != w[:-1])))
        starts = np.flatnonzero(brk)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "w_start": pa.array(w[starts], pa.int64()),
                "n_events": pa.array(
                    np.diff(np.append(starts, len(uid))), pa.int64()
                ),
                "total_c": pa.array(np.add.reduceat(vc, starts), pa.int64()),
            }
        ).cast(out_schema)

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    partials = partials.repartition(
        num_blocks=num_partitions, keys=["user_id", "w_start"]
    )

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        w = t["w_start"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = t["n_events"].combine_chunks().to_numpy(zero_copy_only=False)
        vc = t["total_c"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((w, uid))
        uid, w, cnt, vc = uid[order], w[order], cnt[order], vc[order]
        brk = np.concatenate(([True], (uid[1:] != uid[:-1]) | (w[1:] != w[:-1])))
        starts = np.flatnonzero(brk)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "w_start": pa.array(w[starts], pa.int64()),
                "n_events": pa.array(np.add.reduceat(cnt, starts), pa.int64()),
                "total_c": pa.array(np.add.reduceat(vc, starts), pa.int64()),
            }
        ).cast(out_schema)

    return partials.map_batches(combine, batch_format="pyarrow", batch_size=None)


HOPPING_WINDOWS_SQL = f"""
SELECT user_id, w_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_c
FROM (
  SELECT user_id, value,
         unnest(generate_series(
           (epoch_us(ts) // {HOP_US}) * {HOP_US} - {WINDOW_US - HOP_US},
           (epoch_us(ts) // {HOP_US}) * {HOP_US},
           {HOP_US})) AS w_start
  FROM events
)
GROUP BY user_id, w_start
"""

MOVING_FRAME = 7  # current row + 6 preceding


def moving_sums(events_ds, frame: int = MOVING_FRAME, num_partitions: int = 16):
    """Sliding window-frame aggregate (``ROWS BETWEEN 6 PRECEDING AND
    CURRENT ROW``): per-user moving sum of value over the last ``frame``
    events ordered by (ts, event_id).

    One keyed repartition co-locates each user's events, then one
    vectorized per-block pass: global cumulative sum in exact integer
    cents, window = ``cum[i] - cum[max(i-frame+1, segment_start)-1]``
    with the lower bound clamped to the user's first row — no per-row
    loop, no materialized sliding windows.  Exact cents make the result
    partitioning-invariant (float accumulation would drift)."""
    ds = events_ds.repartition(num_blocks=num_partitions, keys=["user_id"])

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")), ("mov_sum", pa.float64()),
    ])

    def per_block(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]
        )
        t = t.take(order)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = np.round(
            t["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        idx = np.arange(n, dtype=np.int64)
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        seg_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        lo = np.maximum(idx - (frame - 1), seg_start)
        csh = np.concatenate([[0], np.cumsum(cents)])  # csh[i] = sum of rows < i
        wsum = csh[idx + 1] - csh[lo]
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts": t["ts"],
            "mov_sum": pa.array(wsum / 100.0, pa.float64()),
        }).cast(out_schema)

    return ds.map_batches(per_block, batch_format="pyarrow", batch_size=None)


MOVING_SUMS_SQL = f"""
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN {MOVING_FRAME - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) / 100.0 AS mov_sum
FROM events
"""

PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(events_ds, num_partitions: int = 8):
    """Pivot / crosstab: one row per user with per-event-type counts and
    the purchase-value total as columns (``COUNT(*) FILTER`` shape).

    Per-block partial pivot (one row per (block, user) — the exchange
    carries the already-pivoted fixed-width row, never the raw events),
    then a keyed exchange on user_id and a vectorized reduceat combine.
    Types outside ``PIVOT_TYPES`` land in none of the columns (SQL FILTER
    semantics); value accumulates in exact cents."""
    count_cols = [f"n_{ty}" for ty in PIVOT_TYPES]
    fields = [("user_id", pa.int64())]
    fields += [(c, pa.int64()) for c in count_cols]
    fields += [("purchase_c", pa.int64())]
    mid_schema = pa.schema(fields)
    type_set = pa.array(PIVOT_TYPES, pa.string())
    pi = PIVOT_TYPES.index("purchase")

    def partial(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return mid_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        code = pc.index_in(t["event_type"].combine_chunks(), value_set=type_set)
        code = code.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            t["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        order = np.argsort(uid, kind="stable")
        uid, code, cents = uid[order], code[order], cents[order]
        starts = np.concatenate([[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1])
        cols = {"user_id": pa.array(uid[starts], pa.int64())}
        for ti, c in enumerate(count_cols):
            cols[c] = pa.array(
                np.add.reduceat((code == ti).astype(np.int64), starts), pa.int64()
            )
        cols["purchase_c"] = pa.array(
            np.add.reduceat(np.where(code == pi, cents, 0), starts), pa.int64()
        )
        return pa.table(cols).cast(mid_schema)

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    partials = partials.repartition(num_blocks=num_partitions, keys=["user_id"])

    out_fields = [("user_id", pa.int64())]
    out_fields += [(c, pa.int64()) for c in count_cols]
    out_fields += [("purchase_value", pa.float64())]
    out_schema = pa.schema(out_fields)

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        starts = np.concatenate([[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1])
        cols = {"user_id": pa.array(uid[starts], pa.int64())}
        for c in count_cols:
            v = t[c].combine_chunks().to_numpy(zero_copy_only=False)[order]
            cols[c] = pa.array(np.add.reduceat(v, starts), pa.int64())
        pv = t["purchase_c"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        cols["purchase_value"] = pa.array(
            np.add.reduceat(pv, starts) / 100.0, pa.float64()
        )
        return pa.table(cols).cast(out_schema)

    return partials.map_batches(combine, batch_format="pyarrow", batch_size=None)


EVENTS_PIVOT_SQL = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click')    AS n_click,
       COUNT(*) FILTER (event_type = 'error')    AS n_error,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (event_type = 'view')     AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(round(value * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) / 100.0 AS purchase_value
FROM events
GROUP BY user_id
"""


def median_value_by_type(events_ds):
    """Exact per-group median (``quantile_disc(0.5)``): the grouped twin
    of :func:`value_percentiles`, answering "median purchase value per
    event type" without ever shuffling rows.

    Each block emits (event_type, value, count) histogram partials keyed
    by the RAW float64 bits (no cents quantization — the answer is an
    actual element of the column, so it hash-matches the SQL oracle
    bit-for-bit); the driver merges O(|types| x |distinct values| x
    blocks) partial rows and reads the lower-middle element (rank
    floor((n-1)/2), DuckDB's quantile_disc rule) off each group's
    cumulative histogram.  Exactness relies on the same discrete-domain
    assumption value_percentiles documents.
    """

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        pair = np.stack([codes, val.view(np.int64)], axis=1)
        u, c = np.unique(pair, axis=0, return_counts=True)
        return pa.table({
            "event_type": enc.dictionary.take(pa.array(u[:, 0], pa.int64())),
            "value": pa.array(u[:, 1].view(np.float64), pa.float64()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
        })

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    et = t["event_type"].combine_chunks()
    enc = et.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    val = t["value"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False)
    out_t, out_v = [], []
    for code in range(len(enc.dictionary)):
        sel = codes == code
        v, c = val[sel], n[sel]
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        starts = np.concatenate([[0], np.flatnonzero(v[1:] != v[:-1]) + 1])
        vals = v[starts]
        cum = np.cumsum(np.add.reduceat(c, starts))
        total = int(cum[-1])
        rank = (total - 1) // 2  # 0-based lower-middle = quantile_disc(0.5)
        out_t.append(code)
        out_v.append(vals[np.searchsorted(cum, rank, side="right")])
    return pa.table({
        "event_type": enc.dictionary.take(pa.array(out_t, pa.int64())),
        "median_value": pa.array(np.asarray(out_v, np.float64), pa.float64()),
    })


MEDIAN_VALUE_BY_TYPE_SQL = """
SELECT event_type, quantile_disc(value, 0.5) AS median_value
FROM events
GROUP BY event_type
"""


def user_spend_rank(events_ds, num_partitions: int = 8):
    """Global RANK / PERCENT_RANK over per-user spend WITHOUT a global
    sort: ranking against a broadcast cumulative histogram.

    Pass 1 is the standard partial+final total per user (one keyed
    exchange, materialized — it is the reduced set, orders of magnitude
    smaller than the event stream).  The driver then merges per-block
    (total, count) histogram partials into a sorted distinct-total CDF —
    O(|distinct totals|), the same small-side budget every broadcast stage
    here assumes — and ships it once via ``ray.put``; a second map over
    the materialized totals assigns ``rank = #strictly-smaller + 1``
    (RANK ties-share semantics, deterministic under ties where NTILE is
    not) and ``pct_rank = (rank-1)/(n-1)`` by vectorized searchsorted.
    No all-to-all sort ever runs; the only exchange is the keyed
    aggregation.
    """
    import ray

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        vc = np.round(val * 100).astype(np.int64)
        u, inv = np.unique(uid, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, vc)
        return pa.table({
            "user_id": pa.array(u, pa.int64()),
            "total_c": pa.array(s, pa.int64()),
        })

    ds = events_ds.map_batches(partial, batch_format="pyarrow")
    ds = ds.repartition(num_blocks=num_partitions, keys=["user_id"])

    def final(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "total_c": pa.array([], pa.int64()),
            })
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        s0 = t["total_c"].combine_chunks().to_numpy(zero_copy_only=False)
        u, inv = np.unique(uid, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, s0)
        return pa.table({
            "user_id": pa.array(u, pa.int64()),
            "total_c": pa.array(s, pa.int64()),
        })

    totals = ds.map_batches(final, batch_format="pyarrow", batch_size=None).materialize()

    def hist_partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            t["total_c"].combine_chunks().to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({
            "v": pa.array(v, pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
        })

    parts = totals.map_batches(hist_partial, batch_format="pyarrow", batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in parts.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    v = t["v"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    v, n = v[order], n[order]
    starts = np.concatenate([[0], np.flatnonzero(v[1:] != v[:-1]) + 1]) if len(v) else np.empty(0, np.int64)
    vals = v[starts]
    counts = np.add.reduceat(n, starts) if len(v) else np.empty(0, np.int64)
    below = np.concatenate([[0], np.cumsum(counts)[:-1]]) if len(counts) else counts
    total_users = int(counts.sum())
    cdf_ref = ray.put((vals, below))

    def assign(t: pa.Table) -> pa.Table:
        vals_b, below_b = ray.get(cdf_ref)
        tc = t["total_c"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vals_b, tc)
        rnk = below_b[idx] + 1
        denom = max(total_users - 1, 1)
        return pa.table({
            "user_id": t["user_id"],
            "total_c": t["total_c"],
            "rnk": pa.array(rnk.astype(np.int64), pa.int64()),
            "pct_rank": pa.array((rnk - 1) / denom, pa.float64()),
        })

    return totals.map_batches(assign, batch_format="pyarrow")


USER_SPEND_RANK_SQL = """
WITH tot AS (
  SELECT user_id,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_c
  FROM events GROUP BY user_id
)
SELECT user_id, total_c,
       RANK() OVER (ORDER BY total_c) AS rnk,
       PERCENT_RANK() OVER (ORDER BY total_c) AS pct_rank
FROM tot
"""


def user_event_paths(events_ds, num_partitions: int = 16):
    """Ordered group concatenation (the SQL ``string_agg(x, ',' ORDER BY
    ...)`` / LISTAGG shape): per user, the comma-joined sequence of event
    types in (ts, event_id) order.

    Order-sensitive aggregates can't be pre-reduced commutatively, so the
    discipline is the window-function one, not the partial-combine one:
    ONE keyed repartition on user_id co-locates each user's history, then
    a single vectorized per-block pass — lexsort, segment offsets, and
    ``pc.binary_join`` over a ListArray built straight from the sorted
    values (no per-row Python).  Output is |users| rows; each user's path
    string is bounded by their history length (same one-user-fits-a-block
    assumption as sessionize, SURVEY §2.10).

    Output: (user_id, n_events, path).
    """
    ds = events_ds.repartition(num_blocks=num_partitions, keys=["user_id"])

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()),
         ("path", pa.string())]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = t["event_type"].combine_chunks()
        order = np.lexsort((eid, ts, uid))
        uid_s = uid[order]
        n = len(uid_s)
        starts = np.concatenate(
            [[0], np.flatnonzero(uid_s[1:] != uid_s[:-1]) + 1]
        )
        offsets = np.append(starts, n).astype(np.int32)
        et_sorted = et.take(pa.array(order, pa.int64()))
        paths = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), et_sorted), ","
        )
        return pa.table({
            "user_id": pa.array(uid_s[starts], pa.int64()),
            "n_events": pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
            "path": paths,
        }).cast(out_schema)

    return ds.map_batches(per_block, batch_format="pyarrow", batch_size=None)


USER_EVENT_PATHS_SQL = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS path
FROM events
GROUP BY user_id
"""


def favorite_event_type(events_ds, num_partitions: int = 16):
    """Grouped mode / argmax: each user's most frequent event_type, ties
    broken by the lexicographically smallest type (the deterministic
    ROW_NUMBER()-over-count-DESC shape; the reference has no aggregation
    at all — SURVEY.md §2.5).

    Discipline: per-block (user, type) partial counts (dictionary-encode +
    lexsort + reduceat — the exchange moves one row per distinct pair per
    block, Zipf-bounded like tfidf), ONE keyed exchange on user_id, then a
    per-block combine + vectorized first-row-per-user argmax.  Deterministic
    under any partitioning because the tie-break is total.
    """

    def pair_counts(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([("user_id", pa.int64()),
                                ("event_type", pa.string()),
                                ("n", pa.int64())])
        if len(t) == 0:
            return out_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        dic = t["event_type"].combine_chunks().dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if "n" in t.column_names:  # combine pass: weighted counts
            w = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        else:
            w = np.ones(len(uid), np.int64)
        order = np.lexsort((codes, uid))
        uid, codes, w = uid[order], codes[order], w[order]
        new = np.concatenate(
            [[True], (uid[1:] != uid[:-1]) | (codes[1:] != codes[:-1])])
        starts = np.flatnonzero(new)
        counts = np.add.reduceat(w, starts)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "event_type": dic.dictionary.take(
                pa.array(codes[starts], pa.int64())),
            "n": pa.array(counts, pa.int64()),
        }).cast(out_schema)

    partials = events_ds.map_batches(pair_counts, batch_format="pyarrow")
    located = partials.repartition(num_blocks=num_partitions,
                                   keys=["user_id"])

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("top_type", pa.string()),
                            ("n", pa.int64())])

    def argmax_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        t = pair_counts(t)  # merge same (user, type) rows across blocks
        order = pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("n", "descending"),
            ("event_type", "ascending")])
        t = t.take(order)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], uid[1:] != uid[:-1]])
        idx = pa.array(np.flatnonzero(first), pa.int64())
        return pa.table({
            "user_id": t["user_id"].take(idx),
            "top_type": t["event_type"].take(idx),
            "n": t["n"].take(idx),
        }).cast(out_schema)

    return located.map_batches(argmax_block, batch_format="pyarrow",
                               batch_size=None)


FAVORITE_EVENT_TYPE_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
), r AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS top_type, n FROM r WHERE rn = 1
"""


def first_event_type(events_ds, num_partitions: int = 16):
    """FIRST_VALUE / argmin-by-ordering: each user's earliest event (total
    order: ts, then event_id as the tie-break) and its type — the
    ``ROW_NUMBER() OVER (PARTITION BY user ORDER BY ts, id) = 1`` shape,
    the dual of :func:`favorite_event_type`'s count-argmax.

    Discipline: each block reduces to ONE candidate row per user it saw
    (vectorized lexsort + first-row mask), those candidates ride one keyed
    exchange on user_id, and the per-block combine re-runs the identical
    argmin — a commutative/idempotent partial, so the result is
    bit-identical under any partitioning or retry.
    """
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("first_ts_us", pa.int64()),
        ("first_event_id", pa.int64()), ("first_type", pa.string()),
    ])

    def argmin_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        if "first_ts_us" in t.column_names:  # combine pass
            uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
            ts = t["first_ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
            eid = t["first_event_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            typ = t["first_type"].combine_chunks()
        else:
            uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
            ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
            typ = t["event_type"].combine_chunks()
        order = np.lexsort((eid, ts, uid))
        first = np.concatenate([[True], uid[order][1:] != uid[order][:-1]])
        idx = order[first]
        return pa.table({
            "user_id": pa.array(uid[idx], pa.int64()),
            "first_ts_us": pa.array(ts[idx], pa.int64()),
            "first_event_id": pa.array(eid[idx], pa.int64()),
            "first_type": typ.take(pa.array(idx, pa.int64())),
        }).cast(out_schema)

    partials = events_ds.map_batches(argmin_block, batch_format="pyarrow")
    located = partials.repartition(num_blocks=num_partitions, keys=["user_id"])
    return located.map_batches(argmin_block, batch_format="pyarrow",
                               batch_size=None)


FIRST_EVENT_TYPE_SQL = """
WITH r AS (
  SELECT user_id,
         CAST(epoch_us(ts) AS BIGINT) AS first_ts_us,
         event_id AS first_event_id,
         event_type AS first_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, first_ts_us, first_event_id, first_type FROM r WHERE rn = 1
"""


QUARTILE_PCTS = (25, 50, 75)


def value_quartiles_cont(events_ds):
    """Grouped INTERPOLATED quartiles (the ``percentile_cont`` /
    ``quantile_cont`` shape — linear interpolation between the two
    straddling order statistics, vs the nearest-rank ``_disc`` family of
    :func:`median_value_by_type` / value_percentiles).

    Interpolation is exact integer arithmetic: with values quantized to
    cents (the column is 2-decimal by contract) and quantile p in percent,
    ``idx100 = (n-1)*p``, ``k = idx100 // 100``, ``r = idx100 % 100`` and
    the answer in 1e-4-dollar units is ``v[k]*(100-r) + v[k+1]*r`` — no
    float division anywhere, so the result is bit-identical under any
    partitioning AND hash-matches the SQL oracle, which evaluates the
    identical integer formula over a sorted list.

    Same partial discipline as the other grouped quantiles: per-block
    (type, value_c, count) histogram rows — the exchange-free
    driver-merged tiny set — then per-group order statistics off the
    cumulative histogram.
    """

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vc = np.round(
            t["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pair = np.stack([codes, vc], axis=1)
        u, c = np.unique(pair, axis=0, return_counts=True)
        return pa.table({
            "event_type": enc.dictionary.take(pa.array(u[:, 0], pa.int64())),
            "value_c": pa.array(u[:, 1], pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
        })

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64())]
        + [(f"p{p}_u4", pa.int64()) for p in QUARTILE_PCTS]
    )
    if len(t) == 0:
        return schema.empty_table()
    et = t["event_type"].combine_chunks()
    enc = et.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    val = t["value_c"].to_numpy(zero_copy_only=False)
    cnt = t["n"].to_numpy(zero_copy_only=False)
    rows: dict[str, list] = {c: [] for c in schema.names}
    names = enc.dictionary.to_pylist()
    for code, name in enumerate(names):
        sel = codes == code
        v, c = val[sel], cnt[sel]
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        starts = np.concatenate([[0], np.flatnonzero(v[1:] != v[:-1]) + 1])
        vals = v[starts]
        cum = np.cumsum(np.add.reduceat(c, starts))
        total = int(cum[-1])
        rows["event_type"].append(name)
        rows["n"].append(total)
        for p in QUARTILE_PCTS:
            idx100 = (total - 1) * p
            k, r = divmod(idx100, 100)
            lo = int(vals[np.searchsorted(cum, k, side="right")])
            hi = int(vals[np.searchsorted(cum, min(k + 1, total - 1), side="right")])
            rows[f"p{p}_u4"].append(lo * (100 - r) + hi * r)
    return pa.table(rows).cast(schema)


def _quart_sql_term(p: int) -> str:
    return (
        f"vs[((n-1)*{p})//100 + 1] * (100 - ((n-1)*{p})%100)"
        f" + vs[least(((n-1)*{p})//100 + 2, n)] * (((n-1)*{p})%100)"
        f" AS p{p}_u4"
    )


VALUE_QUARTILES_CONT_SQL = f"""
WITH s AS (
  SELECT event_type,
         list_sort(list(CAST(ROUND(value * 100) AS BIGINT))) AS vs,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  GROUP BY event_type
)
SELECT event_type, n,
       {", ".join(_quart_sql_term(p) for p in QUARTILE_PCTS)}
FROM s
"""


def value_mad_by_type(events_ds):
    """Grouped MEDIAN ABSOLUTE DEVIATION — the robust-dispersion partner of
    :func:`value_dispersion`'s variance: ``mad = median(|x - median(x)|)``,
    a two-level quantile that normally costs two passes (median, then
    re-scan for deviations).

    Here it costs ONE streaming pass and zero exchange: the per-block
    partial is the same (type, value_c, count) histogram the other grouped
    quantiles use (tiny — the value domain is 2-decimal by contract), and
    the DEVIATION histogram is derived from the value histogram on the
    driver (|2v - med_u2| per bin, counts re-merged), so the second
    quantile level is free.

    Exact integer arithmetic throughout: interpolated medians double
    instead of halving — ``med_u2 = lo + hi`` cents (straddling order
    statistics; equal for odd n) and ``mad_u4 = dlo + dhi`` in quarter-cent
    units — so the result is partition-invariant and hash-matches the SQL
    oracle's identical integer formula.
    """

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vc = np.round(
            t["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pair = np.stack([codes, vc], axis=1)
        u, c = np.unique(pair, axis=0, return_counts=True)
        return pa.table({
            "event_type": enc.dictionary.take(pa.array(u[:, 0], pa.int64())),
            "value_c": pa.array(u[:, 1], pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
        })

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    schema = pa.schema([
        ("event_type", pa.string()), ("n", pa.int64()),
        ("med_u2", pa.int64()), ("mad_u4", pa.int64()),
    ])
    if len(t) == 0:
        return schema.empty_table()
    et = t["event_type"].combine_chunks()
    enc = et.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    val = t["value_c"].to_numpy(zero_copy_only=False)
    cnt = t["n"].to_numpy(zero_copy_only=False)

    def hist_median2(v: np.ndarray, c: np.ndarray) -> tuple[int, int]:
        """(lo + hi, n): doubled interpolated median off a value histogram."""
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        starts = np.concatenate([[0], np.flatnonzero(v[1:] != v[:-1]) + 1])
        vals = v[starts]
        cum = np.cumsum(np.add.reduceat(c, starts))
        total = int(cum[-1])
        lo = int(vals[np.searchsorted(cum, (total - 1) // 2, side="right")])
        hi = int(vals[np.searchsorted(cum, total // 2, side="right")])
        return lo + hi, total

    rows: dict[str, list] = {c: [] for c in schema.names}
    for code, name in enumerate(enc.dictionary.to_pylist()):
        sel = codes == code
        v, c = val[sel], cnt[sel]
        med_u2, total = hist_median2(v, c)
        dev = np.abs(2 * v - med_u2)  # u2 units; bins can collide -> re-merge
        mad_u4, _ = hist_median2(dev, c)
        rows["event_type"].append(name)
        rows["n"].append(total)
        rows["med_u2"].append(med_u2)
        rows["mad_u4"].append(mad_u4)
    return pa.table(rows).cast(schema)


VALUE_MAD_BY_TYPE_SQL = """
WITH s AS (
  SELECT event_type,
         list_sort(list(CAST(ROUND(value * 100) AS BIGINT))) AS vs,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  GROUP BY event_type
),
m AS (
  SELECT event_type, n, vs,
         vs[(n-1)//2 + 1] + vs[n//2 + 1] AS med_u2
  FROM s
),
d AS (
  SELECT event_type, n, med_u2,
         list_sort(list_transform(vs, x -> abs(2*x - med_u2))) AS ds
  FROM m
)
SELECT event_type, n, med_u2,
       ds[(n-1)//2 + 1] + ds[n//2 + 1] AS mad_u4
FROM d
"""


def login_streaks(events_ds, num_partitions: int = 16):
    """Gaps-and-islands: each user's count of distinct active days and
    LONGEST run of consecutive days — the islands-via-(day - row_number)
    anchor shape, the one classic window idiom the window tier didn't yet
    cover (sessionize islands on a time GAP; this islands on calendar
    adjacency).

    Discipline: blocks pre-reduce to distinct (user, epoch-day) pairs
    (bounded by blocks x |users| x |days|, far under raw events), ONE
    keyed exchange on user_id co-locates each user's days, and the
    per-block combine is fully vectorized: global dedup + lexsort, then
    ``anchor = day - rank-within-user`` labels each maximal consecutive
    run with a constant, and a double reduceat reads off the longest run.
    Integer epoch-day arithmetic end to end — partition-invariant.
    """
    pair_schema = pa.schema([("user_id", pa.int64()), ("day", pa.int64())])

    def distinct_days(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pair_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        if "day" in t.column_names:
            day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        else:
            ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = ts // 86_400_000_000  # epoch-us -> epoch-day
        pair = np.stack([uid, day], axis=1)
        u = np.unique(pair, axis=0)
        return pa.table({
            "user_id": pa.array(u[:, 0], pa.int64()),
            "day": pa.array(u[:, 1], pa.int64()),
        }).cast(pair_schema)

    partials = events_ds.map_batches(distinct_days, batch_format="pyarrow")
    located = partials.repartition(num_blocks=num_partitions, keys=["user_id"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("n_active_days", pa.int64()),
        ("longest_streak", pa.int64()),
    ])

    def streaks(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        t = distinct_days(t)  # cross-block dedup of (user, day)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        n = len(uid)
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        ustarts = np.flatnonzero(new_user)
        # rank within user = global index - user segment start
        rank = np.arange(n) - np.repeat(ustarts, np.diff(np.append(ustarts, n)))
        anchor = day - rank  # constant within a maximal consecutive run
        new_run = np.concatenate(
            [[True], (uid[1:] != uid[:-1]) | (anchor[1:] != anchor[:-1])])
        rstarts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(rstarts, n))
        # longest run per user = max over this user's runs
        run_user_start = np.searchsorted(ustarts, rstarts, side="right") - 1
        seg = np.concatenate(
            [[True], run_user_start[1:] != run_user_start[:-1]])
        longest = np.maximum.reduceat(run_len, np.flatnonzero(seg))
        return pa.table({
            "user_id": pa.array(uid[ustarts], pa.int64()),
            "n_active_days": pa.array(
                np.diff(np.append(ustarts, n)).astype(np.int64), pa.int64()),
            "longest_streak": pa.array(longest.astype(np.int64), pa.int64()),
        }).cast(out_schema)

    return located.map_batches(streaks, batch_format="pyarrow",
                               batch_size=None)


LOGIN_STREAKS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day
  FROM events
),
i AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS anchor
  FROM d
),
runs AS (
  SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len
  FROM i GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak
FROM runs
GROUP BY user_id
"""


def cohort_retention(events_ds, num_partitions: int = 8):
    """Cohort retention matrix: for each signup cohort (a user's first
    active calendar month) x activity month, how many distinct users were
    active — the classic retention-triangle analytics shape (needs the
    per-user MIN attached back to every activity row, so unlike the
    tiny-result rollups it takes one keyed exchange).

    Plan: blocks pre-reduce the event log to DISTINCT (user, month)
    pairs (months via vectorized calendar ``floor_temporal``); ONE keyed
    exchange on user_id co-locates each user's months; the combine
    re-dedups, takes the per-user min month as the cohort, and collapses
    straight to (cohort, month, n_users) partials — at most
    |months|^2/2 x partitions rows merge on the driver.  The event log
    itself never carries the exchange: only distinct user-month pairs do
    (bounded by |users| x |months| per block, not by events).
    Reference has no aggregates (SURVEY.md §2.5)."""

    def um_partial(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        month = pc.floor_temporal(
            t["ts"].combine_chunks(), unit="month"
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((month, uid))
        uid, month = uid[order], month[order]
        if len(uid):
            keep = np.concatenate(
                [[True], (uid[1:] != uid[:-1]) | (month[1:] != month[:-1])]
            )
            uid, month = uid[keep], month[keep]
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "month_us": pa.array(month, pa.int64()),
        })

    pairs = events_ds.map_batches(um_partial, batch_format="pyarrow")
    pairs = pairs.repartition(num_blocks=num_partitions, keys=["user_id"])

    part_schema = pa.schema([
        ("cohort_us", pa.int64()), ("month_us", pa.int64()),
        ("n", pa.int64()),
    ])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        month = t["month_us"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((month, uid))
        uid, month = uid[order], month[order]
        keep = np.concatenate(
            [[True], (uid[1:] != uid[:-1]) | (month[1:] != month[:-1])]
        )
        uid, month = uid[keep], month[keep]
        starts = np.concatenate([[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1])
        sizes = np.diff(np.concatenate([starts, [len(uid)]]))
        cohort = np.repeat(month[starts], sizes)  # min = first in sorted group
        key = np.stack([cohort, month], axis=1)
        uk, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table({
            "cohort_us": pa.array(uk[:, 0], pa.int64()),
            "month_us": pa.array(uk[:, 1], pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        }).cast(part_schema)

    partials = pairs.map_batches(combine, batch_format="pyarrow",
                                 batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs) if tabs else part_schema.empty_table()
    if len(t) == 0:
        return pa.table({
            "cohort_us": pa.array([], pa.int64()),
            "month_us": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
        })
    co = t["cohort_us"].to_numpy(zero_copy_only=False)
    mo = t["month_us"].to_numpy(zero_copy_only=False)
    key = np.stack([co, mo], axis=1)
    uk, inv = np.unique(key, axis=0, return_inverse=True)
    n = np.zeros(len(uk), np.int64)
    np.add.at(n, inv, t["n"].to_numpy(zero_copy_only=False))
    return pa.table({
        "cohort_us": pa.array(uk[:, 0], pa.int64()),
        "month_us": pa.array(uk[:, 1], pa.int64()),
        "n_users": pa.array(n, pa.int64()),
    })


COHORT_RETENTION_SQL = """
WITH um AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(CAST(date_trunc('month', ts) AS TIMESTAMP)) AS BIGINT)
             AS month_us
  FROM events
), c AS (
  SELECT user_id, MIN(month_us) AS cohort_us FROM um GROUP BY 1
)
SELECT c.cohort_us, um.month_us, CAST(COUNT(*) AS BIGINT) AS n_users
FROM um JOIN c USING (user_id)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Dense time-series resample: zero-filled calendar grid (gap filling)
# --------------------------------------------------------------------------

HOUR_US = 3_600 * 1_000_000


def hourly_type_series(events_ds, grain_us: int = HOUR_US):
    """Dense per-(event_type, hour) count series with GAP FILLING: every
    hour between the global min and max event hour appears for every
    observed event type, zero-filled — the resample/`generate_series`
    shape dashboards and anomaly detectors need (a sparse GROUP BY
    silently drops empty buckets; a zero IS the signal).

    Discipline: per-block partials are grid-sized (|types| x |hours in
    block|) dict-encoded count rows — never event rows; the driver merges
    them into one dict and materializes the dense |types| x |span| grid.
    Zero keyed exchange.  Scale: hours grow linearly with calendar time
    and types are a fixed vocabulary, so the grid stays driver-sized even
    at 100 TB of events; if a grain ever made it bigger, the same
    partials feed the event_windows keyed-exchange combine instead.
    """

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"].combine_chunks(), pa.int64()).to_numpy()
        h = (ts // grain_us) * grain_us
        enc = t["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        # pack (code, hour) into one sortable key: hours fit u64 easily
        key = codes * (h.max() + 1 if len(h) else 1) + h if len(h) else h
        order = np.argsort(key, kind="stable")
        c_s, h_s = codes[order], h[order]
        brk = np.concatenate(
            ([True], (c_s[1:] != c_s[:-1]) | (h_s[1:] != h_s[:-1])))
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(c_s)))
        return pa.table({
            "event_type": enc.dictionary.take(
                pa.array(c_s[starts], pa.int64())),
            "hour_us": pa.array(h_s[starts], pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    acc: dict[tuple[str, int], int] = {}
    lo = None
    hi = None
    for b in events_ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for et, h, n in zip(t["event_type"].to_pylist(),
                            t["hour_us"].to_pylist(), t["n"].to_pylist()):
            acc[(et, h)] = acc.get((et, h), 0) + n
            lo = h if lo is None or h < lo else lo
            hi = h if hi is None or h > hi else hi
    if lo is None:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "hour_us": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    types = sorted({et for et, _ in acc})
    hours = np.arange(lo, hi + grain_us, grain_us, dtype=np.int64)
    et_out = []
    h_out = []
    n_out = []
    for et in types:
        et_out.extend([et] * len(hours))
        h_out.append(hours)
        n_out.append(np.array([acc.get((et, int(h)), 0) for h in hours],
                              np.int64))
    return pa.table({
        "event_type": pa.array(et_out, pa.string()),
        "hour_us": pa.array(np.concatenate(h_out), pa.int64()),
        "n_events": pa.array(np.concatenate(n_out), pa.int64()),
    })


HOURLY_TYPE_SERIES_SQL = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT MIN(date_trunc('hour', ts)) AS lo,
         MAX(date_trunc('hour', ts)) AS hi
  FROM events
),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM span
),
types AS (SELECT DISTINCT event_type FROM events)
SELECT types.event_type,
       CAST(epoch_us(hours.h) AS BIGINT) AS hour_us,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n_events
FROM types CROSS JOIN hours
LEFT JOIN b ON b.event_type = types.event_type AND b.h = hours.h
"""


def user_spend_ntile(events_ds, k: int = 10, num_partitions: int = 8):
    """NTILE(k) over per-user spend — the equi-height bucketing window.

    NTILE is only deterministic under a UNIQUE total ordering, so the
    order key is (total, user_id) (ties broken by id, mirrored in the
    oracle's ``ORDER BY total_c, user_id``).  Row numbers come without a
    global sort, splitting the rank into two exact parts:

    - ``below`` (#users with strictly smaller totals) from the broadcast
      distinct-total cumulative histogram — :func:`user_spend_rank`'s
      device;
    - the within-tie index from ONE keyed exchange of the (already
      reduced) per-user totals on total_c: equal totals land in one
      block, where a lexsort by (total, user) enumerates them.

    The bucket then follows SQL NTILE's first-buckets-get-the-remainder
    rule exactly: with n rows, ``big = n %% k`` buckets of size
    ``n//k + 1`` come first.  Everything after the per-user reduction
    moves |users|-sized rows only.
    """
    import ray

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        vc = np.round(
            t["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        u, inv = np.unique(uid, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, vc)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "total_c": pa.array(s, pa.int64())})

    ds = events_ds.map_batches(partial, batch_format="pyarrow")
    ds = ds.repartition(num_blocks=num_partitions, keys=["user_id"])

    def final(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "total_c": pa.array([], pa.int64())})
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        s0 = t["total_c"].combine_chunks().to_numpy(zero_copy_only=False)
        u, inv = np.unique(uid, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, s0)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "total_c": pa.array(s, pa.int64())})

    totals = ds.map_batches(final, batch_format="pyarrow",
                            batch_size=None).materialize()

    def hist_partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            t["total_c"].combine_chunks().to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"v": pa.array(v, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    parts = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in totals.map_batches(hist_partial, batch_format="pyarrow",
                                    batch_size=None)
        .iter_batches(batch_format="pyarrow"))
    v = parts["v"].to_numpy(zero_copy_only=False)
    c = parts["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    starts = np.concatenate([[0], np.flatnonzero(v[1:] != v[:-1]) + 1]) \
        if len(v) else np.empty(0, np.int64)
    vals = v[starts]
    counts = np.add.reduceat(c, starts) if len(v) else c
    below = np.concatenate([[0], np.cumsum(counts)[:-1]]) if len(counts) else counts
    n_total = int(counts.sum())
    cdf_ref = ray.put((vals, below))

    big = n_total % k
    size_big = n_total // k + 1
    size_small = n_total // k
    cut = big * size_big

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "total_c": pa.array([], pa.int64()),
                             "tile": pa.array([], pa.int64())})
        vb, bb = ray.get(cdf_ref)
        tc = t["total_c"].combine_chunks().to_numpy(zero_copy_only=False)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, tc))
        tc, uid = tc[order], uid[order]
        gstart = np.concatenate([[0], np.flatnonzero(tc[1:] != tc[:-1]) + 1])
        tie_idx = np.arange(len(tc)) - np.repeat(gstart, np.diff(
            np.concatenate([gstart, [len(tc)]])))
        r = bb[np.searchsorted(vb, tc)] + tie_idx + 1  # 1-based row_number
        tile = np.where(
            r <= cut,
            (r - 1) // size_big + 1,
            big + (r - 1 - cut) // max(size_small, 1) + 1,
        ).astype(np.int64)
        return pa.table({"user_id": pa.array(uid, pa.int64()),
                         "total_c": pa.array(tc, pa.int64()),
                         "tile": pa.array(tile, pa.int64())})

    by_total = totals.repartition(num_blocks=num_partitions, keys=["total_c"])
    return by_total.map_batches(assign, batch_format="pyarrow",
                                batch_size=None)


USER_SPEND_NTILE_SQL = """
WITH t AS (
  SELECT user_id, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
           AS total_c
  FROM events GROUP BY user_id
)
SELECT user_id, total_c,
       CAST(NTILE(10) OVER (ORDER BY total_c, user_id) AS BIGINT) AS tile
FROM t
"""


ANOMALY_Z2_X100 = 900  # z = 3.0, carried as z^2 * 100 so thresholds stay integral


def hourly_anomalies(events_ds, z2_x100: int = ANOMALY_Z2_X100,
                     grain_us: int = HOUR_US):
    """Spike detection over the dense hourly series: flag every
    (event_type, hour) cell whose count exceeds its type's mean by more
    than z sample standard deviations — the alerting pass a pipeline runs
    ON TOP of :func:`hourly_type_series` (the zero-filled grid matters:
    against a sparse GROUP BY the mean/std would be computed over the
    wrong denominator and quiet hours could never drag the baseline down).

    The z-test is evaluated entirely in integers — cross-multiplied as

        (m·x − S) > 0  and  (m·x − S)²·(m−1)·100 > z²·100·m·(m·Q − S²)

    with S = Σx, Q = Σx² over the m grid cells of the type (driver-side
    Python bigints, so no overflow at any scale; the SQL oracle evaluates
    the identical inequality in HUGEINT).  Distribution shape = the grid's:
    grid-sized block partials, zero exchange, flags on the driver-resident
    grid.
    """
    grid = hourly_type_series(events_ds, grain_us=grain_us)
    if len(grid) == 0:
        return grid
    et = grid["event_type"].to_pylist()
    hours = grid["hour_us"].to_numpy(zero_copy_only=False)
    n = grid["n_events"].to_numpy(zero_copy_only=False)
    out_sel = []
    import itertools as _it

    for _ty, g in _it.groupby(range(len(et)), key=lambda i: et[i]):
        idx = list(g)
        xs = [int(n[i]) for i in idx]
        m, S, Q = len(xs), sum(xs), sum(x * x for x in xs)
        var_num = m * Q - S * S  # = m(m-1) * sample variance, exact
        for i, x in zip(idx, xs):
            d = m * x - S
            if d > 0 and d * d * (m - 1) * 100 > z2_x100 * m * var_num:
                out_sel.append(i)
    sel = pa.array(np.asarray(out_sel, np.int64))
    return grid.take(sel)


HOURLY_ANOMALIES_SQL = f"""
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT MIN(date_trunc('hour', ts)) AS lo,
         MAX(date_trunc('hour', ts)) AS hi
  FROM events
),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM span
),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (
  SELECT types.event_type,
         CAST(epoch_us(hours.h) AS BIGINT) AS hour_us,
         CAST(COALESCE(b.n, 0) AS BIGINT) AS n_events
  FROM types CROSS JOIN hours
  LEFT JOIN b ON b.event_type = types.event_type AND b.h = hours.h
),
s AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS m,
         CAST(SUM(n_events) AS HUGEINT) AS sx,
         CAST(SUM(CAST(n_events AS HUGEINT) * n_events) AS HUGEINT) AS sq
  FROM grid GROUP BY event_type
)
SELECT g.event_type, g.hour_us, g.n_events
FROM grid g JOIN s USING (event_type)
WHERE (s.m * g.n_events - s.sx) > 0
  AND (s.m * g.n_events - s.sx) * (s.m * g.n_events - s.sx)
      * (s.m - 1) * 100
      > {ANOMALY_Z2_X100} * s.m * (s.m * s.sq - s.sx * s.sx)
"""


SLIDING_W_US = 10 * 60 * 1_000_000  # 10-minute time window


def sliding_window_sums(events_ds, window_us: int = SLIDING_W_US,
                        num_partitions: int = 8):
    """Per-event TIME-based sliding-window sum — the RANGE frame
    (``RANGE BETWEEN INTERVAL W PRECEDING AND CURRENT ROW``), distinct
    from :func:`moving_sums`' ROWS frame: the window is defined by the
    timestamp axis, so peers (equal ts) share one result and the row
    count inside the frame varies per event.

    Per-event output over an order-sensitive frame admits no commutative
    partial (the user_event_paths argument), so the one keyed exchange
    carries the event rows; the per-block combine is the classic
    two-pointer pass done vectorized — per user, ``start = searchsorted
    (ts, ts - W, left)`` and ``end = searchsorted(ts, ts, right)`` against
    the user's own sorted timestamps, then ``out = pre[end] - pre[start]``
    off one prefix-sum array: O(n log n) total, the batch-replay twin of
    the O(1)-per-element sliding-window aggregation of the out-of-order
    streams literature (PAPERS.md, ICDE 2025) — arrival order never
    matters because the block sorts by event time before aggregating.
    Exact int64 cents.
    """
    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")), ("win_sum_c", pa.int64()),
    ])

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts": t["ts"],
            "value_c": pa.array(np.round(
                t["value"].combine_chunks().to_numpy(zero_copy_only=False)
                * 100).astype(np.int64), pa.int64()),
        })

    ex = events_ds.map_batches(project, batch_format="pyarrow").repartition(
        num_blocks=num_partitions, keys=["user_id"])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"].combine_chunks(), pa.int64()).to_numpy()
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        vc = t["value_c"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, vc = uid[order], ts[order], eid[order], vc[order]
        n = len(uid)
        pre = np.concatenate([[0], np.cumsum(vc)])
        ustarts = np.concatenate(
            [[0], np.flatnonzero(uid[1:] != uid[:-1]) + 1, [n]])
        out = np.empty(n, np.int64)
        for s, e in zip(ustarts[:-1], ustarts[1:]):
            seg = ts[s:e]
            lo = s + np.searchsorted(seg, seg - window_us, side="left")
            hi = s + np.searchsorted(seg, seg, side="right")
            out[s:e] = pre[hi] - pre[lo]
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "win_sum_c": pa.array(out, pa.int64()),
        }).cast(out_schema)

    return ex.map_batches(combine, batch_format="pyarrow", batch_size=None)


SLIDING_WINDOW_SUMS_SQL = f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id, ts,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
              PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL {SLIDING_W_US // 60_000_000} MINUTES
                    PRECEDING AND CURRENT ROW)
            AS BIGINT) AS win_sum_c
FROM events
"""


def user_event_bigrams(events_ds, num_partitions: int = 16):
    """Markov transition matrix of event types: global counts of adjacent
    (prev_type, next_type) pairs in each user's (ts, event_id)-ordered
    history — the LEAD()-adjacency shape (next-action prediction priors,
    Markov funnel models).

    Adjacency is a property of a user's FULL ordered history, so — like
    sessionize's recurrence — it admits no commutative partial over raw
    rows: ONE keyed exchange on user_id co-locates each history, a
    per-block lexsort + shifted comparison emits pairs vectorized, and
    each block pre-reduces its pairs to dictionary-encoded counts before
    anything returns to the driver.  The driver merge is |types|^2-sized
    (dozens of rows) regardless of corpus size.

    Output: (prev_type, next_type, n_pairs).
    """
    ds = events_ds.repartition(num_blocks=num_partitions, keys=["user_id"])

    out_schema = pa.schema(
        [("prev_type", pa.string()), ("next_type", pa.string()),
         ("n_pairs", pa.int64())]
    )

    def pair_counts(t: pa.Table) -> pa.Table:
        if len(t) < 2:
            return out_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(et.dictionary)
        order = np.lexsort((eid, ts, uid))
        uid_s, codes_s = uid[order], codes[order]
        same = uid_s[1:] == uid_s[:-1]
        prev_c = codes_s[:-1][same]
        next_c = codes_s[1:][same]
        if len(prev_c) == 0:
            return out_schema.empty_table()
        cnt = np.bincount(prev_c * k + next_c, minlength=k * k).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "prev_type": et.dictionary.take(pa.array(nz // k, pa.int64())),
                "next_type": et.dictionary.take(pa.array(nz % k, pa.int64())),
                "n_pairs": pa.array(cnt[nz], pa.int64()),
            }
        ).cast(out_schema)

    partials = ds.map_batches(pair_counts, batch_format="pyarrow", batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables([out_schema.empty_table()] + tabs)
    if len(t) == 0:
        return out_schema.empty_table()
    key = pc.binary_join_element_wise(
        t["prev_type"].combine_chunks().cast(pa.string()),
        t["next_type"].combine_chunks().cast(pa.string()),
        "\x1f",
    ).dictionary_encode()
    codes = key.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.zeros(len(key.dictionary), dtype=np.int64)
    np.add.at(n, codes, t["n_pairs"].combine_chunks().to_numpy(zero_copy_only=False))
    split = pc.split_pattern(key.dictionary, "\x1f")
    prev = pc.list_element(split, 0)
    nxt = pc.list_element(split, 1)
    return pa.table(
        {"prev_type": prev, "next_type": nxt, "n_pairs": pa.array(n, pa.int64())}
    ).cast(out_schema)


USER_EVENT_BIGRAMS_SQL = """
WITH seq AS (
  SELECT event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM seq
WHERE next_type IS NOT NULL
GROUP BY prev_type, next_type
"""


def new_users_curve(events_ds, num_partitions: int = 16):
    """Cumulative-distinct growth curve: per epoch-day, how many users
    appear for the FIRST time, and the running distinct-user total — the
    ``COUNT(DISTINCT ...) OVER (ORDER BY day)`` shape (corpus/dedup growth
    curves at crawl scale).

    Cumulative distinct has no per-day commutative partial over raw rows,
    but per-user MIN(day) is mergeable: blocks pre-reduce to one
    (user, min_day) row each, ONE keyed exchange on user_id makes the min
    final per partition, each partition re-reduces to day-sized counts,
    and the driver's merge + cumsum touches |days| rows only.  The event
    log itself never moves unaggregated.

    Output: (day [epoch-day], new_users, cum_users), sorted by day.
    """
    part_schema = pa.schema([("user_id", pa.int64()), ("day", pa.int64())])

    def user_min_day(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        day = (
            t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        order = np.lexsort((day, uid))
        uid_s, day_s = uid[order], day[order]
        first = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        return pa.table(
            {"user_id": pa.array(uid_s[first], pa.int64()),
             "day": pa.array(day_s[first], pa.int64())}
        )

    ds = events_ds.map_batches(user_min_day, batch_format="pyarrow")
    ds = ds.repartition(num_blocks=num_partitions, keys=["user_id"])

    day_schema = pa.schema([("day", pa.int64()), ("new_users", pa.int64())])

    def day_counts(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return day_schema.empty_table()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid_s, day_s = uid[order], day[order]
        first = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        fdays = np.sort(day_s[first])
        brk = np.concatenate(([True], fdays[1:] != fdays[:-1]))
        starts = np.flatnonzero(brk)
        cnt = np.diff(np.append(starts, len(fdays)))
        return pa.table(
            {"day": pa.array(fdays[starts], pa.int64()),
             "new_users": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    partials = ds.map_batches(day_counts, batch_format="pyarrow", batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables([day_schema.empty_table()] + tabs)
    out_schema = pa.schema(
        [("day", pa.int64()), ("new_users", pa.int64()), ("cum_users", pa.int64())]
    )
    if len(t) == 0:
        return out_schema.empty_table()
    day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
    nu = t["new_users"].combine_chunks().to_numpy(zero_copy_only=False)
    udays = np.unique(day)
    tot = np.zeros(len(udays), dtype=np.int64)
    np.add.at(tot, np.searchsorted(udays, day), nu)
    return pa.table(
        {
            "day": pa.array(udays, pa.int64()),
            "new_users": pa.array(tot, pa.int64()),
            "cum_users": pa.array(np.cumsum(tot), pa.int64()),
        }
    ).cast(out_schema)


NEW_USERS_CURVE_SQL = """
WITH f AS (
  SELECT user_id,
         MIN(CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400) AS day
  FROM events GROUP BY user_id
)
SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users,
       CAST(SUM(COUNT(*)) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM f
GROUP BY day
ORDER BY day
"""
