"""Ordered-event funnel: users who purchased strictly after their first
signup, grouped by signup day.

The sequence predicate ``EXISTS purchase AFTER first signup`` collapses to
a fully mergeable per-user partial — ``(min signup_ts, max purchase_ts)``
— because ``exists p: p.ts > min(s.ts)  <=>  max(p.ts) > min(s.ts)``.
So the wide side is NEVER shuffled: each block pre-reduces its events to
at most one row per distinct user (sentinel-coded min/max int64), and only
those partials ride the ONE keyed exchange.  At 100 TB of events with a
bounded user universe this moves |users| x 24 bytes, not the event log.

Day-grain rollup after the per-user merge is driver-merged (days are few).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_US_PER_DAY = 86_400_000_000
_SENT_MIN = np.iinfo(np.int64).max  # "no signup seen"
_SENT_MAX = np.iinfo(np.int64).min  # "no purchase seen"

_PARTIAL_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("min_s", pa.int64()), ("max_p", pa.int64()),
])


def _empty_partial() -> pa.Table:
    return pa.table({
        "user_id": pa.array([], pa.int64()),
        "min_s": pa.array([], pa.int64()),
        "max_p": pa.array([], pa.int64()),
    })


def funnel_conversions(events_ds, num_partitions: int = 8) -> pa.Table:
    """-> (signup_day date32, n_signup_users, n_converted): per first-signup
    day, how many users signed up and how many purchased strictly after."""

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        keep = pc.is_in(et, value_set=pa.array(["signup", "purchase"]))
        t = t.filter(keep)
        if len(t) == 0:
            return _empty_partial()
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = (t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view(np.int64))
        is_signup = np.asarray(
            pc.equal(t["event_type"].combine_chunks(), "signup"))
        uu, inv = np.unique(uid, return_inverse=True)
        min_s = np.full(len(uu), _SENT_MIN, np.int64)
        max_p = np.full(len(uu), _SENT_MAX, np.int64)
        np.minimum.at(min_s, inv[is_signup], ts[is_signup])
        np.maximum.at(max_p, inv[~is_signup], ts[~is_signup])
        return pa.table({
            "user_id": pa.array(uu, pa.int64()),
            "min_s": pa.array(min_s, pa.int64()),
            "max_p": pa.array(max_p, pa.int64()),
        })

    parts = events_ds.map_batches(
        partial, batch_format="pyarrow"
    ).repartition(num_blocks=num_partitions, keys=["user_id"])

    def day_rollup(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "n_signup_users": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
            })
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ms = t["min_s"].combine_chunks().to_numpy(zero_copy_only=False)
        mp = t["max_p"].combine_chunks().to_numpy(zero_copy_only=False)
        uu, inv = np.unique(uid, return_inverse=True)
        min_s = np.full(len(uu), _SENT_MIN, np.int64)
        max_p = np.full(len(uu), _SENT_MAX, np.int64)
        np.minimum.at(min_s, inv, ms)
        np.maximum.at(max_p, inv, mp)
        signed = min_s != _SENT_MIN
        min_s, max_p = min_s[signed], max_p[signed]
        day = min_s // _US_PER_DAY
        conv = max_p > min_s
        ud, dinv = np.unique(day, return_inverse=True)
        n_u = np.bincount(dinv, minlength=len(ud)).astype(np.int64)
        n_c = np.bincount(dinv, weights=conv, minlength=len(ud)).astype(
            np.int64)
        return pa.table({
            "day": pa.array(ud, pa.int64()),
            "n_signup_users": pa.array(n_u, pa.int64()),
            "n_converted": pa.array(n_c, pa.int64()),
        })

    rolled = parts.map_batches(day_rollup, batch_format="pyarrow")
    t = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in rolled.iter_batches(batch_format="pyarrow")
    )
    day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
    ud, dinv = np.unique(day, return_inverse=True)
    n_u = np.zeros(len(ud), np.int64)
    n_c = np.zeros(len(ud), np.int64)
    np.add.at(n_u, dinv, t["n_signup_users"].to_numpy(zero_copy_only=False))
    np.add.at(n_c, dinv, t["n_converted"].to_numpy(zero_copy_only=False))
    return pa.table({
        # midnight timestamp, not date32: pandas maps date32 to python date
        # objects while DuckDB DATE maps to datetime64 — the value-hash gate
        # compares their str() forms
        "signup_day": pa.array(ud * _US_PER_DAY, pa.timestamp("us")),
        "n_signup_users": pa.array(n_u, pa.int64()),
        "n_converted": pa.array(n_c, pa.int64()),
    })


FUNNEL_CONVERSIONS_SQL = """
WITH s AS (
  SELECT user_id, min(ts) AS ms
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT user_id, max(ts) AS mp
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT CAST(s.ms AS DATE) AS signup_day,
       CAST(count(*) AS BIGINT) AS n_signup_users,
       CAST(coalesce(sum(CASE WHEN p.mp > s.ms THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_converted
FROM s LEFT JOIN p USING (user_id)
GROUP BY 1
"""
