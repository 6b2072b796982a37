"""As-of join: each left row picks up the latest right row at-or-before
its timestamp, per key — the canonical time-series join Ray Data has no
native operator for (reference has no joins at all, SURVEY.md §2.4).

Implementation is the engine's standard exchange shape: tag-union both
sides into one schema, ONE keyed repartition on the join key co-locates
every key's rows, then a vectorized per-block merge (lexsort + per-key
``np.searchsorted``) emits matches.  No ``Dataset.join`` (see
pipelines.neardup: its finalize breaks on schema-less empty partitions),
no driver state.

Partitioning assumption (documented per SURVEY §2.10): all rows of one
key fit in one block — the same assumption every keyed stage here makes;
a key whose history exceeds block budget would need range-bucketed
sub-splitting with boundary carry (the S4 pattern)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(left_ds, right_ds, key: str, left_ts: str, right_ts: str,
              right_cols: list[str], num_partitions: int = 8):
    """Inner as-of join: left rows joined to the latest right row with
    ``right_ts <= left_ts`` for the same ``key``; left rows with no prior
    right row are dropped (inner semantics, matching DuckDB ``ASOF JOIN``).

    Result columns: every left column, plus ``right_cols`` from the
    matched right row.
    """
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    lnames = list(left_schema.names)
    ltypes = dict(zip(left_schema.names, left_schema.types))
    rtypes = dict(zip(right_schema.names, right_schema.types))

    fields = [("jkey", pa.int64()), ("jts", pa.int64()), ("tag", pa.int8())]
    fields += [(f"l_{c}", ltypes[c]) for c in lnames]
    fields += [(f"r_{c}", rtypes[c]) for c in right_cols]
    schema = pa.schema(fields)

    def left_side(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {
            "jkey": pa.compute.cast(t[key], pa.int64()),
            "jts": pa.compute.cast(t[left_ts], pa.int64()),
            "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
            **{f"l_{c}": t[c] for c in lnames},
            **{f"r_{c}": pa.nulls(n, rtypes[c]) for c in right_cols},
        }
        return pa.table({f.name: cols[f.name] for f in schema}).cast(schema)

    def right_side(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {
            "jkey": pa.compute.cast(t[key], pa.int64()),
            "jts": pa.compute.cast(t[right_ts], pa.int64()),
            "tag": pa.array(np.ones(n, np.int8), pa.int8()),
            **{f"l_{c}": pa.nulls(n, ltypes[c]) for c in lnames},
            **{f"r_{c}": t[c] for c in right_cols},
        }
        return pa.table({f.name: cols[f.name] for f in schema}).cast(schema)

    mixed = left_ds.map_batches(left_side, batch_format="pyarrow").union(
        right_ds.map_batches(right_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    out_fields = [(c, ltypes[c]) for c in lnames] + [
        (c, rtypes[c]) for c in right_cols
    ]
    out_schema = pa.schema(out_fields)

    def merge_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["jts"].combine_chunks().to_numpy(zero_copy_only=False)
        lsel = np.flatnonzero(tag == 0)
        rsel = np.flatnonzero(tag == 1)
        if len(lsel) == 0 or len(rsel) == 0:
            return out_schema.empty_table()
        lk, lt = k[lsel], ts[lsel]
        rk, rt = k[rsel], ts[rsel]
        lorder = np.lexsort((lt, lk))
        rorder = np.lexsort((rt, rk))
        lk, lt = lk[lorder], lt[lorder]
        rk, rt = rk[rorder], rt[rorder]
        # per-key merge: for each left key segment, searchsorted into the
        # right key segment (keys per block are bounded by the exchange)
        match = np.full(len(lk), -1, dtype=np.int64)
        lstarts = np.concatenate([[0], np.flatnonzero(lk[1:] != lk[:-1]) + 1, [len(lk)]])
        rkeys_sorted = rk
        for a, b in zip(lstarts[:-1], lstarts[1:]):
            key_val = lk[a]
            r0 = np.searchsorted(rkeys_sorted, key_val, side="left")
            r1 = np.searchsorted(rkeys_sorted, key_val, side="right")
            if r0 == r1:
                continue
            idx = np.searchsorted(rt[r0:r1], lt[a:b], side="right") - 1
            ok = idx >= 0
            match[a:b][ok] = r0 + idx[ok]
        hit = np.flatnonzero(match >= 0)
        if len(hit) == 0:
            return out_schema.empty_table()
        lrows = pa.array(lsel[lorder][hit], pa.int64())
        rrows = pa.array(rsel[rorder][match[hit]], pa.int64())
        cols = {}
        for c in lnames:
            cols[c] = t[f"l_{c}"].combine_chunks().take(lrows)
        for c in right_cols:
            cols[c] = t[f"r_{c}"].combine_chunks().take(rrows)
        return pa.table({f.name: cols[f.name] for f in out_schema}).cast(out_schema)

    return mixed.map_batches(merge_block, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# Q3-shape three-table join: customer (semi, broadcast) x orders x lineitem
# --------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_K = 10


def order_revenue_topk(customer_ds, orders_ds, lineitem_ds, *,
                       segment: str = Q3_SEGMENT, cutoff: str = Q3_CUTOFF,
                       k: int = Q3_K, num_partitions: int = 8):
    """TPC-H-Q3 shape: top-k orders by lineitem revenue for one market
    segment — the canonical small x big x biggest join, composed from the
    engine's three join idioms in one pipeline:

    - customer side = BROADCAST SEMI-JOIN: the segment-filtered custkey
      set ships once via ``ray.put`` (8 B/key sorted u64; membership is a
      ``searchsorted``) — never a shuffle.  Scale note: at 100 TB this
      side is |customers in segment| keys, ~0.8 GB per 100 M matching
      customers — still broadcastable; beyond that it becomes the
      tag-union exchange below with orders.
    - orders x lineitem = TAG-UNION + ONE KEYED EXCHANGE on orderkey
      (big x big; same shape as :func:`asof_join`), with lineitem revenue
      PARTIAL-AGGREGATED per block before the exchange so the shuffle
      moves (orderkey, partial_sum) rows, not raw lineitems.
    - top-k = per-block local top-k, then a final sort+limit over the
      k x blocks survivors (driver-sized by construction).

    Revenue is exact int64 1e-4-dollar units (2-decimal inputs), so the
    sum is bit-identical under any block split / summation order.
    Ordering ties at the k boundary break by ascending orderkey on both
    the Ray and SQL sides.
    """
    import ray

    cutoff_us = np.int64(np.datetime64(cutoff, "us").astype(np.int64))

    # ---- build side: sorted custkeys of the segment, broadcast once ----
    ck_parts = [
        b["c_custkey"].to_numpy(zero_copy_only=False)
        for b in customer_ds.map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], segment)).select(
                ["c_custkey"]
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    ck = np.sort(np.concatenate(ck_parts)) if ck_parts else np.empty(0, np.int64)
    ck_ref = ray.put(ck)

    schema = pa.schema(
        [("jkey", pa.int64()), ("tag", pa.int8()), ("rev_u4", pa.int64()),
         ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())]
    )

    def lineitem_partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sel = np.flatnonzero(ship > cutoff_us)
        if len(sel) == 0:
            return schema.empty_table()
        take = pa.array(sel, pa.int64())
        okey = t["l_orderkey"].combine_chunks().take(take).to_numpy(
            zero_copy_only=False
        )
        price = t["l_extendedprice"].combine_chunks().take(take).to_numpy(
            zero_copy_only=False
        )
        disc = t["l_discount"].combine_chunks().take(take).to_numpy(
            zero_copy_only=False
        )
        rev = np.round(price * 100).astype(np.int64) * (
            100 - np.round(disc * 100).astype(np.int64)
        )
        order = np.argsort(okey, kind="stable")
        okey_s, rev_s = okey[order], rev[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(okey_s[1:] != okey_s[:-1]) + 1]
        )
        n = len(starts)
        return pa.table(
            {
                "jkey": pa.array(okey_s[starts], pa.int64()),
                "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
                "rev_u4": pa.array(np.add.reduceat(rev_s, starts), pa.int64()),
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "o_orderpriority": pa.nulls(n, pa.string()),
            }
        ).cast(schema)

    def orders_side(t: pa.Table) -> pa.Table:
        odate = t["o_orderdate"].combine_chunks()
        odate_us = odate.cast(pa.int64()).to_numpy(zero_copy_only=False)
        cust = t["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        keys = ray.get(ck_ref)
        if len(keys) == 0:
            return schema.empty_table()
        pos = np.searchsorted(keys, cust)
        member = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == cust)
        sel = np.flatnonzero(member & (odate_us < cutoff_us))
        if len(sel) == 0:
            return schema.empty_table()
        take = pa.array(sel, pa.int64())
        n = len(sel)
        return pa.table(
            {
                "jkey": t["o_orderkey"].combine_chunks().take(take),
                "tag": pa.array(np.ones(n, np.int8), pa.int8()),
                "rev_u4": pa.array(np.zeros(n, np.int64), pa.int64()),
                "o_orderdate": odate.take(take),
                "o_orderpriority": t["o_orderpriority"].combine_chunks().take(take),
            }
        ).cast(schema)

    mixed = lineitem_ds.map_batches(
        lineitem_partial, batch_format="pyarrow"
    ).union(orders_ds.map_batches(orders_side, batch_format="pyarrow"))
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    out_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
         ("o_orderpriority", pa.string()), ("revenue_u4", pa.int64())]
    )

    def combine_topk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        jkey = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = t["rev_u4"].combine_chunks().to_numpy(zero_copy_only=False)
        # tag asc within key: lineitem partials first, the (unique) order
        # row last — so a group is an inner match iff first is tag 0 and
        # last is tag 1
        order = np.lexsort((tag, jkey))
        jk, tg, rv = jkey[order], tag[order], rev[order]
        starts = np.concatenate([[0], np.flatnonzero(jk[1:] != jk[:-1]) + 1])
        ends = np.append(starts[1:], len(jk)) - 1
        match = (tg[starts] == 0) & (tg[ends] == 1)
        if not match.any():
            return out_schema.empty_table()
        rev_sum = np.add.reduceat(rv, starts)[match]  # order rows carry rev 0
        topk = np.lexsort((jk[starts][match], -rev_sum))[:k]
        sel = pa.array(np.asarray(order)[ends[match]][topk], pa.int64())
        return pa.table(
            {
                "l_orderkey": pa.array(jk[starts][match][topk], pa.int64()),
                "o_orderdate": t["o_orderdate"].combine_chunks().take(sel),
                "o_orderpriority": t["o_orderpriority"].combine_chunks().take(sel),
                "revenue_u4": pa.array(rev_sum[topk], pa.int64()),
            }
        ).cast(out_schema)

    out = mixed.map_batches(combine_topk, batch_format="pyarrow", batch_size=None)
    # final top-k over the k x blocks survivors: driver-sized by
    # construction (<= k * num_partitions rows), so a Dataset.sort
    # exchange here would cost a full extra shuffle round for nothing
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in out.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables([t for t in tabs if len(t)] or [out_schema.empty_table()])
    rev = t["revenue_u4"].combine_chunks().to_numpy(zero_copy_only=False)
    okey = t["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
    sel = pa.array(np.lexsort((okey, -rev))[:k], pa.int64())
    return t.take(sel).cast(out_schema)


ORDER_REVENUE_TOPK_SQL = f"""
SELECT l.l_orderkey,
       o.o_orderdate,
       o.o_orderpriority,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_u4
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY 1, 2, 3
ORDER BY revenue_u4 DESC, l.l_orderkey ASC
LIMIT {Q3_K}
"""


# --------------------------------------------------------------------------
# Anti-join: left rows whose key never appears on the right
# --------------------------------------------------------------------------


def anti_join(left_ds, right_ds, left_key: str, right_key: str,
              keep_cols: list[str], num_partitions: int = 8):
    """Distributed anti-join (``WHERE key NOT IN (SELECT ... )``): emit
    the ``keep_cols`` of every left row whose key has NO match on the
    right — the existence-check join class (Q22 shape) the engine lacked.

    Shape: the right side is pre-reduced to DISTINCT keys per block
    *before* the exchange (the partial-aggregation rule — the probe side
    may be arbitrarily larger than its key universe), then one tag-union
    keyed repartition co-locates each key's left rows with its right
    evidence, and a vectorized per-block ``searchsorted`` membership test
    emits the survivors.  No broadcast (both sides may be huge), no
    ``Dataset.join``.
    """
    ltypes = dict(zip(left_ds.schema().names, left_ds.schema().types))
    fields = [("jkey", pa.int64()), ("tag", pa.int8())]
    fields += [(f"l_{c}", ltypes[c]) for c in keep_cols]
    schema = pa.schema(fields)

    def left_side(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {
            "jkey": pc.cast(t[left_key], pa.int64()),
            "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
            **{f"l_{c}": t[c] for c in keep_cols},
        }
        return pa.table({f.name: cols[f.name] for f in schema}).cast(schema)

    def right_side(t: pa.Table) -> pa.Table:
        keys = pc.unique(pc.cast(t[right_key], pa.int64()))
        n = len(keys)
        cols = {
            "jkey": keys,
            "tag": pa.array(np.ones(n, np.int8), pa.int8()),
            **{f"l_{c}": pa.nulls(n, ltypes[c]) for c in keep_cols},
        }
        return pa.table({f.name: cols[f.name] for f in schema}).cast(schema)

    mixed = left_ds.map_batches(left_side, batch_format="pyarrow").union(
        right_ds.map_batches(right_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    out_schema = pa.schema([(c, ltypes[c]) for c in keep_cols])

    def survivors(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        lsel = np.flatnonzero(tag == 0)
        if len(lsel) == 0:
            return out_schema.empty_table()
        present = np.unique(k[tag == 1])
        sel = pa.array(lsel[~np.isin(k[lsel], present)], pa.int64())
        return pa.table(
            {c: t[f"l_{c}"].combine_chunks().take(sel) for c in keep_cols}
        ).cast(out_schema)

    return mixed.map_batches(survivors, batch_format="pyarrow", batch_size=None)


INACTIVE_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""

def large_orders(orders_ds, lineitem_ds, min_qty: int = 100,
                 num_partitions: int = 8):
    """TPC-H-Q18-shape groupby-HAVING join: orders whose lineitems sum to
    more than ``min_qty`` units, with the total attached.

    Shape: the fact side pre-aggregates per block (one row per (block,
    orderkey) — the partial-aggregation rule), then ONE tag-union keyed
    exchange on orderkey co-locates each order's partial sums with its
    orders row, and a vectorized per-block combine applies the HAVING
    filter and attaches order attributes.  No broadcast (the HAVING
    survivor set's size is data-dependent, so neither side is assumed
    driver-small), no ``Dataset.join``.  Quantities accumulate in exact
    integer centi-units so the result is bit-identical under any
    partitioning (reference has no joins/aggregates — SURVEY.md §2.4/2.5).
    """
    schema = pa.schema([
        ("jkey", pa.int64()), ("tag", pa.int8()), ("qty_c", pa.int64()),
        ("o_custkey", pa.int64()), ("o_totalprice", pa.float64()),
    ])

    def lineitem_partial(t: pa.Table) -> pa.Table:
        k = pc.cast(t["l_orderkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        q = t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        qc = np.round(q * 100).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k, qc = k[order], qc[order]
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1]) if len(k) else np.empty(0, np.int64)
        sums = np.add.reduceat(qc, starts) if len(k) else np.empty(0, np.int64)
        n = len(starts)
        return pa.table({
            "jkey": pa.array(k[starts] if len(k) else [], pa.int64()),
            "tag": pa.array(np.ones(n, np.int8), pa.int8()),
            "qty_c": pa.array(sums, pa.int64()),
            "o_custkey": pa.nulls(n, pa.int64()),
            "o_totalprice": pa.nulls(n, pa.float64()),
        }).cast(schema)

    def orders_side(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "jkey": pc.cast(t["o_orderkey"], pa.int64()),
            "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
            "qty_c": pa.nulls(n, pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "o_totalprice": pc.cast(t["o_totalprice"], pa.float64()),
        }).cast(schema)

    mixed = lineitem_ds.map_batches(lineitem_partial, batch_format="pyarrow").union(
        orders_ds.map_batches(orders_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    out_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_totalprice", pa.float64()), ("sum_qty", pa.float64()),
    ])
    thresh_c = min_qty * 100

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        lin = tag == 1
        lk = k[lin]
        if len(lk) == 0:
            return out_schema.empty_table()
        lc = t["qty_c"].combine_chunks().to_numpy(zero_copy_only=False)[lin]
        order = np.argsort(lk, kind="stable")
        lk, lc = lk[order], lc[order]
        starts = np.concatenate([[0], np.flatnonzero(lk[1:] != lk[:-1]) + 1])
        sums = np.add.reduceat(lc, starts)
        keys = lk[starts]
        keep = sums > thresh_c
        keys, sums = keys[keep], sums[keep]
        osel = np.flatnonzero(tag == 0)
        if len(keys) == 0 or len(osel) == 0:
            return out_schema.empty_table()
        ok = k[osel]
        pos = np.searchsorted(keys, ok)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = keys[pos_c] == ok
        osel, pos_c = osel[hit], pos_c[hit]
        sel = pa.array(osel, pa.int64())
        return pa.table({
            "o_orderkey": pa.array(ok[hit], pa.int64()),
            "o_custkey": t["o_custkey"].combine_chunks().take(sel),
            "o_totalprice": t["o_totalprice"].combine_chunks().take(sel),
            "sum_qty": pa.array(sums[pos_c] / 100.0, pa.float64()),
        }).cast(out_schema)

    return mixed.map_batches(combine, batch_format="pyarrow", batch_size=None)


LARGE_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_qty
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_custkey, o_totalprice
HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > 100 * 100
"""


def exists_order_counts(orders_ds, lineitem_ds, min_qty: float = 45.0,
                        num_partitions: int = 8):
    """Correlated-EXISTS semi-join + group count (TPC-H Q4 shape): how
    many orders per priority have at least one lineitem with quantity
    above ``min_qty``.

    Shape: the evidence side is filtered *at the read* (caller pushes the
    quantity predicate into the parquet scan) and pre-reduced to DISTINCT
    orderkeys per block, one tag-union keyed exchange co-locates each
    order with its evidence, a per-block ``isin`` keeps orders whose key
    has evidence (semi-join — each order counted once no matter how many
    matching lineitems), and per-block (priority, count) partials merge on
    the driver (|priorities| x partitions rows).  Complements
    :func:`anti_join` (NOT EXISTS) with the EXISTS half of the existence
    class; reference has no joins (SURVEY.md §2.4).
    """
    schema = pa.schema([
        ("jkey", pa.int64()), ("tag", pa.int8()),
        ("o_orderpriority", pa.string()),
    ])

    def orders_side(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "jkey": pc.cast(t["o_orderkey"], pa.int64()),
            "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
            "o_orderpriority": t["o_orderpriority"],
        }).cast(schema)

    def evidence_side(t: pa.Table) -> pa.Table:
        keys = pc.unique(pc.cast(t["l_orderkey"], pa.int64()))
        n = len(keys)
        return pa.table({
            "jkey": keys,
            "tag": pa.array(np.ones(n, np.int8), pa.int8()),
            "o_orderpriority": pa.nulls(n, pa.string()),
        }).cast(schema)

    mixed = orders_ds.map_batches(orders_side, batch_format="pyarrow").union(
        lineitem_ds.map_batches(evidence_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    def partial_counts(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "o_orderpriority": pa.array([], pa.string()),
            "order_count": pa.array([], pa.int64()),
        })
        if len(t) == 0:
            return empty
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        osel = np.flatnonzero(tag == 0)
        present = np.unique(k[tag == 1])
        hit = osel[np.isin(k[osel], present)]
        if len(hit) == 0:
            return empty
        pri = t["o_orderpriority"].combine_chunks().take(pa.array(hit, pa.int64()))
        enc = pri.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({
            "o_orderpriority": enc.dictionary,
            "order_count": pa.array(cnt, pa.int64()),
        })

    partials = mixed.map_batches(partial_counts, batch_format="pyarrow",
                                 batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    pri = t["o_orderpriority"].combine_chunks()
    enc = pri.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.zeros(len(enc.dictionary), dtype=np.int64)
    np.add.at(n, codes, t["order_count"].combine_chunks().to_numpy(zero_copy_only=False))
    return pa.table({
        "o_orderpriority": enc.dictionary,
        "order_count": pa.array(n, pa.int64()),
    })


EXISTS_ORDER_COUNTS_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_quantity > 45
)
GROUP BY o_orderpriority
"""


def customer_order_counts(customer_ds, orders_ds, num_partitions: int = 8):
    """Order-count distribution over customers (TPC-H Q13 shape: LEFT
    OUTER JOIN + two-level group): for each order count ``c_count``, how
    many customers placed exactly that many orders.

    Shape: the fact side pre-counts per (block, custkey), ONE keyed
    exchange on custkey finalizes per-customer counts, each partition
    bincounts its counts into a (c_count, custdist) partial, and the
    driver merges |distinct counts| x partitions rows.  The LEFT-JOIN
    zero bucket never touches the customer table's rows: customers with
    no orders = ``customer.count()`` (metadata-only at the parquet read)
    minus the distinct custkeys seen in orders — the FK (every o_custkey
    is a customer) stands in for the outer join, so the wide side of the
    join is never shuffled at all.
    """
    n_customers = customer_ds.count()

    def order_partial(t: pa.Table) -> pa.Table:
        k = pc.cast(t["o_custkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        u, c = np.unique(k, return_counts=True)
        return pa.table({
            "custkey": pa.array(u, pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
        })

    ds = orders_ds.map_batches(order_partial, batch_format="pyarrow")
    ds = ds.repartition(num_blocks=num_partitions, keys=["custkey"])

    def dist_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "c_count": pa.array([], pa.int64()),
            "custdist": pa.array([], pa.int64()),
        })
        if len(t) == 0:
            return empty
        k = t["custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, n = k[order], n[order]
        starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
        counts = np.add.reduceat(n, starts)
        u, c = np.unique(counts, return_counts=True)
        return pa.table({
            "c_count": pa.array(u, pa.int64()),
            "custdist": pa.array(c.astype(np.int64), pa.int64()),
        })

    partials = ds.map_batches(dist_partial, batch_format="pyarrow",
                              batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    cc = t["c_count"].to_numpy(zero_copy_only=False)
    cd = t["custdist"].to_numpy(zero_copy_only=False)
    u, inv = np.unique(cc, return_inverse=True)
    dist = np.zeros(len(u), dtype=np.int64)
    np.add.at(dist, inv, cd)
    zero_bucket = n_customers - int(dist.sum())
    if zero_bucket > 0:
        u = np.concatenate([[0], u])
        dist = np.concatenate([[zero_bucket], dist])
    return pa.table({
        "c_count": pa.array(u, pa.int64()),
        "custdist": pa.array(dist, pa.int64()),
    })


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def below_avg_revenue(lineitem_ds, num_partitions: int = 8):
    """Correlated scalar-subquery shape (TPC-H Q17): revenue from
    lineitems whose quantity is below HALF their part's average quantity.

    The classic plan is a self-join against a per-group aggregate; here
    both legs ride ONE tag-union keyed exchange — every block sends its
    raw (partkey, qty, price) rows AND its per-part partial (sum, count),
    the combine folds the partials into exact per-part totals and filters
    the co-located rows with the integer cross-multiplied predicate
    ``2 * qty * cnt < sum_qty`` (no division, no floats — bit-identical
    under any partitioning).  Output is the single global (revenue_c,
    n_items) row from driver-merged block partials.
    """
    schema = pa.schema([
        ("jkey", pa.int64()), ("tag", pa.int8()),
        ("qty_c", pa.int64()), ("price_c", pa.int64()), ("cnt", pa.int64()),
    ])

    def both_sides(t: pa.Table) -> pa.Table:
        k = pc.cast(t["l_partkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        qc = np.round(
            t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        prc = np.round(
            t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        # leg 1: the raw rows
        n = len(k)
        # leg 2: this block's per-part partial (sum_qty_c, cnt)
        u, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, qc)
        c = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({
            "jkey": pa.array(np.concatenate([k, u]), pa.int64()),
            "tag": pa.array(
                np.concatenate([np.zeros(n, np.int8), np.ones(len(u), np.int8)]),
                pa.int8()),
            "qty_c": pa.array(np.concatenate([qc, s]), pa.int64()),
            "price_c": pa.array(np.concatenate([prc, np.zeros(len(u), np.int64)]),
                                pa.int64()),
            "cnt": pa.array(np.concatenate([np.zeros(n, np.int64), c]), pa.int64()),
        }).cast(schema)

    mixed = lineitem_ds.map_batches(both_sides, batch_format="pyarrow")
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    def combine(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "revenue_c": pa.array([], pa.int64()),
            "n_items": pa.array([], pa.int64()),
        })
        if len(t) == 0:
            return empty
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        qc = t["qty_c"].combine_chunks().to_numpy(zero_copy_only=False)
        agg = tag == 1
        ak, aq = k[agg], qc[agg]
        ac = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)[agg]
        u, inv = np.unique(ak, return_inverse=True)
        tot_q = np.zeros(len(u), dtype=np.int64)
        tot_c = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot_q, inv, aq)
        np.add.at(tot_c, inv, ac)
        rows = np.flatnonzero(~agg)
        if len(rows) == 0:
            return empty
        pos = np.searchsorted(u, k[rows])
        keep = 2 * qc[rows] * tot_c[pos] < tot_q[pos]
        prc = t["price_c"].combine_chunks().to_numpy(zero_copy_only=False)[rows][keep]
        return pa.table({
            "revenue_c": pa.array([int(prc.sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64()),
        })

    parts = mixed.map_batches(combine, batch_format="pyarrow", batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in parts.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    return pa.table({
        "revenue_c": pa.array(
            [int(t["revenue_c"].to_numpy(zero_copy_only=False).sum())], pa.int64()),
        "n_items": pa.array(
            [int(t["n_items"].to_numpy(zero_copy_only=False).sum())], pa.int64()),
    })


BELOW_AVG_REVENUE_SQL = """
WITH pavg AS (
  SELECT l_partkey,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN pavg ON lineitem.l_partkey = pavg.l_partkey
WHERE 2 * CAST(round(l_quantity * 100) AS BIGINT) * cnt < sum_qty_c
"""


def full_outer_counts(orders_ds, events_ds, num_partitions: int = 8):
    """FULL OUTER join of two filtered aggregates on the shared id space:
    urgent-order count per customer vs purchase-event count per user ->
    (uid, n_urgent, n_purchase), rows kept when EITHER side has activity.

    Completes the join taxonomy (inner/semi/anti/asof/range/EXISTS/LEFT/
    correlated implemented above): both inputs pre-reduce to per-key count
    partials inside ``map_batches`` (the wide sides are never shuffled),
    the partials tag-union through ONE keyed exchange, and the per-block
    combine emits a row per key with COALESCE(count, 0) on each side —
    the outer semantics cost nothing beyond the inner shape."""
    schema = pa.schema([
        ("uid", pa.int64()), ("side", pa.int8()), ("cnt", pa.int64()),
    ])

    def _count_partial(t: pa.Table, keycol: str, side: int) -> pa.Table:
        if len(t) == 0:
            return schema.empty_table()
        ids = t[keycol].combine_chunks().to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(ids, return_counts=True)
        return pa.table({
            "uid": pa.array(uk, pa.int64()),
            "side": pa.array(np.full(len(uk), side, np.int8), pa.int8()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        }).cast(schema)

    def orders_side(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderpriority"].combine_chunks(), "1-URGENT")
        return _count_partial(t.filter(keep), "o_custkey", 0)

    def events_side(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["event_type"].combine_chunks(), "purchase")
        return _count_partial(t.filter(keep), "user_id", 1)

    mixed = orders_ds.map_batches(orders_side, batch_format="pyarrow").union(
        events_ds.map_batches(events_side, batch_format="pyarrow")
    ).repartition(num_blocks=num_partitions, keys=["uid"])

    out_schema = pa.schema([
        ("uid", pa.int64()), ("n_urgent", pa.int64()),
        ("n_purchase", pa.int64()),
    ])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        uid = t["uid"].combine_chunks().to_numpy(zero_copy_only=False)
        side = t["side"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        uk, inv = np.unique(uid, return_inverse=True)
        n_u = np.zeros(len(uk), np.int64)
        n_p = np.zeros(len(uk), np.int64)
        np.add.at(n_u, inv[side == 0], cnt[side == 0])
        np.add.at(n_p, inv[side == 1], cnt[side == 1])
        return pa.table({
            "uid": pa.array(uk, pa.int64()),
            "n_urgent": pa.array(n_u, pa.int64()),
            "n_purchase": pa.array(n_p, pa.int64()),
        }).cast(out_schema)

    return mixed.map_batches(combine, batch_format="pyarrow",
                             batch_size=None)


FULL_OUTER_COUNTS_SQL = """
SELECT COALESCE(o.k, e.k) AS uid,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_urgent,
       CAST(COALESCE(e.n, 0) AS BIGINT) AS n_purchase
FROM (SELECT o_custkey AS k, count(*) AS n FROM orders
      WHERE o_orderpriority = '1-URGENT' GROUP BY 1) o
FULL OUTER JOIN
     (SELECT user_id AS k, count(*) AS n FROM events
      WHERE event_type = 'purchase' GROUP BY 1) e
ON o.k = e.k
"""


def waiting_suppliers(orders_ds, lineitem_ds, supplier_tbl: pa.Table, *,
                      late_days: int = 60, num_partitions: int = 8):
    """TPC-H-Q21-shape multi-correlated existence join: per supplier, how
    many finished ('F') multi-supplier orders that supplier alone shipped
    late (last shipment more than ``late_days`` after the order date).

    The shape the engine lacked: EXISTS *and* NOT-EXISTS predicates
    correlated on the SAME fact table, decided per order group.  Plan:

    - lineitem blocks pre-reduce to one row per (block, orderkey,
      suppkey) carrying the mergeable MAX(l_shipdate) partial — "this
      supplier shipped anything late in this order" is
      ``max_ship > o_orderdate + late_days``, so ANY() folds into MAX().
    - orders blocks filter to status 'F' and project (orderkey,
      orderdate).
    - ONE tag-union keyed exchange on orderkey co-locates each order's
      supplier partials with its orders row; the per-block combine merges
      duplicate (orderkey, suppkey) partials (max again — commutative,
      idempotent), counts suppliers and late suppliers per order with
      one reduceat pass, and keeps the (order, supplier) pairs where the
      supplier is late, the order has >= 2 suppliers, and exactly one
      late supplier (the EXISTS + NOT-EXISTS pair evaluated group-local).
    - survivors collapse to (suppkey, numwait) partials — at most
      |suppliers| rows per partition — and the driver merges them and
      attaches s_name from the driver-resident supplier dimension (the
      fact tables never shuffle a string).

    Exact integer microsecond timestamps throughout; bit-identical under
    any partitioning.  Reference has no joins (SURVEY.md §2.4); this is
    the group-local existence class beside anti_join (Q22) and
    exists_order_counts (Q4).
    """
    schema = pa.schema([
        ("jkey", pa.int64()), ("tag", pa.int8()), ("skey", pa.int64()),
        ("ship_us", pa.int64()), ("odate_us", pa.int64()),
    ])

    def lineitem_partial(t: pa.Table) -> pa.Table:
        k = pc.cast(t["l_orderkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        s = pc.cast(t["l_suppkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        ship = pc.cast(t["l_shipdate"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((s, k))
        k, s, ship = k[order], s[order], ship[order]
        if len(k):
            new = (k[1:] != k[:-1]) | (s[1:] != s[:-1])
            starts = np.concatenate([[0], np.flatnonzero(new) + 1])
            mx = np.maximum.reduceat(ship, starts)
        else:
            starts = np.empty(0, np.int64)
            mx = np.empty(0, np.int64)
        n = len(starts)
        return pa.table({
            "jkey": pa.array(k[starts] if n else [], pa.int64()),
            "tag": pa.array(np.ones(n, np.int8), pa.int8()),
            "skey": pa.array(s[starts] if n else [], pa.int64()),
            "ship_us": pa.array(mx, pa.int64()),
            "odate_us": pa.nulls(n, pa.int64()),
        }).cast(schema)

    def orders_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        n = len(t)
        return pa.table({
            "jkey": pc.cast(t["o_orderkey"], pa.int64()),
            "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
            "skey": pa.nulls(n, pa.int64()),
            "ship_us": pa.nulls(n, pa.int64()),
            "odate_us": pc.cast(t["o_orderdate"], pa.int64()),
        }).cast(schema)

    mixed = lineitem_ds.map_batches(lineitem_partial, batch_format="pyarrow").union(
        orders_ds.map_batches(orders_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    late_us = np.int64(late_days) * np.int64(86_400_000_000)
    part_schema = pa.schema([("skey", pa.int64()), ("numwait", pa.int64())])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        lin = tag == 1
        if not lin.any():
            return part_schema.empty_table()
        lk = k[lin]
        # union'd columns carry the other tag's nulls; fill_null keeps the
        # numpy lane int64 (float64 would cap exact integers at 2^53)
        ls = pc.fill_null(t["skey"].combine_chunks(), 0).to_numpy(zero_copy_only=False).astype(np.int64)[lin]
        lship = pc.fill_null(t["ship_us"].combine_chunks(), 0).to_numpy(zero_copy_only=False).astype(np.int64)[lin]
        # merge duplicate (orderkey, suppkey) partials from different
        # source blocks: max is the same fold the block partial used
        order = np.lexsort((ls, lk))
        lk, ls, lship = lk[order], ls[order], lship[order]
        new = (lk[1:] != lk[:-1]) | (ls[1:] != ls[:-1])
        starts = np.concatenate([[0], np.flatnonzero(new) + 1])
        gk = lk[starts]
        gs = ls[starts]
        gship = np.maximum.reduceat(lship, starts)
        # attach the order date of 'F' orders (absent key = not-F order)
        osel = np.flatnonzero(tag == 0)
        if len(osel) == 0:
            return part_schema.empty_table()
        ok = k[osel]
        od = pc.fill_null(t["odate_us"].combine_chunks(), 0).to_numpy(zero_copy_only=False).astype(np.int64)[osel]
        oorder = np.argsort(ok, kind="stable")
        ok, od = ok[oorder], od[oorder]
        pos = np.searchsorted(ok, gk)
        pos_c = np.minimum(pos, len(ok) - 1)
        isf = ok[pos_c] == gk
        gk, gs, gship, pos_c = gk[isf], gs[isf], gship[isf], pos_c[isf]
        if len(gk) == 0:
            return part_schema.empty_table()
        late = gship > od[pos_c] + late_us
        # per-order supplier / late-supplier counts, broadcast to rows
        ostarts = np.concatenate([[0], np.flatnonzero(gk[1:] != gk[:-1]) + 1])
        sizes = np.diff(np.concatenate([ostarts, [len(gk)]]))
        n_supp = np.repeat(sizes, sizes)
        n_late = np.repeat(np.add.reduceat(late.astype(np.int64), ostarts), sizes)
        qual = late & (n_supp >= 2) & (n_late == 1)
        if not qual.any():
            return part_schema.empty_table()
        sk, cnt = np.unique(gs[qual], return_counts=True)
        return pa.table({
            "skey": pa.array(sk, pa.int64()),
            "numwait": pa.array(cnt.astype(np.int64), pa.int64()),
        }).cast(part_schema)

    partials = mixed.map_batches(combine, batch_format="pyarrow",
                                 batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs) if tabs else part_schema.empty_table()
    sk = t["skey"].to_numpy(zero_copy_only=False) if len(t) else np.empty(0, np.int64)
    nw = t["numwait"].to_numpy(zero_copy_only=False) if len(t) else np.empty(0, np.int64)
    uk, inv = np.unique(sk, return_inverse=True)
    tot = np.zeros(len(uk), np.int64)
    np.add.at(tot, inv, nw)
    dim_k = pc.cast(supplier_tbl["s_suppkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    dim_order = np.argsort(dim_k, kind="stable")
    pos = dim_order[np.searchsorted(dim_k[dim_order], uk)]
    names = supplier_tbl["s_name"].combine_chunks().take(pa.array(pos, pa.int64()))
    out = pa.table({
        "s_name": names,
        "numwait": pa.array(tot, pa.int64()),
    })
    return out.sort_by([("numwait", "descending"), ("s_name", "ascending")])


WAITING_SUPPLIERS_SQL = """
WITH lo AS (
  SELECT l_orderkey AS okey, l_suppkey AS skey, MAX(l_shipdate) AS max_ship
  FROM lineitem GROUP BY 1, 2
), j AS (
  SELECT lo.okey, lo.skey,
         (lo.max_ship > o.o_orderdate + INTERVAL 60 DAY) AS late
  FROM lo JOIN orders o ON o.o_orderkey = lo.okey
  WHERE o.o_orderstatus = 'F'
), w AS (
  SELECT okey, skey, late,
         COUNT(*) OVER (PARTITION BY okey) AS n_supp,
         SUM(CASE WHEN late THEN 1 ELSE 0 END) OVER (PARTITION BY okey)
           AS n_late
  FROM j
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM w JOIN supplier ON s_suppkey = skey
WHERE late AND n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


# --------------------------------------------------------------------------
# Q2 shape: min-per-group over pair aggregates + equality join-back
# --------------------------------------------------------------------------

MIN_COST_SIZE = 25


def min_cost_supplier(lineitem_ds, part_tbl: pa.Table,
                      supplier_tbl: pa.Table, nation_tbl: pa.Table,
                      p_size: int = MIN_COST_SIZE, num_partitions: int = 8):
    """TPC-H-Q2 shape: for every part of one size, the supplier(s) whose
    best (minimum) observed sale price equals the part's global minimum —
    the min-over-a-correlated-view + equality-join-back shape (no
    partsupp table in the corpus, so min lineitem extendedprice stands in
    for ps_supplycost; same plan).

    Discipline: the part-size predicate, supplier names and nations fold
    driver-side into dense broadcast arrays; each lineitem block
    pre-reduces to one MIN-price row per (partkey, suppkey) pair —
    pair-sized, not fact-sized; ONE keyed exchange on partkey co-locates
    each part's pairs; the per-partition combine re-mins pairs, takes the
    per-part min and keeps pairs achieving it.  Prices in exact int64
    cents so ties and the min are exact.
    """
    import ray

    pk = part_tbl["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_part = int(pk.max()) + 1 if len(pk) else 0
    size_mask = np.zeros(n_part, bool)
    size_mask[pk] = part_tbl["p_size"].to_numpy(
        zero_copy_only=False).astype(np.int64) == p_size
    sk = supplier_tbl["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_supp = int(sk.max()) + 1 if len(sk) else 0
    names = np.empty(n_supp, dtype=object)
    names[sk] = np.asarray(supplier_tbl["s_name"].to_pylist(), dtype=object)
    snk = supplier_tbl["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    supp_nation = np.full(n_supp, -1, np.int16)
    supp_nation[sk] = snk.astype(np.int16)
    nk = nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nnames = np.empty(int(nk.max()) + 1 if len(nk) else 0, dtype=object)
    nnames[nk] = np.asarray(nation_tbl["n_name"].to_pylist(), dtype=object)
    mask_ref = ray.put(size_mask)

    def pair_partial(t: pa.Table) -> pa.Table:
        m_map = ray.get(mask_ref)
        lpk = t["l_partkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = m_map[lpk]
        lpk = lpk[keep]
        lsk = t["l_suppkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        price = np.round(t["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep] * 100).astype(np.int64)
        order = np.lexsort((lsk, lpk))
        lpk, lsk, price = lpk[order], lsk[order], price[order]
        if len(lpk):
            new = (lpk[1:] != lpk[:-1]) | (lsk[1:] != lsk[:-1])
            starts = np.concatenate([[0], np.flatnonzero(new) + 1])
            mins = np.minimum.reduceat(price, starts)
        else:
            starts = np.empty(0, np.int64)
            mins = np.empty(0, np.int64)
        return pa.table({
            "pk": pa.array(lpk[starts] if len(starts) else [], pa.int64()),
            "sk": pa.array(lsk[starts] if len(starts) else [], pa.int64()),
            "min_u2": pa.array(mins, pa.int64()),
        })

    pairs = lineitem_ds.map_batches(pair_partial, batch_format="pyarrow")
    pairs = pairs.repartition(num_blocks=num_partitions, keys=["pk"])

    out_schema = pa.schema([
        ("p_partkey", pa.int64()), ("s_suppkey", pa.int64()),
        ("s_name", pa.string()), ("s_nation", pa.string()),
        ("min_price_u2", pa.int64()),
    ])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        pkk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        skk = t["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = t["min_u2"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((skk, pkk))
        pkk, skk, mn = pkk[order], skk[order], mn[order]
        new = np.concatenate([[True], (pkk[1:] != pkk[:-1])
                              | (skk[1:] != skk[:-1])])
        starts = np.flatnonzero(new)
        pair_min = np.minimum.reduceat(mn, starts)
        ppk, psk = pkk[starts], skk[starts]
        pnew = np.concatenate([[True], ppk[1:] != ppk[:-1]])
        pstarts = np.flatnonzero(pnew)
        part_min = np.minimum.reduceat(pair_min, pstarts)
        gid = np.cumsum(pnew) - 1
        keep = pair_min == part_min[gid]
        ppk, psk, pair_min = ppk[keep], psk[keep], pair_min[keep]
        return pa.table({
            "p_partkey": pa.array(ppk, pa.int64()),
            "s_suppkey": pa.array(psk, pa.int64()),
            "s_name": pa.array(names[psk].tolist(), pa.string()),
            "s_nation": pa.array(
                nnames[supp_nation[psk]].tolist(), pa.string()),
            "min_price_u2": pa.array(pair_min, pa.int64()),
        }).cast(out_schema)

    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in pairs.map_batches(
            combine, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs) if tabs else out_schema.empty_table()
    return t.sort_by([("p_partkey", "ascending"), ("s_suppkey", "ascending")])


MIN_COST_SUPPLIER_SQL = f"""
WITH pairs AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS min_u2
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_size = {MIN_COST_SIZE}
  GROUP BY 1, 2
)
SELECT pk AS p_partkey, s_suppkey, s_name, n_name AS s_nation,
       min_u2 AS min_price_u2
FROM pairs
JOIN supplier ON s_suppkey = sk
JOIN nation ON n_nationkey = s_nationkey
WHERE min_u2 = (SELECT MIN(min_u2) FROM pairs p2 WHERE p2.pk = pairs.pk)
ORDER BY p_partkey, s_suppkey
"""


# --------------------------------------------------------------------------
# Q22 shape: scalar-subquery threshold + anti-join + segment rollup
# --------------------------------------------------------------------------

# no orders on/after this date = "idle"; every corpus customer has at
# least one order overall, so the never-ordered predicate would be empty
IDLE_CUTOFF = "2000-01-01"


def idle_balance_by_segment(customer_ds, orders_ds,
                            cutoff: str = IDLE_CUTOFF):
    """TPC-H-Q22 shape: count + total balance per market segment of
    customers whose balance is above the average positive balance AND
    who have placed no order since ``cutoff`` — a scalar correlated
    subquery plus a windowed anti-join feeding a rollup (every customer
    in the corpus has *some* order, so the window keeps the anti-join
    non-trivial; same plan as the never-ordered Q22 original).

    Discipline: pass 1 streams customer blocks into a 2-scalar partial
    (sum of positive balances, count) — the above-average predicate
    then evaluates exactly in integers: ``bal_u2 * cnt_pos >
    sum_pos_u2``.  Pass 2 streams orders blocks into per-block distinct
    recent-custkey partials, merged driver-side into one sorted key
    array (customer-dimension-sized) and re-broadcast.  Pass 3 filters
    customer blocks against both (threshold + ``searchsorted`` anti
    membership) and pre-reduces per segment; the driver merges a
    |segments|-row dict.  Zero keyed exchange — every partial is
    scalar-, dim- or segment-sized.
    """
    import ray

    cut_us = np.datetime64(cutoff, "us").astype(np.int64)

    def bal_partial(t: pa.Table) -> pa.Table:
        bal = np.round(t["c_acctbal"].combine_chunks().to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        pos = bal > 0
        return pa.table({
            "sum_pos_u2": pa.array([int(bal[pos].sum())], pa.int64()),
            "cnt_pos": pa.array([int(pos.sum())], pa.int64()),
        })

    sum_pos = 0
    cnt_pos = 0
    for b in customer_ds.map_batches(
            bal_partial, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        # iter_batches may coalesce several 1-row block partials into one
        # batch — sum the column, never read just row 0
        sum_pos += int(t["sum_pos_u2"].to_numpy(zero_copy_only=False).sum())
        cnt_pos += int(t["cnt_pos"].to_numpy(zero_copy_only=False).sum())

    def custkey_partial(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ck = t["o_custkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        k = np.unique(ck[od >= cut_us])
        return pa.table({"ck": pa.array(k, pa.int64())})

    chunks = [
        (b if isinstance(b, pa.Table) else pa.Table.from_batches([b]))
        ["ck"].to_numpy(zero_copy_only=False)
        for b in orders_ds.map_batches(
            custkey_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")
    ]
    have_orders = np.unique(np.concatenate(chunks)) if chunks else np.empty(
        0, np.int64)
    ord_ref = ray.put(have_orders)

    def seg_partial(t: pa.Table) -> pa.Table:
        keys = ray.get(ord_ref)
        bal = np.round(t["c_acctbal"].combine_chunks().to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        ck = t["c_custkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        rich = bal * cnt_pos > sum_pos
        pos = np.searchsorted(keys, ck)
        pos_c = np.minimum(pos, max(len(keys) - 1, 0))
        noorder = (len(keys) == 0) | (keys[pos_c] != ck) if len(keys) else \
            np.ones(len(ck), bool)
        sel = rich & noorder
        seg = t["c_mktsegment"].combine_chunks()
        segs = np.asarray(seg.to_pylist(), dtype=object)[sel]
        balf = bal[sel]
        us, inv = np.unique(segs, return_inverse=True)
        cnt = np.zeros(len(us), np.int64)
        tot = np.zeros(len(us), np.int64)
        np.add.at(cnt, inv, 1)
        np.add.at(tot, inv, balf)
        return pa.table({
            "c_mktsegment": pa.array(us.tolist(), pa.string()),
            "numcust": pa.array(cnt, pa.int64()),
            "totacctbal_u2": pa.array(tot, pa.int64()),
        })

    acc: dict[str, list[int]] = {}
    for b in customer_ds.map_batches(
            seg_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for s, n, v in zip(t["c_mktsegment"].to_pylist(),
                           t["numcust"].to_pylist(),
                           t["totacctbal_u2"].to_pylist()):
            e = acc.setdefault(s, [0, 0])
            e[0] += n
            e[1] += v
    segs = sorted(acc)
    return pa.table({
        "c_mktsegment": pa.array(segs, pa.string()),
        "numcust": pa.array([acc[s][0] for s in segs], pa.int64()),
        "totacctbal_u2": pa.array([acc[s][1] for s in segs], pa.int64()),
    })


IDLE_BALANCE_BY_SEGMENT_SQL = f"""
WITH posavg AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_pos_u2,
         CAST(COUNT(*) AS BIGINT) AS cnt_pos
  FROM customer WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 0
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_u2
FROM customer, posavg
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * cnt_pos > sum_pos_u2
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}')
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# Q12 shape: join + conditional two-bucket counts per group
# --------------------------------------------------------------------------

PRIORITY_YEAR = 1996
HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def line_priority_counts(orders_ds, lineitem_ds,
                         year: int = PRIORITY_YEAR,
                         num_partitions: int = 8):
    """TPC-H-Q12 shape: per line-status (the corpus stand-in for
    l_shipmode), how many lineitems shipped in one year belong to
    high- vs low-priority orders — a fact x fact join feeding two
    CASE-summed buckets per group.

    Discipline: lineitem blocks pre-reduce to per-(orderkey, status)
    counts inside the ship window; orders blocks carry one
    priority-class bit per orderkey; ONE tag-union keyed exchange on
    orderkey co-locates them, and the per-partition combine collapses to
    at most |statuses| x 2 cells — the driver merges a 4-cell grid.
    Status and the priority bit travel as int8 codes, never strings.
    """
    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)

    schema = pa.schema([
        ("jkey", pa.int64()), ("tag", pa.int8()), ("st", pa.int8()),
        ("hi", pa.int8()), ("cnt", pa.int64()),
    ])
    STATUSES = ("F", "O")

    def lineitem_partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sel = (ship >= lo) & (ship < hi)
        if not sel.any():
            return schema.empty_table()
        okey = t["l_orderkey"].combine_chunks().to_numpy(
            zero_copy_only=False)[sel]
        st = np.asarray(
            pc.equal(t["l_linestatus"], "O").to_numpy(zero_copy_only=False),
            np.int8)[sel]
        # reduce to per-(orderkey, status) counts before the exchange
        code = okey * 2 + st
        code_s = np.sort(code)
        starts = np.concatenate(
            [[0], np.flatnonzero(code_s[1:] != code_s[:-1]) + 1])
        cnt = np.diff(np.append(starts, len(code_s)))
        n = len(starts)
        return pa.table({
            "jkey": pa.array(code_s[starts] >> 1, pa.int64()),
            "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
            "st": pa.array((code_s[starts] & 1).astype(np.int8), pa.int8()),
            "hi": pa.array(np.zeros(n, np.int8), pa.int8()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        }).cast(schema)

    def orders_side(t: pa.Table) -> pa.Table:
        prio = t["o_orderpriority"].combine_chunks()
        hi_bit = np.zeros(len(t), np.int8)
        for p in HIGH_PRIORITIES:
            hi_bit |= np.asarray(
                pc.equal(prio, p).to_numpy(zero_copy_only=False), np.int8)
        n = len(t)
        return pa.table({
            "jkey": t["o_orderkey"].combine_chunks(),
            "tag": pa.array(np.ones(n, np.int8), pa.int8()),
            "st": pa.array(np.zeros(n, np.int8), pa.int8()),
            "hi": pa.array(hi_bit, pa.int8()),
            "cnt": pa.array(np.zeros(n, np.int64), pa.int64()),
        }).cast(schema)

    mixed = lineitem_ds.map_batches(
        lineitem_partial, batch_format="pyarrow"
    ).union(orders_ds.map_batches(orders_side, batch_format="pyarrow"))
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    grid_schema = pa.schema([("cell", pa.int8()), ("n", pa.int64())])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return grid_schema.empty_table()
        jkey = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        st = t["st"].combine_chunks().to_numpy(zero_copy_only=False)
        hib = t["hi"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((tag, jkey))
        jk, tg = jkey[order], tag[order]
        starts = np.concatenate([[0], np.flatnonzero(jk[1:] != jk[:-1]) + 1])
        ends = np.append(starts[1:], len(jk)) - 1
        match = (tg[starts] == 0) & (tg[ends] == 1)
        if not match.any():
            return grid_schema.empty_table()
        # group id per sorted row, then the group's order-row hi bit
        gid = np.zeros(len(jk), np.int64)
        gid[starts[1:]] = 1
        gid = np.cumsum(gid)
        hi_of_group = hib[order][ends]          # last row per group
        row_hi = hi_of_group[gid]
        row_match = match[gid]
        li = (tg == 0) & row_match
        cell = st[order][li] * 2 + row_hi[li]
        grid = np.zeros(4, np.int64)
        np.add.at(grid, cell, cnt[order][li])
        nz = np.flatnonzero(grid)
        return pa.table({
            "cell": pa.array(nz.astype(np.int8), pa.int8()),
            "n": pa.array(grid[nz], pa.int64()),
        }).cast(grid_schema)

    grid = np.zeros(4, np.int64)
    for b in mixed.map_batches(
            combine, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        np.add.at(grid, t["cell"].to_numpy(zero_copy_only=False),
                  t["n"].to_numpy(zero_copy_only=False))
    return pa.table({
        "l_linestatus": pa.array(list(STATUSES), pa.string()),
        "high_line_count": pa.array([grid[1], grid[3]], pa.int64()),
        "low_line_count": pa.array([grid[0], grid[2]], pa.int64()),
    })


LINE_PRIORITY_COUNTS_SQL = f"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '{PRIORITY_YEAR}-01-01'
  AND l_shipdate <  TIMESTAMP '{PRIORITY_YEAR + 1}-01-01'
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# Q10 shape: returned-item revenue per customer, top-k + dim join-back
# --------------------------------------------------------------------------

RETURNED_WINDOW_LO = "1996-01-01"
RETURNED_WINDOW_HI = "1996-04-01"
RETURNED_TOPK = 20


def returned_item_revenue(orders_ds, lineitem_ds, customer_tbl: pa.Table,
                          nation_tbl: pa.Table,
                          window_lo: str = RETURNED_WINDOW_LO,
                          window_hi: str = RETURNED_WINDOW_HI,
                          k: int = RETURNED_TOPK,
                          num_partitions: int = 8):
    """TPC-H-Q10 shape: top-k customers by revenue of RETURNED lineitems
    on orders placed in one window, with customer/nation attributes
    joined back — fact x fact exchange + dim-sized rollup + driver top-k.

    Discipline: lineitem blocks pre-reduce R-flagged revenue per
    orderkey; window-filtered orders carry (orderkey -> custkey); ONE
    tag-union keyed exchange on orderkey, and the per-partition combine
    re-reduces to per-CUSTKEY revenue (dimension-sized — the exchange
    output never exceeds |customers| rows per partition).  The driver
    merges a dense |customers| vector, takes the top k (exact int64
    revenue desc, custkey asc) and attaches name / balance / nation from
    the driver-resident dimensions — the fact tables never touch a
    second shuffle.
    """
    lo = np.datetime64(window_lo, "us").astype(np.int64)
    hi = np.datetime64(window_hi, "us").astype(np.int64)

    ck = customer_tbl["c_custkey"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_cust = int(ck.max()) + 1 if len(ck) else 0

    schema = pa.schema([
        ("jkey", pa.int64()), ("tag", pa.int8()), ("custkey", pa.int64()),
        ("rev_u4", pa.int64()),
    ])

    def lineitem_partial(t: pa.Table) -> pa.Table:
        flag = np.asarray(pc.equal(
            t["l_returnflag"], "R").to_numpy(zero_copy_only=False))
        if not flag.any():
            return schema.empty_table()
        okey = t["l_orderkey"].combine_chunks().to_numpy(
            zero_copy_only=False)[flag]
        price = np.round(t["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)[flag] * 100).astype(np.int64)
        disc = np.round(t["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False)[flag] * 100).astype(np.int64)
        rev = price * (100 - disc)
        order = np.argsort(okey, kind="stable")
        ok_s, rev_s = okey[order], rev[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(ok_s[1:] != ok_s[:-1]) + 1])
        n = len(starts)
        return pa.table({
            "jkey": pa.array(ok_s[starts], pa.int64()),
            "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
            "custkey": pa.array(np.zeros(n, np.int64), pa.int64()),
            "rev_u4": pa.array(np.add.reduceat(rev_s, starts), pa.int64()),
        }).cast(schema)

    def orders_side(t: pa.Table) -> pa.Table:
        odate = t["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sel = np.flatnonzero((odate >= lo) & (odate < hi))
        if len(sel) == 0:
            return schema.empty_table()
        take = pa.array(sel, pa.int64())
        n = len(sel)
        return pa.table({
            "jkey": t["o_orderkey"].combine_chunks().take(take),
            "tag": pa.array(np.ones(n, np.int8), pa.int8()),
            "custkey": t["o_custkey"].combine_chunks().take(take),
            "rev_u4": pa.array(np.zeros(n, np.int64), pa.int64()),
        }).cast(schema)

    mixed = lineitem_ds.map_batches(
        lineitem_partial, batch_format="pyarrow"
    ).union(orders_ds.map_batches(orders_side, batch_format="pyarrow"))
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    out_schema = pa.schema([("custkey", pa.int64()), ("rev_u4", pa.int64())])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        jkey = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        cust = t["custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = t["rev_u4"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((tag, jkey))
        jk, tg = jkey[order], tag[order]
        starts = np.concatenate([[0], np.flatnonzero(jk[1:] != jk[:-1]) + 1])
        ends = np.append(starts[1:], len(jk)) - 1
        match = (tg[starts] == 0) & (tg[ends] == 1)
        if not match.any():
            return out_schema.empty_table()
        gid = np.zeros(len(jk), np.int64)
        gid[starts[1:]] = 1
        gid = np.cumsum(gid)
        cust_of_group = cust[order][ends]
        li = (tg == 0) & match[gid]
        acc = np.zeros(n_cust, np.int64)
        np.add.at(acc, cust_of_group[gid[li]], rev[order][li])
        nz = np.flatnonzero(acc)
        return pa.table({
            "custkey": pa.array(nz, pa.int64()),
            "rev_u4": pa.array(acc[nz], pa.int64()),
        }).cast(out_schema)

    acc = np.zeros(n_cust, np.int64)
    for b in mixed.map_batches(
            combine, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        np.add.at(acc, t["custkey"].to_numpy(zero_copy_only=False),
                  t["rev_u4"].to_numpy(zero_copy_only=False))
    nz = np.flatnonzero(acc)
    top = nz[np.lexsort((nz, -acc[nz]))[:k]]

    names = np.empty(n_cust, dtype=object)
    names[ck] = np.asarray(customer_tbl["c_name"].to_pylist(), dtype=object)
    bal = np.zeros(n_cust, np.int64)
    bal[ck] = np.round(customer_tbl["c_acctbal"].to_numpy(
        zero_copy_only=False) * 100).astype(np.int64)
    cnk = customer_tbl["c_nationkey"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    cust_nation = np.full(n_cust, -1, np.int16)
    cust_nation[ck] = cnk.astype(np.int16)
    nk = nation_tbl["n_nationkey"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    nnames = np.empty(int(nk.max()) + 1 if len(nk) else 0, dtype=object)
    nnames[nk] = np.asarray(nation_tbl["n_name"].to_pylist(), dtype=object)
    return pa.table({
        "c_custkey": pa.array(top, pa.int64()),
        "c_name": pa.array(names[top].tolist(), pa.string()),
        "revenue_u4": pa.array(acc[top], pa.int64()),
        "c_acctbal_u2": pa.array(bal[top], pa.int64()),
        "n_name": pa.array(nnames[cust_nation[top]].tolist(), pa.string()),
    })


RETURNED_ITEM_REVENUE_SQL = f"""
SELECT c_custkey,
       c_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_u4,
       CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c_acctbal_u2,
       n_name
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '{RETURNED_WINDOW_LO}'
  AND o_orderdate <  TIMESTAMP '{RETURNED_WINDOW_HI}'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 4, 5
ORDER BY revenue_u4 DESC, c_custkey
LIMIT {RETURNED_TOPK}
"""
