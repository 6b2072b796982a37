"""Wide aggregation patterns on the TPC-H-ish tables.

Two canonical shapes the dedup tiers don't exercise:

- ``pricing_summary`` — TPC-H-Q1-style multi-measure groupby on the
  biggest table: per-block PARTIAL aggregation shrinks the exchange to
  (groups x blocks) rows before a tiny final combine — the
  combiner-before-shuffle discipline that keeps a 100 TB groupby from
  being an all-to-all of raw rows.
- ``quantity_band_counts`` — broadcast range join: the small side (static
  value bands) ships once via ``ray.put`` and every task resolves bands
  with a searchsorted against the broadcast copy — the broadcast-small-
  side pattern that replaces a shuffle join whenever one side is tiny.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# static quantity bands for the range join (end-exclusive)
QUANTITY_BANDS: list[tuple[float, float, str]] = [
    (0.0, 10.0, "low"),
    (10.0, 25.0, "mid"),
    (25.0, 40.0, "high"),
    (40.0, 1e18, "bulk"),
]


def pricing_summary(lineitem_ds, num_partitions: int = 4):
    """Q1 shape: group by (l_returnflag, l_linestatus) with count + sum
    measures — ALL measures in exact int64 sub-units (all inputs are
    2-decimal, so cents / 1e-4 / 1e-6 units are exact integers), making
    the result bit-identical regardless of block splits or summation
    order (no float accumulation anywhere; doubles would drift in the 6th
    decimal at ~1e9 sums).  Unit scheme: *_c = 1e-2, *_u4 = 1e-4,
    *_u6 = 1e-6 dollars."""

    def _units(t: pa.Table):
        qty = t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        disc = t["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        tax = t["l_tax"].combine_chunks().to_numpy(zero_copy_only=False)
        qty_c = np.round(qty * 100).astype(np.int64)
        price_c = np.round(price * 100).astype(np.int64)
        disc_c = np.round(disc * 100).astype(np.int64)
        tax_c = np.round(tax * 100).astype(np.int64)
        disc_price_u4 = price_c * (100 - disc_c)
        charge_u6 = disc_price_u4 * (100 + tax_c)
        return qty_c, price_c, disc_c, disc_price_u4, charge_u6

    MEASURES = ("sum_qty_c", "sum_price_c", "sum_disc_c", "sum_disc_price_u4",
                "sum_charge_u6")

    def partial(t: pa.Table) -> pa.Table:
        rf = t["l_returnflag"].combine_chunks()
        ls = t["l_linestatus"].combine_chunks()
        combo = pc.binary_join_element_wise(rf, ls, "|")
        enc = combo.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = _units(t)
        order = np.argsort(codes, kind="stable")
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[order][1:] != codes[order][:-1]) + 1]
        )
        grp_codes = codes[order][starts]
        n = np.diff(np.append(starts, len(codes)))
        cols = {
            "grp": enc.dictionary.take(pa.array(grp_codes, pa.int64())),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        }
        for name, v in zip(MEASURES, vals):
            cols[name] = pa.array(np.add.reduceat(v[order], starts), pa.int64())
        return pa.table(cols)

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow")
    partials = partials.repartition(num_blocks=num_partitions, keys=["grp"])

    def combine(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
             ("count_order", pa.int64())]
            + [(m, pa.int64()) for m in MEASURES]
        )
        if len(t) == 0:
            return schema.empty_table()
        grp = t["grp"].combine_chunks()
        enc = grp.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[order][1:] != codes[order][:-1]) + 1]
        )
        labels = enc.dictionary.take(
            pa.array(codes[order][starts], pa.int64())
        ).to_pylist()
        cols = {
            "l_returnflag": pa.array([s.split("|")[0] for s in labels], pa.string()),
            "l_linestatus": pa.array([s.split("|")[1] for s in labels], pa.string()),
            "count_order": pa.array(
                np.add.reduceat(
                    t["n"].combine_chunks().to_numpy()[order], starts
                ).astype(np.int64),
                pa.int64(),
            ),
        }
        for m in MEASURES:
            cols[m] = pa.array(
                np.add.reduceat(t[m].combine_chunks().to_numpy()[order], starts),
                pa.int64(),
            )
        return pa.table(cols).cast(schema)

    return partials.map_batches(combine, batch_format="pyarrow", batch_size=None)


PRICING_SUMMARY_SQL = """
SELECT l_returnflag,
       l_linestatus,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
       CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_u4,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
           * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS BIGINT) AS sum_charge_u6
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def quantity_band_counts(lineitem_ds):
    """Broadcast range join: resolve each lineitem's quantity band against
    the (tiny) band table shipped once via ``ray.put``, then partial-count
    per band with a driver-sized final merge."""
    import ray

    lo = np.array([b[0] for b in QUANTITY_BANDS])
    labels = [b[2] for b in QUANTITY_BANDS]
    ref = ray.put({"lo": lo, "labels": labels})

    def per_block(t: pa.Table) -> pa.Table:
        bands = ray.get(ref)
        qty = t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        price_c = np.round(price * 100).astype(np.int64)  # exact int cents
        idx = np.searchsorted(bands["lo"], qty, side="right") - 1
        nb = len(bands["labels"])
        n = np.bincount(idx, minlength=nb).astype(np.int64)
        s = np.zeros(nb, dtype=np.int64)
        np.add.at(s, idx, price_c)
        return pa.table(
            {
                "band": pa.array(bands["labels"], pa.string()),
                "n": pa.array(n, pa.int64()),
                "sum_price_c": pa.array(s, pa.int64()),
            }
        )

    partials = lineitem_ds.map_batches(per_block, batch_format="pyarrow")
    # final merge: 4 bands x blocks rows — driver-sized by construction
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    band = t["band"].combine_chunks()
    enc = band.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    g = len(enc.dictionary)
    n = np.zeros(g, dtype=np.int64)
    s = np.zeros(g, dtype=np.int64)
    np.add.at(n, codes, t["n"].combine_chunks().to_numpy())
    np.add.at(s, codes, t["sum_price_c"].combine_chunks().to_numpy())
    keep = n > 0  # bands with no rows are absent from the SQL result
    return pa.table(
        {
            "band": pa.array(np.asarray(enc.dictionary.to_pylist())[keep], pa.string()),
            "n": pa.array(n[keep], pa.int64()),
            "sum_price_c": pa.array(s[keep], pa.int64()),
        }
    )


_BAND_VALUES = ", ".join(
    f"({lo}, {hi}, '{label}')" for lo, hi, label in QUANTITY_BANDS
)

QUANTITY_BANDS_SQL = f"""
WITH bands(lo, hi, band) AS (VALUES {_BAND_VALUES})
SELECT b.band,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
FROM lineitem l JOIN bands b
  ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
GROUP BY b.band
"""


def region_customer_stats(customer_ds, nation_tbl: pa.Table, region_tbl: pa.Table):
    """Broadcast DIMENSION hash-join: customer x nation x region rollup.

    The dimension chain (nation -> region, dozens of rows) is folded
    driver-side into one dense ``nationkey -> regionkey`` int array and a
    region-name list; each customer block partial-aggregates per NATION
    with a plain ``bincount`` (dense surrogate keys — no hash table at
    all), so the exchange carries |nations| rows per block and region
    mapping happens once at the driver-sized finalize.  This is the
    star-schema enrich shape: fact tables never shuffle, dimensions never
    leave the driver.
    """
    nk = nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nrk = nation_tbl["n_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_nations = int(nk.max()) + 1 if len(nk) else 0
    nation_region = np.full(n_nations, -1, dtype=np.int64)
    nation_region[nk] = nrk
    rk = region_tbl["r_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    rnames = np.empty(int(rk.max()) + 1 if len(rk) else 0, dtype=object)
    rnames[rk] = np.asarray(region_tbl["r_name"].to_pylist(), dtype=object)

    def partial(t: pa.Table) -> pa.Table:
        cnk = t["c_nationkey"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        bal = t["c_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        bal_c = np.round(bal * 100).astype(np.int64)
        n = np.bincount(cnk, minlength=n_nations).astype(np.int64)
        s = np.zeros(n_nations, dtype=np.int64)
        np.add.at(s, cnk, bal_c)
        keep = np.flatnonzero(n)
        return pa.table(
            {
                "nationkey": pa.array(keep, pa.int64()),
                "n": pa.array(n[keep], pa.int64()),
                "sum_acctbal_c": pa.array(s[keep], pa.int64()),
            }
        )

    partials = customer_ds.map_batches(partial, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    nkey = t["nationkey"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False)
    s = t["sum_acctbal_c"].to_numpy(zero_copy_only=False)
    reg = nation_region[nkey]
    n_regions = len(rnames)
    rn = np.zeros(n_regions, dtype=np.int64)
    rs = np.zeros(n_regions, dtype=np.int64)
    np.add.at(rn, reg, n)
    np.add.at(rs, reg, s)
    keep = np.flatnonzero(rn)
    return pa.table(
        {
            "r_name": pa.array(rnames[keep].tolist(), pa.string()),
            "n_customers": pa.array(rn[keep], pa.int64()),
            "sum_acctbal_c": pa.array(rs[keep], pa.int64()),
        }
    )


REGION_CUSTOMER_STATS_SQL = """
SELECT r_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_acctbal_c
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def promo_revenue_by_month(lineitem_ds, part_tbl: pa.Table):
    """Q14 shape: monthly revenue split promo/total via a broadcast fact-
    to-dimension join.  The part dimension folds to a dense partkey ->
    is_promo bool array shipped once via ``ray.put`` (1 byte/part); each
    lineitem block computes exact int64 revenue units, truncates shipdate
    to month with integer datetime64 math, and partial-aggregates per
    month — the exchange carries (months x blocks) rows.  The promo share
    is returned as exact integer numerator/denominator (a float ratio
    would be hash-hostile in the oracle gate; callers divide)."""
    import ray

    pk = part_tbl["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ptype = np.asarray(part_tbl["p_type"].to_pylist(), dtype=object)
    is_promo = np.zeros(int(pk.max()) + 1 if len(pk) else 0, dtype=bool)
    is_promo[pk] = ptype == "PROMO"
    ref = ray.put(is_promo)

    out_schema = pa.schema(
        [("month", pa.timestamp("us")), ("promo_rev_u4", pa.int64()),
         ("total_rev_u4", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        promo = ray.get(ref)
        lpk = t["l_partkey"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        price = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        disc = t["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.round(price * 100).astype(np.int64) * (
            100 - np.round(disc * 100).astype(np.int64)
        )
        ship = t["l_shipdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        month = (
            ship.view("datetime64[us]").astype("datetime64[M]")
            .astype("datetime64[us]").view(np.int64)
        )
        p_rev = np.where(promo[lpk], rev, 0)
        order = np.argsort(month, kind="stable")
        m_s = month[order]
        starts = np.concatenate([[0], np.flatnonzero(m_s[1:] != m_s[:-1]) + 1])
        return pa.table(
            {
                "month": pa.array(m_s[starts]).cast(pa.timestamp("us")),
                "promo_rev_u4": pa.array(
                    np.add.reduceat(p_rev[order], starts), pa.int64()
                ),
                "total_rev_u4": pa.array(
                    np.add.reduceat(rev[order], starts), pa.int64()
                ),
            }
        ).cast(out_schema)

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables([x for x in tabs if len(x)] or [out_schema.empty_table()])
    m = t["month"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.argsort(m, kind="stable")
    m_s = m[order]
    starts = np.concatenate(
        [[0], np.flatnonzero(m_s[1:] != m_s[:-1]) + 1]
    ) if len(m_s) else np.empty(0, np.int64)
    pr = t["promo_rev_u4"].combine_chunks().to_numpy(zero_copy_only=False)[order]
    tr = t["total_rev_u4"].combine_chunks().to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "month": pa.array(m_s[starts] if len(m_s) else m_s).cast(
                pa.timestamp("us")
            ),
            "promo_rev_u4": pa.array(
                np.add.reduceat(pr, starts) if len(m_s) else pr, pa.int64()
            ),
            "total_rev_u4": pa.array(
                np.add.reduceat(tr, starts) if len(m_s) else tr, pa.int64()
            ),
        }
    ).cast(out_schema)


PROMO_REVENUE_SQL = """
SELECT date_trunc('month', l_shipdate) AS month,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                ELSE 0 END) AS BIGINT) AS promo_rev_u4,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS total_rev_u4
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


def supplier_nation_revenue(lineitem_ds, supplier_tbl: pa.Table,
                            nation_tbl: pa.Table):
    """Revenue rolled up to the supplier's nation: lineitem x supplier x
    nation with both dimensions folded to one dense suppkey -> nationkey
    array driver-side — same star-schema broadcast shape as
    :func:`region_customer_stats`, fact side never shuffles."""
    sk = supplier_tbl["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snk = supplier_tbl["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    supp_nation = np.full(int(sk.max()) + 1 if len(sk) else 0, -1, dtype=np.int64)
    supp_nation[sk] = snk
    nk = nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nnames = np.empty(int(nk.max()) + 1 if len(nk) else 0, dtype=object)
    nnames[nk] = np.asarray(nation_tbl["n_name"].to_pylist(), dtype=object)
    n_nations = len(nnames)

    import ray

    ref = ray.put(supp_nation)

    def partial(t: pa.Table) -> pa.Table:
        sn = ray.get(ref)
        lsk = t["l_suppkey"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        price = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        disc = t["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.round(price * 100).astype(np.int64) * (
            100 - np.round(disc * 100).astype(np.int64)
        )
        nat = sn[lsk]
        s = np.zeros(n_nations, dtype=np.int64)
        cnt = np.bincount(nat, minlength=n_nations).astype(np.int64)
        np.add.at(s, nat, rev)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "nationkey": pa.array(keep, pa.int64()),
                "n_items": pa.array(cnt[keep], pa.int64()),
                "revenue_u4": pa.array(s[keep], pa.int64()),
            }
        )

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    nkey = t["nationkey"].to_numpy(zero_copy_only=False)
    cnt = np.zeros(n_nations, dtype=np.int64)
    s = np.zeros(n_nations, dtype=np.int64)
    np.add.at(cnt, nkey, t["n_items"].to_numpy(zero_copy_only=False))
    np.add.at(s, nkey, t["revenue_u4"].to_numpy(zero_copy_only=False))
    keep = np.flatnonzero(cnt)
    return pa.table(
        {
            "n_name": pa.array(nnames[keep].tolist(), pa.string()),
            "n_items": pa.array(cnt[keep], pa.int64()),
            "revenue_u4": pa.array(s[keep], pa.int64()),
        }
    )


SUPPLIER_NATION_REVENUE_SQL = """
SELECT n_name,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_u4
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def pricing_rollup(lineitem_ds, num_partitions: int = 4):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) — the grouping-sets /
    hierarchy-subtotal shape, computed in ONE pass: each block's exact
    (flag, status) partials are emitted at all three levels (leaf, per-flag
    subtotal, grand total) with a level tag and a sentinel for rolled-up
    keys, so the keyed exchange still moves a few rows per block and the
    distributed combine is level-agnostic.  Sentinels become SQL NULLs at
    the end (ROLLUP's convention).

    Output: (l_returnflag, l_linestatus, count_order, sum_qty_c) with
    NULL group keys on subtotal rows; measures in exact int64 cents.
    """
    SENT = "\x00ALL"

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flag = t["l_returnflag"].combine_chunks()
        stat = t["l_linestatus"].combine_chunks()
        qty = np.round(
            t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        key = pc.binary_join_element_wise(flag, stat, "\x01")
        uk, inv = np.unique(np.asarray(key.to_pylist(), dtype=object),
                            return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.bincount(inv, weights=qty).astype(np.int64)
        f = np.array([k.split("\x01")[0] for k in uk], dtype=object)
        st = np.array([k.split("\x01")[1] for k in uk], dtype=object)
        # leaf level + per-flag subtotal + grand total from the same partials
        uf, finv = np.unique(f, return_inverse=True)
        nf = np.bincount(finv, weights=n).astype(np.int64)
        sf = np.bincount(finv, weights=s).astype(np.int64)
        rows_f = np.concatenate([f, uf, [SENT]])
        rows_s = np.concatenate([st, np.full(len(uf), SENT, object), [SENT]])
        rows_n = np.concatenate([n, nf, [n.sum()]])
        rows_q = np.concatenate([s, sf, [s.sum()]])
        return pa.table(
            {
                "gf": pa.array(rows_f.tolist(), pa.string()),
                "gs": pa.array(rows_s.tolist(), pa.string()),
                "n": pa.array(rows_n, pa.int64()),
                "q": pa.array(rows_q, pa.int64()),
            }
        )

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow")
    partials = partials.repartition(num_blocks=num_partitions, keys=["gf", "gs"])

    out_schema = pa.schema(
        [("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
         ("count_order", pa.int64()), ("sum_qty_c", pa.int64())]
    )

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        gf = np.asarray(t["gf"].to_pylist(), dtype=object)
        gs = np.asarray(t["gs"].to_pylist(), dtype=object)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        q = t["q"].combine_chunks().to_numpy(zero_copy_only=False)
        key = np.array([a + "\x01" + b for a, b in zip(gf, gs)], dtype=object)
        uk, inv = np.unique(key, return_inverse=True)
        cn = np.bincount(inv, weights=n).astype(np.int64)
        cq = np.bincount(inv, weights=q).astype(np.int64)
        outf = [k.split("\x01")[0] for k in uk]
        outs = [k.split("\x01")[1] for k in uk]
        return pa.table(
            {
                "l_returnflag": pa.array(
                    [None if v == SENT else v for v in outf], pa.string()
                ),
                "l_linestatus": pa.array(
                    [None if v == SENT else v for v in outs], pa.string()
                ),
                "count_order": pa.array(cn, pa.int64()),
                "sum_qty_c": pa.array(cq, pa.int64()),
            }
        ).cast(out_schema)

    return partials.map_batches(combine, batch_format="pyarrow", batch_size=None)


PRICING_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def pricing_cube(lineitem_ds, num_partitions: int = 4):
    """GROUP BY CUBE(l_returnflag, l_linestatus) — all four grouping sets
    (leaf, per-flag, per-status, grand total) from the SAME one-pass block
    partials as :func:`pricing_rollup`; CUBE costs one extra tagged partial
    per block over ROLLUP, never a second scan.  Output matches the SQL
    convention (NULL keys on rolled-up rows), measures in exact int64
    cents.
    """
    SENT = "\x00ALL"

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flag = t["l_returnflag"].combine_chunks()
        stat = t["l_linestatus"].combine_chunks()
        qty = np.round(
            t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        key = pc.binary_join_element_wise(flag, stat, "\x01")
        uk, inv = np.unique(np.asarray(key.to_pylist(), dtype=object),
                            return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.bincount(inv, weights=qty).astype(np.int64)
        f = np.array([k.split("\x01")[0] for k in uk], dtype=object)
        st = np.array([k.split("\x01")[1] for k in uk], dtype=object)
        uf, finv = np.unique(f, return_inverse=True)
        nf = np.bincount(finv, weights=n).astype(np.int64)
        sf = np.bincount(finv, weights=s).astype(np.int64)
        us, sinv = np.unique(st, return_inverse=True)
        ns = np.bincount(sinv, weights=n).astype(np.int64)
        ss = np.bincount(sinv, weights=s).astype(np.int64)
        rows_f = np.concatenate([f, uf, np.full(len(us), SENT, object), [SENT]])
        rows_s = np.concatenate([st, np.full(len(uf), SENT, object), us, [SENT]])
        rows_n = np.concatenate([n, nf, ns, [n.sum()]])
        rows_q = np.concatenate([s, sf, ss, [s.sum()]])
        return pa.table(
            {
                "gf": pa.array(rows_f.tolist(), pa.string()),
                "gs": pa.array(rows_s.tolist(), pa.string()),
                "n": pa.array(rows_n, pa.int64()),
                "q": pa.array(rows_q, pa.int64()),
            }
        )

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow")
    partials = partials.repartition(num_blocks=num_partitions, keys=["gf", "gs"])

    out_schema = pa.schema(
        [("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
         ("count_order", pa.int64()), ("sum_qty_c", pa.int64())]
    )

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        gf = np.asarray(t["gf"].to_pylist(), dtype=object)
        gs = np.asarray(t["gs"].to_pylist(), dtype=object)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        q = t["q"].combine_chunks().to_numpy(zero_copy_only=False)
        key = np.array([a + "\x01" + b for a, b in zip(gf, gs)], dtype=object)
        uk, inv = np.unique(key, return_inverse=True)
        cn = np.bincount(inv, weights=n).astype(np.int64)
        cq = np.bincount(inv, weights=q).astype(np.int64)
        outf = [k.split("\x01")[0] for k in uk]
        outs = [k.split("\x01")[1] for k in uk]
        return pa.table(
            {
                "l_returnflag": pa.array(
                    [None if v == SENT else v for v in outf], pa.string()
                ),
                "l_linestatus": pa.array(
                    [None if v == SENT else v for v in outs], pa.string()
                ),
                "count_order": pa.array(cn, pa.int64()),
                "sum_qty_c": pa.array(cq, pa.int64()),
            }
        ).cast(out_schema)

    return partials.map_batches(combine, batch_format="pyarrow", batch_size=None)


PRICING_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


PROPS_K_PATTERN = r'"k":\s*(?P<k>\d+)'


def props_k_stats(events_ds):
    """Semi-structured extraction + aggregate: pull the integer ``k`` out
    of the JSON ``props`` column with a vectorized RE2 kernel
    (pyarrow.compute.extract_regex — same engine and pattern string as the
    DuckDB oracle's regexp_extract) and roll up (n_events, sum_value_c)
    per k.  The k domain is small (bounded enum), so per-block partials
    driver-merge without an exchange — the JSON never leaves the block it
    was read into.
    """
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"].combine_chunks(), PROPS_K_PATTERN)
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64()).to_numpy(zero_copy_only=False)
        vc = np.round(
            t["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, vc)
        return pa.table({
            "k": pa.array(u, pa.int64()),
            "n_events": pa.array(n, pa.int64()),
            "sum_value_c": pa.array(s, pa.int64()),
        })

    parts = events_ds.map_batches(partial, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in parts.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    k = t["k"].to_numpy(zero_copy_only=False)
    u, inv = np.unique(k, return_inverse=True)
    n = np.zeros(len(u), dtype=np.int64)
    s = np.zeros(len(u), dtype=np.int64)
    np.add.at(n, inv, t["n_events"].to_numpy(zero_copy_only=False))
    np.add.at(s, inv, t["sum_value_c"].to_numpy(zero_copy_only=False))
    return pa.table({
        "k": pa.array(u, pa.int64()),
        "n_events": pa.array(n, pa.int64()),
        "sum_value_c": pa.array(s, pa.int64()),
    })


PROPS_K_STATS_SQL = r"""
SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events
GROUP BY 1
"""


def monthly_revenue(orders_ds):
    """Temporal rollup: orders grouped by calendar month (the
    ``date_trunc('month', ...)`` shape — a calendar unit, so NOT
    expressible as the fixed-width epoch-bucket arithmetic the window
    aggregates use).

    Per-block partials group on the month key via ``pc.floor_temporal``
    (vectorized calendar truncation), revenue in exact int64 cents; the
    partial set is (months x blocks) rows — driver-merged like the other
    tiny-result aggregates, never a shuffle of raw orders.

    Output: (month_us: int64 epoch-us of month start, n_orders, revenue_c).
    """

    def partial(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(
            t["o_orderdate"].combine_chunks(), unit="month"
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        price_c = np.round(
            t["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        u, inv = np.unique(month, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, price_c)
        return pa.table({
            "month_us": pa.array(u, pa.int64()),
            "n_orders": pa.array(n, pa.int64()),
            "revenue_c": pa.array(s, pa.int64()),
        })

    partials = orders_ds.map_batches(partial, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    if len(t) == 0:
        return pa.table({
            "month_us": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
            "revenue_c": pa.array([], pa.int64()),
        })
    m = t["month_us"].combine_chunks().to_numpy(zero_copy_only=False)
    u, inv = np.unique(m, return_inverse=True)
    n = np.zeros(len(u), dtype=np.int64)
    s = np.zeros(len(u), dtype=np.int64)
    np.add.at(n, inv, t["n_orders"].combine_chunks().to_numpy(zero_copy_only=False))
    np.add.at(s, inv, t["revenue_c"].combine_chunks().to_numpy(zero_copy_only=False))
    return pa.table({
        "month_us": pa.array(u, pa.int64()),
        "n_orders": pa.array(n, pa.int64()),
        "revenue_c": pa.array(s, pa.int64()),
    })


MONTHLY_REVENUE_SQL = """
SELECT CAST(epoch_us(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)) AS BIGINT)
           AS month_us,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders
GROUP BY 1
"""


def nation_revenue_share(orders_ds, customer_tbl: pa.Table,
                         nation_tbl: pa.Table):
    """Ratio-to-report: per-nation order revenue plus the GLOBAL total and
    each nation's share, the ``SUM(x) OVER ()`` window shape (no reference
    counterpart — SURVEY.md §2.5/§2.6).

    Discipline: the customer->nation map folds driver-side into one dense
    int8-per-custkey array shipped once via ``ray.put`` (1 byte/customer —
    ~1 GB at 10^9 customers; beyond that the growth path is the tag-union
    keyed exchange of ``order_revenue_topk``); each orders block
    partial-reduces to |nations| bincount rows, the driver merges
    blocks x 25 rows, and the global-total window is free at finalize —
    the fact table never shuffles at all.  All money in exact int64 cents;
    the share is floor basis points (integer cross-division), so the
    result is bit-identical under any partitioning.
    """
    import ray

    ck = customer_tbl["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnk = customer_tbl["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cust_nation = np.full(int(ck.max()) + 1 if len(ck) else 0, -1, np.int16)
    cust_nation[ck] = cnk.astype(np.int16)
    nk = nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_nations = int(nk.max()) + 1 if len(nk) else 0
    names = np.empty(n_nations, dtype=object)
    names[nk] = np.asarray(nation_tbl["n_name"].to_pylist(), dtype=object)
    ref = ray.put(cust_nation)

    def partial(t: pa.Table) -> pa.Table:
        cn = ray.get(ref)
        cust = t["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        price = t["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = np.round(price * 100).astype(np.int64)
        nat = cn[cust].astype(np.int64)
        n = np.bincount(nat, minlength=n_nations).astype(np.int64)
        s = np.zeros(n_nations, np.int64)
        np.add.at(s, nat, cents)
        keep = np.flatnonzero(n)
        return pa.table({
            "nationkey": pa.array(keep, pa.int64()),
            "rev_cents": pa.array(s[keep], pa.int64()),
            "n_orders": pa.array(n[keep], pa.int64()),
        })

    partials = orders_ds.map_batches(partial, batch_format="pyarrow")
    rev = np.zeros(n_nations, np.int64)
    cnt = np.zeros(n_nations, np.int64)
    for b in partials.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        k = t["nationkey"].to_numpy(zero_copy_only=False)
        np.add.at(rev, k, t["rev_cents"].to_numpy(zero_copy_only=False))
        np.add.at(cnt, k, t["n_orders"].to_numpy(zero_copy_only=False))
    keep = np.flatnonzero(cnt)
    total = int(rev.sum())
    share_bp = (rev[keep] * 10000) // max(total, 1)
    return pa.table({
        "nation": pa.array(names[keep], pa.string()),
        "rev_cents": pa.array(rev[keep], pa.int64()),
        "n_orders": pa.array(cnt[keep], pa.int64()),
        "total_cents": pa.array(np.full(len(keep), total), pa.int64()),
        "share_bp": pa.array(share_bp, pa.int64()),
    })


NATION_REVENUE_SHARE_SQL = """
WITH r AS (
  SELECT n.n_name AS nation,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT nation, rev_cents, n_orders,
       CAST(SUM(rev_cents) OVER () AS BIGINT) AS total_cents,
       CAST((rev_cents * 10000) // SUM(rev_cents) OVER () AS BIGINT)
           AS share_bp
FROM r
"""


# --------------------------------------------------------------------------
# Q15 shape: argmax over an aggregated view (top supplier by revenue)
# --------------------------------------------------------------------------

# half-year shipdate window (epoch microseconds), Q15's "3-month interval"
# generalized; constants shared with the SQL literal below
TOP_SUPPLIER_FROM = "1995-01-01"
TOP_SUPPLIER_TO = "1995-07-01"


def top_supplier_revenue(lineitem_ds, supplier_tbl: pa.Table,
                         ship_from: str = TOP_SUPPLIER_FROM,
                         ship_to: str = TOP_SUPPLIER_TO):
    """TPC-H-Q15 shape: the supplier(s) whose revenue over a shipdate
    window equals the GLOBAL max of the per-supplier aggregate (the
    max-over-a-view + join-back shape; the reference has no aggregation at
    all — SURVEY.md §2.5).

    Discipline: each lineitem block bincounts revenue into a dense
    |suppliers| int64 vector (suppliers are dimension-sized), the driver
    merges blocks x |suppliers| partials, and the argmax + name join-back
    happen on the driver-resident dimension — the fact table never
    shuffles and nothing data-proportional leaves the blocks.  Revenue in
    exact int64 1e-4-dollar units, so ties and the max are exact, not
    float-blurred.
    """
    sk = supplier_tbl["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_supp = int(sk.max()) + 1 if len(sk) else 0
    names = np.empty(n_supp, dtype=object)
    names[sk] = np.asarray(supplier_tbl["s_name"].to_pylist(), dtype=object)
    lo = np.datetime64(ship_from, "us").astype(np.int64)
    hi = np.datetime64(ship_to, "us").astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = (ts >= lo) & (ts < hi)
        lsk = t["l_suppkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        price = t["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep]
        disc = t["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep]
        rev = np.round(price * 100).astype(np.int64) * (
            100 - np.round(disc * 100).astype(np.int64))
        s = np.zeros(n_supp, np.int64)
        np.add.at(s, lsk, rev)
        nz = np.flatnonzero(s)
        return pa.table({
            "suppkey": pa.array(nz, pa.int64()),
            "revenue_u4": pa.array(s[nz], pa.int64()),
        })

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow")
    total = np.zeros(n_supp, np.int64)
    for b in partials.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        np.add.at(total, t["suppkey"].to_numpy(zero_copy_only=False),
                  t["revenue_u4"].to_numpy(zero_copy_only=False))
    best = int(total.max()) if n_supp else 0
    win = np.flatnonzero(total == best) if best > 0 else np.array([], np.int64)
    return pa.table({
        "s_suppkey": pa.array(win, pa.int64()),
        "s_name": pa.array(names[win].tolist(), pa.string()),
        "total_revenue_u4": pa.array(total[win], pa.int64()),
    })


TOP_SUPPLIER_REVENUE_SQL = f"""
WITH r AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS total_revenue_u4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOP_SUPPLIER_FROM}'
    AND l_shipdate <  TIMESTAMP '{TOP_SUPPLIER_TO}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_u4
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue_u4 = (SELECT MAX(total_revenue_u4) FROM r)
"""


# --------------------------------------------------------------------------
# Q19 shape: disjunctive OR-of-ANDs predicate across a broadcast dimension
# --------------------------------------------------------------------------

# (brand, max p_size, qty lo, qty hi) brackets — Q19's three OR arms;
# constants shared with the SQL literal below
SPECIAL_BRACKETS: list[tuple[str, int, float, float]] = [
    ("Brand#12", 15, 1.0, 20.0),
    ("Brand#23", 25, 5.0, 30.0),
    ("Brand#34", 35, 15.0, 45.0),
]


def special_revenue(lineitem_ds, part_tbl: pa.Table):
    """TPC-H-Q19 shape: revenue under a disjunction of bracket predicates
    that each mix part attributes (brand, size) with lineitem attributes
    (quantity) — the multi-arm OR-of-ANDs filter.

    Discipline: the part side of every arm folds driver-side into ONE
    dense uint8 bitmask per partkey (bit i = partkey satisfies arm i's
    part predicate), shipped once via ``ray.put``; each lineitem block
    evaluates all arms vectorized (gather + bitwise AND) and reduces to a
    single (n_items, revenue_u4) row — no join, no shuffle, one partial
    row per block.
    """
    import ray

    pk = part_tbl["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_part = int(pk.max()) + 1 if len(pk) else 0
    brand = np.asarray(part_tbl["p_brand"].to_pylist(), dtype=object)
    size = part_tbl["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    mask = np.zeros(n_part, np.uint8)
    for i, (b, smax, _qlo, _qhi) in enumerate(SPECIAL_BRACKETS):
        arm = (brand == b) & (size >= 1) & (size <= smax)
        mask[pk[arm]] |= np.uint8(1 << i)
    ref = ray.put(mask)

    def partial(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        lpk = t["l_partkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        qty = t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        bits = m[lpk]
        hit = np.zeros(len(lpk), bool)
        for i, (_b, _smax, qlo, qhi) in enumerate(SPECIAL_BRACKETS):
            hit |= ((bits & np.uint8(1 << i)) != 0) & (qty >= qlo) & (qty <= qhi)
        price = t["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)[hit]
        disc = t["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False)[hit]
        rev = np.round(price * 100).astype(np.int64) * (
            100 - np.round(disc * 100).astype(np.int64))
        return pa.table({
            "n_items": pa.array([int(hit.sum())], pa.int64()),
            "revenue_u4": pa.array([int(rev.sum())], pa.int64()),
        })

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow")
    n = 0
    s = 0
    for b in partials.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        n += int(pc.sum(t["n_items"]).as_py() or 0)
        s += int(pc.sum(t["revenue_u4"]).as_py() or 0)
    return pa.table({
        "n_items": pa.array([n], pa.int64()),
        "revenue_u4": pa.array([s], pa.int64()),
    })


def _bracket_sql(b: str, smax: int, qlo: float, qhi: float) -> str:
    return (f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {smax} "
            f"AND l_quantity >= {qlo} AND l_quantity <= {qhi})")


SPECIAL_REVENUE_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))), 0) AS BIGINT)
         AS revenue_u4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {' OR '.join(_bracket_sql(*br) for br in SPECIAL_BRACKETS)}
"""


# --------------------------------------------------------------------------
# window-over-aggregate: month-over-month revenue growth (LAG on a rollup)
# --------------------------------------------------------------------------


def monthly_revenue_growth(orders_ds):
    """LAG window over an aggregate: monthly revenue with the previous
    month's revenue and the month-over-month delta — the
    ``LAG() OVER (ORDER BY ...)`` on-a-rollup shape.

    The heavy part IS :func:`monthly_revenue` (per-block calendar-bucket
    partials, driver-merged |months|-sized result); the window is then a
    shift on the tiny sorted aggregate, so the window itself costs
    nothing distributed.  ``prev_revenue_c`` is COALESCEd to 0 for the
    first month (no nulls — keeps the result hash-stable).
    """
    m = monthly_revenue(orders_ds)
    month = m["month_us"].to_numpy(zero_copy_only=False)
    rev = m["revenue_c"].to_numpy(zero_copy_only=False)
    order = np.argsort(month, kind="stable")
    month, rev = month[order], rev[order]
    prev = np.concatenate([[0], rev[:-1]]) if len(rev) else rev
    return pa.table({
        "month_us": pa.array(month, pa.int64()),
        "revenue_c": pa.array(rev, pa.int64()),
        "prev_revenue_c": pa.array(prev.astype(np.int64), pa.int64()),
        "delta_c": pa.array((rev - prev).astype(np.int64), pa.int64()),
    })


MONTHLY_REVENUE_GROWTH_SQL = """
WITH m AS (
  SELECT CAST(epoch_us(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)) AS BIGINT)
             AS month_us,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
  FROM orders
  GROUP BY 1
)
SELECT month_us, revenue_c,
       CAST(COALESCE(LAG(revenue_c) OVER (ORDER BY month_us), 0) AS BIGINT)
           AS prev_revenue_c,
       CAST(revenue_c - COALESCE(LAG(revenue_c) OVER (ORDER BY month_us), 0)
           AS BIGINT) AS delta_c
FROM m
"""


def _trunc_div(num: int, den: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//`` semantics
    (Python's ``//`` floors, which differs for negative numerators)."""
    q = abs(num) // den
    return -q if num < 0 else q


def value_dispersion(events_ds):
    """Statistical (algebraic) aggregates per event_type: sample variance
    of ``value`` and sample covariance of ``value`` vs hour-of-day — the
    VAR_SAMP / COVAR_SAMP family the other aggregate tiers don't cover.

    The distributed discipline is exact integer SUFFICIENT STATISTICS:
    each block reduces to per-type (n, Σc, Σc², Σh, Σch) in int64 (c =
    cents, h = hour-of-day; per-block magnitudes are block-bounded so
    int64 never overflows inside a task), the |types|×|blocks| partial
    rows collect on the driver, and the final merge runs in Python
    arbitrary-precision ints — so the cross-multiplied numerators
    (n·Σc² − (Σc)², which would overflow int64 at ~10⁹ rows) are exact at
    any scale, and the quantized outputs are bit-identical under any
    partitioning.  Division truncates toward zero to match DuckDB ``//``
    (variance numerators are non-negative, so trunc == floor there; the
    covariance numerator can be negative).

    Output: (event_type, n, sum_c, var_c2, cov_ch) — var in cents²,
    cov in cents·hour, both sample (n−1) denominators; groups with n<2
    would be dropped (cannot happen on this corpus, documented).

    No reference counterpart (SURVEY.md §2.5 — the reference never
    aggregates); this is the partial+final pattern of `pricing_summary`
    applied to non-distributive algebraic aggregates.
    """
    STATS = ("n", "sum_c", "sum_cc", "sum_h", "sum_ch")

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            cols = {"event_type": pa.array([], pa.string())}
            cols.update({s: pa.array([], pa.int64()) for s in STATS})
            return pa.table(cols)
        et = t["event_type"].combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.round(
            t["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (ts // 3_600_000_000) % 24
        k = len(enc.dictionary)
        vals = {
            "n": np.bincount(codes, minlength=k).astype(np.int64),
            "sum_c": np.bincount(codes, weights=c, minlength=k).astype(np.int64),
            "sum_cc": np.bincount(codes, weights=c * c, minlength=k).astype(np.int64),
            "sum_h": np.bincount(codes, weights=h, minlength=k).astype(np.int64),
            "sum_ch": np.bincount(codes, weights=c * h, minlength=k).astype(np.int64),
        }
        cols = {"event_type": enc.dictionary}
        cols.update({s: pa.array(vals[s], pa.int64()) for s in STATS})
        return pa.table(cols)

    partials = events_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    t = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    )
    acc: dict[str, list[int]] = {}
    for row in t.to_pylist():
        a = acc.setdefault(row["event_type"], [0] * len(STATS))
        for i, s in enumerate(STATS):
            a[i] += int(row[s])  # Python ints: exact beyond int64
    types = sorted(acc)
    out = {"event_type": [], "n": [], "sum_c": [], "var_c2": [], "cov_ch": []}
    for ty in types:
        n, sc, scc, sh, sch = acc[ty]
        if n < 2:
            continue
        out["event_type"].append(ty)
        out["n"].append(n)
        out["sum_c"].append(sc)
        out["var_c2"].append(_trunc_div(n * scc - sc * sc, n * (n - 1)))
        out["cov_ch"].append(_trunc_div(n * sch - sc * sh, n * (n - 1)))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "sum_c": pa.array(out["sum_c"], pa.int64()),
            "var_c2": pa.array(out["var_c2"], pa.int64()),
            "cov_ch": pa.array(out["cov_ch"], pa.int64()),
        }
    )


VALUE_DISPERSION_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS c,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h
  FROM events
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(c) AS HUGEINT) AS sc,
         CAST(SUM(c * c) AS HUGEINT) AS scc,
         CAST(SUM(h) AS HUGEINT) AS sh,
         CAST(SUM(c * h) AS HUGEINT) AS sch
  FROM b GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(sc AS BIGINT) AS sum_c,
       CAST((n * scc - sc * sc) // (n * (n - 1)) AS BIGINT) AS var_c2,
       CAST((n * sch - sc * sh) // (n * (n - 1)) AS BIGINT) AS cov_ch
FROM s
WHERE n >= 2
"""


# --------------------------------------------------------------------------
# Q7 shape: nation-pair trade volume (group attributes from BOTH sides of a
# wide-wide join)
# --------------------------------------------------------------------------

def nation_pair_volume(orders_ds, lineitem_ds, customer_tbl: pa.Table,
                       supplier_tbl: pa.Table, nation_tbl: pa.Table,
                       num_partitions: int = 8):
    """TPC-H-Q7-shape volume-shipping rollup: revenue per (supplier
    nation, customer nation, ship year) — the join class where the
    GROUP BY draws attributes from BOTH sides of a wide-wide join.

    Discipline: each dimension folds driver-side into a dense
    key -> nationkey array broadcast once via ``ray.put`` (the star-schema
    rule); the lineitem side attaches its supplier nation + ship year
    block-locally and pre-reduces to one row per (block, orderkey,
    supp_nation, year); the orders side ships one (orderkey, cust_nation)
    row.  ONE tag-union keyed exchange on orderkey joins them, the
    combine re-reduces to (supp_nation, cust_nation, year) partials —
    at most 25 x 25 x |years| rows per partition — and the driver merges.
    Revenue in the engine's exact u4 integer units (cents x discount
    cents), so the rollup is bit-identical under any partitioning.
    Reference has no joins/aggregates (SURVEY.md §2.4/2.5).
    """
    import ray

    ck = customer_tbl["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnk = customer_tbl["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cust_nation = np.full(int(ck.max()) + 1 if len(ck) else 0, -1, np.int16)
    cust_nation[ck] = cnk.astype(np.int16)
    sk = supplier_tbl["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snk = supplier_tbl["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    supp_nation = np.full(int(sk.max()) + 1 if len(sk) else 0, -1, np.int16)
    supp_nation[sk] = snk.astype(np.int16)
    nk = nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nnames = np.empty(int(nk.max()) + 1 if len(nk) else 0, dtype=object)
    nnames[nk] = np.asarray(nation_tbl["n_name"].to_pylist(), dtype=object)
    cust_ref = ray.put(cust_nation)
    supp_ref = ray.put(supp_nation)

    schema = pa.schema([
        ("jkey", pa.int64()), ("tag", pa.int8()), ("sn", pa.int64()),
        ("yr", pa.int64()), ("rev_u4", pa.int64()), ("n", pa.int64()),
        ("cn", pa.int64()),
    ])

    def lineitem_partial(t: pa.Table) -> pa.Table:
        sn_map = ray.get(supp_ref)
        k = pc.cast(t["l_orderkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        lsk = pc.cast(t["l_suppkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        ship = pc.cast(t["l_shipdate"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        disc = t["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.round(price * 100).astype(np.int64) * (
            100 - np.round(disc * 100).astype(np.int64)
        )
        sn = sn_map[lsk].astype(np.int64)
        yr = ship.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64) + 1970
        order = np.lexsort((yr, sn, k))
        k, sn, yr, rev = k[order], sn[order], yr[order], rev[order]
        if len(k):
            new = (k[1:] != k[:-1]) | (sn[1:] != sn[:-1]) | (yr[1:] != yr[:-1])
            starts = np.concatenate([[0], np.flatnonzero(new) + 1])
            sums = np.add.reduceat(rev, starts)
            cnts = np.diff(np.concatenate([starts, [len(k)]]))
        else:
            starts = np.empty(0, np.int64)
            sums = cnts = np.empty(0, np.int64)
        m = len(starts)
        return pa.table({
            "jkey": pa.array(k[starts] if m else [], pa.int64()),
            "tag": pa.array(np.ones(m, np.int8), pa.int8()),
            "sn": pa.array(sn[starts] if m else [], pa.int64()),
            "yr": pa.array(yr[starts] if m else [], pa.int64()),
            "rev_u4": pa.array(sums, pa.int64()),
            "n": pa.array(cnts.astype(np.int64), pa.int64()),
            "cn": pa.nulls(m, pa.int64()),
        }).cast(schema)

    def orders_side(t: pa.Table) -> pa.Table:
        cn_map = ray.get(cust_ref)
        cust = pc.cast(t["o_custkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        m = len(t)
        return pa.table({
            "jkey": pc.cast(t["o_orderkey"], pa.int64()),
            "tag": pa.array(np.zeros(m, np.int8), pa.int8()),
            "sn": pa.nulls(m, pa.int64()),
            "yr": pa.nulls(m, pa.int64()),
            "rev_u4": pa.nulls(m, pa.int64()),
            "n": pa.nulls(m, pa.int64()),
            "cn": pa.array(cn_map[cust].astype(np.int64), pa.int64()),
        }).cast(schema)

    mixed = lineitem_ds.map_batches(lineitem_partial, batch_format="pyarrow").union(
        orders_ds.map_batches(orders_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    part_schema = pa.schema([
        ("sn", pa.int64()), ("cn", pa.int64()), ("yr", pa.int64()),
        ("rev_u4", pa.int64()), ("n", pa.int64()),
    ])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        lin = tag == 1
        osel = np.flatnonzero(tag == 0)
        if not lin.any() or len(osel) == 0:
            return part_schema.empty_table()
        ok = k[osel]
        ocn = pc.fill_null(t["cn"].combine_chunks(), 0).to_numpy(zero_copy_only=False).astype(np.int64)[osel]
        oorder = np.argsort(ok, kind="stable")
        ok, ocn = ok[oorder], ocn[oorder]
        lk = k[lin]
        pos = np.searchsorted(ok, lk)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == lk
        if not hit.any():
            return part_schema.empty_table()
        # the union'd columns carry nulls from the other tag; fill_null
        # keeps the numpy view int64 (a float64 lane would cap exact
        # integers at 2^53)
        def _i64(col):
            return pc.fill_null(t[col].combine_chunks(), 0).to_numpy(zero_copy_only=False).astype(np.int64)

        sn = _i64("sn")[lin][hit]
        yr = _i64("yr")[lin][hit]
        rev = _i64("rev_u4")[lin][hit]
        cnt = _i64("n")[lin][hit]
        cn = ocn[pos_c[hit]].astype(np.int64)
        # pack (sn, cn, yr) into one int64 group key: nations < 2^15,
        # years < 2^15
        key = (sn << 32) | (cn << 16) | (yr - 1970)
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        c = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, rev)
        np.add.at(c, inv, cnt)
        return pa.table({
            "sn": pa.array(uk >> 32, pa.int64()),
            "cn": pa.array((uk >> 16) & 0xFFFF, pa.int64()),
            "yr": pa.array((uk & 0xFFFF) + 1970, pa.int64()),
            "rev_u4": pa.array(s, pa.int64()),
            "n": pa.array(c, pa.int64()),
        }).cast(part_schema)

    partials = mixed.map_batches(combine, batch_format="pyarrow",
                                 batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs) if tabs else part_schema.empty_table()
    if len(t) == 0:
        return pa.table({
            "supp_nation": pa.array([], pa.string()),
            "cust_nation": pa.array([], pa.string()),
            "l_year": pa.array([], pa.int64()),
            "n_items": pa.array([], pa.int64()),
            "revenue_u4": pa.array([], pa.int64()),
        })
    sn = t["sn"].to_numpy(zero_copy_only=False)
    cn = t["cn"].to_numpy(zero_copy_only=False)
    yr = t["yr"].to_numpy(zero_copy_only=False)
    key = (sn << 32) | (cn << 16) | (yr - 1970)
    uk, inv = np.unique(key, return_inverse=True)
    s = np.zeros(len(uk), np.int64)
    c = np.zeros(len(uk), np.int64)
    np.add.at(s, inv, t["rev_u4"].to_numpy(zero_copy_only=False))
    np.add.at(c, inv, t["n"].to_numpy(zero_copy_only=False))
    usn, ucn, uyr = uk >> 32, (uk >> 16) & 0xFFFF, (uk & 0xFFFF) + 1970
    return pa.table({
        "supp_nation": pa.array(nnames[usn].tolist(), pa.string()),
        "cust_nation": pa.array(nnames[ucn].tolist(), pa.string()),
        "l_year": pa.array(uyr, pa.int64()),
        "n_items": pa.array(c, pa.int64()),
        "revenue_u4": pa.array(s, pa.int64()),
    })


NATION_PAIR_VOLUME_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_u4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN supplier s ON l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
GROUP BY 1, 2, 3
"""


def local_supplier_volume(orders_ds, lineitem_ds, customer_tbl: pa.Table,
                          supplier_tbl: pa.Table, nation_tbl: pa.Table,
                          num_partitions: int = 8):
    """TPC-H-Q5-shape local-supplier volume: revenue where the customer
    and the supplier share a nation, per (nation, ship year) — the join
    predicate BETWEEN two attached dimension attributes.

    Runs the exact :func:`nation_pair_volume` plan (the predicate can
    only be evaluated where the two sides meet — at the post-exchange
    combine); the nation-pair rollup is at most 25 x 25 x |years| rows,
    so the Q5 equality filter + projection is a free driver-side pass on
    that already-reduced result.  Exchange traffic is identical to Q7's.
    """
    t = nation_pair_volume(orders_ds, lineitem_ds, customer_tbl,
                           supplier_tbl, nation_tbl,
                           num_partitions=num_partitions)
    m = pc.equal(t["supp_nation"], t["cust_nation"])
    t = t.filter(m)
    return pa.table({
        "nation": t["supp_nation"],
        "l_year": t["l_year"],
        "n_items": t["n_items"],
        "revenue_u4": t["revenue_u4"],
    })


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT ns.n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_u4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier s ON l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE c_nationkey = s.s_nationkey
GROUP BY 1, 2
"""


def part_supplier_counts(lineitem_ds, part_tbl: pa.Table,
                         supplier_tbl: pa.Table, num_partitions: int = 8):
    """TPC-H-Q16-shape supplier-count-per-part-class: how many DISTINCT
    suppliers ship each (brand, type, size) class, excluding a NOT-IN
    supplier set (here: negative account balance — Q16's complaints
    filter).

    Discipline: part attributes fold driver-side into one dense
    partkey -> class-code array (the part table is a dimension) and the
    exclusion set is a tiny broadcast array; lineitem blocks filter the
    excluded suppliers vectorized, attach class codes, and pre-reduce to
    DISTINCT (class, suppkey) pairs; ONE keyed exchange on class code
    co-locates each class, and the combine's distinct-count is final
    because KR fully co-locates equal keys — partitions concat, never
    re-merge.  COUNT(DISTINCT) over a join with NOT-IN, bit-identical
    under any partitioning (reference has no aggregates, SURVEY.md §2.5).
    """
    import ray

    pk = part_tbl["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cls = np.array([
        f"{b}\x1f{t}\x1f{s}"
        for b, t, s in zip(part_tbl["p_brand"].to_pylist(),
                           part_tbl["p_type"].to_pylist(),
                           part_tbl["p_size"].to_pylist())
    ], dtype=object)
    ucls, codes = np.unique(cls, return_inverse=True)
    pmap = np.full(int(pk.max()) + 1 if len(pk) else 0, -1, np.int32)
    pmap[pk] = codes.astype(np.int32)
    excl = np.sort(
        supplier_tbl.filter(pc.less(supplier_tbl["s_acctbal"], 0.0))
        ["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    pref = ray.put(pmap)

    def partial(t: pa.Table) -> pa.Table:
        pm = ray.get(pref)
        lpk = pc.cast(t["l_partkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        lsk = pc.cast(t["l_suppkey"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        keep = ~np.isin(lsk, excl)
        g = pm[lpk[keep]].astype(np.int64)
        s = lsk[keep]
        order = np.lexsort((s, g))
        g, s = g[order], s[order]
        if len(g):
            first = np.concatenate([[True], (g[1:] != g[:-1]) | (s[1:] != s[:-1])])
            g, s = g[first], s[first]
        return pa.table({
            "gcode": pa.array(g, pa.int64()),
            "suppkey": pa.array(s, pa.int64()),
        })

    pairs = lineitem_ds.map_batches(partial, batch_format="pyarrow")
    pairs = pairs.repartition(num_blocks=num_partitions, keys=["gcode"])

    def count_distinct(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({
                "gcode": pa.array([], pa.int64()),
                "supplier_cnt": pa.array([], pa.int64()),
            })
        g = t["gcode"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["suppkey"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((s, g))
        g, s = g[order], s[order]
        first = np.concatenate([[True], (g[1:] != g[:-1]) | (s[1:] != s[:-1])])
        g = g[first]
        starts = np.concatenate([[0], np.flatnonzero(g[1:] != g[:-1]) + 1])
        cnt = np.diff(np.concatenate([starts, [len(g)]]))
        return pa.table({
            "gcode": pa.array(g[starts], pa.int64()),
            "supplier_cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    finals = pairs.map_batches(count_distinct, batch_format="pyarrow",
                               batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in finals.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs) if tabs else None
    if t is None or len(t) == 0:
        return pa.table({
            "p_brand": pa.array([], pa.string()),
            "p_type": pa.array([], pa.string()),
            "p_size": pa.array([], pa.int64()),
            "supplier_cnt": pa.array([], pa.int64()),
        })
    g = t["gcode"].to_numpy(zero_copy_only=False)
    parts = [c.split("\x1f") for c in ucls[g]]
    return pa.table({
        "p_brand": pa.array([p[0] for p in parts], pa.string()),
        "p_type": pa.array([p[1] for p in parts], pa.string()),
        "p_size": pa.array([int(p[2]) for p in parts], pa.int64()),
        "supplier_cnt": t["supplier_cnt"],
    })


PART_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_suppkey NOT IN (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Q17 shape: predicate against a correlated per-group aggregate
# --------------------------------------------------------------------------

SMALL_QTY_BRAND = "Brand#4"


def small_qty_revenue(lineitem_ds, part_tbl: pa.Table,
                      brand: str = SMALL_QTY_BRAND):
    """TPC-H-Q17 shape: revenue of lineitems whose quantity is below
    20% of the AVG quantity for their part — a predicate against a
    correlated per-group aggregate (the reference has no aggregation at
    all — SURVEY.md §2.5).

    Discipline: two streaming passes instead of one all-to-all exchange.
    Pass 1 bincounts (sum_qty, cnt) per partkey into dense
    |parts|-sized int64 vectors (parts are dimension-sized) and the
    driver merges blocks — output is dim-sized, never fact-sized.  The
    merged per-part threshold re-broadcasts via ``ray.put`` and pass 2
    filters + sums block-locally; the driver adds |blocks| scalars.
    The 20%-of-avg comparison stays in integers:
    ``qty < avg/5  <=>  5*qty_u2*cnt < sum_qty_u2`` — bit-exact under
    any partitioning, no float avg in the predicate.
    """
    import ray

    pk = part_tbl["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_part = int(pk.max()) + 1 if len(pk) else 0
    in_brand = np.zeros(n_part, bool)
    in_brand[pk] = np.asarray(
        pc.equal(part_tbl["p_brand"], brand).to_numpy(zero_copy_only=False))
    brand_ref = ray.put(in_brand)

    def qty_partial(t: pa.Table) -> pa.Table:
        mask = ray.get(brand_ref)
        lpk = t["l_partkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = mask[lpk]
        lpk = lpk[keep]
        qty = np.round(t["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep] * 100).astype(np.int64)
        s = np.zeros(n_part, np.int64)
        c = np.zeros(n_part, np.int64)
        np.add.at(s, lpk, qty)
        np.add.at(c, lpk, 1)
        nz = np.flatnonzero(c)
        return pa.table({
            "pk": pa.array(nz, pa.int64()),
            "sum_qty_u2": pa.array(s[nz], pa.int64()),
            "cnt": pa.array(c[nz], pa.int64()),
        })

    sum_qty = np.zeros(n_part, np.int64)
    cnt = np.zeros(n_part, np.int64)
    for b in lineitem_ds.map_batches(
            qty_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        idx = t["pk"].to_numpy(zero_copy_only=False)
        np.add.at(sum_qty, idx, t["sum_qty_u2"].to_numpy(zero_copy_only=False))
        np.add.at(cnt, idx, t["cnt"].to_numpy(zero_copy_only=False))
    sum_ref = ray.put(sum_qty)
    cnt_ref = ray.put(cnt)

    def rev_partial(t: pa.Table) -> pa.Table:
        mask = ray.get(brand_ref)
        s_map = ray.get(sum_ref)
        c_map = ray.get(cnt_ref)
        lpk = t["l_partkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = mask[lpk]
        lpk = lpk[keep]
        qty = np.round(t["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep] * 100).astype(np.int64)
        price = np.round(t["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep] * 100).astype(np.int64)
        low = 5 * qty * c_map[lpk] < s_map[lpk]
        return pa.table({
            "total_price_u2": pa.array([int(price[low].sum())], pa.int64()),
            "n_items": pa.array([int(low.sum())], pa.int64()),
        })

    tot = np.int64(0)
    n = np.int64(0)
    for b in lineitem_ds.map_batches(
            rev_partial, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        tot += t["total_price_u2"].to_numpy(zero_copy_only=False).sum()
        n += t["n_items"].to_numpy(zero_copy_only=False).sum()
    return pa.table({
        "total_price_u2": pa.array([int(tot)], pa.int64()),
        "n_items": pa.array([int(n)], pa.int64()),
    })


SMALL_QTY_REVENUE_SQL = f"""
WITH pavg AS (
  SELECT l_partkey AS pk,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sum_qty_u2,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{SMALL_QTY_BRAND}'
  GROUP BY 1
)
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)), 0)
        AS BIGINT) AS total_price_u2,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
  JOIN pavg ON pk = l_partkey
WHERE p_brand = '{SMALL_QTY_BRAND}'
  AND 5 * CAST(ROUND(l_quantity * 100) AS BIGINT) * cnt < sum_qty_u2
"""


# --------------------------------------------------------------------------
# Q9 shape: profit rollup grouped by attached dim attr x derived year
# --------------------------------------------------------------------------

PRODUCT_PROFIT_TOKEN = "red"


def product_profit(lineitem_ds, part_tbl: pa.Table, supplier_tbl: pa.Table,
                   nation_tbl: pa.Table, token: str = PRODUCT_PROFIT_TOKEN):
    """TPC-H-Q9 shape: profit per (supplier nation, ship year) over
    lineitems of parts whose name contains a token.  Profit is revenue
    minus retail cost, both in exact 1e-4-dollar integer units:
    ``amount_u4 = price_u2*(100-disc_u2) - retail_u2*qty_u2`` (no
    partsupp table in the corpus, so p_retailprice stands in for
    ps_supplycost; same plan shape).

    Discipline: part-name predicate and both dim attrs fold driver-side
    into dense broadcast arrays; each lineitem block bincounts amount
    into a (nation x year) grid — partials are grid-sized, the fact
    table never shuffles, zero exchange.
    """
    import ray

    pk = part_tbl["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_part = int(pk.max()) + 1 if len(pk) else 0
    match = np.zeros(n_part, bool)
    match[pk] = np.asarray(pc.match_substring(
        part_tbl["p_name"], token).to_numpy(zero_copy_only=False))
    retail = np.zeros(n_part, np.int64)
    retail[pk] = np.round(part_tbl["p_retailprice"].to_numpy(
        zero_copy_only=False) * 100).astype(np.int64)
    sk = supplier_tbl["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snk = supplier_tbl["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    supp_nation = np.full(int(sk.max()) + 1 if len(sk) else 0, -1, np.int16)
    supp_nation[sk] = snk.astype(np.int16)
    nk = nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_nation = int(nk.max()) + 1 if len(nk) else 0
    nnames = np.empty(n_nation, dtype=object)
    nnames[nk] = np.asarray(nation_tbl["n_name"].to_pylist(), dtype=object)
    match_ref = ray.put(match)
    retail_ref = ray.put(retail)
    supp_ref = ray.put(supp_nation)
    yr0, yr1 = 1970, 2100
    n_yr = yr1 - yr0

    def partial(t: pa.Table) -> pa.Table:
        m_map = ray.get(match_ref)
        r_map = ray.get(retail_ref)
        sn_map = ray.get(supp_ref)
        lpk = t["l_partkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = m_map[lpk]
        lpk = lpk[keep]
        lsk = t["l_suppkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        ship = t["l_shipdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        qty = np.round(t["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep] * 100).astype(np.int64)
        price = np.round(t["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep] * 100).astype(np.int64)
        disc = np.round(t["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep] * 100).astype(np.int64)
        amount = price * (100 - disc) - r_map[lpk] * qty
        yr = ship.astype("datetime64[us]").astype(
            "datetime64[Y]").astype(np.int64) + 1970
        cell = sn_map[lsk].astype(np.int64) * n_yr + (yr - yr0)
        s = np.zeros(n_nation * n_yr, np.int64)
        c = np.zeros(n_nation * n_yr, np.int64)
        np.add.at(s, cell, amount)
        np.add.at(c, cell, 1)
        nz = np.flatnonzero(c)
        return pa.table({
            "cell": pa.array(nz, pa.int64()),
            "amount_u4": pa.array(s[nz], pa.int64()),
            "n": pa.array(c[nz], pa.int64()),
        })

    s = np.zeros(n_nation * n_yr, np.int64)
    c = np.zeros(n_nation * n_yr, np.int64)
    for b in lineitem_ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        idx = t["cell"].to_numpy(zero_copy_only=False)
        np.add.at(s, idx, t["amount_u4"].to_numpy(zero_copy_only=False))
        np.add.at(c, idx, t["n"].to_numpy(zero_copy_only=False))
    nz = np.flatnonzero(c)
    return pa.table({
        "nation": pa.array(nnames[nz // n_yr].tolist(), pa.string()),
        "o_year": pa.array(nz % n_yr + yr0, pa.int64()),
        "amount_u4": pa.array(s[nz], pa.int64()),
        "n_items": pa.array(c[nz], pa.int64()),
    })


PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
            - CAST(ROUND(p_retailprice * 100) AS BIGINT)
              * CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS amount_u4,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%{PRODUCT_PROFIT_TOKEN}%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q20 shape: correlated comparison between two aggregates of the same group
# --------------------------------------------------------------------------

SURPLUS_PREFIX = "red"
SURPLUS_YEAR = 1997
# keep suppliers whose window share exceeds 1/SURPLUS_MULT of all-time
# (the corpus spans 7 ship years, so >1/5 is a meaningfully hot year)
SURPLUS_MULT = 5


def surplus_suppliers(lineitem_ds, part_tbl: pa.Table,
                      supplier_tbl: pa.Table, nation_tbl: pa.Table,
                      prefix: str = SURPLUS_PREFIX,
                      year: int = SURPLUS_YEAR,
                      mult: int = SURPLUS_MULT):
    """TPC-H-Q20 shape: suppliers whose shipped quantity of name-prefixed
    parts in one year exceeds 1/``mult`` of their all-time shipped
    quantity of those parts — a correlated comparison between two
    aggregates of the same group (no partsupp/availqty in the corpus, so
    the all-time sum stands in for ps_availqty; same correlated shape).

    Discipline: part predicate broadcast dense; each lineitem block
    bincounts the windowed and the all-time quantity into two dense
    |suppliers| vectors; the driver merges and evaluates
    ``mult*win_u2 > tot_u2`` exactly in integer quantity units.  Zero
    exchange — partials are dimension-sized.
    """
    import ray

    pk = part_tbl["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_part = int(pk.max()) + 1 if len(pk) else 0
    match = np.zeros(n_part, bool)
    match[pk] = np.asarray(pc.starts_with(
        part_tbl["p_name"], prefix).to_numpy(zero_copy_only=False))
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
    match_ref = ray.put(match)
    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        m_map = ray.get(match_ref)
        lpk = t["l_partkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = m_map[lpk]
        lsk = t["l_suppkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        ship = t["l_shipdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        qty = np.round(t["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep] * 100).astype(np.int64)
        tot = np.zeros(n_supp, np.int64)
        win = np.zeros(n_supp, np.int64)
        np.add.at(tot, lsk, qty)
        inwin = (ship >= lo) & (ship < hi)
        np.add.at(win, lsk[inwin], qty[inwin])
        nz = np.flatnonzero(tot)
        return pa.table({
            "suppkey": pa.array(nz, pa.int64()),
            "tot_u2": pa.array(tot[nz], pa.int64()),
            "win_u2": pa.array(win[nz], pa.int64()),
        })

    tot = np.zeros(n_supp, np.int64)
    win = np.zeros(n_supp, np.int64)
    for b in lineitem_ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        idx = t["suppkey"].to_numpy(zero_copy_only=False)
        np.add.at(tot, idx, t["tot_u2"].to_numpy(zero_copy_only=False))
        np.add.at(win, idx, t["win_u2"].to_numpy(zero_copy_only=False))
    sel = np.flatnonzero((tot > 0) & (mult * win > tot))
    order = np.argsort(sel)
    sel = sel[order]
    return pa.table({
        "s_suppkey": pa.array(sel, pa.int64()),
        "s_name": pa.array(names[sel].tolist(), pa.string()),
        "s_nation": pa.array(nnames[supp_nation[sel]].tolist(), pa.string()),
        "win_qty_u2": pa.array(win[sel], pa.int64()),
        "tot_qty_u2": pa.array(tot[sel], pa.int64()),
    })


SURPLUS_SUPPLIERS_SQL = f"""
WITH q AS (
  SELECT l_suppkey AS sk,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS tot_u2,
         CAST(COALESCE(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
             FILTER (WHERE l_shipdate >= TIMESTAMP '{SURPLUS_YEAR}-01-01'
                       AND l_shipdate <  TIMESTAMP '{SURPLUS_YEAR + 1}-01-01'),
             0) AS BIGINT) AS win_u2
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '{SURPLUS_PREFIX}%'
  GROUP BY 1
)
SELECT s_suppkey, s_name, n_name AS s_nation,
       win_u2 AS win_qty_u2, tot_u2 AS tot_qty_u2
FROM q
JOIN supplier ON s_suppkey = sk
JOIN nation ON n_nationkey = s_nationkey
WHERE tot_u2 > 0 AND {SURPLUS_MULT} * win_u2 > tot_u2
"""


# --------------------------------------------------------------------------
# Q8 shape: conditional share of a rollup (numerator/denominator per group)
# --------------------------------------------------------------------------

MARKET_TYPE = "MEDIUM"
MARKET_NATION = "NATION_3"
MARKET_REGION = "ASIA"


def market_share(orders_ds, lineitem_ds, customer_tbl: pa.Table,
                 supplier_tbl: pa.Table, nation_tbl: pa.Table,
                 region_tbl: pa.Table, part_tbl: pa.Table,
                 p_type: str = MARKET_TYPE, target_nation: str = MARKET_NATION,
                 cust_region: str = MARKET_REGION, num_partitions: int = 8):
    """TPC-H-Q8 shape: per order-year market share — the fraction of
    revenue supplied by one nation among lineitems of one part type sold
    to customers of one region.  Share is reported as exact integer
    numerator/denominator (``share_num_u4 / share_den_u4``) so the
    result is bit-identical under any partitioning — no float division
    inside the engine.

    Discipline (the Q7 plan with a conditional measure): part-type and
    customer-region predicates and the supplier->is-target-nation flag
    fold driver-side into dense broadcast arrays; the lineitem side
    filters by part type and pre-reduces to one (orderkey, rev, tgt_rev)
    row per block-order; the orders side filters to in-region customers
    (shrinking the exchange) and ships (orderkey, year).  ONE tag-union
    keyed exchange on orderkey, per-partition year rollup, tiny driver
    merge.  Reference has no joins/aggregates (SURVEY.md §2.4/2.5).
    """
    import ray

    # dense part-type mask
    pk = part_tbl["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_part = int(pk.max()) + 1 if len(pk) else 0
    type_mask = np.zeros(n_part, bool)
    type_mask[pk] = np.asarray(
        pc.equal(part_tbl["p_type"], p_type).to_numpy(zero_copy_only=False))
    # nation name -> key; region name -> set of nation keys
    nk = nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_nation = int(nk.max()) + 1 if len(nk) else 0
    nname = np.asarray(nation_tbl["n_name"].to_pylist(), dtype=object)
    nregion = nation_tbl["n_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    rk = region_tbl["r_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    rname = np.asarray(region_tbl["r_name"].to_pylist(), dtype=object)
    target_nk = {n: k for k, n in zip(nk, nname)}[target_nation]
    region_key = {n: k for k, n in zip(rk, rname)}[cust_region]
    nation_in_region = np.zeros(n_nation, bool)
    nation_in_region[nk[nregion == region_key]] = True
    # supplier -> is-target flag; customer -> in-region flag
    sk = supplier_tbl["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snk = supplier_tbl["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    supp_target = np.zeros(int(sk.max()) + 1 if len(sk) else 0, bool)
    supp_target[sk] = snk == target_nk
    ck = customer_tbl["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnk = customer_tbl["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cust_in = np.zeros(int(ck.max()) + 1 if len(ck) else 0, bool)
    cust_in[ck] = nation_in_region[cnk]
    type_ref = ray.put(type_mask)
    supp_ref = ray.put(supp_target)
    cust_ref = ray.put(cust_in)

    schema = pa.schema([
        ("jkey", pa.int64()), ("tag", pa.int8()), ("rev_u4", pa.int64()),
        ("tgt_u4", pa.int64()), ("yr", pa.int64()),
    ])

    def lineitem_partial(t: pa.Table) -> pa.Table:
        t_map = ray.get(type_ref)
        s_map = ray.get(supp_ref)
        lpk = t["l_partkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = t_map[lpk]
        k = t["l_orderkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        lsk = t["l_suppkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        price = t["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep]
        disc = t["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep]
        rev = np.round(price * 100).astype(np.int64) * (
            100 - np.round(disc * 100).astype(np.int64))
        tgt = np.where(s_map[lsk], rev, 0)
        order = np.argsort(k, kind="stable")
        k, rev, tgt = k[order], rev[order], tgt[order]
        if len(k):
            new = k[1:] != k[:-1]
            starts = np.concatenate([[0], np.flatnonzero(new) + 1])
            rsum = np.add.reduceat(rev, starts)
            tsum = np.add.reduceat(tgt, starts)
        else:
            starts = np.empty(0, np.int64)
            rsum = tsum = np.empty(0, np.int64)
        m = len(starts)
        return pa.table({
            "jkey": pa.array(k[starts] if m else [], pa.int64()),
            "tag": pa.array(np.ones(m, np.int8), pa.int8()),
            "rev_u4": pa.array(rsum, pa.int64()),
            "tgt_u4": pa.array(tsum, pa.int64()),
            "yr": pa.nulls(m, pa.int64()),
        }).cast(schema)

    def orders_side(t: pa.Table) -> pa.Table:
        c_map = ray.get(cust_ref)
        cust = t["o_custkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = c_map[cust]
        k = t["o_orderkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        od = t["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        yr = od.astype("datetime64[us]").astype(
            "datetime64[Y]").astype(np.int64) + 1970
        m = len(k)
        return pa.table({
            "jkey": pa.array(k, pa.int64()),
            "tag": pa.array(np.zeros(m, np.int8), pa.int8()),
            "rev_u4": pa.nulls(m, pa.int64()),
            "tgt_u4": pa.nulls(m, pa.int64()),
            "yr": pa.array(yr, pa.int64()),
        }).cast(schema)

    mixed = lineitem_ds.map_batches(lineitem_partial, batch_format="pyarrow").union(
        orders_ds.map_batches(orders_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    part_schema = pa.schema([
        ("yr", pa.int64()), ("num_u4", pa.int64()), ("den_u4", pa.int64()),
    ])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        lin = tag == 1
        osel = np.flatnonzero(tag == 0)
        if not lin.any() or len(osel) == 0:
            return part_schema.empty_table()

        def _i64(col):
            # fill the other tag's union-nulls so the lane stays int64
            return pc.fill_null(t[col].combine_chunks(), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)

        ok = k[osel]
        oyr = _i64("yr")[osel]
        oorder = np.argsort(ok, kind="stable")
        ok, oyr = ok[oorder], oyr[oorder]
        lk = k[lin]
        pos = np.searchsorted(ok, lk)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == lk
        if not hit.any():
            return part_schema.empty_table()
        rev = _i64("rev_u4")[lin][hit]
        tgt = _i64("tgt_u4")[lin][hit]
        yr = oyr[pos_c[hit]]
        uy, inv = np.unique(yr, return_inverse=True)
        num = np.zeros(len(uy), np.int64)
        den = np.zeros(len(uy), np.int64)
        np.add.at(num, inv, tgt)
        np.add.at(den, inv, rev)
        return pa.table({
            "yr": pa.array(uy, pa.int64()),
            "num_u4": pa.array(num, pa.int64()),
            "den_u4": pa.array(den, pa.int64()),
        }).cast(part_schema)

    partials = mixed.map_batches(combine, batch_format="pyarrow",
                                 batch_size=None)
    acc: dict[int, list[int]] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for yr, nu, de in zip(t["yr"].to_pylist(), t["num_u4"].to_pylist(),
                              t["den_u4"].to_pylist()):
            e = acc.setdefault(yr, [0, 0])
            e[0] += nu
            e[1] += de
    years = sorted(acc)
    return pa.table({
        "o_year": pa.array(years, pa.int64()),
        "share_num_u4": pa.array([acc[y][0] for y in years], pa.int64()),
        "share_den_u4": pa.array([acc[y][1] for y in years], pa.int64()),
    })


MARKET_SHARE_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN nation.n_name = '{MARKET_NATION}'
                THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                ELSE 0 END) AS BIGINT) AS share_num_u4,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS share_den_u4
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN customer ON c_custkey = o_custkey
JOIN nation nc ON nc.n_nationkey = c_nationkey
JOIN region ON r_regionkey = nc.n_regionkey
WHERE p_type = '{MARKET_TYPE}' AND r_name = '{MARKET_REGION}'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q6 shape: pure filter + global sum (no group, no join)
# --------------------------------------------------------------------------

FORECAST_YEAR = 1996
FORECAST_DISC_LO = 5   # discount u2 units, inclusive
FORECAST_DISC_HI = 7
FORECAST_MAX_QTY = 24  # exclusive, whole units


def forecast_revenue(lineitem_ds, year: int = FORECAST_YEAR,
                     disc_lo: int = FORECAST_DISC_LO,
                     disc_hi: int = FORECAST_DISC_HI,
                     max_qty: int = FORECAST_MAX_QTY):
    """TPC-H-Q6 shape: the would-be revenue increase from dropping a
    discount band — a pure filter + ungrouped global SUM, the simplest
    member of the aggregation family (the reference never aggregates —
    SURVEY.md §2.5).

    Discipline: every block reduces to TWO scalars (revenue, count); the
    driver adds |blocks| rows.  Revenue is the exact int64 product
    price_u2 * disc_u2 (1e-4-dollar units); the discount band compares
    in integer u2 units so 0.05 <= d <= 0.07 is exact, never a float
    BETWEEN.  Zero shuffle, zero join — the floor of the shape family.
    """
    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)
    qty_hi_u2 = max_qty * 100

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        disc = np.round(t["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        qty = np.round(t["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        keep = ((ship >= lo) & (ship < hi)
                & (disc >= disc_lo) & (disc <= disc_hi)
                & (qty < qty_hi_u2))
        price = np.round(t["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)[keep] * 100).astype(np.int64)
        rev = int((price * disc[keep]).sum())
        return pa.table({
            "revenue_u4": pa.array([rev], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64()),
        })

    rev = 0
    n = 0
    for b in lineitem_ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        rev += int(t["revenue_u4"].to_numpy(zero_copy_only=False).sum())
        n += int(t["n_items"].to_numpy(zero_copy_only=False).sum())
    return pa.table({
        "revenue_u4": pa.array([rev], pa.int64()),
        "n_items": pa.array([n], pa.int64()),
    })


FORECAST_REVENUE_SQL = f"""
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_u4,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{FORECAST_YEAR}-01-01'
  AND l_shipdate <  TIMESTAMP '{FORECAST_YEAR + 1}-01-01'
  AND CAST(ROUND(l_discount * 100) AS BIGINT)
        BETWEEN {FORECAST_DISC_LO} AND {FORECAST_DISC_HI}
  AND CAST(ROUND(l_quantity * 100) AS BIGINT) < {FORECAST_MAX_QTY * 100}
"""


# --------------------------------------------------------------------------
# Q11 shape: HAVING against a scalar-subquery fraction of the global sum
# --------------------------------------------------------------------------

# keep parts whose traded value exceeds SHARE_NUM/SHARE_DEN x the average
PART_SHARE_NUM = 5
PART_SHARE_DEN = 4


def part_value_share(lineitem_ds, share_num: int = PART_SHARE_NUM,
                     share_den: int = PART_SHARE_DEN):
    """TPC-H-Q11 shape: groups whose aggregate exceeds a scalar-subquery
    fraction of the global aggregate (no partsupp table in the corpus, so
    per-part traded value qty*price over lineitem stands in for
    ps_supplycost*ps_availqty; same HAVING-vs-global shape).

    Discipline: one streaming pass of dense |parts|-sized int64 bincount
    partials (parts are dimension-sized); the driver merges blocks and
    evaluates ``val * n_parts * den > num * total`` in Python
    arbitrary-precision ints — the global total never rides a shuffle
    and the threshold needs no second pass.  Zero exchange.
    """
    max_pk = [0]

    def partial(t: pa.Table) -> pa.Table:
        lpk = t["l_partkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        qty = np.round(t["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        price = np.round(t["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        val = qty * price
        n = int(lpk.max()) + 1 if len(lpk) else 0
        acc = np.zeros(n, np.int64)
        np.add.at(acc, lpk, val)
        nz = np.flatnonzero(acc)
        return pa.table({
            "pk": pa.array(nz, pa.int64()),
            "val_u4": pa.array(acc[nz], pa.int64()),
        })

    acc: dict[int, int] = {}
    for b in lineitem_ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for k, v in zip(t["pk"].to_numpy(zero_copy_only=False),
                        t["val_u4"].to_numpy(zero_copy_only=False)):
            acc[int(k)] = acc.get(int(k), 0) + int(v)
    total = sum(acc.values())
    n_parts = len(acc)
    keep = [(v, k) for k, v in acc.items()
            if v * n_parts * share_den > share_num * total]
    keep.sort(key=lambda t: (-t[0], t[1]))
    return pa.table({
        "l_partkey": pa.array([k for _, k in keep], pa.int64()),
        "value_u4": pa.array([v for v, _ in keep], pa.int64()),
    })


PART_VALUE_SHARE_SQL = f"""
WITH v AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_u4
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, value_u4
FROM v
WHERE CAST(value_u4 AS HUGEINT) * (SELECT COUNT(*) FROM v)
        * {PART_SHARE_DEN}
      > {PART_SHARE_NUM} * (SELECT SUM(CAST(value_u4 AS HUGEINT)) FROM v)
ORDER BY value_u4 DESC, l_partkey
"""
