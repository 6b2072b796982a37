"""Table profiler: per-column rows / nulls / exact NDV / min / max.

The data-quality entry point of an ingest pipeline ("what actually landed
in this table?") as one distributed pass: every block emits (a) a tiny
stats partial per column (count, nulls, min, max — all mergeable) and
(b) the block-distinct value hashes per column; one exchange keyed by
(column, value-hash) makes per-partition distinct counts exact and
additive (the stats partials all carry one salt hash, so a column's stats
fold entirely inside one partition), and the driver folds a
dimension-sized partial table (columns × partitions rows).  Nothing
data-proportional ever reaches the driver.

min/max are reported as strings (`min_s`/`max_s`): integer columns fold
numerically and render decimally (identical in NumPy and DuckDB's VARCHAR
cast), string columns compare byte-wise (both engines).  Float/timestamp
columns are excluded by default because VARCHAR renderings diverge
between engines — the profile is an oracle-checked operator, not a
best-effort printout.

NDV is exact at oracle scales via 64-bit value hashes (same collision
budget as exact_dedup; the 128-bit upgrade is a key-width change).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import hash_str_array_u64, mix64

_STATS_SALT = np.uint64(0xA5A5A5A5A5A5A5A5)
_NO_INT = np.int64(np.iinfo(np.int64).min)  # sentinel: no int values seen


def _block_profile(int_cols: list[str], str_cols: list[str]):
    cols = list(int_cols) + list(str_cols)
    int_set = set(int_cols)

    def f(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in
                ("col_name", "h", "kind", "n", "nulls", "imn", "imx", "mn", "mx")}

        def push(column, h, kind, n=0, nulls=0, imn=int(_NO_INT),
                 imx=int(_NO_INT), mn="", mx=""):
            rows["col_name"].append(column)
            rows["h"].append(int(h))
            rows["kind"].append(kind)
            rows["n"].append(n)
            rows["nulls"].append(nulls)
            rows["imn"].append(imn)
            rows["imx"].append(imx)
            rows["mn"].append(mn)
            rows["mx"].append(mx)

        for name in cols:
            arr = t[name].combine_chunks()
            n, nulls = len(arr), arr.null_count
            vals = arr.drop_null()
            if name in int_set:
                v = vals.to_numpy(zero_copy_only=False).astype(np.int64)
                h = np.unique(mix64(v.view(np.uint64)))
                imn = int(v.min()) if len(v) else int(_NO_INT)
                imx = int(v.max()) if len(v) else int(_NO_INT)
                mn = mx = ""
            else:
                h = (np.unique(hash_str_array_u64(vals))
                     if len(vals) else np.empty(0, np.uint64))
                if len(vals):
                    mm = pc.min_max(vals)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                else:
                    mn = mx = ""
                imn = imx = int(_NO_INT)
            for hv in h.tolist():
                push(name, hv, 0)
            push(name, _STATS_SALT, 1, n, nulls, imn, imx, mn, mx)
        return pa.table(
            {
                "col_name": pa.array(rows["col_name"], pa.string()),
                "h": pa.array(np.asarray(rows["h"], np.uint64), pa.uint64()),
                "kind": pa.array(rows["kind"], pa.int8()),
                "n": pa.array(rows["n"], pa.int64()),
                "nulls": pa.array(rows["nulls"], pa.int64()),
                "imn": pa.array(rows["imn"], pa.int64()),
                "imx": pa.array(rows["imx"], pa.int64()),
                "mn": pa.array(rows["mn"], pa.string()),
                "mx": pa.array(rows["mx"], pa.string()),
            }
        )

    return f


def _partition_fold(t: pa.Table) -> pa.Table:
    """Per partition: distinct-count hash rows per column; fold stats
    partials (ints numerically, strings byte-wise).  Output is at most
    columns-sized."""
    empty = pa.table(
        {
            "col_name": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "n_nulls": pa.array([], pa.int64()),
            "n_distinct": pa.array([], pa.int64()),
            "min_s": pa.array([], pa.string()),
            "max_s": pa.array([], pa.string()),
        }
    )
    if t.num_rows == 0:
        return empty
    col = np.asarray(t["col_name"].combine_chunks(), dtype=object).astype("U")
    h = t["h"].combine_chunks().to_numpy()
    kind = t["kind"].combine_chunks().to_numpy(zero_copy_only=False)
    n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
    nulls = t["nulls"].combine_chunks().to_numpy(zero_copy_only=False)
    imn = t["imn"].combine_chunks().to_numpy(zero_copy_only=False)
    imx = t["imx"].combine_chunks().to_numpy(zero_copy_only=False)
    mn = np.asarray(t["mn"].combine_chunks(), dtype=object)
    mx = np.asarray(t["mx"].combine_chunks(), dtype=object)

    out = {k: [] for k in
           ("col_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")}
    for name in np.unique(col):
        m = col == name
        nd = len(np.unique(h[m & (kind == 0)]))
        st = m & (kind == 1)
        mins_i = imn[st][imn[st] != _NO_INT]
        maxs_i = imx[st][imx[st] != _NO_INT]
        mins_s = [v for v in mn[st] if v != ""]
        maxs_s = [v for v in mx[st] if v != ""]
        if len(mins_i):
            lo, hi = str(int(mins_i.min())), str(int(maxs_i.max()))
        elif mins_s:
            lo, hi = min(mins_s), max(maxs_s)
        else:
            lo = hi = ""
        out["col_name"].append(str(name))
        out["n_rows"].append(int(n[st].sum()))
        out["n_nulls"].append(int(nulls[st].sum()))
        out["n_distinct"].append(nd)
        out["min_s"].append(lo)
        out["max_s"].append(hi)
    return pa.table(
        {
            "col_name": pa.array(out["col_name"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "min_s": pa.array(out["min_s"], pa.string()),
            "max_s": pa.array(out["max_s"], pa.string()),
        }
    )


def table_profile(ds, int_cols: list[str], str_cols: list[str],
                  num_partitions: int = 8) -> pa.Table:
    """One row per profiled column: (column, n_rows, n_nulls, n_distinct,
    min_s, max_s).  NDV is exact: each value hash lands in exactly one
    partition, so per-partition distinct counts sum.  A column's stats
    partials share one salt hash and fold inside a single partition, so
    the driver only SUMS the dimension-sized partials (min/max arrive
    already folded; at most one partition contributes them per column)."""
    rows = ds.map_batches(_block_profile(int_cols, str_cols),
                          batch_format="pyarrow")
    rows = rows.repartition(num_blocks=num_partitions, keys=["col_name", "h"])
    parts = rows.map_batches(_partition_fold, batch_format="pyarrow",
                             batch_size=None).to_pandas()

    agg: dict[str, list] = {}
    for r in parts.itertuples(index=False):
        a = agg.setdefault(r.col_name, [0, 0, 0, "", ""])
        a[0] += r.n_rows
        a[1] += r.n_nulls
        a[2] += r.n_distinct
        if r.min_s != "":
            a[3], a[4] = r.min_s, r.max_s
    out = {k: [] for k in
           ("col_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")}
    for name in sorted(agg):
        a = agg[name]
        for k, v in zip(out, [name, a[0], a[1], a[2], a[3], a[4]]):
            out[k].append(v)
    return pa.table(
        {
            "col_name": pa.array(out["col_name"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "min_s": pa.array(out["min_s"], pa.string()),
            "max_s": pa.array(out["max_s"], pa.string()),
        }
    )


def profile_drift(ds_a, ds_b, int_cols: list[str], str_cols: list[str],
                  num_partitions: int = 8) -> pa.Table:
    """Data-drift report between two corpus slices/generations: one row
    per profiled column with both sides' row/NDV counts and a
    min-max-changed flag — the monitoring pass a long-lived ingest runs
    between crawl generations.  Two :func:`table_profile` executions
    (each one pass + one keyed exchange); the diff itself is
    dimension-sized driver work."""
    a = table_profile(ds_a, int_cols, str_cols, num_partitions)
    b = table_profile(ds_b, int_cols, str_cols, num_partitions)
    da = {a["col_name"][i].as_py(): i for i in range(len(a))}
    db = {b["col_name"][i].as_py(): i for i in range(len(b))}
    names = sorted(set(da) | set(db))
    out = {"col_name": [], "n_rows_a": [], "n_rows_b": [],
           "n_distinct_a": [], "n_distinct_b": [], "minmax_changed": []}
    for n in names:
        ia, ib = da.get(n), db.get(n)
        ra = int(a["n_rows"][ia].as_py()) if ia is not None else 0
        rb = int(b["n_rows"][ib].as_py()) if ib is not None else 0
        na = int(a["n_distinct"][ia].as_py()) if ia is not None else 0
        nb = int(b["n_distinct"][ib].as_py()) if ib is not None else 0
        mins_a = a["min_s"][ia].as_py() if ia is not None else ""
        mins_b = b["min_s"][ib].as_py() if ib is not None else ""
        maxs_a = a["max_s"][ia].as_py() if ia is not None else ""
        maxs_b = b["max_s"][ib].as_py() if ib is not None else ""
        out["col_name"].append(n)
        out["n_rows_a"].append(ra)
        out["n_rows_b"].append(rb)
        out["n_distinct_a"].append(na)
        out["n_distinct_b"].append(nb)
        out["minmax_changed"].append(
            1 if (mins_a != mins_b or maxs_a != maxs_b) else 0)
    return pa.table({
        "col_name": pa.array(out["col_name"], pa.string()),
        "n_rows_a": pa.array(out["n_rows_a"], pa.int64()),
        "n_rows_b": pa.array(out["n_rows_b"], pa.int64()),
        "n_distinct_a": pa.array(out["n_distinct_a"], pa.int64()),
        "n_distinct_b": pa.array(out["n_distinct_b"], pa.int64()),
        "minmax_changed": pa.array(out["minmax_changed"], pa.int8()),
    })
