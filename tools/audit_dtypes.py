"""Audit engine-vs-oracle pandas dtypes for every SQL-oracled query.

The driver's value normalizer is stricter than tools/verify_queries.py's
``%.9g`` float folding: a DuckDB HUGEINT (SUM over integers) arrives in
pandas as float64 while the engine emits int64, and the driver renders
``5000.0`` vs ``5000`` -> hash mismatch (round-1 conv_stats /
chunk_coverage / sessionize failures).  This tool flags every query whose
oracle column dtype-kind differs from the engine's so the oracle can be
CAST before the driver ever sees it.

Usage: python tools/audit_dtypes.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def kind(dtype) -> str:
    k = dtype.kind  # i/u -> int, f -> float, M -> ts, O -> obj, b -> bool
    return {"i": "int", "u": "int"}.get(k, k)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) or None
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    flagged = []
    for name, fn in qs.items():
        if name not in oracles or (only and name not in only):
            continue
        try:
            ours = to_pandas(fn(sf_dir))
            ref = con.execute(oracles[name]).fetch_df()
        except Exception as ex:
            print(f"ERR {name}: {type(ex).__name__}: {ex}")
            flagged.append(name)
            continue
        bad = []
        for c in ours.columns:
            if c not in ref.columns:
                bad.append(f"{c}: missing in oracle")
                continue
            ka, kb = kind(ours[c].dtype), kind(ref[c].dtype)
            if ka != kb:
                bad.append(f"{c}: engine {ours[c].dtype} vs oracle {ref[c].dtype}")
        if bad:
            flagged.append(name)
            print(f"DTYPE {name}: " + "; ".join(bad))
    print("FLAGGED:", flagged if flagged else "none")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
