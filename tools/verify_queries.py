"""Local replica of the driver's correctness gate: run every queries()
entry and compare row count + order-insensitive value hash against
oracle_sql() via DuckDB.  Usage: python tools/verify_queries.py [sf_dir]
[entry ...]; GRAFT_VERIFY_CPUS sets the replica's parallelism.

STANDING CLOSE-OUT PROTOCOL (VERDICT r4 item 7 — this found BOTH
round-4 bugs; do not shortcut it):

  Every round's close sweep MUST run the FULL registry at BOTH
  parallelisms and the LARGEST scale:

      GRAFT_VERIFY_CPUS=8  python tools/verify_queries.py /root/testdata/sf0.001
      GRAFT_VERIFY_CPUS=8  python tools/verify_queries.py /root/testdata/sf0.01
      GRAFT_VERIFY_CPUS=8  python tools/verify_queries.py /root/testdata/sf0.1
      GRAFT_VERIFY_CPUS=32 python tools/verify_queries.py /root/testdata/sf0.1
      GRAFT_VERIFY_CPUS=32 python tools/verify_queries.py /root/testdata/sf0.01

  Why 32 cpus matters: the driver gates at num_cpus=32, where reads
  split into many tiny blocks and iter_batches COALESCES partial
  blocks differently than at 8 cpus.  embed_outliers was red for two
  driver rounds while every 8-cpu replica run was green (the merge
  corrupted only under the 32-cpu block layout); the 32-cpu sf0.1
  sweep also exposed cluster_terms_gate counting over the wrong
  sub-corpus (embeddings:documents is 2:5 only at sf0.1).  A query is
  NOT verified until it hash-matches at the driver's parallelism and
  the largest scale.  Record the sweep results in BASELINE.md before
  closing the round."""

from __future__ import annotations

import hashlib
import sys
import time

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
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append("|".join(_norm(v) for v in tup))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def _norm(v) -> str:
    import numpy as np

    if isinstance(v, float) or isinstance(v, np.floating):
        return f"{v:.9g}"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) or None
    import ray

    # GRAFT_VERIFY_CPUS: the round-4 embed_outliers lesson — a merge bug
    # was only visible at the DRIVER's 32-cpu block layout while the
    # replica's default 8 cpus aligned accidentally.  Sweep at BOTH.
    import os

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("GRAFT_VERIFY_CPUS", "8")),
                 include_dashboard=False, ignore_reinit_error=True)
    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        wall = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(ours)} rows, {wall:.1f}s")
            continue
        try:
            ref = con.execute(oracles[name]).fetch_df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            failed.append(name)
            continue
        ok_rows = len(ours) == len(ref)
        ok_cols = sorted(ours.columns) == sorted(ref.columns)
        hv_a = value_hash(ours) if ok_cols else "-"
        hv_b = value_hash(ref) if ok_cols else "-"
        ok = ok_rows and ok_cols and hv_a == hv_b
        status = "ok" if ok else "FAIL"
        print(
            f"{status} {name}: rows {len(ours)}/{len(ref)} cols "
            f"{sorted(ours.columns)} vs {sorted(ref.columns)} hash {hv_a}/{hv_b} "
            f"{wall:.1f}s"
        )
        if not ok:
            failed.append(name)
            if ok_cols and len(ours) < 50 and len(ref) < 50:
                print("ours:\n", ours.sort_values(sorted(ours.columns)[0]).head(20))
                print("ref:\n", ref.sort_values(sorted(ref.columns)[0]).head(20))
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
