"""Per-stage Ray Data stats for any driver query — the perf feedback loop.

Usage: python tools/stats_report.py <query_name> [sf_dir]

Runs the named queries() entry and prints Ray's per-operator wall/cpu/row
breakdown (``Dataset.stats()``) for every Dataset the query executes, so a
slow stage is visible without re-instrumenting.  Table results (already
collected on the driver) report only elapsed wall time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "8")), include_dashboard=False)
    from fastcdc_rs_ray.pipelines.queries import QUERIES

    t0 = time.perf_counter()
    res = QUERIES[name](sf_dir)
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, (pd.DataFrame, pa.Table)):
        wall = time.perf_counter() - t0
        print(f"{name}: driver-collected result, {len(res)} rows, "
              f"{wall:.2f}s total (per-stage stats consumed internally)")
    else:
        n = 0
        for b in res.iter_batches(batch_format="pyarrow"):
            n += b.num_rows if hasattr(b, "num_rows") else len(b)
        wall = time.perf_counter() - t0
        print(f"{name}: {n} rows, {wall:.2f}s total")
        print(res.stats())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
