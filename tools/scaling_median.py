"""Pin the weak-scaling >=0.8 point statistically (verdict r1 item 6).

Runs the weak-scaling pair (lo cpus on a lo/hi-sized corpus vs hi cpus on
the full corpus) N times, records each sample's host first-touch probe,
and reports the median efficiency over QUIET samples (probe < 1.5 s on
both legs' surrounding probes).  One table row for BASELINE.md.

Usage:  python tools/scaling_median.py [n_samples] [--distributed]

``--distributed`` pins the fully-distributed flagship shape instead
(GRAFT_SCALE_MODE=distributed: shuffle verify + BSP actor-pool CC, no
driver-resident data-proportional stage — the multi-node configuration;
verdict r2 item 8 asked for the same 15-sample protocol there).
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo root on path; run from /root/repo)

QUIET_S = 1.5


def main(n: int = 6, distributed: bool = False) -> None:
    if distributed:
        os.environ["GRAFT_SCALE_MODE"] = "distributed"
    lo, hi = 8, 32
    full = bench._prepare_corpus(bench.SCALE_CONVS, bench.SCALE_CORPUS)
    small = bench._prepare_corpus(
        bench.SCALE_CONVS * lo // hi, bench.SCALE_CORPUS + "_small"
    )
    samples = []
    for i in range(n):
        p0 = bench._first_touch_probe()
        w = bench._scaling_child(small, lo)
        b = bench._scaling_child(full, hi)
        p1 = bench._first_touch_probe()
        eff = (b["turns_per_sec"] / hi) / (w["turns_per_sec"] / lo)
        s = {
            "i": i,
            "eff_weak": round(eff, 3),
            "lo_sec": w["value"],
            "hi_sec": b["value"],
            "lo_tps": w["turns_per_sec"],
            "hi_tps": b["turns_per_sec"],
            "probe_before": p0,
            "probe_after": p1,
            "probe_lo": w["host_first_touch_200mb_s"],
            "probe_hi": b["host_first_touch_200mb_s"],
            "quiet": max(p0, p1, w["host_first_touch_200mb_s"],
                         b["host_first_touch_200mb_s"]) < QUIET_S,
        }
        samples.append(s)
        print(json.dumps(s), flush=True)
        time.sleep(2)
    quiet = [s["eff_weak"] for s in samples if s["quiet"]]
    out = {
        "metric": ("weak_scaling_median_distributed" if distributed
                   else "weak_scaling_median"),
        "n_samples": n,
        "n_quiet": len(quiet),
        "median_quiet_eff": round(statistics.median(quiet), 3) if quiet else None,
        "median_all_eff": round(
            statistics.median(s["eff_weak"] for s in samples), 3
        ),
        "all": [s["eff_weak"] for s in samples],
        "quiet_threshold_s": QUIET_S,
        "lo_cpus": lo,
        "hi_cpus": hi,
        "n_convs_hi": bench.SCALE_CONVS,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--distributed"]
    main(int(args[0]) if args else 6,
         distributed="--distributed" in sys.argv)
