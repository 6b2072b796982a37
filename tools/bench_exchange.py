"""Exchange-row accounting for the late round-1 operators at sf0.1: how
many rows each op's widest exchange moves vs the raw input — the scale
argument that survives single-box wall-clock noise (same methodology as
BASELINE.md's substring-tier table).

Usage: python tools/bench_exchange.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import ray.data as rd

    out = {}

    # funnel: per-user partials vs raw events
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    n_events = ev.count()
    from fastcdc_rs_ray.stages.funnel import funnel_conversions  # noqa: F401
    import fastcdc_rs_ray.stages.funnel as fn

    parts = ev.map_batches(
        # reach into the stage's partial via a tiny local clone of its body
        lambda t: _funnel_partial(t), batch_format="pyarrow").count()
    out["funnel"] = {"raw_events": n_events, "exchange_rows": parts,
                     "ratio": round(parts / max(n_events, 1), 4)}

    # tfidf: (block, token, lang) partials vs token occurrences
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    from fastcdc_rs_ray.functions.text import TOKEN_RE, _flat_tokens
    import pyarrow.compute as pc

    occ = docs.map_batches(
        lambda t: pa.table({"n": pa.array(
            [int(pc.sum(pc.count_substring_regex(
                t["text"].combine_chunks(), TOKEN_RE)).as_py() or 0)],
            pa.int64())}),
        batch_format="pyarrow").to_pandas()["n"].sum()
    from fastcdc_rs_ray.stages.tfidf import _partial as tfidf_partial

    tp = docs.map_batches(tfidf_partial, batch_format="pyarrow").count()
    out["tfidf"] = {"token_occurrences": int(occ), "exchange_rows": int(tp),
                    "ratio": round(int(tp) / max(int(occ), 1), 4)}

    # interval join: replication factor (exact by construction)
    out["interval_join"] = {"replication_factor": 2.0,
                            "note": "every event to buckets b and b+1"}

    # decontaminate / bloom semi / quantile sketch: zero exchange
    out["zero_shuffle"] = ["decontaminate", "bloom_semi_stats",
                           "value_quantiles_sketch", "watermark_windows",
                           "token_count_bpe", "pii_redact", "repetition"]

    print(json.dumps(out))
    ray.shutdown()
    return 0


def _funnel_partial(t: pa.Table) -> pa.Table:
    from fastcdc_rs_ray.stages.funnel import _empty_partial
    import numpy as np
    import pyarrow.compute as pc

    et = t["event_type"].combine_chunks()
    keep = pc.is_in(et, value_set=pa.array(["signup", "purchase"]))
    t = t.filter(keep)
    if len(t) == 0:
        return _empty_partial()
    uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
    uu = np.unique(uid)
    return pa.table({"user_id": pa.array(uu, pa.int64()),
                     "min_s": pa.array(np.zeros(len(uu), np.int64)),
                     "max_p": pa.array(np.zeros(len(uu), np.int64))})


if __name__ == "__main__":
    raise SystemExit(main())
