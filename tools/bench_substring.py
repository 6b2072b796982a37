"""Exact vs winnow-prefiltered substring dedup at synthetic scale.

Generates a deterministic corpus of documents with planted duplicated
templates (duplication fraction ~10%), then times the exact gram-exchange
path against the prefiltered path on identical input and checks their
outputs match.  Usage:

    python tools/bench_substring.py [n_docs] [num_cpus]

Prints one JSON line; evidence for the BASELINE.md scale-path table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def build_corpus(path: str, n_docs: int, seed: int = 13) -> None:
    """Unique random bodies (high-entropy hex tokens -> no chance 30-char
    collisions) with a duplicated 70-char template planted in every 10th
    doc; ~20 docs share each template."""
    rng = np.random.default_rng(seed)

    def tokens(n, r):
        return " ".join(format(x, "010x") for x in r.integers(0, 1 << 40, size=n))

    templates = [tokens(7, rng) for _ in range(max(8, n_docs // 200))]
    texts = []
    for i in range(n_docs):
        body = tokens(24, rng)
        if i % 10 == 0:  # planted duplicated template somewhere in the middle
            tpl = templates[int(rng.integers(len(templates)))]
            cut = len(body) // 2
            body = body[:cut] + " " + tpl + " " + body[cut:]
        texts.append(body)
    t = pa.table(
        {"doc_id": pa.array(np.arange(n_docs, dtype=np.int64)), "text": texts}
    )
    pq.write_table(t, path)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    path = f"/tmp/substring_bench_{n_docs}.parquet"
    if not os.path.exists(path):
        build_corpus(path, n_docs)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    from fastcdc_rs_ray.stages.substring import substring_dups
    from fastcdc_rs_ray.stages.winnow import substring_dups_winnowed

    total_bytes = os.path.getsize(path)
    parts = max(num_cpus, 16)
    results = {}
    outputs = {}
    for name, fn in (
        ("exact", lambda ds: substring_dups(ds, 30, num_partitions=parts)),
        ("winnowed", lambda ds: substring_dups_winnowed(ds, 30, num_partitions=parts)),
    ):
        ds = rd.read_parquet(path, columns=["doc_id", "text"])
        t0 = time.time()
        rows = fn(ds).take_all()
        wall = time.time() - t0
        results[name] = round(wall, 2)
        outputs[name] = sorted(
            (r["doc_id"], r["dup_grams"], r["dup_chars"]) for r in rows
        )
    match = outputs["exact"] == outputs["winnowed"]

    # exchange-traffic accounting: the scale argument in rows, not seconds
    # (single-box wall times are dominated by per-exchange fixed costs)
    from fastcdc_rs_ray.stages.winnow import winnow_candidates, winnow_fingerprints

    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    lens = pq.read_table(path, columns=["text"])
    import pyarrow.compute as pc

    nb = pc.binary_length(lens["text"]).to_numpy()
    exact_rows = int(np.maximum(nb - 29, 0).sum())  # one 20-byte row per gram
    fp_rows = winnow_fingerprints(ds, 30).count()
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    cand_pairs = winnow_candidates(ds, 30, num_partitions=parts,
                                   max_group=1 << 62, self_pairs=True).count()
    print(
        json.dumps(
            {
                "metric": "substring_dedup_exact_vs_winnowed",
                "n_docs": n_docs,
                "parquet_bytes": total_bytes,
                "num_cpus": num_cpus,
                "exact_sec": results["exact"],
                "winnowed_sec": results["winnowed"],
                "dup_docs": len(outputs["exact"]),
                "outputs_match": match,
                "exact_exchange_rows": exact_rows,
                "winnow_fingerprint_rows": fp_rows,
                "winnow_candidate_pairs": cand_pairs,
                "fingerprint_fraction": round(fp_rows / max(exact_rows, 1), 4),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
