"""Decontamination: drop training docs that share an L-gram with a
benchmark/eval set — the train/test-overlap removal every serious
training-data pipeline runs (n-gram overlap decontamination as popularized
by public LM training reports).

Shape: the benchmark side is small BY DEFINITION (eval sets are thousands
of docs, the corpus is billions), so its distinct gram-hash universe
collects to the driver once and broadcasts as a Bloom filter (certain-miss
pruning, functions/bloom.py) plus the exact sorted hash array (kills the
false positives); the 100 TB training side streams through one
``map_batches`` — no shuffle at all.  Gram hashing reuses the exact
rolling-hash kernel of the substring tier (stages/substring.py:
window_hashes).

Benchmark membership here is the deterministic slice ``doc_id %
bench_mod == 0`` (stand-in for a real eval-set id list); output is the
contaminated NON-benchmark doc ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bloom import BloomFilter
from .substring import window_hashes

L_DECON = 30


def decontaminate(documents_ds, L: int = L_DECON, bench_mod: int = 50,
                  log2_bits: int = 18):
    """-> Dataset of (doc_id) for non-benchmark docs sharing >= 1 L-gram
    with any benchmark doc."""
    import ray

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = (ids % bench_mod) == 0
        sub = t.filter(pa.array(keep))
        if len(sub) == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        keys, _, _ = window_hashes(sub, L)
        return pa.table({"h": pa.array(np.unique(keys), pa.uint64())})

    parts = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in documents_ds.map_batches(bench_grams, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    bench = np.unique(parts["h"].combine_chunks().to_numpy(
        zero_copy_only=False))
    bloom = BloomFilter.build(bench.view(np.int64), log2_bits=log2_bits, k=4)
    bref = ray.put(bloom)
    kref = ray.put(bench)

    out_schema = pa.schema([("doc_id", pa.int64())])

    def probe(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = (ids % bench_mod) != 0
        sub = t.filter(pa.array(keep))
        if len(sub) == 0:
            return out_schema.empty_table()
        keys, row_idx, _ = window_hashes(sub, L)
        if len(keys) == 0:
            return out_schema.empty_table()
        bf: BloomFilter = ray.get(bref)
        cand = bf.contains(keys.view(np.int64))
        if not cand.any():
            return out_schema.empty_table()
        exact = ray.get(kref)
        ck = keys[cand]
        pos = np.searchsorted(exact, ck)
        pos_c = np.minimum(pos, len(exact) - 1)
        hit_rows = row_idx[np.flatnonzero(cand)[exact[pos_c] == ck]]
        if len(hit_rows) == 0:
            return out_schema.empty_table()
        sub_ids = sub["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({"doc_id": pa.array(
            np.unique(sub_ids[hit_rows]), pa.int64())})

    return documents_ds.map_batches(probe, batch_format="pyarrow")


DECONTAMINATE_SQL = f"""
WITH bg AS (
  SELECT DISTINCT substring(text, i, {L_DECON}) AS g
  FROM documents, unnest(generate_series(1, length(text) - {L_DECON - 1}))
       AS u(i)
  WHERE doc_id % 50 = 0 AND length(text) >= {L_DECON}
)
SELECT DISTINCT doc_id FROM (
  SELECT d.doc_id, substring(d.text, i, {L_DECON}) AS g
  FROM documents d,
       unnest(generate_series(1, length(d.text) - {L_DECON - 1})) AS u(i)
  WHERE d.doc_id % 50 <> 0 AND length(d.text) >= {L_DECON}
) q JOIN bg USING (g)
"""
