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


# --------------------------------------------------------------------------
# fuzzy decontamination: word n-gram overlap FRACTION (GPT-3-report style)
# --------------------------------------------------------------------------

W_CONTAM = 13          # word-gram width of the published LM decon recipes
TAU_PERMILLE = 80      # flag docs with >= 8% of their distinct grams hit

_GB = np.uint64(0x9E3779B97F4A7C15)  # odd -> injective-per-step fold


def word_gram_keys(t: pa.Table, W: int) -> tuple[np.ndarray, np.ndarray]:
    """(gram-key u64, row_idx) for every W-token window of every row.

    Key = polynomial fold of the W token hashes (W small and fixed, so W
    vectorized passes beat building prefix-product temporaries); equal
    token sequences get equal keys, distinct ones collide at the usual
    64-bit budget.
    """
    from ..functions.text import tokenize_hashes

    tok, offsets = tokenize_hashes(t)
    lens = np.diff(offsets)
    counts = np.maximum(lens - W + 1, 0)
    n_rows = len(lens)
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    cum = np.concatenate([[0], np.cumsum(counts)])
    g = np.arange(cum[-1], dtype=np.int64)
    starts = offsets[:-1][row_idx] + (g - cum[row_idx])
    keys = np.zeros(len(starts), np.uint64)
    for j in range(W):
        keys = keys * _GB + tok[starts + j]
    return keys, row_idx


def contamination_score(documents_ds, W: int = W_CONTAM, bench_mod: int = 50,
                        tau_permille: int = TAU_PERMILLE,
                        log2_bits: int = 18):
    """Per-non-benchmark-doc contamination fraction: of the doc's DISTINCT
    word W-grams, how many appear anywhere in the benchmark slice —
    (doc_id, n_grams, n_hits, contaminated) with the flag decided by the
    exact integer cross-multiplication ``n_hits * 1000 >= tau_permille *
    n_grams``.  Same shape as :func:`decontaminate` (benchmark gram
    universe -> driver once -> Bloom + exact broadcast; training side
    streams with no shuffle), but graded instead of binary: partial
    contamination (a quoted eval question inside a long doc) is exactly
    what the any-hit rule over-flags and a fraction threshold ranks.
    Docs with fewer than W tokens have no grams and are absent (the SQL
    oracle agrees)."""
    import ray

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array((ids % bench_mod) == 0))
        if len(sub) == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        keys, _ = word_gram_keys(sub, W)
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

    schema = pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                        ("n_hits", pa.int64()), ("contaminated", pa.int8())])

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array((ids % bench_mod) != 0))
        if len(sub) == 0:
            return schema.empty_table()
        keys, row_idx = word_gram_keys(sub, W)
        if len(keys) == 0:
            return schema.empty_table()
        # distinct (row, key)
        order = np.lexsort((keys, row_idx))
        r, k = row_idx[order], keys[order]
        first = np.concatenate([[True], (r[1:] != r[:-1]) | (k[1:] != k[:-1])])
        r, k = r[first], k[first]
        hit = np.zeros(len(k), bool)
        bf: BloomFilter = ray.get(bref)
        cand = bf.contains(k.view(np.int64))
        if cand.any():
            exact = ray.get(kref)
            ck = k[cand]
            pos = np.minimum(np.searchsorted(exact, ck), len(exact) - 1)
            hit[np.flatnonzero(cand)[exact[pos] == ck]] = True
        sub_ids = sub["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n_rows = len(sub_ids)
        n_grams = np.bincount(r, minlength=n_rows).astype(np.int64)
        n_hits = np.bincount(r, weights=hit, minlength=n_rows).astype(np.int64)
        has = n_grams > 0
        flag = (n_hits[has] * 1000 >= tau_permille * n_grams[has]).astype(np.int8)
        return pa.table(
            {
                "doc_id": pa.array(sub_ids[has], pa.int64()),
                "n_grams": pa.array(n_grams[has], pa.int64()),
                "n_hits": pa.array(n_hits[has], pa.int64()),
                "contaminated": pa.array(flag, pa.int8()),
            }
        )

    return documents_ds.map_batches(score, batch_format="pyarrow")
