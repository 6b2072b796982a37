"""Deterministic hash-based sampling — the reproducible subsetting stage a
training-data pipeline needs (the reference has none, SURVEY.md §2.6).

``ds.random_sample`` is non-deterministic across runs/retries; a
multiplicative-hash bucket on a stable key is embarrassingly parallel,
needs no shuffle and no driver state, picks the SAME rows on every run and
on every retry of a failed block (resumability), and is expressible in SQL
for the oracle gate.  The multiplier is the 64-bit golden-ratio constant
(odd, hence invertible mod 2^64 — a bijection on u64 keys, so bucket
occupancy mirrors the key distribution exactly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SAMPLE_MULT = 0x9E3779B97F4A7C15  # 11400714819323198485, odd
SAMPLE_PCT = 10  # keep bucket < 10 of 100 -> deterministic 10% sample


def hash_bucket(keys: np.ndarray, mod: int = 100) -> np.ndarray:
    """(key * GOLDEN) wrapped to u64, then % mod — exact counterpart of the
    SQL ``(CAST(k AS HUGEINT) * MULT) % 2^64 % mod``."""
    k = keys.astype(np.uint64, copy=False)
    return (k * np.uint64(SAMPLE_MULT)) % np.uint64(mod)


def hash_sample(ds, key: str = "doc_id", pct: int = SAMPLE_PCT):
    """Filter to rows whose key hashes into the first ``pct`` of 100
    buckets.  Pure per-block map — no exchange at any scale."""

    def per_block(t: pa.Table) -> pa.Table:
        kv = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(hash_bucket(kv) < pct)
        return t.take(pa.array(sel, pa.int64()))

    return ds.map_batches(per_block, batch_format="pyarrow")


def sample_docs(documents_ds, pct: int = SAMPLE_PCT):
    """documents -> deterministic pct% sample as (doc_id, n_chars)."""
    sampled = hash_sample(documents_ds, key="doc_id", pct=pct)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(pc.binary_length(t["text"]), pa.int64()),
            }
        )

    return sampled.map_batches(project, batch_format="pyarrow")


SAMPLE_DOCS_SQL = f"""
SELECT doc_id, strlen(text) AS n_chars
FROM documents
WHERE (CAST(doc_id AS HUGEINT) * {SAMPLE_MULT})
      % 18446744073709551616 % 100 < {SAMPLE_PCT}
"""

STRATA_N = 25  # deterministic per-stratum sample size


def stratified_sample_events(events_ds, n: int = STRATA_N,
                             num_partitions: int = 4):
    """Stratified deterministic sample: for every event_type, the ``n``
    events whose (bijective multiplicative) event_id hash is smallest —
    reproducible across runs and block retries, like :func:`hash_sample`.

    Combiner shape: each block keeps only its local n-per-stratum
    candidates (the full data never shuffles — the few-strata key space
    would make a raw keyed exchange maximally skewed), then one tiny
    keyed exchange on event_type merges candidate sets and re-applies the
    same selection.  The hash is a bijection on u64, so ranks are
    collision-free and the selection is unique."""

    def topn_per_type(t: pa.Table) -> pa.Table:
        n_rows = len(t)
        if n_rows == 0:
            return t.select(["event_type", "event_id", "user_id"])
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        hv = eid.astype(np.uint64) * np.uint64(SAMPLE_MULT)
        enc = t["event_type"].combine_chunks().dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((hv, code))
        starts = np.concatenate(
            [[0], np.flatnonzero(code[order][1:] != code[order][:-1]) + 1]
        )
        rank = np.arange(n_rows) - np.repeat(
            starts, np.diff(np.append(starts, n_rows))
        )
        sel = pa.array(order[rank < n], pa.int64())
        return t.select(["event_type", "event_id", "user_id"]).take(sel)

    cands = events_ds.map_batches(
        lambda t: topn_per_type(t), batch_format="pyarrow"
    )
    cands = cands.repartition(num_blocks=num_partitions, keys=["event_type"])
    return cands.map_batches(topn_per_type, batch_format="pyarrow",
                             batch_size=None)


STRATIFIED_SAMPLE_SQL = f"""
SELECT event_type, event_id, user_id FROM (
  SELECT event_type, event_id, user_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY (CAST(event_id AS HUGEINT) * {SAMPLE_MULT})
                    % 18446744073709551616) AS rk
  FROM events) WHERE rk <= {STRATA_N}
"""
