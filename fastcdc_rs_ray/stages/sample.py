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
