"""Structured-entity counts per document — the entity-density curation
signal (URL-farm / contact-spam / numeric-table detection) beside the
quality/PII kernels in functions/text.py.

Vectorized RE2 (`pc.count_substring_regex`) per block, zero shuffle;
every pattern literal is RE2-safe AND DuckDB-`regexp`-compatible so the
identical string runs in both engines and the oracle hash-matches.
Patterns deliberately avoid lookaround/backrefs (absent from RE2) and
stay byte-anchored so count semantics can't drift between engines.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: identical pattern literals in the engine and the oracle SQL
ENTITY_PATTERNS: tuple[tuple[str, str], ...] = (
    ("n_emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"),
    ("n_urls", "https?://[^ \t\n\r\f]+"),
    ("n_numbers", "[0-9]+([.][0-9]+)?"),
    ("n_dates", "[0-9]{4}-[0-9]{2}-[0-9]{2}"),
)


def entity_counts_batch(t: pa.Table, id_col: str = "doc_id",
                        text_col: str = "text") -> pa.Table:
    text = pc.cast(t[text_col].combine_chunks(), pa.string())
    out = {id_col: pc.cast(t[id_col].combine_chunks(), pa.int64())}
    for name, pat in ENTITY_PATTERNS:
        out[name] = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
    return pa.table(out)


def entity_counts(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """documents -> (doc_id, n_emails, n_urls, n_numbers, n_dates)."""
    return docs_ds.map_batches(
        lambda t: entity_counts_batch(t, id_col, text_col),
        batch_format="pyarrow")


ENTITY_COUNTS_SQL = """
SELECT doc_id,
       CAST(length(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       CAST(length(regexp_extract_all(text,
         'https?://[^ \t\n\r\f]+')) AS BIGINT) AS n_urls,
       CAST(length(regexp_extract_all(text,
         '[0-9]+([.][0-9]+)?')) AS BIGINT) AS n_numbers,
       CAST(length(regexp_extract_all(text,
         '[0-9]{4}-[0-9]{2}-[0-9]{2}')) AS BIGINT) AS n_dates
FROM documents
"""
