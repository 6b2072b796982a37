"""Corpus data card: the one-row summary a dataset release ships with.

Composes the engine's exact kernels into a single driver-hashable row:

    n_docs, n_langs, n_sources, total_chars, total_tokens,
    distinct_texts, dup_docs (= n_docs - distinct_texts), max_doc_chars

Shape: one fused streaming pass reduces every block to a single scalar
partial row (counts/sums/max + per-block distinct lang/source sets —
both dimension-bounded), and the one genuinely global piece —
distinct_texts — rides ONE keyed exchange of (u64 text-hash) rows with
per-partition distinct counting (the dedup_exact discipline; the u64
identity is collision-free at oracle-checked scales and a 128-bit
upgrade is a key-width change).  Driver merges blocks-many fixed-width
partials into the card.

Every component has an exact SQL twin, so the whole card hash-matches
DuckDB (token definition shared with token_count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import TOKEN_RE
from ..util import hash_str_array_u64


def data_card(documents_ds, num_partitions: int = 8) -> pa.Table:
    src = documents_ds.select_columns(["doc_id", "text", "lang", "source"])

    def scalar_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({
                "n_docs": pa.array([], pa.int64()),
                "total_chars": pa.array([], pa.int64()),
                "total_tokens": pa.array([], pa.int64()),
                "max_doc_chars": pa.array([], pa.int64()),
                "langs": pa.array([], pa.list_(pa.string())),
                "sources": pa.array([], pa.list_(pa.string())),
            })
        chars = pc.utf8_length(t["text"])
        toks = pc.count_substring_regex(t["text"], TOKEN_RE)
        return pa.table({
            "n_docs": pa.array([len(t)], pa.int64()),
            "total_chars": pa.array([pc.sum(chars).as_py() or 0], pa.int64()),
            "total_tokens": pa.array([pc.sum(toks).as_py() or 0], pa.int64()),
            "max_doc_chars": pa.array([pc.max(chars).as_py() or 0],
                                      pa.int64()),
            "langs": pa.array([pc.unique(t["lang"]).to_pylist()],
                              pa.list_(pa.string())),
            "sources": pa.array([pc.unique(t["source"]).to_pylist()],
                                pa.list_(pa.string())),
        })

    n_docs = total_chars = total_tokens = max_chars = 0
    langs: set[str] = set()
    sources: set[str] = set()
    for b in src.map_batches(scalar_partial, batch_format="pyarrow"
                             ).iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            n_docs += b["n_docs"][i].as_py()
            total_chars += b["total_chars"][i].as_py()
            total_tokens += b["total_tokens"][i].as_py()
            max_chars = max(max_chars, b["max_doc_chars"][i].as_py())
            langs.update(b["langs"][i].as_py())
            sources.update(b["sources"][i].as_py())

    def hash_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        h = hash_str_array_u64(t["text"].combine_chunks())
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    hashed = src.map_batches(hash_rows, batch_format="pyarrow").repartition(
        num_blocks=num_partitions, keys=["h"])

    def distinct_count(t: pa.Table) -> pa.Table:
        n = len(np.unique(t["h"].combine_chunks().to_numpy())) if len(t) else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    distinct_texts = 0
    for b in hashed.map_batches(distinct_count, batch_format="pyarrow",
                                batch_size=None).iter_batches(
            batch_format="pyarrow"):
        for i in range(b.num_rows):
            distinct_texts += b["n"][i].as_py()

    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_langs": pa.array([len(langs)], pa.int64()),
        "n_sources": pa.array([len(sources)], pa.int64()),
        "total_chars": pa.array([total_chars], pa.int64()),
        "total_tokens": pa.array([total_tokens], pa.int64()),
        "distinct_texts": pa.array([distinct_texts], pa.int64()),
        "dup_docs": pa.array([n_docs - distinct_texts], pa.int64()),
        "max_doc_chars": pa.array([max_chars], pa.int64()),
    })


DATA_CARD_SQL_TEMPLATE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(len(regexp_extract_all(text, '{token_re}'))) AS BIGINT)
           AS total_tokens,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_texts,
       CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS dup_docs,
       CAST(MAX(length(text)) AS BIGINT) AS max_doc_chars
FROM documents
"""
