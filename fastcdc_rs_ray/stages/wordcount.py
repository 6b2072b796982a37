"""Global token frequency — the explode/flat_map + two-level-count shape
(the canonical word-count) over the documents table.

The reference has no string ops at all (SURVEY.md §2.8); this is the
vocabulary-statistics stage a training-data pipeline needs (token frequency
tables, vocab pruning thresholds).

Shape discipline: the per-block partial counts (``pyarrow.compute
.value_counts`` over the vectorized whitespace split — no Python-level
token loop) shrink the exchange from one row per *token occurrence* to one
row per (block, distinct token) BEFORE the shuffle — at corpus scale the
Zipf head dominates occurrences, so the partial collapses the hot keys and
the exchange carries roughly the per-block vocabulary.  After the keyed
exchange each token lives in exactly one block, so per-block combine +
local top-k candidates + a driver merge of ``k x num_partitions`` rows is
exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import TOKEN_RE, _flat_tokens

TOP_TOKENS_K = 20

_MID = pa.schema([("token", pa.string()), ("cnt", pa.int64())])


def _combine_counts(t: pa.Table) -> pa.Table:
    """Sum cnt per token within one table (vectorized groupby)."""
    if len(t) == 0:
        return _MID.empty_table()
    g = t.group_by("token").aggregate([("cnt", "sum")])
    return pa.table(
        {"token": g["token"], "cnt": pc.cast(g["cnt_sum"], pa.int64())}
    ).cast(_MID)


def _local_topk(t: pa.Table, k: int) -> pa.Table:
    order = pc.sort_indices(
        t, sort_keys=[("cnt", "descending"), ("token", "ascending")]
    )
    return t.take(order.slice(0, k))


def top_tokens(documents_ds, k: int = TOP_TOKENS_K, num_partitions: int = 8):
    """documents -> the k globally most frequent whitespace tokens as
    (token, cnt), ties broken by token ascending."""

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = _flat_tokens(t["text"])
        vc = pc.value_counts(flat)
        return pa.table(
            {"token": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
        ).cast(_MID)

    partials = documents_ds.map_batches(partial, batch_format="pyarrow")
    ex = partials.repartition(num_blocks=num_partitions, keys=["token"])
    cands = ex.map_batches(
        lambda t: _local_topk(_combine_counts(t), k),
        batch_format="pyarrow", batch_size=None,
    )
    # k x num_partitions candidate rows: driver-sized final merge
    final = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in cands.iter_batches(batch_format="pyarrow")]
        + [_MID.empty_table()]
    )
    return _local_topk(final, k)


TOP_TOKENS_SQL = f"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest(regexp_extract_all(text, '{TOKEN_RE}')) AS token
      FROM documents)
GROUP BY token
ORDER BY cnt DESC, token ASC
LIMIT {TOP_TOKENS_K}
"""
