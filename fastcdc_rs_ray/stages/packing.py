"""Sequence packing: assemble documents into fixed-token-budget training
samples (the sample-construction step between curation and tokenization).

No reference counterpart (the Rust crate stops at chunk records); this is
the training-data operation the dedup tiers feed.  Greedy sequential
packing is a data-dependent recurrence (a bin closes only when the next
doc would overflow), which no window function expresses — so, like
sessionize, it runs as ONE keyed exchange + a per-block scan.  The scan
here is per-BIN, not per-row: each Python iteration closes a whole bin by
``searchsorted`` on the token cumsum (loop length = bins ≈ rows /
docs-per-bin; the token counting itself is the vectorized RE2 kernel
shared with the ``token_count`` query).

Determinism / partitioning: docs are routed by ``hash(doc_id) % n_groups``
(same multiplicative mix as every exchange key in this engine) and packed
in ascending doc_id order within a group, so output is bit-identical under
any input partitioning or retry.  Bins never exceed the budget; a doc
longer than the whole budget gets a bin of its own, marked ``oversize``
(the caller decides truncate-vs-drop — this stage never silently loses
tokens).

Output: (doc_id, n_tokens, pack_group, bin_idx, oversize); a training
sample is the concatenation of one (pack_group, bin_idx)'s docs in doc_id
order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import TOKEN_RE
from ..util import mix64

DEFAULT_BUDGET = 2048


def _pack_counts(counts: np.ndarray, budget: int) -> np.ndarray:
    """Greedy sequential bin assignment for one group's ordered token
    counts.  One searchsorted per BIN: the largest prefix whose running
    sum stays within the open bin's remaining budget closes the bin."""
    n = len(counts)
    bins = np.empty(n, np.int64)
    cum = np.cumsum(np.minimum(counts, budget + 1))  # oversize docs: > budget
    start = 0
    b = 0
    base = 0
    while start < n:
        # last index with cum - base <= budget; always >= start because an
        # oversize doc (count > budget) is alone in its bin via min(.., b+1)
        end = int(np.searchsorted(cum, base + budget, side="right"))
        if end == start:  # oversize doc: own bin
            end = start + 1
        bins[start:end] = b
        b += 1
        base = cum[end - 1]
        start = end
    return bins


def pack_docs(documents_ds, budget: int = DEFAULT_BUDGET, n_groups: int = 32,
              id_col: str = "doc_id", text_col: str = "text"):
    """documents -> (doc_id, n_tokens, pack_group, bin_idx, oversize)."""

    def count_and_group(t: pa.Table) -> pa.Table:
        text = t[text_col].combine_chunks()
        n_tok = pc.cast(pc.count_substring_regex(text, TOKEN_RE),
                        pa.int64()).to_numpy(zero_copy_only=False)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        grp = (mix64(ids.astype(np.uint64)) % np.uint64(n_groups)).astype(
            np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "pack_group": pa.array(grp, pa.int64()),
        })

    counted = documents_ds.map_batches(count_and_group, batch_format="pyarrow")
    # one keyed exchange: all of a group's docs in one block
    counted = counted.repartition(
        num_blocks=max(4, n_groups // 4), keys=["pack_group"])

    out_schema = pa.schema(
        [(id_col, pa.int64()), ("n_tokens", pa.int64()),
         ("pack_group", pa.int64()), ("bin_idx", pa.int64()),
         ("oversize", pa.bool_())])

    def pack_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        n_tok = t["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        grp = t["pack_group"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, grp))
        ids, n_tok, grp = ids[order], n_tok[order], grp[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(grp[1:] != grp[:-1]) + 1, [len(grp)]])
        bins = np.empty(len(grp), np.int64)
        for s, e in zip(starts[:-1], starts[1:]):
            bins[s:e] = _pack_counts(n_tok[s:e], budget)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "pack_group": pa.array(grp, pa.int64()),
            "bin_idx": pa.array(bins, pa.int64()),
            "oversize": pa.array(n_tok > budget, pa.bool_()),
        }).cast(out_schema)

    return counted.map_batches(pack_block, batch_format="pyarrow",
                               batch_size=None)


# --------------------------------------------------------------------------
# padding_waste — batch-padding efficiency audit per length bucket
# --------------------------------------------------------------------------

#: fixed-boundary length buckets (tokens); docs longer than the last
#: boundary land in the overflow bucket (bound = -1, waste 0 — they get
#: split/truncated upstream, not padded)
PAD_BOUNDS = (64, 128, 256, 512, 1024, 2048, 4096)


def padding_waste(documents_ds, bounds: tuple[int, ...] = PAD_BOUNDS):
    """-> (bound, n_docs, sum_tokens, sum_waste): if every document were
    padded to its smallest covering bucket boundary, how many pad tokens
    does each bucket burn?  The batching-efficiency audit run before
    picking sequence-length buckets for training (waste = Σ bound - len).

    Grid-sized per-block partials (|bounds|+1 rows), driver merge, ZERO
    exchange; token definition shared with ``token_count`` (RE2
    ``\\S+`` == the SQL oracle's regexp_extract_all)."""
    import pyarrow.compute as pc

    from ..functions.text import TOKEN_RE

    barr = np.asarray(bounds, np.int64)
    nb = len(barr)

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "sum_tokens": pa.array([], pa.int64()),
                             "sum_waste": pa.array([], pa.int64())})
        n = pc.count_substring_regex(t["text"], TOKEN_RE).to_numpy(
            zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(barr, n, side="left")  # nb == overflow
        waste = np.where(idx < nb, barr[np.minimum(idx, nb - 1)] - n, 0)
        return pa.table({
            "i": pa.array(np.arange(nb + 1), pa.int64()),
            "n_docs": pa.array(np.bincount(idx, minlength=nb + 1)
                               .astype(np.int64), pa.int64()),
            "sum_tokens": pa.array(np.bincount(idx, weights=n,
                                               minlength=nb + 1)
                                   .astype(np.int64), pa.int64()),
            "sum_waste": pa.array(np.bincount(idx, weights=waste,
                                              minlength=nb + 1)
                                  .astype(np.int64), pa.int64()),
        })

    acc = np.zeros((3, nb + 1), np.int64)
    for b in documents_ds.select_columns(["text"]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        if b.num_rows:
            i = b["i"].to_numpy(zero_copy_only=False)
            for r, c in enumerate(("n_docs", "sum_tokens", "sum_waste")):
                np.add.at(acc[r], i, b[c].to_numpy(zero_copy_only=False))
    keep = acc[0] > 0  # drop empty buckets (matches the SQL GROUP BY)
    bound_of = np.append(barr, -1)
    return pa.table({
        "bound": pa.array(bound_of[keep], pa.int64()),
        "n_docs": pa.array(acc[0][keep], pa.int64()),
        "sum_tokens": pa.array(acc[1][keep], pa.int64()),
        "sum_waste": pa.array(acc[2][keep], pa.int64()),
    })


def padding_waste_sql(tokens_sql: str,
                      bounds: tuple[int, ...] = PAD_BOUNDS) -> str:
    case = " ".join(f"WHEN n <= {b} THEN {b}" for b in bounds)
    return f"""
WITH tok AS (
  SELECT {tokens_sql} AS n FROM documents
), asg AS (
  SELECT n, CASE {case} ELSE -1 END AS bound FROM tok
)
SELECT CAST(bound AS BIGINT) AS bound,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS sum_tokens,
       CAST(SUM(CASE WHEN bound = -1 THEN 0 ELSE bound - n END) AS BIGINT)
           AS sum_waste
FROM asg GROUP BY bound
"""
