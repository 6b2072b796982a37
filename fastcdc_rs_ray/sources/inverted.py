"""Inverted index: token -> posting-list shards, point lookups without
a corpus scan.

The third layout-level scale technique (beside zonemap_scan's time
pruning and bucketed_join's key bucketing): the token -> doc_id posting
lists are staged ONCE as hash-sharded, token-sorted parquet files; a
query for any token set opens ONLY the shards its tokens hash to and
binary-searches the sorted runs — the corpus itself is never read at
query time.  This is the search-index access path a 100 TB corpus needs
for "which documents contain X" questions that a streaming scan would
answer in hours.

Staging writes distinct (token, doc_id) pairs (the doc_rarity explode,
deduplicated) — a distributed writer would hash-shuffle by token and
write one sorted file per partition; the layout CONTRACT (same token
hash, sorted runs, one file per shard) is what the lookup relies on.

Output: (token, doc_id) exact posting rows for the query tokens; the
SQL oracle recomputes them with the shared tokenizer.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.text import _flat_tokens
from ..util import hash_str_array_u64
from .staging import staged

N_SHARDS = 8

#: default query tokens (the bm25 set — frequent but not universal)
LOOKUP_TOKENS = ("join", "scan", "window", "shuffle")


def _token_shard(tokens: pa.Array, n_shards: int) -> np.ndarray:
    return (hash_str_array_u64(tokens) % np.uint64(n_shards)).astype(
        np.int64)


def ensure_inverted(documents_ds, out_dir: str, n_shards: int = N_SHARDS,
                    fingerprint: str = "static"):
    def pairs(t: pa.Table) -> pa.Table:
        flat, row_of, n_rows = _flat_tokens(t["text"])
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64())})
        enc = flat.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        key = code * np.int64(1 << 32) + row_of
        uk = np.unique(key)
        tok = enc.dictionary.take(pa.array(uk >> np.int64(32), pa.int64()))
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        return pa.table({
            "token": tok,
            "doc_id": pa.array(
                ids[(uk & np.int64((1 << 32) - 1))], pa.int64()),
        })

    def dump(tmp: str) -> None:
        t = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in documents_ds.select_columns(
                ["doc_id", "text"]).map_batches(
                pairs, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"))
        tok = t["token"].combine_chunks()
        shard = _token_shard(tok, n_shards)
        toks = np.asarray(tok.to_pylist(), dtype=object).astype("U")
        docs = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        for i in range(n_shards):
            m = shard == i
            order = np.lexsort((docs[m], toks[m]))
            pq.write_table(
                pa.table({
                    "token": pa.array(toks[m][order].tolist(), pa.string()),
                    "doc_id": pa.array(docs[m][order], pa.int64()),
                }),
                os.path.join(tmp, f"idx_{i:03d}.parquet"))

    staged(out_dir, dump, fingerprint)


def inverted_lookup(documents_ds, out_dir: str,
                    tokens: tuple[str, ...] = LOOKUP_TOKENS,
                    n_shards: int = N_SHARDS,
                    fingerprint: str = "static"):
    import ray.data as rd

    ensure_inverted(documents_ds, out_dir, n_shards, fingerprint)
    shard_of = _token_shard(pa.array(list(tokens), pa.string()), n_shards)
    need: dict[int, list[str]] = {}
    for tk, sh in zip(tokens, shard_of.tolist()):
        need.setdefault(sh, []).append(tk)

    items = [{"shard": sh, "tokens": tks} for sh, tks in sorted(need.items())]
    ds = rd.from_items(items, override_num_blocks=max(1, len(items)))

    def lookup(t: pa.Table, _dir=out_dir) -> pa.Table:
        out = []
        for sh, tks in zip(t["shard"].to_pylist(), t["tokens"].to_pylist()):
            f = pq.read_table(os.path.join(_dir, f"idx_{sh:03d}.parquet"))
            # vectorized membership on the Arrow column — no pylist /
            # fixed-width unicode round-trip (a parquet reader with
            # row-group token zone maps would narrow the read further;
            # the sorted runs keep matches contiguous either way)
            m = pc.is_in(f["token"], value_set=pa.array(tks, pa.string()))
            out.append(f.filter(m))
        if not out:
            return pa.table({"token": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.concat_tables(out).select(["token", "doc_id"])

    return ds.map_batches(lookup, batch_format="pyarrow")


def inverted_lookup_sql(tokens: tuple[str, ...], token_re: str) -> str:
    vals = ", ".join(f"('{t}')" for t in tokens)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{token_re}')) AS t
  FROM documents
), q(t) AS (VALUES {vals})
SELECT DISTINCT tok.t AS token, tok.doc_id
FROM tok JOIN q ON tok.t = q.t
"""
