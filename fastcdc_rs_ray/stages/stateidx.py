"""Incremental exact dedup against a shared mutable index (sharded actors).

The one pattern the Dataset API genuinely can't express (north_star: "drop
to raw Ray actors only where Dataset API can't — e.g. a shared mutable
index"): a persistent membership index that outlives a single pass.  The
Dataset-only exact dedup (stages/dedup.py:42) re-shuffles the corpus every
run; a standing index absorbs NEW data in one pass and answers membership
without touching history — the incremental-ingest dedup a 100 TB crawl
pipeline runs between snapshots.

Architecture:
- ``n_shards`` actors, each owning the key-space slice ``hash % n_shards``
  as a plain dict ``content_hash -> min doc_id``;
- map tasks pre-reduce each batch to per-key minima (vectorized
  ``np.minimum.at``) and send ONE numpy pair per (batch, shard) — the actor
  loop touches only block-distinct keys, never rows;
- two passes give order-free, partitioning-free semantics equal to SQL
  ``keep min(doc_id) per content``: pass 1 offers every (key, min id),
  pass 2 filters ``doc_id == index minimum``.  The materialize() between
  them is the write barrier.

The content key is the 64-bit vectorized content hash
(util.hash_str_array_u64) — collision-safe at test scale; a production
index would widen to 128 bits (two independent mixes) before the dict.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import hash_str_array_u64

_I64_MAX = np.iinfo(np.int64).max


def _shard_class():
    import ray

    @ray.remote(num_cpus=0.25)
    class DedupShard:
        """Owns one key-space slice: dict of content_hash -> min doc_id."""

        def __init__(self):
            self.idx: dict[int, int] = {}

        def offer(self, keys: np.ndarray, min_ids: np.ndarray) -> int:
            idx = self.idx
            for k, v in zip(keys.tolist(), min_ids.tolist()):
                cur = idx.get(k)
                if cur is None or v < cur:
                    idx[k] = v
            return len(idx)

        def lookup(self, keys: np.ndarray) -> np.ndarray:
            idx = self.idx
            return np.fromiter(
                (idx.get(k, _I64_MAX) for k in keys.tolist()),
                np.int64, count=len(keys))

        def size(self) -> int:
            return len(self.idx)

    return DedupShard


def _batch_key_minima(t: pa.Table, text_col: str, id_col: str):
    h = hash_str_array_u64(t[text_col]).astype(np.uint64)
    ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    uk, inv = np.unique(h, return_inverse=True)
    m = np.full(len(uk), _I64_MAX, np.int64)
    np.minimum.at(m, inv, ids)
    return h, ids, uk, inv, m


def incremental_dedup(ds, n_shards: int = 4, text_col: str = "text",
                      id_col: str = "doc_id"):
    """ds -> Dataset of surviving ``id_col`` rows (min id per distinct
    content), deduped through a standing sharded index.  The index actors
    are killed before returning; at production scale they would persist
    across ingests (that persistence is the point of the pattern)."""
    import ray

    Shard = _shard_class()
    shards = [Shard.remote() for _ in range(n_shards)]

    def offer(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        _, _, uk, _, m = _batch_key_minima(t, text_col, id_col)
        s = (uk % np.uint64(n_shards)).astype(np.int64)
        refs = []
        for i in range(n_shards):
            sel = s == i
            if sel.any():
                refs.append(shards[i].offer.remote(uk[sel], m[sel]))
        ray.get(refs)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    # pass 1: build the index; materialize() is the barrier
    ds.map_batches(offer, batch_format="pyarrow").materialize()

    def keep_min(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([(id_col, pa.int64())])
        if len(t) == 0:
            return out_schema.empty_table()
        h, ids, uk, inv, _ = _batch_key_minima(t, text_col, id_col)
        s = (uk % np.uint64(n_shards)).astype(np.int64)
        mins = np.empty(len(uk), np.int64)
        sels = [s == i for i in range(n_shards)]
        refs = [shards[i].lookup.remote(uk[sels[i]])
                for i in range(n_shards) if sels[i].any()]
        live = [i for i in range(n_shards) if sels[i].any()]
        for i, r in zip(live, ray.get(refs)):
            mins[sels[i]] = r
        keep = ids == mins[inv]
        return pa.table({id_col: pa.array(ids[keep], pa.int64())})

    out = ds.map_batches(keep_min, batch_format="pyarrow").materialize()
    for a in shards:
        ray.kill(a)
    return out
