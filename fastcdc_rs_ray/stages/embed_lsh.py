"""Random-hyperplane LSH near-duplicate detection over embeddings — the
bucketed scale path for cosine near-dup (the exact pairwise variant,
pipelines.queries.q_embed_neardup, is O(n^2) per block against a
broadcast matrix; this one exchanges one u64 bucket row per (vector,
table) and only verifies colliding candidates).

Charikar SimHash for vectors: sign pattern of projections onto ``n_bits``
seeded Gaussian hyperplanes = one bucket key per hash table; two vectors
with cosine similarity cos(theta) collide in one table with
p = (1 - theta/pi)^n_bits, and across ``n_tables`` independent tables
with 1-(1-p)^T — at tau=0.9, 16 tables x 10 bits gives ~0.98 expected
recall (pytest-asserted against the exact pair set).  Candidates are
verified with exact cosine (endpoint vectors broadcast once via
``ray.put``; the candidate set is sparse by construction), so precision
is exact — only recall is probabilistic, which is why this query is
rows-only for the driver while the bounded exact variant is the SQL-
oracled one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import mix64
from .ann import _normalize, embedding_matrix

N_TABLES = 16
N_BITS = 10


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, dim, n_bits)).astype(np.float32)


def bucket_rows(t: pa.Table, planes: np.ndarray) -> pa.Table:
    """Vector batch -> (bucket_key u64, vec_id i64) rows, one per table."""
    n = len(t)
    if n == 0:
        return pa.table(
            {
                "bucket_key": pa.array([], pa.uint64()),
                "vec_id": pa.array([], pa.int64()),
            }
        )
    vm = _normalize(embedding_matrix(t["embedding"]))
    ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
    n_tables, _, n_bits = planes.shape
    keys = np.empty((n_tables, n), dtype=np.uint64)
    weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))
    for ti in range(n_tables):
        signs = (vm @ planes[ti]) > 0  # (n, n_bits)
        code = (signs.astype(np.uint64) * weights).sum(axis=1)
        keys[ti] = mix64(code ^ (np.uint64(ti) << np.uint64(48)))
    return pa.table(
        {
            "bucket_key": pa.array(keys.reshape(-1), pa.uint64()),
            "vec_id": pa.array(np.tile(ids, n_tables), pa.int64()),
        }
    )


def _bucket_pairs(t: pa.Table, max_group: int) -> pa.Table:
    """Bucket-colocated block -> distinct candidate pairs per bucket."""
    empty = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    n = len(t)
    if n < 2:
        return empty
    bk = t["bucket_key"].combine_chunks().to_numpy()
    ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, bk))
    bk, ids = bk[order], ids[order]
    starts = np.concatenate([[0], np.flatnonzero(bk[1:] != bk[:-1]) + 1, [n]])
    glens = np.diff(starts)
    multi = np.flatnonzero(glens >= 2)
    src_l, dst_l = [], []
    for s, e in zip(starts[multi], starts[multi + 1]):
        gi = np.unique(ids[s:e])
        if len(gi) < 2 or len(gi) > max_group:
            continue
        ii, jj = np.triu_indices(len(gi), k=1)
        src_l.append(gi[ii])
        dst_l.append(gi[jj])
    if not src_l:
        return empty
    src = np.concatenate(src_l)
    dst = np.concatenate(dst_l)
    order2 = np.lexsort((dst, src))
    src, dst = src[order2], dst[order2]
    keep = np.concatenate(
        ([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1]))
    )
    return pa.table(
        {"src": pa.array(src[keep], pa.int64()), "dst": pa.array(dst[keep], pa.int64())}
    )


def embed_neardup_lsh(emb_ds, tau: float = 0.9, n_tables: int = N_TABLES,
                      n_bits: int = N_BITS, seed: int = 23,
                      num_partitions: int = 8, max_group: int = 4096):
    """Embeddings Dataset -> verified cosine>=tau pairs via hyperplane LSH.

    Stages: bucket rows (stateless map, planes rebuilt deterministically
    from the seed inside each task — cheaper than shipping them; an actor
    pool would amortize the rebuild per worker if dim x tables x bits ever
    grows material) -> keyed exchange on bucket_key -> per-bucket candidate pairs ->
    exchange on (src, dst) for global dedup -> exact-cosine verification
    against broadcast endpoint vectors (candidate-sized)."""
    import ray
    import ray.data as rd

    # planes rebuilt deterministically from the seed on each task's first
    # batch (the closure dict is per-task state, not per-worker)
    planes_ref = {"p": None}

    def rows(t: pa.Table) -> pa.Table:
        if planes_ref["p"] is None:
            d = embedding_matrix(t["embedding"]).shape[1]
            planes_ref["p"] = _hyperplanes(d, n_tables, n_bits, seed)
        return bucket_rows(t, planes_ref["p"])

    buckets = emb_ds.map_batches(rows, batch_format="pyarrow")
    buckets = buckets.repartition(num_blocks=num_partitions, keys=["bucket_key"])
    pairs = buckets.map_batches(
        lambda t: _bucket_pairs(t, max_group), batch_format="pyarrow",
        batch_size=None,
    )
    pairs = pairs.repartition(
        num_blocks=max(4, num_partitions // 2), keys=["src", "dst"]
    )

    def distinct(t: pa.Table) -> pa.Table:
        if len(t) < 2:
            return t.select(["src", "dst"])
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        keep = np.concatenate(
            ([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1]))
        )
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
            }
        )

    cand = pairs.map_batches(distinct, batch_format="pyarrow",
                             batch_size=None).materialize()

    # endpoint vectors: candidate-sized -> broadcast-filtered collect
    eps = []
    for b in cand.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            eps.append(b["src"].combine_chunks().to_numpy(zero_copy_only=False))
            eps.append(b["dst"].combine_chunks().to_numpy(zero_copy_only=False))
    empty_pairs = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    if not eps:
        return rd.from_arrow(empty_pairs)
    ep_ids = np.unique(np.concatenate(eps))
    ref = ray.put(ep_ids)

    def keep_vecs(t: pa.Table) -> pa.Table:
        e = ray.get(ref)
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(e, ids)
        idx[idx == len(e)] = 0
        sel = np.flatnonzero(e[idx] == ids)
        sub = t.take(pa.array(sel, pa.int64()))
        return pa.table({"vec_id": sub["vec_id"], "embedding": sub["embedding"]})

    vec_tabs = [
        b
        for b in emb_ds.map_batches(keep_vecs, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if b.num_rows
    ]
    vt = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b]) for b in vec_tabs]
    )
    vids = vt["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
    vmat = _normalize(embedding_matrix(vt["embedding"]).astype(np.float64))
    order = np.argsort(vids)
    vids, vmat = vids[order], vmat[order]
    vref = ray.put({"ids": vids, "mat": vmat})

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty_pairs
        v = ray.get(vref)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        a = v["mat"][np.searchsorted(v["ids"], src)]
        b = v["mat"][np.searchsorted(v["ids"], dst)]
        sims = (a * b).sum(axis=1)
        sel = pa.array(np.flatnonzero(sims >= tau), pa.int64())
        return pa.table(
            {
                "src": t["src"].combine_chunks().take(sel),
                "dst": t["dst"].combine_chunks().take(sel),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")
