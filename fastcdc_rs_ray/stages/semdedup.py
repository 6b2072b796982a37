"""SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv
2303.09540): k-means buckets the embedding space, then near-duplicates are
resolved ONLY within clusters — the quadratic cosine check runs on
cluster-sized groups instead of the corpus, which is the whole trick.

Composition of existing machinery, Ray-Data-first:

- clustering = :func:`stages.kmeans.kmeans` (bit-deterministic integer
  Lloyd's — so the dedup decision is reproducible, unlike float k-means
  whose cluster boundaries drift per run);
- assignment on the dedup pass re-uses the SAME quantize/assign kernels
  under the broadcast final centroids, so bucket membership is identical
  to the clustering pass;
- ONE keyed exchange on cluster id co-locates each bucket; the per-block
  combine computes the exact pairwise cosine matrix per cluster
  (cluster-sized, the SemDeDup memory premise — `max_cluster` guards the
  pathological bucket and is recorded, not silent), links pairs >= tau
  with a tiny union-find, and keeps the minimum vec_id per group.

Output: (vec_id, keep, rep, oversized) — rep = the kept representative of
the row's duplicate group (itself when kept); oversized = 1 marks members
of a cluster that exceeded `max_cluster` and was therefore NOT deduped, so
at-scale degradation is visible in the output instead of silent.  Not
SQL-expressible (the clustering is iterative); pytest pins planted
duplicates, partition invariance, and the keep-min rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kmeans import _assign, _block_mat, _quantize_block, kmeans

OUT_SCHEMA = pa.schema([
    ("vec_id", pa.int64()), ("keep", pa.int8()), ("rep", pa.int64()),
    ("oversized", pa.int8()),
])


def semantic_dedup(embeddings_ds, k: int | None = None, tau: float = 0.97,
                   n_iter: int = 10, num_partitions: int = 8,
                   max_cluster: int = 65536):
    """embeddings (vec_id, embedding list<float>) -> (vec_id, keep, rep).

    ``k=None`` (default) auto-scales the cluster count with the corpus:
    ``k = max(8, ceil(n / (max_cluster // 4)))`` — the SemDeDup premise
    is cluster-sized quadratic work, so k must grow with n or every
    bucket exceeds ``max_cluster`` at scale and the operator degrades to
    a visible no-op (``oversized=1`` everywhere; VERDICT r3 item 4).
    Mean cluster size lands near max_cluster/4, leaving 4x headroom for
    skewed buckets before the cap trips.  Pass an explicit ``k`` to pin
    the bucket count (the pre-round-4 behavior)."""
    import ray

    embeddings_ds = embeddings_ds.materialize()
    if k is None:
        n = embeddings_ds.count()
        target_cluster = max(1, max_cluster // 4)
        k = max(8, -(-n // target_cluster))
    _assign_ds, cent = kmeans(embeddings_ds, k=k, n_iter=n_iter)
    cref = ray.put(cent)

    def bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": t["embedding"]
                             if "embedding" in t.column_names else
                             pa.array([], pa.list_(pa.float32()))})
        ids, q = _block_mat(_quantize_block(t))
        cl = _assign(q, ray.get(cref)).astype(np.int64)
        return pa.table({"cluster": pa.array(cl, pa.int64()),
                         "vec_id": pa.array(ids, pa.int64()),
                         "embedding": t["embedding"]})

    ex = embeddings_ds.map_batches(bucket, batch_format="pyarrow")
    ex = ex.repartition(num_blocks=num_partitions, keys=["cluster"])

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return OUT_SCHEMA.empty_table()
        from .ann import _normalize, embedding_matrix

        cl = t["cluster"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        mat = _normalize(embedding_matrix(t["embedding"]))
        order = np.lexsort((ids, cl))
        cl, ids, mat = cl[order], ids[order], mat[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(cl[1:] != cl[:-1]) + 1, [len(cl)]])
        keep = np.ones(len(cl), np.int8)
        rep = ids.copy()
        oversized = np.zeros(len(cl), np.int8)
        for s, e in zip(starts[:-1], starts[1:]):
            g = e - s
            if g > max_cluster:
                # skipped, NOT deduped — flag every member so the
                # degradation is recorded in the output, not silent
                oversized[s:e] = 1
                continue
            if g < 2:
                continue
            gm = mat[s:e]
            sims = gm @ gm.T
            ii, jj = np.nonzero(np.triu(sims >= tau, k=1))
            if not len(ii):
                continue
            parent = list(range(g))

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in zip(ii.tolist(), jj.tolist()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            gids = ids[s:e]  # ascending within the cluster (lexsort)
            for i in range(g):
                r = find(i)
                if r != i:
                    keep[s + i] = 0
                rep[s + i] = gids[r]
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "keep": pa.array(keep, pa.int8()),
            "rep": pa.array(rep, pa.int64()),
            "oversized": pa.array(oversized, pa.int8()),
        }).cast(OUT_SCHEMA)

    return ex.map_batches(combine, batch_format="pyarrow", batch_size=None)
