"""Topic-modeling-lite: k-means clusters + distinctive terms per cluster.

The composition op a corpus-exploration pipeline runs first: bucket the
embedding space with the bit-deterministic integer k-means
(stages/kmeans.py), then name each cluster by its most DISTINCTIVE
tokens — the terms whose in-cluster frequency is high relative to their
corpus frequency.

Distinctiveness stays integer-exact (the tfidf_terms discipline): token t
ranks above u within a cluster iff

    cnt_c(t) * total(u) > cnt_c(u) * total(t)

(cross-multiplied in-cluster-count / corpus-count rational — no floats,
no log), ties broken by token string ascending.

Shape:
1. k-means assignments (broadcast-centroid iterations, zero exchange
   beyond the plan already audited in stages/kmeans.py);
2. ONE tag-union keyed exchange on doc id co-locates each document's
   per-block distinct (doc, token, cnt) partials with its cluster row —
   documents and assignments may both be huge, so neither broadcasts;
3. per-partition reduce to (cluster, token, cnt) — bounded by
   k x block-vocab — and a dimension-sized driver merge (k x Zipf-vocab)
   elects the top_n terms per cluster.

vec_id is the embedding-table key for doc_id (the embedding_centroids
convention).  rows-only in the registry (k-means is iterative); pytest
plants vocab-disjoint blobs and pins recovery (tests/test_topics.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import _flat_tokens

_MID = pa.schema([
    ("jkey", pa.int64()), ("tag", pa.int8()),
    ("token", pa.string()), ("v", pa.int64()),
])

_CT = pa.schema([
    ("cluster", pa.int64()), ("token", pa.string()), ("cnt", pa.int64()),
])


def _doc_token_partials(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _MID.empty_table()
    flat, row_of, n_rows = _flat_tokens(t["text"])
    if len(flat) == 0:
        return _MID.empty_table()
    ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    tenc = flat.dictionary_encode()
    tcode = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    pair = tcode * n_rows + row_of
    upair, cnt = np.unique(pair, return_counts=True)
    tok = tenc.dictionary.take(pa.array(upair // n_rows, pa.int64()))
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    return pa.table({
        "jkey": pa.array(ids[upair % n_rows], pa.int64()),
        "tag": pa.array(np.zeros(len(upair), np.int8), pa.int8()),
        "token": tok,
        "v": pa.array(cnt.astype(np.int64), pa.int64()),
    }).cast(_MID)


def _label_rows(t: pa.Table) -> pa.Table:
    n = len(t)
    return pa.table({
        "jkey": pc.cast(t["vec_id"], pa.int64()),
        "tag": pa.array(np.ones(n, np.int8), pa.int8()),
        "token": pa.nulls(n, pa.string()),
        "v": pc.cast(t["cluster"], pa.int64()),
    }).cast(_MID)


def _attach_reduce(t: pa.Table) -> pa.Table:
    """All rows of any doc id are co-located: attach the cluster to each
    token partial, reduce to (cluster, token, cnt)."""
    if len(t) == 0:
        return _CT.empty_table()
    tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
    key = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
    v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
    lab = tag == 1
    cluster_of = dict(zip(key[lab].tolist(), v[lab].tolist()))
    m = ~lab
    if not m.any():
        return _CT.empty_table()
    tok = t["token"].combine_chunks().filter(
        pa.array(m)).dictionary_encode()
    tcode = tok.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    cl = np.asarray([cluster_of.get(k, -1) for k in key[m].tolist()],
                    np.int64)
    keep = cl >= 0  # docs without an embedding row drop out
    pair = cl[keep] * len(tok.dictionary) + tcode[keep]
    upair, inv = np.unique(pair, return_inverse=True)
    cnt = np.zeros(len(upair), np.int64)
    np.add.at(cnt, inv, v[m][keep])
    tokarr = tok.dictionary.take(
        pa.array(upair % len(tok.dictionary), pa.int64()))
    if isinstance(tokarr, pa.ChunkedArray):
        tokarr = tokarr.combine_chunks()
    return pa.table({
        "cluster": pa.array(upair // len(tok.dictionary), pa.int64()),
        "token": tokarr,
        "cnt": pa.array(cnt, pa.int64()),
    }).cast(_CT)


def cluster_terms(documents_ds, embeddings_ds, k: int = 8,
                  n_iter: int = 10, top_n: int = 3,
                  num_partitions: int = 8) -> pa.Table:
    """-> (cluster, rank, token, cnt, total_cnt): top_n distinctive terms
    per k-means cluster (see module docstring for the exact order)."""
    from .kmeans import kmeans

    labels, _cent = kmeans(embeddings_ds, k=k, n_iter=n_iter)
    mixed = documents_ds.map_batches(
        _doc_token_partials, batch_format="pyarrow"
    ).union(labels.map_batches(_label_rows, batch_format="pyarrow"))
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])
    ct = mixed.map_batches(_attach_reduce, batch_format="pyarrow",
                           batch_size=None)

    # dimension-sized driver merge: k x Zipf-vocab (cluster, token) counts
    acc: dict[tuple[int, str], int] = {}
    for b in ct.iter_batches(batch_format="pyarrow"):
        for cl, tok, cnt in zip(b["cluster"].to_pylist(),
                                b["token"].to_pylist(),
                                b["cnt"].to_pylist()):
            acc[(cl, tok)] = acc.get((cl, tok), 0) + cnt
    total: dict[str, int] = {}
    for (cl, tok), cnt in acc.items():
        total[tok] = total.get(tok, 0) + cnt

    from functools import cmp_to_key

    rows = []
    for cl in sorted({c for c, _ in acc}):
        cand = [(tok, cnt) for (c, tok), cnt in acc.items() if c == cl]

        def cmp(a, b):
            # a ranks before b iff cnt_a/total_a > cnt_b/total_b
            lhs = a[1] * total[b[0]]
            rhs = b[1] * total[a[0]]
            if lhs != rhs:
                return -1 if lhs > rhs else 1
            return -1 if a[0] < b[0] else (0 if a[0] == b[0] else 1)

        cand.sort(key=cmp_to_key(cmp))
        for r, (tok, cnt) in enumerate(cand[:top_n]):
            rows.append((cl, r, tok, cnt, total[tok]))
    if not rows:
        return pa.table({"cluster": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "token": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64()),
                         "total_cnt": pa.array([], pa.int64())})
    cl, rk, tok, cnt, tot = zip(*rows)
    return pa.table({
        "cluster": pa.array(cl, pa.int64()),
        "rank": pa.array(rk, pa.int64()),
        "token": pa.array(tok, pa.string()),
        "cnt": pa.array(cnt, pa.int64()),
        "total_cnt": pa.array(tot, pa.int64()),
    })
