"""Distributed Lloyd's k-means over an embedding column, bit-deterministic.

The iterative-algorithm pattern the reference lacks entirely (it is a
chunking library — SURVEY.md §2.5: no aggregations): each iteration is ONE
streaming pass of ``map_batches`` over a materialized quantized projection,
with the (k x dim) centroid matrix broadcast via ``ray.put`` and per-block
partials merged on the driver (k x dim x partitions rows — tiny).

Determinism under ANY partitioning / block arrival order:

- vectors are quantized ONCE: ``q = floor(float64(f32) * 1e6)`` int64
  (the same exactness argument as stages/vecagg.py),
- per-cluster component sums and counts are int64 — associative and
  commutative, so the cross-block merge order cannot change them,
- centroids are ``sums / counts`` in float64 (exact given identical int
  inputs), assignment is ``argmin ||q - c||^2 = argmin(||c||^2 - 2 q.c)``
  in float64 with ties broken toward the lower cluster index,
- seeds are the k vectors minimizing ``hash64(vec_id)`` (splitmix64) —
  a distributed k-smallest: per-block top-k partials, driver merge; no
  global sort, no RNG.

Empty clusters keep their previous centroid (the reference-free choice
that keeps k stable).  At 100 TB the projection materialization is the
only cache; every iteration streams it with backpressure — nothing else
is ever collected beyond (k x dim) partials per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QUANT = 1_000_000.0

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_SPLITMIX_INC = np.uint64(0x9E3779B97F4A7C15)


def hash64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over int64/uint64 ids (vectorized, exact)."""
    z = x.astype(np.uint64) + _SPLITMIX_INC
    z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_C1
    z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_C2
    return z ^ (z >> np.uint64(31))


def _list_i64(mat: np.ndarray) -> pa.ListArray:
    n, d = mat.shape
    return pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32), pa.int32()),
        pa.array(mat.reshape(-1), pa.int64()))


_EMPTY_QVEC = pa.array([], pa.list_(pa.int64()))


def _quantize_block(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "qvec": _EMPTY_QVEC})
    emb = t["embedding"].combine_chunks()
    mat = np.asarray(
        emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
    ).reshape(len(t), -1)
    q = np.floor(mat * QUANT).astype(np.int64)
    return pa.table({
        "vec_id": pc.cast(t["vec_id"], pa.int64()),
        "qvec": _list_i64(q),
    })


def _block_mat(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
    qcol = t["qvec"].combine_chunks()
    # flatten(), not .values: blocks may be zero-copy slices with offsets
    q = qcol.flatten().to_numpy(zero_copy_only=False).reshape(len(t), -1)
    return ids, q


def _assign(q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    # argmin ||q-c||^2 over clusters; ||q||^2 is constant per row, dropped.
    # float64 dot of int64-exact inputs: deterministic on every block.
    score = (cent * cent).sum(axis=1)[None, :] - 2.0 * (
        q.astype(np.float64) @ cent.T.astype(np.float64))
    return np.argmin(score, axis=1)


def kmeans(ds, k: int = 8, n_iter: int = 10, return_inertia: bool = False):
    """-> (assignments Dataset (vec_id, cluster), centroids float64 (k,d)).

    ``ds`` must have columns (vec_id, embedding list<float>).
    ``return_inertia`` appends the per-round Lloyd objective history
    (sum of squared distances, float64) as a third return — the
    non-increasing sequence kmeans_inertia_gate pins.
    """
    import ray

    proj = ds.map_batches(
        _quantize_block, batch_format="pyarrow"
    ).materialize()

    # --- seeds: k smallest hash64(vec_id), one streaming pass -------------
    def seed_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "vec_id": pa.array([], pa.int64()),
                             "qvec": _EMPTY_QVEC})
        ids, q = _block_mat(t)
        h = hash64(ids)
        top = np.argsort(h, kind="stable")[:k]
        return pa.table({
            "h": pa.array(h[top], pa.uint64()),
            "vec_id": pa.array(ids[top], pa.int64()),
            "qvec": _list_i64(q[top]),
        })

    parts = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in proj.map_batches(seed_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    h = parts["h"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")[:k]
    seeds = parts["qvec"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False).reshape(len(parts), -1)[order]
    cent = seeds.astype(np.float64)
    kk, d = cent.shape  # kk < k iff the corpus has fewer than k vectors

    # --- Lloyd iterations: broadcast centroids, int64 partials ------------
    inertia_hist: list[float] = []
    for _ in range(n_iter):
        cref = ray.put(cent)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            if len(t) == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "sums": _EMPTY_QVEC,
                                 "inertia": pa.array([], pa.float64())})
            _, q = _block_mat(t)
            a = _assign(q, c)
            nk = len(c)
            sums = np.zeros((nk, q.shape[1]), dtype=np.int64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=nk).astype(np.int64)
            live = np.flatnonzero(counts > 0)
            diff = q.astype(np.float64) - c[a]
            iner = np.zeros(len(live), np.float64)
            iner[0] = float((diff * diff).sum()) if len(live) else 0.0
            return pa.table({
                "cluster": pa.array(live, pa.int64()),
                "n": pa.array(counts[live], pa.int64()),
                "sums": _list_i64(sums[live]),
                "inertia": pa.array(iner, pa.float64()),
            })

        agg = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in proj.map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
        inertia_hist.append(float(agg["inertia"].to_numpy().sum())
                            if len(agg) else 0.0)
        cl = agg["cluster"].combine_chunks().to_numpy(zero_copy_only=False)
        n = agg["n"].combine_chunks().to_numpy(zero_copy_only=False)
        s = agg["sums"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(len(agg), -1)
        tot_n = np.zeros(kk, np.int64)
        tot_s = np.zeros((kk, d), np.int64)
        np.add.at(tot_n, cl, n)
        np.add.at(tot_s, cl, s)
        new = cent.copy()  # empty clusters keep their previous centroid
        live = tot_n > 0
        new[live] = tot_s[live] / tot_n[live, None]
        if np.array_equal(new, cent):
            cent = new
            break
        cent = new

    # --- final assignment pass (streams; never collected) ------------------
    cref = ray.put(cent)

    def assign_block(t: pa.Table, _cref=cref) -> pa.Table:
        c = ray.get(_cref)
        if len(t) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        ids, q = _block_mat(t)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(_assign(q, c).astype(np.int64), pa.int64()),
        })

    out = proj.map_batches(assign_block, batch_format="pyarrow")
    if return_inertia:
        return out, cent, inertia_hist
    return out, cent


def kmeans_numpy_reference(ids: np.ndarray, mat_f32: np.ndarray,
                           k: int = 8, n_iter: int = 10):
    """Single-matrix replica of the exact algorithm (tests pin equality)."""
    q = np.floor(mat_f32.astype(np.float64) * QUANT).astype(np.int64)
    order = np.argsort(hash64(ids.astype(np.int64)), kind="stable")[:k]
    cent = q[order].astype(np.float64)
    kk = len(cent)
    for _ in range(n_iter):
        a = _assign(q, cent)
        new = cent.copy()
        for c in range(kk):
            m = a == c
            if m.any():
                new[c] = q[m].sum(axis=0) / m.sum()
        if np.array_equal(new, cent):
            break
        cent = new
    return _assign(q, cent), cent
