"""k-center coreset selection (farthest-point sampling) over embeddings.

The diversity-sampling curation op (coreset selection): pick k vectors
such that every vector is close to some chosen one — greedy farthest-point
gives the classic 2-approximation of the k-center objective.  Training-data
use: pick a maximally-diverse seed subset for human review / active
labelling / balanced fine-tuning.

Distributed shape (the kmeans broadcast pattern, stages/kmeans.py): the
quantized vector table materializes ONCE; each of the k rounds broadcasts
the chosen-center matrix via ``ray.put`` and runs one stateless
``map_batches`` pass that reduces every block to a single candidate row
(block max of min-distance-to-centers, vec_id tie-break) — the driver
merges blocks-many candidate rows and appends the global winner.  ZERO
keyed exchanges; per-round driver traffic is one row per block.

Determinism: components quantize to int64 (floor(f64(x) * 1e6) — the
embedding_gram/centroids rule) and ALL distances are exact int64 squared
L2 (max |q|~1e6 -> diff^2 ~4e12 x 64 dims ~2.6e14, safe), so the argmax
and its (dist DESC, vec_id ASC) tie-break are bit-identical under any
partitioning.  First center = smallest vec_id.

Output: (rank, vec_id, dist_q) — dist_q is the squared quantized distance
from the rank-r center to the nearest earlier center (the covering-radius
sequence; weakly decreasing, a pytest-pinned invariant).  rank 0 has
dist_q = -1 (no earlier center).

Scale: per-round cost is one streaming pass (n x r x dim int ops at round
r) with a k x dim broadcast — at 100 TB, k and dim are small constants
and no stage ever materializes more than one candidate row per block.
The reference has no vector ops at all (SURVEY §2.5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QUANT = 1_000_000.0


def kcenter_select(embeddings_ds, k: int = 16, dim: int = 64,
                   quant: float = QUANT) -> pa.Table:
    import ray

    def quantize(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * quant).astype(np.int64)
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "q": pa.FixedSizeListArray.from_arrays(
                pa.array(q, pa.int64()), dim),
        })

    qds = embeddings_ds.select_columns(["vec_id", "embedding"]).map_batches(
        quantize, batch_format="pyarrow").materialize()

    # first center: smallest vec_id.  Each per-block candidate row also
    # CARRIES the winning row's quantized vector (dim-sized — driver
    # traffic stays one small row per block) so the driver never re-scans
    # the dataset to fetch a chosen center (advice r02: the old
    # broadcast-filtered fetch added k extra full passes).
    def block_min(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"m": pa.array([], pa.int64()),
                             "q": pa.array([], pa.list_(pa.int64()))})
        v = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        i = int(np.argmin(v))
        return pa.table({
            "m": pa.array([int(v[i])], pa.int64()),
            "q": pa.array([t["q"][i].as_py()], pa.list_(pa.int64())),
        })

    first, first_q = None, None
    for b in qds.map_batches(block_min, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for i in range(b.num_rows):
            m = int(b["m"][i].as_py())
            if first is None or m < first:
                first = m
                first_q = np.asarray(b["q"][i].as_py(), np.int64)
    if first is None:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "dist_q": pa.array([], pa.int64())})

    chosen_ids: list[int] = [first]
    chosen_d: list[int] = [-1]
    centers = first_q.reshape(1, dim)

    for _rank in range(1, k):
        cref = ray.put((centers, np.asarray(chosen_ids, np.int64)))

        def candidate(t: pa.Table, _cref=cref) -> pa.Table:
            empty = pa.table({
                "vec_id": pa.array([], pa.int64()),
                "d": pa.array([], pa.int64()),
                "q": pa.array([], pa.list_(pa.int64())),
            })
            if len(t) == 0:
                return empty
            c, taken = ray.get(_cref)  # (r x dim) int64, plasma-local
            v = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
            q = t["q"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False).reshape(len(t), -1)
            # already-chosen centers must not win the d=0 tie again
            free = ~np.isin(v, taken)
            if not free.any():
                return empty
            v, q = v[free], q[free]
            # exact int64 squared L2 to every center; min over centers
            d = np.empty((len(v), len(c)), np.int64)
            for ci in range(len(c)):
                diff = q - c[ci]
                d[:, ci] = np.einsum("ij,ij->i", diff, diff)
            md = d.min(axis=1)
            # block winner: max distance, then min vec_id — its q rides
            # along so the driver never re-fetches it
            best = md.max()
            wi = np.flatnonzero(md == best)
            wi = wi[np.argmin(v[wi])]
            return pa.table({
                "vec_id": pa.array([int(v[wi])], pa.int64()),
                "d": pa.array([int(best)], pa.int64()),
                "q": pa.array([q[wi].tolist()], pa.list_(pa.int64())),
            })

        best_d, best_id, best_q = -1, None, None
        for b in qds.map_batches(
                candidate, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for i in range(b.num_rows):
                d = int(b["d"][i].as_py())
                vid = int(b["vec_id"][i].as_py())
                if d > best_d or (d == best_d and (best_id is None
                                                   or vid < best_id)):
                    best_d, best_id = d, vid
                    best_q = np.asarray(b["q"][i].as_py(), np.int64)
        if best_id is None:
            break  # fewer than k vectors
        chosen_ids.append(best_id)
        chosen_d.append(best_d)
        centers = np.vstack([centers, best_q])

    return pa.table({
        "rank": pa.array(range(len(chosen_ids)), pa.int64()),
        "vec_id": pa.array(chosen_ids, pa.int64()),
        "dist_q": pa.array(chosen_d, pa.int64()),
    })


def kcenter_numpy_reference(vec_ids: np.ndarray, emb: np.ndarray,
                            k: int, quant: float = QUANT):
    """Single-matrix replica for pytest parity."""
    q = np.floor(emb.astype(np.float64) * quant).astype(np.int64)
    order = np.argsort(vec_ids)
    vec_ids, q = vec_ids[order], q[order]
    chosen = [0]
    dist = [-1]
    mind = np.full(len(q), np.iinfo(np.int64).max, np.int64)
    free = np.ones(len(q), bool)
    free[0] = False
    for _ in range(1, min(k, len(q))):
        diff = q - q[chosen[-1]]
        d = np.einsum("ij,ij->i", diff, diff)
        np.minimum(mind, d, out=mind)
        best = mind[free].max()
        wid = np.flatnonzero(free & (mind == best))
        pick = wid[np.argmin(vec_ids[wid])]
        chosen.append(int(pick))
        dist.append(int(best))
        free[pick] = False
    return (vec_ids[chosen].astype(np.int64), np.asarray(dist, np.int64))
