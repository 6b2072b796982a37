"""PageRank over the part co-purchase graph — distributed iterations with
floor-quantized integer mass (bit-deterministic under any partitioning).

Second member of the iterative-algorithm family (stages/kmeans.py is the
first; the reference has none of this — it is a chunking library):

- Edge derivation is ONE keyed exchange: lineitems group by order, a
  per-block lexsort emits a directed edge between consecutive line numbers
  of the same order (the classic co-occurrence graph build).
- Rank iterations hold the rank vector on the driver and broadcast it via
  ``ray.put`` each round (valid while |nodes| x 8 B fits a worker — the
  usual case for entity graphs; a keyed-exchange variant that shuffles
  (dst, contribution) partials instead is the growth path and uses the
  same block kernel).
- All mass arithmetic is int64 with floor division:
  ``contrib(u->v) = (85 * r_u) // (100 * out_deg_u)``,
  ``r' = (15 * S // 100) // N + sum(contrib)`` at scale S = 1e12.
  Floors leak a little mass (sum r < S) — that is deliberate: the result
  is EXACTLY reproducible (pytest pins equality against a single-matrix
  numpy replica), unlike float PageRank whose cross-block addition order
  drifts.  Dangling-node mass is dropped, not redistributed (documented
  choice, shared by the replica).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 1_000_000_000_000  # 1e12: rank unit = 1e-12 of total mass

_EDGE = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def copurchase_edges(lineitem_ds, num_partitions: int = 8):
    """lineitem -> directed edges (src part, dst part) between consecutive
    line numbers of the same order.  Line numbers are NOT unique within an
    order in the testdata, so the sort adds l_partkey as a tiebreaker —
    mirrored in every SQL oracle's ``ORDER BY l_linenumber, l_partkey`` —
    to keep the edge set deterministic."""
    mid = pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_linenumber", pa.int64()),
    ])

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "l_linenumber": pc.cast(t["l_linenumber"], pa.int64()),
        }).cast(mid)

    ex = lineitem_ds.map_batches(project, batch_format="pyarrow").repartition(
        num_blocks=num_partitions, keys=["l_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _EDGE.empty_table()
        ok = t["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = t["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = t["l_linenumber"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, ln, ok))
        ok, pk = ok[order], pk[order]
        same = ok[1:] == ok[:-1]
        return pa.table({
            "src": pa.array(pk[:-1][same], pa.int64()),
            "dst": pa.array(pk[1:][same], pa.int64()),
        }).cast(_EDGE)

    return ex.map_batches(edges, batch_format="pyarrow", batch_size=None)


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in ds.iter_batches(batch_format="pyarrow")]
    )


def pagerank(edges_ds, n_iter: int = 10, damping_pct: int = 85):
    """edges (src, dst) -> (node, rank_q): quantized int64 PageRank."""
    import ray

    edges_ds = edges_ds.materialize()

    # node universe + out-degrees: one streaming partial pass
    def deg_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        us, cs = np.unique(src, return_counts=True)
        ud = np.unique(dst)
        node = np.concatenate([us, ud])
        deg = np.concatenate([cs.astype(np.int64), np.zeros(len(ud), np.int64)])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "deg": pa.array(deg, pa.int64())})

    dp = _collect(edges_ds.map_batches(deg_partial, batch_format="pyarrow"))
    node_all = dp["node"].to_numpy(zero_copy_only=False)
    deg_all = dp["deg"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(node_all, return_inverse=True)
    deg = np.zeros(len(nodes), np.int64)
    np.add.at(deg, inv, deg_all)
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank_q": pa.array([], pa.int64())})

    nref = ray.put(nodes)
    dref = ray.put(deg)
    base = (SCALE * (100 - damping_pct) // 100) // n
    r = np.full(n, SCALE // n, np.int64)

    for _ in range(n_iter):
        rref = ray.put(r)

        def contrib(t: pa.Table, _rref=rref) -> pa.Table:
            if len(t) == 0:
                return pa.table({"dst_ix": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            nd = ray.get(nref)
            dg = ray.get(dref)
            rv = ray.get(_rref)
            src = np.searchsorted(
                nd, t["src"].combine_chunks().to_numpy(zero_copy_only=False))
            dst = np.searchsorted(
                nd, t["dst"].combine_chunks().to_numpy(zero_copy_only=False))
            c = (np.int64(damping_pct) * rv[src]) // (100 * dg[src])
            sums = np.zeros(len(nd), np.int64)
            np.add.at(sums, dst, c)
            live = np.flatnonzero(sums > 0)
            return pa.table({"dst_ix": pa.array(live, pa.int64()),
                             "c": pa.array(sums[live], pa.int64())})

        part = _collect(edges_ds.map_batches(contrib, batch_format="pyarrow"))
        new = np.full(n, base, np.int64)
        np.add.at(new, part["dst_ix"].to_numpy(zero_copy_only=False),
                  part["c"].to_numpy(zero_copy_only=False))
        if np.array_equal(new, r):
            r = new
            break
        r = new

    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank_q": pa.array(r, pa.int64())})


def pagerank_numpy_reference(src: np.ndarray, dst: np.ndarray,
                             n_iter: int = 10, damping_pct: int = 85):
    """Single-matrix replica of the exact integer algorithm."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    s = np.searchsorted(nodes, src)
    d = np.searchsorted(nodes, dst)
    deg = np.bincount(s, minlength=n).astype(np.int64)
    base = (SCALE * (100 - damping_pct) // 100) // n
    r = np.full(n, SCALE // n, np.int64)
    for _ in range(n_iter):
        c = (np.int64(damping_pct) * r[s]) // (100 * deg[s])
        new = np.full(n, base, np.int64)
        np.add.at(new, d, c)
        if np.array_equal(new, r):
            break
        r = new
    return nodes, r


def reachability(edges_ds, source: int = 0, max_hops: int = 4) -> pa.Table:
    """BFS over the edge Dataset: (node, dist = min hops from ``source``)
    for every node within ``max_hops`` — the graph-traversal class, and
    (unlike k-means/PageRank) SQL-checkable via a recursive CTE, so the
    driver gate verifies the distributed iteration exactly.

    Each hop is one streaming pass: the frontier (sorted int64 array)
    broadcasts via ``ray.put``, blocks emit the distinct successors of
    frontier members (searchsorted membership — no Python loop), and the
    driver subtracts visited nodes.  Frontier/visited are node-universe
    sized (the same broadcastability assumption as :func:`pagerank`)."""
    import ray

    edges_ds = edges_ds.materialize()
    visited = {int(source): 0}
    frontier = np.array([source], np.int64)

    for hop in range(1, max_hops + 1):
        fref = ray.put(np.sort(frontier))

        def succ(t: pa.Table, _fref=fref) -> pa.Table:
            if len(t) == 0:
                return pa.table({"node": pa.array([], pa.int64())})
            fr = ray.get(_fref)
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.searchsorted(fr, src)
            pos_c = np.minimum(pos, len(fr) - 1)
            hit = fr[pos_c] == src
            return pa.table({"node": pa.array(np.unique(dst[hit]), pa.int64())})

        parts = _collect(edges_ds.map_batches(succ, batch_format="pyarrow"))
        nxt = np.unique(parts["node"].to_numpy(zero_copy_only=False))
        fresh = np.array([n for n in nxt.tolist() if n not in visited],
                         np.int64)
        if len(fresh) == 0:
            break
        for n in fresh.tolist():
            visited[n] = hop
        frontier = fresh

    nodes = np.array(sorted(visited), np.int64)
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "dist": pa.array([visited[int(n)] for n in nodes], pa.int64()),
    })
