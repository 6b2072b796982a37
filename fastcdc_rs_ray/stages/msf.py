"""Minimum spanning forest (Borůvka) over the weighted co-purchase graph.

The spanning-structure member of the graph tier (beside traversal =
part_reachability, ranking = part_pagerank, counting = triangle_count,
components = part_components): per round, every component selects its
minimum outgoing edge under a TOTAL order (weight, lo, hi) — the
tie-break makes the selected forest deterministic — selected edges merge
components, and the component count at least halves, so O(log V) rounds.

Distributed shape per round: ONE keyed exchange of (component, weight,
lo, hi) rows — each surviving edge emits one row per endpoint component,
pre-reduced per block to the per-component minimum — and a per-partition
min finishes the election; the driver union-finds the <= |components|
selected edges and re-broadcasts the vertex -> component map via
``ray.put``.  The vertex map is dimension-sized here (parts); a
corpus-scale graph would replace the broadcast with the hash-to-min CC
relabel (stages/cc.py) — same round structure, documented trade.

Edge weights are exact cents: |retailprice_c[src] - retailprice_c[dst]|
(the dimension broadcasts as a dense int64 array).  Output: the selected
forest (lo, hi, w_c), sorted — pytest pins equality with a single-matrix
Kruskal replica and partition invariance (tests/test_msf.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EDGE = pa.schema([
    ("lo", pa.int64()), ("hi", pa.int64()), ("w_c", pa.int64()),
])


def _canon_weighted(edges_ds, price_ref):
    """Directed co-purchase edges -> distinct canonical weighted edges."""
    import ray

    def canon(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _EDGE.empty_table()
        price = ray.get(price_ref)
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        m = s != d  # self-loops are never in an MSF
        lo = np.minimum(s[m], d[m])
        hi = np.maximum(s[m], d[m])
        # same guard discipline as part_kcore (ADVICE r3): the packed
        # distinct corrupts silently outside [0, 2^32) (and a negative
        # id would wrap-index the broadcast price array)
        if len(lo) and (int(lo.min()) < 0 or int(lo.max()) >= (1 << 31)
                        or int(hi.max()) >= (1 << 32)):
            raise ValueError(
                "part_msf: vertex ids out of packed-edge range "
                f"[0, 2^32) — got [{int(lo.min())}, {int(hi.max())}]")
        key = lo * np.int64(1 << 32) + hi
        uk = np.unique(key)
        lo, hi = uk >> np.int64(32), uk & np.int64((1 << 32) - 1)
        w = np.abs(price[lo] - price[hi])
        return pa.table({
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64()),
            "w_c": pa.array(w, pa.int64()),
        }).cast(_EDGE)

    return edges_ds.map_batches(canon, batch_format="pyarrow")


def minimum_spanning_forest(edges_ds, part_ds, num_partitions: int = 8):
    import ray

    from ..util import shuffle_safe_partitions
    from .cc import _sever

    num_partitions = shuffle_safe_partitions(num_partitions)

    # dimension broadcast: dense partkey -> price cents
    pt = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in part_ds.select_columns(
            ["p_partkey", "p_retailprice"]).iter_batches(
            batch_format="pyarrow"))
    pk = pt["p_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
    pr = np.round(pt["p_retailprice"].combine_chunks().to_numpy(
        zero_copy_only=False) * 100).astype(np.int64)
    dense = np.zeros(int(pk.max()) + 1 if len(pk) else 1, np.int64)
    dense[pk] = pr
    price_ref = ray.put(dense)

    edges = _sever(_canon_weighted(edges_ds, price_ref).materialize())

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    chosen: list[tuple[int, int, int]] = []
    while True:
        comp_ref = ray.put(dict(parent))

        def elect(t: pa.Table, _cref=comp_ref) -> pa.Table:
            """Per endpoint component, the block-minimum outgoing edge
            under the (w, lo, hi) total order."""
            empty = pa.table({
                "comp": pa.array([], pa.int64()),
                "w_c": pa.array([], pa.int64()),
                "lo": pa.array([], pa.int64()),
                "hi": pa.array([], pa.int64()),
            })
            if len(t) == 0:
                return empty
            pmap = ray.get(_cref)

            def root(x: int) -> int:
                while pmap.get(x, x) != x:
                    x = pmap[x]
                return x

            lo = t["lo"].combine_chunks().to_numpy(zero_copy_only=False)
            hi = t["hi"].combine_chunks().to_numpy(zero_copy_only=False)
            w = t["w_c"].combine_chunks().to_numpy(zero_copy_only=False)
            rlo = np.asarray([root(int(x)) for x in lo], np.int64)
            rhi = np.asarray([root(int(x)) for x in hi], np.int64)
            out = rlo != rhi  # intra-component edges are done
            if not out.any():
                return empty
            comp = np.concatenate([rlo[out], rhi[out]])
            ww = np.tile(w[out], 2)
            ll = np.tile(lo[out], 2)
            hh = np.tile(hi[out], 2)
            order = np.lexsort((hh, ll, ww, comp))
            comp, ww, ll, hh = comp[order], ww[order], ll[order], hh[order]
            first = np.concatenate([[True], comp[1:] != comp[:-1]])
            return pa.table({
                "comp": pa.array(comp[first], pa.int64()),
                "w_c": pa.array(ww[first], pa.int64()),
                "lo": pa.array(ll[first], pa.int64()),
                "hi": pa.array(hh[first], pa.int64()),
            })

        # per-block elect rows are already per-component minima; the
        # driver reduce sees at most |components| x blocks rows (a keyed
        # exchange on comp would bound it at |components| when the
        # component universe outgrows the driver)
        best: dict[int, tuple[int, int, int]] = {}
        for b in edges.map_batches(
                elect, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for i in range(b.num_rows):
                c = int(b["comp"][i].as_py())
                cand = (int(b["w_c"][i].as_py()), int(b["lo"][i].as_py()),
                        int(b["hi"][i].as_py()))
                if c not in best or cand < best[c]:
                    best[c] = cand
        if not best:
            break
        merged_any = False
        for w, lo, hi in sorted(set(best.values())):
            rl, rh = find(lo), find(hi)
            if rl != rh:
                if rh < rl:
                    rl, rh = rh, rl
                parent[rh] = rl
                chosen.append((lo, hi, w))
                merged_any = True
        if not merged_any:
            break

    chosen.sort()
    if not chosen:
        return _EDGE.empty_table()
    lo, hi, w = zip(*chosen)
    return pa.table({
        "lo": pa.array(lo, pa.int64()),
        "hi": pa.array(hi, pa.int64()),
        "w_c": pa.array(w, pa.int64()),
    }).cast(_EDGE)


def kruskal_reference(lo: np.ndarray, hi: np.ndarray,
                      w: np.ndarray) -> list[tuple[int, int, int]]:
    """Single-matrix Kruskal with the same (w, lo, hi) total order."""
    order = np.lexsort((hi, lo, w))
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    out = []
    for i in order:
        a, b, ww = int(lo[i]), int(hi[i]), int(w[i])
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out.append((a, b, ww))
    return sorted(out)
