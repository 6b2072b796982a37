"""minimum_spanning_forest: Kruskal parity, partition invariance,
forest properties (stages/msf.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.msf import (
    kruskal_reference,
    minimum_spanning_forest,
)


def _graph(seed: int = 8, n: int = 120, m: int = 200):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    prices = (rng.integers(100, 100000, n) / 100.0)
    edges = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
    part = pa.table({
        "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
        "p_retailprice": pa.array(prices, pa.float64()),
    })
    return edges, part, src, dst, np.round(prices * 100).astype(np.int64)


def test_matches_kruskal_and_partition_invariant(ray_session):
    import ray.data as rd

    edges, part, src, dst, price_c = _graph()
    m = src != dst
    lo = np.minimum(src[m], dst[m])
    hi = np.maximum(src[m], dst[m])
    key = np.unique(lo * np.int64(1 << 32) + hi)
    lo, hi = key >> np.int64(32), key & np.int64((1 << 32) - 1)
    w = np.abs(price_c[lo] - price_c[hi])
    want = kruskal_reference(lo, hi, w)

    outs = []
    for nblocks in (1, 6):
        got = minimum_spanning_forest(
            rd.from_arrow(edges).repartition(nblocks),
            rd.from_arrow(part),
        )
        outs.append(list(zip(got["lo"].to_pylist(), got["hi"].to_pylist(),
                             got["w_c"].to_pylist())))
    assert outs[0] == outs[1] == want
    # forest: |edges| = |vertices touched| - |components|
    verts = set(lo.tolist()) | set(hi.tolist())
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    comps = set()
    for a, b in zip(lo.tolist(), hi.tolist()):
        parent[find(a)] = find(b)
    comps = {find(v) for v in verts}
    assert len(want) == len(verts) - len(comps)
