"""Distributed connected components: pointer-jumping convergence on
long-diameter graphs, parity with driver union-find, non-convergence error
(stages/cc.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from fastcdc_rs_ray.stages.cc import (
    connected_components_distributed,
    connected_components_driver,
)


def _chain(n: int, prefix: str = "v"):
    """Path graph v000-v001-...-v(n-1): diameter n-1 — the LSH hot-band
    chain shape that one-hop propagation needs n rounds for."""
    ids = [f"{prefix}{i:04d}" for i in range(n)]
    edges = pa.table({
        "src": pa.array(ids[:-1]), "dst": pa.array(ids[1:]),
    })
    members = pa.table({"conv_id": pa.array(ids + [f"{prefix}_lone"])})
    return edges, members, ids


def test_long_chain_converges_in_log_rounds(ray_session):
    import ray.data as rd

    n = 300
    edges, members, ids = _chain(n)
    out = connected_components_distributed(
        rd.from_arrow(edges), rd.from_arrow(members),
        max_rounds=15,  # ~log2(300) + fixpoint-detection rounds; one-hop
        num_partitions=4,  # propagation would need ~300
    ).to_pandas()
    c = dict(zip(out.conv_id, out.cluster_id))
    assert all(c[v] == ids[0] for v in ids)
    assert c["v_lone"] == "v_lone"


def test_distributed_matches_driver(ray_session):
    import numpy as np
    import ray.data as rd

    rng = np.random.default_rng(4)
    ids = [f"n{i:03d}" for i in range(120)]
    src = rng.choice(ids, 150)
    dst = rng.choice(ids, 150)
    edges = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    members = pa.table({"conv_id": pa.array(ids)})
    a = (
        connected_components_driver(rd.from_arrow(edges), rd.from_arrow(members))
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    b = (
        connected_components_distributed(
            rd.from_arrow(edges), rd.from_arrow(members), num_partitions=4)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_nonconvergence_raises(ray_session):
    import ray.data as rd

    edges, members, _ = _chain(64)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_distributed(
            rd.from_arrow(edges), rd.from_arrow(members),
            max_rounds=2, num_partitions=4,
        )


def test_int64_vertices_match_union_find(ray_session):
    """vertex_type=pa.int64(): the numeric-graph path (part_components).
    Random multigraph with self-loops; reference = plain python union-find
    over ints."""
    import numpy as np
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 150
    src = rng.integers(0, n, 120).astype(np.int64)
    dst = rng.integers(0, n, 120).astype(np.int64)
    edges = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
    members = pa.table({"conv_id": pa.array(np.arange(n, dtype=np.int64))})

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    want = {v: find(v) for v in range(n)}

    out = connected_components_distributed(
        rd.from_arrow(edges), rd.from_arrow(members),
        num_partitions=4, vertex_type=pa.int64(),
    ).to_pandas()
    assert out.conv_id.dtype == "int64" and out.cluster_id.dtype == "int64"
    got = dict(zip(out.conv_id, out.cluster_id))
    assert got == want
