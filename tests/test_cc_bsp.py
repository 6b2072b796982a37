"""BSP actor-pool connected components (stages/cc.py:
connected_components_bsp): parity with the driver union-find on random
graphs and long chains, string + int64 vertex types, non-convergence
error.  The BSP variant exists because each Dataset-shuffle round
carries a ~1.4 s operator-setup floor; its per-round cost is two actor
message barriers instead."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fastcdc_rs_ray.stages.cc import (
    connected_components_bsp,
    connected_components_driver,
)


def _assign(out_df) -> dict:
    return dict(zip(out_df.conv_id, out_df.cluster_id))


def test_chain_and_singleton_string(ray_session):
    import ray.data as rd

    ids = [f"v{i:04d}" for i in range(200)]
    edges = pa.table({"src": pa.array(ids[:-1]), "dst": pa.array(ids[1:])})
    members = pa.table({"conv_id": pa.array(ids + ["v_lone"])})
    out = connected_components_bsp(
        rd.from_arrow(edges), rd.from_arrow(members),
        max_rounds=30, n_shards=4,
    ).to_pandas()
    c = _assign(out)
    assert all(c[v] == ids[0] for v in ids)
    assert c["v_lone"] == "v_lone"
    assert len(out) == len(ids) + 1


def test_random_graph_parity_with_driver_int64(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 500
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    edges = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
    members = pa.table({"conv_id": pa.array(range(n), pa.int64())})

    bsp = connected_components_bsp(
        rd.from_arrow(edges), rd.from_arrow(members),
        max_rounds=40, n_shards=4, vertex_type=pa.int64(),
    ).to_pandas()
    drv = connected_components_driver(
        rd.from_arrow(pa.table({
            "src": pa.array([str(x) for x in src.tolist()]),
            "dst": pa.array([str(x) for x in dst.tolist()]),
        })),
        rd.from_arrow(pa.table({
            "conv_id": pa.array([str(i) for i in range(n)])})),
    ).to_pandas()
    got = {int(k): int(v) for k, v in _assign(bsp).items()}
    # driver variant works on strings; min-of-string differs from
    # min-of-int, so compare component PARTITIONS, not label values
    want_groups: dict = {}
    for k, v in _assign(drv).items():
        want_groups.setdefault(v, set()).add(int(k))
    got_groups: dict = {}
    for k, v in got.items():
        got_groups.setdefault(v, set()).add(k)
    assert sorted(map(sorted, want_groups.values())) == \
        sorted(map(sorted, got_groups.values()))
    # and the bsp labels are the component minimum
    for lab, grp in got_groups.items():
        assert lab == min(grp)


def test_two_components_one_shard(ray_session):
    import ray.data as rd

    edges = pa.table({"src": pa.array(["a", "b", "x"]),
                      "dst": pa.array(["b", "c", "y"])})
    members = pa.table({"conv_id": pa.array(["a", "b", "c", "x", "y", "z"])})
    out = connected_components_bsp(
        rd.from_arrow(edges), rd.from_arrow(members),
        max_rounds=10, n_shards=1,
    ).to_pandas()
    c = _assign(out)
    assert c == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_nonconvergence_raises(ray_session):
    import ray.data as rd

    ids = [f"v{i:04d}" for i in range(64)]
    edges = pa.table({"src": pa.array(ids[:-1]), "dst": pa.array(ids[1:])})
    members = pa.table({"conv_id": pa.array(ids)})
    with pytest.raises(Exception, match="did not converge"):
        connected_components_bsp(
            rd.from_arrow(edges), rd.from_arrow(members),
            max_rounds=2, n_shards=2,
        )


def test_non_member_bridge_vertex_both_variants(ray_session):
    """Edge endpoints absent from members_ds still BRIDGE components
    (review r3): members {3, 5}, edges 5-9 and 9-3 with 9 not a member —
    both variants must put 3 and 5 in one component and materialize 9."""
    import ray.data as rd

    from fastcdc_rs_ray.stages.cc import connected_components_distributed

    edges = pa.table({"src": pa.array([5, 9], pa.int64()),
                      "dst": pa.array([9, 3], pa.int64())})
    members = pa.table({"conv_id": pa.array([3, 5], pa.int64())})
    for fn, kw in (
        (connected_components_bsp, {"n_shards": 2,
                                    "vertex_type": pa.int64()}),
        (connected_components_distributed, {"num_partitions": 2,
                                            "vertex_type": pa.int64()}),
    ):
        out = fn(rd.from_arrow(edges), rd.from_arrow(members),
                 max_rounds=20, **kw).to_pandas()
        c = {int(k): int(v) for k, v in zip(out.conv_id, out.cluster_id)}
        assert c[3] == 3 and c[5] == 3 and c[9] == 3, (fn.__name__, c)
