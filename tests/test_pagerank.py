"""pagerank: distributed integer iterations equal the numpy replica under
multi-block partitioning; co-purchase edge derivation; hub sanity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.pagerank import (
    copurchase_edges,
    pagerank,
    pagerank_numpy_reference,
)


def _lineitems(tmp_path, n_orders=150, seed=13):
    rng = np.random.default_rng(seed)
    rows_ok, rows_pk, rows_ln = [], [], []
    for o in range(n_orders):
        n_lines = int(rng.integers(1, 6))
        # part 7 is a hub: appears in most orders
        parts = list(rng.integers(0, 40, n_lines))
        if o % 2 == 0:
            parts[int(rng.integers(0, n_lines))] = 7
        rows_ok += [o] * n_lines
        rows_pk += parts
        rows_ln += list(range(1, n_lines + 1))
    t = pa.table({
        "l_orderkey": pa.array(rows_ok, pa.int64()),
        "l_partkey": pa.array(rows_pk, pa.int64()),
        "l_linenumber": pa.array(rows_ln, pa.int64()),
    })
    path = str(tmp_path / "li.parquet")
    pq.write_table(t, path)
    return path, np.array(rows_ok), np.array(rows_pk), np.array(rows_ln)


def _ref_edges(ok, pk, ln):
    order = np.lexsort((pk, ln, ok))
    ok, pk = ok[order], pk[order]
    same = ok[1:] == ok[:-1]
    return pk[:-1][same], pk[1:][same]


def test_pagerank_matches_reference(ray_session, tmp_path):
    import ray.data as rd

    path, ok, pk, ln = _lineitems(tmp_path)
    ds = rd.read_parquet(path).repartition(6)
    edges = copurchase_edges(ds, num_partitions=4)

    out = pagerank(edges, n_iter=10).to_pandas().sort_values("node")
    src, dst = _ref_edges(ok, pk, ln)
    nodes, ranks = pagerank_numpy_reference(src, dst, n_iter=10)

    assert (out["node"].to_numpy() == nodes).all()
    assert (out["rank_q"].to_numpy() == ranks).all()
    # hub sanity: part 7 has the highest rank
    assert out.loc[out["rank_q"].idxmax(), "node"] == 7
    # mass stays bounded and positive
    assert (out["rank_q"] > 0).all()
    assert out["rank_q"].sum() <= 10**12


def test_pagerank_exchange_parity(ray_session):
    """The keyed-exchange growth path (VERDICT r3 item 3) is
    bit-identical to the broadcast path AND the numpy replica on random
    graphs, under different partitionings; pagerank_auto picks broadcast
    below the edge limit."""
    import ray.data as rd

    from fastcdc_rs_ray.stages.pagerank import (
        GRAPH_BROADCAST_EDGE_LIMIT,
        pagerank_auto,
        pagerank_exchange,
    )

    rng = np.random.default_rng(29)
    src = rng.integers(0, 250, 2500).astype(np.int64)
    dst = rng.integers(0, 250, 2500).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    nodes, ranks = pagerank_numpy_reference(src, dst, n_iter=7)
    for blocks, parts in ((1, 3), (9, 5)):
        ds = rd.from_arrow(t).repartition(blocks)
        bc = pagerank(ds, n_iter=7).to_pandas().sort_values(
            "node").reset_index(drop=True)
        ex = pagerank_exchange(ds, n_iter=7,
                               num_partitions=parts).to_pandas(
            ).sort_values("node").reset_index(drop=True)
        assert bc.equals(ex)
        assert (ex["node"].to_numpy() == nodes).all()
        assert (ex["rank_q"].to_numpy() == ranks).all()

    # auto: below the limit it must take the broadcast path (same result
    # either way — the constant only picks the cheaper plan)
    assert len(src) < GRAPH_BROADCAST_EDGE_LIMIT
    au = pagerank_auto(rd.from_arrow(t), n_iter=7).to_pandas(
        ).sort_values("node").reset_index(drop=True)
    assert (au["rank_q"].to_numpy() == ranks).all()


def test_pagerank_exchange_empty_and_dangling(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.pagerank import pagerank_exchange

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    assert len(pagerank_exchange(empty)) == 0
    # dangling sink (node 9 has no out-edges) must still get base mass
    ds = rd.from_arrow(pa.table({"src": pa.array([1, 2], pa.int64()),
                                 "dst": pa.array([9, 9], pa.int64())}))
    bc = pagerank(ds, n_iter=5).to_pandas().sort_values(
        "node").reset_index(drop=True)
    ex = pagerank_exchange(ds, n_iter=5).to_pandas().sort_values(
        "node").reset_index(drop=True)
    assert bc.equals(ex)
    assert (ex["rank_q"] > 0).all()


def test_reachability_exchange_parity(ray_session):
    """Keyed-exchange BFS (no broadcast frontier/visited) is
    bit-identical to the broadcast path on random graphs, source
    inside and outside cycles, different partitionings."""
    import ray.data as rd

    from fastcdc_rs_ray.stages.pagerank import (
        reachability,
        reachability_exchange,
    )

    rng = np.random.default_rng(37)
    src = rng.integers(0, 150, 1200).astype(np.int64)
    dst = rng.integers(0, 150, 1200).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    for blocks, parts, s, hops in ((1, 3, 0, 4), (7, 5, 7, 3)):
        ds = rd.from_arrow(t).repartition(blocks)
        a = reachability(ds, source=s, max_hops=hops).to_pandas()
        b = reachability_exchange(ds, source=s, max_hops=hops,
                                  num_partitions=parts).to_pandas()
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # isolated source: just itself at dist 0
    iso = reachability_exchange(
        rd.from_arrow(t), source=99_999, max_hops=3)
    assert iso.to_pandas().values.tolist() == [[99_999, 0]]
