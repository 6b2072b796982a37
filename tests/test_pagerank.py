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
