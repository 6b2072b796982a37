"""k-center coreset selection: distributed vs numpy replica parity,
covering-radius monotonicity, tie-break determinism (stages/coreset.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.coreset import (
    kcenter_numpy_reference,
    kcenter_select,
)


def _emb_table(n: int, dim: int, seed: int) -> tuple[pa.Table, np.ndarray,
                                                     np.ndarray]:
    rng = np.random.default_rng(seed)
    emb = rng.normal(0, 0.2, (n, dim)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64) * 7 + 3  # non-contiguous ids
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), dim),
    })
    return t, ids, emb


def test_matches_numpy_reference_across_partitionings(ray_session):
    import ray.data as rd

    t, ids, emb = _emb_table(200, 16, seed=5)
    want_ids, want_d = kcenter_numpy_reference(ids, emb, k=10)
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        out = kcenter_select(ds, k=10, dim=16)
        assert out["vec_id"].to_pylist() == want_ids.tolist()
        assert out["dist_q"].to_pylist() == want_d.tolist()


def test_radius_sequence_weakly_decreasing_and_first_center(ray_session):
    import ray.data as rd

    t, ids, _ = _emb_table(150, 8, seed=9)
    out = kcenter_select(rd.from_arrow(t).repartition(4), k=12, dim=8)
    d = out["dist_q"].to_pylist()
    assert d[0] == -1
    assert all(a >= b for a, b in zip(d[1:], d[2:])), d
    assert out["vec_id"][0].as_py() == int(ids.min())
    # chosen ids are distinct
    chosen = out["vec_id"].to_pylist()
    assert len(set(chosen)) == len(chosen)


def test_duplicate_points_tiebreak_min_vec_id(ray_session):
    import ray.data as rd

    # two far-apart locations, each with several exact-duplicate vectors:
    # after the two locations are covered, every remaining distance is 0
    # and the tie must resolve to the smallest vec_id.
    dim = 4
    a = np.zeros(dim, np.float32)
    b = np.ones(dim, np.float32)
    emb = np.stack([a, a, a, b, b, b])
    ids = np.array([40, 10, 30, 20, 50, 60], np.int64)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), dim),
    })
    out = kcenter_select(rd.from_arrow(t).repartition(3), k=4, dim=dim)
    got = out["vec_id"].to_pylist()
    assert got[0] == 10            # smallest vec_id
    assert got[1] in (20, 50, 60)  # farthest location
    # rounds 3-4: all distances 0 -> smallest remaining vec_id wins
    assert got[2] == min(set([20, 30, 40, 50, 60]) - {got[1]})
