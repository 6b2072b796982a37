"""BloomFilter: zero false negatives, bounded false-positive rate, and the
semi-join stage's exactness against a numpy reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.functions.bloom import BloomFilter
from fastcdc_rs_ray.stages.bloomjoin import bloom_semi_stats


def test_bloom_no_false_negatives_and_low_fpr():
    rng = np.random.default_rng(3)
    members = rng.choice(1 << 40, size=5000, replace=False).astype(np.int64)
    others = rng.choice(1 << 40, size=20000, replace=False).astype(np.int64)
    others = np.setdiff1d(others, members)
    bf = BloomFilter.build(members, log2_bits=16, k=4)  # m/n = 13 bits/key
    assert bf.contains(members).all()                   # never a false neg
    fpr = bf.contains(others).mean()
    assert fpr < 0.02                                   # theory ~0.24% at k=4
    assert not bf.contains(np.array([], np.int64)).any()


def test_bloom_semi_stats_exact(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(9)
    n_part, n_li = 200, 5000
    p_size = rng.integers(1, 51, n_part)
    part = pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_size": pa.array(p_size.astype(np.int32), pa.int32()),
    })
    lpk = rng.integers(0, n_part, n_li).astype(np.int64)
    qty = rng.integers(1, 50, n_li).astype(np.float64)
    rf = np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
    li = pa.table({
        "l_partkey": pa.array(lpk),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_returnflag": pa.array(list(rf), pa.string()),
    })
    pp, lp = str(tmp_path / "p.parquet"), str(tmp_path / "l.parquet")
    pq.write_table(part, pp)
    pq.write_table(li, lp)

    out = bloom_semi_stats(
        rd.read_parquet(lp).repartition(6), rd.read_parquet(pp),
        min_size=45, log2_bits=10,   # tiny filter -> real false positives
    ).to_pandas().sort_values("l_returnflag").reset_index(drop=True)

    keep = p_size[lpk] >= 45
    for i, flag in enumerate(out["l_returnflag"]):
        m = keep & (rf == flag)
        assert out["n_items"][i] == m.sum()
        assert out["sum_qty"][i] == int(qty[m].sum())
    assert set(out["l_returnflag"]) == set(rf[keep])
