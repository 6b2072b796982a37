"""Hand-computed oracle for the Q16-shape distinct-supplier count per
part class with NOT-IN exclusion; DuckDB gate covers sf-scale."""

from __future__ import annotations

import pyarrow as pa

from fastcdc_rs_ray.stages.aggregate import part_supplier_counts


def test_part_supplier_counts_semantics(ray_session):
    import ray.data as rd

    part = pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["B1", "B1", "B2"]),
        "p_type": pa.array(["T", "T", "T"]),
        "p_size": pa.array([5, 5, 9], pa.int64()),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_acctbal": pa.array([10.0, -5.0, 3.0]),  # s2 excluded
    })
    # class (B1,T,5) = parts 1+2: suppliers 1 (twice, distinct), 3, and
    # excluded 2; class (B2,T,9) = part 3: supplier 3 only
    lineitem = pa.table({
        "l_partkey": pa.array([1, 2, 1, 1, 3], pa.int64()),
        "l_suppkey": pa.array([1, 1, 3, 2, 3], pa.int64()),
    })
    out = part_supplier_counts(
        rd.from_arrow(lineitem).repartition(3), part, supplier,
        num_partitions=2,
    ).to_pandas().set_index(["p_brand", "p_type", "p_size"])["supplier_cnt"]
    assert out.loc[("B1", "T", 5)] == 2
    assert out.loc[("B2", "T", 9)] == 1
    assert len(out) == 2
