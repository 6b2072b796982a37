"""table_profile: exact NDV / null / min-max folding across blocks.

Covers what the sf oracle data cannot: nulls, negative integers (numeric
vs lexical min), all-null columns, and values duplicated ACROSS blocks
(the per-partition distinct counts must not double-count them)."""

import pyarrow as pa


def _ds(tables):
    import ray.data as rd

    return rd.from_arrow(tables)


def test_table_profile_cross_block(ray_session):
    from fastcdc_rs_ray.stages.profile import table_profile

    t1 = pa.table(
        {
            "k": pa.array([-5, 2, 9, None], pa.int64()),
            "s": pa.array(["b", "a", None, "c"], pa.string()),
            "e": pa.array([None, None, None, None], pa.string()),
        }
    )
    t2 = pa.table(
        {
            "k": pa.array([2, 9, -10], pa.int64()),   # dups across blocks
            "s": pa.array(["a", "zz", "a"], pa.string()),
            "e": pa.array([None, None, None], pa.string()),
        }
    )
    out = table_profile(_ds([t1, t2]), int_cols=["k"], str_cols=["s", "e"],
                        num_partitions=4).to_pandas().set_index("col_name")
    k = out.loc["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (7, 1, 4)   # -10 -5 2 9
    assert (k.min_s, k.max_s) == ("-10", "9")                 # numeric, not lexical
    s = out.loc["s"]
    assert (s.n_rows, s.n_nulls, s.n_distinct) == (7, 1, 4)   # a b c zz
    assert (s.min_s, s.max_s) == ("a", "zz")
    e = out.loc["e"]
    assert (e.n_rows, e.n_nulls, e.n_distinct) == (7, 7, 0)
    assert (e.min_s, e.max_s) == ("", "")
