"""novelty_curve / dup_family_sizes / templated_convs: planted-case tests.

Plants exact-duplicate conversation families spanning blocks and arrival
buckets (the paths that need both keyed exchanges), a turn-order swap (must
NOT collapse — identity is order-sensitive), and template groups with
different token-digit buckets, then checks against the declared semantics.
"""

import numpy as np
import pyarrow as pa
import pytest

MIN_US = 60_000_000


def _t(rows):
    c, i, r, x, ts = zip(*rows)
    return pa.table(
        {
            "conv_id": pa.array(c, pa.string()),
            "turn_idx": pa.array(i, pa.int32()),
            "role": pa.array(r, pa.string()),
            "text": pa.array(x, pa.string()),
            "tool": pa.array([""] * len(c), pa.string()),
            "ts": pa.array(np.array(ts, np.int64), pa.timestamp("us")),
        }
    )


def _conv(cid, texts, t0_us, roles=None):
    roles = roles or ["user", "assistant"] * ((len(texts) + 1) // 2)
    return [
        (cid, i, roles[i], texts[i], t0_us + i * 1000)
        for i in range(len(texts))
    ]


def test_novelty_curve_cross_block(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.novelty import novelty_curve

    base = ["hello there", "general reply"]
    # minute 0: first occurrence + one unique; minute 2: two repeats of the
    # same text arriving in a LATER bucket (cross-block), one fresh text
    block_a = (
        _conv("c-00", base, 0)
        + _conv("c-01", ["solo text", "other"], 5 * 1000_000)
    )
    block_b = (
        _conv("c-02", base, 2 * MIN_US)        # repeat, later bucket
        + _conv("c-03", base, 2 * MIN_US + 7)  # repeat, same bucket as c-02
        + _conv("c-04", ["fresh text", "new"], 2 * MIN_US + 9)
    )
    ds = rd.from_arrow([_t(block_a), _t(block_b)])
    out = novelty_curve(ds, num_partitions=4).to_pandas()
    rec = dict(zip(out["bucket_min"], zip(out["n_convs"], out["n_novel"])))
    assert rec[0] == (2, 2)        # c-00 (first of family) + c-01
    assert rec[2] == (3, 1)        # c-02/c-03 repeats, c-04 novel
    assert int(out["n_convs"].sum()) == 5
    assert int(out["n_novel"].sum()) == 3  # 3 distinct full texts


def test_novelty_turn_order_matters(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.novelty import novelty_curve

    # same turn multiset, swapped order -> DIFFERENT conversations (both novel)
    rows = _conv("c-a", ["x", "y"], 0) + _conv("c-b", ["y", "x"], 1000)
    out = novelty_curve(rd.from_arrow(_t(rows)), num_partitions=2).to_pandas()
    assert int(out["n_novel"].sum()) == 2


def test_dup_family_sizes(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.novelty import dup_family_sizes

    fam3 = ["copy me", "twice more"]
    rows_a = (
        _conv("c-10", fam3, 0)
        + _conv("c-11", ["unique one"], 1000)
        + _conv("c-12", fam3, 2000)
    )
    rows_b = (
        _conv("c-13", fam3, 3000)              # third member, other block
        + _conv("c-14", ["unique two"], 4000)
        + _conv("c-15", ["copy me"], 5000)     # PREFIX: its own family of 1
    )
    ds = rd.from_arrow([_t(rows_a), _t(rows_b)])
    out = dup_family_sizes(ds, num_partitions=4).to_pandas()
    rec = dict(zip(out["family_size"], zip(out["n_families"], out["n_convs"])))
    assert rec[3] == (1, 3)
    assert rec[1] == (3, 3)  # two uniques + the prefix conv
    # rows exact dedup would drop
    assert int((out["n_convs"] - out["n_families"]).sum()) == 2


def test_templated_convs(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.convstruct import templated_convs

    # template A: user 1-digit tokens, assistant 2-digit tokens (x3 members,
    # split across blocks); template B: user 2-digit (x2); one singleton
    one = "a b c"                      # 3 tokens  -> digit '1'
    two = " ".join(["w"] * 12)         # 12 tokens -> digit '2'
    rows_a = (
        _conv("c-20", [one, two], 0)
        + _conv("c-21", ["d e", " ".join(["q"] * 45)], 1000)
        + _conv("c-30", [two, two], 2000, roles=["user", "assistant"])
    )
    rows_b = (
        _conv("c-22", ["f", " ".join(["z"] * 99)], 3000)
        + _conv("c-31", [" ".join(["m"] * 10), " ".join(["n"] * 33)], 4000)
        + _conv("c-40", [one], 5000)   # 1-turn structure: singleton
    )
    ds = rd.from_arrow([_t(rows_a), _t(rows_b)])
    out = templated_convs(ds, num_partitions=4).to_pandas()
    rec = {r["fingerprint"]: r for r in out.to_dict("records")}
    assert set(rec) == {"u1a2", "u2a2"}
    assert rec["u1a2"]["n_convs"] == 3
    assert rec["u1a2"]["rep_conv"] == "c-20"
    assert rec["u2a2"]["n_convs"] == 2
    assert rec["u2a2"]["rep_conv"] == "c-30"


def test_templated_digit_bucket_exact(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.convstruct import templated_convs

    # boundary: 9 vs 10 tokens are DIFFERENT buckets (no float log rounding)
    nine = " ".join(["t"] * 9)
    ten = " ".join(["t"] * 10)
    rows = (
        _conv("c-50", [nine], 0)
        + _conv("c-51", [nine], 1000)
        + _conv("c-52", [ten], 2000)
        + _conv("c-53", [ten], 3000)
    )
    out = templated_convs(rd.from_arrow(_t(rows)), num_partitions=2).to_pandas()
    rec = dict(zip(out["fingerprint"], out["n_convs"]))
    assert rec == {"u1": 2, "u2": 2}
