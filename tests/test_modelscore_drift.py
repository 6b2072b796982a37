"""model_score (broadcast linear scorer) + profile_drift (slice drift)."""

import pyarrow as pa

from fastcdc_rs_ray.stages.modelscore import MODEL_BIAS, LinearScorer, model_score
from fastcdc_rs_ray.stages.profile import profile_drift


def test_linear_scorer_exact():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "the the and is",        # 3+3+2-1 = 7 (+bias)
            "no vocab words here",   # wait: 'no'... none in vocab -> 0
            "",                      # empty -> bias only
        ], pa.string()),
    })
    out = LinearScorer()(t).to_pydict()
    assert out["score"] == [MODEL_BIAS + 7, MODEL_BIAS + 0, MODEL_BIAS]


def test_model_score_multiblock(ray_session):
    import ray.data as rd

    tables = [
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["with with with"], pa.string())}),
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["for on"], pa.string())}),
    ]
    out = model_score(rd.from_arrow(tables)).to_pandas().set_index("doc_id")
    assert out.loc[0, "score"] == MODEL_BIAS - 12
    assert out.loc[1, "score"] == MODEL_BIAS - 5


def test_profile_drift_detects_change(ray_session):
    import ray.data as rd

    a = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "s": pa.array(["a", "b", "b"], pa.string()),
    })
    b = pa.table({
        "k": pa.array([1, 2, 3, 9], pa.int64()),     # max changed
        "s": pa.array(["a", "b", "b", "b"], pa.string()),  # minmax same
    })
    out = profile_drift(rd.from_arrow(a), rd.from_arrow(b),
                        int_cols=["k"], str_cols=["s"],
                        num_partitions=2).to_pandas().set_index("col_name")
    assert out.loc["k", "n_rows_a"] == 3 and out.loc["k", "n_rows_b"] == 4
    assert out.loc["k", "n_distinct_b"] == 4
    assert out.loc["k", "minmax_changed"] == 1
    assert out.loc["s", "minmax_changed"] == 0
    assert out.loc["s", "n_distinct_a"] == 2
