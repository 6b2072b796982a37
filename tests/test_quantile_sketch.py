"""value_quantiles_sketch: sample quantiles track exact quantiles within
the ~1/sqrt(sampled_n) bound, and the sample is retry-stable (pure
function of event_id — two runs agree exactly)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.sketch import value_quantiles_sketch


def test_sketch_quantiles_accuracy_and_determinism(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(17)
    n = 50_000
    vals = np.round(rng.lognormal(3.0, 1.0, n), 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "value": pa.array(vals, pa.float64()),
    })
    path = str(tmp_path / "ev.parquet")
    pq.write_table(t, path)

    ds = rd.read_parquet(path).repartition(8)
    out1 = value_quantiles_sketch(ds).to_pandas()
    out2 = value_quantiles_sketch(
        rd.read_parquet(path).repartition(3)).to_pandas()
    # deterministic: independent runs with different blocking agree exactly
    assert out1.equals(out2)

    vc = np.sort(np.round(vals * 100).astype(np.int64))
    for _, row in out1.iterrows():
        q = row["q"]
        exact = vc[int(np.ceil(q * n)) - 1]
        # rank error bound: a 10% sample of 50k has ~70-row rank std; allow
        # 5 sigma translated through the empirical cdf
        lo = vc[max(0, int(np.ceil((q - 0.02) * n)) - 1)]
        hi = vc[min(n - 1, int(np.ceil((q + 0.02) * n)) - 1)]
        assert lo <= row["value_c"] <= hi, (q, row["value_c"], exact)
