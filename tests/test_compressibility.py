"""compressibility: the zlib quality signal orders repetitive < prose <
random as the curation literature expects, is block-count invariant, and
measures zero-copy over sliced/large_string layouts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.functions.text import compressibility_batch


def test_signal_ordering_and_invariance(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    rand = "".join(chr(32 + int(c)) for c in rng.integers(0, 90, 2000))
    prose = (
        "The quick brown fox jumps over the lazy dog while the cat naps. "
        * 30
    )
    boiler = "click here to subscribe " * 80
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([boiler, prose, rand]),
    })
    out1 = compressibility_batch(t).to_pandas().set_index("doc_id")
    assert out1.loc[0, "ratio_pm"] < out1.loc[1, "ratio_pm"] < out1.loc[2, "ratio_pm"]
    assert out1.loc[2, "ratio_pm"] > 700  # random barely compresses

    got = (
        rd.from_arrow(t).repartition(3)
        .map_batches(compressibility_batch, batch_format="pyarrow")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.equals(
        out1.reset_index()[["doc_id", "raw_bytes", "zlib_bytes", "ratio_pm"]]
    )


def test_large_string_and_slices():
    t = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["aaaa" * 100, "zlib"], pa.large_string()),
    })
    whole = compressibility_batch(t)
    part = compressibility_batch(t.slice(1))
    assert part["doc_id"].to_pylist() == [8]
    assert part["zlib_bytes"].to_pylist() == [whole["zlib_bytes"].to_pylist()[1]]
