"""chunk_store_roundtrip: content-addressable store build + lossless
reconstruction proof, dedup ratio on planted twins, block invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.cdc import ChunkerConfig
from fastcdc_rs_ray.sources.transcripts import synth_transcripts
from fastcdc_rs_ray.stages.assemble import assemble
from fastcdc_rs_ray.stages.store import chunk_store_roundtrip

CFG = ChunkerConfig(64, 256, 1024)


def test_store_roundtrip_lossless_and_dedups(ray_session):
    import ray.data as rd

    transcripts, truth = synth_transcripts(n_convs=100, seed=23, dup_frac=0.4)
    ds = rd.from_arrow(transcripts).repartition(5)
    out = chunk_store_roundtrip(assemble(ds, num_partitions=4), CFG,
                                num_partitions=4).to_pylist()[0]
    # lossless: every conversation reconstructs bit-for-bit from the store
    assert out["n_equal"] == out["n_convs"] > 0
    # planted twins (~40%, several exact copies) must dedup real bytes
    assert out["bytes_unique"] < out["bytes_total"]
    assert out["dedup_bp"] > 500  # > 5% of bytes shared
    assert out["n_unique_chunks"] < out["n_chunks"]

    # partition invariance: same summary at a different block layout
    ds2 = rd.from_arrow(transcripts).repartition(2)
    out2 = chunk_store_roundtrip(assemble(ds2, num_partitions=3), CFG,
                                 num_partitions=3).to_pylist()[0]
    assert out2 == out


def test_store_roundtrip_all_unique_corpus(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    # payloads of incompressible random bytes -> no cross-conv dedup,
    # still lossless
    t = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(40)], pa.string()),
        "payload": pa.array([rng.bytes(int(rng.integers(200, 3000)))
                             for _ in range(40)], pa.large_binary()),
    })
    out = chunk_store_roundtrip(rd.from_arrow(t).repartition(4), CFG,
                                num_partitions=3).to_pylist()[0]
    assert out["n_equal"] == out["n_convs"] == 40
    assert out["bytes_total"] == sum(
        len(x) for x in t["payload"].to_pylist())
