"""chunk_param_sweep: per-config byte coverage, finer-chunks-find-more-
shared-bytes on planted partial overlap, determinism
(stages/delta.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.delta import chunk_param_sweep


def _corpus():
    """Docs sharing a large middle section but with distinct heads and
    tails: whole-doc dedup finds nothing, fine chunks find the shared
    middle."""
    rng = np.random.default_rng(13)
    shared = rng.integers(32, 127, 60_000, dtype=np.uint8).tobytes()
    docs = []
    for i in range(12):
        head = rng.integers(32, 127, 5_000, dtype=np.uint8).tobytes()
        tail = rng.integers(32, 127, 5_000, dtype=np.uint8).tobytes()
        docs.append((head + shared + tail).decode("ascii"))
    return pa.table({
        "conv_id": pa.array([f"d{i:03d}" for i in range(len(docs))]),
        "payload": pa.array([d.encode() for d in docs], pa.large_binary()),
    })


def test_coverage_monotonicity_determinism(ray_session):
    import ray.data as rd

    t = _corpus()
    total = sum(len(p.as_py()) for p in t["payload"])
    configs = ((512, 2048, 8192), (2048, 8192, 32768), (65536, 262144, 1048576))
    outs = []
    for nblocks in (1, 4):
        out = chunk_param_sweep(
            rd.from_arrow(t).repartition(nblocks), configs=configs
        ).to_pandas()
        outs.append(out)
    assert outs[0].equals(outs[1])  # partition invariance
    out = outs[0]
    # coverage: every config accounts for every corpus byte
    assert (out.total_bytes == total).all()
    # finer chunks find at least as many duplicate bytes; the huge config
    # (chunks ~ whole docs) finds none of the planted partial overlap
    dup = (out.total_bytes - out.distinct_bytes).to_numpy()
    assert dup[0] >= dup[1] >= dup[2]
    assert dup[0] > 0
    assert out.dedup_bp.iloc[0] > out.dedup_bp.iloc[2]
