"""Parallel single-file CDC (sources.bigfile) must be bit-identical to
sequential whole-file chunking — self-synchronization stitch on normal
content, sequential bridge fallback on adversarial constant bytes
(forced max_size cuts with ranges misaligned to the cut period)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from fastcdc_rs_ray.cdc.config import ChunkerConfig
from fastcdc_rs_ray.cdc.kernel import chunk_bytes
from fastcdc_rs_ray.sources.bigfile import chunk_file_parallel

CFG = ChunkerConfig(64, 256, 1024)


def _check(path, data, cfg, **kw):
    ds, bridges = chunk_file_parallel(path, cfg, **kw)
    got = (
        ds.to_pandas()
        .sort_values("offset")
        .reset_index(drop=True)[["hash", "offset", "length"]]
    )
    exp = chunk_bytes(data, cfg)
    assert got["offset"].tolist() == [c.offset for c in exp]
    assert got["length"].tolist() == [c.length for c in exp]
    assert got["hash"].tolist() == [c.hash for c in exp]
    # exact coverage, no overlap
    assert (got["offset"] + got["length"]).tolist()[:-1] == got["offset"].tolist()[1:]
    assert got["offset"].iloc[0] == 0
    assert int(got["offset"].iloc[-1] + got["length"].iloc[-1]) == len(data)
    return bridges


@pytest.mark.parametrize("algo", ["v2020", "v2016", "ronomon"])
def test_parallel_matches_sequential(ray_session, tmp_path, algo):
    cfg = ChunkerConfig(64, 256, 1024, algo=algo)
    data = np.random.default_rng(21).integers(
        0, 256, 600_000, dtype=np.uint8
    ).tobytes()
    p = os.path.join(str(tmp_path), "big.bin")
    with open(p, "wb") as f:
        f.write(data)
    bridges = _check(p, data, cfg, range_bytes=64 << 10, read_size=16 << 10)
    assert bridges == []  # random content syncs within the overlap


def test_single_range_and_tail_runt(ray_session, tmp_path):
    # file smaller than one range; ends in a sub-min runt (hash 0)
    data = np.random.default_rng(3).integers(
        0, 256, 30_050, dtype=np.uint8
    ).tobytes()
    p = os.path.join(str(tmp_path), "small.bin")
    with open(p, "wb") as f:
        f.write(data)
    bridges = _check(p, data, CFG, range_bytes=1 << 20)
    assert bridges == []


def test_seam_near_eof(ray_session, tmp_path):
    # last range is tiny; second-to-last's scan window reaches EOF and
    # must apply true EOF semantics for its tail candidates
    data = np.random.default_rng(5).integers(
        0, 256, (64 << 10) + 100, dtype=np.uint8
    ).tobytes()
    p = os.path.join(str(tmp_path), "edge.bin")
    with open(p, "wb") as f:
        f.write(data)
    _check(p, data, CFG, range_bytes=32 << 10)


def test_bridge_fallback_constant_bytes(ray_session, tmp_path):
    # All zeros -> every cut is a forced max_size cut; range starts at
    # 4.5*max_size are misaligned to the 1024-byte cut period, so odd seams
    # can never sync and must take the sequential bridge. Output must STILL
    # be bit-identical.
    data = bytes(40_000)
    p = os.path.join(str(tmp_path), "zeros.bin")
    with open(p, "wb") as f:
        f.write(data)
    bridges = _check(
        p, data, CFG, range_bytes=4608, overlap=4096, read_size=4096
    )
    assert bridges, "constant bytes with misaligned ranges must bridge"


def test_validation(ray_session, tmp_path):
    p = os.path.join(str(tmp_path), "x.bin")
    with open(p, "wb") as f:
        f.write(b"\x00" * 10)
    with pytest.raises(ValueError):
        chunk_file_parallel(p, CFG, range_bytes=100)
    with pytest.raises(ValueError):
        chunk_file_parallel(p, CFG, range_bytes=1 << 20, overlap=100)
