"""Config-level extension surface: custom gear tables and async mask select.

- ``gear_override`` is the config face of the reference's public
  table-parametric ``cut_gear`` (src/v2020/mod.rs:310-329): callers supply
  their own 256-entry u64 gear table; GEAR_LS is derived as ``gear << 1``
  per the table construction (src/v2020/mod.rs:179-251, examples/table64ls.rs).
- ``mask_select="floored"`` reproduces the async chunker's ``ilog2`` mask
  selection (src/v2020/async_stream_cdc.rs:124), the documented divergence
  from the rounded sync paths for non-power-of-two ``avg_size``
  (CHANGELOG.md [4.0.1] fixed sync only).
"""

from __future__ import annotations

import numpy as np
import pytest

from fastcdc_rs_ray.cdc.config import ChunkerConfig, logarithm2, logarithm2_floored
from fastcdc_rs_ray.cdc.kernel import chunk_bytes
from fastcdc_rs_ray.cdc.kernel_np import chunk_bytes_fast
from fastcdc_rs_ray.cdc.tables import GEAR, GEAR_LS, get_gear_with_seed
from fastcdc_rs_ray.functions.gen import gen_mixed, gen_random

FIXTURE = "/root/reference/test/fixtures/SekienAkashita.jpg"


def _cover(data: bytes, chunks) -> None:
    # the reference's coverage invariant (src/v2020/mod.rs:1253-1274)
    off = 0
    for c in chunks:
        assert c.offset == off and c.length > 0
        off += c.length
    assert off == len(data)


def test_override_with_static_table_is_identity():
    data = open(FIXTURE, "rb").read()
    base = ChunkerConfig(4096, 16384, 65535)
    ov = ChunkerConfig(4096, 16384, 65535, gear_override=tuple(int(v) for v in GEAR))
    g, gls = ov.gear_tables()
    assert np.array_equal(g, GEAR) and np.array_equal(gls, GEAR_LS)
    assert chunk_bytes(data, ov) == chunk_bytes(data, base)


@pytest.mark.parametrize("algo", ["v2020", "v2016"])
def test_seed_equals_xored_override(algo):
    # get_gear_with_seed XORs GEAR with seed and GEAR_LS with seed<<1
    # (src/v2020/mod.rs:260-277); because GEAR_LS = GEAR<<1, the override's
    # derived twin (GEAR^seed)<<1 == GEAR_LS^(seed<<1) — the exact seeded
    # semantics through the override path.
    data = gen_mixed(200_000, 5)
    seed = 666
    seeded = ChunkerConfig(4096, 16384, 65535, algo=algo, seed=seed)
    xored = tuple(int(v) for v in (GEAR ^ np.uint64(seed)))
    ov = ChunkerConfig(4096, 16384, 65535, algo=algo, gear_override=xored)
    sg, sgls = get_gear_with_seed(seed)
    og, ogls = ov.gear_tables()
    assert np.array_equal(og, sg) and np.array_equal(ogls, sgls)
    assert chunk_bytes(data, ov) == chunk_bytes(data, seeded)


def test_override_changes_cuts_and_all_kernels_agree():
    # A genuinely different table: byte-reversed GEAR.  Cut points move,
    # coverage holds, and scalar == vectorized/native.
    data = gen_random(300_000, 11)
    rev = tuple(int(v) for v in GEAR[::-1])
    for algo in ("v2020", "v2016"):
        base = ChunkerConfig(1024, 4096, 16384, algo=algo)
        ov = ChunkerConfig(1024, 4096, 16384, algo=algo, gear_override=rev)
        a = chunk_bytes(data, base)
        b = chunk_bytes(data, ov)
        assert [(c.hash, c.offset, c.length) for c in b] != [
            (c.hash, c.offset, c.length) for c in a
        ]
        _cover(data, b)
        assert chunk_bytes_fast(data, ov) == [(c.hash, c.offset, c.length) for c in b]


def test_override_validation():
    with pytest.raises(ValueError):
        ChunkerConfig(gear_override=tuple(range(255)))  # wrong length
    with pytest.raises(ValueError):
        ChunkerConfig(gear_override=tuple(int(v) for v in GEAR), seed=1)
    with pytest.raises(ValueError):
        ChunkerConfig(algo="ronomon", gear_override=tuple(int(v) for v in GEAR))
    with pytest.raises(ValueError):
        ChunkerConfig(gear_override=(1 << 64,) + tuple(int(v) for v in GEAR[1:]))


def test_floored_log2_values():
    for v in (256, 1024, 16384, 65536):
        assert logarithm2_floored(v) == logarithm2(v)
    # the divergent regime: round(log2(x)) > floor for x in (2^k*sqrt(2), 2^(k+1))
    assert logarithm2(24576) == 15 and logarithm2_floored(24576) == 14
    assert logarithm2(6000) == 13 and logarithm2_floored(6000) == 12


def test_floored_mask_select_pow2_identical():
    data = gen_mixed(200_000, 3)
    a = ChunkerConfig(4096, 16384, 65535)
    b = ChunkerConfig(4096, 16384, 65535, mask_select="floored")
    assert (a.mask_s, a.mask_l) == (b.mask_s, b.mask_l)
    assert chunk_bytes(data, b) == chunk_bytes(data, a)


def test_floored_mask_select_nonpow2_diverges_like_async():
    # avg=24576: sync picks bits=15, async bits=14 — masks differ, so cut
    # points differ; both cover.  All kernels agree within each variant.
    data = gen_random(400_000, 17)
    rounded = ChunkerConfig(6144, 24576, 98304)
    floored = ChunkerConfig(6144, 24576, 98304, mask_select="floored")
    assert (rounded.mask_s, rounded.mask_l) != (floored.mask_s, floored.mask_l)
    a = chunk_bytes(data, rounded)
    b = chunk_bytes(data, floored)
    assert [c.offset for c in a] != [c.offset for c in b]
    _cover(data, a)
    _cover(data, b)
    assert chunk_bytes_fast(data, floored) == [(c.hash, c.offset, c.length) for c in b]
