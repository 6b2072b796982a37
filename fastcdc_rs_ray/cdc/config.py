"""Chunker configuration: size bounds, normalization, mask selection.

Mirrors the reference's constructor-time computation
(``src/v2020/mod.rs:543-576``): ``bits = round(log2(avg_size))`` (rounded,
NOT floored — the 4.0.0→4.0.1 regression, ``src/v2020/mod.rs:414-416``),
``mask_s = MASKS[bits + nc]``, ``mask_l = MASKS[bits - nc]``, and for the
v2020 two-bytes-per-roll variant the left-shifted masks ``mask << 1``.

The reference validates bounds with ``debug_assert!``; we always raise
``ValueError`` (release-mode Python has no debug/release split).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Literal

import numpy as np

from .tables import MASKS, RONOMON_TABLE, get_gear_with_seed

Algo = Literal["v2020", "v2016", "ronomon"]

# v2016/v2020 bounds (src/v2020/mod.rs:55-65)
MINIMUM_MIN = 64
MINIMUM_MAX = 1_048_576
AVERAGE_MIN = 256
AVERAGE_MAX = 4_194_304
MAXIMUM_MIN = 1024
MAXIMUM_MAX = 16_777_216

# ronomon's wider bounds (src/ronomon/mod.rs:29-39)
RONOMON_MINIMUM_MAX = 67_108_864
RONOMON_AVERAGE_MAX = 268_435_456
RONOMON_MAXIMUM_MAX = 1_073_741_824

_U64 = (1 << 64) - 1


def logarithm2(value: int) -> int:
    """Rounded (half-away-from-zero) base-2 log, as the reference's
    ``(value as f64).log2().round()`` (src/v2020/mod.rs:414-416)."""
    return int(math.floor(math.log2(value) + 0.5))


def logarithm2_floored(value: int) -> int:
    """Floored base-2 log — the reference's *async* chunker uses
    ``avg_size.ilog2()`` (src/v2020/async_stream_cdc.rs:124), a known
    divergence from the rounded sync paths for non-power-of-two ``avg_size``
    (CHANGELOG.md [4.0.1] fixed only the sync chunkers).  Exposed as
    ``mask_select="floored"`` so the async variant's masks can be reproduced
    exactly; identical to :func:`logarithm2` whenever ``avg_size`` is a
    power of two."""
    return value.bit_length() - 1


def ronomon_mask(bits: int) -> int:
    """(1 << bits) - 1 (src/ronomon/mod.rs:228-232)."""
    if not (1 <= bits <= 31):
        raise ValueError(f"mask bits out of range: {bits}")
    return (1 << bits) - 1


def center_size(average: int, minimum: int, source_size: int) -> int:
    """ronomon's phase-1 pivot (src/ronomon/mod.rs:211-222)."""
    offset = minimum + (minimum + 1) // 2
    if offset > average:
        offset = average
    size = average - offset
    return source_size if size > source_size else size


@dataclass(frozen=True)
class ChunkerConfig:
    """Configuration for one chunker variant; all mask/table state derived
    once at construction (the reference's ``rechunk`` reuse lesson,
    src/v2020/mod.rs:627-632): build one config per worker and apply it to
    every row of every batch."""

    min_size: int = 4096
    avg_size: int = 16384
    max_size: int = 65535
    algo: Algo = "v2020"
    norm_level: int = 1  # Normalization level 0-3 (src/v2020/mod.rs:433-461)
    seed: int = 0  # gear-table XOR seed (src/v2020/mod.rs:543-576)
    # Caller-supplied gear table (256 u64 values), the config-level face of
    # the reference's public table-parametric ``cut_gear``
    # (src/v2020/mod.rs:310-329).  The left-shifted twin is derived as
    # ``gear << 1`` per the GEAR/GEAR_LS construction (src/v2020/mod.rs:179,
    # examples/table64ls.rs); seeding composes by XOR *before* the shift,
    # so combining seed != 0 with an override is rejected — XOR the seed
    # into the table yourself (get_gear_with_seed shows the convention).
    gear_override: tuple | None = None
    # "rounded" = sync chunkers (logarithm2); "floored" = the async
    # chunker's ilog2 (src/v2020/async_stream_cdc.rs:124).
    mask_select: Literal["rounded", "floored"] = "rounded"

    # derived (filled in __post_init__)
    mask_s: int = field(init=False, default=0)
    mask_l: int = field(init=False, default=0)
    mask_s_ls: int = field(init=False, default=0)
    mask_l_ls: int = field(init=False, default=0)

    def __post_init__(self) -> None:
        if self.algo not in ("v2020", "v2016", "ronomon"):
            raise ValueError(f"unknown algo: {self.algo}")
        if self.norm_level not in (0, 1, 2, 3):
            raise ValueError(f"normalization level must be 0-3: {self.norm_level}")
        min_max = RONOMON_MINIMUM_MAX if self.algo == "ronomon" else MINIMUM_MAX
        avg_max = RONOMON_AVERAGE_MAX if self.algo == "ronomon" else AVERAGE_MAX
        max_max = RONOMON_MAXIMUM_MAX if self.algo == "ronomon" else MAXIMUM_MAX
        if not (MINIMUM_MIN <= self.min_size <= min_max):
            raise ValueError(f"min_size out of bounds: {self.min_size}")
        if not (AVERAGE_MIN <= self.avg_size <= avg_max):
            raise ValueError(f"avg_size out of bounds: {self.avg_size}")
        if not (MAXIMUM_MIN <= self.max_size <= max_max):
            raise ValueError(f"max_size out of bounds: {self.max_size}")
        if self.mask_select not in ("rounded", "floored"):
            raise ValueError(f"unknown mask_select: {self.mask_select}")
        if self.gear_override is not None:
            if self.algo == "ronomon":
                raise ValueError("gear_override applies to v2016/v2020 only "
                                 "(ronomon's TABLE is fixed, src/ronomon/mod.rs:241-288)")
            if self.seed != 0:
                raise ValueError("gear_override and seed are mutually exclusive; "
                                 "XOR the seed into the override table")
            ov = tuple(int(v) for v in self.gear_override)
            if len(ov) != 256 or any(not (0 <= v <= _U64) for v in ov):
                raise ValueError("gear_override must be 256 u64 values")
            object.__setattr__(self, "gear_override", ov)
        if self.mask_select == "floored":
            bits = logarithm2_floored(self.avg_size)
        else:
            bits = logarithm2(self.avg_size)
        if self.algo == "ronomon":
            # ronomon ignores norm_level and seed; always 1 bit of
            # normalization (src/ronomon/mod.rs:115-117).
            mask_s = ronomon_mask(bits + 1)
            mask_l = ronomon_mask(bits - 1)
            object.__setattr__(self, "mask_s", mask_s)
            object.__setattr__(self, "mask_l", mask_l)
        else:
            nc = self.norm_level
            mask_s = MASKS[bits + nc]
            mask_l = MASKS[bits - nc]
            object.__setattr__(self, "mask_s", mask_s)
            object.__setattr__(self, "mask_l", mask_l)
            object.__setattr__(self, "mask_s_ls", (mask_s << 1) & _U64)
            object.__setattr__(self, "mask_l_ls", (mask_l << 1) & _U64)

    def gear_tables(self) -> tuple[np.ndarray, np.ndarray]:
        """(gear, gear_ls) numpy uint64 tables: the override if supplied
        (cut_gear parity), else the static/seeded tables."""
        if self.gear_override is not None:
            gear = np.array(self.gear_override, dtype=np.uint64)
            gear_ls = (gear << np.uint64(1))  # wraps in uint64, as GEAR_LS
            return gear, gear_ls
        return get_gear_with_seed(self.seed)

    def ronomon_table(self) -> np.ndarray:
        return RONOMON_TABLE
