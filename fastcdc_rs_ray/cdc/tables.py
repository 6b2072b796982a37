"""Gear-hash lookup tables for the FastCDC kernel family.

The 64-bit GEAR table is generated exactly the way the reference's generator
does it (``/root/reference/examples/table64.rs:14-40``): for each byte value
``b`` in 0..=255, take the MD5 digest of a 64-byte buffer filled with ``b``
and keep the high 8 bytes as a big-endian u64.  The left-shifted twin
(``GEAR_LS``, reference ``src/v2020/mod.rs:179-251``) is ``GEAR << 1`` in
wrapping u64 arithmetic.

The 31-bit ronomon table (reference ``src/ronomon/mod.rs:254-288``) is an
AES-256-CTR keystream over zeros with the high bit cleared; since this
sandbox has no AES primitive, the 1 KiB of table *data* is embedded as a
base64 blob (data, not code) and decoded at import.

The MASKS table of "spread-bits" constants comes from the destor / restic
public reference implementations (reference ``src/v2020/mod.rs:67-102``).
"""

from __future__ import annotations

import base64
import hashlib
import struct

import numpy as np

U64 = np.uint64
_U64_MASK = (1 << 64) - 1


def _generate_gear() -> np.ndarray:
    """MD5-derived 256-entry u64 gear table (examples/table64.rs:14-40)."""
    out = np.empty(256, dtype=np.uint64)
    for i in range(256):
        digest = hashlib.md5(bytes([i]) * 64).digest()
        out[i] = struct.unpack(">Q", digest[:8])[0]
    return out


GEAR: np.ndarray = _generate_gear()
GEAR.setflags(write=False)

GEAR_LS: np.ndarray = GEAR << U64(1)  # wrapping by construction of uint64
GEAR_LS.setflags(write=False)

# Pure data: the ronomon/deduplication 31-bit table (src/ronomon/mod.rs:254-288),
# big-endian u32, base64-encoded.
_RONOMON_TABLE_B64 = (
    "XJXAeCJAiYktSKIUEoQgh1MPivtHRTa5KWO08UTLc4tOp0A9TWBrbgdOxdM6850YcmADyjemKnRR"
    "ovWOdQY1jl1KsShNSuF7QehZJEcMNvdHQcvhAbt/MGF8HeMrDDofUMSPcyGoLTdglazgQZFnoDyv"
    "SbBAzqYtZrwcZlReHa0r+nfNboXaJF+wvcVlLPwpOgrhqyg34PNjh7cOExdgEkNiwrtm2PSxN/zo"
    "NCyc04YhFEKWYnJoqGUN9TcoBdV5OyHrvXNX7TQ/WLWDcVDdynNiIl5iCmBwLF71KXtSJGZ2i3jA"
    "S1TlHnX6B+UGo1/GMLcQJByGJuEpatV4KNe+LhSQoFp87kO9aYtW4wncASZO1t9uAsG/xypZrVMp"
    "wOQ0fWxSeFB5QKde9rqTaLavHkZTcnZhG8dmFVxYfTAbqEcsyd2nCkOOLApp1RR0THLTTzJrm37z"
    "QoZKDvinauBuvmacU3ISQC3LX+rpnXbH9KdqvbecDfqgOCDiKCxzDtSLBp2sLxaOzz4mEOYfLFEs"
    "jhX7jAZeYrx2aVVRNQrbhkxCaPkUNJqzqiDt/bJRcnmBN7Sz2F3RdSJrLL/kXEfPnzD6HM0j3ttW"
    "E9H1CmTt3ucIILD3RuBzCB4tHf0XsGwyJQA22ChNvzRoKS7gNi7IfAh8set2tGcgEEEw23GWY4dI"
    "LcQ/I4jvJVJBROFEvYNORI59oz+m6vk82iFcOlAM8zlctDJRlRKfQ5Rfh1GGLKRW6o/xIBA03E0y"
    "j/V9c6kJYjTTeWTPv5w29liaCizpil/k2XEDvBXFRAIdMxbBkys3UDYUGsr2nT8Dt3lJ5hoDH1LX"
    "6hxt3VwGIhjOB+ehGhkFdXp84ApTSfRPKUvMcLU5/upVUkLO6Dzla4UAuBZyRr7szDygrVYjls7o"
    "eFR/QGsICJtmpWdReB5+Rh4s+FY7wTWRSUpCAlIElNcth0WadXVVtkIoTMEfR4UHdcld/zX/jddO"
    "R1ftLhH4jF4bUEhCDmaZImsGlU0WebRaImRvFh0RMRJcaNkTE+MuSqhXJCHcfsFP+in+cpaDghyo"
    "7vM/OxwoOcL7bG12ST96IqYueJscKhbgy1N97O7rDcfhxlx1vz1SIYMzEG3k1n3GRCJlWQ/0LALs"
    "MGSprGdZyrLpSiHS8w9hblcjtU7oAnMKqi88Y01xF/xsAaxvBVqe0gwVjE4qQraZ8Ax8FLMCvZZB"
    "Fa1W/BxyL2B9oa+RI+Dbyw6T4StksnkdRA0kdliOqN1GZaZYdEbEGBh3p3RWJkB+f2O9RjLS29g8"
    "eQ9KdytyOW+LKCZnf/YJDcgsESP/41QurFOmFhOeCQr9DbwqTUI3VqNoxyNDJeQtzpGHMujqfg=="
)

RONOMON_TABLE: np.ndarray = np.frombuffer(
    base64.b64decode(_RONOMON_TABLE_B64), dtype=">u4"
).astype(np.uint32)
RONOMON_TABLE.setflags(write=False)
assert RONOMON_TABLE.shape == (256,)

# Spread-bits mask constants (src/v2020/mod.rs:75-102, identical in v2016).
# Index = number of effective bits; entries 0-5 are padding except index 5
# (used only by normalization level 3 at the smallest sizes).
MASKS: tuple[int, ...] = (
    0,
    0,
    0,
    0,
    0,
    0x0000000001804110,  # unused except for NC 3
    0x0000000001803110,  # 64B
    0x0000000018035100,  # 128B
    0x0000001800035300,  # 256B
    0x0000019000353000,  # 512B
    0x0000590003530000,  # 1KB
    0x0000D90003530000,  # 2KB
    0x0000D90103530000,  # 4KB
    0x0000D90303530000,  # 8KB
    0x0000D90313530000,  # 16KB
    0x0000D90F03530000,  # 32KB
    0x0000D90303537000,  # 64KB
    0x0000D90703537000,  # 128KB
    0x0000D90707537000,  # 256KB
    0x0000D91707537000,  # 512KB
    0x0000D91747537000,  # 1MB
    0x0000D91767537000,  # 2MB
    0x0000D93767537000,  # 4MB
    0x0000D93777537000,  # 8MB
    0x0000D93777577000,  # 16MB
    0x0000DB3777577000,  # unused except for NC 3
)


def get_gear_with_seed(seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded gear tables (src/v2020/mod.rs:260-277).

    seed == 0 returns the shared read-only tables; otherwise GEAR is XOR'd
    with ``seed`` and GEAR_LS with ``seed << 1`` (wrapping u64).
    """
    if seed == 0:
        return GEAR, GEAR_LS
    s = U64(seed & _U64_MASK)
    s_ls = U64((seed << 1) & _U64_MASK)
    return GEAR ^ s, GEAR_LS ^ s_ls
