"""Allocator tuning for this sandbox's very expensive first-touch page faults.

glibc returns large (>128 KiB) freed blocks to the OS via munmap, so every
large NumPy temporary re-faults its pages (~26 us per 4 KiB page here, i.e.
~1.7 s per touched GiB).  Raising the mmap/trim thresholds keeps big buffers
on the reusable heap, making steady-state vector kernels allocation-cheap.
Safe no-op on non-glibc platforms.
"""

from __future__ import annotations

import ctypes

_applied = False


def tune_allocator() -> None:
    global _applied
    if _applied:
        return
    _applied = True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: huge -> heap, not mmap
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD: don't give heap back
    except Exception:
        pass
