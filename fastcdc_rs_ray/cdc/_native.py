"""Optional native (C, compiled at first use) FastCDC cut loops.

The gear roll is a strictly sequential byte loop; the fastest exact form is
the same per-byte loop the reference uses (``src/v2020/mod.rs:350-409``),
which NumPy cannot express without the windowed-scan detour in
:mod:`.kernel_np`.  When a C compiler is present we build a tiny shared
library once per machine (cached under ``/tmp``), bind it with ctypes, and
use it for the hot chunking path.  Everything degrades gracefully to the
NumPy kernel when compilation is unavailable; the pure-Python scalar kernel
in :mod:`.kernel` remains the conformance baseline either way.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SOURCE = r"""
#include <stdint.h>

/* FastCDC v2020 cut loop: two bytes per roll with the left-shifted twin
   table; matched byte excluded from the chunk; sub-minimum tail yields
   hash 0.  Semantics of fastcdc-rs src/v2020/mod.rs:350-409. */
int64_t chunk_v2020(const uint8_t* buf, const int64_t* row_offsets, int64_t nrows,
                    int64_t min_size, int64_t avg_size, int64_t max_size,
                    uint64_t mask_s, uint64_t mask_l,
                    uint64_t mask_s_ls, uint64_t mask_l_ls,
                    const uint64_t* gear, const uint64_t* gear_ls,
                    int32_t* out_row, uint64_t* out_hash,
                    int64_t* out_off, int64_t* out_len)
{
    int64_t k = 0;
    for (int64_t r = 0; r < nrows; r++) {
        const uint8_t* src0 = buf + row_offsets[r];
        int64_t n = row_offsets[r + 1] - row_offsets[r];
        int64_t pos = 0;
        while (pos < n) {
            const uint8_t* src = src0 + pos;
            int64_t remaining = n - pos;
            uint64_t h = 0;
            int64_t cut = -1;
            if (remaining <= min_size) {
                cut = remaining;
            } else {
                int64_t center = avg_size;
                int64_t rem = remaining;
                if (rem > max_size) rem = max_size;
                else if (rem < center) center = rem;
                int64_t limit1 = center / 2, limit2 = rem / 2;
                int64_t index = min_size / 2;
                while (index < limit1) {
                    int64_t a = index * 2;
                    h = (h << 2) + gear_ls[src[a]];
                    if ((h & mask_s_ls) == 0) { cut = a; break; }
                    h += gear[src[a + 1]];
                    if ((h & mask_s) == 0) { cut = a + 1; break; }
                    index++;
                }
                if (cut < 0) {
                    while (index < limit2) {
                        int64_t a = index * 2;
                        h = (h << 2) + gear_ls[src[a]];
                        if ((h & mask_l_ls) == 0) { cut = a; break; }
                        h += gear[src[a + 1]];
                        if ((h & mask_l) == 0) { cut = a + 1; break; }
                        index++;
                    }
                }
                if (cut < 0) cut = rem;
            }
            out_row[k] = (int32_t) r;
            out_hash[k] = h;
            out_off[k] = pos;
            out_len[k] = cut;
            k++;
            pos += cut;
        }
    }
    return k;
}

/* FastCDC v2016 cut loop: one byte per roll (src/v2016/mod.rs:159-203). */
int64_t chunk_v2016(const uint8_t* buf, const int64_t* row_offsets, int64_t nrows,
                    int64_t min_size, int64_t avg_size, int64_t max_size,
                    uint64_t mask_s, uint64_t mask_l,
                    const uint64_t* gear,
                    int32_t* out_row, uint64_t* out_hash,
                    int64_t* out_off, int64_t* out_len)
{
    int64_t k = 0;
    for (int64_t r = 0; r < nrows; r++) {
        const uint8_t* src0 = buf + row_offsets[r];
        int64_t n = row_offsets[r + 1] - row_offsets[r];
        int64_t pos = 0;
        while (pos < n) {
            const uint8_t* src = src0 + pos;
            int64_t remaining = n - pos;
            uint64_t h = 0;
            int64_t cut = -1;
            if (remaining <= min_size) {
                cut = remaining;
            } else {
                int64_t center = avg_size;
                int64_t rem = remaining;
                if (rem > max_size) rem = max_size;
                else if (rem < center) center = rem;
                int64_t index = min_size;
                while (index < center) {
                    h = (h << 1) + gear[src[index]];
                    if ((h & mask_s) == 0) { cut = index; break; }
                    index++;
                }
                if (cut < 0) {
                    while (index < rem) {
                        h = (h << 1) + gear[src[index]];
                        if ((h & mask_l) == 0) { cut = index; break; }
                        index++;
                    }
                }
                if (cut < 0) cut = rem;
            }
            out_row[k] = (int32_t) r;
            out_hash[k] = h;
            out_off[k] = pos;
            out_len[k] = cut;
            k++;
            pos += cut;
        }
    }
    return k;
}

/* ronomon 31-bit variant: right shift, matched byte INCLUDED in the chunk,
   adaptive center_size pivot (src/ronomon/mod.rs:132-175, :211-222).
   Whole-row (eof) form. */
static int64_t center_size(int64_t average, int64_t minimum, int64_t source_size)
{
    int64_t offset = minimum + (minimum + 1) / 2;
    if (offset > average) offset = average;
    int64_t size = average - offset;
    return (size > source_size) ? source_size : size;
}

int64_t chunk_ronomon(const uint8_t* buf, const int64_t* row_offsets, int64_t nrows,
                      int64_t min_size, int64_t avg_size, int64_t max_size,
                      uint32_t mask_s, uint32_t mask_l,
                      const uint32_t* table,
                      int32_t* out_row, uint64_t* out_hash,
                      int64_t* out_off, int64_t* out_len)
{
    int64_t k = 0;
    for (int64_t r = 0; r < nrows; r++) {
        const uint8_t* src = buf + row_offsets[r];
        int64_t n = row_offsets[r + 1] - row_offsets[r];
        int64_t pos = 0;
        while (pos < n) {
            int64_t sz = n - pos;
            uint32_t h = 0;
            int64_t cut = -1;
            if (sz <= min_size) {
                cut = sz;
            } else {
                if (sz > max_size) sz = max_size;
                int64_t off = pos;
                int64_t len1 = pos + center_size(avg_size, min_size, sz);
                int64_t len2 = pos + sz;
                off += min_size;
                while (off < len1) {
                    h = (h >> 1) + table[src[off]];
                    off++;
                    if ((h & mask_s) == 0) { cut = off - pos; break; }
                }
                if (cut < 0) {
                    while (off < len2) {
                        h = (h >> 1) + table[src[off]];
                        off++;
                        if ((h & mask_l) == 0) { cut = off - pos; break; }
                    }
                }
                if (cut < 0) cut = sz;
            }
            out_row[k] = (int32_t) r;
            out_hash[k] = (uint64_t) h;
            out_off[k] = pos;
            out_len[k] = cut;
            k++;
            pos += cut;
        }
    }
    return k;
}

/* MinHash signatures: per segment, per permutation, min over shingles of
   splitmix64(shingle ^ key[p]).  Bit-identical to the NumPy path in
   stages/minhash.py (same finalizer constants as util.mix64), but with no
   large temporaries: 128 running minima live in cache, so the stage stays
   ALU-bound instead of memory-bandwidth-bound. */
int64_t minhash_sigs(const uint64_t* sh, int64_t m,
                     const int64_t* seg_starts, int64_t G,
                     const uint64_t* keys, int64_t P, uint64_t* out)
{
    for (int64_t g = 0; g < G; g++) {
        int64_t s = seg_starts[g];
        int64_t e = (g + 1 < G) ? seg_starts[g + 1] : m;
        uint64_t* o = out + g * P;
        for (int64_t p = 0; p < P; p++) o[p] = UINT64_MAX;
        for (int64_t i = s; i < e; i++) {
            uint64_t x = sh[i];
            for (int64_t p = 0; p < P; p++) {
                uint64_t z = (x ^ keys[p]) + 0x9E3779B97F4A7C15ULL;
                z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
                z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
                z = z ^ (z >> 31);
                if (z < o[p]) o[p] = z;
            }
        }
    }
    return 0;
}
"""



def _build() -> ctypes.CDLL | None:
    digest = hashlib.md5(_C_SOURCE.encode()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "fastcdc_rs_ray_native")
    so_path = os.path.join(cache_dir, f"libfastcdc_{digest}.so")
    if not os.path.exists(so_path):
        try:
            os.makedirs(cache_dir, exist_ok=True)
            # serialize concurrent builds (many Ray workers importing at
            # once): one process compiles, the rest wait on the lock —
            # a failed racer would otherwise silently pin the 100x-slower
            # NumPy fallback for its whole worker lifetime
            import fcntl
            import time as _time

            with open(os.path.join(cache_dir, ".build.lock"), "w") as lockf:
                fcntl.flock(lockf, fcntl.LOCK_EX)
                try:
                    if not os.path.exists(so_path):
                        with tempfile.TemporaryDirectory(dir=cache_dir) as td:
                            c_path = os.path.join(td, "fastcdc.c")
                            tmp_so = os.path.join(td, "lib.so")
                            with open(c_path, "w") as f:
                                f.write(_C_SOURCE)
                            subprocess.run(
                                ["cc", "-O3", "-march=native", "-shared", "-fPIC",
                                 "-o", tmp_so, c_path],
                                check=True,
                                capture_output=True,
                                timeout=120,
                            )
                            os.replace(tmp_so, so_path)  # atomic
                finally:
                    fcntl.flock(lockf, fcntl.LOCK_UN)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    i64, u64, u32 = ctypes.c_int64, ctypes.c_uint64, ctypes.c_uint32
    p = ctypes.c_void_p
    lib.chunk_v2020.restype = i64
    lib.chunk_v2020.argtypes = [p, p, i64, i64, i64, i64, u64, u64, u64, u64, p, p, p, p, p, p]
    lib.chunk_v2016.restype = i64
    lib.chunk_v2016.argtypes = [p, p, i64, i64, i64, i64, u64, u64, p, p, p, p, p]
    lib.chunk_ronomon.restype = i64
    lib.chunk_ronomon.argtypes = [p, p, i64, i64, i64, i64, u32, u32, p, p, p, p, p]
    lib.minhash_sigs.restype = i64
    lib.minhash_sigs.argtypes = [p, i64, p, i64, p, i64, p]
    return lib


_lib: ctypes.CDLL | None = None
_tried = False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _build()
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def chunk_rows_native(buf: np.ndarray, row_offsets: np.ndarray, cfg):
    """Native chunk_rows; returns (row int32, hash uint64, off int64, len int64)
    or None when no native library is available."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.ascontiguousarray(buf.view(np.uint8))
    row_offsets = np.ascontiguousarray(row_offsets, dtype=np.int64)
    nrows = len(row_offsets) - 1
    total = int(row_offsets[-1] - row_offsets[0])
    # smallest possible non-runt chunk is min_size - 1 (odd min_size, even cut)
    cap = total // max(1, cfg.min_size - 1) + nrows + 1
    out_row = np.empty(cap, dtype=np.int32)
    out_hash = np.empty(cap, dtype=np.uint64)
    out_off = np.empty(cap, dtype=np.int64)
    out_len = np.empty(cap, dtype=np.int64)
    if cfg.algo == "v2020":
        gear, gear_ls = cfg.gear_tables()
        gear = np.ascontiguousarray(gear)
        gear_ls = np.ascontiguousarray(gear_ls)
        k = lib.chunk_v2020(
            _ptr(buf), _ptr(row_offsets), nrows,
            cfg.min_size, cfg.avg_size, cfg.max_size,
            cfg.mask_s, cfg.mask_l, cfg.mask_s_ls, cfg.mask_l_ls,
            _ptr(gear), _ptr(gear_ls),
            _ptr(out_row), _ptr(out_hash), _ptr(out_off), _ptr(out_len),
        )
    elif cfg.algo == "v2016":
        gear, _ = cfg.gear_tables()
        gear = np.ascontiguousarray(gear)
        k = lib.chunk_v2016(
            _ptr(buf), _ptr(row_offsets), nrows,
            cfg.min_size, cfg.avg_size, cfg.max_size,
            cfg.mask_s, cfg.mask_l, _ptr(gear),
            _ptr(out_row), _ptr(out_hash), _ptr(out_off), _ptr(out_len),
        )
    else:  # ronomon
        table = np.ascontiguousarray(cfg.ronomon_table())
        k = lib.chunk_ronomon(
            _ptr(buf), _ptr(row_offsets), nrows,
            cfg.min_size, cfg.avg_size, cfg.max_size,
            cfg.mask_s, cfg.mask_l, _ptr(table),
            _ptr(out_row), _ptr(out_hash), _ptr(out_off), _ptr(out_len),
        )
    k = int(k)
    return out_row[:k].copy(), out_hash[:k].copy(), out_off[:k].copy(), out_len[:k].copy()


def minhash_sigs_native(shingles: np.ndarray, seg_starts: np.ndarray,
                        keys: np.ndarray) -> np.ndarray | None:
    """(G, P) uint64 signature matrix, or None when the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    sh = np.ascontiguousarray(shingles, dtype=np.uint64)
    ss = np.ascontiguousarray(seg_starts, dtype=np.int64)
    ks = np.ascontiguousarray(keys, dtype=np.uint64)
    G, P = len(ss), len(ks)
    out = np.empty((G, P), dtype=np.uint64)
    lib.minhash_sigs(_ptr(sh), len(sh), _ptr(ss), G, _ptr(ks), P, _ptr(out))
    return out
