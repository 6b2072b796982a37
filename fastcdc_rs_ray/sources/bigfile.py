"""Parallel CDC of ONE huge file — range scan + seam stitching.

The reference chunks a file strictly sequentially (examples/stream2020.rs);
fine for megabytes, hopeless for a terabyte object on a 256-node cluster.
This module parallelizes a single file EXACTLY, exploiting CDC
self-synchronization: a cut decision depends only on the bytes since the
previous cut (never more than ``max_size`` lookahead), so two chunkings of
the same byte stream that ever agree on one cut position agree on every
cut after it.

Algorithm
---------
1. **Scan** (distributed): split the file into R ranges of ``range_bytes``.
   Task i streams ``[s_i, s_i + range_bytes + overlap)`` through
   :class:`~..cdc.stream.StreamChunker` as if a cut had just happened at
   ``s_i``.  Every emitted candidate had full ``max_size`` lookahead, so
   range i's candidate sequence is a pure function of ``s_i``.  The last
   range (and any range whose scan window reaches EOF) finalizes, applying
   the true runt semantics.  Candidate chunk metadata is ~32 bytes per
   ``avg_size`` of input (≈0.05%) and is materialized once.
2. **Stitch** (driver, tiny data): for each seam i the first cut END shared
   by range i-1's candidates and range i's candidates inside the window
   ``(s_i, s_i + overlap]`` is the sync point ``q_i``.  Range 0 is
   authoritative from 0; inductively range i is authoritative from ``q_i``.
3. **Filter** (distributed): range i keeps candidates with
   ``start ∈ [q_i, q_{i+1})`` — no second read of the file.

If a seam never syncs inside the overlap (pathological low-entropy content,
e.g. a constant byte with ranges misaligned to the forced-cut period), the
driver **bridges**: starting from range i-1's last authoritative cut it
chunks sequentially until a cut coincides with any downstream range's
candidate set (or EOF).  Worst case degrades to the sequential result —
never a wrong one.  ``bridges`` in the return value reports which seams
needed it.

Scale notes: 100 TB / 1 GiB ranges = 100k scan tasks, each holding one read
window + a < max_size carry; driver-side stitch state is only the seam
windows (R × overlap/avg_size cut ends).  Output keeps ``offset`` as the
stable global order/resume key.  Assumes the file is reachable from every
node (shared storage), the same assumption ``read_binary_files`` makes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..cdc import ChunkerConfig
from ..cdc.stream import StreamChunker


def _stream_file_chunks(path: str, cfg: ChunkerConfig, impl: str,
                        start: int, scan_end: int, final: bool,
                        read_size: int):
    """Yield candidate Chunk lists for [start, scan_end), offsets relative
    to ``start``; finalizes iff ``final``."""
    sc = StreamChunker(cfg, impl)
    with open(path, "rb") as f:
        f.seek(start)
        remaining = scan_end - start
        while remaining > 0:
            piece = f.read(min(read_size, remaining))
            if not piece:
                break
            remaining -= len(piece)
            got = sc.update(piece)
            if got:
                yield got
    if final:
        got = sc.finalize()
        if got:
            yield got


def _scan_dataset(path: str, size: int, cfg: ChunkerConfig, impl: str,
                  range_bytes: int, overlap: int, read_size: int,
                  emit_rows: int):
    """Distributed candidate scan -> Dataset(range_id, hash, offset, length)."""
    import ray.data as rd

    ranges = [
        {
            "range_id": i,
            "start": s,
            "scan_end": min(s + range_bytes + overlap, size),
            "final": s + range_bytes + overlap >= size,
        }
        for i, s in enumerate(range(0, max(size, 1), range_bytes))
    ]

    def scan(t: pa.Table):
        for row in t.to_pylist():
            base = row["start"]

            def flush(chunks):
                return pa.table(
                    {
                        "range_id": pa.array(
                            [row["range_id"]] * len(chunks), pa.int32()
                        ),
                        "hash": pa.array([c.hash for c in chunks], pa.uint64()),
                        "offset": pa.array(
                            [base + c.offset for c in chunks], pa.int64()
                        ),
                        "length": pa.array(
                            [c.length for c in chunks], pa.int64()
                        ),
                    }
                )

            pend: list = []
            for got in _stream_file_chunks(
                path, cfg, impl, base, row["scan_end"], row["final"], read_size
            ):
                pend.extend(got)
                if len(pend) >= emit_rows:
                    yield flush(pend)
                    pend = []
            if pend:
                yield flush(pend)

    ds = rd.from_items(ranges, override_num_blocks=len(ranges))
    return ds.map_batches(scan, batch_format="pyarrow", batch_size=None)


def _collect_ends(cand, predicate) -> dict[int, np.ndarray]:
    """Driver-side {range_id: sorted cut ENDS} for rows passing
    ``predicate(range_id, end) -> bool mask`` (vectorized per batch)."""
    def pick(t: pa.Table) -> pa.Table:
        rid = t["range_id"].to_numpy().astype(np.int64)
        end = t["offset"].to_numpy() + t["length"].to_numpy()
        keep = predicate(rid, end)
        return pa.table(
            {"range_id": pa.array(rid[keep], pa.int32()),
             "end": pa.array(end[keep], pa.int64())}
        )

    df = cand.map_batches(pick, batch_format="pyarrow").to_pandas()
    out: dict[int, np.ndarray] = {}
    for r, grp in df.groupby("range_id"):
        out[int(r)] = np.sort(grp["end"].to_numpy())
    return out


def chunk_file_parallel(path: str, cfg: ChunkerConfig | None = None,
                        impl: str = "auto", range_bytes: int = 64 << 20,
                        overlap: int | None = None, read_size: int = 4 << 20,
                        emit_rows: int = 1 << 16):
    """Exact CDC of one file, parallel across ranges.

    Returns ``(Dataset(path, hash, offset, length), bridges)``; ``bridges``
    lists seam indices that needed the sequential fallback (empty on normal
    content).  Bit-identical to sequential whole-file chunking.
    """
    cfg = cfg or ChunkerConfig()
    if overlap is None:
        overlap = 32 * cfg.max_size
    if range_bytes < 4 * cfg.max_size:
        raise ValueError("range_bytes must be >= 4 * max_size")
    if overlap < 4 * cfg.max_size:
        raise ValueError("overlap must be >= 4 * max_size")
    # Performance floor (output stays exact either way): a non-final
    # range's StreamChunker only cuts once 8*max_size is buffered and never
    # flushes its tail, so candidate ends stop up to 8*max_size before
    # scan_end; with overlap below ~16*max_size seams may find no common
    # candidate and degrade to the sequential driver bridge.
    if overlap < 16 * cfg.max_size:
        import warnings

        warnings.warn(
            "chunk_file_parallel: overlap < 16*max_size may force seams "
            "onto the sequential bridge (candidate emission stops up to "
            "8*max_size before scan_end)", stacklevel=2)
    # Upper bound: a seam's sync point q lies in (s_i, s_i + overlap]; with
    # overlap > range_bytes it could land beyond the NEXT range start, and
    # seam i+1 could then pick q' < q — the region [q', q) would be covered
    # by two conflicting chunk sequences.
    if overlap > range_bytes:
        raise ValueError("overlap must be <= range_bytes (a sync point may "
                         "not cross the next range start)")

    size = os.path.getsize(path)
    cand = _scan_dataset(
        path, size, cfg, impl, range_bytes, overlap, read_size, emit_rows
    ).materialize()
    n_ranges = max(1, -(-size // range_bytes))

    # --- stitch (driver; seam windows only) ---
    def in_seam(rid, end):
        s = rid * range_bytes
        head = (end > s) & (end <= s + overlap)
        tail = (end > s + range_bytes) & (end <= s + range_bytes + overlap)
        return head | tail

    seam_ends = _collect_ends(cand, in_seam) if n_ranges > 1 else {}

    _ends_cache: dict[int, np.ndarray] = {}

    def full_ends(i: int) -> np.ndarray:  # bridge fallback only
        # memoized: a bridge crossing many ranges re-queries each range once,
        # not once per crossing (each query is a full pass over `cand`)
        if i not in _ends_cache:
            _ends_cache[i] = _collect_ends(
                cand, lambda rid, end: rid == i
            ).get(i, np.empty(0, np.int64))
        return _ends_cache[i]

    # lo[i]/hi[i]: keep range i candidates with start in [lo, hi).
    lo = np.zeros(n_ranges, np.int64)
    hi = np.full(n_ranges, size, np.int64)
    bridges: list[int] = []
    bridge_rows: list[tuple[int, int, int]] = []  # (hash, offset, length)

    i = 1
    while i < n_ranges:
        s_i = i * range_bytes
        prev = seam_ends.get(i - 1, np.empty(0, np.int64))
        tail = prev[(prev > s_i) & (prev <= s_i + overlap)]
        head = seam_ends.get(i, np.empty(0, np.int64))
        head = head[(head > s_i) & (head <= s_i + overlap)]
        common = np.intersect1d(tail, head)
        if len(common):
            q = int(common.min())
            hi[i - 1] = q
            lo[i] = q
            i += 1
            continue

        # --- bridge fallback ---
        bridges.append(i)
        prev_all = full_ends(i - 1)
        p = int(prev_all.max()) if len(prev_all) else int(lo[i - 1])
        hi[i - 1] = p  # all of range i-1's candidates end <= p: keep them
        j = i
        target = full_ends(j)
        synced_end = None
        for got in _stream_file_chunks(
            path, cfg, impl, p, size, final=True, read_size=read_size
        ):
            for c in got:
                end = p + c.offset + c.length
                while j < n_ranges - 1 and end > (j + 1) * range_bytes:
                    j += 1
                    target = full_ends(j)
                bridge_rows.append((c.hash, p + c.offset, c.length))
                k = np.searchsorted(target, end)
                if end < size and k < len(target) and target[k] == end:
                    # the chunk ENDING at the sync point closes the bridge
                    # and is itself authoritative (already appended)
                    synced_end = end
                    break
            if synced_end is not None:
                break
        if synced_end is None:
            # bridged to EOF: the bridge emitted everything remaining
            for k in range(i, n_ranges):
                lo[k] = hi[k] = 0
            i = n_ranges
        else:
            for k in range(i, j):
                lo[k] = hi[k] = 0
            lo[j] = synced_end
            i = j + 1

    # --- final filter (distributed) ---
    def final_filter(t: pa.Table) -> pa.Table:
        r = t["range_id"].to_numpy().astype(np.int64)
        start = t["offset"].to_numpy()
        keep = (start >= lo[r]) & (start < hi[r])
        out = t.filter(pa.array(keep)).drop_columns(["range_id"])
        return out.add_column(
            0, "path", pa.array([path] * len(out), pa.string())
        )

    result = cand.map_batches(final_filter, batch_format="pyarrow")

    if bridge_rows:
        import ray.data as rd

        h, off, ln = zip(*bridge_rows)
        result = result.union(
            rd.from_arrow(
                pa.table(
                    {
                        "path": pa.array([path] * len(h), pa.string()),
                        "hash": pa.array(h, pa.uint64()),
                        "offset": pa.array(off, pa.int64()),
                        "length": pa.array(ln, pa.int64()),
                    }
                )
            )
        )
    return result, bridges
