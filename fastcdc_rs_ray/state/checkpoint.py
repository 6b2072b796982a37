"""Per-partition checkpointed stage execution (resumable lineage + metrics).

Layout per stage::

    <root>/<stage>/part=<pid>/*.parquet     one directory per hash partition
    <root>/<stage>/_manifest.jsonl          one record per completed partition
    <root>/<stage>/_SUCCESS                 stage fully complete

Manifest records carry ``{partition_id, rows, bytes, wall_s}`` — the
"per-partition checkpointed lineage and metrics" the north rule demands.
On resume, completed partitions are skipped: the stage transform runs only
over the key-hash buckets whose ids are missing from the manifest, and the
finished output is read back with ``read_parquet``.

Buckets are processed in groups (``group_size`` buckets per pipeline pass):
one pass filters the input to the group's buckets, applies the transform,
and writes each bucket's rows to its own directory atomically (tmp dir +
rename).  A killed run loses at most one group of work.  At 10^12-turn
scale the bucket column would be precomputed at ingest so the filter
becomes a parquet predicate pushdown instead of a scan.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

import numpy as np
import pyarrow as pa


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_manifest.jsonl")


def completed_partitions(stage_dir: str) -> dict[int, dict]:
    out: dict[int, dict] = {}
    try:
        with open(_manifest_path(stage_dir)) as f:
            for line in f:
                rec = json.loads(line)
                out[int(rec["partition_id"])] = rec
    except FileNotFoundError:
        pass
    return out


def record_partition(stage_dir: str, rec: dict) -> None:
    os.makedirs(stage_dir, exist_ok=True)
    with open(_manifest_path(stage_dir), "a") as f:
        f.write(json.dumps(rec) + "\n")


def stage_is_complete(stage_dir: str) -> bool:
    return os.path.exists(os.path.join(stage_dir, "_SUCCESS"))


def mark_complete(stage_dir: str) -> None:
    with open(os.path.join(stage_dir, "_SUCCESS"), "w") as f:
        f.write(str(time.time()))


def run_stage_checkpointed(
    ds,
    stage_name: str,
    root: str,
    key: str,
    fn: Callable,
    num_partitions: int = 16,
    group_size: int = 8,
):
    """Run a ``Dataset -> Dataset`` transform with per-partition
    checkpointing keyed by ``hash(key) % num_partitions``.

    Requirements: the transform's output rows must still carry ``key``
    (true for every stage of this engine — conv_id flows end to end), and
    the transform must be deterministic per bucket (all kernels are).
    """
    import ray.data as rd

    from ..util import hash_str_array_u64

    stage_dir = os.path.join(root, stage_name)
    if stage_is_complete(stage_dir):
        return _read_stage(stage_dir)

    done = completed_partitions(stage_dir)
    # a resume MUST use the crashed run's bucketing scheme: mixing
    # h%8 part dirs with h%16 ones would silently duplicate/drop rows
    for rec in done.values():
        if rec.get("key", key) != key or rec.get(
                "num_partitions", num_partitions) != num_partitions:
            raise ValueError(
                f"resume config mismatch for stage {stage_name!r}: manifest "
                f"has key={rec.get('key')!r} num_partitions="
                f"{rec.get('num_partitions')}, caller passed key={key!r} "
                f"num_partitions={num_partitions}")
    missing = [p for p in range(num_partitions) if p not in done]

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hash_str_array_u64(t[key].combine_chunks())
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(num_partitions)).astype(np.int32))
        )

    def keep_buckets(buckets: list[int]):
        want = pa.array(np.asarray(buckets, dtype=np.int32))

        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.is_in(t["_bucket"], value_set=want))

        return f

    os.makedirs(stage_dir, exist_ok=True)
    for g0 in range(0, len(missing), group_size):
        group = missing[g0 : g0 + group_size]
        t0 = time.perf_counter()
        sub = (
            ds.map_batches(add_bucket, batch_format="pyarrow")
            .map_batches(keep_buckets(group), batch_format="pyarrow")
            .drop_columns(["_bucket"])
        )
        out = fn(sub).map_batches(add_bucket, batch_format="pyarrow").materialize()
        wall_group = time.perf_counter() - t0
        for p in group:
            part = out.map_batches(
                keep_buckets([p]), batch_format="pyarrow"
            ).drop_columns(["_bucket"])
            part_dir = os.path.join(stage_dir, f"part={p}")
            tmp_dir = part_dir + ".tmp"
            if os.path.exists(tmp_dir):
                shutil.rmtree(tmp_dir)
            part = part.materialize()
            part.write_parquet(tmp_dir)
            # an EMPTY bucket writes no files and creates no directory —
            # materialize the empty dir so the atomic rename (and the
            # manifest record) still happen and resume doesn't recompute
            # and crash on the same bucket forever
            os.makedirs(tmp_dir, exist_ok=True)
            if os.path.exists(part_dir):
                shutil.rmtree(part_dir)
            os.replace(tmp_dir, part_dir)
            nbytes = sum(
                os.path.getsize(os.path.join(part_dir, f)) for f in os.listdir(part_dir)
            )
            record_partition(
                stage_dir,
                {
                    "partition_id": p,
                    "rows": part.count(),
                    "bytes": nbytes,
                    "wall_s": round(wall_group / len(group), 3),
                    "key": key,
                    "num_partitions": num_partitions,
                },
            )
    mark_complete(stage_dir)
    return _read_stage(stage_dir)


def _read_stage(stage_dir: str):
    """Read a completed stage back WITHOUT hive partition inference: the
    part=<pid> directory names would otherwise materialize as an extra
    string column 'part' the stage transform never produced (polluting
    every downstream schema).  Empty part dirs contribute nothing."""
    import ray.data as rd

    files = []
    for d in sorted(os.listdir(stage_dir)):
        if d.startswith("part="):
            sub = os.path.join(stage_dir, d)
            files += [os.path.join(sub, f) for f in sorted(os.listdir(sub))]
    if not files:
        raise ValueError(f"stage {stage_dir!r} completed with zero rows in "
                         f"every partition — nothing to read back")
    return rd.read_parquet(files)
