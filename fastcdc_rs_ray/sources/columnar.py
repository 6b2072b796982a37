"""Arrow-IPC (feather) and ORC ingestion sources — the columnar-format
half of §2.1 beyond parquet.

The reference's only sources are byte buffers and files
(src/v2020/mod.rs:516, examples/v2020.rs:29); a training-data engine also
receives columnar interchange files (Arrow IPC from an upstream service,
ORC from a Hive-era warehouse).  Ray Data 2.49 has no native
``read_orc`` / ``read_ipc``, so these paths document the CUSTOM-SOURCE
idiom: a deterministic per-block shard dump (one ``.arrow`` / ``.orc``
file per input block, named by the block's min doc_id — unique, so
retries overwrite identically), then ``read_binary_files`` + a per-FILE
vectorized decode inside ``map_batches`` — one file per read task, so a
100 TB dump parallelizes across shards exactly like the gzip-JSONL path
(sources/textio.py), and the decode is pyarrow-native, never per-row.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pyarrow as pa

from .textio import _lang_rollup


def _dump_shards(documents_ds, out_dir: str, fmt: str) -> None:
    done = out_dir.rstrip("/") + ".done"
    if os.path.exists(done):
        return
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        if len(t):
            shard = int(np.min(t["doc_id"].combine_chunks().to_numpy(
                zero_copy_only=False)))
            path = os.path.join(out_dir, f"part-{shard:012d}.{fmt}")
            if fmt == "arrow":
                with pa.OSFile(path, "wb") as f, pa.ipc.new_file(
                        f, t.schema) as w:
                    w.write_table(t)
            else:
                from pyarrow import orc

                orc.write_table(t, path)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    documents_ds.map_batches(write_shard, batch_format="pyarrow").materialize()
    with open(done, "w") as f:
        f.write("ok")


def _decode_batch(fmt: str):
    """One decoded table per binary-file row; ``read_binary_files`` gives
    (bytes, path) rows, one file per block by construction."""

    def decode(t: pa.Table) -> pa.Table:
        tabs = []
        for buf in t["bytes"].to_pylist():
            if fmt == "arrow":
                tabs.append(pa.ipc.open_file(pa.BufferReader(buf)).read_all())
            else:
                from pyarrow import orc

                tabs.append(orc.ORCFile(io.BytesIO(buf)).read())
        if not tabs:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "text": pa.array([], pa.string())})
        return pa.concat_tables(tabs).select(["doc_id", "lang", "text"])

    return decode


def ingest_arrow_ipc_rollup(documents_ds, out_dir: str):
    """documents -> per-block Arrow-IPC shards -> read_binary_files +
    zero-copy IPC decode -> (lang, n_docs, sum_chars).  Proves the
    Arrow-interchange source path end-to-end against the parquet oracle."""
    import ray.data as rd

    _dump_shards(documents_ds, out_dir, "arrow")
    ds = rd.read_binary_files(out_dir, file_extensions=["arrow"])
    return _lang_rollup(ds.map_batches(
        _decode_batch("arrow"), batch_format="pyarrow"))


def ingest_orc_rollup(documents_ds, out_dir: str):
    """documents -> per-block ORC shards -> read_binary_files + pyarrow
    ORC decode -> (lang, n_docs, sum_chars)."""
    import ray.data as rd

    _dump_shards(documents_ds, out_dir, "orc")
    ds = rd.read_binary_files(out_dir, file_extensions=["orc"])
    return _lang_rollup(ds.map_batches(
        _decode_batch("orc"), batch_format="pyarrow"))


# both roll up to the same (lang, n_docs, sum_chars) contract as the
# JSONL paths — the oracle is the parquet original
INGEST_COLUMNAR_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""
