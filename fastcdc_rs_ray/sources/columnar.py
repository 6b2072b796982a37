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

from .staging import staged
from .textio import _lang_rollup


def _dump_shards(documents_ds, out_dir: str, fmt: str,
                 fingerprint: str = "static") -> None:
    def dump(tmp: str) -> None:
        def write_shard(t: pa.Table) -> pa.Table:
            if len(t):
                shard = int(np.min(t["doc_id"].combine_chunks().to_numpy(
                    zero_copy_only=False)))
                path = os.path.join(tmp, f"part-{shard:012d}.{fmt}")
                if fmt == "arrow":
                    with pa.OSFile(path, "wb") as f, pa.ipc.new_file(
                            f, t.schema) as w:
                        w.write_table(t)
                else:
                    from pyarrow import orc

                    orc.write_table(t, path)
            return pa.table({"n": pa.array([len(t)], pa.int64())})

        documents_ds.map_batches(
            write_shard, batch_format="pyarrow").materialize()

    staged(out_dir, dump, fingerprint)


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


def ingest_arrow_ipc_rollup(documents_ds, out_dir: str,
                            fingerprint: str = "static"):
    """documents -> per-block Arrow-IPC shards -> read_binary_files +
    zero-copy IPC decode -> (lang, n_docs, sum_chars).  Proves the
    Arrow-interchange source path end-to-end against the parquet oracle."""
    import ray.data as rd

    _dump_shards(documents_ds, out_dir, "arrow", fingerprint)
    ds = rd.read_binary_files(out_dir, file_extensions=["arrow"])
    return _lang_rollup(ds.map_batches(
        _decode_batch("arrow"), batch_format="pyarrow"))


def ingest_orc_rollup(documents_ds, out_dir: str,
                      fingerprint: str = "static"):
    """documents -> per-block ORC shards -> read_binary_files + pyarrow
    ORC decode -> (lang, n_docs, sum_chars)."""
    import ray.data as rd

    _dump_shards(documents_ds, out_dir, "orc", fingerprint)
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


# --------------------------------------------------------------------------
# Mixed-schema parquet generations (schema evolution)
# --------------------------------------------------------------------------

MIXED_UNION_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("n_chars", pa.int64()),
])


def _dump_mixed_generations(documents_ds, out_dir: str,
                            fingerprint: str = "static") -> None:
    """Two parquet shard generations with DIFFERENT schemas, as a crawl
    re-dump produces them: gen1 (even doc_id) has (doc_id, text, lang);
    gen2 (odd doc_id) dropped ``lang`` and added ``n_chars`` — the
    schema-evolution case a long-lived 100 TB corpus always accumulates."""
    import pyarrow.compute as pc

    def dump(tmp: str) -> None:
        os.makedirs(os.path.join(tmp, "gen1"), exist_ok=True)
        os.makedirs(os.path.join(tmp, "gen2"), exist_ok=True)

        def write_shard(t: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            if len(t):
                did = t["doc_id"].combine_chunks()
                even = pc.equal(pc.bit_wise_and(did, 1), 0)
                g1 = t.filter(even).select(["doc_id", "text", "lang"])
                g2t = t.filter(pc.invert(even))
                g2 = pa.table({
                    "doc_id": g2t["doc_id"],
                    "text": g2t["text"],
                    "n_chars": pc.cast(pc.utf8_length(
                        g2t["text"].combine_chunks()), pa.int64()),
                })
                shard = int(np.min(did.to_numpy(zero_copy_only=False)))
                if len(g1):
                    pq.write_table(g1, os.path.join(
                        tmp, "gen1", f"part-{shard:012d}.parquet"))
                if len(g2):
                    pq.write_table(g2, os.path.join(
                        tmp, "gen2", f"part-{shard:012d}.parquet"))
            return pa.table({"n": pa.array([len(t)], pa.int64())})

        documents_ds.map_batches(
            write_shard, batch_format="pyarrow").materialize()

    staged(out_dir, dump, fingerprint)


def ingest_mixed_schema_rollup(documents_ds, out_dir: str,
                               fingerprint: str = "static"):
    """Heterogeneous-shard ingestion (schema evolution): read each
    generation with its OWN schema, align every block to the union schema
    inside ``map_batches`` (missing columns become typed nulls — never a
    Python-side row fixup), union the datasets, and roll up per effective
    lang (``coalesce(lang, 'unknown')``).  The union is Ray-native
    (``Dataset.union`` just concatenates block lists — zero data
    movement); alignment cost is one null-column append per block."""
    import ray.data as rd

    _dump_mixed_generations(documents_ds, out_dir, fingerprint)

    def align(t: pa.Table) -> pa.Table:
        cols = []
        for f in MIXED_UNION_SCHEMA:
            if f.name in t.column_names:
                cols.append(t[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(len(t), f.type))
        return pa.table(dict(zip(MIXED_UNION_SCHEMA.names, cols)))

    g1 = rd.read_parquet(os.path.join(out_dir, "gen1")).map_batches(
        align, batch_format="pyarrow")
    g2 = rd.read_parquet(os.path.join(out_dir, "gen2")).map_batches(
        align, batch_format="pyarrow")
    unioned = g1.union(g2)

    def rollup(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lang = pc.fill_null(t["lang"].combine_chunks(), "unknown")
        n_chars = pc.utf8_length(t["text"].combine_chunks())
        enc = lang.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nc = pc.cast(n_chars, pa.int64()).to_numpy(zero_copy_only=False)
        k = len(enc.dictionary)
        cnt = np.bincount(codes, minlength=k).astype(np.int64)
        sums = np.zeros(k, np.int64)
        np.add.at(sums, codes, nc)
        return pa.table({
            "lang": enc.dictionary,
            "n_docs": pa.array(cnt, pa.int64()),
            "sum_chars": pa.array(sums, pa.int64()),
        })

    partials = unioned.map_batches(rollup, batch_format="pyarrow")
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    lang = t["lang"].to_pylist()
    nd = t["n_docs"].to_numpy(zero_copy_only=False)
    sc = t["sum_chars"].to_numpy(zero_copy_only=False)
    acc: dict[str, list[int]] = {}
    for lg, a, b in zip(lang, nd.tolist(), sc.tolist()):
        cur = acc.setdefault(lg, [0, 0])
        cur[0] += a
        cur[1] += b
    langs = sorted(acc)
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_docs": pa.array([acc[x][0] for x in langs], pa.int64()),
        "sum_chars": pa.array([acc[x][1] for x in langs], pa.int64()),
    })


INGEST_MIXED_SCHEMA_SQL = """
SELECT CASE WHEN doc_id % 2 = 0 THEN lang ELSE 'unknown' END AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
"""
