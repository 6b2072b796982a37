"""JSONL / CSV ingestion sources — the text-format half of §2.1.

The reference's only sources are byte buffers and files
(src/v2020/mod.rs:516, examples/v2020.rs:29); a training-data engine also
ingests JSONL crawl dumps and CSV exports.  These helpers materialize a
deterministic text-format copy of a parquet table under /tmp ONCE (keyed
by destination dir), then expose it through Ray Data's native distributed
readers (`read_json` / `read_csv`) — so the oracle can check the whole
ingest -> rollup path against the parquet original: the round-trip is
lossless for int64/strings and for 2-decimal floats.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .staging import staged


def _ensure_dump(src_ds, out_dir: str, fmt: str, fingerprint: str = "static"):
    """Stage a JSONL/CSV dump of ``src_ds`` under ``out_dir`` once,
    crash-safe (see staging.staged: Ray's ``write_json``/``write_csv``
    name shards by session, so a partial dump re-run would otherwise
    ADD files and double every downstream count)."""
    def dump(tmp: str) -> None:
        if fmt == "json":
            src_ds.write_json(tmp)
        else:
            src_ds.write_csv(tmp)

    staged(out_dir, dump, fingerprint)


def ingest_jsonl_rollup(documents_ds, out_dir: str,
                        fingerprint: str = "static"):
    """documents -> JSONL dump -> read_json -> (lang, n_docs, sum_chars).
    Proves the JSONL source path end-to-end against the parquet oracle."""
    import ray.data as rd

    _ensure_dump(documents_ds, out_dir, "json", fingerprint)
    ds = rd.read_json(out_dir, file_extensions=["json", "jsonl"])
    return _lang_rollup(ds)


INGEST_JSONL_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""


def ingest_csv_rollup(events_ds, out_dir: str, fingerprint: str = "static"):
    """events (numeric projection) -> CSV dump -> read_csv ->
    (user_id, n_events, sum_value_c).  2-decimal values survive the text
    round-trip exactly."""
    import ray.data as rd

    _ensure_dump(events_ds, out_dir, "csv", fingerprint)
    ds = rd.read_csv(out_dir)

    def rollup(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "sum_value_c": pa.array([], pa.int64())})
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        vc = np.round(t["value"].combine_chunks().to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        uu, inv = np.unique(uid, return_inverse=True)
        return pa.table({
            "user_id": pa.array(uu, pa.int64()),
            "n_events": pa.array(np.bincount(
                inv, minlength=len(uu)).astype(np.int64), pa.int64()),
            "sum_value_c": pa.array(np.bincount(
                inv, weights=vc, minlength=len(uu)).astype(np.int64),
                pa.int64()),
        })

    parts = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.map_batches(rollup, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    uid = parts["user_id"].to_numpy(zero_copy_only=False)
    uu, inv = np.unique(uid, return_inverse=True)
    n = np.zeros(len(uu), np.int64)
    s = np.zeros(len(uu), np.int64)
    np.add.at(n, inv, parts["n_events"].to_numpy(zero_copy_only=False))
    np.add.at(s, inv, parts["sum_value_c"].to_numpy(zero_copy_only=False))
    return pa.table({
        "user_id": pa.array(uu, pa.int64()),
        "n_events": pa.array(n, pa.int64()),
        "sum_value_c": pa.array(s, pa.int64()),
    })


INGEST_CSV_SQL = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events GROUP BY user_id
"""


def ingest_jsonl_gz_rollup(documents_ds, out_dir: str,
                           fingerprint: str = "static"):
    """documents -> gzip JSONL dump -> distributed ``read_json`` over the
    compressed files -> (lang, n_docs, sum_chars).

    The compressed twin of :func:`ingest_jsonl_rollup` — crawl dumps ship
    as ``.json.gz`` in practice.  The dump itself is DISTRIBUTED: each
    block gzips and writes its own shard (named by the block's min doc_id
    — deterministic and collision-free since doc_id is unique), the
    compressed-sink side of the path; the read side exercises Ray's
    ``read_json`` with a gzip ``open_input_stream`` — one shard per read
    task, the standard splittability caveat of gzip (a 100 TB dump is
    parallel across files, never within one)."""
    import gzip
    import json as _json

    import ray.data as rd

    def dump(tmp: str) -> None:
        def write_shard(t: pa.Table) -> pa.Table:
            if len(t):
                shard = int(
                    np.min(t["doc_id"].combine_chunks().to_numpy(
                        zero_copy_only=False)))
                path = os.path.join(tmp, f"part-{shard:012d}.json.gz")
                # mtime=0 → byte-deterministic archive for a given block
                with open(path, "wb") as raw, gzip.GzipFile(
                        fileobj=raw, mode="wb", mtime=0) as gz:
                    for row in t.to_pylist():
                        gz.write((_json.dumps(row, sort_keys=True) + "\n")
                                 .encode())
            return pa.table({"n": pa.array([len(t)], pa.int64())})

        documents_ds.map_batches(
            write_shard, batch_format="pyarrow").materialize()

    staged(out_dir, dump, fingerprint)

    ds = rd.read_json(out_dir, file_extensions=["gz"],
                      arrow_open_stream_args={"compression": "gzip"})
    return _lang_rollup(ds)


def _lang_rollup(ds):
    """(lang, text) Dataset -> (lang, n_docs, sum_chars) — shared finalize
    of the JSONL ingest paths."""
    import pyarrow.compute as pc

    def rollup(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "sum_chars": pa.array([], pa.int64())})
        lenc = t["lang"].combine_chunks().dictionary_encode()
        codes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nch = pc.utf8_length(t["text"].combine_chunks()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        k = len(lenc.dictionary)
        return pa.table({
            "lang": lenc.dictionary,
            "n_docs": pa.array(np.bincount(codes, minlength=k).astype(
                np.int64), pa.int64()),
            "sum_chars": pa.array(np.bincount(
                codes, weights=nch, minlength=k).astype(np.int64), pa.int64()),
        })

    parts = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.map_batches(rollup, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    lenc = parts["lang"].combine_chunks().dictionary_encode()
    codes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = len(lenc.dictionary)
    n = np.zeros(k, np.int64)
    s = np.zeros(k, np.int64)
    np.add.at(n, codes, parts["n_docs"].to_numpy(zero_copy_only=False))
    np.add.at(s, codes, parts["sum_chars"].to_numpy(zero_copy_only=False))
    return pa.table({
        "lang": lenc.dictionary,
        "n_docs": pa.array(n, pa.int64()),
        "sum_chars": pa.array(s, pa.int64()),
    })


QUARANTINE_MOD = 53  # doc_id % 53 == 0 -> line deterministically corrupted


def ingest_quarantine_rollup(documents_ds, out_dir: str,
                             fingerprint: str = "static"):
    """Malformed-record quarantine ingest: a JSONL dump where every
    ``doc_id % 53 == 0`` line is deterministically truncated mid-record
    (what a 100 TB crawl dump actually contains — interrupted writers,
    bitrot) is read back WITHOUT failing the job: valid lines parse
    vectorized, broken lines are counted into a quarantine side-channel
    instead of poisoning the batch.

    Read side is the CUSTOM-SOURCE idiom (one shard per read task via
    ``read_binary_files``): per file, a vectorized line split + structural
    prefilter (must start '{' and end '}' — truncation always breaks one)
    routes lines; survivors parse through pyarrow's C++ JSON reader in one
    call — no per-row Python in either lane.

    Output: (lang, n_docs, sum_chars) over the parsed rows, plus one
    ``lang='__quarantined__'`` row carrying the rejected-line count
    (sum_chars 0 — the payload is by definition unreadable).  SQL twin
    filters ``doc_id % 53 != 0`` and unions the quarantine count, so the
    whole routing decision is oracle-checked.
    """
    import json as _json

    import pyarrow.json as pj
    import ray.data as rd

    def dump(tmp: str) -> None:
        def write_shard(t: pa.Table) -> pa.Table:
            if len(t):
                did = t["doc_id"].combine_chunks().to_numpy(
                    zero_copy_only=False)
                shard = int(np.min(did))
                path = os.path.join(tmp, f"part-{shard:012d}.jsonl")
                with open(path, "wb") as f:
                    for row in t.select(
                            ["doc_id", "lang", "text"]).to_pylist():
                        line = _json.dumps(row, sort_keys=True)
                        if row["doc_id"] % QUARANTINE_MOD == 0:
                            # truncate mid-record; '~' guard keeps the tail
                            # from coincidentally ending '}' (text bytes can)
                            line = line[: max(2, len(line) // 2)] + "~"
                        f.write((line + "\n").encode())
            return pa.table({"n": pa.array([len(t)], pa.int64())})

        documents_ds.map_batches(
            write_shard, batch_format="pyarrow").materialize()

    staged(out_dir, dump, fingerprint)

    files = rd.read_binary_files(out_dir, file_extensions=["jsonl"])

    part_schema = pa.schema(
        [("lang", pa.string()), ("n_docs", pa.int64()),
         ("sum_chars", pa.int64())]
    )

    def parse_shard(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = [part_schema.empty_table()]
        n_bad = 0
        for buf in t["bytes"].to_pylist():
            lines = pc.split_pattern(
                pa.array([buf.decode("utf-8")]), "\n"
            ).values
            lines = lines.filter(pc.greater(pc.utf8_length(lines), 0))
            ok = pc.and_(pc.starts_with(lines, "{"), pc.ends_with(lines, "}"))
            good = lines.filter(ok)
            n_bad += len(lines) - len(good)
            if len(good):
                blob = "\n".join(good.to_pylist()).encode()
                parsed = pj.read_json(pa.BufferReader(blob))
                lenc = parsed["lang"].combine_chunks().dictionary_encode()
                codes = lenc.indices.to_numpy(
                    zero_copy_only=False).astype(np.int64)
                nch = pc.utf8_length(
                    parsed["text"].combine_chunks()
                ).to_numpy(zero_copy_only=False).astype(np.int64)
                k = len(lenc.dictionary)
                out.append(pa.table({
                    "lang": lenc.dictionary,
                    "n_docs": pa.array(
                        np.bincount(codes, minlength=k).astype(np.int64),
                        pa.int64()),
                    "sum_chars": pa.array(
                        np.bincount(codes, weights=nch,
                                    minlength=k).astype(np.int64),
                        pa.int64()),
                }).cast(part_schema))
        if n_bad:
            out.append(pa.table({
                "lang": pa.array(["__quarantined__"], pa.string()),
                "n_docs": pa.array([n_bad], pa.int64()),
                "sum_chars": pa.array([0], pa.int64()),
            }))
        return pa.concat_tables(out)

    parts = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in files.map_batches(parse_shard, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    if len(parts) == 0:
        return part_schema.empty_table()
    lenc = parts["lang"].combine_chunks().dictionary_encode()
    codes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = len(lenc.dictionary)
    nd = np.zeros(k, dtype=np.int64)
    sc = np.zeros(k, dtype=np.int64)
    np.add.at(nd, codes, parts["n_docs"].combine_chunks().to_numpy(
        zero_copy_only=False))
    np.add.at(sc, codes, parts["sum_chars"].combine_chunks().to_numpy(
        zero_copy_only=False))
    return pa.table({
        "lang": lenc.dictionary,
        "n_docs": pa.array(nd, pa.int64()),
        "sum_chars": pa.array(sc, pa.int64()),
    }).cast(part_schema)


INGEST_QUARANTINE_SQL = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % {QUARANTINE_MOD} != 0 GROUP BY lang
UNION ALL
SELECT '__quarantined__', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
FROM documents WHERE doc_id % {QUARANTINE_MOD} = 0
"""


def ingest_text_rollup(documents_ds, out_dir: str,
                       fingerprint: str = "static"):
    """documents -> plain-text line dump -> ``read_text`` -> per-lang
    rollup: the line-oriented reader surface (Ray Data ``read_text``,
    one read task per shard) next to read_json/read_csv.

    Dump format: one ``doc_id\\tlang\\ttext`` line per document, one .txt
    shard per block (named by the block's min doc_id — deterministic,
    resumable, parallel on re-read).  The driver corpora contain no tabs
    or newlines inside ``text`` (asserted at dump time: a violation
    RAISES rather than corrupting the round-trip); a general corpus
    would escape them first.  Parsing back is vectorized
    ``split_pattern(max_splits=2)`` — no per-row Python."""
    import ray.data as rd
    import pyarrow.compute as pc

    def dump(tmp: str) -> None:
        def write_shard(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({"n": pa.array([], pa.int64())})
            bad = pc.sum(pc.count_substring_regex(
                t["text"], "[\t\n\r]")).as_py()
            if bad:
                raise ValueError(
                    "ingest_text: text contains tab/newline; escape first")
            ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            lang = t["lang"].combine_chunks().to_pylist()
            text = t["text"].combine_chunks().to_pylist()
            name = os.path.join(tmp, f"{int(ids.min()):012d}.txt")
            with open(name, "wb") as f:
                for i, la, tx in zip(ids.tolist(), lang, text):
                    f.write(f"{i}\t{la}\t{tx}\n".encode())
            return pa.table({"n": pa.array([len(t)], pa.int64())})

        documents_ds.map_batches(
            write_shard, batch_format="pyarrow").materialize()

    staged(out_dir, dump, fingerprint)

    ds = rd.read_text(out_dir, file_extensions=["txt"])

    def parse(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], "\t", max_splits=2)
        return pa.table({
            "lang": pc.list_element(parts, 1),
            "text": pc.list_element(parts, 2),
        })

    return _lang_rollup(ds.map_batches(parse, batch_format="pyarrow"))
