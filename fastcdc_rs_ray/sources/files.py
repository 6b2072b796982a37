"""Binary-file source: chunk raw files straight from storage.

The reference's primary real-world entry point is a FILE (mmap slice source,
``examples/v2020.rs:29-32`` — SURVEY.md §2.1 S5); this maps it to
``ray.data.read_binary_files(include_paths=True)`` feeding the same
stateless ChunkStage kernel the transcript pipeline uses.  Chunk output is
invariant to how the bytes arrived (the reference's stream-vs-slice parity
contract, src/v2020/mod.rs:1277-1329), so file-sourced and table-sourced
chunking share one kernel and one test oracle.

At 100 TB this is the shape that matters: files stream from storage as
blocks (no directory listing bottleneck — Ray parallelizes the read), each
task chunks its files zero-copy from the Arrow buffer, and output is
partitioned by input file for resumability.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..cdc import ChunkerConfig
from ..stages.chunk import ChunkStage


def chunk_files(paths, cfg: ChunkerConfig | None = None, impl: str = "auto",
                parallelism: int = -1):
    """Files (path or list/dir) -> chunks Dataset
    (path, chunk_idx, hash, offset, length)."""
    import ray.data as rd

    ds = rd.read_binary_files(
        paths, include_paths=True, override_num_blocks=None if parallelism < 0 else parallelism
    )
    stage = ChunkStage(cfg, impl)

    def per_batch(t: pa.Table) -> pa.Table:
        out = stage(pa.table({"conv_id": t["path"], "payload": t["bytes"]}))
        return out.rename_columns(
            ["path", "chunk_idx", "hash", "offset", "length"]
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def chunk_files_streamed(paths, cfg: ChunkerConfig | None = None,
                         impl: str = "auto", read_size: int = 4 << 20,
                         emit_rows: int = 1 << 16, num_tasks: int | None = None):
    """Bounded-memory file chunking for files too large to hold as one Arrow
    row (the reference's StreamCDC entry point, examples/stream2020.rs —
    SURVEY §2.1 S2/S3).  ``read_binary_files`` materializes a whole file per
    row; this path instead streams each file through
    :class:`~..cdc.stream.StreamChunker` in ``read_size`` windows — one task
    per file, Ray parallelizes across files, memory per task stays at one
    window + a < max_size carry regardless of file size.  Output batches are
    yielded every ``emit_rows`` chunks so a terabyte file never accumulates
    its chunk list in task heap either.

    Bit-identical to :func:`chunk_files` on the same bytes (the stream-vs-
    slice parity contract, src/v2020/mod.rs:1277-1329).
    """
    import ray.data as rd

    from ..cdc.stream import StreamChunker

    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _, names in os.walk(p):
                files.extend(os.path.join(root, n) for n in sorted(names))
        else:
            files.append(os.fspath(p))
    # One file per task up to a cap: a handful of huge files each get their
    # own task; a million tiny files batch several per task instead of
    # paying a million schedulings.
    if num_tasks is None:
        num_tasks = min(len(files), 256)
    ds = rd.from_items(
        [{"path": p} for p in files], override_num_blocks=max(1, num_tasks)
    )
    # same default as chunk_files' ChunkStage — the two entry points MUST
    # agree on cfg=None or the documented bit-parity silently breaks
    from ..stages.chunk import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG

    def chunk_one_file(t: pa.Table):
        for path in t["path"].to_pylist():
            pend: list[tuple[int, int, int]] = []
            emitted = 0

            def flush(pend_chunks, start_idx):
                n = len(pend_chunks)
                h, off, ln = zip(*pend_chunks)
                return pa.table(
                    {
                        "path": pa.array([path] * n, pa.string()),
                        "chunk_idx": pa.array(
                            range(start_idx, start_idx + n), pa.int32()
                        ),
                        "hash": pa.array(h, pa.uint64()),
                        "offset": pa.array(off, pa.int64()),
                        "length": pa.array(ln, pa.int64()),
                    }
                )

            sc = StreamChunker(cfg, impl)
            with open(path, "rb") as f:
                while True:
                    piece = f.read(read_size)
                    pend.extend(sc.update(piece) if piece else sc.finalize())
                    if len(pend) >= emit_rows or (not piece and pend):
                        yield flush(pend, emitted)
                        emitted += len(pend)
                        pend = []
                    if not piece:
                        break

    return ds.map_batches(chunk_one_file, batch_format="pyarrow", batch_size=None)


def stage_documents_as_files(sf_dir: str, out_root: str = "/tmp/graft_file_src"):
    """Write each documents row as one ``<doc_id>.txt`` file (idempotent:
    skipped when the directory already has the right file count) so the
    file-source path can be exercised against table-derived inputs."""
    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(out_root, tag)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # marker lives BESIDE the directory (inside it the chunkers would walk
    # and chunk it); marker check, not file count: an interrupted run
    # leaves a truncated final file a count check would accept forever
    done_marker = out_dir + ".STAGED"
    if os.path.isfile(done_marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    for doc_id, text in zip(ids, texts):
        # explicit UTF-8 bytes: locale-default encoding would crash on
        # non-ASCII under a C locale, and any non-UTF-8 default would break
        # the file-vs-table parity these bytes exist to exercise
        with open(os.path.join(out_dir, f"{doc_id:08d}.txt"), "wb") as f:
            f.write(text.encode("utf-8"))
    with open(done_marker, "w") as f:
        f.write(str(len(t)))
    return out_dir


def stage_documents_as_one_file(sf_dir: str,
                                out_root: str = "/tmp/graft_file_src"):
    """Concatenate all documents (doc_id order) into ONE file — the
    huge-object shape :func:`~..sources.bigfile.chunk_file_parallel`
    exists for.  Idempotent via size check."""
    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_path = os.path.join(out_root, f"{tag}_concat.bin")
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    order = pc.sort_indices(t["doc_id"].combine_chunks())
    texts = t["text"].combine_chunks().take(order)
    total = int(pc.sum(pc.binary_length(texts)).as_py() or 0)
    if os.path.isfile(out_path) and os.path.getsize(out_path) == total:
        return out_path
    os.makedirs(out_root, exist_ok=True)
    with open(out_path, "wb") as f:
        for s in texts:
            f.write(s.as_py().encode())
    return out_path


def chunks_from_document_files(sf_dir: str, cfg: ChunkerConfig | None = None,
                               streamed: bool = False):
    """documents staged as files -> chunks keyed by doc_id (the file-source
    twin of the table-sourced ``chunks`` query; same kernel, same config).
    ``streamed=True`` takes the bounded-memory StreamChunker path instead of
    whole-file ``read_binary_files`` — same bits out either way."""
    out_dir = stage_documents_as_files(sf_dir)
    if streamed:
        chunks = chunk_files_streamed(out_dir, cfg, read_size=256 << 10)
    else:
        chunks = chunk_files(out_dir, cfg)

    def attach_doc_id(t: pa.Table) -> pa.Table:
        # filename stem parsed back to int64.  [0-9]+ (not {8}): doc_ids
        # >= 10^8 produce 9+ digit names and a fixed-width pattern would
        # silently truncate to the trailing 8 digits (wrong join key).
        stem = pc.extract_regex(
            t["path"].combine_chunks(), r"(?P<id>[0-9]+)\.txt$")
        doc_id = pc.cast(stem.field("id"), pa.int64())
        return pa.table(
            {
                "doc_id": doc_id,
                "chunk_idx": t["chunk_idx"],
                "hash": t["hash"],
                "offset": t["offset"],
                "length": t["length"],
            }
        )

    return chunks.map_batches(attach_doc_id, batch_format="pyarrow")
