"""File-source chunking (read_binary_files -> ChunkStage) must be
bit-identical to chunking the same bytes straight out of a table column —
the reference's stream-vs-slice parity contract (src/v2020/mod.rs:1277-1329)
applied across source types."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from fastcdc_rs_ray.cdc import ChunkerConfig
from fastcdc_rs_ray.sources.files import chunk_files
from fastcdc_rs_ray.stages.chunk import chunk

CFG = ChunkerConfig(64, 256, 1024)


def _write_corpus(tmp_path):
    import numpy as np

    rng = np.random.default_rng(42)
    paths, payloads = [], {}
    for i in range(6):
        size = int(rng.integers(10, 5000))
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        p = os.path.join(tmp_path, f"f{i}.bin")
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)
        payloads[p] = data
    return paths, payloads


def test_file_source_matches_table_source(ray_session, tmp_path):
    import ray.data as rd

    paths, payloads = _write_corpus(str(tmp_path))

    from_files = (
        chunk_files(paths, CFG)
        .to_pandas()
        .sort_values(["path", "chunk_idx"])
        .reset_index(drop=True)
    )

    tbl = pa.table(
        {
            "conv_id": pa.array(paths, pa.string()),
            "payload": pa.array([payloads[p] for p in paths], pa.large_binary()),
        }
    )
    from_table = (
        chunk(rd.from_arrow(tbl).repartition(3), CFG)
        .to_pandas()
        .sort_values(["conv_id", "chunk_idx"])
        .reset_index(drop=True)
    )

    assert len(from_files) == len(from_table) > 0
    for col in ("chunk_idx", "hash", "offset", "length"):
        assert from_files[col].tolist() == from_table[col].tolist(), col
    assert from_files["path"].tolist() == from_table["conv_id"].tolist()
    # coverage: per file, chunk lengths sum to the file size
    sums = from_files.groupby("path")["length"].sum()
    for p in paths:
        assert sums[p] == len(payloads[p])


def test_staged_documents_roundtrip(ray_session):
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata missing")
    from fastcdc_rs_ray.sources.files import chunks_from_document_files

    import duckdb

    out = chunks_from_document_files(sf_dir, CFG).to_pandas()
    # every doc with text appears; per-doc covered bytes == strlen(text)
    exp = duckdb.sql(
        f"SELECT doc_id, strlen(text) AS n FROM '{sf_dir}/documents.parquet'"
    ).df()
    got = out.groupby("doc_id")["length"].sum()
    exp = exp.set_index("doc_id")["n"]
    assert len(got) == len(exp)
    assert (got.sort_index() == exp.sort_index()).all()
