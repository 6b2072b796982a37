"""Compressed JSONL ingest: distributed gzip shard sink + read_json over
.json.gz files, rollup checked against the parquet original via DuckDB."""

from __future__ import annotations

import duckdb
import pandas as pd

from fastcdc_rs_ray.sources.textio import INGEST_JSONL_SQL, ingest_jsonl_gz_rollup

SF_DIR = "/root/testdata/sf0.001"


def test_ingest_jsonl_gz_matches_parquet_oracle(ray_session, tmp_path):
    import ray.data as rd

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    got = (
        ingest_jsonl_gz_rollup(docs, str(tmp_path / "gz"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = (
        con.execute(INGEST_JSONL_SQL).fetchdf()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # shards actually compressed + deterministic layout (one per block)
    shards = sorted((tmp_path / "gz").glob("*.json.gz"))
    assert shards, "no gzip shards written"
    assert shards[0].read_bytes()[:2] == b"\x1f\x8b"
