"""Arrow-IPC / ORC ingest: per-block columnar shard sink +
read_binary_files + pyarrow decode, rollup checked against the parquet
original via DuckDB."""

from __future__ import annotations

import duckdb
import pandas as pd

from fastcdc_rs_ray.sources.columnar import (
    INGEST_COLUMNAR_SQL,
    ingest_arrow_ipc_rollup,
    ingest_orc_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def _oracle() -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return (con.execute(INGEST_COLUMNAR_SQL).fetchdf()
            .sort_values("lang").reset_index(drop=True))


def _docs():
    import ray.data as rd

    return rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text", "lang"])


def test_ingest_arrow_ipc_matches_parquet_oracle(ray_session, tmp_path):
    got = (ingest_arrow_ipc_rollup(_docs(), str(tmp_path / "ipc"))
           .to_pandas().sort_values("lang").reset_index(drop=True))
    want = _oracle()
    pd.testing.assert_frame_equal(got[want.columns], want)
    shards = sorted((tmp_path / "ipc").glob("*.arrow"))
    assert shards, "no arrow shards written"
    # IPC file format starts with the ARROW1 magic
    assert shards[0].read_bytes()[:6] == b"ARROW1"


def test_ingest_orc_matches_parquet_oracle(ray_session, tmp_path):
    got = (ingest_orc_rollup(_docs(), str(tmp_path / "orc"))
           .to_pandas().sort_values("lang").reset_index(drop=True))
    want = _oracle()
    pd.testing.assert_frame_equal(got[want.columns], want)
    shards = sorted((tmp_path / "orc").glob("*.orc"))
    assert shards, "no orc shards written"
    assert shards[0].read_bytes()[:3] == b"ORC"


def test_ingest_mixed_schema_matches_oracle(ray_session, tmp_path):
    from fastcdc_rs_ray.sources.columnar import (
        INGEST_MIXED_SCHEMA_SQL,
        ingest_mixed_schema_rollup,
    )

    got = (ingest_mixed_schema_rollup(_docs(), str(tmp_path / "mix"))
           .to_pandas().sort_values("lang").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = (con.execute(INGEST_MIXED_SCHEMA_SQL).fetchdf()
            .sort_values("lang").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the two generations genuinely have different schemas on disk
    import pyarrow.parquet as pq

    g1 = sorted((tmp_path / "mix" / "gen1").glob("*.parquet"))
    g2 = sorted((tmp_path / "mix" / "gen2").glob("*.parquet"))
    assert g1 and g2
    assert "lang" in pq.read_schema(str(g1[0])).names
    assert "lang" not in pq.read_schema(str(g2[0])).names
    assert "n_chars" in pq.read_schema(str(g2[0])).names
