"""Composed curation pass (quality -> language -> exact dedup) vs DuckDB,
plus a planted-duplicate check that first-wins dedup actually fires."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa

from fastcdc_rs_ray.stages.curate import CURATE_DOCS_SQL, curate_docs

SF_DIR = "/root/testdata/sf0.001"


def _oracle(sql: str, docs_path: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{docs_path}'")
    return con.execute(sql).fetchdf()


def test_curate_docs_matches_duckdb(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    got = (
        curate_docs(ds, num_partitions=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(CURATE_DOCS_SQL, f"{SF_DIR}/documents.parquet")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_curate_docs_dedups_planted_copies(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    base = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    # plant exact copies of every doc under higher ids: survivors must be
    # exactly the original curated set (min doc_id wins)
    copies = pa.table({
        "doc_id": pa.array(
            (base["doc_id"].to_numpy(zero_copy_only=False) + 10_000_000),
            pa.int64()),
        "text": base["text"],
    })
    path = tmp_path / "docs.parquet"
    pq.write_table(pa.concat_tables([base, copies]), path)

    got = (
        curate_docs(rd.read_parquet(str(path)), num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(CURATE_DOCS_SQL, f"{SF_DIR}/documents.parquet")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # identical to the copy-free result: every planted copy deduped away
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert (got["doc_id"] < 10_000_000).all()
