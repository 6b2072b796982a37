"""entity_counts: RE2 pattern parity between the engine and DuckDB."""

import duckdb
import pyarrow as pa

from fastcdc_rs_ray.stages.entities import (
    ENTITY_COUNTS_SQL,
    entity_counts,
    entity_counts_batch,
)

TEXTS = [
    "mail a@b.co or x.y+z@sub.domain.org see https://a.b/c?d=1 and http://z",
    "totals 12 3.5 0.001 date 2023-11-14 and 1999-01-0",
    "",
    "no entities here",
    "3.14.15 weird 10..2 ISO 2020-02-29 2021-13-99",  # regex, not calendar
]


def _docs():
    return pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })


def test_batch_matches_duckdb():
    eng = entity_counts_batch(_docs()).to_pandas()
    con = duckdb.connect()
    con.register("documents", _docs())
    ref = con.execute(ENTITY_COUNTS_SQL).fetch_df()
    assert eng.equals(ref)


def test_dataset_path(ray_session):
    import ray.data as rd

    out = entity_counts(rd.from_arrow(_docs())).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "n_emails"] == 2 and out.loc[0, "n_urls"] == 2
    assert out.loc[1, "n_dates"] == 1
    assert out.loc[4, "n_dates"] == 2  # pattern-shaped, not calendar-valid
