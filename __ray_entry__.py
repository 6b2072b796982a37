"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in fastcdc_rs_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents-derived
    transcripts -> assemble -> FastCDC chunks -> MinHash -> LSH ->
    connected components -> (conv_id, cluster_id)."""
    from fastcdc_rs_ray.pipelines.queries import q_neardup_clusters

    return q_neardup_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 + the
    training-data dedup/similarity/text tiers)."""
    from fastcdc_rs_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; the CDC
    kernel, MinHash/LSH/clustering and heuristic scoring ops are rows-only
    (content-defined chunk boundaries and signature bits are not
    SQL-expressible)."""
    from fastcdc_rs_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
