"""Public API module: imports resolve, chunk_table runs end-to-end and
matches the registered chunks query (fastcdc_rs_ray/api.py)."""

from __future__ import annotations


def test_api_surface_and_chunk_table(ray_session):
    from fastcdc_rs_ray import api

    for name in api.__all__:
        assert hasattr(api, name), name

    from fastcdc_rs_ray.sources.transcripts import transcripts_from_documents

    ts = transcripts_from_documents("/root/testdata/sf0.001")
    out = api.chunk_table(ts).to_pandas()
    assert len(out) > 0
    assert {"conv_id", "hash", "offset", "length"} <= set(out.columns)

    # one in-memory buffer through the reference-shaped entry point
    chunks = api.chunk_bytes(b"x" * 100_000, api.ChunkerConfig())
    assert sum(c.length for c in chunks) == 100_000
