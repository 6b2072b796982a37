"""levenshtein_batch: exact equality with DuckDB's levenshtein() on edge
cases and random ASCII pairs (the vectorized multi-pair DP)."""

from __future__ import annotations

import duckdb
import numpy as np

from fastcdc_rs_ray.stages.editdist import levenshtein_batch


def test_levenshtein_matches_duckdb():
    rng = np.random.default_rng(43)
    cases = [(b"kitten", b"sitting"), (b"", b"abc"), (b"abc", b""),
             (b"same", b"same"), (b"a", b"b"), (b"", b"")]
    for _ in range(40):
        la, lb = rng.integers(0, 60, 2)
        a = bytes(rng.integers(97, 102, la).astype(np.uint8))  # a-e: dense
        b = bytes(rng.integers(97, 102, lb).astype(np.uint8))
        cases.append((a, b))
    got = levenshtein_batch([a for a, _ in cases], [b for _, b in cases])
    con = duckdb.connect()
    ref = [con.execute("SELECT levenshtein(?, ?)",
                       [a.decode(), b.decode()]).fetchone()[0]
           for a, b in cases]
    assert list(got) == ref
