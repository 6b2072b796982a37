"""Winnowing prefilter: detection guarantee + fingerprint properties.

The winnowing theorem (Schleimer et al. 2003) promises that any two
documents sharing a substring of length >= L = k + w - 1 share at least
one selected fingerprint.  These tests verify the guarantee holds exactly
(candidates are a superset of the brute-force substring-sharing pairs) on
the real small-SF corpus and on crafted corpora, plus determinism and
density properties.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa
import pytest

from fastcdc_rs_ray.stages.winnow import (
    K_DEFAULT,
    _distinct_pairs_block,
    _emit_group_pairs,
    fingerprint_rows,
    winnow_candidates,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs_table(ids, texts):
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def brute_sharing_pairs(ids, texts, L):
    byg = defaultdict(set)
    for d, s in zip(ids, texts):
        for i in range(len(s) - L + 1):
            byg[s[i : i + L]].add(d)
    want = set()
    for ds in byg.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                want.add((ds[i], ds[j]))
    return want


def local_candidates(t, L, k):
    fps = fingerprint_rows(t, L, k)
    pairs = _distinct_pairs_block(_emit_group_pairs(fps, 10**9))
    return set(zip(pairs["src"].to_pylist(), pairs["dst"].to_pylist()))


@pytest.mark.parametrize("k", [8, 20, 28])
def test_guarantee_superset_on_small_sf(k):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    L = 30
    want = brute_sharing_pairs(t["doc_id"].to_pylist(), t["text"].to_pylist(), L)
    got = local_candidates(t, L, k)
    assert want, "corpus should contain substring-sharing pairs"
    assert want <= got


def test_guarantee_on_crafted_shift_and_context():
    # identical 32-char region embedded at different offsets amid unrelated
    # context — the content-defined selection must still collide
    region = "The quick brown fox jumps over!!"  # 32 chars
    L, k = len(region), 20
    t = _docs_table(
        [1, 2, 3],
        ["x" * 7 + region + "qqqq", "zzzzzzzzzzzzzzz" + region, "no match here at all " * 3],
    )
    got = local_candidates(t, L, k)
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_fingerprint_density_near_theory():
    rng = np.random.default_rng(11)
    texts = ["".join(chr(c) for c in rng.integers(33, 127, size=4000)) for _ in range(8)]
    L, k = 30, K_DEFAULT
    w = L - k + 1
    t = _docs_table(list(range(8)), texts)
    fps = fingerprint_rows(t, L, k)
    grams = sum(len(s) - k + 1 for s in texts)
    density = fps.num_rows / grams
    # expected 2/(w+1) on random input; generous band
    assert 0.5 * 2 / (w + 1) < density < 2.5 * 2 / (w + 1)


def test_short_docs_skipped_and_deterministic():
    t = _docs_table([1, 2], ["tiny", "x" * 19])  # both shorter than L=30
    fps = fingerprint_rows(t, 30, 20)
    assert fps.num_rows == 0
    import pyarrow.parquet as pq

    big = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    a, b = fingerprint_rows(big, 30, 20), fingerprint_rows(big, 30, 20)
    assert a.equals(b)


def brute_dup_positions(ids, texts, L):
    from collections import Counter

    c = Counter()
    for s in texts:
        for i in range(len(s) - L + 1):
            c[s[i : i + L]] += 1
    dup = set()
    for d, s in zip(ids, texts):
        for i in range(len(s) - L + 1):
            if c[s[i : i + L]] > 1:
                dup.add((d, i))
    return dup


@pytest.mark.parametrize(
    "texts",
    [
        # periodic: overlapping within-doc copies (period < L)
        ["ab" * 40, "completely unrelated filler text here ok"],
        # run of one char: maximal overlap
        ["x" * 45 + "tail distinct part 123", "y" * 60],
        # two non-overlapping within-doc copies + a cross-doc copy
        [
            "SAME-PREFIX-0123456789abcdefghij" + "-" * 9 + "SAME-PREFIX-0123456789abcdefghij",
            "zz" + "SAME-PREFIX-0123456789abcdefghij" + "qq",
            "no dup content in this one at all, promise",
        ],
    ],
)
def test_prefiltered_rows_equal_exact_on_tricky_corpora(ray_session, texts):
    """Winnow + per-pair extension reproduces the exact duplicated-position
    relation even with overlapping/periodic within-doc repeats."""
    import ray.data as rd

    from fastcdc_rs_ray.stages.winnow import prefiltered_dup_rows

    L = 30
    ids = list(range(1, len(texts) + 1))
    want = brute_dup_positions(ids, texts, L)
    ds = rd.from_arrow(_docs_table(ids, texts))
    rows = prefiltered_dup_rows(ds, L, K_DEFAULT, num_partitions=4).take_all()
    got = set((r["doc_id"], r["pos"]) for r in rows)
    assert got == want


def test_winnowed_equals_exact_tier_small_sf(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.substring import substring_dups
    from fastcdc_rs_ray.stages.winnow import substring_dups_winnowed

    sf = f"{SF_DIR}/documents.parquet"
    a = sorted(
        (r["doc_id"], r["dup_grams"], r["dup_chars"])
        for r in substring_dups(
            rd.read_parquet(sf, columns=["doc_id", "text"]), 30, 8
        ).take_all()
    )
    b = sorted(
        (r["doc_id"], r["dup_grams"], r["dup_chars"])
        for r in substring_dups_winnowed(
            rd.read_parquet(sf, columns=["doc_id", "text"]), 30
        ).take_all()
    )
    assert a == b and len(a) > 0


def test_spans_winnowed_equals_exact_tier(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.substring import substring_spans
    from fastcdc_rs_ray.stages.winnow import substring_spans_winnowed

    sf = f"{SF_DIR}/documents.parquet"
    a = sorted(
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in substring_spans(
            rd.read_parquet(sf, columns=["doc_id", "text"]), 30, 8
        ).take_all()
    )
    b = sorted(
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in substring_spans_winnowed(
            rd.read_parquet(sf, columns=["doc_id", "text"]), 30
        ).take_all()
    )
    assert a == b and len(a) > 0


def test_max_group_cap_drops_hot_groups_gracefully(ray_session):
    """Capping is a recall knob, not a crash: max_group=1 yields no pairs."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    rows = winnow_candidates(ds, 30, K_DEFAULT, num_partitions=4,
                             max_group=1).take_all()
    assert rows == []


def test_pipeline_candidates_match_local(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    L, k = 30, K_DEFAULT
    want_local = local_candidates(t, L, k)
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    rows = winnow_candidates(ds, L, k, num_partitions=8, max_group=10**9).take_all()
    got = set((r["src"], r["dst"]) for r in rows)
    assert got == want_local
    # and the guarantee end-to-end
    want = brute_sharing_pairs(t["doc_id"].to_pylist(), t["text"].to_pylist(), L)
    assert want <= got
