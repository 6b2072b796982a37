"""Suffix-array-substring dedup tier: exact duplicated-substring detection.

Ground truth: brute-force dict-of-grams over the real small-SF documents
table plus hand-built corpora (within-doc repeats, cross-doc repeats,
sub-L docs, no-dup corpora).  The Ray pipeline (rolling-hash gram rows ->
gram_key exchange -> dup mark -> doc_id exchange -> spans/counts) must
reproduce the brute-force relation exactly.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pytest

from fastcdc_rs_ray.stages.substring import (
    L_DEFAULT,
    _doc_counts_block,
    _doc_spans_block,
    _mark_dup_block,
    gram_rows,
    substring_dups,
    substring_spans,
)

SF_DIR = "/root/testdata/sf0.001"


def brute_dup_positions(ids, texts, L):
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


def brute_counts(dup, L):
    grams = Counter()
    cov = defaultdict(set)
    for d, i in dup:
        grams[d] += 1
        cov[d].update(range(i, i + L))
    return {d: (grams[d], len(cov[d])) for d in grams}


def brute_spans(dup, L):
    per = defaultdict(list)
    for d, i in dup:
        per[d].append(i)
    out = set()
    for d, ps in per.items():
        ps.sort()
        s = e = ps[0]
        for p in ps[1:]:
            if p - e <= L:
                e = p
            else:
                out.add((d, s + 1, e + L - s))
                s = e = p
        out.add((d, s + 1, e + L - s))
    return out


def _docs_table(ids, texts):
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def test_gram_rows_hashes_match_direct():
    """The prefix-product rolling hash equals a direct per-gram evaluation."""
    rng = np.random.default_rng(7)
    texts = [
        "".join(chr(c) for c in rng.integers(97, 123, size=n)) for n in (0, 3, 9, 40, 41)
    ]
    L = 9
    t = _docs_table(list(range(len(texts))), texts)
    g = gram_rows(t, L)
    # direct: same polynomial, computed per gram with python ints
    B = 0x9E3779B97F4A7C15
    from fastcdc_rs_ray.util import mix64_scalar

    expect = []
    for d, s in zip(range(len(texts)), texts):
        bs = s.encode()
        for i in range(len(bs) - L + 1):
            h = 0
            for j, b in enumerate(bs[i : i + L]):
                h = (h + b * pow(B, j, 1 << 64)) & ((1 << 64) - 1)
            expect.append((d, i, mix64_scalar(h)))
    got = list(
        zip(g["doc_id"].to_pylist(), g["pos"].to_pylist(), g["gram_key"].to_pylist())
    )
    assert got == expect


def test_single_block_matches_brute_force_small_sf():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    L = L_DEFAULT
    dup = _mark_dup_block(gram_rows(t, L))
    got = set(zip(dup["doc_id"].to_pylist(), dup["pos"].to_pylist()))
    want = brute_dup_positions(t["doc_id"].to_pylist(), t["text"].to_pylist(), L)
    assert got == want
    assert len(want) > 0  # corpus actually contains duplicated templates

    cnts = _doc_counts_block(dup, L)
    want_cnt = brute_counts(want, L)
    got_cnt = {
        r["doc_id"]: (r["dup_grams"], r["dup_chars"]) for r in cnts.to_pylist()
    }
    assert got_cnt == want_cnt

    spans = _doc_spans_block(dup, L)
    got_spans = set(
        (r["doc_id"], r["span_start"], r["span_len"]) for r in spans.to_pylist()
    )
    assert got_spans == brute_spans(want, L)


def test_within_doc_repeat_counts_as_duplicate():
    # the same L-gram twice in ONE document is a duplicate (total
    # occurrences >= 2, not distinct docs) — Lee et al. semantics
    L = 8
    s = "abcdefgh--------abcdefgh"
    dup = _mark_dup_block(gram_rows(_docs_table([1], [s]), L))
    got = set(zip(dup["doc_id"].to_pylist(), dup["pos"].to_pylist()))
    assert got == {(1, 0), (1, 16)}


def test_sub_L_docs_and_no_dups_empty():
    L = 16
    t = _docs_table([1, 2, 3], ["short", "", "also short but unique here"])
    dup = _mark_dup_block(gram_rows(t, L))
    assert dup.num_rows == 0
    assert _doc_spans_block(dup, L).num_rows == 0
    assert _doc_counts_block(dup, L).num_rows == 0


def test_adjacent_and_overlapping_spans_merge():
    L = 4
    # doc 3 contains two copies of "wxyz" separated by exactly L unmatched
    # chars -> two spans; doc 4's copies overlap -> one span
    t = _docs_table(
        [1, 2, 3, 4],
        ["wxyz", "stuvwxyz", "wxyzABCDwxyz", "stuvwxystuvwxy"],
    )
    dup = _mark_dup_block(gram_rows(t, L))
    got = set(zip(dup["doc_id"].to_pylist(), dup["pos"].to_pylist()))
    want = brute_dup_positions([1, 2, 3, 4], t["text"].to_pylist(), L)
    assert got == want
    spans = _doc_spans_block(dup, L)
    got_spans = set(
        (r["doc_id"], r["span_start"], r["span_len"]) for r in spans.to_pylist()
    )
    assert got_spans == brute_spans(want, L)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abcd", min_size=0, max_size=60),
            min_size=1,
            max_size=12,
        ),
        st.integers(min_value=2, max_value=8),
    )
    def test_property_dup_marking_matches_brute_force(texts, L):
        """Random low-alphabet corpora (dense accidental repeats) — the
        rolling-hash mark must equal the brute-force gram-count relation,
        including heavy within- and cross-doc overlap."""
        ids = list(range(len(texts)))
        t = _docs_table(ids, texts)
        dup = _mark_dup_block(gram_rows(t, L))
        got = set(zip(dup["doc_id"].to_pylist(), dup["pos"].to_pylist()))
        assert got == brute_dup_positions(ids, texts, L)

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abc", min_size=0, max_size=50),
            min_size=1,
            max_size=8,
        )
    )
    def test_property_spans_and_counts_consistent(texts):
        L = 5
        ids = list(range(len(texts)))
        dup = _mark_dup_block(gram_rows(_docs_table(ids, texts), L))
        want = brute_dup_positions(ids, texts, L)
        cnts = _doc_counts_block(dup, L)
        got_cnt = {
            r["doc_id"]: (r["dup_grams"], r["dup_chars"]) for r in cnts.to_pylist()
        }
        assert got_cnt == brute_counts(want, L)
        spans = _doc_spans_block(dup, L)
        got_spans = set(
            (r["doc_id"], r["span_start"], r["span_len"]) for r in spans.to_pylist()
        )
        assert got_spans == (brute_spans(want, L) if want else set())
        # spans and counts agree: per-doc sum of span lengths == dup_chars
        agg: dict[int, int] = {}
        for d, _s, ln in got_spans:
            agg[d] = agg.get(d, 0) + ln
        assert agg == {d: c for d, (_g, c) in got_cnt.items()}


def test_byte_budget_slicing_is_transparent(monkeypatch):
    import fastcdc_rs_ray.stages.substring as ss

    rng = np.random.default_rng(3)
    texts = [
        "".join(chr(c) for c in rng.integers(97, 105, size=n))
        for n in rng.integers(0, 90, size=40)
    ]
    t = _docs_table(list(range(40)), texts)
    whole = gram_rows(t, 7)
    monkeypatch.setattr(ss, "_BYTE_BUDGET", 64)
    assert ss.gram_rows(t, 7).equals(whole)


def test_wide_row_segmentation_is_transparent(monkeypatch):
    """A single document far larger than the byte budget is segmented with
    window-1 overlap; gram and fingerprint output must equal the unsegmented
    run (positions re-based, cross-segment duplicates deduped)."""
    import fastcdc_rs_ray.stages.substring as ss
    import fastcdc_rs_ray.stages.winnow as wn

    rng = np.random.default_rng(5)
    big = "".join(chr(c) for c in rng.integers(97, 123, size=3000))
    big = big[:500] + big[100:160] + big[500:]  # plant a within-doc repeat
    t = _docs_table([7, 8], [big, big[200:290]])
    L = 30
    whole_g = gram_rows(t, L)
    whole_f = wn.fingerprint_rows(t, L, 20)
    monkeypatch.setattr(ss, "_BYTE_BUDGET", 256)
    seg_t, off = ss.segment_wide_rows(t, L, 256)
    assert len(seg_t) > len(t) and off.max() > 0  # actually segmented
    got_g = ss.gram_rows(t, L)
    # order may differ across segment boundaries: compare as sets
    def key(tb):
        return sorted(
            zip(
                tb["gram_key"].to_pylist() if "gram_key" in tb.column_names else tb["fp_key"].to_pylist(),
                tb["doc_id"].to_pylist(),
                tb["pos"].to_pylist(),
            )
        )

    assert key(got_g) == key(whole_g)
    got_f = wn.fingerprint_rows(t, L, 20)
    assert key(got_f) == key(whole_f)


def brute_clean(ids, texts, L, dup):
    covered = defaultdict(set)
    for d, i in dup:
        covered[d].update(range(i, i + L))
    out = {}
    for d, s in zip(ids, texts):
        cov = covered.get(d, set())
        out[d] = "".join(ch for p, ch in enumerate(s) if p not in cov)
    return out


def test_substring_clean_matches_brute_force(ray_session):
    """The cut action: covered positions removed, unchanged docs passed
    through; exercised end-to-end through the tag-union exchange."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from fastcdc_rs_ray.stages.substring import substring_clean

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ids, texts = t["doc_id"].to_pylist(), t["text"].to_pylist()
    L = L_DEFAULT
    want = brute_clean(ids, texts, L, brute_dup_positions(ids, texts, L))
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    got = {r["doc_id"]: r["clean_text"] for r in substring_clean(ds, L, 8).take_all()}
    assert got == want
    assert any(got[d] != s for d, s in zip(ids, texts))  # something was cut
    assert any(got[d] == s for d, s in zip(ids, texts))  # something passed through


def test_pipeline_matches_brute_force(ray_session):
    """End-to-end Dataset path (both keyed exchanges) == brute force on the
    real sf0.001 table, batch boundaries exercised via small batch_size."""
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    L = L_DEFAULT
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])

    want = brute_dup_positions(t["doc_id"].to_pylist(), t["text"].to_pylist(), L)

    cnt_rows = substring_dups(ds, L, num_partitions=8).take_all()
    got_cnt = {r["doc_id"]: (r["dup_grams"], r["dup_chars"]) for r in cnt_rows}
    assert got_cnt == brute_counts(want, L)

    span_rows = substring_spans(ds, L, num_partitions=8).take_all()
    got_spans = set((r["doc_id"], r["span_start"], r["span_len"]) for r in span_rows)
    assert got_spans == brute_spans(want, L)
