"""Tests for the dedup / similarity-search / text-analysis tiers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fastcdc_rs_ray.functions.text import (
    fingerprint_batch,
    lang_id_batch,
    quality_batch,
    token_count_batch,
    token_membership_count,
    tokenize_hashes,
)
from fastcdc_rs_ray.stages.dedup import simhash_batch, _shingles_per_row


def _docs(texts: list[str]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


# --------------------------------------------------------------------------
# pure-batch function tests (no Ray needed)
# --------------------------------------------------------------------------


def test_token_count_edges():
    t = _docs(["a b  c", "", "   ", "one", "x\ty\nz"])
    out = token_count_batch(t).to_pandas()
    assert out.n_tokens.tolist() == [3, 0, 0, 1, 3]


def test_token_membership_count_consecutive():
    t = _docs(["the the the cat", "no stop words here", ""])
    counts = token_membership_count(t["text"], ["the", "and"])
    assert counts.tolist() == [3, 0, 0]


def test_quality_components():
    t = _docs(["The cat, the dog!", "abc"])
    out = quality_batch(t).to_pandas()
    assert out.n_chars.tolist() == [17, 3]
    assert out.n_words.tolist() == [4, 1]
    assert out.n_punct.tolist() == [2, 0]
    assert out.n_upper.tolist() == [1, 0]
    assert out.n_stopwords.tolist() == [1, 0]  # 'the' once ('The' is cased)


def test_lang_id_profiles():
    t = _docs(
        [
            "the cat and the dog is in the house",
            "der hund und die katze ist nicht hier",
            "el perro y la casa de los gatos",
            "xyzzy plugh",
        ]
    )
    out = lang_id_batch(t).to_pandas()
    assert out.lang_pred.tolist()[:3] == ["en", "de", "es"]
    assert out.lang_pred.tolist()[3] == "und"


def test_fingerprint_locality():
    base = "word salad " * 400
    edited = base[:2000] + "EDIT" + base[2000:]
    t = _docs([base, base, edited, ""])
    out = fingerprint_batch(t).to_pandas()
    assert out.fingerprint[0] == out.fingerprint[1]  # deterministic
    assert out.fingerprint[0] != out.fingerprint[2]  # edit changes it
    assert out.n_chunks[3] == 0


def test_simhash_similarity_property():
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(500)]
    base = [words[i] for i in rng.integers(0, 500, 300)]
    near = list(base)
    near[10] = "changed"
    far = [words[i] for i in rng.integers(0, 500, 300)]
    t = _docs([" ".join(base), " ".join(near), " ".join(far)])
    out = simhash_batch(t).to_pandas()
    d_near = bin(int(out.simhash[0]) ^ int(out.simhash[1])).count("1")
    d_far = bin(int(out.simhash[0]) ^ int(out.simhash[2])).count("1")
    assert d_near < 8 < d_far


def test_shingles_per_row():
    t = _docs(["a b c d", "a b", ""])
    th, off = tokenize_hashes(t)
    flat, soff = _shingles_per_row(th, off, k=3)
    assert np.diff(soff).tolist() == [2, 0, 0]  # 4 tokens -> 2 3-grams


# --------------------------------------------------------------------------
# Ray-level operator tests
# --------------------------------------------------------------------------


def test_exact_dedup_keeps_min_id(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.dedup import exact_dedup

    texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
    ds = rd.from_arrow(_docs(texts)).repartition(3)
    kept = sorted(exact_dedup(ds, num_partitions=4).to_pandas().doc_id)
    assert kept == [0, 1, 3]


def test_simhash_pairs_hamming(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.dedup import simhash_pairs, simhash_signatures

    rng = np.random.default_rng(1)
    words = [f"tok{i}" for i in range(1000)]
    docs = []
    for d in range(30):
        docs.append(" ".join(words[i] for i in rng.integers(0, 1000, 200)))
    docs.append(docs[0])            # exact dup of 0 -> distance 0
    near = docs[1].split()
    near[5] = "zzz"
    docs.append(" ".join(near))     # near dup of 1
    ds = rd.from_arrow(_docs(docs)).repartition(3)
    sigs = simhash_signatures(ds)
    pairs = simhash_pairs(sigs, max_hamming=3, num_partitions=4).to_pandas()
    got = {tuple(r) for r in pairs[["src", "dst"]].itertuples(index=False)}
    assert (0, 30) in got
    assert (1, 31) in got


def test_ngram_jaccard_pairs_vs_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from fastcdc_rs_ray.stages.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(2)
    vocab = [f"v{i}" for i in range(50)]
    texts = []
    for d in range(25):
        texts.append(" ".join(vocab[i] for i in rng.integers(0, 50, 60)))
    texts.append(texts[0])                       # exact dup
    texts.append(texts[1] + " tail extra")       # high-overlap
    tau, k = 0.5, 3

    def shingle_set(s):
        w = s.split()
        return {tuple(w[i : i + k]) for i in range(len(w) - k + 1)}

    sets = [shingle_set(s) for s in texts]
    expect = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= tau:
            expect.add((a, b))
    ds = rd.from_arrow(_docs(texts)).repartition(3)
    pairs = ngram_jaccard_pairs(ds, k=k, tau=tau, num_partitions=4).to_pandas()
    got = {tuple(r) for r in pairs[["src", "dst"]].itertuples(index=False)}
    assert got == expect and (0, 25) in got


def test_ann_bruteforce_exact(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.ann import ann_topk_bruteforce, ann_topk_ivf

    rng = np.random.default_rng(3)
    n, dim, k = 200, 16, 5
    m = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), pa.float32()), dim
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    qids = np.arange(3, dtype=np.int64)
    out = ann_topk_bruteforce(ds, qids, m[:3], k=k).to_pandas()
    # numpy oracle
    mn = m.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    sims = mn[:3] @ mn.T
    for qi in range(3):
        sims[qi, qi] = -np.inf
        expect = np.argsort(-sims[qi], kind="stable")[:k]
        got = out[out.query_id == qi].sort_values("rank").neighbor_id.to_numpy()
        assert got.tolist() == expect.tolist()
    # IVF with full probing must equal brute force
    ds2 = rd.from_arrow(t).repartition(4)
    ivf = ann_topk_ivf(ds2, qids, m[:3], k=k, n_cells=4, n_probe=4).to_pandas()
    assert ivf.sort_values(["query_id", "rank"]).neighbor_id.tolist() == \
        out.sort_values(["query_id", "rank"]).neighbor_id.tolist()


def test_ivf_recall_reasonable(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.ann import ann_topk_bruteforce, ann_topk_ivf

    rng = np.random.default_rng(4)
    # clustered data so IVF cells are meaningful
    centers = rng.normal(size=(8, 24)) * 5
    pts = np.vstack([c + rng.normal(size=(50, 24)) for c in centers]).astype(np.float32)
    n = len(pts)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(pts.reshape(-1), pa.float32()), 24
            ),
        }
    )
    qids = np.arange(4, dtype=np.int64)
    exact = ann_topk_bruteforce(rd.from_arrow(t).repartition(4), qids, pts[:4], k=10).to_pandas()
    approx = ann_topk_ivf(
        rd.from_arrow(t).repartition(4), qids, pts[:4], k=10, n_cells=8, n_probe=3
    ).to_pandas()
    inter = 0
    for qi in range(4):
        a = set(exact[exact.query_id == qi].neighbor_id)
        b = set(approx[approx.query_id == qi].neighbor_id)
        inter += len(a & b) / len(a)
    assert inter / 4 >= 0.8  # n_probe=3/8 on well-separated clusters


def test_sessionize_gap_semantics(ray_session):
    import ray.data as rd
    from fastcdc_rs_ray.stages.sessions import sessionize

    us = 1_000_000
    rows = []
    # user 1: 3 events, gap of 31 min splits after the second
    for i, t in enumerate([0, 10 * 60 * us, 41 * 60 * us]):
        rows.append({"user_id": 1, "ts": np.datetime64(t, "us")})
    # user 2: single event
    rows.append({"user_id": 2, "ts": np.datetime64(5, "us")})
    t = pa.table(
        {
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        }
    )
    out = sessionize(rd.from_arrow(t).repartition(2), num_partitions=2).to_pandas()
    u1 = out[out.user_id == 1].sort_values("session_id")
    assert u1.session_id.tolist() == [0, 1]
    assert u1.n_events.tolist() == [2, 1]
    assert out[out.user_id == 2].n_events.tolist() == [1]


def test_pq_rerank_recall(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.ann import ann_topk_bruteforce, ann_topk_pq

    rng = np.random.default_rng(4)
    centers = rng.normal(size=(8, 24)) * 5
    pts = np.vstack(
        [c + rng.normal(size=(50, 24)) for c in centers]).astype(np.float32)
    n = len(pts)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(pts.reshape(-1), pa.float32()), 24
            ),
        }
    )
    qids = np.arange(4, dtype=np.int64)
    exact = ann_topk_bruteforce(
        rd.from_arrow(t).repartition(4), qids, pts[:4], k=10).to_pandas()
    approx = ann_topk_pq(
        rd.from_arrow(t).repartition(4), qids, pts[:4], k=10, m=8, ks=16,
        rerank=5,
    ).to_pandas()
    inter = 0.0
    for qi in range(4):
        a = set(exact[exact.query_id == qi].neighbor_id)
        b = set(approx[approx.query_id == qi].neighbor_id)
        inter += len(a & b) / len(a)
    # ADC shortlist (50 of 400) + exact re-rank recovers the exact top-10
    assert inter / 4 >= 0.9

    # rerank*k >= n: shortlist is the whole corpus -> must EQUAL brute force
    full = ann_topk_pq(
        rd.from_arrow(t).repartition(4), qids, pts[:4], k=10, m=8, ks=16,
        rerank=40,
    ).to_pandas()
    assert full.sort_values(["query_id", "rank"]).neighbor_id.tolist() == \
        exact.sort_values(["query_id", "rank"]).neighbor_id.tolist()
