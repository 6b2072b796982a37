"""ngram_jaccard_pairs' hot-shingle cap (VERDICT r1 item 4): a planted
boilerplate shingle shared by every document must NOT produce a
quadratic pair blowup when its group exceeds ``max_group``, while true
near-duplicate pairs (whose similarity rests on MANY shared shingles)
still surface — the cap lowers computed Jaccard (a lower bound of the
true value), never precision."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from fastcdc_rs_ray.stages.dedup import ngram_jaccard_pairs

VOCAB = np.array([f"w{i:03d}" for i in range(400)])
HOT = "copyright all rights reserved"  # 4 tokens -> two hot 3-grams


def _corpus(n_docs: int = 120, seed: int = 3) -> pa.Table:
    """Every doc carries the hot boilerplate phrase + unique filler; docs
    0 and 1 are a planted near-dup pair (identical 60-token body)."""
    rng = np.random.default_rng(seed)
    body = " ".join(rng.choice(VOCAB, size=60))
    texts = [f"{HOT} {body}", f"{HOT} {body}"]
    for _ in range(n_docs - 2):
        texts.append(f"{HOT} " + " ".join(rng.choice(VOCAB, size=60)))
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts),
    })


def _pairs(t: pa.Table, **kw) -> set[tuple[int, int]]:
    out = ngram_jaccard_pairs(rd.from_arrow(t), k=3, **kw)
    tables = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
              for b in out.iter_batches(batch_format="pyarrow")]
    got = pa.concat_tables(tables) if tables else None
    if got is None or got.num_rows == 0:
        return set()
    return set(zip(got["src"].to_numpy(zero_copy_only=False),
                   got["dst"].to_numpy(zero_copy_only=False)))


def test_cap_bounds_hot_shingle_and_keeps_true_dups(ray_session):
    t = _corpus()
    # cap BELOW the 120-doc hot group: its two hot shingles are dropped
    capped = _pairs(t, tau=0.5, num_partitions=4, max_group=64)
    assert (0, 1) in capped          # the planted near-dup pair survives
    # no pair owes its candidacy to the hot group alone: every surviving
    # pair must share non-boilerplate content (here only the planted one)
    assert capped == {(0, 1)}


def test_cap_is_a_lower_bound_not_a_filter_bypass(ray_session):
    """With the cap disabled the hot group links all 120 docs as
    CANDIDATES, but tau still rejects them (they share only boilerplate);
    with the cap enabled the same relation holds at ~1/3500 the pair
    fan-out.  Outputs are identical — the cap changed cost, not truth,
    on this corpus."""
    t = _corpus()
    uncapped = _pairs(t, tau=0.5, num_partitions=4, max_group=10**9)
    capped = _pairs(t, tau=0.5, num_partitions=4, max_group=64)
    assert uncapped == capped == {(0, 1)}


def test_cap_only_lowers_computed_jaccard(ray_session):
    """For a pair ABOVE tau only via the hot shingles, the cap can drop
    it (recall loss, documented); it can never ADD a pair.  Construct a
    borderline pair whose true J ~ 0.52 including hot shingles, < 0.5
    without them -> capped run drops it, uncapped keeps it."""
    rng = np.random.default_rng(9)
    # long boilerplate -> 10 hot interior shingles dominate the overlap:
    # J_true = 22/34 ~ 0.65 (kept uncapped), J_capped = 12/44 ~ 0.27
    hot12 = " ".join(f"legal{i}" for i in range(12))
    shared = " ".join(rng.choice(VOCAB, size=12))
    a_only = " ".join(rng.choice(VOCAB, size=6))
    b_only = " ".join(rng.choice(VOCAB, size=6))
    texts = [f"{hot12} {shared} {a_only}", f"{hot12} {shared} {b_only}"]
    # surround with enough hot-carrying docs to blow the cap
    for _ in range(80):
        texts.append(f"{hot12} " + " ".join(rng.choice(VOCAB, size=60)))
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    uncapped = _pairs(t, tau=0.5, num_partitions=4, max_group=10**9)
    capped = _pairs(t, tau=0.5, num_partitions=4, max_group=64)
    assert (0, 1) in uncapped
    assert capped <= uncapped        # never adds pairs (precision intact)
    assert (0, 1) not in capped      # the documented recall trade
