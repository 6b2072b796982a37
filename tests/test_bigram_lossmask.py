"""Planted-case tests for bigram_novelty (stages/rarity.py) and
loss_mask_stats (stages/convstruct.py): brute-force references, planted
boilerplate vs novel docs, all-context training windows."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa


# --------------------------------------------------------------------------
# bigram_novelty
# --------------------------------------------------------------------------


def _bg_ref(texts, rare_max=1):
    corpus = Counter()
    per_doc = []
    for s in texts:
        toks = s.split()
        bgs = list(zip(toks, toks[1:]))
        per_doc.append(bgs)
        corpus.update(bgs)
    out = {}
    for i, bgs in enumerate(per_doc):
        if not bgs:
            continue
        n_rare = sum(1 for b in bgs if corpus[b] <= rare_max)
        out[i] = (len(bgs), n_rare, n_rare * 1000 // len(bgs))
    return out


def _bg_run(texts, n_parts, ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.rarity import bigram_novelty

    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(n_parts)
    return {
        r["doc_id"]: (r["n_bigrams"], r["n_rare"], r["novel_permille"])
        for r in bigram_novelty(ds, num_partitions=4).take_all()
    }


def test_bigram_novelty_vs_bruteforce(ray_session):
    texts = [
        "the cat sat on the mat",       # shares 'the cat' with doc 1
        "the cat ran off",
        "totally novel bigrams here",   # every bigram corpus-unique
        "the cat the cat the cat",      # repeats its own bigrams
        "single",                       # < 2 tokens: no output row
        "",
    ]
    ref = _bg_ref(texts)
    for n_parts in (1, 3):
        got = _bg_run(texts, n_parts, ray_session)
        assert got == ref
    # planted expectations, independent of the reference helper:
    assert ref[2] == (3, 3, 1000)      # fully novel
    assert ref[3][1] == 0              # 'the cat'/'cat the' repeat -> 0 rare
    assert 4 not in ref and 5 not in ref


def test_bigram_novelty_cross_block_counts(ray_session):
    # the same bigram in two different docs placed in different blocks
    # must still be counted corpus-wide (not rare)
    texts = ["alpha beta", "alpha beta gamma"]
    got = _bg_run(texts, 2, ray_session)
    # doc0: 1 bigram, shared -> 0 rare; doc1: 2 bigrams, 1 rare
    assert got[0] == (1, 0, 0)
    assert got[1] == (2, 1, 500)


# --------------------------------------------------------------------------
# loss_mask_stats
# --------------------------------------------------------------------------


def test_loss_mask_windows(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.convstruct import loss_mask_stats

    rows = [
        # budget 5; tokens 3,3,7,1 -> windows 0,0,1,2 (same as conv_windows)
        ("w", 0, "user", "a b c"),
        ("w", 1, "assistant", "d e f"),
        ("w", 2, "user", "g h i j k l m"),
        ("w", 3, "assistant", "n"),
        # all-context conversation: no assistant turn -> loss_permille 0
        ("ctx", 0, "user", "p q"),
        ("ctx", 1, "tool", "r s"),
    ]
    c, i, r, x = zip(*rows)
    t = pa.table(
        {
            "conv_id": pa.array(c, pa.string()),
            "turn_idx": pa.array(i, pa.int32()),
            "role": pa.array(r, pa.string()),
            "text": pa.array(x, pa.string()),
        }
    )
    ds = rd.from_arrow([t.slice(0, 2), t.slice(2)])  # w spans blocks
    out = {(r["conv_id"], r["window_idx"]): r
           for r in loss_mask_stats(ds, budget=5,
                                    num_partitions=4).take_all()}
    # window (w, 0): tokens 6, loss 3 (the assistant 'd e f') -> 500
    assert out[("w", 0)]["n_tokens"] == 6
    assert out[("w", 0)]["n_loss_tokens"] == 3
    assert out[("w", 0)]["loss_permille"] == 500
    # window (w, 1): the long user turn, all context
    assert out[("w", 1)]["n_loss_tokens"] == 0
    assert out[("w", 1)]["loss_permille"] == 0
    # window (w, 2): single assistant turn, all loss
    assert out[("w", 2)]["n_loss_tokens"] == 1
    assert out[("w", 2)]["loss_permille"] == 1000
    # all-context conversation
    assert out[("ctx", 0)]["n_loss_tokens"] == 0
    assert out[("ctx", 0)]["loss_permille"] == 0
    # conservation vs conv_windows semantics
    assert sum(r["n_tokens"] for r in out.values()) == 14 + 4
