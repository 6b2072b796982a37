"""Planted-case tests for role_alternation, conv_windows, lang_balance,
shard_balance — each with at least one case that FAILS the gate/invariant
it claims to detect, so the operators are falsifiable."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _turns(rows):
    c, i, r, x = zip(*rows)
    return pa.table(
        {
            "conv_id": pa.array(c, pa.string()),
            "turn_idx": pa.array(i, pa.int32()),
            "role": pa.array(r, pa.string()),
            "text": pa.array(x, pa.string()),
        }
    )


# --------------------------------------------------------------------------
# role_alternation
# --------------------------------------------------------------------------


def test_role_alternation_planted_violations(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.convstruct import role_alternation

    rows = [
        # clean: user/assistant/tool/user
        ("c-good", 0, "user", "a"),
        ("c-good", 1, "assistant", "b"),
        ("c-good", 2, "tool", "c"),
        ("c-good", 3, "user", "d"),
        # starts with assistant -> not ok
        ("c-afirst", 0, "assistant", "x"),
        ("c-afirst", 1, "user", "y"),
        # adjacent repeat (two assistant turns) -> not ok
        ("c-repeat", 0, "user", "p"),
        ("c-repeat", 1, "assistant", "q"),
        ("c-repeat", 2, "assistant", "r"),
        ("c-repeat", 3, "user", "s"),
    ]
    t = _turns(rows)
    # split mid-conversation so the exchange is exercised
    ds = rd.from_arrow([t.slice(0, 5), t.slice(5)])
    out = {
        r["conv_id"]: r
        for r in role_alternation(ds, num_partitions=4).take_all()
    }
    assert out["c-good"]["ok"] == 1
    assert out["c-good"]["n_turns"] == 4
    assert out["c-good"]["n_repeats"] == 0
    assert out["c-good"]["n_tool"] == 1
    assert out["c-good"]["first_role"] == "user"
    assert out["c-afirst"]["ok"] == 0
    assert out["c-afirst"]["first_role"] == "assistant"
    assert out["c-afirst"]["n_repeats"] == 0
    assert out["c-repeat"]["ok"] == 0
    assert out["c-repeat"]["n_repeats"] == 1


# --------------------------------------------------------------------------
# conv_windows
# --------------------------------------------------------------------------


def test_conv_windows_layout(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.convstruct import conv_windows

    # budget 5; token counts 3,3,7,1  -> before = 0,3,6,13 -> win 0,0,1,2
    rows = [
        ("w", 0, "user", "a b c"),
        ("w", 1, "assistant", "d e f"),
        ("w", 2, "user", "g h i j k l m"),  # longer than budget: atomic
        ("w", 3, "assistant", "n"),
    ]
    t = _turns(rows)
    ds = rd.from_arrow([t.slice(0, 2), t.slice(2)])  # cross-block conv
    out = sorted(
        conv_windows(ds, budget=5, num_partitions=4).take_all(),
        key=lambda r: r["window_idx"],
    )
    assert [(r["window_idx"], r["turn_lo"], r["turn_hi"], r["n_turns"],
             r["n_tokens"]) for r in out] == [
        (0, 0, 1, 2, 6),
        (1, 2, 2, 1, 7),
        (2, 3, 3, 1, 1),
    ]
    # conservation: every turn in exactly one window
    assert sum(r["n_turns"] for r in out) == 4
    assert sum(r["n_tokens"] for r in out) == 14


# --------------------------------------------------------------------------
# lang_balance
# --------------------------------------------------------------------------


def test_lang_balance_rule(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.balance import lang_balance
    from fastcdc_rs_ray.stages.sample import SAMPLE_MULT

    # skewed corpus: 400 'en', 25 'th'
    n_en, n_th = 400, 25
    doc_id = np.arange(n_en + n_th, dtype=np.int64)
    lang = np.array(["en"] * n_en + ["th"] * n_th)
    t = pa.table(
        {"doc_id": pa.array(doc_id, pa.int64()), "lang": pa.array(lang)}
    )
    ds = rd.from_arrow([t.slice(0, 100), t.slice(100, 200), t.slice(300)])
    out = {r["lang"]: r for r in lang_balance(ds).take_all()}
    assert out["en"]["n_docs"] == n_en and out["th"]["n_docs"] == n_th
    assert out["en"]["weight"] == 20 and out["th"]["weight"] == 5
    # reference lang = argmin c/w: en 400/20=20, th 25/5=5 -> th keeps all
    assert out["th"]["n_kept"] == n_th
    # en downsamples toward p = (25*20)/(5*400) = 1/4
    # exact replication of the keep rule:
    cm, wm, c, w = 25, 5, 400, 20
    theta = min(1 << 32, -(-(cm * w * (1 << 32)) // (wm * c)))
    h32 = (doc_id[:n_en].astype(np.uint64) * np.uint64(SAMPLE_MULT)) & np.uint64(
        0xFFFFFFFF
    )
    assert out["en"]["n_kept"] == int((h32 < np.uint64(theta)).sum())
    assert 0 < out["en"]["n_kept"] < n_en  # genuinely downsampled


def test_lang_balance_uniform_keeps_all(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.balance import lang_balance

    # equal counts -> every language is the reference -> everything kept
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(60, dtype=np.int64), pa.int64()),
            "lang": pa.array(["a", "b", "c"] * 20),
        }
    )
    out = lang_balance(rd.from_arrow(t)).take_all()
    assert all(r["n_kept"] == r["n_docs"] == 20 for r in out)


# --------------------------------------------------------------------------
# shard_balance
# --------------------------------------------------------------------------


def test_shard_balance_conservation_and_bound(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.balance import shard_balance

    rng = np.random.default_rng(7)
    n, k = 500, 8
    sizes = rng.integers(1, 2000, n).astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "n_chars": pa.array(sizes, pa.int64()),
        }
    )
    # shuffled block layout: order must not matter (range sort inside)
    perm = rng.permutation(n)
    tp = t.take(pa.array(perm, pa.int64()))
    ds = rd.from_arrow([tp.slice(0, 170), tp.slice(170, 170), tp.slice(340)])
    out = shard_balance(ds, k=k).take_all()
    total = int(sizes.sum())
    assert sum(r["n_docs"] for r in out) == n
    assert sum(r["n_bytes"] for r in out) == total
    assert sorted(r["shard_id"] for r in out) == list(range(k))
    # balance bound: a shard overshoots ideal by at most one document
    ideal = total / k
    assert all(r["n_bytes"] <= ideal + sizes.max() for r in out)
    # determinism: identical plan from a different block layout
    out2 = shard_balance(rd.from_arrow(t), k=k).take_all()
    assert sorted(map(tuple, (r.values() for r in out))) == sorted(
        map(tuple, (r.values() for r in out2))
    )


def test_shard_balance_skewed_docs(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.balance import shard_balance

    # one giant doc (first in doc_id order) among tiny ones: count-based
    # sharding would put ~half the bytes in one shard; byte-based gives
    # the giant its own shard and packs the tiny tail elsewhere
    sizes = np.array([10_000] + [1] * 99, dtype=np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(100, dtype=np.int64), pa.int64()),
            "n_chars": pa.array(sizes, pa.int64()),
        }
    )
    out = shard_balance(rd.from_arrow(t), k=4).take_all()
    giant = [r for r in out if r["n_docs"] == 1]
    assert len(giant) == 1 and giant[0]["n_bytes"] == 10_000
