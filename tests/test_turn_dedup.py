"""turn_dedup: corpus-wide first-occurrence turn removal + reassembly.

Plants duplicates WITHIN a conversation, ACROSS conversations in the same
block, and ACROSS blocks (the path that needs the keyed exchange), plus
empty turns (which must never participate), and checks the Ray result
against a plain-Python reference of the declared semantics.
"""

import numpy as np
import pyarrow as pa
import pytest


def _turns_table(rows):
    c, i, x = zip(*rows)
    return pa.table(
        {
            "conv_id": pa.array(c, pa.string()),
            "turn_idx": pa.array(i, pa.int32()),
            "text": pa.array(x, pa.string()),
        }
    )


def _reference(rows):
    seen = {}
    keep = {}
    for conv, idx, text in sorted(rows):
        if text == "":
            keep[(conv, idx)] = True
        elif text not in seen:
            seen[text] = (conv, idx)
            keep[(conv, idx)] = True
        else:
            keep[(conv, idx)] = False
    out = {}
    for conv, idx, text in sorted(rows):
        n, r, parts = out.get(conv, (0, 0, []))
        kept = keep[(conv, idx)]
        out[conv] = (n + 1, r + (0 if kept else 1), parts + ([text] if kept else []))
    return {
        conv: {"n_turns": n, "n_removed": r, "clean_text": "\n".join(parts)}
        for conv, (n, r, parts) in out.items()
    }


def test_turn_dedup_cross_block(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.turndedup import turn_dedup

    boiler = "hello how can i help"
    rows_a = [
        ("c-000", 0, boiler),
        ("c-000", 1, "unique a1"),
        ("c-000", 2, boiler),          # within-conv dup
        ("c-000", 3, ""),              # empty: always kept
        ("c-001", 0, boiler),          # cross-conv, same block
        ("c-001", 1, "unique b1"),
    ]
    rows_b = [
        ("c-002", 0, boiler),          # cross-BLOCK dup
        ("c-002", 1, "unique c1"),
        ("c-002", 2, "unique b1"),     # cross-block dup of a block-unique line
        ("c-003", 0, ""),
        ("c-003", 1, ""),              # conv of only empties survives intact
    ]
    ds = rd.from_arrow([_turns_table(rows_a), _turns_table(rows_b)])
    got = {
        r["conv_id"]: r
        for r in turn_dedup(ds, num_partitions=4).to_pandas().to_dict("records")
    }
    want = _reference(rows_a + rows_b)
    assert set(got) == set(want)
    for conv, w in want.items():
        g = got[conv]
        assert g["n_turns"] == w["n_turns"], conv
        assert g["n_removed"] == w["n_removed"], conv
        assert g["clean_text"] == w["clean_text"], conv
    # the planted boilerplate survived exactly once, at its first occurrence
    assert got["c-000"]["clean_text"].count(boiler) == 1
    assert got["c-001"]["n_removed"] == 1
    assert got["c-002"]["n_removed"] == 2
    assert got["c-003"]["clean_text"] == "\n"


def test_turn_dedup_no_dups_is_identity(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.turndedup import turn_dedup

    rows = [(f"c-{k:03d}", i, f"text {k} {i}") for k in range(6) for i in range(3)]
    out = turn_dedup(rd.from_arrow(_turns_table(rows)), num_partitions=3).to_pandas()
    assert int(out["n_removed"].sum()) == 0
    assert (out["n_turns"] == 3).all()
    texts = dict(zip(out["conv_id"], out["clean_text"]))
    assert texts["c-004"] == "text 4 0\ntext 4 1\ntext 4 2"


def test_turn_dedup_first_occurrence_order(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.turndedup import turn_dedup

    # same text at (z, 0) and (a, 5): the (a, 5) row wins (conv_id primary)
    rows = [("z", 0, "dup"), ("a", 5, "dup"), ("a", 6, "other")]
    out = turn_dedup(rd.from_arrow(_turns_table(rows)), num_partitions=2).to_pandas()
    rec = {r["conv_id"]: r for r in out.to_dict("records")}
    assert rec["a"]["n_removed"] == 0
    assert rec["z"]["n_removed"] == 1
    assert rec["z"]["clean_text"] == ""
