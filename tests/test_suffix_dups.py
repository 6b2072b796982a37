"""suffix_dups: turn-sequence SUFFIX duplicates (context-truncation twins).

Covers: proper suffix chains (C ⊂ BC ⊂ ABC), exact-copy runs, a
char-level (not turn-boundary) suffix that must not flag, independence
from prefix_dups (a prefix pair is NOT a suffix pair), and the
max_group hot-closer cap (falsifiability)."""

import pyarrow as pa


def _turns(convs):
    rows = [(c, i, t) for c, turns in convs.items() for i, t in enumerate(turns)]
    c, i, x = zip(*rows)
    return pa.table(
        {
            "conv_id": pa.array(c, pa.string()),
            "turn_idx": pa.array(i, pa.int32()),
            "text": pa.array(x, pa.string()),
        }
    )


def _run(convs, **kw):
    import ray.data as rd

    from fastcdc_rs_ray.stages.prefixdup import suffix_dups

    items = list(convs.items())
    half = len(items) // 2
    tables = [_turns(dict(items[:half])), _turns(dict(items[half:]))]
    ds = rd.from_arrow(tables)
    out = suffix_dups(ds, num_partitions=4, **kw).to_pandas()
    return set(out["conv_id"]) if "conv_id" in out.columns else set()


def test_suffix_chain_and_boundaries(ray_session):
    convs = {
        "a1": ["more", "yet"],                      # suffix of a2, a3
        "a2": ["world", "more", "yet"],             # suffix of a3
        "a3": ["hello", "world", "more", "yet"],
        "b1": ["underworld", "more", "yet"],        # char-suffix of a3's
        # join ("...hello\nworld\nmore\nyet" ends with "world\nmore\nyet"
        # but b1's first turn is "underworld") -> must NOT flag a2 via b1
        "c1": ["bye", "now"],
        "c2": ["bye", "now"],                       # exact copy -> c2 flagged
        "d1": ["solo", "conversation"],
    }
    got = _run(convs)
    assert got == {"a1", "a2", "c2"}


def test_prefix_pair_is_not_suffix_pair(ray_session):
    convs = {
        "p1": ["hello", "world"],
        "p2": ["hello", "world", "more"],   # p1 is a PREFIX dup, not suffix
    }
    assert _run(convs) == set()


def test_max_group_cap_falsifiable(ray_session):
    convs = {f"g{i:02d}": [f"head {i}", "same closer"] for i in range(6)}
    convs["g99"] = ["same closer"]  # suffix of every other g*
    assert _run(convs) == {"g99"}
    assert _run(convs, max_group=3) == set()
