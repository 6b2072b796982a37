"""prefix_dups: turn-sequence prefix duplicates.

Covers: proper prefix chains (A ⊂ AB ⊂ ABC), exact-copy runs (first
conv_id survives), char-extension that is NOT a turn boundary (must not
flag), equal copies that also have an extension (all copies flagged),
cross-block grouping, and the max_group cap (falsifiability)."""

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


def _run(convs, blocks=2, **kw):
    import ray.data as rd

    from fastcdc_rs_ray.stages.prefixdup import prefix_dups

    items = list(convs.items())
    half = len(items) // 2
    tables = [_turns(dict(items[:half])), _turns(dict(items[half:]))]
    ds = rd.from_arrow(tables)
    out = prefix_dups(ds, num_partitions=4, **kw).to_pandas()
    return set(out["conv_id"]) if "conv_id" in out.columns else set()


def test_prefix_chain_and_boundaries(ray_session):
    convs = {
        "a1": ["hello", "world"],
        "a2": ["hello", "world", "more"],          # extends a1
        "a3": ["hello", "world", "more", "yet"],   # extends a2 (and a1)
        "b1": ["hello", "worldly"],                # char- but not turn-prefix of nothing
        "c1": ["greet", "one"],
        "c2": ["greet", "one"],                    # exact copy of c1 -> c2 flagged
        "d1": ["solo", "conversation"],
    }
    got = _run(convs)
    assert got == {"a1", "a2", "c2"}
    # b1: "hello\nworldly" starts with "hello\nworld" but the next char is
    # 'l', not a turn boundary -> a1 is still a dup only via a2/a3, and b1
    # itself is no one's prefix


def test_equal_copies_with_extension_all_flagged(ray_session):
    convs = {
        "x1": ["start", "mid"],
        "x2": ["start", "mid"],            # equal to x1
        "x3": ["start", "mid", "end"],     # extends both
        "y9": ["other", "thing"],
    }
    # x1 is a proper prefix of x3 -> flagged despite being the first copy
    assert _run(convs) == {"x1", "x2"}


def test_max_group_cap_falsifiable(ray_session):
    convs = {f"g{i:02d}": ["same opener", f"tail {i}"] for i in range(6)}
    convs["g99"] = ["same opener"]  # prefix of every other g*
    assert _run(convs) == {"g99"}
    # cap below the group size: the hot-opener group generates nothing
    assert _run(convs, max_group=3) == set()
