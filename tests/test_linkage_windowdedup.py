"""Round-3 operator families: rarest-token-blocking record linkage
(stages/linkage.py) and time-windowed dedup (stages/windowdedup.py) —
planted-case ground truth plus the blocking/window semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.linkage import part_name_linkage
from fastcdc_rs_ray.stages.windowdedup import windowed_dedup_rollup


def _parts(names):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "p_partkey": pa.array(range(1, len(names) + 1), pa.int64()),
        "p_name": pa.array(names, pa.string()),
    }))


def test_linkage_finds_planted_pair_and_blocks(ray_session):
    # dfs: zircon 2, amber 3, blue 2, green 1, quartz 2, ruby/pink 1.
    # Rarest word ((df, word) lexicographic min): part 1 'blue', part 3
    # 'blue' -> same block, share {amber, blue} = 2 of 3+3 -> J = 1/2 ->
    # linked.  Part 2's rarest is 'green' (df 1): blocked apart from
    # part 1 despite sharing 2 words — the documented blocking trade,
    # mirrored exactly by the oracle.
    names = [
        "zircon amber blue",
        "zircon amber green",
        "quartz amber blue",
        "quartz ruby pink",
        "plain common words",
    ]
    out = part_name_linkage(_parts(names), num_partitions=2).to_pandas()
    pairs = set(zip(out.part_a, out.part_b))
    assert (1, 3) in pairs
    assert (1, 2) not in pairs  # shared words but different rarest word
    row = out[(out.part_a == 1) & (out.part_b == 3)]
    assert int(row.n_common.iloc[0]) == 2


def test_linkage_hot_block_cap(ray_session):
    # dfs: sharedrare 40, flare 40, extra0/extra1 20 each -> every
    # name's rarest word is its extraN, forming two 20-member blocks;
    # cap at 10 excludes both (mirrored in the oracle's
    # HAVING COUNT(*) <= cap), so no pair survives despite every pair
    # inside a block sharing 2 of 3 words (J = 1/2)
    names = ["sharedrare flare extra" + str(i % 2) for i in range(40)]
    out = part_name_linkage(_parts(names), max_block=10,
                            num_partitions=2).to_pandas()
    assert len(out) == 0
    # raising the cap above the block size turns the pairs on — the cap
    # is what excluded them, not the predicate
    out2 = part_name_linkage(_parts(names), max_block=30,
                             num_partitions=2).to_pandas()
    assert len(out2) == 2 * (20 * 19 // 2)


def test_linkage_jaccard_threshold(ray_session):
    # share 1 of 3 words with same rarest -> J = 1/5 < 1/2 -> no link
    names = ["zed alpha beta", "zed gamma delta"]
    out = part_name_linkage(_parts(names), num_partitions=1).to_pandas()
    assert len(out) == 0


def test_windowed_dedup_semantics(ray_session):
    import ray.data as rd

    base = 1_700_000_000_000_000  # epoch us
    w = 600 * 1_000_000
    rows = [
        # user 1 click at t0, replay inside the window -> 1 dup
        (1, 1, "click", base),
        (2, 1, "click", base + w),          # exactly at window edge: dup
        (3, 1, "click", base + 3 * w),      # far outside: fresh
        # user 2 same type at same times: independent per user
        (4, 2, "click", base),
        # different type inside window: not a dup
        (5, 1, "view", base + 1),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
    })
    out = windowed_dedup_rollup(rd.from_arrow(t), window_us=w,
                                num_partitions=2).to_pandas()
    got = {r.event_type: (r.n_events, r.n_window_dups)
           for r in out.itertuples()}
    assert got["click"] == (4, 1)
    assert got["view"] == (1, 0)


def test_windowed_dedup_tie_order(ray_session):
    """Equal timestamps order by event_id (mirrored in the oracle's LAG
    ORDER BY ts, event_id): the later id is the duplicate."""
    import ray.data as rd

    base = 1_700_000_000_000_000
    t = pa.table({
        "event_id": pa.array([7, 3], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["click", "click"], pa.string()),
        "ts": pa.array([base, base], pa.timestamp("us")),
    })
    out = windowed_dedup_rollup(rd.from_arrow(t),
                                num_partitions=1).to_pandas()
    assert int(out.n_window_dups.iloc[0]) == 1


def test_last_touch_attribution_semantics(ray_session):
    """Planted timeline: at-or-before rule, window bound, per-user
    isolation, same-ts tie order by event_id (stages/attribution.py)."""
    import ray.data as rd

    from fastcdc_rs_ray.stages.attribution import last_touch_attribution

    base = 1_700_000_000_000_000
    W = 1_800 * 1_000_000
    rows = [
        # u1: click then purchase inside window -> attributed (7.00)
        (1, 1, "click", base, 0.0),
        (2, 1, "purchase", base + 60_000_000, 7.0),
        # u1: next purchase far outside the window -> not attributed
        (3, 1, "purchase", base + 3 * W, 9.0),
        # u2: purchase BEFORE its click -> not attributed
        (4, 2, "purchase", base, 5.0),
        (5, 2, "click", base + 1, 0.0),
        # u3: same-ts click with SMALLER event_id counts (tie order)
        (6, 3, "click", base, 0.0),
        (7, 3, "purchase", base, 3.0),
        # u4: same-ts click with LARGER event_id does not count
        (9, 4, "purchase", base, 2.0),
        (10, 4, "click", base, 0.0),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    out = last_touch_attribution(rd.from_arrow(t),
                                 num_partitions=2).to_pandas()
    assert int(out.n_purchases[0]) == 5
    assert int(out.n_attributed[0]) == 2          # events 2 and 7
    assert int(out.attributed_value_c[0]) == 1000  # 7.00 + 3.00
