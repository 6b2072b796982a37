"""Sequence packing invariants: budget respected, greedy-maximal bins,
oversize isolation, partitioning determinism (stages/packing.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from fastcdc_rs_ray.stages.packing import _pack_counts, pack_docs

BUDGET = 50


def test_pack_counts_greedy_reference():
    rng = np.random.default_rng(11)
    counts = rng.integers(0, 80, size=400).astype(np.int64)  # some oversize
    bins = _pack_counts(counts, BUDGET)
    # replay the greedy rule doc by doc
    want = np.empty_like(bins)
    b, fill = 0, 0
    for i, c in enumerate(counts):
        c_eff = int(c)
        if c_eff > BUDGET:                      # oversize: own bin
            if fill > 0:
                b += 1
            want[i] = b
            b += 1
            fill = 0
            continue
        if fill + c_eff > BUDGET:               # close bin, open next
            b += 1
            fill = 0
        want[i] = b
        fill += c_eff
    assert (bins == want).all()
    # bins are consecutive starting at 0
    assert bins[0] == 0 and (np.diff(bins) >= 0).all() and (np.diff(bins) <= 1).all()


def test_pack_docs_invariants(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 600
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(0, 70, size=n)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
    })
    out = pack_docs(rd.from_arrow(tbl).repartition(7), budget=BUDGET,
                    n_groups=8).to_pandas()
    assert len(out) == n
    # every non-oversize bin within budget; oversize docs alone in their bin
    fills = out[~out["oversize"]].groupby(["pack_group", "bin_idx"])[
        "n_tokens"].sum()
    assert (fills <= BUDGET).all()
    over = out[out["oversize"]]
    sizes = out.groupby(["pack_group", "bin_idx"]).size()
    for _, row in over.iterrows():
        assert sizes[(row["pack_group"], row["bin_idx"])] == 1
    # token counts match whitespace tokenization
    want_tok = np.array([len(t.split()) for t in texts])
    got = out.sort_values("doc_id")
    assert (got["n_tokens"].to_numpy() == want_tok).all()


def test_pack_docs_partition_invariant(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    n = 300
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(0, 70, size=n)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
    })

    def run(parts):
        return (
            pack_docs(rd.from_arrow(tbl).repartition(parts), budget=BUDGET,
                      n_groups=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(11))
