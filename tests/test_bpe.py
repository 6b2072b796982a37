"""Distributed BPE training vs the pure-Python single-dict replica.

Covers: merge-table equality across multi-block inputs, the a == b
overlap policy (greedy left-to-right on 'aaaa' runs), the tie-break
order, the early-stop rule (count < 2), and partition invariance."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fastcdc_rs_ray.stages.bpe import (
    _apply_merge,
    bpe_train,
    bpe_train_reference,
    word_types,
)

CORPUS = (
    ["the cat sat on the mat"] * 5
    + ["the cataract act acted"] * 3
    + ["aaaa aaa aa baaab"] * 4
    + ["zz zz zz yy"] * 2
    + ["mixed CASE Mixed case 123 123 1234"] * 3
)


def _docs_ds(texts, n_blocks=3):
    import ray.data as rd

    tables = []
    step = -(-len(texts) // n_blocks)
    for i in range(0, len(texts), step):
        chunk = texts[i: i + step]
        tables.append(pa.table({
            "doc_id": pa.array(range(i, i + len(chunk)), pa.int64()),
            "text": pa.array(chunk, pa.string()),
        }))
    return rd.from_arrow(tables)


def _word_counts(texts):
    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_bpe_matches_reference(ray_session):
    got = bpe_train(_docs_ds(CORPUS), n_merges=20, num_partitions=4)
    ref = bpe_train_reference(_word_counts(CORPUS), n_merges=20)
    rows = list(zip(got["left"].to_pylist(), got["right"].to_pylist(),
                    got["n"].to_pylist()))
    assert rows == ref
    assert len(rows) > 5
    # new_id/rank bookkeeping
    assert got["new_id"].to_pylist() == [256 + r for r in range(len(rows))]


def test_bpe_partition_invariance(ray_session):
    a = bpe_train(_docs_ds(CORPUS, n_blocks=1), n_merges=12, num_partitions=2)
    b = bpe_train(_docs_ds(CORPUS, n_blocks=5), n_merges=12, num_partitions=7)
    assert a.to_pydict() == b.to_pydict()


def test_apply_merge_overlap_policy():
    # 'aaaa' with merge (a,a): greedy left-to-right -> [N, N]
    flat = np.array([97, 97, 97, 97], np.int32)
    lens = np.array([4], np.int64)
    out, lens2 = _apply_merge(flat, lens, 97, 97, 300)
    assert out.tolist() == [300, 300] and lens2.tolist() == [2]
    # 'aaa' -> [N, a]
    out, lens2 = _apply_merge(np.array([97, 97, 97], np.int32),
                              np.array([3], np.int64), 97, 97, 300)
    assert out.tolist() == [300, 97] and lens2.tolist() == [2]
    # no cross-word merge
    out, lens2 = _apply_merge(np.array([97, 98, 97, 98], np.int32),
                              np.array([2, 2], np.int64), 98, 97, 300)
    assert out.tolist() == [97, 98, 97, 98]


def test_bpe_early_stop(ray_session):
    # every word unique and short: all pair counts are 1 -> no merges
    got = bpe_train(_docs_ds(["ab cd ef", "gh ij kl"]), n_merges=8)
    assert len(got) == 0


def test_word_types_counts(ray_session):
    wt = pa.concat_tables([
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in word_types(_docs_ds(CORPUS), num_partitions=3)
        .iter_batches(batch_format="pyarrow")])
    got = dict(zip(wt["token"].to_pylist(),
                   wt["cnt"].to_pylist()))
    assert got == _word_counts(CORPUS)
