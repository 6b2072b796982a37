"""doc_rarity (stages/rarity.py): exact corpus-frequency components vs
a brute-force reference, invariant to input partitioning."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from fastcdc_rs_ray.stages.rarity import doc_rarity

TEXTS = [
    "the cat sat on the mat",
    "the dog sat",
    "rare unique tokens here",
    "the the the",
    "",
]


def _ref(texts):
    corpus = Counter()
    for s in texts:
        corpus.update(s.split())
    out = {}
    for i, s in enumerate(texts):
        toks = s.split()
        if toks:
            out[i] = (sum(corpus[t] for t in toks), len(toks))
    return out


def _run(texts, n_parts):
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(n_parts)
    out = doc_rarity(ds, num_partitions=4)
    tables = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
              for b in out.iter_batches(batch_format="pyarrow")]
    got = pa.concat_tables(tables)
    return {d: (f, n) for d, f, n in zip(
        got["doc_id"].to_numpy(zero_copy_only=False),
        got["freq_sum"].to_numpy(zero_copy_only=False),
        got["n_tokens"].to_numpy(zero_copy_only=False))}


def test_doc_rarity_matches_bruteforce(ray_session):
    assert _run(TEXTS, 1) == _ref(TEXTS)


def test_doc_rarity_partition_invariant(ray_session):
    assert _run(TEXTS, 1) == _run(TEXTS, 3) == _run(TEXTS, 5)


def test_doc_rarity_empty_doc_absent(ray_session):
    got = _run(TEXTS, 2)
    assert 4 not in got  # the empty doc has no tokens, like the SQL side
