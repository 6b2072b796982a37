"""Property layer for doc_rarity: equality with a Counter-based
reference under randomized corpora and partitionings (hypothesis)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from fastcdc_rs_ray.stages.rarity import doc_rarity

WORDS = ["a", "bb", "ccc", "dd", "e", "ff", "token", "xyz"]


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


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
        min_size=1, max_size=24,
    ),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_doc_rarity_matches_counter_reference(ray_session, data, n_parts):
    texts = [" ".join(ws) for ws in data]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = doc_rarity(rd.from_arrow(t).repartition(n_parts),
                     num_partitions=3)
    tables = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
              for b in out.iter_batches(batch_format="pyarrow")]
    got_t = pa.concat_tables(tables) if tables else None
    got = {} if got_t is None else {
        d: (f, n) for d, f, n in zip(
            got_t["doc_id"].to_numpy(zero_copy_only=False),
            got_t["freq_sum"].to_numpy(zero_copy_only=False),
            got_t["n_tokens"].to_numpy(zero_copy_only=False))}
    assert got == _ref(texts)
