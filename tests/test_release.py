"""curation_release: end-to-end conservation laws hold on a synthetic
corpus, and every perturb knob flips exactly its own boolean
(falsifiability — VERDICT r4 item 8)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastcdc_rs_ray.pipelines.release import curation_release


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """240 docs (60 convs of 4 turns): English stopword-rich texts that
    pass the curate predicate, with exact duplicates planted so the
    dedup stages have work."""
    rng = np.random.default_rng(23)
    fillers = ["alpha", "beta", "gamma", "delta", "omega", "sigma",
               "kappa", "lambda"]
    texts = []
    for i in range(240):
        if i % 7 == 3:
            texts.append(texts[i - 3])  # exact duplicate
            continue
        extra = " ".join(rng.choice(fillers, 4).tolist())
        texts.append(
            f"the quick and brown fox of the {extra} jumps to the lazy "
            f"dog in the field is that it for with number {i // 7}")
    t = pa.table({
        "doc_id": pa.array(range(240), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 240, pa.string()),
        "source": pa.array([f"src{i % 3}" for i in range(240)],
                           pa.string()),
    })
    d = tmp_path_factory.mktemp("release_corpus")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_release_conservation_green(ray_session, corpus_dir):
    out = curation_release(corpus_dir, num_partitions=4)
    assert out["n_docs_in"][0].as_py() == 240
    n_curated = out["n_curated"][0].as_py()
    assert 0 < n_curated < 240  # the exact-dup plants must collapse
    for col in ("keep_conserved", "split_conserved", "pack_conserved",
                "card_consistent"):
        assert out[col][0].as_py() == 1, col


@pytest.mark.parametrize("knob,col", [
    ("drop_rep", "keep_conserved"),
    ("leak_split", "split_conserved"),
    ("lose_doc", "pack_conserved"),
    ("card_off", "card_consistent"),
])
def test_release_perturb_flips_exactly_one_law(ray_session, corpus_dir,
                                               knob, col):
    out = curation_release(corpus_dir, num_partitions=4, perturb=knob)
    got = {c: out[c][0].as_py()
           for c in ("keep_conserved", "split_conserved",
                     "pack_conserved", "card_consistent")}
    assert got[col] == 0, (knob, got)
    for c, v in got.items():
        if c != col:
            assert v == 1, (knob, c, got)


def test_release_all_rejected_corpus(ray_session, tmp_path):
    """Degenerate release: every doc fails the curate predicate (no
    English stopwords, too few words) — the chain must run end-to-end
    with zero released docs and every conservation law still green."""
    t = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array([f"zzz{i} qqq xxx" for i in range(40)],
                         pa.string()),
        "lang": pa.array(["xx"] * 40, pa.string()),
        "source": pa.array(["s"] * 40, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = curation_release(str(tmp_path), num_partitions=2)
    assert out["n_docs_in"][0].as_py() == 40
    assert out["n_curated"][0].as_py() == 0
    for col in ("keep_conserved", "split_conserved", "pack_conserved",
                "card_consistent"):
        assert out[col][0].as_py() == 1, col
