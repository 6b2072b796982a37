"""tfidf_terms: integer tf/df scoring against a duckdb-free numpy
reference on a crafted corpus (shared stopword noise vs lang-specific
signal tokens), multi-block."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.tfidf import tfidf_terms


def test_tfidf_distinctive_terms(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(5)
    docs, langs = [], []
    for lang, signal in [("en", "hello"), ("de", "hallo"), ("fr", "salut")]:
        for i in range(30):
            # 'common' appears everywhere -> high df kills its score
            toks = ["common"] * 5 + [signal] * int(rng.integers(2, 6)) + [
                f"w{int(rng.integers(0, 50))}" for _ in range(6)]
            rng.shuffle(toks)
            docs.append(" ".join(toks))
            langs.append(lang)
    ids = np.arange(len(docs), dtype=np.int64)
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)

    out = tfidf_terms(rd.read_parquet(path).repartition(5),
                      k=3, num_partitions=4).to_pandas()

    # numpy reference of the exact integer score
    from collections import Counter, defaultdict
    c = Counter()
    df = defaultdict(set)
    for i, (txt, lg) in enumerate(zip(docs, langs)):
        for tok in txt.split():
            c[(lg, tok)] += 1
            df[tok].add(i)
    scored = [(lg, tok, (n * 1_000_000) // len(df[tok]))
              for (lg, tok), n in c.items()]
    for lang in ["en", "de", "fr"]:
        ref = sorted((s for s in scored if s[0] == lang),
                     key=lambda s: (-s[2], s[1]))[:3]
        got = out[out["lang"] == lang].sort_values(
            ["score", "token"], ascending=[False, True])
        assert list(got["token"]) == [r[1] for r in ref]
        assert list(got["score"]) == [r[2] for r in ref]
    # per-lang signal token must outrank the universal 'common'
    for lang, signal in [("en", "hello"), ("de", "hallo"), ("fr", "salut")]:
        toks = set(out[out["lang"] == lang]["token"])
        assert signal in toks
