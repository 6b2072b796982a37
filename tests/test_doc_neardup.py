"""doc_neardup_clusters: document-level MinHash/LSH recall on planted
token-level twins vs brute-force Jaccard, multi-block."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.pipelines.neardup import doc_neardup_clusters

K = 5  # doc_signatures shingle size


def _jaccard(a: str, b: str) -> float:
    def sh(s):
        toks = s.split()
        return {tuple(toks[i:i + K]) for i in range(len(toks) - K + 1)}
    sa, sb = sh(a), sh(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_doc_neardup_recall(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(29)
    vocab = [f"tok{i}" for i in range(500)]
    base = [" ".join(rng.choice(vocab, 60)) for _ in range(120)]
    twins = []
    for i in range(0, 120, 4):  # 30 twins: drop 3 trailing tokens
        toks = base[i].split()
        twins.append(" ".join(toks[:-3]))
    docs = base + twins
    ids = np.arange(len(docs), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "text": pa.array(docs, pa.string())})
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)

    out = doc_neardup_clusters(
        rd.read_parquet(path).repartition(5), num_partitions=4,
        verify_threshold=0.5,
    ).to_pandas()
    cl = dict(zip(out["conv_id"].astype(int), out["cluster_id"]))

    # oracle pairs: brute-force token-shingle Jaccard >= 0.5
    want = [(i, j) for i in range(len(docs)) for j in range(i + 1, len(docs))
            if _jaccard(docs[i], docs[j]) >= 0.5]
    assert len(want) >= 30
    hit = sum(1 for i, j in want if cl.get(i) is not None
              and cl.get(i) == cl.get(j))
    assert hit / len(want) >= 0.99
