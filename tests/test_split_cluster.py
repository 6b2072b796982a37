"""split_by_cluster: same-cluster-same-split invariant, determinism under
repartitioning, rough proportions, and the leakage contrast vs a per-doc
hash split."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.pipelines.neardup import split_by_cluster


def _clusters(n_clusters=400, max_size=5, seed=3) -> pa.Table:
    rng = np.random.default_rng(seed)
    conv, clus = [], []
    for c in range(n_clusters):
        for m in range(rng.integers(1, max_size + 1)):
            conv.append(f"conv-{c}-{m}")
            clus.append(f"cl-{c}")
    return pa.table({"conv_id": pa.array(conv), "cluster_id": pa.array(clus)})


def test_split_by_cluster(ray_session):
    import ray.data as rd

    t = _clusters()
    out1 = split_by_cluster(rd.from_arrow(t).repartition(1)).to_pandas()
    out5 = split_by_cluster(rd.from_arrow(t).repartition(5)).to_pandas()
    a = out1.sort_values("conv_id").reset_index(drop=True)
    b = out5.sort_values("conv_id").reset_index(drop=True)
    assert a.equals(b)  # deterministic under any partitioning
    # every cluster is entirely in one split — the leakage-safety invariant
    assert (a.groupby("cluster_id")["split"].nunique() == 1).all()
    # proportions are roughly 80/10/10 over clusters
    per_cluster = a.drop_duplicates("cluster_id")["split"].value_counts(
        normalize=True)
    assert abs(per_cluster.get("train", 0) - 0.8) < 0.08
    assert abs(per_cluster.get("val", 0) - 0.1) < 0.06
    assert abs(per_cluster.get("test", 0) - 0.1) < 0.06
