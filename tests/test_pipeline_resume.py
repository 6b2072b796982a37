"""Flagship-pipeline resumability: signatures through the per-partition
checkpoint runner; crash-resume yields byte-identical clusters."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

from fastcdc_rs_ray.cdc import ChunkerConfig
from fastcdc_rs_ray.pipelines.neardup import (
    neardup_clusters,
    neardup_clusters_from_signatures,
    signatures_checkpointed,
)
from fastcdc_rs_ray.sources.transcripts import synth_transcripts
from fastcdc_rs_ray.state.checkpoint import completed_partitions, stage_is_complete

CFG = ChunkerConfig(64, 256, 1024)


def test_checkpointed_signatures_resume_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    transcripts, _ = synth_transcripts(n_convs=120, seed=21, dup_frac=0.3)
    root = str(tmp_path / "wk")

    # reference result: straight-through pipeline
    direct = neardup_clusters(
        rd.from_arrow(transcripts).repartition(4), cfg=CFG,
        num_partitions=8, verify_threshold=0.4,
    ).to_pandas()

    # checkpointed signatures -> clusters
    sigs = signatures_checkpointed(
        rd.from_arrow(transcripts).repartition(4), root, cfg=CFG,
        num_partitions=8, group_size=3,
    )
    via_ckpt = neardup_clusters_from_signatures(
        sigs, num_partitions=8, verify_threshold=0.4
    ).to_pandas()
    a = dict(zip(direct.conv_id, direct.cluster_id))
    b = dict(zip(via_ckpt.conv_id, via_ckpt.cluster_id))
    assert a == b

    stage_dir = os.path.join(root, "signatures")
    assert stage_is_complete(stage_dir)
    manifest = completed_partitions(stage_dir)
    assert sorted(manifest) == list(range(8))

    # simulate a crash: lose two partitions + the success marker
    os.remove(os.path.join(stage_dir, "_SUCCESS"))
    keep = {p: r for p, r in manifest.items() if p not in (2, 5)}
    with open(os.path.join(stage_dir, "_manifest.jsonl"), "w") as f:
        import json

        for r in keep.values():
            f.write(json.dumps(r) + "\n")
    for p in (2, 5):
        shutil.rmtree(os.path.join(stage_dir, f"part={p}"))

    sigs2 = signatures_checkpointed(
        rd.from_arrow(transcripts).repartition(4), root, cfg=CFG,
        num_partitions=8, group_size=3,
    )
    resumed = neardup_clusters_from_signatures(
        sigs2, num_partitions=8, verify_threshold=0.4
    ).to_pandas()
    c = dict(zip(resumed.conv_id, resumed.cluster_id))
    assert a == c
    assert stage_is_complete(stage_dir)


def test_resume_tolerates_empty_signature_bucket(ray_session):
    """A checkpoint bucket with zero rows restores as an EMPTY plain-list
    block; fix_sig_type must type it (FixedSizeListArray.from_arrays
    rejects width 0) instead of crashing the whole resume run."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    n_perms = 128
    rng = np.random.default_rng(2)
    sig = rng.integers(0, 2**63, size=(6, n_perms), dtype=np.uint64)
    sig[1] = sig[0]  # one identical pair -> at least one cluster of 2
    plain = pa.list_(pa.uint64())
    full = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(6)]),
        "minhash": pa.array([row for row in sig.tolist()], plain),
    })
    empty = full.schema.empty_table()
    ds = rd.from_arrow([empty, full, empty])  # empty buckets around a real one
    out = neardup_clusters_from_signatures(
        ds, num_partitions=4, verify_threshold=0.5, n_perms=n_perms
    ).to_pandas()
    assert len(out) == 6
    c = dict(zip(out.conv_id, out.cluster_id))
    assert c["c0"] == c["c1"]
