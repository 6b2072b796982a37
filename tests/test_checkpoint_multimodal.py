"""Checkpointed stage execution (resume semantics) + multimodal plumbing."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from fastcdc_rs_ray.state.checkpoint import (
    completed_partitions,
    run_stage_checkpointed,
    stage_is_complete,
)
from fastcdc_rs_ray.stages.multimodal import (
    MediaFeaturizer,
    fake_decoder,
    featurize_media,
    real_decoder,
    sample_frames,
    synth_media_table,
)


def _ids_table(n=200):
    return pa.table(
        {
            "conv_id": pa.array([f"c{i:05d}" for i in range(n)], pa.string()),
            "x": pa.array(range(n), pa.int64()),
        }
    )


def _double(ds):
    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(1, "x", pc.multiply(t["x"], 2))

    return ds.map_batches(f, batch_format="pyarrow")


def test_checkpoint_complete_and_resume(ray_session, tmp_path):
    import ray.data as rd

    root = str(tmp_path / "ckpt")
    ds = rd.from_arrow(_ids_table()).repartition(4)
    out = run_stage_checkpointed(
        ds, "double", root, key="conv_id", fn=_double, num_partitions=6, group_size=2
    )
    got = out.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert got.x.tolist() == [2 * i for i in range(200)]
    stage_dir = os.path.join(root, "double")
    assert stage_is_complete(stage_dir)
    manifest = completed_partitions(stage_dir)
    assert sorted(manifest) == list(range(6))
    assert all(rec["rows"] >= 0 and "wall_s" in rec for rec in manifest.values())

    # simulate a crash that lost partitions 4 and 5: drop their manifest
    # rows, their dirs and the _SUCCESS marker
    os.remove(os.path.join(stage_dir, "_SUCCESS"))
    recs = {p: r for p, r in manifest.items() if p < 4}
    with open(os.path.join(stage_dir, "_manifest.jsonl"), "w") as f:
        import json

        for r in recs.values():
            f.write(json.dumps(r) + "\n")
    for p in (4, 5):
        shutil.rmtree(os.path.join(stage_dir, f"part={p}"))

    calls = {"n": 0}

    def counting_double(ds2):
        calls["n"] += 1
        return _double(ds2)

    ds2 = rd.from_arrow(_ids_table()).repartition(4)
    out2 = run_stage_checkpointed(
        ds2, "double", root, key="conv_id", fn=counting_double,
        num_partitions=6, group_size=2,
    )
    got2 = out2.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert got2.x.tolist() == got.x.tolist()  # identical output after resume
    assert calls["n"] == 1  # one group pass for the 2 missing partitions
    assert stage_is_complete(stage_dir)

    # third run: stage complete -> read-through, no transform at all
    calls["n"] = 0
    out3 = run_stage_checkpointed(
        rd.from_arrow(_ids_table()).repartition(4), "double", root,
        key="conv_id", fn=counting_double, num_partitions=6, group_size=2,
    )
    assert calls["n"] == 0
    assert out3.to_pandas().sort_values("conv_id").x.tolist() == got.x.tolist()


def test_media_featurize_and_frame_sample(ray_session):
    import ray.data as rd

    media = synth_media_table(48)
    ds = rd.from_arrow(media).repartition(3)
    feats = featurize_media(ds, batch_size=8).to_pandas()
    assert len(feats) == 48
    assert set(feats.columns) == {"id", "feature", "media_type"}
    f0 = np.array(feats.sort_values("id").feature.iloc[0])
    assert len(f0) == 32 and abs(f0.sum() - 1.0) < 1e-5  # histogram normalized
    # determinism across runs
    feats2 = featurize_media(rd.from_arrow(media).repartition(5), batch_size=8).to_pandas()
    a = feats.sort_values("id").reset_index(drop=True)
    b = feats2.sort_values("id").reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a.feature, b.feature))

    frames = sample_frames(rd.from_arrow(media), every_k=4).to_pandas()
    meta = media["meta"].to_pylist()
    expect = sum(len(range(0, m["n_frames"], 4)) for m in meta)
    assert len(frames) == expect
    assert (frames.frame_idx % 4 == 0).all()


def test_real_decoder_rejects_unknown_containers():
    """real_decoder is no longer a stub (BMP/WAV codecs, r1 close-out);
    unsupported/unrecognized container bytes must fail loudly, never
    silently produce features."""
    with pytest.raises(ValueError, match="unknown media container"):
        real_decoder(b"", "image")
    with pytest.raises(ValueError, match="unknown media container"):
        real_decoder(b"\x89PNG\r\n\x1a\n", "image")


def test_fake_decoder_roundtrip():
    t = synth_media_table(4)
    m = t["meta"][0].as_py()
    frame = fake_decoder(t["payload"][0].as_py(), "image")
    assert frame.shape == (m["height"], m["width"])


def test_media_resize_composes_with_featurize(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.multimodal import (
        fake_decoder,
        featurize_media,
        resize_media,
        synth_media_table,
    )

    media = synth_media_table(n=24, seed=5)
    ds = rd.from_arrow(media)
    small = resize_media(ds, out_w=12, out_h=10, batch_size=8).materialize()
    rows = small.take_all()
    assert len(rows) == 24
    for r in rows:
        assert r["meta"]["width"] == 12 and r["meta"]["height"] == 10
        frame = fake_decoder(r["payload"], r["media_type"])
        assert frame.shape == (10, 12)
    # schema-preserving: featurize runs unchanged on the resized output
    feats = featurize_media(small, batch_size=8).take_all()
    assert len(feats) == 24 and len(feats[0]["feature"]) == 32
    # resize is a real downsample: resized payload decodes to a gather of
    # the original pixels
    import numpy as np
    orig = fake_decoder(media["payload"][0].as_py(), "image")
    got = fake_decoder(rows[0]["payload"], rows[0]["media_type"]) if rows[0]["id"] == 0 else None
    if got is not None:
        h, w = orig.shape
        ys = (np.arange(10) * h) // 10
        xs = (np.arange(12) * w) // 12
        assert (got == orig[np.ix_(ys, xs)]).all()
