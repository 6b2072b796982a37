"""media_thumbnails: real BMP decode -> downscale -> re-encode round
trip, WAV passthrough, determinism (stages/multimodal.py)."""

from __future__ import annotations

import numpy as np

from fastcdc_rs_ray.stages.multimodal import (
    decode_bmp,
    media_thumbnails,
    synth_real_media_table,
)


def test_thumbnails_roundtrip_and_passthrough(ray_session):
    import ray.data as rd

    media = synth_real_media_table(n=24, seed=3)
    out = media_thumbnails(
        rd.from_arrow(media), thumb=8
    ).to_pandas().sort_values("media_id").reset_index(drop=True)

    assert len(out) == 24
    img = out[out.kind == "image"]
    aud = out[out.kind == "audio"]
    assert len(img) and len(aud)
    # audio passthrough: no thumbnail
    assert aud.thumb_bytes.isna().all() and aud.gray_sum.isna().all()
    # image thumbnails are REAL BMPs of the right shape and smaller
    for _, row in img.iterrows():
        frame = decode_bmp(row.thumb)
        assert frame.shape == (8, 8)
        assert row.thumb_bytes < row.src_bytes
        assert row.gray_sum == int(frame.astype(np.int64).sum())

    # determinism across partitionings
    out2 = media_thumbnails(
        rd.from_arrow(media).repartition(5), thumb=8
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert out.drop(columns=["thumb"]).equals(out2.drop(columns=["thumb"]))
    assert all(a == b for a, b in zip(out.thumb, out2.thumb))
