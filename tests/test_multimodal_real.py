"""Real-container media decode (VERDICT r1 item 7): pure-numpy BMP/WAV
codecs behind the same pluggable ``decoder`` seam the fake codec uses,
exercised end-to-end through the actor-pool featurize stage on genuine
container bytes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fastcdc_rs_ray.stages.multimodal import (
    FEATURE_DIM,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    featurize_media,
    real_decoder,
    synth_real_media_table,
)


@pytest.mark.parametrize("w", [8, 13, 14, 15, 16])  # every row-padding case
def test_bmp_roundtrip_padding(w):
    rng = np.random.default_rng(w)
    frame = rng.integers(0, 256, size=(11, w), dtype=np.uint8)
    data = encode_bmp(frame)
    assert data[:2] == b"BM"
    np.testing.assert_array_equal(decode_bmp(data), frame)


def test_bmp_topdown_and_32bit():
    """decode_bmp handles the two layout variants encode_bmp doesn't emit:
    top-down rows (negative height) and 32-bit pixels."""
    import struct

    frame = np.arange(48, dtype=np.uint8).reshape(6, 8)
    data = bytearray(encode_bmp(frame))
    # flip height sign -> top-down; rows must then be fed in natural order
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    np.testing.assert_array_equal(decode_bmp(bytes(data)), frame[::-1])

    # hand-build a 32-bit BMP (BGRA, stride = w*4, no padding needed)
    w, hh = 5, 3
    px = np.zeros((hh, w, 4), dtype=np.uint8)
    gray = np.arange(15, dtype=np.uint8).reshape(hh, w) * 17
    px[..., 0] = px[..., 1] = px[..., 2] = gray[::-1]  # bottom-up
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + px.size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, hh, 1, 32, 0, px.size,
                       2835, 2835, 0, 0)
    np.testing.assert_array_equal(
        decode_bmp(header + info + px.tobytes()), gray)


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip(channels):
    rng = np.random.default_rng(channels)
    samples = rng.integers(-32768, 32768, size=(channels, 777)).astype(np.int16)
    data = encode_wav(samples, sample_rate=8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    np.testing.assert_array_equal(decode_wav(data), samples)


def test_wav_8bit_and_extra_chunks():
    """8-bit unsigned PCM decodes centered/scaled; unknown chunks (and the
    odd-size pad byte) are skipped like any RIFF reader must."""
    import struct

    raw = np.array([0, 128, 255, 64], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE"
            + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd, padded
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw.tobytes())
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    got = decode_wav(data)
    want = ((raw.astype(np.int16) - 128) << 8)[None, :]
    np.testing.assert_array_equal(got, want)


def test_real_decoder_dispatch():
    frame = np.full((4, 4), 200, dtype=np.uint8)
    np.testing.assert_array_equal(real_decoder(encode_bmp(frame), "image"),
                                  frame)
    wav = encode_wav(np.array([[-32768, 0, 32767]], dtype=np.int16))
    out = real_decoder(wav, "audio")
    assert out.dtype == np.uint8 and out.shape == (1, 3)
    np.testing.assert_array_equal(out[0], [0, 128, 255])
    with pytest.raises(ValueError, match="unknown media container"):
        real_decoder(b"\x89PNG....", "image")


def test_synth_real_media_table_decodable():
    t = synth_real_media_table(n=10, seed=3)
    assert t.num_rows == 10
    for i in range(10):
        payload = t["payload"][i].as_py()
        meta = t["meta"][i].as_py()
        out = real_decoder(payload, t["media_type"][i].as_py())
        if i % 2 == 0:
            assert out.shape == (meta["height"], meta["width"])
        else:
            assert out.shape == (1, meta["width"])


def test_featurize_real_media_end_to_end(ray_session):
    """The actor-pool featurize stage runs the REAL decoder over real
    container bytes; features are valid histograms (rows sum to 1)."""
    import ray.data as rd

    media = rd.from_arrow(synth_real_media_table(n=24, seed=5))
    feats = featurize_media(media, decoder=real_decoder,
                            batch_size=8, concurrency=2)
    t = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in feats.iter_batches(batch_format="pyarrow"))
    assert t.num_rows == 24
    f = np.asarray(t["feature"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False)).reshape(24, FEATURE_DIM)
    np.testing.assert_allclose(f.sum(axis=1), 1.0, atol=1e-5)
