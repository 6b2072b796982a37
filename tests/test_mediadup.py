"""Media near-dup tier: pHash, audio fingerprint, planted-copy gate.

Covers: kernel determinism through the real BMP/WAV codecs, exact-copy
pairing at Hamming 0, perturbation robustness, unrelated separation,
the planted-copy derivation arithmetic, the gate's expected counts, and
the gate's FALSIFIABILITY (planted signature mismatch lowers the match
count)."""

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.mediadup import (
    AUDIO_SAMPLES,
    COPY_ID_OFFSET,
    IMG_SIDE,
    _match_count_partial,
    _tile_bytes,
    audio_contour_hash,
    audio_dups,
    media_dup_gate,
    phash_dups,
    phash_frame,
    with_planted_copies,
)
from fastcdc_rs_ray.stages.multimodal import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)

LONG_A = "the quick brown fox jumps over the lazy dog " * 30
LONG_B = "zzz completely different content with other words entirely 12345 " * 25


def _img_hash(text):
    img = _tile_bytes(text, IMG_SIDE * IMG_SIDE).reshape(IMG_SIDE, IMG_SIDE)
    return phash_frame(decode_bmp(encode_bmp(img)))


def _audio_hash(text):
    b = _tile_bytes(text, AUDIO_SAMPLES)
    s = ((b.astype(np.int16) - 128) << 8)[None, :]
    return audio_contour_hash(decode_wav(encode_wav(s)))


def test_kernels_deterministic_and_discriminative():
    assert _img_hash(LONG_A) == _img_hash(LONG_A)
    assert _audio_hash(LONG_A) == _audio_hash(LONG_A)
    assert bin(_img_hash(LONG_A) ^ _img_hash(LONG_B)).count("1") > 10
    assert bin(_audio_hash(LONG_A) ^ _audio_hash(LONG_B)).count("1") > 10


def test_phash_robust_to_small_pixel_noise():
    img = _tile_bytes(LONG_A, IMG_SIDE * IMG_SIDE).reshape(IMG_SIDE, IMG_SIDE)
    pert = img.copy()
    pert[::16, ::16] = np.minimum(pert[::16, ::16].astype(int) + 2, 255).astype(np.uint8)
    h1 = phash_frame(decode_bmp(encode_bmp(img)))
    h2 = phash_frame(decode_bmp(encode_bmp(pert)))
    assert bin(h1 ^ h2).count("1") <= 3


def _docs(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_planted_copies_and_pair_queries(ray_session):
    import ray.data as rd

    texts = [LONG_A, LONG_B, "short one " * 40, "another body of text " * 20,
             "fifth distinct payload " * 22] * 4  # ids 0..19
    ds = rd.from_arrow(_docs(texts))
    planted = with_planted_copies(ds, every=10)  # copies of ids 0 and 10
    assert planted.count() == 22

    for fn in (phash_dups, audio_dups):
        pairs = fn(with_planted_copies(ds, every=10), num_partitions=4).to_pandas()
        got = set(zip(pairs["src"], pairs["dst"]))
        # ids 0,5,10,15 share LONG_A; copies at 0+OFF, 10+OFF join the family
        family = [0, 5, 10, 15, COPY_ID_OFFSET, COPY_ID_OFFSET + 10]
        for i, a in enumerate(family):
            for b in family[i + 1:]:
                assert (min(a, b), max(a, b)) in got, (fn.__name__, a, b)


def test_media_dup_gate_counts(ray_session):
    import ray.data as rd

    texts = [LONG_A, LONG_B, LONG_A, "unique " * 50]  # one dup pair pre-plant
    ds = rd.from_arrow(_docs(texts))
    out = media_dup_gate(with_planted_copies(ds, every=10)).to_pandas()
    # corpus: texts + copy of id 0 -> LONG_A count 3 => C(3,2)=3 pairs
    assert out.loc[0, "n_text_pairs"] == 3
    assert out.loc[0, "n_phash_match"] == 3
    assert out.loc[0, "n_audio_match"] == 3


def test_gate_falsifiable_on_signature_mismatch():
    # same text-hash group, one corrupted pHash: match count must drop
    t = pa.table({
        "th": pa.array([7, 7, 7, 9], pa.uint64()),
        "psig": pa.array([1, 1, 2, 5], pa.uint64()),   # one corrupted
        "asig": pa.array([4, 4, 4, 5], pa.uint64()),
    })
    out = _match_count_partial(t).to_pydict()
    assert out["n_text_pairs"] == [3]
    assert out["n_phash_match"] == [1]   # < 3: gate would FAIL vs oracle
    assert out["n_audio_match"] == [3]


def test_video_roundtrip_and_dups(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.mediadup import (
        VIDEO_FRAMES,
        decode_bmp_sequence,
        docs_to_videos,
        video_dups,
    )

    # container roundtrip: frames survive encode->decode exactly
    t = _docs([LONG_A])
    payload = docs_to_videos(t)["payload"][0].as_py()
    frames = decode_bmp_sequence(payload)
    assert len(frames) == VIDEO_FRAMES
    base = _tile_bytes(LONG_A, IMG_SIDE * IMG_SIDE)
    assert (frames[0].reshape(-1) == base).all()
    assert (frames[1].reshape(-1) == np.roll(base, -64)).all()

    # pairing: exact copies pair; unrelated don't
    texts = [LONG_A, LONG_B, LONG_A, "third body of text " * 30]
    pairs = video_dups(rd.from_arrow(_docs(texts)),
                       num_partitions=4).to_pandas()
    got = set(zip(pairs["src"], pairs["dst"]))
    assert (0, 2) in got
    assert all(p == (0, 2) for p in got)
