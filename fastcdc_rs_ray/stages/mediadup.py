"""Media near-duplicate tier: perceptual image hash + audio fingerprint.

The multimodal counterpart of the text dedup tiers (exact / normalized /
MinHash): images dedup by a DCT perceptual hash (pHash — Zauner 2010,
public method), audio by a spectral energy-contour fingerprint
(Haitsma-Kalker-family binary fingerprint) — both 64-bit signatures whose
Hamming distance tracks perceptual similarity, so the candidate search
reuses the simhash tier's 4x16-bit pigeonhole exchange verbatim
(stages/dedup.py `simhash_pairs`: distance <= 3 implies one block equal).

Everything runs through the REAL containers (stages/multimodal.py BMP/WAV
codecs): derive payload bytes deterministically from the documents table
(equal text => byte-identical container => identical signature — the
falsifiable gate `media_dup_gate` counts exactly that), decode with the
pure-numpy parsers, hash with per-item state-free float kernels (a DCT
basis matrix held once per actor in ``__init__``).

Scale shape: derivation/decode/hash are embarrassingly parallel
map_batches (payloads never leave their block); the only exchanges are
the pigeonhole pair search (u64 signature rows) and, for the gate, one
text-hash-keyed exchange of (u64, u64, u64) rows.  No stage is
corpus-sized on the wire.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import hash_str_array_u64
from .multimodal import decode_bmp, decode_wav, encode_bmp, encode_wav

IMG_SIDE = 64          # generated image side (pooled 2x2 -> 32x32 for DCT)
_N_FRAMES = 9          # 9 frames x 8 band-diffs -> 8x8 = 64 HK bits
_N_BANDS = 9
AUDIO_SAMPLES = _N_FRAMES * 1024


# --------------------------------------------------------------------------
# deterministic documents -> media derivation (per-row, batch-safe)
# --------------------------------------------------------------------------


def _tile_bytes(text: str, n: int) -> np.ndarray:
    b = np.frombuffer(text.encode("utf-8") or b"\x00", dtype=np.uint8)
    reps = -(-n // len(b))
    return np.tile(b, reps)[:n]


COPY_ID_OFFSET = 10_000_000


def with_planted_copies(docs_ds, every: int = 10):
    """documents -> documents plus a byte-identical copy of every
    ``doc_id % every == 0`` row at ``doc_id + COPY_ID_OFFSET`` — the
    deterministic planted-duplicate derivation (house pattern of the
    transcript twins, sources/transcripts.py) that keeps the media dedup
    tier and its gate non-vacuous at every scale factor (the raw
    documents table has no byte-identical texts below sf0.1).  Mirrored
    exactly by the ``media_dup_gate`` oracle SQL."""
    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        # planted-copy ids must stay collision-free with real doc_ids
        # (a collision would silently alias two docs; advice r02)
        if len(ids) and int(ids.max()) >= COPY_ID_OFFSET:
            raise ValueError(
                f"with_planted_copies: doc_id >= COPY_ID_OFFSET "
                f"({COPY_ID_OFFSET}) — raise the offset")
        txt = t["text"].combine_chunks().cast(pa.string())
        base = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": txt})
        sel = np.flatnonzero(ids % every == 0)
        if len(sel) == 0:
            return base
        copies = pa.table({
            "doc_id": pa.array(ids[sel] + COPY_ID_OFFSET, pa.int64()),
            "text": txt.take(pa.array(sel, pa.int64())),
        })
        return pa.concat_tables([base, copies])

    return docs_ds.map_batches(plant, batch_format="pyarrow")


def docs_to_images(t: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text") -> pa.Table:
    """documents batch -> (doc_id, payload) of real 24-bit BMP bytes whose
    64x64 grayscale pixels tile the doc's UTF-8 bytes.  Equal text =>
    byte-identical BMP (the gate's lever)."""
    ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    txt = np.asarray(t[text_col].combine_chunks(), dtype=object)
    payloads = [
        encode_bmp(_tile_bytes(s, IMG_SIDE * IMG_SIDE).reshape(IMG_SIDE, IMG_SIDE))
        for s in txt
    ]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
    })


def docs_to_audio(t: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """documents batch -> (doc_id, payload) of real 16-bit PCM WAV bytes:
    samples are the doc's UTF-8 bytes centered and scaled to int16."""
    ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    txt = np.asarray(t[text_col].combine_chunks(), dtype=object)
    payloads = []
    for s in txt:
        b = _tile_bytes(s, AUDIO_SAMPLES)
        samples = ((b.astype(np.int16) - 128) << 8)[None, :]
        payloads.append(encode_wav(samples))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
    })


# --------------------------------------------------------------------------
# signatures (actor-pool kernels; basis matrices built once per actor)
# --------------------------------------------------------------------------


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    return np.cos(np.pi * (i + 0.5) * k / n)


def phash_frame(frame: np.ndarray, dct: np.ndarray | None = None) -> int:
    """Grayscale uint8 frame -> 64-bit DCT perceptual hash: 2x-mean-pool
    to 32x32, 2D DCT-II, take the 8x8 low-frequency corner, bit = coef >
    median(corner).  Per-item float math — deterministic regardless of
    batch/partition boundaries."""
    h, w = frame.shape
    img = frame[: h & ~1, : w & ~1].astype(np.float64)
    img = img.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    if img.shape != (32, 32):  # generic inputs: area-mean to 32x32 via crop/tile
        yy = (np.arange(32) * img.shape[0]) // 32
        xx = (np.arange(32) * img.shape[1]) // 32
        img = img[np.ix_(yy, xx)]
    d = _dct_matrix(32) if dct is None else dct
    coef = (d @ img @ d.T)[:8, :8].reshape(-1)
    bits = coef > np.median(coef)
    return int(np.packbits(bits).view(">u8")[0])


def audio_contour_hash(samples: np.ndarray) -> int:
    """(channels, n) int16 PCM -> 64-bit Haitsma-Kalker binary
    fingerprint: 9 non-overlapping 1024-sample frames x 9 frequency
    bands; bit(n, m) = sign of the time-and-frequency double difference
    E(n,m) - E(n,m+1) - (E(n-1,m) - E(n-1,m+1)) for n in 1..8, m in
    0..7 (the published scheme's bit derivation) — discriminative on
    noise-like clips where absolute-energy contours collapse, exact on
    byte-identical clips."""
    mono = samples.astype(np.float64).mean(axis=0)
    need = _N_FRAMES * 1024
    if len(mono) < need:
        mono = np.pad(mono, (0, need - len(mono)))
    frames = mono[:need].reshape(_N_FRAMES, 1024)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (9, 513)
    bands = spec[:, 1:505].reshape(_N_FRAMES, _N_BANDS, 56).sum(axis=2)
    fdiff = bands[:, :-1] - bands[:, 1:]        # (9, 8) frequency diff
    bits = (fdiff[1:] - fdiff[:-1]) > 0         # (8, 8) double diff
    return int(np.packbits(bits.reshape(-1)).view(">u8")[0])


class ImagePHasher:
    """Actor-pool stage: decode BMP payloads, emit (doc_id, sig) u64
    pHash rows.  The 32x32 DCT basis is built once per actor."""

    def __init__(self) -> None:
        self.dct = _dct_matrix(32)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        pay = t["payload"].combine_chunks()
        sigs = np.fromiter(
            (phash_frame(decode_bmp(pay[i].as_py()), self.dct)
             for i in range(len(pay))),
            dtype=np.uint64, count=len(pay))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array(sigs, pa.uint64()),
        })


class AudioFingerprinter:
    """Actor-pool stage: decode WAV payloads, emit (doc_id, sig) u64
    energy-contour rows."""

    def __init__(self) -> None:
        pass

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        pay = t["payload"].combine_chunks()
        sigs = np.fromiter(
            (audio_contour_hash(decode_wav(pay[i].as_py()))
             for i in range(len(pay))),
            dtype=np.uint64, count=len(pay))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array(sigs, pa.uint64()),
        })


# --------------------------------------------------------------------------
# pipelines
# --------------------------------------------------------------------------


def _sig_pairs(sig_ds, max_hamming: int, num_partitions: int):
    """(doc_id, sig) -> distinct (src, dst) pairs with hamming <=
    max_hamming, via the simhash tier's 4x16-bit pigeonhole exchange."""
    from .dedup import simhash_pairs

    renamed = sig_ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "simhash": t["sig"]}),
        batch_format="pyarrow")
    return simhash_pairs(renamed, max_hamming=max_hamming,
                         num_partitions=num_partitions)


def phash_signatures(docs_ds, batch_size: int = 64, concurrency=(2, 8)):
    imgs = docs_ds.map_batches(docs_to_images, batch_format="pyarrow")
    return imgs.map_batches(ImagePHasher, batch_size=batch_size,
                            batch_format="pyarrow", concurrency=concurrency)


def audio_signatures(docs_ds, batch_size: int = 64, concurrency=(2, 8)):
    clips = docs_ds.map_batches(docs_to_audio, batch_format="pyarrow")
    return clips.map_batches(AudioFingerprinter, batch_size=batch_size,
                             batch_format="pyarrow", concurrency=concurrency)


def phash_dups(docs_ds, max_hamming: int = 3, num_partitions: int = 16):
    """documents -> (src, dst) image near-dup pairs by pHash Hamming."""
    return _sig_pairs(phash_signatures(docs_ds), max_hamming, num_partitions)


def audio_dups(docs_ds, max_hamming: int = 3, num_partitions: int = 16):
    """documents -> (src, dst) audio near-dup pairs by contour Hamming."""
    return _sig_pairs(audio_signatures(docs_ds), max_hamming, num_partitions)


def _match_count_partial(t: pa.Table) -> pa.Table:
    """(th, psig, asig) block -> one (n_text_pairs, n_phash_match,
    n_audio_match) partial row; groups are complete per block because the
    caller keyed the exchange on th.  Module-level so the falsifiability
    pytest can drive it with planted signature mismatches."""
    if len(t) == 0:
        return pa.table({"n_text_pairs": pa.array([], pa.int64()),
                         "n_phash_match": pa.array([], pa.int64()),
                         "n_audio_match": pa.array([], pa.int64())})
    th = t["th"].combine_chunks().to_numpy()
    ps = t["psig"].combine_chunks().to_numpy()
    asig = t["asig"].combine_chunks().to_numpy()
    order = np.argsort(th, kind="stable")
    th, ps, asig = th[order], ps[order], asig[order]
    starts = np.concatenate(
        [[0], np.flatnonzero(th[1:] != th[:-1]) + 1, [len(th)]])
    npairs = nph = nau = 0
    for s, e in zip(starts[:-1], starts[1:]):
        g = e - s
        if g < 2:
            continue
        npairs += g * (g - 1) // 2
        _, pc_ = np.unique(ps[s:e], return_counts=True)
        nph += int((pc_ * (pc_ - 1) // 2).sum())
        _, ac_ = np.unique(asig[s:e], return_counts=True)
        nau += int((ac_ * (ac_ - 1) // 2).sum())
    return pa.table({"n_text_pairs": pa.array([npairs], pa.int64()),
                     "n_phash_match": pa.array([nph], pa.int64()),
                     "n_audio_match": pa.array([nau], pa.int64())})


def media_dup_gate(docs_ds, num_partitions: int = 8):
    """Falsifiable 1-row gate: every EQUAL-TEXT doc pair must produce
    byte-identical media through the real codecs and therefore identical
    pHash AND audio fingerprints.  Output (n_text_pairs, n_phash_match,
    n_audio_match) — the oracle derives n_text_pairs from a SQL text
    self-join and expects both match counts equal to it.  A broken
    encode/decode roundtrip, a non-deterministic hash kernel, or a
    decode that reads stale buffer state all drive a match count below
    n_text_pairs."""
    def sigs(t: pa.Table) -> pa.Table:
        th = hash_str_array_u64(t["text"].combine_chunks())
        p = ImagePHasher()(docs_to_images(t))
        a = AudioFingerprinter()(docs_to_audio(t))
        return pa.table({
            "th": pa.array(th, pa.uint64()),
            "psig": p["sig"],
            "asig": a["sig"],
        })

    rows = docs_ds.map_batches(sigs, batch_format="pyarrow")
    rows = rows.repartition(num_blocks=num_partitions, keys=["th"])

    import pyarrow.compute as pc
    import ray

    parts = rows.map_batches(_match_count_partial, batch_format="pyarrow",
                             batch_size=None).to_arrow_refs()
    # empty exchange partitions pass through with the upstream schema;
    # keep only real partial rows
    tables = [t for t in map(ray.get, parts)
              if "n_text_pairs" in t.column_names]
    tbl = pa.concat_tables(tables)
    return pa.table({
        c: pa.array([int(pc.sum(tbl[c]).as_py() or 0)], pa.int64())
        for c in ("n_text_pairs", "n_phash_match", "n_audio_match")
    })


# --------------------------------------------------------------------------
# video tier: multi-frame containers, per-frame pHash, frame-set Jaccard
# --------------------------------------------------------------------------

VIDEO_FRAMES = 4


def encode_bmp_sequence(frames: list[np.ndarray]) -> bytes:
    """Real-codec multi-frame container: 4-byte little-endian frame
    count + concatenated genuine 24-bit BMPs (each self-sized via its
    header).  Stands in for a video container while keeping a REAL
    image codec in the decode loop — compressed video (H.264 etc.)
    would slot into the same seam when a codec lib exists."""
    import struct

    return struct.pack("<I", len(frames)) + b"".join(
        encode_bmp(f) for f in frames)


def decode_bmp_sequence(data: bytes) -> list[np.ndarray]:
    import struct

    n = struct.unpack_from("<I", data, 0)[0]
    pos, out = 4, []
    for _ in range(n):
        size = struct.unpack_from("<I", data, pos + 2)[0]
        out.append(decode_bmp(data[pos: pos + size]))
        pos += size
    return out


def docs_to_videos(t: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text") -> pa.Table:
    """documents batch -> (doc_id, payload) multi-frame containers:
    frame f tiles the doc's UTF-8 bytes rolled by f * 64 (a synthetic
    'pan'), so equal text => byte-identical container and frame set."""
    ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    txt = np.asarray(t[text_col].combine_chunks(), dtype=object)
    payloads = []
    for s in txt:
        base = _tile_bytes(s, IMG_SIDE * IMG_SIDE)
        frames = [np.roll(base, -64 * f).reshape(IMG_SIDE, IMG_SIDE)
                  for f in range(VIDEO_FRAMES)]
        payloads.append(encode_bmp_sequence(frames))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
    })


class VideoPHasher:
    """Actor-pool stage: decode frame sequences, emit one (doc_id, elem)
    row per DISTINCT frame pHash (the clip's fingerprint set)."""

    def __init__(self) -> None:
        self.dct = _dct_matrix(32)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        pay = t["payload"].combine_chunks()
        out_id, out_el = [], []
        for i in range(len(pay)):
            hs = {phash_frame(f, self.dct)
                  for f in decode_bmp_sequence(pay[i].as_py())}
            out_id.extend([int(ids[i])] * len(hs))
            out_el.extend(sorted(hs))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "elem": pa.array(np.asarray(out_el, np.uint64), pa.uint64()),
        })


def video_dups(docs_ds, tau_milli: int = 500, num_partitions: int = 16,
               batch_size: int = 64, concurrency=(2, 8)):
    """documents -> (src, dst) video near-dup pairs by frame-pHash-set
    Jaccard >= tau_milli/1000 — keyframe-set overlap, the standard video
    dedup evidence.  Pairing/combine reuses the ngram tier's discipline:
    explode with set_size riding along, KR(elem), per-group pairs,
    KR(src, dst) exact count + integer cross-multiplied keep predicate
    (1000*c >= tau*(na+nb-c)); the payloads never leave their block."""
    vids = docs_ds.map_batches(docs_to_videos, batch_format="pyarrow")
    elems = vids.map_batches(VideoPHasher, batch_size=batch_size,
                             batch_format="pyarrow", concurrency=concurrency)

    def with_size(t: pa.Table) -> pa.Table:
        # rows of one doc are contiguous (emitted per payload above) but
        # recount defensively per block
        if len(t) == 0:
            return pa.table({"elem": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "set_size": pa.array([], pa.int64())})
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        el = t["elem"].combine_chunks().to_numpy()
        uniq, inv, cnt = np.unique(ids, return_inverse=True,
                                   return_counts=True)
        return pa.table({
            "elem": pa.array(el, pa.uint64()),
            "doc_id": pa.array(ids, pa.int64()),
            "set_size": pa.array(cnt[inv], pa.int64()),
        })

    rows = elems.map_batches(with_size, batch_format="pyarrow",
                             batch_size=None)
    rows = rows.repartition(num_blocks=num_partitions, keys=["elem"])

    def emit_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
            "src_size": pa.array([], pa.int64()),
            "dst_size": pa.array([], pa.int64())})
        n = len(t)
        if n < 2:
            return empty
        el = t["elem"].combine_chunks().to_numpy()
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        sz = t["set_size"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, el))
        el, ids, sz = el[order], ids[order], sz[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(el[1:] != el[:-1]) + 1, [n]])
        src_l, dst_l, ss_l, ds_l = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            g = e - s
            if g < 2 or g > 4096:
                continue
            gi, gz = ids[s:e], sz[s:e]
            ii, jj = np.triu_indices(g, k=1)
            src_l.append(gi[ii]); dst_l.append(gi[jj])
            ss_l.append(gz[ii]); ds_l.append(gz[jj])
        if not src_l:
            return empty
        return pa.table({
            "src": pa.array(np.concatenate(src_l), pa.int64()),
            "dst": pa.array(np.concatenate(dst_l), pa.int64()),
            "src_size": pa.array(np.concatenate(ss_l), pa.int64()),
            "dst_size": pa.array(np.concatenate(ds_l), pa.int64()),
        })

    pairs = rows.map_batches(emit_pairs, batch_format="pyarrow",
                             batch_size=None)
    pairs = pairs.repartition(num_blocks=max(4, num_partitions // 4),
                              keys=["src", "dst"])

    def combine_filter(t: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        n = len(t)
        if n == 0 or "src" not in t.column_names:
            return empty
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        a = t["src_size"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["dst_size"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst, a, b = src[order], dst[order], a[order], b[order]
        new = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        firsts = np.concatenate([[0], np.flatnonzero(new) + 1])
        c = np.diff(np.concatenate([firsts, [n]])).astype(np.int64)
        av, bv = a[firsts], b[firsts]
        keep = firsts[1000 * c >= tau_milli * (av + bv - c)]
        return pa.table({"src": pa.array(src[keep], pa.int64()),
                         "dst": pa.array(dst[keep], pa.int64())})

    return pairs.map_batches(combine_filter, batch_format="pyarrow",
                             batch_size=None)
