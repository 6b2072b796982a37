"""Fast vectorized synthetic transcript corpus (benchmark scale).

Generates hundreds of MB of transcript rows in seconds: word indices are
sampled in one NumPy pass and texts are assembled with
``pyarrow.compute.binary_join`` over a ListArray of vocab-takes — no
per-row Python.  A ``dup_frac`` fraction of conversations get a planted
near-duplicate twin (one turn's words resampled), so the LSH/clustering
stages have real work at benchmark scale.

Deterministic in all parameters; cached on disk by a params fingerprint
(:func:`ensure_corpus`) so repeated bench runs skip generation.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_ROLES = np.array(["user", "assistant", "tool"])
_EPOCH_US = 1_700_000_000_000_000

# ~200-word vocabulary: realistic token-length distribution
_VOCAB = (
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt labore "
    "dolore magna aliqua enim minim veniam quis nostrud exercitation ullamco "
    "laboris nisi aliquip commodo consequat duis aute irure reprehenderit "
    "voluptate velit esse cillum fugiat nulla pariatur excepteur sint "
    "occaecat cupidatat proident sunt culpa officia deserunt mollit anim "
    "laborum model agent tool call response stream token batch shuffle "
    "dataset parquet arrow vector hash chunk boundary signature band salt "
    "cluster partition block actor task worker driver object store spill "
    "backpressure lineage checkpoint manifest metric throughput latency "
    "scale node cpu memory network disk read write map filter group join "
    "sort limit union sample window aggregate reduce combine emit probe "
    "query oracle verify recall precision score rank neighbor embed index"
).split()


def synth_corpus_slice(
    conv_lo: int,
    conv_hi: int,
    turns_lo: int = 4,
    turns_hi: int = 12,
    words_lo: int = 30,
    words_hi: int = 130,
    dup_frac: float = 0.2,
    seed: int = 17,
) -> pa.Table:
    """Transcript rows for conversations [conv_lo, conv_hi), plus twins.

    Twin rule: conversations with conv_no % round(1/dup_frac) == 0 get a
    'twin-%08d' copy whose middle turn is resampled (a near-duplicate).
    Per-slice RNG is seeded by (seed, conv_lo) so slices are independent
    and the corpus is reproducible for any slicing.
    """
    rng = np.random.default_rng((seed, conv_lo))
    n_convs = conv_hi - conv_lo
    vocab = pa.array(_VOCAB, pa.string())

    n_turns = rng.integers(turns_lo, turns_hi + 1, n_convs)
    total_turns = int(n_turns.sum())
    words_per_turn = rng.integers(words_lo, words_hi + 1, total_turns)
    total_words = int(words_per_turn.sum())
    widx = rng.integers(0, len(_VOCAB), total_words)

    # twins: copy selected conversations, resample the middle turn's words
    every = max(2, int(round(1.0 / dup_frac))) if dup_frac > 0 else 0
    conv_no = np.arange(conv_lo, conv_hi)
    twin_mask = (conv_no % every == 0) if every else np.zeros(n_convs, bool)
    tsel = np.flatnonzero(twin_mask)

    turn_conv = np.repeat(np.arange(n_convs), n_turns)  # conv ordinal per turn
    turn_off = np.concatenate([[0], np.cumsum(n_turns)])
    word_off = np.concatenate([[0], np.cumsum(words_per_turn)])

    # assemble base texts: ListArray(vocab.take(widx)) joined by space
    def build_texts(word_idx: np.ndarray, per_turn: np.ndarray) -> pa.Array:
        values = vocab.take(pa.array(word_idx, pa.int64()))
        offsets = np.concatenate([[0], np.cumsum(per_turn)]).astype(np.int64)
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int64()), values)
        return pc.binary_join(lst, " ")

    base_texts = build_texts(widx, words_per_turn)

    # twin turn data: same word indices, except each twin's middle turn
    twin_turn_counts = n_turns[tsel]
    t_word_counts = []
    t_word_idx = []
    for ci in tsel:
        ts_, te_ = turn_off[ci], turn_off[ci + 1]
        mid = ts_ + (te_ - ts_) // 2
        for t in range(ts_, te_):
            wlo, whi = word_off[t], word_off[t + 1]
            t_word_counts.append(whi - wlo)
            if t == mid:
                t_word_idx.append(rng.integers(0, len(_VOCAB), whi - wlo))
            else:
                t_word_idx.append(widx[wlo:whi])
    if t_word_idx:
        twin_texts = build_texts(
            np.concatenate(t_word_idx), np.asarray(t_word_counts, np.int64)
        )
    else:
        twin_texts = pa.array([], pa.string())

    def rows(prefix: str, conv_ords: np.ndarray, counts: np.ndarray,
             texts: pa.Array, ts_off: int) -> pa.Table:
        conv_per_turn = np.repeat(conv_ords + conv_lo, counts)
        tidx = (
            np.arange(len(texts)) - np.repeat(np.concatenate([[0], np.cumsum(counts)])[:-1], counts)
        ).astype(np.int32)
        ids = pc.binary_join_element_wise(
            pa.array(np.full(len(texts), prefix + "-"), pa.string()),
            pc.utf8_lpad(
                pc.cast(pa.array(conv_per_turn, pa.int64()), pa.string()), 8, "0"
            ),
            "",
        )
        roles = _ROLES[tidx % 3]
        tools = np.where(roles == "tool", "lookup", "")
        ts = (
            conv_per_turn.astype(np.int64) * 60_000_000
            + tidx.astype(np.int64) * 1_000_000
            + _EPOCH_US
            + ts_off
        ).astype("datetime64[us]")
        return pa.table(
            {
                "conv_id": ids,
                "turn_idx": pa.array(tidx, pa.int32()),
                "role": pa.array(roles, pa.string()),
                "text": texts,
                "tool": pa.array(tools, pa.string()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )

    base = rows("conv", np.arange(n_convs), n_turns, base_texts, 0)
    twins = rows("twin", tsel, twin_turn_counts, twin_texts, 500_000)
    return pa.concat_tables([base, twins])


def ensure_corpus(
    root: str,
    n_convs: int = 50_000,
    slices: int = 16,
    **kwargs,
) -> str:
    """Write (once) a sliced parquet corpus under ``root``; returns the dir.

    A params fingerprint guards staleness; concurrent/repeat calls with the
    same params reuse the cached files.
    """
    params = {"n_convs": n_convs, "slices": slices, **kwargs}
    os.makedirs(root, exist_ok=True)
    marker = os.path.join(root, "_params.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == params:
                return root
        for name in os.listdir(root):
            if name.endswith(".parquet"):
                os.remove(os.path.join(root, name))
    per = (n_convs + slices - 1) // slices
    ranges = [
        (s, s * per, min((s + 1) * per, n_convs))
        for s in range(slices)
        if s * per < n_convs
    ]
    if _write_slices_parallel(root, ranges, kwargs) is None:
        for s, lo, hi in ranges:
            _write_slice(root, s, lo, hi, kwargs)
    with open(marker, "w") as f:
        json.dump(params, f)
    return root


def _write_slice(root: str, s: int, lo: int, hi: int, kwargs: dict) -> None:
    t = synth_corpus_slice(lo, hi, **kwargs)
    pq.write_table(t, os.path.join(root, f"part-{s:04d}.parquet"),
                   row_group_size=1 << 30)  # one row group: a block never splits a conversation


def _write_slices_parallel(root: str, ranges: list, kwargs: dict):
    """Generate slices as Ray tasks (each writes its own file).  Returns
    None when Ray is unavailable so the caller falls back to serial."""
    try:
        import ray
    except Exception:
        return None
    own_session = not ray.is_initialized()
    if own_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    @ray.remote
    def gen(s, lo, hi):
        _write_slice(root, s, lo, hi, kwargs)
        return s

    try:
        ray.get([gen.remote(s, lo, hi) for s, lo, hi in ranges])
    finally:
        if own_session:
            ray.shutdown()
    return True
