"""Text-analysis functions over a documents-style table.

Everything here is a vectorized pyarrow/NumPy batch transform suitable for
``map_batches(batch_format="pyarrow")``; the SQL-expressible ones are
mirrored exactly by the DuckDB oracles in :mod:`fastcdc_rs_ray.pipelines.queries`
(same explicit character classes on both sides, so the comparison is not at
the mercy of differing ``\\s`` semantics between Python/RE2).

Ops (the text-analysis tier of a training-data pipeline):

- :func:`token_count_batch` — whitespace token counting.
- :func:`quality_batch`    — quality-signal components (chars/words/punct/
  stopwords/upper) as integers plus a derived float score.
- :func:`lang_id_batch`    — stopword-profile language identification
  (deterministic heuristic; no model download).
- :func:`fingerprint_batch` — content-defined document fingerprint: the
  mixed XOR of the document's FastCDC v2020 chunk hashes (rolling-hash
  based, stable under concatenation context, reuses the exact kernel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..cdc import ChunkerConfig, chunk_rows
from ..util import U64, hash_str_array_u64, mix64

# Explicit ASCII whitespace class — duplicated verbatim in the SQL oracle.
WS_CLASS = "[ \t\n\r\f]"
TOKEN_RE = f"[^ \t\n\r\f]+"
PUNCT_CLASS = "[.,;:!?]"

# tiny per-language stopword profiles (top function words); deterministic
# heuristic in the spirit of n-gram/profile language ID.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"],
    "la": ["et", "in", "ut", "ad", "non", "sed", "cum", "est", "qui", "dolor"],
}


def _word_regex(words: list[str]) -> str:
    alt = "|".join(words)
    return f"(^|{WS_CLASS})({alt})({WS_CLASS}|$)"


def _flat_tokens(text: pa.Array) -> tuple[pa.Array, np.ndarray, int]:
    """(flat non-empty token array, row id per token, n_rows): one
    vectorized split pass; identical token set to RE2
    ``regexp_extract_all(text, TOKEN_RE)``."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    parts = pc.split_pattern_regex(text, WS_CLASS + "+")
    flat = parts.flatten()
    keep = pc.not_equal(flat, "")
    row_of = np.repeat(
        np.arange(len(parts), dtype=np.int64), np.diff(parts.offsets.to_numpy())
    )
    return flat.filter(keep), row_of[keep.to_numpy(zero_copy_only=False)], len(parts)


def token_membership_count(text: pa.Array, words: list[str]) -> np.ndarray:
    """Per-row count of tokens that are members of ``words`` — token-level
    semantics (no regex-boundary consumption), mirrored in SQL by
    ``len(list_filter(regexp_extract_all(text, TOKEN_RE), x -> x IN (...)))``."""
    flat, row_of, n = _flat_tokens(text)
    hits = pc.is_in(flat, value_set=pa.array(words, pa.string()))
    hit_rows = row_of[hits.to_numpy(zero_copy_only=False)]
    return np.bincount(hit_rows, minlength=n).astype(np.int64)


def token_count_batch(t: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, n_tokens)."""
    text = t["text"]
    n_tokens = pc.count_substring_regex(text, TOKEN_RE)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
        }
    )


def quality_batch(t: pa.Table) -> pa.Table:
    """documents batch -> integer quality components + float score.

    score = stopword_frac * 0.5 + alpha_frac * 0.5 computed in float64; the
    oracle only checks the integer columns (floats are hash-hostile).
    """
    text = t["text"]
    n_chars = pc.cast(pc.binary_length(text), pa.int64())
    n_words = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_CLASS), pa.int64())
    n_upper = pc.cast(pc.count_substring_regex(text, "[A-Z]"), pa.int64())
    n_stop_np = token_membership_count(text, STOPWORDS["en"])
    n_stop = pa.array(n_stop_np, pa.int64())
    nw = np.maximum(n_words.to_numpy(zero_copy_only=False), 1)
    nc = np.maximum(n_chars.to_numpy(zero_copy_only=False), 1)
    score = (
        0.5 * (n_stop_np / nw)
        + 0.5 * (1.0 - n_punct.to_numpy(zero_copy_only=False) / nc)
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_chars": n_chars,
            "n_words": n_words,
            "n_punct": n_punct,
            "n_upper": n_upper,
            "n_stopwords": n_stop,
            "quality": pa.array(score, pa.float64()),
        }
    )


def lang_id_batch(t: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, lang_pred): argmax stopword-profile score
    (ties broken by language code order, deterministic)."""
    text = t["text"]
    langs = sorted(STOPWORDS)
    scores = np.zeros((len(t), len(langs)), dtype=np.float64)
    nw = np.maximum(
        pc.count_substring_regex(text, TOKEN_RE).to_numpy(zero_copy_only=False), 1
    )
    for j, lang in enumerate(langs):
        scores[:, j] = token_membership_count(text, STOPWORDS[lang]) / nw
    best = np.argmax(scores, axis=1)  # first max wins -> deterministic
    pred = np.array(langs, dtype=object)[best]
    pred[scores.max(axis=1) == 0.0] = "und"
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "lang_pred": pa.array(pred.tolist(), pa.string()),
        }
    )


_FP_CFG = ChunkerConfig(min_size=64, avg_size=256, max_size=1024)


def fingerprint_batch(t: pa.Table, cfg: ChunkerConfig = _FP_CFG) -> pa.Table:
    """documents batch -> (doc_id, fingerprint uint64, n_chunks int64).

    Rolling-hash document fingerprint: FastCDC v2020 chunk hashes of the
    UTF-8 text, each mixed with its ordinal, XOR-combined, plus length.
    Content-defined, so a local edit perturbs only the chunks it touches.
    """
    text = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
    text = pc.cast(text, pa.large_string())
    n = len(text)
    offs = np.frombuffer(text.buffers()[1], dtype=np.int64, count=n + 1 + text.offset)
    offs = offs[text.offset : text.offset + n + 1]
    buf = text.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.empty(0, np.uint8)
    row_idx, hashes, _, lengths = chunk_rows(data, offs.copy(), cfg)
    fp = np.zeros(n, dtype=np.uint64)
    counts = np.zeros(n, dtype=np.int64)
    if len(row_idx):
        # ordinal within each row
        k = len(row_idx)
        first = np.empty(k, dtype=bool)
        first[0] = True
        np.not_equal(row_idx[1:], row_idx[:-1], out=first[1:])
        ordinal = np.arange(k, dtype=np.int64)
        ordinal -= np.maximum.accumulate(np.where(first, ordinal, 0))
        mixed = mix64(hashes ^ (ordinal.astype(np.uint64) + U64(1)))
        np.bitwise_xor.at(fp, row_idx, mixed)
        np.add.at(counts, row_idx, 1)
    doc_len = (offs[1:] - offs[:-1]).astype(np.uint64)
    fp = mix64(fp + doc_len)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "fingerprint": pa.array(fp, pa.uint64()),
            "n_chunks": pa.array(counts, pa.int64()),
        }
    )


def tokenize_hashes(t: pa.Table, text_col: str = "text") -> tuple[np.ndarray, np.ndarray]:
    """(flat token-hash uint64 array, per-row int64 offsets) for a batch.

    Tokens are maximal runs matching TOKEN_RE; each token is hashed with
    the shared order-sensitive string hash.  Used by SimHash and n-gram
    Jaccard; one vectorized split + one vectorized hash pass.
    """
    flat_nz, row_nz, n = _flat_tokens(t[text_col])
    counts = np.bincount(row_nz, minlength=n).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return hash_str_array_u64(flat_nz), offsets


# --------------------------------------------------------------------------
# BPE-ish tokenization + PII redaction (RE2 both sides: pyarrow and DuckDB)
# --------------------------------------------------------------------------

# GPT-2-flavoured pretokenizer, restricted to RE2-safe classes (no \p{} so
# the same literal string runs in pyarrow and DuckDB): contractions,
# space-prefixed letter runs, digit runs, punctuation runs.
BPE_RE = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^ \tA-Za-z0-9]+"

# emails + long digit runs (ids/phones); [REDACTED] marker
PII_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|[0-9]{6,}"
PII_MARK = "[REDACTED]"


def token_count_bpe_batch(t: pa.Table) -> pa.Table:
    """(doc_id, n_bpe_tokens): count of BPE-style pretokens — the
    token-budget estimator a curation pipeline runs before training."""
    text = t["text"].combine_chunks()
    return pa.table({
        "doc_id": t["doc_id"],
        "n_bpe_tokens": pc.cast(
            pc.count_substring_regex(text, BPE_RE), pa.int64()),
    })


def pii_redact_batch(t: pa.Table) -> pa.Table:
    """(doc_id, clean_text, n_pii): vectorized RE2 redaction of emails and
    long digit runs; n_pii counts the matches removed."""
    text = t["text"].combine_chunks()
    return pa.table({
        "doc_id": t["doc_id"],
        "clean_text": pc.replace_substring_regex(
            text, pattern=PII_RE, replacement=PII_MARK),
        "n_pii": pc.cast(pc.count_substring_regex(text, PII_RE), pa.int64()),
    })


def repetition_batch(t: pa.Table) -> pa.Table:
    """(doc_id, top_tok_ppm): the repetition quality signal — ppm share of
    the single most frequent token, integer-exact
    (``max_count * 1e6 // n_tokens``).  Boilerplate/spam pages score high;
    zero-token docs emit no row (matches the SQL oracle's empty group).
    Whole docs are rows, so this is shuffle-free."""
    flat, row_of, n = _flat_tokens(t["text"])
    if len(flat) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "top_tok_ppm": pa.array([], pa.int64())})
    enc = flat.dictionary_encode()
    code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nt = len(enc.dictionary)
    key = row_of * nt + code
    uk, cnt = np.unique(key, return_counts=True)
    rows = uk // nt
    top = np.zeros(n, np.int64)
    np.maximum.at(top, rows, cnt)
    total = np.bincount(row_of, minlength=n).astype(np.int64)
    live = np.flatnonzero(total > 0)
    ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(ids[live], pa.int64()),
        "top_tok_ppm": pa.array(
            (top[live] * 1_000_000) // total[live], pa.int64()),
    })


def compressibility_batch(t: pa.Table, level: int = 6) -> pa.Table:
    """Compression-ratio quality signal (the Gopher-family filter the
    repetition signal approximates): zlib-compressed size per document in
    exact integer permille of the raw UTF-8 size.  Highly compressible
    text (ratio far below prose's ~350-600 permille) is boilerplate /
    repetition; near-1000 is noise or already-compressed junk — both ends
    get filtered in curation.

    Per-doc zlib calls dominate in C (the Python loop dispatches one call
    per row over the zero-copy values buffer); deterministic for a given
    zlib level, so the output is retry/partition-invariant.  Zero
    shuffle — docs are whole rows.

    Output: (doc_id, raw_bytes, zlib_bytes, ratio_pm).
    """
    import zlib

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("raw_bytes", pa.int64()),
         ("zlib_bytes", pa.int64()), ("ratio_pm", pa.int64())]
    )
    if len(t) == 0:
        return out_schema.empty_table()
    text = t["text"].combine_chunks()
    if pa.types.is_large_string(text.type):
        odt, ow = np.int64, 8
    else:
        odt, ow = np.int32, 4
    # zero-copy spans over the UTF-8 values buffer
    bufs = text.buffers()
    off = np.frombuffer(bufs[1], dtype=odt, count=len(text) + 1,
                        offset=text.offset * ow)
    mv = memoryview(bufs[2])
    raw = (off[1:] - off[:-1]).astype(np.int64)
    comp = np.empty(len(text), dtype=np.int64)
    for i in range(len(text)):
        comp[i] = len(zlib.compress(mv[off[i]:off[i + 1]], level))
    denom = np.maximum(raw, 1)
    return pa.table(
        {
            "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
            "raw_bytes": pa.array(raw, pa.int64()),
            "zlib_bytes": pa.array(comp, pa.int64()),
            "ratio_pm": pa.array(comp * 1000 // denom, pa.int64()),
        }
    ).cast(out_schema)
