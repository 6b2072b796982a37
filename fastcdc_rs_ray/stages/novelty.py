"""Corpus-novelty operators: duplication measured over arrival time.

Two conversation-level exact-duplication reports a crawl/ingest pipeline
runs between snapshots (reference has no counterpart — its universe is one
byte stream; these operate on the BASELINE.json ``input_hint`` table):

- :func:`novelty_curve` — the crawl-over-time novelty rate: per arrival
  time bucket, how many conversations are the FIRST occurrence of their
  full text vs repeats of something already seen.  The declining novel
  fraction over successive crawls is the signal that drives re-crawl
  scheduling and dedup budgeting.

- :func:`dup_family_sizes` — the duplicate family-size histogram: for each
  family size g (count of conversations sharing one exact full text), how
  many families and how many conversations.  n_convs - n_families summed
  over the histogram is exactly the number of rows exact dedup would drop;
  the tail (large g) is the boilerplate mass.

Identity is the full turn-ordered conversation text.  Both operators share
one derivation: a conv_id-keyed exchange of (conv_id, turn_idx, turn-hash,
ts) rows — never text — then a per-partition position-weighted hash fold
per conversation (two conversations collide only on a 64-bit hash
collision; the DuckDB oracle groups by the exact string_agg form, so the
gate would catch a collision at test scale).  A second, hash-keyed
exchange of one row per conversation completes each family; outputs are
time-bucket- or family-size-sized.

Scale shape: exchange 1 moves ~24 bytes/turn; exchange 2 moves 16
bytes/conversation; no stage holds more than a block.  At 10^12 turns the
widest exchange is the conv-keyed one — the same exchange the assemble
stage already pays, and conversation-contiguous input skips it entirely
(``pre_partitioned`` contract, stages/assemble.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import U64, hash_str_array_u64, mix64

#: novelty_curve arrival bucket width (microseconds) — one minute
BUCKET_US = 60_000_000


def _project_turn_hashes(t: pa.Table) -> pa.Table:
    """Block-local projection: text leaves the block as one u64 per turn."""
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "th": pa.array(hash_str_array_u64(t["text"]), pa.uint64()),
            "ts_us": pc.cast(pc.cast(t["ts"], pa.int64()), pa.int64()),
        }
    )


def _conv_hash_rows(t: pa.Table) -> pa.Table:
    """Per-partition reduce after the conv_id exchange: every conversation
    is complete here.  conv_hash = mix64 of the position-weighted sum of
    per-turn hashes (order-sensitive through the turn_idx weight, fully
    vectorized); ts0 = min ts."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "conv_hash": pa.array([], pa.uint64()),
                "ts0_us": pa.array([], pa.int64()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object)
    tix = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    th = t["th"].combine_chunks().to_numpy(zero_copy_only=False)
    ts = t["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)

    order = np.lexsort((tix, cid))
    cid, tix, th, ts = cid[order], tix[order], th[order], ts[order]
    cu = cid.astype("U")
    starts = np.flatnonzero(
        np.concatenate([[True], cu[1:] != cu[:-1]])
    )
    # position weight: a distinct odd multiplier per turn index, so a swap
    # of two unequal turns changes the sum
    w = mix64(tix.astype(np.uint64)) | U64(1)
    term = mix64(th * w)
    conv_sum = np.add.reduceat(term, starts)
    conv_hash = mix64(conv_sum)
    ts0 = np.minimum.reduceat(ts, starts)
    return pa.table(
        {
            "conv_id": pa.array(cid[starts].tolist(), pa.string()),
            "conv_hash": pa.array(conv_hash, pa.uint64()),
            "ts0_us": pa.array(ts0.astype(np.int64), pa.int64()),
        }
    )


def conv_identity_rows(turns, num_partitions: int = 16):
    """(conv_id, conv_hash, ts0_us) — one row per conversation, full-text
    identity as a u64, first-turn arrival time.  The shared derivation of
    :func:`novelty_curve` and :func:`dup_family_sizes`."""
    keyed = turns.map_batches(_project_turn_hashes, batch_format="pyarrow")
    keyed = keyed.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return keyed.map_batches(
        _conv_hash_rows, batch_format="pyarrow", batch_size=None
    )


# --------------------------------------------------------------------------
# novelty_curve
# --------------------------------------------------------------------------


def _novel_partials(t: pa.Table, bucket_us: int) -> pa.Table:
    """Per-partition after the conv_hash exchange: families are complete,
    so first-occurrence election ((ts0, conv_id) argmin per hash) is local.
    Emits per-bucket partial counts."""
    if t.num_rows == 0:
        return pa.table(
            {
                "bucket_min": pa.array([], pa.int64()),
                "n_convs": pa.array([], pa.int64()),
                "n_novel": pa.array([], pa.int64()),
            }
        )
    h = t["conv_hash"].combine_chunks().to_numpy()
    ts0 = t["ts0_us"].combine_chunks().to_numpy(zero_copy_only=False)
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object)

    order = np.lexsort((cid, ts0, h))
    h, ts0 = h[order], ts0[order]
    novel = np.concatenate([[True], h[1:] != h[:-1]])

    bucket = ts0 // bucket_us
    uniq, inv = np.unique(bucket, return_inverse=True)
    n_convs = np.bincount(inv, minlength=len(uniq))
    n_novel = np.bincount(inv, weights=novel, minlength=len(uniq))
    return pa.table(
        {
            "bucket_min": pa.array(uniq.astype(np.int64), pa.int64()),
            "n_convs": pa.array(n_convs.astype(np.int64), pa.int64()),
            "n_novel": pa.array(n_novel.astype(np.int64), pa.int64()),
        }
    )


def _sum_by_bucket(t: pa.Table, key: str, cols: list[str]) -> pa.Table:
    if t.num_rows == 0:
        return t
    k = t[key].combine_chunks().to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(k, return_inverse=True)
    out = {key: pa.array(uniq.astype(np.int64), pa.int64())}
    for c in cols:
        v = t[c].combine_chunks().to_numpy(zero_copy_only=False)
        out[c] = pa.array(
            np.bincount(inv, weights=v, minlength=len(uniq)).astype(np.int64),
            pa.int64(),
        )
    return pa.table(out)


def novelty_curve(turns, bucket_us: int = BUCKET_US, num_partitions: int = 16):
    """Crawl-over-time novelty: per arrival minute, conversations whose
    full text is the corpus-wide first occurrence (by (min ts, conv_id))
    vs total arrivals.  Returns (bucket_min, n_convs, n_novel)."""
    convs = conv_identity_rows(turns, num_partitions=num_partitions)
    convs = convs.repartition(num_blocks=num_partitions, keys=["conv_hash"])
    partials = convs.map_batches(
        lambda t: _novel_partials(t, bucket_us),
        batch_format="pyarrow",
        batch_size=None,
    )
    partials = partials.repartition(num_blocks=4, keys=["bucket_min"])
    return partials.map_batches(
        lambda t: _sum_by_bucket(t, "bucket_min", ["n_convs", "n_novel"]),
        batch_format="pyarrow",
        batch_size=None,
    )


NOVELTY_CURVE_SQL = f"""
SELECT CAST(epoch_us(ts0) // {BUCKET_US} AS BIGINT) AS bucket_min,
       CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
FROM (
  SELECT ts0, ROW_NUMBER() OVER (
           PARTITION BY full_text ORDER BY ts0, conv_id) AS rn
  FROM (
    SELECT conv_id,
           string_agg(text, chr(31) ORDER BY turn_idx) AS full_text,
           MIN(ts) AS ts0
    FROM transcripts GROUP BY conv_id))
GROUP BY bucket_min
"""


# --------------------------------------------------------------------------
# dup_family_sizes
# --------------------------------------------------------------------------


def _family_partials(t: pa.Table) -> pa.Table:
    """Per-partition after the conv_hash exchange: family sizes are final
    here; reduce to the (family_size -> counts) histogram partial."""
    if t.num_rows == 0:
        return pa.table(
            {
                "family_size": pa.array([], pa.int64()),
                "n_families": pa.array([], pa.int64()),
                "n_convs": pa.array([], pa.int64()),
            }
        )
    h = np.sort(t["conv_hash"].combine_chunks().to_numpy())
    starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
    sizes = np.diff(np.append(starts, len(h)))
    uniq, counts = np.unique(sizes, return_counts=True)
    return pa.table(
        {
            "family_size": pa.array(uniq.astype(np.int64), pa.int64()),
            "n_families": pa.array(counts.astype(np.int64), pa.int64()),
            "n_convs": pa.array((uniq * counts).astype(np.int64), pa.int64()),
        }
    )


def dup_family_sizes(turns, num_partitions: int = 16):
    """Exact-duplicate family-size histogram at conversation granularity:
    (family_size, n_families, n_convs).  Sum of n_convs - n_families is
    the row count exact dedup would remove."""
    convs = conv_identity_rows(turns, num_partitions=num_partitions)
    convs = convs.repartition(num_blocks=num_partitions, keys=["conv_hash"])
    partials = convs.map_batches(
        _family_partials, batch_format="pyarrow", batch_size=None
    )
    partials = partials.repartition(num_blocks=2, keys=["family_size"])
    return partials.map_batches(
        lambda t: _sum_by_bucket(t, "family_size", ["n_families", "n_convs"]),
        batch_format="pyarrow",
        batch_size=None,
    )


DUP_FAMILY_SIZES_SQL = """
SELECT CAST(family_size AS BIGINT) AS family_size,
       CAST(COUNT(*) AS BIGINT) AS n_families,
       CAST(SUM(family_size) AS BIGINT) AS n_convs
FROM (
  SELECT COUNT(*) AS family_size
  FROM (
    SELECT conv_id, string_agg(text, chr(31) ORDER BY turn_idx) AS full_text
    FROM transcripts GROUP BY conv_id)
  GROUP BY full_text)
GROUP BY family_size
"""
