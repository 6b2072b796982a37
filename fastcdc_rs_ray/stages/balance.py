"""Corpus-balance operators: language temperature resampling and
size-balanced output sharding.

- :func:`lang_balance` — multilingual temperature resampling (the
  alpha=0.5 "rebalance language shares toward sqrt(count)" step of
  multilingual pretraining mixes): per-language keep-rates derive from the
  corpus language histogram, the least-downsampled language keeps every
  document, and membership is the engine's standard deterministic
  multiplicative hash — so the draw is retry-stable, partition-invariant
  and exactly mirrored in SQL.  All arithmetic is integer (isqrt weights,
  cross-multiplied keep predicate; no float ever decides membership).

- :func:`shard_balance` — size-balanced output sharding: assign documents
  (in doc_id order) to K output shards of ~equal BYTES, the "write
  balanced files" planning step of a resumable sink (a byte-skewed corpus
  sharded by count alone produces straggler files).  shard =
  (K * bytes-before) // total-bytes over the global doc_id order —
  computed distributed via one range sort + the one-row-per-block
  boundary-stitch idiom (stages/sample.py corpus_shuffle), never a
  driver-side enumeration.

Scale shape: lang_balance moves only per-block (lang, count) partials
(n_blocks x n_langs rows) — zero keyed exchange, two streaming passes
over a 2-column read.  shard_balance's one exchange is the range sort of
(doc_id, n_chars) pairs (16 bytes/row); at 10^12 docs the int64 bound
K * total_bytes < 2^63 holds to ~570 TB per 1024 shards.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sample import SAMPLE_MULT

#: weight scale used only to pick the reference (least-downsampled) language
_PICK_SCALE = 10**12

#: number of output shards (shard_balance)
N_SHARDS = 16


# --------------------------------------------------------------------------
# lang_balance
# --------------------------------------------------------------------------


def _lang_count_partial(t: pa.Table, kept_theta=None) -> pa.Table:
    lang = np.asarray(t["lang"].combine_chunks(), dtype=object).astype("U")
    if kept_theta is not None:
        did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        h32 = (did.astype(np.uint64) * np.uint64(SAMPLE_MULT)) & np.uint64(
            0xFFFFFFFF
        )
        theta = np.array([kept_theta.get(l, 0) for l in lang], np.uint64)
        lang = lang[h32 < theta]
    if len(lang) == 0:
        return pa.table(
            {"lang": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
        )
    uniq, cnt = np.unique(lang, return_counts=True)
    return pa.table(
        {
            "lang": pa.array(uniq.tolist(), pa.string()),
            "c": pa.array(cnt.astype(np.int64), pa.int64()),
        }
    )


def _merge_partials(ds) -> dict[str, int]:
    out: dict[str, int] = {}
    for b in ds.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for lang, c in zip(
            t["lang"].to_pylist(), t["c"].to_pylist()
        ):
            out[lang] = out.get(lang, 0) + int(c)
    return out


def lang_balance(documents_ds, num_partitions: int = 8):
    """Temperature (alpha=0.5) language resampling plan + audit rollup.

    Keep probability per language l: p_l = (c_m * w_l) / (w_m * c_l) with
    w = isqrt(count) and m the language minimizing c/w (ties by name) —
    so p_m = 1 and every other language downsamples toward the sqrt
    share.  Membership: low 32 bits of doc_id's multiplicative hash
    < ceil(c_m * w_l * 2^32 / (w_m * c_l)), exactly the cross-multiplied
    predicate the SQL oracle evaluates in HUGEINT.

    Returns one audit row per language: (lang, n_docs, weight, n_kept).
    Driver-side state is the language histogram (|langs| entries, merged
    from n_blocks x n_langs partial rows) — dimension-bounded, never
    corpus-bounded.
    """
    import ray

    docs = documents_ds
    counts = _merge_partials(
        docs.map_batches(_lang_count_partial, batch_format="pyarrow")
    )
    if not counts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.int64()),
                    "n_kept": pa.array([], pa.int64()),
                }
            )
        )
    w = {l: math.isqrt(c) for l, c in counts.items()}
    m = min(counts, key=lambda l: (counts[l] * _PICK_SCALE // w[l], l))
    cm, wm = counts[m], w[m]
    theta = {
        l: min(
            1 << 32,
            -(-(cm * w[l] * (1 << 32)) // (wm * counts[l])),  # ceil div
        )
        for l in counts
    }
    kept = _merge_partials(
        docs.map_batches(
            lambda t: _lang_count_partial(t, kept_theta=theta),
            batch_format="pyarrow",
        )
    )
    langs = sorted(counts)
    return ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_docs": pa.array([counts[l] for l in langs], pa.int64()),
                "weight": pa.array([w[l] for l in langs], pa.int64()),
                "n_kept": pa.array([kept.get(l, 0) for l in langs], pa.int64()),
            }
        )
    )


# isqrt via float sqrt + one exact adjustment step (float error is <= 1):
_ISQRT_SQL = (
    "CASE WHEN (s+1)*(s+1) <= c THEN s+1 WHEN s*s > c THEN s-1 ELSE s END"
)

LANG_BALANCE_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY lang
), s0 AS (
  SELECT lang, c, CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) AS s
  FROM counts
), w AS (
  SELECT lang, c, {_ISQRT_SQL} AS w FROM s0
), m AS (
  SELECT c AS cm, w AS wm FROM w
  ORDER BY (CAST(c AS HUGEINT) * {_PICK_SCALE}) // w, lang LIMIT 1
), kc AS (
  SELECT d.lang AS lang, COUNT(*) AS k
  FROM documents d JOIN w ON d.lang = w.lang CROSS JOIN m
  WHERE ((CAST(d.doc_id AS HUGEINT) * {SAMPLE_MULT})
         % 18446744073709551616 % 4294967296) * (m.wm * w.c)
        < CAST(m.cm AS HUGEINT) * w.w * 4294967296
  GROUP BY d.lang
)
SELECT w.lang AS lang, w.c AS n_docs, CAST(w.w AS BIGINT) AS weight,
       CAST(COALESCE(kc.k, 0) AS BIGINT) AS n_kept
FROM w LEFT JOIN kc ON w.lang = kc.lang
"""


# --------------------------------------------------------------------------
# shard_balance
# --------------------------------------------------------------------------


def shard_balance(documents_ds, k: int = N_SHARDS):
    """Size-balanced output shard plan: shard = (k * bytes-before) // total
    over the global doc_id order.  Returns one row per non-empty shard:
    (shard_id, n_docs, n_bytes).

    One range sort of (doc_id, n_chars) rows, then the boundary-stitch:
    each block reports (first_doc_id, n_bytes) once, the driver prefix-sums
    block byte-offsets (one row per block), and blocks assign shards from
    their own offset + local cumsum.  Per-shard rollups are k-bounded.
    """
    import ray

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "b": pc.cast(t["n_chars"], pa.int64()),
            }
        )

    sorted_ds = (
        documents_ds.map_batches(project, batch_format="pyarrow")
        .sort("doc_id")
        .materialize()
    )

    def block_summary(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"first": pa.array([], pa.int64()), "nb": pa.array([], pa.int64())}
            )
        did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "first": pa.array([int(did[0])], pa.int64()),
                "nb": pa.array([int(b.sum())], pa.int64()),
            }
        )

    summ = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in sorted_ds.map_batches(
            block_summary, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    )
    first = summ["first"].to_numpy(zero_copy_only=False)
    nb = summ["nb"].to_numpy(zero_copy_only=False)
    order = np.argsort(first, kind="stable")
    first = first[order]
    offsets = np.concatenate([[0], np.cumsum(nb[order])[:-1]]).astype(np.int64)
    total = int(nb.sum())
    if total == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "shard_id": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                }
            )
        )
    stitch = ray.put((first, offsets))

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "shard_id": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                }
            )
        import ray as _ray

        fb, ob = _ray.get(stitch)
        did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        base = ob[np.searchsorted(fb, did[0])]
        before = base + np.cumsum(b) - b
        shard = (k * before) // total  # bound: k * total < 2^63
        uniq, inv, cnt = np.unique(shard, return_inverse=True, return_counts=True)
        bytes_per = np.bincount(inv, weights=b, minlength=len(uniq))
        return pa.table(
            {
                "shard_id": pa.array(uniq.astype(np.int64), pa.int64()),
                "n_docs": pa.array(cnt.astype(np.int64), pa.int64()),
                "n_bytes": pa.array(bytes_per.astype(np.int64), pa.int64()),
            }
        )

    parts = sorted_ds.map_batches(assign, batch_format="pyarrow", batch_size=None)

    # k-bounded final combine (a shard can straddle two blocks)
    out: dict[int, list[int]] = {}
    for bt in parts.iter_batches(batch_format="pyarrow"):
        t = bt if isinstance(bt, pa.Table) else pa.Table.from_batches([bt])
        for s, n, nb_ in zip(
            t["shard_id"].to_pylist(), t["n_docs"].to_pylist(), t["n_bytes"].to_pylist()
        ):
            cur = out.setdefault(int(s), [0, 0])
            cur[0] += int(n)
            cur[1] += int(nb_)
    shards = sorted(out)
    return ray.data.from_arrow(
        pa.table(
            {
                "shard_id": pa.array(shards, pa.int64()),
                "n_docs": pa.array([out[s][0] for s in shards], pa.int64()),
                "n_bytes": pa.array([out[s][1] for s in shards], pa.int64()),
            }
        )
    )


SHARD_BALANCE_SQL = f"""
SELECT CAST(({N_SHARDS} * before) // total AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(b) AS BIGINT) AS n_bytes
FROM (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS b,
         COALESCE(SUM(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
         SUM(CAST(n_chars AS BIGINT)) OVER () AS total
  FROM documents)
GROUP BY ({N_SHARDS} * before) // total
"""
