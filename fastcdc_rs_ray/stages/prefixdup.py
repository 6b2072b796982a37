"""Prefix-duplicate conversations: retry/truncation dedup for transcripts.

The transcript-native duplication mode that whole-conversation exact dedup
misses and MinHash only scores as borderline: conversation A is a
PREFIX-DUPLICATE of B when A's ordered turn-text sequence is a proper
prefix of B's (a retried / resumed / truncated capture of the same
conversation), or when A equals B and A is not the first copy.  The
corpus derivation plants exactly this shape (the dropped-last-turn twins,
sources/transcripts.py) — a 3-of-4-turn prefix has chunk-Jaccard < 0.5 by
design, so the flagship's similarity threshold is the wrong tool and an
exact prefix operator is the right one.

Plan (two keyed exchanges, group-local checks):

1. conv assembly — turns keyed by ``conv_id``, each block joins its whole
   conversations with ``\\n`` (the oracle's ``string_agg`` separator) and
   emits (first-turn hash, conv_id, full_text).
2. candidate grouping — rows keyed by the FIRST-TURN hash: any turn-level
   prefix pair shares its first turn, so grouping by it is complete.  In
   each group, sort by (full_text with ``\\n`` mapped to ``\\x01``,
   conv_id): the remap makes every turn-extension of A sort IMMEDIATELY
   after A's equal-run (no printable byte sorts between), so one
   successor-after-run check per row decides the relation — no pairwise
   loop.  A row is a duplicate iff its predecessor is equal text (keep
   the minimum conv_id of an equal run) or the row after its equal run
   extends it at a turn boundary.

Skew guard: first-turn groups larger than ``max_group`` (boilerplate
openers) are excluded from pair generation — the same exclusion the SQL
oracle applies via a window count, so the capped semantics ARE the
checked semantics (house rule from ngram_dups).

Assumes turn texts contain no control bytes below ``\\n`` (the remap
trick needs ``\\x01`` free); ASCII transcript corpora satisfy this.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import hash_str_array_u64

MAX_GROUP = 4096


def _assemble_rows(t: pa.Table, reverse: bool = False) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {
                "fh": pa.array([], pa.uint64()),
                "conv_id": pa.array([], pa.string()),
                "full_text": pa.array([], pa.string()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object)
    tix = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    txt = np.asarray(t["text"].combine_chunks(), dtype=object)
    order = np.lexsort((-tix if reverse else tix, cid))
    cid, txt = cid[order], txt[order]
    uniq, starts = np.unique(cid, return_index=True)
    bounds = np.append(starts, len(cid))
    firsts, fulls = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        firsts.append(txt[s])
        fulls.append("\n".join(txt[s:e]))
    fh = hash_str_array_u64(pa.array(firsts, pa.string()))
    return pa.table(
        {
            "fh": pa.array(fh, pa.uint64()),
            "conv_id": pa.array(uniq.tolist(), pa.string()),
            "full_text": pa.array(fulls, pa.string()),
        }
    )


def _group_prefix_dups(max_group: int):
    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"conv_id": pa.array([], pa.string())})
        fh = t["fh"].combine_chunks().to_numpy()
        cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object)
        txt = np.asarray(t["full_text"].combine_chunks(), dtype=object)
        key = np.array([s.replace("\n", "\x01") for s in txt], dtype=object)
        order = np.lexsort((cid, key, fh))
        fh, cid, txt, key = fh[order], cid[order], txt[order], key[order]
        n = len(fh)
        same_g = np.concatenate([[False], fh[1:] == fh[:-1]])
        # group-size cap (count rows per fh run)
        run_start = np.flatnonzero(~same_g)
        run_len = np.diff(np.append(run_start, n))
        gsz = np.repeat(run_len, run_len)
        eq_prev = same_g & np.concatenate([[False], key[1:] == key[:-1]])
        # successor index AFTER this row's equal run
        run_id = np.cumsum(~(eq_prev))  # equal-text runs within fh groups
        run_first = np.flatnonzero(~eq_prev)
        nxt = np.append(run_first[1:], n)  # first row of the NEXT text run
        succ = nxt[run_id - 1]
        dup = eq_prev.copy()
        check = (~eq_prev) & (succ < n) & (fh[np.minimum(succ, n - 1)] == fh)
        for i in np.flatnonzero(check):
            a, b = txt[i], txt[succ[i]]
            if len(b) > len(a) and b.startswith(a) and b[len(a)] == "\n":
                dup[i] = True
        dup &= gsz <= max_group
        out = np.sort(cid[dup].astype("U"))
        return pa.table({"conv_id": pa.array(out.tolist(), pa.string())})

    return f


def prefix_dups(turns, num_partitions: int = 16,
                max_group: int = MAX_GROUP):
    """-> Dataset of conv_id for every prefix-duplicate conversation
    (proper turn-prefix of another conversation, or a non-first exact
    copy)."""
    keyed = turns.repartition(num_blocks=num_partitions, keys=["conv_id"])
    rows = keyed.map_batches(_assemble_rows, batch_format="pyarrow",
                             batch_size=None)
    rows = rows.repartition(num_blocks=num_partitions, keys=["fh"])
    return rows.map_batches(_group_prefix_dups(max_group),
                            batch_format="pyarrow", batch_size=None)


def suffix_dups(turns, num_partitions: int = 16,
                max_group: int = MAX_GROUP):
    """-> Dataset of conv_id for every SUFFIX-duplicate conversation
    (proper turn-suffix of another conversation, or a non-first exact
    copy) — the context-window-truncation twin of :func:`prefix_dups`:
    agent frameworks that evict early context re-log the TAIL of a long
    conversation as a fresh one, which no whole-conversation hash or
    prefix check catches.

    Identical plan run on REVERSED turn order: assembly joins turn texts
    by ``turn_idx`` descending, so "A is a turn-suffix of B" becomes "A's
    reversed join is a turn-boundary prefix of B's reversed join", and
    the same first-element grouping (now the LAST turn — complete, since
    suffix pairs share their final turn) + successor-after-sorted-run
    check decides every pair.  Skew cap and oracle mirroring as in
    :func:`prefix_dups`.
    """
    keyed = turns.repartition(num_blocks=num_partitions, keys=["conv_id"])
    rows = keyed.map_batches(lambda t: _assemble_rows(t, reverse=True),
                             batch_format="pyarrow", batch_size=None)
    rows = rows.repartition(num_blocks=num_partitions, keys=["fh"])
    return rows.map_batches(_group_prefix_dups(max_group),
                            batch_format="pyarrow", batch_size=None)
