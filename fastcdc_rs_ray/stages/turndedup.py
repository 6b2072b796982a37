"""Corpus-wide duplicate-turn removal (line-level dedup over transcripts).

The line-dedup operator of web-scale text pipelines (C4 / RefinedWeb style
"remove any line repeated across the corpus, keep one copy") expressed over
the transcript table: the unit of deduplication is the TURN.  Boilerplate
turns — greetings, canned system prompts, identical tool outputs — are the
dominant real-world duplication in agent transcripts, and removing them
while keeping each conversation intact is a different operation from
whole-conversation dedup (stages/dedup.py) or duplicated-substring removal
(stages/substring.py): the text unit is a (conv_id, turn_idx) row and the
output is the REASSEMBLED conversation.

Semantics (mirrored exactly by the DuckDB oracle in pipelines/queries.py):

- every non-empty turn text that occurs more than once in the corpus keeps
  only its FIRST occurrence, ordered by (conv_id, turn_idx); empty texts
  never participate (always kept);
- output: one row per conversation — ``conv_id``, ``n_turns`` (original),
  ``n_removed``, ``clean_text`` (kept turns joined by ``\\n`` in turn
  order; ``''`` when every turn was removed).

Scale shape (10^12 turns): two keyed exchanges, neither driver-resident.

1. *Winner election* — per-block pre-reduce: within a block, only the
   block-minimum (conv_id, turn_idx) per text hash can be the global first
   occurrence, so every other same-hash row in the block is emitted as an
   already-final removal; candidates and local removals travel through ONE
   hash-keyed exchange (u64 hash + conv_id + int32 — no text), and the
   partition-level reduce elects the global minimum per hash.
2. *Reassembly* — removal keys union the turn rows and both are keyed by
   ``conv_id`` (the only exchange that moves text, and the same
   one-full-text-exchange bound as corpus_shuffle); each partition then
   rebuilds its conversations group-at-a-time (per-group Python, per-row
   NumPy, same contract as stages/packing.py).  Inputs already known to be
   conversation-contiguous (the whole-files flagship contract,
   sources/transcripts.py:read_transcripts) could skip this repartition;
   the general path does not assume it.

Like exact_dedup, content identity is the 64-bit text hash
(util.hash_str_array_u64); the oracle-checked scales cannot collide, and
the 128-bit upgrade is a key-width change, not a plan change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import hash_str_array_u64

_RM = np.int8(1)


def _keys_and_local_removals(t: pa.Table) -> pa.Table:
    """Block pre-reduce: emit winner CANDIDATES (block-min per text hash)
    and already-final LOCAL REMOVALS (every other same-hash row)."""
    text = t["text"].combine_chunks()
    h = hash_str_array_u64(text)
    lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    cid = t["conv_id"].combine_chunks()
    tix = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)

    nonempty = lens > 0
    idx = np.flatnonzero(nonempty)
    if len(idx) == 0:
        return pa.table(
            {
                "h": pa.array([], pa.uint64()),
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "rm": pa.array([], pa.int8()),
            }
        )
    hh = h[idx]
    cids = cid.take(pa.array(idx, pa.int64()))
    tixs = tix[idx].astype(np.int32)
    # first occurrence per hash by (conv_id, turn_idx): lexsort is
    # last-key-primary, so order by hash, then conv, then idx
    cnp = np.asarray(cids, dtype=object)
    order = np.lexsort((tixs, cnp, hh))
    hs = hh[order]
    first = np.concatenate([[True], hs[1:] != hs[:-1]])
    rm = np.where(first, np.int8(0), _RM)
    take = pa.array(idx[order], pa.int64())
    return pa.table(
        {
            "h": pa.array(hs, pa.uint64()),
            "conv_id": cid.take(take),
            "turn_idx": pa.array(tix[idx[order]].astype(np.int32), pa.int32()),
            "rm": pa.array(rm, pa.int8()),
        }
    )


def _elect_winners(t: pa.Table) -> pa.Table:
    """Partition reduce: per hash, the minimum (conv_id, turn_idx) among
    candidates survives; everything else (incl. pass-through local
    removals) becomes a removal key (conv_id, turn_idx)."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
            }
        )
    h = t["h"].combine_chunks().to_numpy()
    cid = t["conv_id"].combine_chunks()
    tix = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    rm = t["rm"].combine_chunks().to_numpy(zero_copy_only=False)
    cnp = np.asarray(cid, dtype=object)
    # already-final local removals keep their flag regardless of order;
    # among candidates (rm=0) only the global first occurrence survives
    order = np.lexsort((tix, cnp, rm, h))
    hs, rms = h[order], rm[order]
    first = np.concatenate([[True], hs[1:] != hs[:-1]])
    removed = ~first | (rms != 0)
    sel = pa.array(order[removed], pa.int64())
    return pa.table(
        {
            "conv_id": cid.take(sel),
            "turn_idx": pa.array(tix[order[removed]].astype(np.int32), pa.int32()),
        }
    )


def _reassemble(t: pa.Table) -> pa.Table:
    """Partition reduce after the conv_id exchange: drop removed turns and
    join the survivors per conversation (turn rows carry text; removal
    keys carry text=null and rm=1)."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object)
    tix = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    rm = t["rm"].combine_chunks().to_numpy(zero_copy_only=False)
    texts = np.asarray(t["text"].combine_chunks(), dtype=object)

    is_turn = rm == 0
    # removal keys -> set membership per (conv, idx), vectorized via a
    # composite string key (per-partition scope only)
    turn_keys = np.char.add(
        np.char.add(cid[is_turn].astype(str), "\x00"),
        tix[is_turn].astype(str),
    )
    rm_keys = np.char.add(
        np.char.add(cid[~is_turn].astype(str), "\x00"),
        tix[~is_turn].astype(str),
    )
    removed = np.isin(turn_keys, rm_keys)

    c_t = cid[is_turn]
    i_t = tix[is_turn]
    x_t = texts[is_turn]
    order = np.lexsort((i_t, c_t))
    c_t, i_t, x_t, removed = c_t[order], i_t[order], x_t[order], removed[order]
    uniq, starts = np.unique(c_t, return_index=True)
    bounds = np.append(starts, len(c_t))
    n_turns = np.diff(bounds)
    out_cid, out_removed, out_text = [], [], []
    for g, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        keep = ~removed[s:e]
        out_cid.append(uniq[g])
        out_removed.append(int((~keep).sum()))
        out_text.append("\n".join(x_t[s:e][keep]))
    return pa.table(
        {
            "conv_id": pa.array(out_cid, pa.string()),
            "n_turns": pa.array(n_turns.astype(np.int64), pa.int64()),
            "n_removed": pa.array(out_removed, pa.int64()),
            "clean_text": pa.array(out_text, pa.string()),
        }
    )


def turn_dedup(turns, num_partitions: int = 32):
    """Corpus-wide first-occurrence turn dedup + conversation reassembly.

    ``turns``: Dataset with ``conv_id`` (string), ``turn_idx`` (int32),
    ``text`` (string).  Returns one row per conversation:
    (conv_id, n_turns, n_removed, clean_text).
    """

    keyed = turns.map_batches(_keys_and_local_removals, batch_format="pyarrow")
    keyed = keyed.repartition(num_blocks=num_partitions, keys=["h"])
    removals = keyed.map_batches(_elect_winners, batch_format="pyarrow",
                                 batch_size=None)

    def tag_removal(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "rm": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
                "text": pa.nulls(t.num_rows, pa.string()),
            }
        )

    def tag_turn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
                "rm": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                "text": pc.cast(t["text"], pa.string()),
            }
        )

    tagged = turns.map_batches(tag_turn, batch_format="pyarrow").union(
        removals.map_batches(tag_removal, batch_format="pyarrow")
    )
    tagged = tagged.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return tagged.map_batches(_reassemble, batch_format="pyarrow",
                              batch_size=None)
