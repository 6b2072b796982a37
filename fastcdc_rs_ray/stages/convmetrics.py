"""Conversation-corpus metric operators over the transcript table.

Four transcript-native operators an agent-transcript curation pipeline
runs alongside dedup (reference has no counterpart — its universe is one
byte stream; these operate on the BASELINE.json ``input_hint`` table and
exercise its ``tool`` and ``ts`` columns):

- :func:`tool_usage` — per-tool corpus usage profile: call counts,
  distinct conversations, total output chars.  The "which tools dominate
  the corpus" audit run before tool-call balancing.

- :func:`turn_latency` — per-conversation timing from ``ts``: wall
  duration, largest inter-turn gap, and a count of non-monotone gaps
  (the timestamp-sanity gate; transcripts assembled from unordered event
  logs fail it).

- :func:`dup_turn_ratio` — the RefinedWeb/C4 "duplicate line fraction"
  quality signal at transcript granularity: per conversation, how many
  of its turns have text that also occurs in ANOTHER conversation.
  Unlike stages/turndedup.py (which removes), this scores.

- :func:`assistant_share` — role balance per conversation in exact
  permille of chars; prompt-heavy vs reply-heavy sorting for SFT mixes.

Scale shapes:

- ``tool_usage``: per-block pre-reduce to (tool, conv_id) partials, one
  tool-keyed exchange of dimension-sized partials (tools × convs-per-
  block upper bound), tiny reduce.  Commutative partials — the
  pre-aggregate-before-groupby pattern.
- ``turn_latency``: one conv_id-keyed exchange of (conv_id, turn_idx,
  int64) rows — never text; order-sensitive per-group reduce (lexsort +
  segmented diff), same contract as stages/convstruct.py.
- ``dup_turn_ratio``: two keyed exchanges, neither moving text — a
  u64-hash-keyed exchange of per-block (h, conv_id, cnt) partials to
  find texts spanning >1 conversation, then a conv_id-keyed exchange of
  int8-tagged counts.  Content identity is the 64-bit text hash
  (util.hash_str_array_u64): oracle-checked scales cannot collide, and
  the 128-bit upgrade is a key-width change, not a plan change.
- ``assistant_share``: per-block (conv_id, role) char partials, ONE
  conv-keyed exchange of partials (≤ 3 rows per conv per block), pivot
  reduce.  Fully commutative.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import hash_str_array_u64

_GAP_SENTINEL = np.int64(-(2**62))


# --------------------------------------------------------------------------
# tool_usage
# --------------------------------------------------------------------------


def _tool_partials(t: pa.Table) -> pa.Table:
    """Block pre-reduce: (tool, conv_id) -> n_calls, n_chars partials over
    tool-call turns (tool != '')."""
    tool = np.asarray(t["tool"].combine_chunks(), dtype=object).astype("U")
    keep = np.flatnonzero(tool != "")
    if len(keep) == 0:
        return pa.table(
            {
                "tool": pa.array([], pa.string()),
                "conv_id": pa.array([], pa.string()),
                "n_calls": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object).astype("U")[keep]
    lens = pc.utf8_length(t["text"].combine_chunks()).to_numpy(
        zero_copy_only=False
    )[keep]
    tool = tool[keep]
    order = np.lexsort((cid, tool))
    tool, cid, lens = tool[order], cid[order], lens[order]
    new = np.concatenate(
        [[True], (tool[1:] != tool[:-1]) | (cid[1:] != cid[:-1])]
    )
    starts = np.flatnonzero(new)
    bounds = np.append(starts, len(tool))
    n_calls = np.diff(bounds)
    n_chars = np.add.reduceat(lens.astype(np.int64), starts)
    return pa.table(
        {
            "tool": pa.array(tool[starts].tolist(), pa.string()),
            "conv_id": pa.array(cid[starts].tolist(), pa.string()),
            "n_calls": pa.array(n_calls.astype(np.int64), pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def _tool_reduce(t: pa.Table) -> pa.Table:
    """Partition reduce after the tool-keyed exchange: collapse (tool,
    conv) partials, then per tool: sums + distinct-conversation count."""
    if t.num_rows == 0:
        return pa.table(
            {
                "tool": pa.array([], pa.string()),
                "n_calls": pa.array([], pa.int64()),
                "n_convs": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    tool = np.asarray(t["tool"].combine_chunks(), dtype=object).astype("U")
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object).astype("U")
    n_calls = t["n_calls"].combine_chunks().to_numpy(zero_copy_only=False)
    n_chars = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((cid, tool))
    tool, cid = tool[order], cid[order]
    n_calls, n_chars = n_calls[order], n_chars[order]
    new_pair = np.concatenate(
        [[True], (tool[1:] != tool[:-1]) | (cid[1:] != cid[:-1])]
    )
    pair_id = np.cumsum(new_pair) - 1
    new_tool = np.concatenate([[True], tool[1:] != tool[:-1]])
    t_starts = np.flatnonzero(new_tool)
    t_bounds = np.append(t_starts, len(tool))
    tool_of_pair = np.cumsum(new_tool) - 1
    calls = np.bincount(tool_of_pair, weights=n_calls).astype(np.int64)
    chars = np.bincount(tool_of_pair, weights=n_chars).astype(np.int64)
    # distinct conversations per tool = distinct (tool, conv) pairs per tool
    convs = np.bincount(tool_of_pair[new_pair]).astype(np.int64)
    return pa.table(
        {
            "tool": pa.array(tool[t_starts].tolist(), pa.string()),
            "n_calls": pa.array(calls, pa.int64()),
            "n_convs": pa.array(convs, pa.int64()),
            "n_chars": pa.array(chars, pa.int64()),
        }
    )


def tool_usage(turns, num_partitions: int = 4):
    """Per-tool usage profile over tool-call turns (``tool != ''``).

    ``turns``: Dataset with conv_id/tool/text.  Returns one row per tool:
    (tool, n_calls, n_convs, n_chars).
    """
    partials = turns.map_batches(_tool_partials, batch_format="pyarrow")
    partials = partials.repartition(num_blocks=num_partitions, keys=["tool"])
    return partials.map_batches(
        _tool_reduce, batch_format="pyarrow", batch_size=None
    )


TOOL_USAGE_SQL = """
SELECT tool,
       CAST(COUNT(*) AS BIGINT) AS n_calls,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars
FROM transcripts WHERE tool <> '' GROUP BY tool
"""


# --------------------------------------------------------------------------
# turn_latency
# --------------------------------------------------------------------------


def _project_ts(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "ts_us": pc.cast(t["ts"], pa.int64()),
        }
    )


def _latency_reduce(t: pa.Table) -> pa.Table:
    """Per-partition reduce after the conv_id exchange: segmented gap scan
    in turn order."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "duration_us": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64()),
                "n_nonmono": pa.array([], pa.int64()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object).astype("U")
    tix = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    ts = t["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((tix, cid))
    cid, ts = cid[order], ts[order]
    new_conv = np.concatenate([[True], cid[1:] != cid[:-1]])
    starts = np.flatnonzero(new_conv)
    bounds = np.append(starts, len(cid))
    n_turns = np.diff(bounds)
    gap = np.empty(len(ts), dtype=np.int64)
    gap[0] = _GAP_SENTINEL
    gap[1:] = ts[1:] - ts[:-1]
    gap[starts] = _GAP_SENTINEL  # conversation boundaries carry no gap
    max_gap = np.maximum.reduceat(gap, starts)
    max_gap = np.where(n_turns == 1, np.int64(0), max_gap)
    group_of = np.repeat(np.arange(len(starts)), n_turns)
    nonmono = (gap != _GAP_SENTINEL) & (gap <= 0)
    n_nonmono = np.bincount(group_of, weights=nonmono, minlength=len(starts))
    duration = ts[bounds[1:] - 1] - ts[starts]
    return pa.table(
        {
            "conv_id": pa.array(cid[starts].tolist(), pa.string()),
            "n_turns": pa.array(n_turns.astype(np.int64), pa.int64()),
            "duration_us": pa.array(duration, pa.int64()),
            "max_gap_us": pa.array(max_gap, pa.int64()),
            "n_nonmono": pa.array(n_nonmono.astype(np.int64), pa.int64()),
        }
    )


def turn_latency(turns, num_partitions: int = 16):
    """Per-conversation timing + timestamp-sanity gate.

    ``turns``: Dataset with conv_id/turn_idx/ts.  Returns one row per
    conversation: (conv_id, n_turns, duration_us, max_gap_us, n_nonmono)
    where duration is last-turn ts minus first-turn ts (turn order, not
    min/max), max_gap the largest adjacent-turn gap (0 for single-turn
    conversations), and n_nonmono the number of adjacent gaps <= 0.
    """
    keyed = turns.map_batches(_project_ts, batch_format="pyarrow")
    keyed = keyed.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return keyed.map_batches(
        _latency_reduce, batch_format="pyarrow", batch_size=None
    )


TURN_LATENCY_SQL = """
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(epoch_us(arg_max(ts, turn_idx)) - epoch_us(arg_min(ts, turn_idx))
            AS BIGINT) AS duration_us,
       CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us,
       CAST(SUM(CASE WHEN gap IS NOT NULL AND gap <= 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nonmono
FROM (
  SELECT conv_id, turn_idx, ts,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (
             PARTITION BY conv_id ORDER BY turn_idx)) AS gap
  FROM transcripts)
GROUP BY conv_id
"""


# --------------------------------------------------------------------------
# dup_turn_ratio
# --------------------------------------------------------------------------


def _dup_pair_partials(t: pa.Table) -> pa.Table:
    """Block pre-reduce: distinct (text-hash, conv_id) pairs with local
    occurrence counts, non-empty texts only."""
    text = t["text"].combine_chunks()
    h = hash_str_array_u64(text)
    lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(lens > 0)
    if len(keep) == 0:
        return pa.table(
            {
                "h": pa.array([], pa.uint64()),
                "conv_id": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    h = h[keep]
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object).astype("U")[keep]
    order = np.lexsort((cid, h))
    h, cid = h[order], cid[order]
    new = np.concatenate([[True], (h[1:] != h[:-1]) | (cid[1:] != cid[:-1])])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, len(h)))
    return pa.table(
        {
            "h": pa.array(h[starts], pa.uint64()),
            "conv_id": pa.array(cid[starts].tolist(), pa.string()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        }
    )


def _shared_counts(t: pa.Table) -> pa.Table:
    """Partition reduce after the h exchange: collapse (h, conv) partials;
    for hashes spanning >1 distinct conversation, emit each member
    conversation's occurrence count."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    h = t["h"].combine_chunks().to_numpy()
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object).astype("U")
    cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((cid, h))
    h, cid, cnt = h[order], cid[order], cnt[order]
    new_pair = np.concatenate([[True], (h[1:] != h[:-1]) | (cid[1:] != cid[:-1])])
    p_starts = np.flatnonzero(new_pair)
    p_bounds = np.append(p_starts, len(h))
    pair_cnt = np.add.reduceat(cnt.astype(np.int64), p_starts)
    ph, pcid = h[p_starts], cid[p_starts]
    new_h = np.concatenate([[True], ph[1:] != ph[:-1]])
    h_of_pair = np.cumsum(new_h) - 1
    convs_per_h = np.bincount(h_of_pair)
    shared = convs_per_h[h_of_pair] > 1
    return pa.table(
        {
            "conv_id": pa.array(pcid[shared].tolist(), pa.string()),
            "n": pa.array(pair_cnt[shared], pa.int64()),
        }
    )


def _conv_totals(t: pa.Table) -> pa.Table:
    """Block pre-reduce: per-conversation turn-count partials (all turns,
    empty texts included)."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int8()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object).astype("U")
    uniq, cnt = np.unique(cid, return_counts=True)
    return pa.table(
        {
            "conv_id": pa.array(uniq.tolist(), pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
            "kind": pa.array(np.zeros(len(uniq), np.int8), pa.int8()),
        }
    )


def _ratio_reduce(t: pa.Table) -> pa.Table:
    """Final reduce after the conv exchange: n_turns (kind 0 partials),
    n_shared (kind 1), exact permille."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
                "shared_permille": pa.array([], pa.int64()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object).astype("U")
    n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
    kind = t["kind"].combine_chunks().to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(cid, return_inverse=True)
    n_turns = np.bincount(inv, weights=np.where(kind == 0, n, 0),
                          minlength=len(uniq)).astype(np.int64)
    n_shared = np.bincount(inv, weights=np.where(kind == 1, n, 0),
                           minlength=len(uniq)).astype(np.int64)
    permille = np.where(n_turns > 0, n_shared * 1000 // np.maximum(n_turns, 1), 0)
    return pa.table(
        {
            "conv_id": pa.array(uniq.tolist(), pa.string()),
            "n_turns": pa.array(n_turns, pa.int64()),
            "n_shared": pa.array(n_shared, pa.int64()),
            "shared_permille": pa.array(permille.astype(np.int64), pa.int64()),
        }
    )


def dup_turn_ratio(turns, num_partitions: int = 16):
    """Duplicate-turn fraction per conversation (quality signal).

    A turn is *shared* when its non-empty text also occurs in at least
    one OTHER conversation corpus-wide (same-conversation repeats don't
    count).  Returns one row per conversation:
    (conv_id, n_turns, n_shared, shared_permille) with
    shared_permille = n_shared * 1000 // n_turns.
    """
    pairs = turns.map_batches(_dup_pair_partials, batch_format="pyarrow")
    pairs = pairs.repartition(num_blocks=num_partitions, keys=["h"])
    shared = pairs.map_batches(_shared_counts, batch_format="pyarrow",
                               batch_size=None)

    def tag_shared(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "n": t["n"],
                "kind": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
            }
        )

    tagged = turns.map_batches(_conv_totals, batch_format="pyarrow").union(
        shared.map_batches(tag_shared, batch_format="pyarrow")
    )
    tagged = tagged.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return tagged.map_batches(_ratio_reduce, batch_format="pyarrow",
                              batch_size=None)


DUP_TURN_RATIO_SQL = """
SELECT t.conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(CASE WHEN f.nc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(SUM(CASE WHEN f.nc > 1 THEN 1 ELSE 0 END) * 1000 // COUNT(*)
            AS BIGINT) AS shared_permille
FROM transcripts t
LEFT JOIN (
  SELECT text, COUNT(DISTINCT conv_id) AS nc FROM transcripts
  WHERE length(text) > 0 GROUP BY text) f
ON t.text = f.text
GROUP BY t.conv_id
"""


# --------------------------------------------------------------------------
# assistant_share
# --------------------------------------------------------------------------

_ROLE_COLS = ("user", "assistant", "tool")


def _share_partials(t: pa.Table) -> pa.Table:
    """Block pre-reduce: char sums per (conv_id, role)."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "role": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object).astype("U")
    role = np.asarray(t["role"].combine_chunks(), dtype=object).astype("U")
    lens = pc.utf8_length(t["text"].combine_chunks()).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    order = np.lexsort((role, cid))
    cid, role, lens = cid[order], role[order], lens[order]
    new = np.concatenate(
        [[True], (cid[1:] != cid[:-1]) | (role[1:] != role[:-1])]
    )
    starts = np.flatnonzero(new)
    n_chars = np.add.reduceat(lens, starts)
    return pa.table(
        {
            "conv_id": pa.array(cid[starts].tolist(), pa.string()),
            "role": pa.array(role[starts].tolist(), pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def _share_reduce(t: pa.Table) -> pa.Table:
    """Pivot reduce after the conv exchange: one row per conversation with
    per-role char totals and the exact assistant permille."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_chars_user": pa.array([], pa.int64()),
                "n_chars_assistant": pa.array([], pa.int64()),
                "n_chars_tool": pa.array([], pa.int64()),
                "assistant_permille": pa.array([], pa.int64()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object).astype("U")
    role = np.asarray(t["role"].combine_chunks(), dtype=object).astype("U")
    n_chars = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(cid, return_inverse=True)
    cols = {}
    for r in _ROLE_COLS:
        cols[r] = np.bincount(inv, weights=np.where(role == r, n_chars, 0),
                              minlength=len(uniq)).astype(np.int64)
    total = cols["user"] + cols["assistant"] + cols["tool"]
    permille = np.where(total > 0,
                        cols["assistant"] * 1000 // np.maximum(total, 1), 0)
    return pa.table(
        {
            "conv_id": pa.array(uniq.tolist(), pa.string()),
            "n_chars_user": pa.array(cols["user"], pa.int64()),
            "n_chars_assistant": pa.array(cols["assistant"], pa.int64()),
            "n_chars_tool": pa.array(cols["tool"], pa.int64()),
            "assistant_permille": pa.array(permille.astype(np.int64),
                                           pa.int64()),
        }
    )


def assistant_share(turns, num_partitions: int = 16):
    """Role char-balance per conversation in exact permille.

    ``turns``: Dataset with conv_id/role/text.  Returns one row per
    conversation: (conv_id, n_chars_user, n_chars_assistant, n_chars_tool,
    assistant_permille) where assistant_permille =
    assistant-chars * 1000 // total-chars (0 when the conversation has no
    text at all).  Roles outside user/assistant/tool contribute to no
    column (the input contract has exactly these three).
    """
    partials = turns.map_batches(_share_partials, batch_format="pyarrow")
    partials = partials.repartition(num_blocks=num_partitions,
                                    keys=["conv_id"])
    return partials.map_batches(_share_reduce, batch_format="pyarrow",
                                batch_size=None)


ASSISTANT_SHARE_SQL = """
SELECT conv_id,
       CAST(SUM(CASE WHEN role = 'user' THEN length(text) ELSE 0 END)
            AS BIGINT) AS n_chars_user,
       CAST(SUM(CASE WHEN role = 'assistant' THEN length(text) ELSE 0 END)
            AS BIGINT) AS n_chars_assistant,
       CAST(SUM(CASE WHEN role = 'tool' THEN length(text) ELSE 0 END)
            AS BIGINT) AS n_chars_tool,
       CAST(CASE WHEN SUM(length(text)) = 0 THEN 0
                 ELSE SUM(CASE WHEN role = 'assistant' THEN length(text)
                               ELSE 0 END) * 1000 // SUM(length(text))
            END AS BIGINT) AS assistant_permille
FROM transcripts GROUP BY conv_id
"""
