"""Conversation-structure operators over the transcript table.

Two transcript-native operators a conversation-corpus curation pipeline
runs before training (reference has no counterpart — its universe is one
byte stream; these operate on the BASELINE.json ``input_hint`` table):

- :func:`role_alternation` — the structural quality gate: per
  conversation, does it start with a user turn and never repeat a role in
  adjacent turns?  Malformed transcripts (truncated uploads, merged
  tool-output runs, assistant-first fragments) fail this gate and are the
  transcript analogue of the document tier's quality score.

- :func:`conv_windows` — context-window segmentation: assign turns to
  fixed-token-budget training windows by cumulative token count, the
  "split long conversations into max-length samples" step of SFT data
  prep.  Window boundaries are a pure function of the per-turn token
  counts (window = cumulative-tokens-before // budget), so the layout is
  deterministic under any partitioning and mirrored exactly by a SQL
  window function.

Scale shape (both): ONE conv_id-keyed exchange moving only
(conv_id, turn_idx, small-int) rows — never text — then a per-partition
vectorized pass (lexsort + run detection / segmented cumsum, the same
contract as stages/turndedup.py).  Both are order-sensitive per-group
computations, so no commutative partial exists; the exchanged row width
is the lever, and it is ~20 bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import TOKEN_RE

#: token budget per training window (conv_windows)
WINDOW_TOKENS = 256


# --------------------------------------------------------------------------
# role_alternation
# --------------------------------------------------------------------------


def _project_roles(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "role": t["role"],
        }
    )


def _alternation_combine(t: pa.Table) -> pa.Table:
    """Per-partition reduce after the conv_id exchange: every conversation
    is complete here, so the adjacent-role check is a shift compare."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "first_role": pa.array([], pa.string()),
                "n_repeats": pa.array([], pa.int64()),
                "n_tool": pa.array([], pa.int64()),
                "ok": pa.array([], pa.int8()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object)
    tix = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    role = np.asarray(t["role"].combine_chunks(), dtype=object)

    order = np.lexsort((tix, cid))
    cid, role = cid[order], role[order]
    uniq, starts = np.unique(cid.astype("U"), return_index=True)
    # np.unique sorts — starts are ascending because cid is lexsorted
    bounds = np.append(starts, len(cid))
    n_turns = np.diff(bounds)
    group_of = np.repeat(np.arange(len(uniq)), n_turns)

    same_as_prev = np.concatenate([[False], role[1:] == role[:-1]])
    same_as_prev[starts] = False  # conversation boundaries never repeat
    n_repeats = np.bincount(group_of, weights=same_as_prev, minlength=len(uniq))
    n_tool = np.bincount(group_of, weights=(role == "tool"), minlength=len(uniq))
    first_role = role[starts]
    ok = (first_role == "user") & (n_repeats == 0)
    return pa.table(
        {
            "conv_id": pa.array(uniq.tolist(), pa.string()),
            "n_turns": pa.array(n_turns.astype(np.int64), pa.int64()),
            "first_role": pa.array(first_role.tolist(), pa.string()),
            "n_repeats": pa.array(n_repeats.astype(np.int64), pa.int64()),
            "n_tool": pa.array(n_tool.astype(np.int64), pa.int64()),
            "ok": pa.array(ok.astype(np.int8), pa.int8()),
        }
    )


def role_alternation(turns, num_partitions: int = 16):
    """Structural quality gate per conversation.

    ``turns``: Dataset with conv_id/turn_idx/role.  Returns one row per
    conversation: (conv_id, n_turns, first_role, n_repeats, n_tool, ok)
    where ok = first turn is 'user' AND no two adjacent turns share a
    role.
    """
    keyed = turns.map_batches(_project_roles, batch_format="pyarrow")
    keyed = keyed.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return keyed.map_batches(
        _alternation_combine, batch_format="pyarrow", batch_size=None
    )


ROLE_ALTERNATION_SQL = """
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       arg_min(role, turn_idx) AS first_role,
       CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repeats,
       CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tool,
       CAST(CASE WHEN arg_min(role, turn_idx) = 'user'
                  AND SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) = 0
                 THEN 1 ELSE 0 END AS TINYINT) AS ok
FROM (
  SELECT conv_id, turn_idx, role,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM transcripts)
GROUP BY conv_id
"""


# --------------------------------------------------------------------------
# conv_windows
# --------------------------------------------------------------------------


def _project_tokens(t: pa.Table) -> pa.Table:
    n_tok = pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE), pa.int64())
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "n_tok": n_tok,
        }
    )


def _windows_combine(t: pa.Table, budget: int) -> pa.Table:
    """Per-partition reduce: segmented cumsum-before per conversation,
    window = before // budget, then contiguous-run rollup (rows are sorted
    by (conv, turn), so windows are runs)."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "window_idx": pa.array([], pa.int64()),
                "turn_lo": pa.array([], pa.int32()),
                "turn_hi": pa.array([], pa.int32()),
                "n_turns": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object)
    tix = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    tok = t["n_tok"].combine_chunks().to_numpy(zero_copy_only=False)

    order = np.lexsort((tix, cid))
    cid, tix, tok = cid[order], tix[order], tok[order]
    cu = cid.astype("U")
    new_conv = np.concatenate([[True], cu[1:] != cu[:-1]])
    cum = np.cumsum(tok)
    before = cum - tok
    # subtract each conversation's base so 'before' restarts per conv
    base = np.where(new_conv, before, 0)
    np.maximum.accumulate(base, out=base)
    before = before - base
    win = before // budget

    new_win = new_conv | np.concatenate([[True], win[1:] != win[:-1]])
    starts = np.flatnonzero(new_win)
    bounds = np.append(starts, len(cid))
    n_turns = np.diff(bounds)
    n_tokens = np.add.reduceat(tok, starts)
    return pa.table(
        {
            "conv_id": pa.array(cid[starts].tolist(), pa.string()),
            "window_idx": pa.array(win[starts].astype(np.int64), pa.int64()),
            "turn_lo": pa.array(tix[starts].astype(np.int32), pa.int32()),
            "turn_hi": pa.array(tix[bounds[1:] - 1].astype(np.int32), pa.int32()),
            "n_turns": pa.array(n_turns.astype(np.int64), pa.int64()),
            "n_tokens": pa.array(n_tokens.astype(np.int64), pa.int64()),
        }
    )


def conv_windows(turns, budget: int = WINDOW_TOKENS, num_partitions: int = 16):
    """Context-window segmentation of conversations into training samples.

    Each turn lands in window ``cumulative-tokens-before // budget`` of
    its conversation (a turn longer than the budget still occupies one
    window slot — turns are atomic).  Returns one row per (conversation,
    window): (conv_id, window_idx, turn_lo, turn_hi, n_turns, n_tokens).
    """
    keyed = turns.map_batches(_project_tokens, batch_format="pyarrow")
    keyed = keyed.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return keyed.map_batches(
        lambda t: _windows_combine(t, budget),
        batch_format="pyarrow",
        batch_size=None,
    )


# --------------------------------------------------------------------------
# loss_mask_stats
# --------------------------------------------------------------------------


def _project_tokens_role(t: pa.Table) -> pa.Table:
    n_tok = pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE), pa.int64())
    is_asst = pc.cast(pc.equal(t["role"], "assistant"), pa.int8())
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "n_tok": n_tok,
            "is_asst": is_asst,
        }
    )


def _loss_mask_combine(t: pa.Table, budget: int) -> pa.Table:
    """Per-partition reduce: the conv_windows segmentation plus the
    SFT loss accounting — tokens in assistant turns are loss tokens,
    everything else is masked context."""
    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "window_idx": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_loss_tokens": pa.array([], pa.int64()),
                "loss_permille": pa.array([], pa.int64()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object)
    tix = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    tok = t["n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
    is_asst = t["is_asst"].combine_chunks().to_numpy(zero_copy_only=False)

    order = np.lexsort((tix, cid))
    cid, tok, is_asst = cid[order], tok[order], is_asst[order]
    cu = cid.astype("U")
    new_conv = np.concatenate([[True], cu[1:] != cu[:-1]])
    cum = np.cumsum(tok)
    before = cum - tok
    base = np.where(new_conv, before, 0)
    np.maximum.accumulate(base, out=base)
    before = before - base
    win = before // budget

    new_win = new_conv | np.concatenate([[True], win[1:] != win[:-1]])
    starts = np.flatnonzero(new_win)
    n_tokens = np.add.reduceat(tok, starts)
    n_loss = np.add.reduceat(tok * is_asst, starts)
    permille = n_loss * 1000 // np.maximum(n_tokens, 1)
    return pa.table(
        {
            "conv_id": pa.array(cid[starts].tolist(), pa.string()),
            "window_idx": pa.array(win[starts].astype(np.int64), pa.int64()),
            "n_tokens": pa.array(n_tokens.astype(np.int64), pa.int64()),
            "n_loss_tokens": pa.array(n_loss.astype(np.int64), pa.int64()),
            "loss_permille": pa.array(permille.astype(np.int64), pa.int64()),
        }
    )


def loss_mask_stats(turns, budget: int = WINDOW_TOKENS,
                    num_partitions: int = 16):
    """SFT loss accounting per training window: of each conv_windows
    window's tokens, how many would carry loss (assistant turns) vs be
    masked context (user/tool turns)?  Windows that are all context
    (loss_permille = 0) are wasted samples an SFT mix drops; the
    permille is exact integer.  Same single conv-keyed exchange as
    conv_windows, rows 1 byte wider (the is-assistant flag).
    """
    keyed = turns.map_batches(_project_tokens_role, batch_format="pyarrow")
    keyed = keyed.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return keyed.map_batches(
        lambda t: _loss_mask_combine(t, budget),
        batch_format="pyarrow",
        batch_size=None,
    )


# --------------------------------------------------------------------------
# templated_convs
# --------------------------------------------------------------------------

#: powers of ten for the exact decimal-digit-count bucket
_POW10 = 10 ** np.arange(1, 19, dtype=np.int64)

#: role -> fingerprint initial (first character of the role string)
_ROLE_INITIAL = {"user": ord("u"), "assistant": ord("a"), "tool": ord("t")}


def _project_struct(t: pa.Table) -> pa.Table:
    n_tok = pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE), pa.int64())
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "role": t["role"],
            "n_tok": n_tok,
        }
    )


def _fingerprint_partials(t: pa.Table) -> pa.Table:
    """Per-partition reduce after the conv_id exchange: build each
    conversation's structural fingerprint (role initial + decimal digit
    count of the turn's token count, per turn in turn order), then
    pre-reduce to (fingerprint, n_convs, rep_conv) partials so the second
    exchange is template-dimension-sized."""
    if t.num_rows == 0:
        return pa.table(
            {
                "fingerprint": pa.array([], pa.string()),
                "n_convs": pa.array([], pa.int64()),
                "rep_conv": pa.array([], pa.string()),
            }
        )
    cid = np.asarray(t["conv_id"].combine_chunks(), dtype=object)
    tix = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    role = np.asarray(t["role"].combine_chunks(), dtype=object)
    tok = t["n_tok"].combine_chunks().to_numpy(zero_copy_only=False)

    order = np.lexsort((tix, cid))
    cid, role, tok = cid[order], role[order], tok[order]
    cu = cid.astype("U")
    starts = np.flatnonzero(np.concatenate([[True], cu[1:] != cu[:-1]]))
    n_turns = np.diff(np.append(starts, len(cid)))

    # per-turn 2-byte fragment: role initial + digit-count character.
    # digit count via searchsorted on powers of 10 — exact, unlike float log10
    digits = np.searchsorted(_POW10, tok, side="right") + 1
    frag = np.empty((len(cid), 2), dtype=np.uint8)
    frag[:, 0] = role.astype("U1").astype("S1").view(np.uint8)
    frag[:, 1] = (ord("0") + digits).astype(np.uint8)

    # fingerprints are contiguous 2-byte runs of the flattened fragment
    # buffer: build the string array zero-copy from offsets
    flat = pa.py_buffer(frag.tobytes())
    offs = np.zeros(len(starts) + 1, dtype=np.int32)
    np.cumsum(n_turns * 2, out=offs[1:])
    fp = pa.StringArray.from_buffers(
        len(starts), pa.py_buffer(offs.tobytes()), flat
    )

    fpu = np.asarray(fp, dtype=object).astype("U")
    conv_first = cid[starts].astype("U")
    o2 = np.lexsort((conv_first, fpu))
    fpu, conv_first = fpu[o2], conv_first[o2]
    first = np.flatnonzero(np.concatenate([[True], fpu[1:] != fpu[:-1]]))
    n_convs = np.diff(np.append(first, len(fpu)))
    return pa.table(
        {
            "fingerprint": pa.array(fpu[first].tolist(), pa.string()),
            "n_convs": pa.array(n_convs.astype(np.int64), pa.int64()),
            "rep_conv": pa.array(conv_first[first].tolist(), pa.string()),
        }
    )


def _template_final(t: pa.Table, min_convs: int) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {
                "fingerprint": pa.array([], pa.string()),
                "n_convs": pa.array([], pa.int64()),
                "rep_conv": pa.array([], pa.string()),
            }
        )
    fp = np.asarray(t["fingerprint"].combine_chunks(), dtype=object).astype("U")
    n = t["n_convs"].combine_chunks().to_numpy(zero_copy_only=False)
    rep = np.asarray(t["rep_conv"].combine_chunks(), dtype=object).astype("U")
    order = np.lexsort((rep, fp))
    fp, n, rep = fp[order], n[order], rep[order]
    first = np.flatnonzero(np.concatenate([[True], fp[1:] != fp[:-1]]))
    bounds = np.append(first, len(fp))
    tot = np.add.reduceat(n, first)
    keep = tot >= min_convs
    return pa.table(
        {
            "fingerprint": pa.array(fp[first][keep].tolist(), pa.string()),
            "n_convs": pa.array(tot[keep].astype(np.int64), pa.int64()),
            "rep_conv": pa.array(rep[first][keep].tolist(), pa.string()),
        }
    )


def templated_convs(turns, min_convs: int = 2, num_partitions: int = 16):
    """Structural template detection — the synthetic/templated-data
    deduplication signal: conversations sharing an identical (role,
    token-count-digit-bucket) turn sequence.  Returns one row per template
    with >= ``min_convs`` members: (fingerprint, n_convs, rep_conv =
    lexicographically first member).

    Fingerprint example ``'u2a3t1u2'``: 4 turns — user with 2-digit token
    count, assistant 3-digit, tool 1-digit, user 2-digit.  The digit
    bucket is exact integer (searchsorted on powers of ten; SQL twin
    LENGTH(CAST(n AS VARCHAR))), so both engines agree bit-for-bit.

    Scale shape: exchange 1 is the conv-keyed (conv_id, turn_idx, role,
    n_tok) rows — no text; exchange 2 carries per-block pre-reduced
    (fingerprint, count, min-conv) partials, template-dimension-sized.
    Hot templates (boilerplate structure shared by millions of convs) cost
    a bincount, never a pairwise blowup.
    """
    keyed = turns.map_batches(_project_struct, batch_format="pyarrow")
    keyed = keyed.repartition(num_blocks=num_partitions, keys=["conv_id"])
    partials = keyed.map_batches(
        _fingerprint_partials, batch_format="pyarrow", batch_size=None
    )
    partials = partials.repartition(num_blocks=4, keys=["fingerprint"])
    return partials.map_batches(
        lambda t: _template_final(t, min_convs),
        batch_format="pyarrow",
        batch_size=None,
    )


TEMPLATED_CONVS_SQL = """
SELECT fingerprint,
       CAST(COUNT(*) AS BIGINT) AS n_convs,
       MIN(conv_id) AS rep_conv
FROM (
  SELECT conv_id,
         string_agg(
           substr(role, 1, 1) ||
           CAST(LENGTH(CAST(len(regexp_extract_all(text, '@TOKEN_RE@'))
                            AS VARCHAR)) AS VARCHAR),
           '' ORDER BY turn_idx) AS fingerprint
  FROM transcripts GROUP BY conv_id)
GROUP BY fingerprint HAVING COUNT(*) >= 2
""".replace("@TOKEN_RE@", TOKEN_RE)


LOSS_MASK_SQL = f"""
SELECT conv_id,
       CAST(before // {WINDOW_TOKENS} AS BIGINT) AS window_idx,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN role = 'assistant' THEN n_tok ELSE 0 END)
            AS BIGINT) AS n_loss_tokens,
       CAST(CASE WHEN SUM(n_tok) = 0 THEN 0
                 ELSE SUM(CASE WHEN role = 'assistant' THEN n_tok ELSE 0 END)
                      * 1000 // SUM(n_tok) END AS BIGINT) AS loss_permille
FROM (
  SELECT conv_id, turn_idx, role, n_tok,
         COALESCE(SUM(n_tok) OVER (PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM (
    SELECT conv_id, turn_idx, role,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tok
    FROM transcripts))
GROUP BY conv_id, before // {WINDOW_TOKENS}
"""


CONV_WINDOWS_SQL = f"""
SELECT conv_id,
       CAST(before // {WINDOW_TOKENS} AS BIGINT) AS window_idx,
       CAST(MIN(turn_idx) AS INTEGER) AS turn_lo,
       CAST(MAX(turn_idx) AS INTEGER) AS turn_hi,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM (
  SELECT conv_id, turn_idx, n_tok,
         COALESCE(SUM(n_tok) OVER (PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM (
    SELECT conv_id, turn_idx,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tok
    FROM transcripts))
GROUP BY conv_id, before // {WINDOW_TOKENS}
"""
