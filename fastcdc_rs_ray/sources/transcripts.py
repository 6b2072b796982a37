"""Transcript sources: readers, deterministic synthesis, documents-derivation.

The engine's input table has exactly the BASELINE.json ``input_hint`` shape:

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

Three sources:

- :func:`read_transcripts` — read a transcripts parquet path as a Dataset.
- :func:`synth_transcripts` — deterministic synthetic corpus with planted
  near-duplicate twins and a ground-truth pair table (FIXTURES.md F1), for
  the recall harness and benchmarks.
- :func:`transcripts_from_documents` — deterministically reshape the driver's
  ``documents`` table into multi-turn conversations.  The mapping is mirrored
  exactly by :func:`documents_transcript_sql` so DuckDB can act as an oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["", "search", "python", "browser", "calculator"]

_EPOCH_US = 1_700_000_000_000_000  # fixed epoch (us)

_WORDS = (
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt labore "
    "dolore magna aliqua enim minim veniam quis nostrud exercitation ullamco "
    "laboris nisi aliquip commodo consequat duis aute irure reprehenderit "
    "voluptate velit esse cillum fugiat nulla pariatur excepteur sint "
    "occaecat cupidatat proident sunt culpa officia deserunt mollit anim "
    "laborum model agent tool call response stream token batch shuffle"
).split()

DOCS_TURNS_PER_CONV = 4


# --------------------------------------------------------------------------
# synthetic corpus with planted near-duplicates
# --------------------------------------------------------------------------


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _gen_turn_words(rng: np.random.Generator, n_words: int) -> list[str]:
    idx = rng.integers(0, len(_WORDS), n_words)
    return [_WORDS[i] for i in idx]


def synth_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    dup_frac: float = 0.2,
    turns_lo: int = 3,
    turns_hi: int = 10,
    words_lo: int = 20,
    words_hi: int = 400,
) -> tuple[pa.Table, pa.Table]:
    """Deterministic transcripts + ground-truth duplicate pair table.

    For ``dup_frac`` of base conversations a mutated twin is planted:
    kind 0 = exact copy, 1 = <=3 word edits in one turn, 2 = one turn
    dropped, 3 = whitespace-only perturbation (trailing double space).
    Returns ``(transcripts, truth_pairs)`` where truth_pairs has columns
    (src, dst, kind) with src < dst.
    """
    rng = _rng(seed)
    conv_ids: list[str] = []
    turn_idx: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    ts: list[int] = []
    pairs_src: list[str] = []
    pairs_dst: list[str] = []
    pairs_kind: list[int] = []

    def emit(cid: str, conv_no: int, turns: list[str]) -> None:
        for t_i, text in enumerate(turns):
            conv_ids.append(cid)
            turn_idx.append(t_i)
            role = _ROLES[t_i % 3]
            roles.append(role)
            texts.append(text)
            tools.append(_TOOLS[t_i % len(_TOOLS)] if role == "tool" else "")
            ts.append(_EPOCH_US + conv_no * 1_000_000_000 + t_i * 1_000_000)

    n_base = n_convs
    for c in range(n_base):
        cid = f"conv-{c:08d}"
        n_turns = int(rng.integers(turns_lo, turns_hi + 1))
        turns = [
            " ".join(_gen_turn_words(rng, int(rng.integers(words_lo, words_hi + 1))))
            for _ in range(n_turns)
        ]
        emit(cid, c, turns)
        if rng.random() < dup_frac:
            kind = int(rng.integers(0, 4))
            twin_no = n_base + c
            tid = f"conv-{twin_no:08d}"
            twin = list(turns)
            if kind == 1:  # <=3 word edits in one turn
                ti = int(rng.integers(0, len(twin)))
                words = twin[ti].split(" ")
                for _ in range(min(3, len(words))):
                    wi = int(rng.integers(0, len(words)))
                    words[wi] = _WORDS[int(rng.integers(0, len(_WORDS)))]
                twin[ti] = " ".join(words)
            elif kind == 2 and len(twin) > 2:  # drop one turn
                twin.pop(int(rng.integers(0, len(twin))))
            elif kind == 3:  # whitespace-only perturbation
                ti = int(rng.integers(0, len(twin)))
                twin[ti] = twin[ti] + "  "
            emit(tid, twin_no, twin)
            pairs_src.append(cid)
            pairs_dst.append(tid)
            pairs_kind.append(kind)

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    truth = pa.table(
        {
            "src": pa.array(pairs_src, pa.string()),
            "dst": pa.array(pairs_dst, pa.string()),
            "kind": pa.array(pairs_kind, pa.int32()),
        }
    )
    return transcripts, truth


# --------------------------------------------------------------------------
# documents -> transcripts derivation (oracle-mirrorable)
# --------------------------------------------------------------------------


def documents_to_transcripts_table(docs: pa.Table) -> pa.Table:
    """Reshape a ``documents`` batch into transcript rows, with planted
    near-duplicate twin conversations.

    Base rows: conv_id = printf('conv-%08d', doc_id // 4); turn_idx =
    doc_id % 4; role cycles user/assistant/tool; tool = '' unless role ==
    'tool'; ts = epoch + doc_id seconds.

    Twins (so the dedup tier is exercised on driver data): every
    conversation with conv_no % 10 == 0 gets a twin 'twin-%08d' — an exact
    copy when conv_no % 20 == 0, otherwise the first 3 of its 4 turns (a
    dropped-turn near-dup); twin ts = base ts + 1s.  Mirrored exactly by
    :data:`DOCUMENTS_TRANSCRIPT_SQL`.

    The mapping is per-doc-row and deterministic, so it is safe inside
    ``map_batches`` regardless of batch boundaries.
    """
    import pyarrow.compute as pc

    doc_id = docs["doc_id"].combine_chunks()
    did = doc_id.to_numpy()
    text = pc.cast(docs["text"].combine_chunks(), pa.string())

    def rows(ids: np.ndarray, texts: pa.Array, prefix: str, ts_off_us: int) -> pa.Table:
        conv_no = ids // DOCS_TURNS_PER_CONV
        t_idx = (ids % DOCS_TURNS_PER_CONV).astype(np.int32)
        conv_id = pa.array(
            [f"{prefix}-{c:08d}" for c in conv_no.tolist()], pa.string()
        )
        roles = np.array(_ROLES)[t_idx % 3]
        tools = np.where(roles == "tool", "lookup", "")
        ts = (ids * 1_000_000 + _EPOCH_US + ts_off_us).astype("datetime64[us]")
        return pa.table(
            {
                "conv_id": conv_id,
                "turn_idx": pa.array(t_idx, pa.int32()),
                "role": pa.array(roles, pa.string()),
                "text": texts,
                "tool": pa.array(tools, pa.string()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )

    base = rows(did, text, "conv", 0)
    conv_no = did // DOCS_TURNS_PER_CONV
    t_idx = did % DOCS_TURNS_PER_CONV
    is_twin = (conv_no % 10 == 0) & ((t_idx < 3) | (conv_no % 20 == 0))
    sel = np.flatnonzero(is_twin)
    twins = rows(
        did[sel], text.take(pa.array(sel, pa.int64())), "twin", 1_000_000
    )
    return pa.concat_tables([base, twins])


DOCUMENTS_TRANSCRIPT_SQL = f"""
SELECT printf('conv-%08d', doc_id // {DOCS_TURNS_PER_CONV}) AS conv_id,
       CAST(doc_id % {DOCS_TURNS_PER_CONV} AS INTEGER) AS turn_idx,
       CASE doc_id % {DOCS_TURNS_PER_CONV} % 3
            WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       text,
       CASE WHEN doc_id % {DOCS_TURNS_PER_CONV} % 3 = 2 THEN 'lookup' ELSE '' END AS tool,
       TIMESTAMP '2023-11-14 22:13:20' + INTERVAL (doc_id) SECOND AS ts
FROM documents
UNION ALL
SELECT printf('twin-%08d', doc_id // {DOCS_TURNS_PER_CONV}) AS conv_id,
       CAST(doc_id % {DOCS_TURNS_PER_CONV} AS INTEGER) AS turn_idx,
       CASE doc_id % {DOCS_TURNS_PER_CONV} % 3
            WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       text,
       CASE WHEN doc_id % {DOCS_TURNS_PER_CONV} % 3 = 2 THEN 'lookup' ELSE '' END AS tool,
       TIMESTAMP '2023-11-14 22:13:20' + INTERVAL (doc_id + 1) SECOND AS ts
FROM documents
WHERE (doc_id // {DOCS_TURNS_PER_CONV}) % 10 = 0
  AND (doc_id % {DOCS_TURNS_PER_CONV} < 3
       OR (doc_id // {DOCS_TURNS_PER_CONV}) % 20 = 0)
"""


# --------------------------------------------------------------------------
# Ray readers
# --------------------------------------------------------------------------


def read_transcripts(path: str, columns: list[str] | None = None,
                     whole_files: bool = False):
    """Read a transcripts parquet file/dir as a Ray Dataset (column-pruned).

    ``whole_files=True`` pins one output block per input file
    (``override_num_blocks = n_files``), disabling Ray's dynamic block
    splitting.  REQUIRED whenever the downstream asserts
    ``pre_partitioned=True``: the assembly contract is "no conversation
    spans two blocks", and a conversation-contiguous FILE layout only
    implies conversation-contiguous BLOCKS if Ray doesn't split a file's
    rows across blocks mid-conversation (observed: ~0.3% of conversations
    split, yielding duplicate fragment signatures).  A task may still read
    several whole files into one block — concatenation preserves
    contiguity.
    """
    import ray.data as rd

    if not whole_files:
        return rd.read_parquet(path, columns=columns)
    import os

    if os.path.isdir(path):
        n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    else:
        n_files = 1
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=max(1, n_files))


def transcripts_from_documents(sf_dir: str):
    """documents.parquet -> transcripts-shaped Dataset (deterministic)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(documents_to_transcripts_table, batch_format="pyarrow")
