"""Crash-safe staging protocol (sources/staging.py).

Round-2 verdict item 1: an interrupted dump (shard files present, no
``.done`` marker) made a re-run ADD a second session-named shard set, so
``ingest_jsonl`` / ``ingest_csv`` returned exactly 2x the truth.  These
tests pin the fixed protocol: partial state is torn down and rebuilt
atomically, and a changed source fingerprint invalidates a completed
stage.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from fastcdc_rs_ray.sources.staging import (
    dir_fingerprint,
    source_fingerprint,
    staged,
)
from fastcdc_rs_ray.sources.textio import (
    ingest_csv_rollup,
    ingest_jsonl_rollup,
)


def _docs_table() -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "lang": pa.array(["en", "fr"] * 20, pa.string()),
        "text": pa.array([f"doc number {i} body" for i in range(40)],
                         pa.string()),
    })


def test_staged_runs_once_and_marks(tmp_path):
    out = str(tmp_path / "layout")
    calls = []

    def dump(tmp):
        calls.append(tmp)
        with open(os.path.join(tmp, "a.txt"), "w") as f:
            f.write("x")

    staged(out, dump, "fp1")
    staged(out, dump, "fp1")
    assert len(calls) == 1
    assert os.path.exists(os.path.join(out, "a.txt"))
    # the dump ran in a temp dir, not in out_dir directly
    assert calls[0] != out


def test_staged_interrupted_dump_is_torn_down(tmp_path):
    """Orphan shard files WITHOUT the marker (a crash mid-dump) must be
    wiped, not appended to — the exact round-2 doubling bug."""
    out = str(tmp_path / "layout")
    os.makedirs(out)
    with open(os.path.join(out, "stale-shard.json"), "w") as f:
        f.write('{"doc_id": 999}\n')

    def dump(tmp):
        with open(os.path.join(tmp, "fresh.json"), "w") as f:
            f.write('{"doc_id": 1}\n')

    staged(out, dump, "fp1")
    assert sorted(os.listdir(out)) == ["fresh.json"]


def test_staged_fingerprint_mismatch_restages(tmp_path):
    out = str(tmp_path / "layout")
    n = [0]

    def dump(tmp):
        n[0] += 1
        with open(os.path.join(tmp, f"gen{n[0]}.txt"), "w") as f:
            f.write("x")

    staged(out, dump, "fp1")
    staged(out, dump, "fp2")  # source changed -> rebuild
    assert n[0] == 2
    assert sorted(os.listdir(out)) == ["gen2.txt"]


def test_staged_sweeps_orphan_tmp_dirs(tmp_path):
    out = str(tmp_path / "layout")
    orphan = out + ".tmp-deadbeef"
    os.makedirs(orphan)

    def dump(tmp):
        with open(os.path.join(tmp, "a.txt"), "w") as f:
            f.write("x")

    staged(out, dump, "fp1")
    assert not os.path.exists(orphan)


def test_source_fingerprint_tracks_mtime(tmp_path):
    p = tmp_path / "t.parquet"
    p.write_bytes(b"abc")
    fp1 = source_fingerprint(str(p))
    os.utime(p, ns=(1, 2))
    fp2 = source_fingerprint(str(p))
    assert fp1 != fp2
    assert dir_fingerprint(str(tmp_path)) == source_fingerprint(str(p))
    with pytest.raises(FileNotFoundError):
        dir_fingerprint(str(tmp_path / "empty"))


def test_ingest_jsonl_not_doubled_after_interrupt(ray_session, tmp_path):
    """End-to-end round-2 repro: pre-seed an orphan Ray-session-named
    shard (no marker), then run the rollup — counts must match the
    source exactly, not 2x."""
    import ray.data as rd

    t = _docs_table()
    out = str(tmp_path / "jsonl")
    os.makedirs(out)
    # fake leftover from an interrupted previous session
    with open(os.path.join(out, "112_000000_000000.json"), "w") as f:
        for i in range(40):
            f.write('{"doc_id": %d, "lang": "en", "text": "stale"}\n' % i)

    got = ingest_jsonl_rollup(rd.from_arrow(t), out).to_pandas()
    got = got.sort_values("lang").reset_index(drop=True)
    assert got["n_docs"].tolist() == [20, 20]
    body_chars = sum(len(f"doc number {i} body") for i in range(0, 40, 2))
    assert int(got[got["lang"] == "en"]["sum_chars"].iloc[0]) == body_chars


def test_ingest_csv_not_doubled_after_interrupt(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({
        "event_id": pa.array(range(30), pa.int64()),
        "user_id": pa.array([i % 3 for i in range(30)], pa.int64()),
        "value": pa.array([round(0.25 * i, 2) for i in range(30)],
                          pa.float64()),
    })
    out = str(tmp_path / "csv")
    os.makedirs(out)
    with open(os.path.join(out, "37_000000_000000.csv"), "w") as f:
        f.write("event_id,user_id,value\n1,0,5.00\n")

    got = ingest_csv_rollup(rd.from_arrow(t), out).to_pandas()
    assert int(got["n_events"].sum()) == 30
    assert int(got["sum_value_c"].sum()) == sum(
        round(0.25 * i * 100) for i in range(30))


def _worker_stage(args):
    out, fp, idx = args
    import json
    import os as _os
    import time as _t

    from fastcdc_rs_ray.sources.staging import staged

    def dump(tmp):
        # slow, multi-file dump: plenty of interleaving surface
        for k in range(5):
            with open(_os.path.join(tmp, f"shard{k}.json"), "w") as f:
                json.dump({"writer": idx, "k": k}, f)
            _t.sleep(0.02)

    staged(out, dump, fingerprint=fp)
    return sorted(_os.listdir(out))


def test_staged_concurrent_processes_single_winner(tmp_path):
    """ADVICE r3: concurrent callers sharing an out_dir must serialize
    the check-teardown-dump-rename sequence (flock) — no ENOTEMPTY on
    rename, no sweeping a sibling's live tmp dir, and the final layout
    is one complete 5-shard dump from a single writer."""
    import json
    from concurrent.futures import ProcessPoolExecutor

    out = str(tmp_path / "shared_layout")
    with ProcessPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(_worker_stage,
                              [(out, "fp-A", i) for i in range(6)]))
    assert all(r == [f"shard{k}.json" for k in range(5)] for r in results)
    writers = set()
    for k in range(5):
        with open(os.path.join(out, f"shard{k}.json")) as f:
            writers.add(json.load(f)["writer"])
    assert len(writers) == 1          # one winner wrote the whole layout
    assert os.path.exists(out + ".done")
    # no orphan tmp dirs survive
    import glob as _g
    assert _g.glob(out + ".tmp-*") == []
