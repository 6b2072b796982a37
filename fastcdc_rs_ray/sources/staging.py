"""Crash-safe, fingerprint-keyed staging for derived on-disk layouts.

Every ingest/layout stager in this package (JSONL/CSV/gz/text dumps,
Arrow-IPC/ORC shards, bucketed joins, inverted indexes, zone-mapped
shards) materializes a derived copy of a parquet table ONCE and marks
completion with a sibling ``<out_dir>.done`` file.  Two failure modes
made the naive pattern (write into out_dir, then touch the marker) wrong:

1. **Crash between dump and marker** — a later run re-dumps into a dir
   that already holds a partial shard set.  Session-named writers
   (``write_json``/``write_csv``) ADD a second set of files instead of
   overwriting, so readers double-count (observed: ingest_jsonl /
   ingest_csv returning exactly 2x the truth).
2. **Regenerated source data** — the marker said "done" forever, so a
   re-generated testdata tree silently served a stale dump.

``staged()`` fixes both: the dump lands in a uniquely-named temp dir
that is atomically ``os.rename``d onto ``out_dir`` (POSIX rename is
atomic on one filesystem; a crash leaves only an orphan temp dir that
the next run sweeps), and the marker records a caller-supplied
*fingerprint* of the source (file sizes + mtimes) — a mismatch wipes
and re-stages.

At 100 TB the same protocol holds with an object store: write shards
under a unique prefix, then publish the prefix via a single manifest-
object PUT (the rename analogue); the marker-with-fingerprint is the
manifest.
"""

from __future__ import annotations

import contextlib
import glob
import hashlib
import os
import shutil
import uuid

try:
    import fcntl
except ImportError:  # non-POSIX: single-process semantics only
    fcntl = None


@contextlib.contextmanager
def _exclusive(lock_path: str):
    """fcntl.flock-exclusive section (ADVICE r3): two processes sharing
    an out_dir must not interleave the check-teardown-dump-rename
    sequence — the '.tmp-*' sweep could delete a sibling's in-flight
    dump, and a rename onto a just-recreated out_dir raises ENOTEMPTY.
    flock is advisory but every writer goes through staged(), and the
    lock file persists (unlink would race a third waiter)."""
    if fcntl is None:
        yield
        return
    with open(lock_path, "a+") as lf:
        fcntl.flock(lf.fileno(), fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lf.fileno(), fcntl.LOCK_UN)


def source_fingerprint(*paths: str) -> str:
    """Cheap content-identity proxy for local source files: abs path +
    size + mtime_ns, hashed.  Regenerating a source file (even with the
    same byte size) bumps mtime_ns and invalidates dependent stages."""
    parts = []
    for p in sorted(paths):
        st = os.stat(p)
        parts.append(f"{os.path.abspath(p)}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def dir_fingerprint(sf_dir: str) -> str:
    """Fingerprint of every parquet table under ``sf_dir`` — the one-call
    key for stagers derived from a testdata scale-factor directory."""
    files = sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet tables under {sf_dir}")
    return source_fingerprint(*files)


def staged(out_dir: str, dump_fn, fingerprint: str = "static") -> None:
    """Run ``dump_fn(tmp_dir)`` once per (out_dir, fingerprint), crash-safe.

    On return, ``out_dir`` exists, is complete, and matches
    ``fingerprint``.  ``dump_fn`` receives a fresh temp directory and
    must write the full layout into it; the temp dir is atomically
    renamed onto ``out_dir`` and the marker written LAST, so any
    interruption leaves either the old complete state or no state —
    never a partial dump a re-run would double.
    """
    out_dir = out_dir.rstrip("/")
    done = out_dir + ".done"

    def _current() -> bool:
        if os.path.isdir(out_dir) and os.path.exists(done):
            with open(done) as f:
                return f.read().strip() == fingerprint
        return False

    if _current():  # fast path, no lock traffic
        return
    os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
    with _exclusive(out_dir + ".lock"):
        if _current():  # a concurrent caller staged it while we waited
            return
        # Stale fingerprint, missing marker (interrupted dump), or
        # missing dir: tear down whatever half-state exists, rebuild.
        # Inside the lock the '.tmp-*' orphans are guaranteed dead (any
        # live dump would hold the lock), so the sweep is safe.
        if os.path.exists(done):
            os.remove(done)
        shutil.rmtree(out_dir, ignore_errors=True)
        for stale in glob.glob(out_dir + ".tmp-*"):
            shutil.rmtree(stale, ignore_errors=True)
        tmp = out_dir + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        dump_fn(tmp)
        os.rename(tmp, out_dir)
        with open(done, "w") as f:
            f.write(fingerprint)
