"""Incremental near-dup index: snapshot-over-snapshot MinHash/LSH matching
through standing sharded state actors (stages/neardup_incr.py).

Crafted two-snapshot corpus: snapshot B contains near-copies (3% token
drop, J ~ 0.79 at k=5 — see _twin) of snapshot-A docs plus fresh docs.  Strict snapshot semantics:
A-ingest sees empty history (all new); B-ingest must match every planted
twin to its A base and leave fresh docs unmatched.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.pipelines.neardup import doc_signatures
from fastcdc_rs_ray.stages.lsh import conv_keys
from fastcdc_rs_ray.stages.neardup_incr import NearDupIndex

N_BASE = 40
N_TWIN = 20
N_FRESH = 20
VOCAB = [f"tok{i}" for i in range(500)]


def _doc(rng: np.random.Generator, n: int = 120) -> str:
    return " ".join(rng.choice(VOCAB, size=n))


def _twin(rng: np.random.Generator, text: str) -> str:
    # 3% token drop: with k=5 token shingles a shingle survives at
    # 0.97^5 ~ 0.86, giving J ~ 0.79 — well above tau=0.5 and a
    # near-certain band hit at 32 bands of r=4 (1-(1-0.79^4)^32 ~ 1)
    toks = text.split()
    keep = rng.random(len(toks)) >= 0.03
    keep[: 5] = True  # never empty
    return " ".join(t for t, k in zip(toks, keep) if k)


def _corpus():
    rng = np.random.default_rng(42)
    base = [_doc(rng) for _ in range(N_BASE)]
    snap_a = pa.table({
        "doc_id": pa.array(np.arange(N_BASE), pa.int64()),
        "text": pa.array(base),
    })
    twins = [_twin(rng, base[i]) for i in range(N_TWIN)]
    fresh = [_doc(rng) for _ in range(N_FRESH)]
    snap_b = pa.table({
        "doc_id": pa.array(np.arange(1000, 1000 + N_TWIN + N_FRESH), pa.int64()),
        "text": pa.array(twins + fresh),
    })
    return snap_a, snap_b


def _run_two_snapshots():
    import ray.data as rd

    snap_a, snap_b = _corpus()
    idx = NearDupIndex(n_shards=3, tau=0.5)
    try:
        out_a = idx.ingest(
            doc_signatures(rd.from_arrow(snap_a).repartition(4))
        ).to_pandas()
        out_b = idx.ingest(
            doc_signatures(rd.from_arrow(snap_b).repartition(4))
        ).to_pandas()
        stats = idx.stats()
    finally:
        idx.close()
    return out_a, out_b, stats


def test_incremental_neardup_two_snapshots(ray_session):
    out_a, out_b, stats = _run_two_snapshots()

    # snapshot A: empty history -> everything new
    assert len(out_a) == N_BASE
    assert (~out_a["matched"]).all()

    # index absorbed both snapshots
    assert stats["sigs"] == N_BASE + N_TWIN + N_FRESH

    out_b = out_b.set_index("conv_id")
    # expected base conv_key per twin
    base_ids = pa.array([str(i) for i in range(N_BASE)])
    base_keys = conv_keys(base_ids)

    matched = 0
    for i in range(N_TWIN):
        row = out_b.loc[str(1000 + i)]
        if row["matched"]:
            assert row["match_key"] == base_keys[i], (
                f"twin {i} matched a non-base doc")
            assert row["sim_ppm"] >= 500_000
            matched += 1
    # J ~ 0.79 per _twin's math; allow one unlucky twin
    assert matched >= N_TWIN - 1

    # fresh docs stay unmatched
    for i in range(N_TWIN, N_TWIN + N_FRESH):
        assert not out_b.loc[str(1000 + i)]["matched"]


def test_incremental_neardup_deterministic(ray_session):
    a1, b1, _ = _run_two_snapshots()
    a2, b2, _ = _run_two_snapshots()
    for x, y in ((a1, a2), (b1, b2)):
        x = x.sort_values("conv_id").reset_index(drop=True)
        y = y.sort_values("conv_id").reset_index(drop=True)
        assert x.equals(y)


def test_bucket_cap_pressure_deterministic(ray_session):
    """Hot band under cap pressure: 30 identical docs overflow every bucket
    (cap=4).  The min-set bucket rule makes membership — and therefore the
    twin's match — arrival-order-free: always the globally smallest
    conv_key, no matter how register tasks interleave."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    text = " ".join(rng.choice(VOCAB, size=100))
    snap_a = pa.table({
        "doc_id": pa.array(np.arange(30), pa.int64()),
        "text": pa.array([text] * 30),
    })
    snap_b = pa.table({
        "doc_id": pa.array([500], pa.int64()),
        "text": pa.array([text]),
    })
    want = conv_keys(pa.array([str(i) for i in range(30)])).min()
    for _ in range(2):  # run twice: identical result both times
        idx = NearDupIndex(n_shards=3, tau=0.5, bucket_cap=4)
        try:
            idx.ingest(doc_signatures(rd.from_arrow(snap_a).repartition(6)))
            out = idx.ingest(doc_signatures(rd.from_arrow(snap_b))).to_pandas()
        finally:
            idx.close()
        assert bool(out["matched"].iloc[0])
        assert out["match_key"].iloc[0] == want
        assert out["sim_ppm"].iloc[0] == 1_000_000


def test_recrawl_identical_snapshot_matches_history(ray_session):
    """Generation semantics: re-ingesting the SAME snapshot matches every
    doc to its own prior-generation entry (sim 1.0) — the re-crawl case —
    while the first ingest of those docs saw an empty index.  Exercises the
    gen stamp that also shields lineage-re-executed lookups from seeing
    their own snapshot."""
    import ray.data as rd

    snap_a, _ = _corpus()
    keys = conv_keys(snap_a["doc_id"].cast("string"))
    idx = NearDupIndex(n_shards=3, tau=0.5)
    try:
        first = idx.ingest(doc_signatures(rd.from_arrow(snap_a))).to_pandas()
        again = idx.ingest(doc_signatures(rd.from_arrow(snap_a))).to_pandas()
    finally:
        idx.close()
    assert (~first["matched"]).all()
    again = again.set_index("conv_id")
    for i in range(N_BASE):
        row = again.loc[str(i)]
        assert bool(row["matched"])
        assert row["match_key"] == keys[i]  # its own prior-gen entry
        assert row["sim_ppm"] == 1_000_000


def test_checkpoint_restore_identical_ingest(ray_session, tmp_path):
    """VERDICT r3 item 8: ingest snapshot A, checkpoint the standing
    index, KILL the actors, restore from the checkpoint, ingest B —
    match results, post-state and generation counter identical to the
    unbroken two-snapshot run."""
    import os

    import pytest
    import ray.data as rd

    snap_a, snap_b = _corpus()
    ck = str(tmp_path / "ndi_ckpt")

    def norm(df):
        return df.sort_values("conv_id").reset_index(drop=True)

    # unbroken run
    _, want_b, want_stats = _run_two_snapshots()

    # broken run: A -> checkpoint -> kill -> restore -> B
    idx = NearDupIndex(n_shards=3, tau=0.5)
    idx.ingest(doc_signatures(rd.from_arrow(snap_a).repartition(4)))
    manifest = idx.checkpoint(ck)
    assert manifest["gen"] == 1
    assert sum(s["sig_rows"] for s in manifest["shards"]) == len(snap_a)
    idx.close()                       # the job dies here

    idx2 = NearDupIndex.restore(ck)
    try:
        got_b = idx2.ingest(
            doc_signatures(rd.from_arrow(snap_b).repartition(4))
        ).to_pandas()
        assert norm(got_b).equals(norm(want_b))
        assert idx2.stats() == want_stats
    finally:
        idx2.close()

    # a second checkpoint after B is re-restorable and idempotent
    idx3 = NearDupIndex.restore(ck)
    try:
        idx3.checkpoint(ck)           # overwrite with same state
        assert NearDupIndex.restore(ck)._gen == 1
    finally:
        idx3.close()

    # incomplete checkpoint (no _SUCCESS) refuses to restore
    os.remove(os.path.join(ck, "_SUCCESS"))
    with pytest.raises(FileNotFoundError):
        NearDupIndex.restore(ck)


def test_checkpoint_crash_never_destroys_previous_state(
        ray_session, tmp_path, monkeypatch):
    """ADVICE r4: a crash ANYWHERE inside checkpoint() must leave a
    complete restorable state — either the previous checkpoint (still
    at ckpt_dir, or renamed aside to .old-*) or the new one.  The old
    protocol rmtree'd the previous checkpoint before the new rename,
    so a crash in that window destroyed the only complete state.

    Simulated crash: fail the rename that installs the NEW payload,
    after the old one has been moved aside."""
    import glob
    import os

    import pytest
    import ray.data as rd

    snap_a, _snap_b = _corpus()
    ck = str(tmp_path / "crash_ckpt")

    idx = NearDupIndex(n_shards=2, tau=0.5)
    try:
        idx.ingest(doc_signatures(rd.from_arrow(snap_a).repartition(2)))
        idx.checkpoint(ck)            # checkpoint #1, complete

        real_rename = os.rename

        def crashing_rename(src, dst):
            if dst == ck and ".tmp-" in src:  # installing the new payload
                raise OSError("simulated crash mid-swap")
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", crashing_rename)
        with pytest.raises(OSError, match="simulated crash"):
            idx.checkpoint(ck)
        monkeypatch.setattr(os, "rename", real_rename)

        # the previous complete state survives: at ckpt_dir itself, or
        # renamed aside with its internal marker intact
        candidates = ([ck] if os.path.exists(ck) else []) + sorted(
            glob.glob(ck + ".old-*"))
        complete = [c for c in candidates
                    if os.path.exists(os.path.join(c, "_SUCCESS"))]
        assert complete, "crash destroyed every complete checkpoint"
        restored = NearDupIndex.restore(complete[0])
        try:
            assert restored._gen == 1
        finally:
            restored.close()
    finally:
        idx.close()
