"""Incremental NEAR-dup detection against a standing LSH band index.

Extends the shared-mutable-index pattern (stages/stateidx.py — the one
shape the Dataset API can't express) from exact content hashes to the
flagship's MinHash/LSH tier: a persistent index of band keys + compressed
signatures that absorbs each new crawl snapshot in ONE pass, matching new
documents against ALL history without ever re-shuffling it.  The batch
flagship (pipelines/neardup.py) re-banded and re-exchanged the full corpus
per run; between 100 TB snapshots that is exactly the work this index
amortizes away.

Architecture (mirrors stateidx.py's sharding discipline):

- ``n_shards`` actors; each owns TWO key-space slices —
  ``band_key % n_shards``: dict band_key -> capped member list (the LSH
  buckets; the cap bounds hot-band actor memory and is the documented
  recall knob, same role as the flagship's range-split salting), and
  ``conv_key % n_shards``: dict conv_key -> 128-byte compressed signature
  (component LOW BYTES — the flagship's verify estimator, 8x smaller than
  full signatures; estimator bias +(1-J)/256 per component).
- Ingest is two map_batches passes with a materialize() write barrier,
  giving strict snapshot semantics: pass 1 looks up + verifies every new
  doc against the FROZEN pre-snapshot index (docs within one snapshot are
  deliberately not matched to each other — that's the batch flagship's
  job); pass 2 registers the snapshot's bands + signatures.
- Map tasks send one numpy array per (batch, shard); actor loops touch
  band buckets, never rows.

Output per ingested doc: ``matched`` flag + ``match_key`` = conv_key of
the best verified historical match (estimated Jaccard >= tau; ties ->
higher similarity, then lower key — deterministic); unmatched docs carry
matched=False.  Hot-band buckets converge to the cap SMALLEST member keys
(order-free and idempotent, so Ray's at-least-once task retries and
re-crawled identical snapshots cannot consume cap slots or make
membership arrival-order dependent).

At production scale the signature store is the memory bill: 128 B/doc
-> ~128 GB per 10^9 docs, sharded horizontally; band buckets add
n_bands entries/doc.  Signatures for each snapshot would also land in
the partitioned parquet lineage (state/checkpoint.py) so the index is
rebuildable from checkpoint rather than by re-reading text.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .lsh import N_BANDS, band_key_matrix, conv_keys, sig_matrix as _sig_matrix

DEFAULT_BUCKET_CAP = 16


def _index(sorted_list: list[int], v: int) -> int | None:
    """Index of ``v`` in a sorted list, or None."""
    from bisect import bisect_left

    i = bisect_left(sorted_list, v)
    return i if i < len(sorted_list) and sorted_list[i] == v else None


def _shard_class():
    import ray

    @ray.remote(num_cpus=0.25)
    class NearDupShard:
        """One key-space slice of the standing LSH index."""

        def __init__(self, bucket_cap: int = DEFAULT_BUCKET_CAP):
            self.bands: dict[int, list[int]] = {}
            # conv_key -> (ingest generation, compressed signature bytes).
            # The generation stamp makes lookups re-executable: a lineage
            # re-run of a pass-1 lookup task AFTER pass 2 registered the
            # snapshot would otherwise see the snapshot's own entries
            # (self-match at sim 1.0); instead every candidate at
            # gen >= the lookup's generation is filtered out, so a
            # reconstructed lookup returns the original answer.
            self.sigs: dict[int, tuple[int, bytes]] = {}
            self.cap = bucket_cap

        def lookup_bands(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            """band keys -> (flat member conv_keys, per-key counts)."""
            bands = self.bands
            members: list[list[int]] = [bands.get(k, ()) for k in keys.tolist()]
            counts = np.fromiter((len(m) for m in members), np.int64,
                                 count=len(members))
            flat = np.fromiter(
                (v for m in members for v in m), np.uint64,
                count=int(counts.sum()))
            return flat, counts

        def get_sigs(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            """conv_keys -> ((m, sig_bytes) uint8 matrix, (m,) int64 ingest
            generations).  Missing keys get gen = 2^62 (filtered by every
            caller's gen < cur_gen test)."""
            sigs = self.sigs
            rows = [sigs.get(k) for k in keys.tolist()]
            nb = next((len(r[1]) for r in rows if r is not None), 1)
            out = np.full((len(rows), nb), 0xFF, np.uint8)
            gens = np.full(len(rows), 1 << 62, np.int64)
            for i, r in enumerate(rows):
                if r is not None:
                    gens[i] = r[0]
                    out[i] = np.frombuffer(r[1], np.uint8)
            return out, gens

        def add_bands(self, keys: np.ndarray, convs: np.ndarray) -> None:
            """Order-free, idempotent bucket fill: a bucket converges to the
            ``cap`` SMALLEST distinct conv_keys ever offered, whatever the
            arrival order or retry count — so re-crawled identical docs and
            Ray's at-least-once task retries can't consume cap slots, and
            membership under hot-band cap pressure is deterministic (the
            min-set rule; still the documented recall knob)."""
            from bisect import insort

            bands, cap = self.bands, self.cap
            for k, c in zip(keys.tolist(), convs.tolist()):
                cur = bands.get(k)
                if cur is None:
                    bands[k] = [c]
                    continue
                i = _index(cur, c)
                if i is not None:
                    continue  # already a member (idempotent)
                if len(cur) < cap:
                    insort(cur, c)
                elif c < cur[-1]:
                    cur.pop()
                    insort(cur, c)

        def add_sigs(self, keys: np.ndarray, mat: np.ndarray,
                     gen: int) -> None:
            """Idempotent: re-registration keeps the FIRST generation (a
            retried register task or re-crawled doc can't bump a key into
            a later generation and hide it from in-flight lookups)."""
            sigs = self.sigs
            for i, k in enumerate(keys.tolist()):
                cur = sigs.get(k)
                if cur is None or cur[0] > gen:
                    sigs[k] = (gen, mat[i].tobytes())

        def stats(self) -> dict:
            return {"bands": len(self.bands), "sigs": len(self.sigs)}

        def dump_state(self):
            """Shard state as two Arrow tables (plasma-friendly):
            bands expanded to (band_key, conv_key) member rows, sigs as
            (conv_key, gen, sig bytes)."""
            bk, bc = [], []
            for k, members in self.bands.items():
                bk.extend([k] * len(members))
                bc.extend(members)
            bands = pa.table({
                "band_key": pa.array(bk, pa.uint64()),
                "conv_key": pa.array(bc, pa.uint64()),
            })
            sk, sg, sb = [], [], []
            for k, (gen, blob) in self.sigs.items():
                sk.append(k)
                sg.append(gen)
                sb.append(blob)
            sigs = pa.table({
                "conv_key": pa.array(sk, pa.uint64()),
                "gen": pa.array(sg, pa.int64()),
                "sig": pa.array(sb, pa.binary()),
            })
            return bands, sigs

        def load_state(self, bands: pa.Table, sigs: pa.Table) -> None:
            """Rebuild dicts from dump_state() tables.  Bucket lists are
            re-sorted, so membership equals the min-set the live index
            held (add_bands keeps buckets sorted already — sorting again
            is idempotent)."""
            self.bands = {}
            for k, c in zip(bands["band_key"].to_pylist(),
                            bands["conv_key"].to_pylist()):
                self.bands.setdefault(k, []).append(c)
            for m in self.bands.values():
                m.sort()
            self.sigs = {
                k: (g, bytes(b))
                for k, g, b in zip(sigs["conv_key"].to_pylist(),
                                   sigs["gen"].to_pylist(),
                                   sigs["sig"].to_pylist())
            }

    return NearDupShard


def _scatter(shards, method: str, key_of: np.ndarray, *arrays: np.ndarray,
             extra_args: tuple = (), block: bool = True):
    """Route rows to shard actors by ``key_of % n_shards`` and call
    ``method`` once per live shard with each array's selected rows (plus
    ``extra_args`` verbatim).  With ``block`` returns
    ``[(selection_mask, result), ...]``; otherwise returns the raw object
    refs so independent fan-outs can be awaited together.  One helper so
    the refs/masks alignment subtlety lives in exactly one place."""
    import ray

    n = len(shards)
    shard_of = (key_of % np.uint64(n)).astype(np.int64)
    sels = [shard_of == i for i in range(n)]
    live = [i for i in range(n) if sels[i].any()]
    refs = [
        getattr(shards[i], method).remote(
            *(a[sels[i]] for a in arrays), *extra_args)
        for i in live
    ]
    if not block:
        return refs
    return [(sels[i], r) for i, r in zip(live, ray.get(refs))]


class NearDupIndex:
    """Driver-side handle owning the shard actors.

    ``ingest(signatures_ds)`` consumes a (conv_id, minhash) Dataset (the
    flagship's signature schema — from doc_signatures or minhash()) and
    returns a Dataset (conv_id, conv_key, matched, match_key, sim_ppm).
    """

    def __init__(self, n_shards: int = 4, n_bands: int = N_BANDS,
                 tau: float = 0.5, bucket_cap: int = DEFAULT_BUCKET_CAP):
        Shard = _shard_class()
        self.shards = [Shard.remote(bucket_cap) for _ in range(n_shards)]
        self.n_shards = n_shards
        self.n_bands = n_bands
        self.tau = tau
        self.bucket_cap = bucket_cap
        self._gen = 0  # per-ingest generation stamp (see NearDupShard.sigs)

    def checkpoint(self, ckpt_dir: str) -> dict:
        """Persist the standing index to parquet, crash-safely (VERDICT
        r3 item 8, hardened per ADVICE r4): each shard dumps its band
        buckets and signature store to ``shard=<i>/{bands,sigs}.parquet``
        inside a tmp dir; ``meta.json`` (config + generation counter +
        per-shard row counts — the lineage record) lands inside.  The
        OLD checkpoint stays durable until the new one is complete: the
        existing dir is renamed ASIDE (not rmtree'd) before the tmp dir
        renames into place and ``_SUCCESS`` is rewritten, and only then
        is the old copy deleted — a crash at ANY point leaves either the
        previous complete state (marker + payload both intact, or
        recoverable from the ``.old-*`` dir) or the new complete state,
        never neither.  The whole sequence runs under the same flock
        discipline as sources/staging.staged(), so two concurrent
        checkpoint() calls on one ckpt_dir cannot interleave the
        rename chain.  Returns the manifest dict."""
        import json
        import shutil
        import uuid

        import pyarrow.parquet as pq
        import ray

        from ..sources.staging import _exclusive

        dumps = ray.get([s.dump_state.remote() for s in self.shards])
        ckpt_dir = ckpt_dir.rstrip("/")
        tmp = ckpt_dir + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        manifest = {
            "n_shards": self.n_shards, "n_bands": self.n_bands,
            "tau": self.tau, "bucket_cap": self.bucket_cap,
            "gen": self._gen, "shards": [],
        }
        for i, (bands, sigs) in enumerate(dumps):
            sd = os.path.join(tmp, f"shard={i}")
            os.makedirs(sd)
            pq.write_table(bands, os.path.join(sd, "bands.parquet"))
            pq.write_table(sigs, os.path.join(sd, "sigs.parquet"))
            manifest["shards"].append(
                {"shard": i, "band_rows": len(bands), "sig_rows": len(sigs)})
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(manifest, f)
        # the marker lives INSIDE the dir so marker and payload move in
        # the same atomic rename — no window where a marker points at a
        # missing or partial payload
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        with _exclusive(ckpt_dir + ".lock"):
            old = None
            if os.path.exists(ckpt_dir):
                # keep the previous complete state durable (marker AND
                # payload) until the replacement is fully in place
                old = ckpt_dir + f".old-{uuid.uuid4().hex[:8]}"
                os.rename(ckpt_dir, old)
            os.rename(tmp, ckpt_dir)
            if old is not None:
                shutil.rmtree(old, ignore_errors=True)
            # migrate away the legacy sibling marker, if any
            if os.path.exists(ckpt_dir + "._SUCCESS"):
                os.remove(ckpt_dir + "._SUCCESS")
        return manifest

    @classmethod
    def restore(cls, ckpt_dir: str) -> "NearDupIndex":
        """Rebuild a standing index (actors + generation counter) from a
        :meth:`checkpoint` directory — crawl-over-crawl ingest survives
        a job restart without re-reading history."""
        import json

        import pyarrow.parquet as pq
        import ray

        ckpt_dir = ckpt_dir.rstrip("/")
        # marker inside the dir (current format) or legacy sibling
        if not (os.path.exists(os.path.join(ckpt_dir, "_SUCCESS"))
                or os.path.exists(ckpt_dir + "._SUCCESS")):
            raise FileNotFoundError(
                f"no complete index checkpoint at {ckpt_dir} "
                "(_SUCCESS marker missing)")
        with open(os.path.join(ckpt_dir, "meta.json")) as f:
            meta = json.load(f)
        idx = cls(n_shards=meta["n_shards"], n_bands=meta["n_bands"],
                  tau=meta["tau"], bucket_cap=meta["bucket_cap"])
        idx._gen = meta["gen"]
        refs = []
        for i, s in enumerate(idx.shards):
            sd = os.path.join(ckpt_dir, f"shard={i}")
            refs.append(s.load_state.remote(
                pq.read_table(os.path.join(sd, "bands.parquet")),
                pq.read_table(os.path.join(sd, "sigs.parquet"))))
        ray.get(refs)
        return idx

    def ingest(self, sig_ds):
        import ray

        # signatures are computed once and reused by both passes (at scale
        # this materialization is the snapshot's checkpoint artifact)
        sig_ds = sig_ds.materialize()
        shards, n_shards, n_bands, tau = (
            self.shards, self.n_shards, self.n_bands, self.tau)
        cur_gen = self._gen
        self._gen += 1

        def lookup_verify(t: pa.Table) -> pa.Table:
            out_schema = pa.schema(
                [("conv_id", pa.string()), ("conv_key", pa.uint64()),
                 ("matched", pa.bool_()), ("match_key", pa.uint64()),
                 ("sim_ppm", pa.int64())])

            def result(ck, matched, match, best):
                return pa.table({
                    "conv_id": t["conv_id"].combine_chunks(),
                    "conv_key": pa.array(ck, pa.uint64()),
                    "matched": pa.array(matched, pa.bool_()),
                    "match_key": pa.array(match, pa.uint64()),
                    "sim_ppm": pa.array(
                        np.round(best * 1_000_000).astype(np.int64),
                        pa.int64()),
                }).cast(out_schema)

            g = len(t)
            if g == 0:
                return out_schema.empty_table()
            sig = _sig_matrix(t)
            ck = conv_keys(t["conv_id"].combine_chunks())
            bk = band_key_matrix(sig, n_bands)          # (g, n_bands)
            flat_bk = bk.reshape(-1)
            doc_of = np.repeat(np.arange(g, dtype=np.int64), n_bands)
            # one lookup round-trip per shard
            cand_doc_l, cand_key_l = [], []
            for sel, (flat, counts) in _scatter(
                    shards, "lookup_bands", flat_bk, flat_bk):
                if len(flat):
                    cand_doc_l.append(np.repeat(doc_of[sel], counts))
                    cand_key_l.append(flat)
            no_match = (np.zeros(g, bool), np.zeros(g, np.uint64),
                        np.zeros(g, np.float64))
            if not cand_doc_l:
                return result(ck, *no_match)
            cd = np.concatenate(cand_doc_l)
            ckey = np.concatenate(cand_key_l)
            # dedup (doc, candidate) pairs hit via multiple bands
            pair = np.stack([cd.astype(np.uint64), ckey], axis=1)
            pair_view = pair[np.lexsort((ckey, cd))]
            keep = np.ones(len(pair_view), bool)
            keep[1:] = (pair_view[1:] != pair_view[:-1]).any(axis=1)
            cd = pair_view[keep, 0].astype(np.int64)
            ckey = pair_view[keep, 1]
            # fetch candidate signature bytes + generations by conv_key
            uk, inv = np.unique(ckey, return_inverse=True)
            cand_mat = np.empty((len(uk), sig.shape[1]), np.uint8)
            cand_gen = np.empty(len(uk), np.int64)
            for sel, (m, gens) in _scatter(shards, "get_sigs", uk, uk):
                cand_mat[sel] = m
                cand_gen[sel] = gens
            # estimated similarity: fraction of equal component low bytes.
            # Candidates from this ingest's own (or a later) generation are
            # filtered out: a lineage re-execution of this lookup task after
            # register() ran must return the original pre-snapshot answer,
            # not self-matches.
            new_lo = (sig & np.uint64(0xFF)).astype(np.uint8)
            sim = (new_lo[cd] == cand_mat[inv]).mean(axis=1)
            ok = (sim >= tau) & (cand_gen[inv] < cur_gen)
            matched_f, match, best = no_match
            if ok.any():
                cd_ok, key_ok, sim_ok = cd[ok], ckey[ok], sim[ok]
                # per doc: highest sim, ties -> lowest conv_key
                order = np.lexsort((key_ok, -sim_ok, cd_ok))
                first = np.ones(len(order), bool)
                first[1:] = cd_ok[order][1:] != cd_ok[order][:-1]
                w = order[first]
                matched_f[cd_ok[w]] = True
                match[cd_ok[w]] = key_ok[w]
                best[cd_ok[w]] = sim_ok[w]
            return result(ck, matched_f, match, best)

        matched = sig_ds.map_batches(
            lookup_verify, batch_format="pyarrow").materialize()

        def register(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({"n": pa.array([], pa.int64())})
            sig = _sig_matrix(t)
            ck = conv_keys(t["conv_id"].combine_chunks())
            flat_bk = band_key_matrix(sig, n_bands).reshape(-1)
            flat_ck = np.repeat(ck, n_bands)
            lo = (sig & np.uint64(0xFF)).astype(np.uint8)
            # the two fan-outs are independent: submit both, await once
            refs = _scatter(shards, "add_bands", flat_bk, flat_bk, flat_ck,
                            block=False)
            refs += _scatter(shards, "add_sigs", ck, ck, lo,
                             extra_args=(cur_gen,), block=False)
            ray.get(refs)
            return pa.table({"n": pa.array([len(t)], pa.int64())})

        sig_ds.map_batches(register, batch_format="pyarrow").materialize()
        return matched

    def stats(self) -> dict:
        import ray

        per = ray.get([s.stats.remote() for s in self.shards])
        return {"bands": sum(p["bands"] for p in per),
                "sigs": sum(p["sigs"] for p in per)}

    def close(self) -> None:
        import ray

        for a in self.shards:
            ray.kill(a)
        self.shards = []


def incremental_neardup_snapshots(snapshot_sig_dss, n_shards: int = 4,
                                  n_bands: int = N_BANDS, tau: float = 0.5):
    """Convenience driver: ingest signature Datasets snapshot by snapshot
    through one standing index; returns the concatenated match Dataset
    (later snapshots see all earlier ones).  Index actors are torn down
    before returning — persistence across calls is the production point;
    tests exercise multi-snapshot behavior through NearDupIndex directly."""
    if not snapshot_sig_dss:
        raise ValueError("incremental_neardup_snapshots: no snapshots given")
    idx = NearDupIndex(n_shards=n_shards, n_bands=n_bands, tau=tau)
    try:
        outs = [idx.ingest(ds) for ds in snapshot_sig_dss]
        out = outs[0]
        for o in outs[1:]:
            out = out.union(o)
        return out.materialize()
    finally:
        idx.close()
