"""Record linkage: rarest-token blocking + set-Jaccard verify.

The classic entity-resolution shape (a distinct family from the
document near-dup tiers): candidate pairs are generated only within
BLOCKS keyed by each record's RAREST token (rarity measured against the
corpus document-frequency table), then verified with an exact
word-set-Jaccard predicate.  Rarest-token blocking is the standard
trick that keeps linkage sub-quadratic: common tokens never key a
block, and a pair is compared iff BOTH records agree on their rarest
token — a recall trade the SQL oracle mirrors exactly, so the whole
blocking decision is hash-gated, not argued.

Plan: pass 1 reduces each block to (word, df-partial) over the
dimension-sized p_name vocabulary (~100 words) and the driver
broadcasts the merged df map; pass 2 computes each record's rarest
word ((df, word) lexicographic min — bit-deterministic) and ships
(rarest, p_partkey, word-set) rows through ONE keyed exchange; each
partition enumerates pairs within its blocks (hot blocks capped at
``max_block``, exclusion mirrored in the oracle) and verifies
J >= 1/2 via the integer cross-multiplication 3*|A∩B| >= |A|+|B|.

Output: (part_a, part_b, n_common) for linked pairs, part_a < part_b.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_BLOCK = 4096  # hot-block cap, mirrored in the SQL oracle

_OUT = pa.schema([
    ("part_a", pa.int64()), ("part_b", pa.int64()),
    ("n_common", pa.int64()),
])


def _word_sets(t: pa.Table) -> tuple[np.ndarray, list[list[str]]]:
    ids = pc.cast(t["p_partkey"], pa.int64()).to_numpy(zero_copy_only=False)
    words = pc.split_pattern(
        t["p_name"].combine_chunks().cast(pa.string()), " ")
    sets = [sorted(set(w)) for w in words.to_pylist()]
    return ids, sets


def part_name_linkage(part_ds, max_block: int = MAX_BLOCK,
                      num_partitions: int = 8) -> pa.Table:
    import ray

    src = part_ds.select_columns(["p_partkey", "p_name"])

    # pass 1: corpus df over the dimension-sized vocabulary
    def df_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        _ids, sets = _word_sets(t)
        flat: dict[str, int] = {}
        for s in sets:
            for w in s:
                flat[w] = flat.get(w, 0) + 1
        ks = sorted(flat)
        return pa.table({"word": pa.array(ks, pa.string()),
                         "n": pa.array([flat[k] for k in ks], pa.int64())})

    df: dict[str, int] = {}
    for b in src.map_batches(df_partial, batch_format="pyarrow"
                             ).iter_batches(batch_format="pyarrow"):
        for w, n in zip(b["word"].to_pylist(), b["n"].to_pylist()):
            df[w] = df.get(w, 0) + n
    dref = ray.put(df)

    # pass 2: rarest-word rows -> one keyed exchange -> per-block pairs
    mid = pa.schema([
        ("rarest", pa.string()), ("p_partkey", pa.int64()),
        ("words", pa.list_(pa.string())),
    ])

    def tag(t: pa.Table, _dref=dref) -> pa.Table:
        if len(t) == 0:
            return mid.empty_table()
        d = ray.get(_dref)
        ids, sets = _word_sets(t)
        rare = [min(s, key=lambda w: (d[w], w)) for s in sets]
        return pa.table({
            "rarest": pa.array(rare, pa.string()),
            "p_partkey": pa.array(ids, pa.int64()),
            "words": pa.array(sets, pa.list_(pa.string())),
        }).cast(mid)

    ex = src.map_batches(tag, batch_format="pyarrow").repartition(
        num_blocks=num_partitions, keys=["rarest"])

    # global word -> bit index over the dimension-sized vocabulary: each
    # record's word set becomes ceil(V/64) uint64 mask words, so the
    # within-block verify is a vectorized pairwise AND + popcount
    vocab = sorted(df)
    vref = ray.put({w: i for i, w in enumerate(vocab)})
    n_mask_words = max(1, (len(vocab) + 63) // 64)

    def popcount(x: np.ndarray) -> np.ndarray:
        """Vectorized u64 popcount (numpy 1.x has no bitwise_count):
        view as uint8 and table-lookup."""
        tbl = popcount._tbl
        return tbl[x.view(np.uint8)].reshape(*x.shape, 8).sum(
            axis=-1, dtype=np.int64)

    popcount._tbl = np.array(
        [bin(i).count("1") for i in range(256)], np.int64)

    def pairs(t: pa.Table, _vref=vref) -> pa.Table:
        if len(t) == 0:
            return _OUT.empty_table()
        widx = ray.get(_vref)
        rare = np.asarray(t["rarest"].combine_chunks().to_pylist(),
                          dtype=object).astype("U")
        ids = t["p_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        wl = t["words"].combine_chunks().to_pylist()
        masks = np.zeros((len(ids), n_mask_words), np.uint64)
        for r, ws in enumerate(wl):
            for w in ws:
                k = widx[w]
                masks[r, k >> 6] |= np.uint64(1) << np.uint64(k & 63)
        order = np.lexsort((ids, rare))
        rare, ids, masks = rare[order], ids[order], masks[order]
        sizes = popcount(masks).sum(axis=1)
        starts = np.concatenate(
            [[0], np.flatnonzero(rare[1:] != rare[:-1]) + 1, [len(rare)]])
        oa, ob, oc = [], [], []
        for gi in range(len(starts) - 1):
            lo, hi = int(starts[gi]), int(starts[gi + 1])
            g = hi - lo
            if g < 2 or g > max_block:
                continue  # hot-block cap: oracle excludes identically
            m = masks[lo:hi]
            sz = sizes[lo:hi]
            gid = ids[lo:hi]
            # row-chunked pairwise popcount bounds peak memory at
            # chunk x g x mask_words regardless of block size
            chunk = max(1, (1 << 20) // max(1, g * n_mask_words))
            for c0 in range(0, g, chunk):
                c1 = min(g, c0 + chunk)
                inter = popcount(
                    m[c0:c1, None, :] & m[None, :, :]).sum(axis=2)
                hit = 3 * inter >= sz[c0:c1, None] + sz[None, :]
                # upper triangle only (global index i < j)
                rel_i, jj = np.nonzero(hit)
                abs_i = rel_i + c0
                keep = abs_i < jj
                abs_i, jj = abs_i[keep], jj[keep]
                a = np.minimum(gid[abs_i], gid[jj])
                b2 = np.maximum(gid[abs_i], gid[jj])
                oa.append(a)
                ob.append(b2)
                oc.append(inter[rel_i[keep], jj])
        if not oa:
            return _OUT.empty_table()
        return pa.table({
            "part_a": pa.array(np.concatenate(oa), pa.int64()),
            "part_b": pa.array(np.concatenate(ob), pa.int64()),
            "n_common": pa.array(np.concatenate(oc), pa.int64()),
        }).cast(_OUT)

    parts = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ex.map_batches(pairs, batch_format="pyarrow",
                                batch_size=None).iter_batches(
            batch_format="pyarrow")
    ]
    return pa.concat_tables(parts) if parts else _OUT.empty_table()


PART_NAME_LINKAGE_SQL = f"""
WITH wd AS (
  SELECT DISTINCT p_partkey, unnest(string_split(p_name, ' ')) AS word
  FROM part
), df AS (
  SELECT word, COUNT(*) AS df FROM wd GROUP BY word
), sz AS (
  SELECT p_partkey, COUNT(*) AS n FROM wd GROUP BY p_partkey
), rare AS (
  SELECT wd.p_partkey,
         (list(wd.word ORDER BY df.df, wd.word))[1] AS rw
  FROM wd JOIN df ON df.word = wd.word
  GROUP BY wd.p_partkey
), blocks AS (
  SELECT rw FROM rare GROUP BY rw HAVING COUNT(*) <= {MAX_BLOCK}
)
SELECT ra.p_partkey AS part_a, rb.p_partkey AS part_b,
       CAST(COUNT(*) AS BIGINT) AS n_common
FROM rare ra
JOIN blocks ON blocks.rw = ra.rw
JOIN rare rb ON rb.rw = ra.rw AND ra.p_partkey < rb.p_partkey
JOIN wd wa ON wa.p_partkey = ra.p_partkey
JOIN wd wb ON wb.p_partkey = rb.p_partkey AND wb.word = wa.word
JOIN sz sa ON sa.p_partkey = ra.p_partkey
JOIN sz sb ON sb.p_partkey = rb.p_partkey
GROUP BY ra.p_partkey, rb.p_partkey, sa.n, sb.n
HAVING 3 * COUNT(*) >= sa.n + sb.n
"""
