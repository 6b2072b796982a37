"""LSH banding stage: signatures -> bands -> candidate edges.

b bands x r rows (default 32 x 4 = 128) over the MinHash signature; a band's
hash collides for two conversations iff their signatures agree on all r
components, so the candidate-pair probability follows the classic
(1 - (1 - j^r)^b) S-curve.

Scale design (the north rule's "explicit salting for hot bands"):

- Pair emission is *linear*, not quadratic: within a (band_id, band_hash)
  group the members are sorted and linked consecutively — connectivity (and
  therefore cluster assignments) is identical to emitting all O(n^2) pairs,
  but a boilerplate band with 10^6 members emits 10^6 - 1 edges.
- Hot-band salting: every band row also carries ``salt = conv_hash % S``;
  the shuffle key is (band_id, band_hash, salt), so a giant group splits
  across S reducers.  Each salted subgroup additionally emits its minimum
  member as a *representative* row; a second (tiny) groupby over
  representatives links the subgroups, restoring full connectivity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import U64, mix64, hash_str_array_u64

N_BANDS = 32
N_SALTS = 8


def bands_from_signatures(t: pa.Table, n_bands: int = N_BANDS, n_salts: int = N_SALTS) -> pa.Table:
    """signatures batch -> exploded bands (band_id, band_hash, salt, conv_id)."""
    g = len(t)
    if g == 0:
        return pa.table(
            {
                "band_id": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.uint64()),
                "salt": pa.array([], pa.int32()),
                "conv_id": pa.array([], pa.string()),
            }
        )
    sigcol = t["minhash"].combine_chunks()
    n_perms = sigcol.type.list_size
    r = n_perms // n_bands
    sig = sigcol.flatten().to_numpy().reshape(g, n_perms)
    # band hash: chained mix over the r components + band id
    bh = np.empty((g, n_bands), dtype=np.uint64)
    for b in range(n_bands):
        acc = mix64(np.full(g, b, dtype=np.uint64))
        for j in range(r):
            acc = mix64(acc ^ sig[:, b * r + j])
        bh[:, b] = acc
    conv = t["conv_id"].combine_chunks()
    salt = (hash_str_array_u64(conv) % U64(n_salts)).astype(np.int32)
    band_id = np.broadcast_to(np.arange(n_bands, dtype=np.int32), (g, n_bands))
    rep_idx = pa.array(np.repeat(np.arange(g, dtype=np.int64), n_bands))
    return pa.table(
        {
            "band_id": pa.array(band_id.reshape(-1), pa.int32()),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
            "salt": pa.array(np.repeat(salt, n_bands), pa.int32()),
            "conv_id": conv.take(rep_idx),
        }
    )


def _link_consecutive(t: pa.Table, keys: list[str]) -> tuple[pa.Table, pa.Table]:
    """Sort by keys + conv_id; emit consecutive-link edges within groups and
    one representative (min conv_id) row per group."""
    n = len(t)
    if n == 0:
        empty_edges = pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
        )
        return empty_edges, t
    order = pc.sort_indices(
        t, sort_keys=[(k, "ascending") for k in keys] + [("conv_id", "ascending")]
    )
    t = t.take(order)
    same = np.ones(n - 1, dtype=bool)
    for k in keys:
        col = t[k].combine_chunks()
        eq = pc.equal(col.slice(1), col.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        same &= eq
    conv = t["conv_id"].combine_chunks()
    link = np.flatnonzero(same)  # edge conv[i] -- conv[i+1]
    edges = pa.table(
        {
            "src": conv.take(pa.array(link, pa.int64())),
            "dst": conv.take(pa.array(link + 1, pa.int64())),
        }
    )
    group_starts = np.concatenate([[0], np.flatnonzero(~same) + 1]).astype(np.int64)
    reps = t.take(pa.array(group_starts, pa.int64()))
    return edges, reps


def candidate_edges(sig_ds, n_bands: int = N_BANDS, n_salts: int = N_SALTS,
                    num_partitions: int = 64):
    """signatures Dataset -> edges Dataset (salted two-level band linking)."""
    bands = sig_ds.map_batches(
        lambda t: bands_from_signatures(t, n_bands, n_salts),
        batch_format="pyarrow",
    )
    bands = bands.repartition(num_blocks=num_partitions, keys=["band_id", "band_hash", "salt"])

    def level1(t: pa.Table) -> pa.Table:
        edges, reps = _link_consecutive(t, ["band_id", "band_hash", "salt"])
        # tag and union: kind 0 = edge, kind 1 = representative
        e = pa.table(
            {
                "src": edges["src"],
                "dst": edges["dst"],
                "band_id": pa.array(np.zeros(len(edges), np.int32), pa.int32()),
                "band_hash": pa.array(np.zeros(len(edges), np.uint64), pa.uint64()),
                "kind": pa.array(np.zeros(len(edges), np.int8), pa.int8()),
            }
        )
        rp = pa.table(
            {
                "src": reps["conv_id"],
                "dst": reps["conv_id"],
                "band_id": reps["band_id"],
                "band_hash": reps["band_hash"],
                "kind": pa.array(np.ones(len(reps), np.int8), pa.int8()),
            }
        )
        return pa.concat_tables([e, rp])

    # Both the edge stream and the representative stream consume `level1`;
    # without a materialization the lazy upstream (bands + shuffle) would
    # execute twice.  At 10^12-turn scale this materialize becomes a
    # parquet checkpoint (state.checkpoint) instead of object-store pinning.
    mixed = bands.map_batches(level1, batch_format="pyarrow", batch_size=None).materialize()
    edges1 = mixed.filter(expr="kind == 0").select_columns(["src", "dst"])
    reps = mixed.filter(expr="kind == 1").select_columns(["band_id", "band_hash", "src"])
    # level 2: link representatives across salts (small: <= n_salts rows per
    # distinct (band_id, band_hash))
    reps = reps.map_batches(
        lambda t: t.rename_columns(["band_id", "band_hash", "conv_id"]),
        batch_format="pyarrow",
    )
    reps = reps.repartition(num_blocks=max(8, num_partitions // 8), keys=["band_id", "band_hash"])

    def level2(t: pa.Table) -> pa.Table:
        edges, _ = _link_consecutive(t, ["band_id", "band_hash"])
        return edges

    edges2 = reps.map_batches(level2, batch_format="pyarrow", batch_size=None)
    return edges1.union(edges2)
