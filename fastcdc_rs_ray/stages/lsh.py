"""LSH banding stage: signatures -> bands -> candidate edges.

b bands x r rows (default 32 x 4 = 128) over the MinHash signature; a band's
hash collides for two conversations iff their signatures agree on all r
components, so the candidate-pair probability follows the classic
(1 - (1 - j^r)^b) S-curve.

Scale design (the widest exchange of the pipeline — n_bands x corpus rows):

- **Lean rows**: two uint64 columns (band key, conv key).  A 64-bit key
  collision can only merge two unrelated groups (never drop an edge), and
  the signature-verification stage filters those — recall unaffected.
- **Range-sort exchange, not hash shuffle**: ``Dataset.sort(band_key)``
  co-locates equal keys with a task-based range shuffle (measured 4-6x
  cheaper than the aggregator-actor hash shuffle at every partition
  count).  Equal-key runs may straddle adjacent sorted blocks; per-block
  consecutive linking plus a driver-side **boundary stitch** (one tiny row
  per block) restores full connectivity.
- **Skew (hot bands) falls out for free**: a boilerplate band with 10^6
  members becomes one long sorted run *split across blocks by the range
  partitioner* — each block links its slice linearly (emission is linear,
  never O(n^2)), and the stitch joins the slices.  No explicit salting
  machinery needed; candidate CONNECTIVITY is identical to emitting all
  pairs.  (Cluster assignments are identical too when verification is off
  or the candidates pass uniformly; with per-edge verification at a
  threshold, chain edges are a subset of all pairs, so a borderline group
  can verify differently than all-pairs emission would — the recall
  harness measures the end-to-end effect, >=0.99 at the reference config.
  Chain edges are made deterministic by (band_key, conv_key) ordering
  inside _link_block and min-conv representatives in the stitch.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import U64, mix64

N_BANDS = 32
# retained for API compatibility: salting is subsumed by range-sort block
# splitting + boundary stitching (see module docstring)
N_SALTS = 8


def conv_keys(conv_col) -> np.ndarray:
    """Deterministic u64 vertex key per conv_id.  All wide LSH exchanges
    move only fixed-width u64 columns (a string id column measured 16x
    slower through Ray's range/hash exchanges); the string id is re-attached
    after verification.  A key collision (~n^2/2^65: ~6e-7 at 5M convs)
    can only merge two conversations into one cluster."""
    from ..util import hash_str_array_u64

    return hash_str_array_u64(conv_col)


def sig_matrix(t: pa.Table) -> np.ndarray:
    """(g, n_perms) uint64 view of a signatures batch's ``minhash``
    fixed-size-list column."""
    col = t["minhash"].combine_chunks()
    return col.flatten().to_numpy().reshape(len(t), col.type.list_size)


def band_key_matrix(sig: np.ndarray, n_bands: int = N_BANDS) -> np.ndarray:
    """(g, n_perms) signature matrix -> (g, n_bands) uint64 band keys
    (chained mix over each band's r components + band id)."""
    g, n_perms = sig.shape
    if n_perms < n_bands or n_perms % n_bands:
        raise ValueError(
            f"n_perms ({n_perms}) must be a positive multiple of n_bands "
            f"({n_bands}); r = n_perms // n_bands rows per band would "
            f"otherwise silently drop signature components (r=0 would "
            f"collide every row in every band)")
    r = n_perms // n_bands
    key = np.empty((g, n_bands), dtype=np.uint64)
    for b in range(n_bands):
        acc = mix64(np.full(g, b, dtype=np.uint64))
        for j in range(r):
            acc = mix64(acc ^ sig[:, b * r + j])
        key[:, b] = acc
    return key


def bands_from_signatures(t: pa.Table, n_bands: int = N_BANDS) -> pa.Table:
    """signatures batch -> exploded band rows (band_key, conv_key)."""
    g = len(t)
    if g == 0:
        return pa.table(
            {
                "band_key": pa.array([], pa.uint64()),
                "conv_key": pa.array([], pa.uint64()),
            }
        )
    sig = sig_matrix(t)
    key = band_key_matrix(sig, n_bands)
    ck = conv_keys(t["conv_id"].combine_chunks())
    return pa.table(
        {
            "band_key": pa.array(key.reshape(-1), pa.uint64()),
            "conv_key": pa.array(np.repeat(ck, n_bands), pa.uint64()),
        }
    )


def _link_block(t: pa.Table) -> pa.Table:
    """Within one sorted block: consecutive-link equal-key neighbors.

    Rows are re-ordered by (band_key, conv_key) first: the range sort only
    orders by band_key, so ties within an equal-key run would otherwise
    follow arbitrary arrival order and the emitted chain edges would vary
    run to run (connectivity is order-independent, but downstream per-edge
    similarity verification is not)."""
    n = len(t)
    if n < 2:
        return pa.table(
            {"src": pa.array([], pa.uint64()), "dst": pa.array([], pa.uint64())}
        )
    kv = t["band_key"].combine_chunks().to_numpy()
    conv = t["conv_key"].combine_chunks().to_numpy()
    order = np.lexsort((conv, kv))
    kv, conv = kv[order], conv[order]
    link = np.flatnonzero(kv[1:] == kv[:-1])
    return pa.table(
        {
            "src": pa.array(conv[link], pa.uint64()),
            "dst": pa.array(conv[link + 1], pa.uint64()),
        }
    )


def _block_boundary(t: pa.Table) -> pa.Table:
    """One row per non-empty sorted block: its first/last key, each with
    the MINIMUM conv in that key's run (deterministic representative —
    row order within an equal-key run is arrival order)."""
    n = len(t)
    if n == 0:
        return pa.table(
            {
                "first_key": pa.array([], pa.uint64()),
                "first_conv": pa.array([], pa.uint64()),
                "last_key": pa.array([], pa.uint64()),
                "last_conv": pa.array([], pa.uint64()),
            }
        )
    kv = t["band_key"].combine_chunks().to_numpy()
    conv = t["conv_key"].combine_chunks().to_numpy()
    return pa.table(
        {
            "first_key": pa.array(kv[:1], pa.uint64()),
            "first_conv": pa.array([conv[kv == kv[0]].min()], pa.uint64()),
            "last_key": pa.array(kv[-1:], pa.uint64()),
            "last_conv": pa.array([conv[kv == kv[-1]].min()], pa.uint64()),
        }
    )


def candidate_edges(sig_ds, n_bands: int = N_BANDS, n_salts: int = N_SALTS,
                    num_partitions: int = 64):
    """signatures Dataset -> edges Dataset (sorted linking + boundary stitch).

    ``n_salts``/``num_partitions`` are accepted for interface stability; the
    sort path needs neither (block count follows the sort's range
    partitioning).
    """
    import ray.data as rd

    bands = sig_ds.map_batches(
        lambda t: bands_from_signatures(t, n_bands),
        batch_format="pyarrow",
    )
    # coalesce before the sort: the range exchange creates in-blocks x
    # out-blocks partition objects, so hundreds of input blocks explode the
    # object count (253s -> ~10s at 153M rows after coalescing to 64)
    bands = bands.repartition(64)
    srt = bands.sort("band_key").materialize()
    edges = srt.map_batches(_link_block, batch_format="pyarrow", batch_size=None)

    # boundary stitch: Dataset row order == sorted order, so consecutive
    # non-empty blocks whose adjacent (last_key, first_key) match get one
    # linking edge.  O(num_blocks) driver work.
    bounds = [
        b
        for b in srt.map_batches(
            _block_boundary, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if bounds:
        bt = pa.concat_tables(bounds)  # one row per non-empty block
        m = len(bt)
        last_k = bt["last_key"].combine_chunks().to_numpy()
        first_k = bt["first_key"].combine_chunks().to_numpy()
        # Re-establish the range order explicitly: iter_batches does NOT
        # guarantee sorted-dataset block order under the streaming executor
        # (preserve_order defaults off), and a permuted boundary list would
        # silently drop cross-block links for runs straddling blocks.
        # Blocks hold disjoint key ranges (equal keys may share endpoints),
        # so (first_key, last_key) lexorder IS the range order.
        order = np.lexsort((last_k, first_k))
        bt = bt.take(pa.array(order, pa.int64()))
        last_k, first_k = last_k[order], first_k[order]
        hit = np.flatnonzero(last_k[:-1] == first_k[1:]) if m > 1 else np.array([], int)
        stitch = pa.table(
            {
                "src": bt["last_conv"].combine_chunks().take(pa.array(hit, pa.int64())),
                "dst": bt["first_conv"].combine_chunks().take(pa.array(hit + 1, pa.int64())),
            }
        )
    else:
        stitch = pa.table(
            {"src": pa.array([], pa.uint64()), "dst": pa.array([], pa.uint64())}
        )
    return edges.union(rd.from_arrow(stitch))
