"""Storage-locality ordering: write near-duplicates ADJACENTLY and the
compressed shards shrink — the storage-cost lever of dedup-aware layout
(gzip/zstd only see a ~32 KB window, so a duplicate helps only if its twin
sits nearby; a hash-of-id layout scatters twins across 100 TB where no
codec can reach them).

``locality_compression`` measures the lever honestly on the engine's own
machinery: the SAME corpus is sharded and ordered two ways — by document
id (the naive layout) and by SimHash (near-dups share the signature's top
bits, so they land in the same shard and sort adjacent) — each shard is
gzipped inside its block, and the two one-row totals come back for
comparison.  Everything is deterministic (fixed zlib level, keyed
exchange, in-block sort), so the saving is a reproducible number, not an
anecdote.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import simhash_batch

OUT_SCHEMA = pa.schema(
    [("ordering", pa.string()), ("n_docs", pa.int64()),
     ("raw_bytes", pa.int64()), ("gz_bytes", pa.int64())]
)

_PART = pa.schema(
    [("n_docs", pa.int64()), ("raw_bytes", pa.int64()),
     ("gz_bytes", pa.int64())]
)


def _shard_bytes(sort_cols):
    """Per-block: order rows by ``sort_cols``, gzip the concatenated texts
    once (one shard per block), emit a one-row size partial."""
    import zlib

    def per_block(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(t) == 0:
            return _PART.empty_table()
        t = t.take(pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in sort_cols]))
        blob = "\n".join(t["text"].to_pylist()).encode()
        return pa.table({
            "n_docs": pa.array([len(t)], pa.int64()),
            "raw_bytes": pa.array([len(blob)], pa.int64()),
            "gz_bytes": pa.array([len(zlib.compress(blob, 6))], pa.int64()),
        })

    return per_block


def _total(ds, ordering: str) -> pa.Table:
    parts = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow")
    )
    return pa.table({
        "ordering": pa.array([ordering], pa.string()),
        "n_docs": pa.array(
            [int(parts["n_docs"].combine_chunks().to_numpy().sum())], pa.int64()),
        "raw_bytes": pa.array(
            [int(parts["raw_bytes"].combine_chunks().to_numpy().sum())], pa.int64()),
        "gz_bytes": pa.array(
            [int(parts["gz_bytes"].combine_chunks().to_numpy().sum())], pa.int64()),
    })


def locality_compression(documents_ds, num_partitions: int = 8) -> pa.Table:
    """documents -> two rows (ordering in {'doc_id', 'simhash'}): total
    gzip bytes of the corpus sharded+ordered each way.  The simhash row's
    ``gz_bytes`` is smaller whenever the corpus carries near-duplicates —
    the measured saving of locality-aware layout.
    """

    def with_keys(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "simhash": pa.array([], pa.uint64()),
                "sh_shard": pa.array([], pa.int64()),
                "id_shard": pa.array([], pa.int64()),
            })
        sig = simhash_batch(t)["simhash"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        # simhash top bits shard near-dups together; golden-mix scatters ids
        sh_shard = (sig >> np.uint64(64 - 16)).astype(np.int64) % num_partitions
        id_shard = (
            (did.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(48)
        ).astype(np.int64) % num_partitions
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "text": t["text"].combine_chunks(),
            "simhash": pa.array(sig, pa.uint64()),
            "sh_shard": pa.array(sh_shard, pa.int64()),
            "id_shard": pa.array(id_shard, pa.int64()),
        })

    keyed = documents_ds.map_batches(
        with_keys, batch_format="pyarrow").materialize()

    base = keyed.repartition(
        num_blocks=num_partitions, keys=["id_shard"]).map_batches(
        _shard_bytes(["doc_id"]), batch_format="pyarrow", batch_size=None)
    loc = keyed.repartition(
        num_blocks=num_partitions, keys=["sh_shard"]).map_batches(
        _shard_bytes(["simhash", "doc_id"]), batch_format="pyarrow",
        batch_size=None)
    return pa.concat_tables(
        [_total(base, "doc_id"), _total(loc, "simhash")]).cast(OUT_SCHEMA)
