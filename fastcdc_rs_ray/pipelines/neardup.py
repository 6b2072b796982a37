"""The flagship pipeline: transcripts -> near-duplicate cluster assignments.

    read transcripts                          (streaming blocks)
      -> assemble           [shuffle #1: hash(conv_id)]
      -> chunk              (stateless map_batches; FastCDC v2020 kernel)
      -> minhash            (actor pool; 128 keyed-mix permutations)
      -> bands + salted link[shuffle #2: hash(band_id, band_hash, salt)]
      -> verify (optional)  [signature-estimate Jaccard >= threshold]
      -> connected components (driver union-find | distributed label prop)
      -> clusters (conv_id, cluster_id)

Every stage is a plain ``Dataset -> Dataset`` function, composable and
individually checkpointable (see state.checkpoint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..cdc import ChunkerConfig
from ..stages.assemble import assemble
from ..stages.chunk import DEFAULT_CONFIG, chunk
from ..stages.cc import connected_components_distributed, connected_components_driver
from ..stages.lsh import N_BANDS, N_SALTS, candidate_edges
from ..stages.minhash import N_PERMS, SHINGLE_K, minhash


def signatures_pipeline(
    transcripts_ds,
    cfg: ChunkerConfig | None = None,
    n_perms: int = N_PERMS,
    shingle_k: int = SHINGLE_K,
    seed: int = 7,
    num_partitions: int = 64,
):
    conv = assemble(transcripts_ds, num_partitions=num_partitions)
    chunks = chunk(conv, cfg or DEFAULT_CONFIG)
    return minhash(chunks, n_perms=n_perms, k=shingle_k, seed=seed)


def _pack_signatures(t: pa.Table, out_name: str) -> pa.Table:
    """minhash fixed_size_list<uint64> -> large_binary blob (Arrow joins do
    not support fixed_size_list non-key fields)."""
    g = len(t)
    mh = t["minhash"].combine_chunks()
    nb = mh.type.list_size * 8
    values = np.ascontiguousarray(mh.flatten().to_numpy()).view(np.uint8)
    offs = np.arange(g + 1, dtype=np.int64) * nb
    packed = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), g, [None, pa.py_buffer(offs), pa.py_buffer(values)]
    )
    return pa.table({"conv_id": t["conv_id"], out_name: packed})


def _unpack_binary_u64(col, n_rows: int) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=n_rows + 1 + arr.offset)
    offs = offs[arr.offset : arr.offset + n_rows + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    width = int(offs[1] - offs[0]) if n_rows else 0
    idx = offs[:-1, None] + np.arange(width)
    return data[idx].view(np.uint64)


def verify_edges(edges_ds, sig_ds, threshold: float, num_partitions: int = 32):
    """Keep candidate edges whose signature-estimated Jaccard (fraction of
    equal minhash components) >= threshold.

    Two hash shuffles, no ``Dataset.join`` (Ray's join finalize breaks on
    schema-less empty partitions): (1) endpoint rows and packed-signature
    rows are tag-unioned and co-partitioned on conv_id, where each endpoint
    picks up its signature; (2) the sig-carrying endpoint rows are
    repartitioned on (src, dst) so each edge's two halves meet, and the
    similarity test is one vectorized pass."""
    _EMPTY = pa.schema(
        [
            ("key", pa.string()),
            ("src", pa.string()),
            ("dst", pa.string()),
            ("side", pa.int8()),
            ("sig", pa.large_binary()),
        ]
    )

    def endpoint_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        src = t["src"].combine_chunks()
        dst = t["dst"].combine_chunks()
        key = pa.concat_arrays([src, dst])
        side = np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
        both_src = pa.concat_arrays([src, src])
        both_dst = pa.concat_arrays([dst, dst])
        return pa.table(
            {
                "key": key,
                "src": both_src,
                "dst": both_dst,
                "side": pa.array(side, pa.int8()),
                "sig": pa.nulls(2 * n, pa.large_binary()),
            }
        )

    def sig_rows(t: pa.Table) -> pa.Table:
        packed = _pack_signatures(t, "sig")
        n = len(t)
        return pa.table(
            {
                "key": packed["conv_id"],
                "src": pa.nulls(n, pa.string()),
                "dst": pa.nulls(n, pa.string()),
                "side": pa.array(np.full(n, -1, np.int8), pa.int8()),
                "sig": packed["sig"],
            }
        )

    mixed = edges_ds.map_batches(endpoint_rows, batch_format="pyarrow").union(
        sig_ds.map_batches(sig_rows, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["key"])

    def attach(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sigs = df[df["side"] == -1][["key", "sig"]]
        eps = df[df["side"] >= 0].drop(columns=["sig"])
        out = eps.merge(sigs, on="key", how="inner").drop(columns=["key"])
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(
                [
                    ("src", pa.string()),
                    ("dst", pa.string()),
                    ("side", pa.int8()),
                    ("sig", pa.large_binary()),
                ]
            )
        )

    halves = mixed.map_batches(attach, batch_format="pyarrow", batch_size=None)
    halves = halves.repartition(num_blocks=num_partitions, keys=["src", "dst"])

    def est(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
        )
        n = len(t)
        if n < 2:
            return empty
        order = pc.sort_indices(
            t,
            sort_keys=[("src", "ascending"), ("dst", "ascending"), ("side", "ascending")],
        )
        t = t.take(order)
        src = t["src"].combine_chunks()
        dst = t["dst"].combine_chunks()
        side = t["side"].combine_chunks().to_numpy(zero_copy_only=False)
        # rows come in (side=0, side=1) pairs per edge; guard against strays
        same_edge = (
            pc.equal(src.slice(0, n - 1), src.slice(1)).to_numpy(zero_copy_only=False)
            & pc.equal(dst.slice(0, n - 1), dst.slice(1)).to_numpy(zero_copy_only=False)
        )
        first = np.flatnonzero((side[:-1] == 0) & (side[1:] == 1) & same_edge)
        if len(first) == 0:
            return empty
        sig_all = _unpack_binary_u64(t["sig"], n)
        sim = (sig_all[first] == sig_all[first + 1]).mean(axis=1)
        keep = first[sim >= threshold]
        idx = pa.array(keep, pa.int64())
        return pa.table({"src": src.take(idx), "dst": dst.take(idx)})

    return halves.map_batches(est, batch_format="pyarrow", batch_size=None)


def neardup_clusters(
    transcripts_ds,
    cfg: ChunkerConfig | None = None,
    n_perms: int = N_PERMS,
    shingle_k: int = SHINGLE_K,
    n_bands: int = N_BANDS,
    n_salts: int = N_SALTS,
    seed: int = 7,
    num_partitions: int = 64,
    verify_threshold: float | None = 0.5,
    cc: str = "driver",
):
    """transcripts Dataset -> clusters Dataset (conv_id, cluster_id)."""
    sigs = signatures_pipeline(
        transcripts_ds, cfg, n_perms, shingle_k, seed, num_partitions
    ).materialize()  # reused by banding, verification and the member universe
    edges = candidate_edges(sigs, n_bands=n_bands, n_salts=n_salts,
                            num_partitions=num_partitions)
    if verify_threshold is not None:
        # count() pins the (already small) candidate set; an empty edge set
        # must skip the join — Ray's hash-shuffle join chokes on schema-less
        # empty partitions, and there is nothing to verify anyway.
        edges = edges.materialize()
        if edges.count() > 0:
            edges = verify_edges(edges, sigs, verify_threshold,
                                 num_partitions=max(8, num_partitions // 2))
    if cc == "driver":
        return connected_components_driver(edges, sigs)
    return connected_components_distributed(edges, sigs, num_partitions=num_partitions)
