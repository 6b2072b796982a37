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
    equal minhash components) >= threshold.  Hash-partitioned joins on each
    endpoint; the verification itself is vectorized per batch."""
    sig_a = sig_ds.map_batches(
        lambda t: _pack_signatures(t, "sig_a"), batch_format="pyarrow"
    )
    sig_b = sig_ds.map_batches(
        lambda t: _pack_signatures(t, "sig_b"), batch_format="pyarrow"
    )
    edges = edges_ds.join(
        sig_a,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("conv_id",),
    )
    edges = edges.join(
        sig_b,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("conv_id",),
    )

    def est(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table(
                {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
            )
        av = _unpack_binary_u64(t["sig_a"], n)
        bv = _unpack_binary_u64(t["sig_b"], n)
        sim = (av == bv).mean(axis=1)
        keep = sim >= threshold
        return pa.table(
            {
                "src": t["src"].combine_chunks().filter(pa.array(keep)),
                "dst": t["dst"].combine_chunks().filter(pa.array(keep)),
            }
        )

    return edges.map_batches(est, batch_format="pyarrow")


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
        edges = verify_edges(edges, sigs, verify_threshold,
                             num_partitions=max(8, num_partitions // 2))
    if cc == "driver":
        return connected_components_driver(edges, sigs)
    return connected_components_distributed(edges, sigs, num_partitions=num_partitions)
