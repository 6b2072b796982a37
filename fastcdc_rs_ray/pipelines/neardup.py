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


def verify_edges(edges_ds, sig_ds, threshold: float, num_partitions: int = 32):
    """Keep candidate edges whose signature-estimated Jaccard (fraction of
    equal minhash components) >= threshold.  Hash-partitioned joins on each
    endpoint; the verification itself is vectorized per batch."""
    edges = edges_ds.join(
        sig_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("conv_id",),
    )
    edges = edges.join(
        sig_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("conv_id",),
        left_suffix="_l",
        right_suffix="_r",
    )

    def est(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
        cols = t.column_names
        a_name = "minhash_l" if "minhash_l" in cols else "minhash"
        b_name = "minhash_r" if "minhash_r" in cols else [c for c in cols if c.startswith("minhash")][-1]
        a = t[a_name].combine_chunks()
        b = t[b_name].combine_chunks()
        n_perms = a.type.list_size
        av = a.flatten().to_numpy().reshape(len(t), n_perms)
        bv = b.flatten().to_numpy().reshape(len(t), n_perms)
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
