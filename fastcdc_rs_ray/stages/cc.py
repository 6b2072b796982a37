"""Connected components: edges -> cluster assignments.

Two interchangeable implementations behind one interface
(``edges_ds, members_ds -> clusters_ds``):

- :func:`connected_components_driver` — union-find on the driver, streaming
  edge batches (O(V) driver memory; fine up to ~10^8 vertices).
- :func:`connected_components_distributed` — iterative min-label
  propagation WITH pointer jumping: each round (a) flows every vertex's
  label to its neighbors over a vertex-keyed exchange and keeps the
  per-vertex minimum, then (b) shortcuts ``label[v] <- label[label[v]]``
  via a label-keyed exchange.  Plain one-hop propagation alone needs
  O(diameter) rounds — an LSH consecutive-chain component's diameter is
  its member count, so a 10^6-member hot band would need 10^6 rounds; the
  jump step halves the pointer depth each round, giving O(log diameter)
  convergence with no driver state (the 10^12-turn scale path).  If the
  fixpoint is not reached within ``max_rounds`` the function RAISES
  rather than returning silently-fragmented clusters.

cluster_id = min conv_id of the component (deterministic, permutation
invariant).  Vertices with no edges are their own singleton clusters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # min-id wins so cluster_id = min conv_id falls out of the structure
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra


def connected_components_driver(edges_ds, members_ds):
    """Driver union-find. ``members_ds`` supplies the vertex universe
    (column conv_id) so edge-less conversations become singletons.

    The vertex->root mapping is broadcast as two aligned Arrow string
    arrays (buffer-backed, cheap to ship/get) and applied with a
    vectorized ``pc.index_in`` hash lookup per batch — a Python dict here
    costs a full unpickle per task."""
    import pyarrow.compute as pc
    import ray

    uf = _UnionFind()
    for batch in edges_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for s, d in zip(batch["src"].to_pylist(), batch["dst"].to_pylist()):
            uf.union(s, d)
    touched = list(uf.parent.keys())
    keys = pa.array(touched, pa.string())
    labels = pa.array([uf.find(v) for v in touched], pa.string())
    map_ref = ray.put((keys, labels))  # broadcast once

    def assign(t: pa.Table) -> pa.Table:
        ks, ls = ray.get(map_ref)
        conv = t["conv_id"].combine_chunks()
        if len(ks) == 0:
            return pa.table({"conv_id": conv, "cluster_id": conv})
        pos = pc.index_in(conv, value_set=ks)
        hit = pc.is_valid(pos)
        cluster = pc.if_else(hit, ls.take(pc.fill_null(pos, 0)), conv)
        return pa.table({"conv_id": conv, "cluster_id": cluster})

    return members_ds.select_columns(["conv_id"]).map_batches(
        assign, batch_format="pyarrow"
    )


def _to_pandas_exact(t: pa.Table):
    """to_pandas that keeps int64 columns exact under nulls (plain
    to_pandas promotes nullable int64 to float64, which corrupts ids
    above 2^53)."""
    import pandas as pd

    return t.to_pandas(
        types_mapper={pa.int64(): pd.Int64Dtype()}.get)


def _hash_col_u64(arr: pa.Array) -> np.ndarray:
    """Per-row u64 hash of a string OR integer vertex column (fingerprint
    input)."""
    from ..util import hash_str_array_u64

    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return hash_str_array_u64(arr)
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(
        np.uint64)


def _sever(mds):
    """Re-wrap a MaterializedDataset's blocks as a fresh Dataset, dropping
    the logical-plan history.  Each CC round unions two datasets derived
    from the previous round's labels, so the carried plan DAG doubles
    every round; Ray Data walks that DAG as a tree at execution setup and
    per-round wall time turns exponential (measured 1 s -> 35 s by round
    12 at 2,000 constant rows; flat ~0.9 s/round with the sever).
    Zero-copy: block object refs only."""
    import ray.data as rd

    return rd.from_arrow_refs(mds.to_arrow_refs())


def connected_components_distributed(
    edges_ds, members_ds, max_rounds: int = 50, num_partitions: int = 32,
    vertex_type: pa.DataType = pa.string(),
):
    """Iterative min-label propagation, fully inside Ray Data (see module
    docstring).  Exercised at small scale in tests; equivalent output to the
    driver variant.

    ``vertex_type`` is the Arrow type of src/dst/conv_id (string for the
    flagship's conv keys; int64 for numeric graphs such as the co-purchase
    part graph).  cluster_id = component-minimum vertex under that type's
    natural order."""
    from ..util import shuffle_safe_partitions

    # Each round's plan holds TWO keyed hash-shuffles live at once
    # (propagate-combine and pointer-jump); clamp so their aggregator
    # actors cannot reserve every CPU away from the map tasks feeding
    # them (observed deadlock: p=16 x 2 shuffles on a 4-CPU session).
    num_partitions = shuffle_safe_partitions(
        num_partitions, concurrent_shuffles=3.0)

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
                "u": pa.concat_arrays(
                    [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                ),
            }
        )

    edges = _sever(
        edges_ds.map_batches(both_dirs, batch_format="pyarrow").materialize())
    labels = (
        members_ds.select_columns(["conv_id"])
        .map_batches(
            lambda t: pa.table({"v": t["conv_id"], "label": t["conv_id"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    labels = _sever(labels)

    def _fingerprint(ds) -> int:
        """Order-insensitive xor of per-row (v, label) hashes.  Reduced to
        ONE u64 per block inside map_batches — the driver never sees the
        label table itself (it is corpus-sized)."""

        def block_xor(b: pa.Table) -> pa.Table:
            from ..util import mix64

            if len(b) == 0:
                return pa.table({"x": pa.array([], pa.uint64())})
            hv = _hash_col_u64(b["v"].combine_chunks())
            hl = _hash_col_u64(b["label"].combine_chunks())
            x = np.bitwise_xor.reduce(mix64(hv ^ hl))
            return pa.table({"x": pa.array([x], pa.uint64())})

        s = np.uint64(0)
        for b in ds.map_batches(
            block_xor, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                s ^= np.bitwise_xor.reduce(
                    b["x"].combine_chunks().to_numpy())
        return int(s)

    def _settle(deadline_s: float = 10.0) -> None:
        """Wait for the previous round's hash-shuffle aggregator actors to
        release their CPU reservations.  Teardown is asynchronous; without
        this, reservations accumulate round over round and later rounds'
        shuffles queue behind phantom CPUs (measured: per-round wall
        doubling from 1 s to 35 s by round 12 on a 32-cpu session — 162 s
        total vs 27 s with the settle)."""
        import time

        import ray

        total = float(ray.cluster_resources().get("CPU", 0.0))
        t0 = time.monotonic()
        while time.monotonic() - t0 < deadline_s:
            if ray.available_resources().get("CPU", 0.0) >= total - 0.01:
                return
            time.sleep(0.1)

    prev_fp = _fingerprint(labels)
    for _ in range(max_rounds):
        _settle()
        e2 = edges.map_batches(
            lambda t: pa.table(
                {
                    "v": t["v"],
                    "u": t["u"],
                    "label": pa.nulls(len(t), vertex_type),
                }
            ),
            batch_format="pyarrow",
        )
        l2 = labels.map_batches(
            lambda t: pa.table(
                {
                    "v": t["v"],
                    "u": pa.nulls(len(t), vertex_type),
                    "label": t["label"],
                }
            ),
            batch_format="pyarrow",
        )
        both = e2.union(l2).repartition(num_blocks=num_partitions, keys=["v"])

        def propagate(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = _to_pandas_exact(t)
            lab = df[df["label"].notna()][["v", "label"]]
            edg = df[df["u"].notna()][["v", "u"]]
            merged = edg.merge(lab, on="v", how="left")
            cand = merged[["u", "label"]].rename(columns={"u": "v"}).dropna()
            allc = pd.concat([lab, cand])
            out = allc.groupby("v", as_index=False)["label"].min()
            return pa.Table.from_pandas(out, preserve_index=False)

        # After this propagation the new label of u is min(own, neighbors');
        # but candidates for u land in u's partition only if we shuffle them
        # there — propagate emits (v=u, label) rows which ARE in v's
        # partition of the *next* round.  One more min-combine round fixes
        # the split: repartition by v and take per-vertex min.
        cand = both.map_batches(propagate, batch_format="pyarrow", batch_size=None)
        cand = cand.repartition(num_blocks=num_partitions, keys=["v"])

        def combine(t: pa.Table) -> pa.Table:
            df = _to_pandas_exact(t)
            out = df.groupby("v", as_index=False)["label"].min()
            return pa.Table.from_pandas(out, preserve_index=False)

        labels = _sever(cand.map_batches(
            combine, batch_format="pyarrow", batch_size=None
        ).materialize())

        # pointer jump: label[v] <- label[label[v]].  Tag-union keyed on the
        # LABEL value: each vertex row asks for its label's label, each
        # label-table row answers for its own vertex id.  Labels only ever
        # decrease, so label[l] <= l and the jump halves pointer-chain depth
        # every round (O(log diameter) total rounds).
        queries = labels.map_batches(
            lambda t: pa.table(
                {"key": t["label"], "v": t["v"],
                 "label": pa.nulls(len(t), vertex_type)}),
            batch_format="pyarrow",
        )
        values = labels.map_batches(
            lambda t: pa.table(
                {"key": t["v"], "v": pa.nulls(len(t), vertex_type),
                 "label": t["label"]}),
            batch_format="pyarrow",
        )
        tagged = queries.union(values).repartition(
            num_blocks=num_partitions, keys=["key"])

        def jump(t: pa.Table) -> pa.Table:
            df = _to_pandas_exact(t)
            vals = df[df["v"].isna()][["key", "label"]]
            qs = df[df["label"].isna()][["key", "v"]]
            m = qs.merge(vals, on="key", how="left")
            # every label IS a vertex id, so a miss can't happen; keep the
            # key as a defensive identity fallback
            m["label"] = m["label"].fillna(m["key"])
            return pa.Table.from_pandas(
                m[["v", "label"]], preserve_index=False)

        labels = _sever(tagged.map_batches(
            jump, batch_format="pyarrow", batch_size=None
        ).materialize())

        fp = _fingerprint(labels)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components_distributed did not converge within "
            f"{max_rounds} rounds — returning would silently fragment "
            f"clusters; raise max_rounds (rounds needed ~ log2 of the "
            f"largest component diameter)")

    return labels.map_batches(
        lambda t: pa.table({"conv_id": t["v"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )
