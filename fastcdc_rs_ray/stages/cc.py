"""Connected components: edges -> cluster assignments.

Two interchangeable implementations behind one interface
(``edges_ds, members_ds -> clusters_ds``):

- :func:`connected_components_driver` — union-find on the driver, streaming
  edge batches (O(V) driver memory; fine up to ~10^8 vertices).
- :func:`connected_components_distributed` — iterative min-label
  propagation in the hash-to-min family (Rastogi et al. 2013): each
  round, TWO keyed exchanges.  Stage 1 (keyed on k) co-locates label[k]
  with its consumers and emits candidates: neighbor propagation (edge
  rows), the forward pointer jump ``label[label[v]]`` (query rows), and
  v's own label.  Stage 2 (keyed on v) takes the per-vertex minimum AND
  emits the REVERSE message — the new label sent to the OLD label vertex,
  consumed as a plain candidate next round.  The reverse message is what
  makes this O(log n) rounds: forward jumping alone bottoms out at local
  minima whose own labels improve only at one hop per round, i.e.
  O(diameter) total (measured: 81 rounds on the sf0.1 co-purchase graph,
  301 on a simulated 1000-node path; with the reverse message, 19 and 31
  rounds on simulated 1k/100k-node paths).  Plain one-hop propagation is
  hopeless for an LSH consecutive-chain component whose diameter is its
  member count — a 10^6-member hot band would need 10^6 rounds.  If the
  fixpoint is not reached within ``max_rounds`` the function RAISES
  rather than returning silently-fragmented clusters.

cluster_id = min conv_id of the component (deterministic, permutation
invariant).  Vertices with no edges are their own singleton clusters.

Pattern context (PAPERS.md): the reverse-message formulation is the
hash-to-min family (Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE 2013); load-balanced
distributed union-find structures (BTS, ICDE 2024) are the published
next step when per-key skew in the label exchange itself becomes the
bottleneck — our exchange rows are already per-vertex (not per-edge)
after the stage-2 min, which is the same balancing goal.
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

    def _settle(deadline_s: float = 2.0) -> None:
        """Give the previous round's hash-shuffle aggregator actors a
        moment to release their CPU reservations (teardown is
        asynchronous).  The threshold is DELIBERATELY loose — 75% of the
        cluster, short deadline: this loop only guards against a round
        launching into a half-torn-down pool; demanding FULL availability
        made every round burn the whole deadline inside a bench suite
        where unrelated leftover actors hold fractional CPUs (measured:
        part_components 26 s solo vs 98 s in-suite at the old
        full-availability/10 s setting)."""
        import time

        import ray

        total = float(ray.cluster_resources().get("CPU", 0.0))
        t0 = time.monotonic()
        while time.monotonic() - t0 < deadline_s:
            if ray.available_resources().get("CPU", 0.0) >= total * 0.75:
                return
            time.sleep(0.1)

    cand_schema = pa.schema([
        ("v", vertex_type), ("label", vertex_type), ("tag", pa.int8())])
    stage1_schema = pa.schema([
        ("k", vertex_type), ("u", vertex_type),
        ("origin", vertex_type), ("label", vertex_type)])

    rev = None  # reverse-pointer candidates carried from the previous round
    prev_fp = _fingerprint(labels)
    for _ in range(max_rounds):
        _settle()
        # ---- stage 1 (keyed on k): every consumer of label[k] meets the
        # label row of k — edge rows (neighbor propagation), query rows
        # (forward pointer jump label[label[v]]).
        e2 = edges.map_batches(
            lambda t: pa.table({
                "k": t["v"], "u": t["u"],
                "origin": pa.nulls(len(t), vertex_type),
                "label": pa.nulls(len(t), vertex_type),
            }).cast(stage1_schema),
            batch_format="pyarrow",
        )
        l2 = labels.map_batches(
            lambda t: pa.table({
                "k": t["v"], "u": pa.nulls(len(t), vertex_type),
                "origin": pa.nulls(len(t), vertex_type), "label": t["label"],
            }).cast(stage1_schema),
            batch_format="pyarrow",
        )
        q2 = labels.map_batches(
            lambda t: pa.table({
                "k": t["label"], "u": pa.nulls(len(t), vertex_type),
                "origin": t["v"],
                "label": pa.nulls(len(t), vertex_type),
            }).cast(stage1_schema),
            batch_format="pyarrow",
        )
        stage1 = e2.union(l2).union(q2).repartition(
            num_blocks=num_partitions, keys=["k"])

        def answer(t: pa.Table, _cs=cand_schema) -> pa.Table:
            import pandas as pd

            if len(t) == 0:
                return _cs.empty_table()
            df = _to_pandas_exact(t)
            lab = df[df["label"].notna()][["k", "label"]]
            ident = lab.rename(columns={"k": "v"}).copy()
            ident["tag"] = np.int8(1)  # v's OWN label, tagged old
            edg = df[df["u"].notna()][["k", "u"]].merge(lab, on="k",
                                                        how="left")
            nb = edg[["u", "label"]].rename(columns={"u": "v"}).dropna()
            nb["tag"] = np.int8(0)
            qs = df[df["origin"].notna()][["k", "origin"]].merge(
                lab, on="k", how="left")
            jmp = qs[["origin", "label"]].rename(
                columns={"origin": "v"}).dropna()
            jmp["tag"] = np.int8(0)
            out = pd.concat([ident, nb, jmp])
            return pa.Table.from_pandas(
                out[["v", "label", "tag"]], preserve_index=False).cast(_cs)

        cand = stage1.map_batches(answer, batch_format="pyarrow",
                                  batch_size=None)
        if rev is not None:
            cand = cand.union(rev)
        cand = cand.repartition(num_blocks=num_partitions, keys=["v"])

        # ---- stage 2 (keyed on v): new label = min of all candidates.
        # ALSO emit the hash-to-min REVERSE message — send the new label
        # to the OLD label vertex (tag-2 rows, consumed as plain
        # candidates next round).  Without it, every pointer chain
        # bottoms out at a local minimum whose own label improves only at
        # propagation speed, and convergence is O(diameter) (measured: 81
        # rounds on the sf0.1 co-purchase graph, 301 on a simulated
        # 1000-path); with it the min's reach compounds geometrically —
        # O(log n) rounds (simulated: 19 on the 1000-path, 31 on a
        # 100k-path).
        def combine(t: pa.Table, _cs=cand_schema) -> pa.Table:
            if len(t) == 0:
                return _cs.empty_table()
            import pandas as pd

            df = _to_pandas_exact(t)
            new = df.groupby("v", as_index=False)["label"].min()
            new["tag"] = np.int8(2)  # label rows
            old = df[df["tag"] == 1][["v", "label"]].rename(
                columns={"label": "old"})
            m = new.merge(old, on="v", how="left")
            snd = m[m["old"].notna() & (m["old"] != m["label"])]
            rev_rows = pd.DataFrame({
                "v": snd["old"], "label": snd["label"],
                "tag": np.int8(3),  # reverse candidates for next round
            })
            out = pd.concat([new[["v", "label", "tag"]], rev_rows])
            return pa.Table.from_pandas(
                out, preserve_index=False).cast(_cs)

        both = _sever(cand.map_batches(
            combine, batch_format="pyarrow", batch_size=None).materialize())

        def pick_labels(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(t["tag"], 2)).select(["v", "label"])

        def pick_rev(t: pa.Table, _cs=cand_schema) -> pa.Table:
            import pyarrow.compute as pc

            f = t.filter(pc.equal(t["tag"], 3))
            return pa.table({
                "v": f["v"], "label": f["label"],
                "tag": pa.array(np.zeros(len(f), np.int8), pa.int8()),
            }).cast(_cs)

        # labels/rev stay LAZY over the severed round output: each
        # consumer re-runs a trivial filter map instead of paying a
        # materialize execution per round
        labels = both.map_batches(pick_labels, batch_format="pyarrow")
        rev = both.map_batches(pick_rev, batch_format="pyarrow")

        fp = _fingerprint(labels)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components_distributed did not converge within "
            f"{max_rounds} rounds — returning would silently fragment "
            f"clusters; raise max_rounds (rounds needed ~ log2 of the "
            f"largest component size)")

    return labels.map_batches(
        lambda t: pa.table({"conv_id": t["v"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )
