"""triangle_count (multi-way graph self-join), value_mad_by_type (grouped
robust dispersion), normalized_dedup (normalization-keyed exact dedup):
each pinned against a brute-force numpy/python reference on planted
inputs, with multi-block partitioning to exercise partition invariance."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa

from fastcdc_rs_ray.stages.dedup import normalized_dedup
from fastcdc_rs_ray.stages.pagerank import triangle_count
from fastcdc_rs_ray.stages.sessions import value_mad_by_type


def _tri_brute(edges: set[tuple[int, int]]) -> int:
    nodes = sorted({n for e in edges for n in e})
    cnt = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if ((a, b) in edges and (b, c) in edges and (a, c) in edges):
            cnt += 1
    return cnt


def _to_ds(ray, src, dst, blocks=5):
    import ray.data as rd

    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


def test_triangle_count_known_graphs(ray_session):
    # K5 (10 triangles) + a 200-leaf star hub (0 triangles: the skew case
    # the degree orientation must not blow up on) + one pendant path
    src, dst = [], []
    for a, b in itertools.combinations(range(5), 2):
        src.append(a); dst.append(b)
    hub = 100
    for leaf in range(200, 400):
        src.append(hub); dst.append(leaf)
    # close three star leaves into one triangle with the hub
    src += [200, 201]; dst += [201, 200]  # duplicate/reverse edges too
    ds = _to_ds(ray_session, src, dst)
    out = triangle_count(ds, num_partitions=4)
    edges = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    assert out["n_triangles"][0].as_py() == _tri_brute(edges) == 10 + 1


def test_triangle_count_random_partition_invariant(ray_session):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 60, 500)
    dst = rng.integers(0, 60, 500)
    edges = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist())
             if a != b}
    want = _tri_brute(edges)
    for blocks in (1, 7):
        out = triangle_count(_to_ds(ray_session, src, dst, blocks=blocks),
                             num_partitions=3)
        assert out["n_triangles"][0].as_py() == want


def _mad_ref(vals_c: np.ndarray) -> tuple[int, int]:
    vs = np.sort(vals_c)
    n = len(vs)
    med_u2 = int(vs[(n - 1) // 2]) + int(vs[n // 2])
    ds = np.sort(np.abs(2 * vs - med_u2))
    mad_u4 = int(ds[(n - 1) // 2]) + int(ds[n // 2])
    return med_u2, mad_u4


def test_value_mad_odd_group_pinned(ray_session):
    """Odd-count group: 10,20,30,40,50 has median 30 -> med_u2 == 60
    (NOT 70 = v[k]+v[k+1], the round-1 upper-median off-by-one); MAD is
    20 -> mad_u4 == 40.  Hand-computed, independent of any formula."""
    import ray.data as rd

    t = pa.table({
        "event_type": pa.array(["x"] * 5, pa.string()),
        "value": pa.array([0.10, 0.20, 0.30, 0.40, 0.50], pa.float64()),
    })
    out = value_mad_by_type(rd.from_arrow(t).repartition(2)).to_pylist()
    assert out == [{"event_type": "x", "n": 5, "med_u2": 60, "mad_u4": 40}]


def test_value_mad_by_type_vs_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, 1001)]
    # one even-sized and one odd-sized group, 2-decimal values
    vals = np.round(rng.normal(50, 20, 1001), 2)
    t = pa.table({"event_type": pa.array(types.tolist(), pa.string()),
                  "value": pa.array(vals, pa.float64())})
    out = value_mad_by_type(rd.from_arrow(t).repartition(6))
    got = {r["event_type"]: (r["med_u2"], r["mad_u4"], r["n"])
           for r in out.to_pylist()}
    for ty in ("a", "b", "c"):
        sel = types == ty
        vc = np.round(vals[sel] * 100).astype(np.int64)
        med_u2, mad_u4 = _mad_ref(vc)
        assert got[ty] == (med_u2, mad_u4, int(sel.sum()))
    # robustness property: one wild outlier moves the mean, not the MAD
    vals2 = vals.copy()
    vals2[np.flatnonzero(types == "a")[0]] = 1e6
    t2 = pa.table({"event_type": pa.array(types.tolist(), pa.string()),
                   "value": pa.array(vals2, pa.float64())})
    out2 = value_mad_by_type(rd.from_arrow(t2).repartition(6))
    got2 = {r["event_type"]: r["mad_u4"] for r in out2.to_pylist()}
    assert abs(got2["a"] - got["a"][1]) <= 8  # within 2 cents


def test_normalized_dedup_planted_variants(ray_session):
    import ray.data as rd

    base = [
        "The quick brown fox",
        "jumps over the lazy dog",
        "pack my box with five dozen jugs",
    ]
    rows_id, rows_text = [], []
    did = 0
    for i, b in enumerate(base):
        variants = [
            b,
            b.upper(),
            "  " + b.replace(" ", "\t \n") + " \r\n",
            b.title(),
        ]
        for v in variants:
            rows_id.append(did); rows_text.append(v); did += 1
    # plus one genuinely unique doc
    rows_id.append(did); rows_text.append("completely different text")
    t = pa.table({"doc_id": pa.array(rows_id, pa.int64()),
                  "text": pa.array(rows_text, pa.string())})
    out = normalized_dedup(rd.from_arrow(t).repartition(4), num_partitions=3)
    got = sorted(pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in out.iter_batches(batch_format="pyarrow")]
    )["doc_id"].to_pylist())
    # survivors: min id per normalized group = 0, 4, 8 and the unique 12
    assert got == [0, 4, 8, 12]


def test_corpus_shuffle_permutation_and_determinism(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.sample import SAMPLE_MULT, corpus_shuffle

    ids = np.arange(0, 937, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})

    def run(blocks, seed=0):
        out = corpus_shuffle(rd.from_arrow(t).repartition(blocks), seed=seed)
        tab = pa.concat_tables(
            [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in out.iter_batches(batch_format="pyarrow")])
        d = dict(zip(tab["doc_id"].to_pylist(), tab["pos"].to_pylist()))
        assert len(d) == len(ids)
        return d

    a = run(3)
    b = run(9)  # identical at any block count
    assert a == b
    # pos is a permutation of 0..n-1 matching the hash rank
    skey = (ids.astype(np.uint64) * np.uint64(SAMPLE_MULT))
    want = {int(i): int(p) for i, p in
            zip(ids[np.argsort(skey)], range(len(ids)))}
    assert a == want
    # a different seed is a genuinely different permutation
    c = run(3, seed=12345)
    assert c != a and sorted(c.values()) == list(range(len(ids)))


def test_corpus_shuffle_sql_split_multiply_no_overflow():
    """The oracle's (xor(id,seed)*MULT) mod 2^64 via 32-bit split-multiply
    equals numpy uint64 wraparound for EVERY seed magnitude — a direct
    HUGEINT multiply overflows once xor(id,seed) >= ~2^63.7 (round-1
    ADVICE), so the huge-seed legs here are the regression."""
    import duckdb

    from fastcdc_rs_ray.stages.sample import SAMPLE_MULT

    lo_m, hi_m = SAMPLE_MULT & 0xFFFFFFFF, SAMPLE_MULT >> 32
    ids = np.random.default_rng(0).integers(0, 2**62, 50, dtype=np.int64)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(int(i),) for i in ids])
    for seed in (0, 0xDEADBEEF, 2**63 + 12345, 2**64 - 1):
        want = [int(w) for w in
                ((ids.astype(np.uint64) ^ np.uint64(seed)) * np.uint64(SAMPLE_MULT))]
        rows = con.execute(f"""
          SELECT CAST(((xv % 4294967296) * {lo_m}
                  + (((xv % 4294967296) * {hi_m}
                      + (xv // 4294967296) * {lo_m}) % 4294967296) * 4294967296)
                 % 18446744073709551616 AS VARCHAR)
          FROM (SELECT CAST(xor(CAST(doc_id AS UBIGINT), {seed}::UBIGINT)
                            AS HUGEINT) AS xv FROM t)
        """).fetchall()
        assert [int(r[0]) for r in rows] == want, hex(seed)


def _ntile_ref(totals: dict[int, int], k: int) -> dict[int, int]:
    rows = sorted(totals.items(), key=lambda x: (x[1], x[0]))
    n = len(rows)
    big, size_big, size_small = n % k, n // k + 1, n // k
    cut = big * size_big
    out = {}
    for i, (uid, _) in enumerate(rows):
        r = i + 1
        out[uid] = ((r - 1) // size_big + 1 if r <= cut
                    else big + (r - 1 - cut) // max(size_small, 1) + 1)
    return out


def test_user_spend_ntile_vs_reference(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.sessions import user_spend_ntile

    rng = np.random.default_rng(11)
    n_ev = 3000
    uid = rng.integers(0, 173, n_ev)
    # coarse values force many tied totals (the within-tie exchange path)
    val = rng.integers(1, 4, n_ev).astype(np.float64)
    t = pa.table({"user_id": pa.array(uid, pa.int64()),
                  "value": pa.array(val, pa.float64())})
    totals: dict[int, int] = {}
    for u, v in zip(uid.tolist(), val.tolist()):
        totals[u] = totals.get(u, 0) + int(round(v * 100))
    want = _ntile_ref(totals, 10)
    for blocks in (2, 8):
        out = user_spend_ntile(rd.from_arrow(t).repartition(blocks),
                               k=10, num_partitions=4)
        tab = pa.concat_tables(
            [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in out.iter_batches(batch_format="pyarrow")])
        got = dict(zip(tab["user_id"].to_pylist(), tab["tile"].to_pylist()))
        assert got == want
    # fewer rows than buckets: every row its own tile prefix
    small = pa.table({"user_id": pa.array([1, 2, 3], pa.int64()),
                      "value": pa.array([1.0, 2.0, 3.0], pa.float64())})
    out = user_spend_ntile(rd.from_arrow(small), k=10, num_partitions=2)
    tab = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in out.iter_batches(batch_format="pyarrow")])
    got = dict(zip(tab["user_id"].to_pylist(), tab["tile"].to_pylist()))
    assert got == {1: 1, 2: 2, 3: 3}


def test_chunk_jaccard_pairs_planted_twins(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.cdc import ChunkerConfig
    from fastcdc_rs_ray.sources.transcripts import synth_transcripts
    from fastcdc_rs_ray.stages.assemble import assemble
    from fastcdc_rs_ray.stages.chunk import chunk
    from fastcdc_rs_ray.stages.dedup import chunk_jaccard_pairs

    transcripts, truth = synth_transcripts(n_convs=120, seed=17, dup_frac=0.3)
    exact = [(s, d) for s, d, k in zip(truth["src"].to_pylist(),
                                       truth["dst"].to_pylist(),
                                       truth["kind"].to_pylist()) if k == 0]
    assert len(exact) >= 3

    cfg = ChunkerConfig(min_size=64, avg_size=256, max_size=1024)
    ds = rd.from_arrow(transcripts).repartition(5)
    pairs = chunk_jaccard_pairs(chunk(assemble(ds, num_partitions=6), cfg),
                                tau_milli=500, num_partitions=6)
    got = set(zip(pairs["src"].to_pylist(), pairs["dst"].to_pylist()))
    # exact-copy twins share every chunk (J = 1.0) — all must be found
    for p in exact:
        assert p in got, f"missing exact twin {p}"
    # determinism across block counts
    ds2 = rd.from_arrow(transcripts).repartition(2)
    pairs2 = chunk_jaccard_pairs(chunk(assemble(ds2, num_partitions=3), cfg),
                                 tau_milli=500, num_partitions=4)
    assert got == set(zip(pairs2["src"].to_pylist(),
                          pairs2["dst"].to_pylist()))


def test_sliding_window_sums_out_of_order_and_peers(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.sessions import sliding_window_sums

    W = 1000  # µs window for the test
    # user 1: out-of-order arrivals, duplicate timestamps (peers)
    rows = [
        # (event_id, user_id, ts_us, value)
        (5, 1, 5000, 1.00),
        (1, 1, 1000, 2.00),
        (3, 1, 2000, 4.00),
        (2, 1, 2000, 8.00),   # peer of event 3 — must share its sum
        (4, 1, 2600, 16.00),
        (9, 2, 1500, 32.00),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[2] for r in rows], np.int64),
                       pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    out = sliding_window_sums(rd.from_arrow(t).repartition(3),
                              window_us=W, num_partitions=2)
    tab = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in out.iter_batches(batch_format="pyarrow")])
    got = dict(zip(tab["event_id"].to_pylist(),
                   tab["win_sum_c"].to_pylist()))
    # windows: [ts-1000, ts] inclusive, peers included
    assert got[1] == 200                      # only itself
    assert got[2] == got[3] == 200 + 400 + 800  # peers share the frame
    assert got[4] == 400 + 800 + 1600         # 2000 >= 1600, 1000 < 1600
    assert got[5] == 100                      # far away
    assert got[9] == 3200                     # other user isolated


def test_triangle_exchange_parity(ray_session):
    """degree_mode="exchange" (no node-universe driver/broadcast state;
    VERDICT r3 item 3) is bit-identical to the broadcast plan and brute
    force on skewed + random graphs under different partitionings."""
    # skew graph: K5 + hot star + one closed star triangle
    src, dst = [], []
    for a, b in itertools.combinations(range(5), 2):
        src.append(a); dst.append(b)
    for leaf in range(200, 400):
        src.append(100); dst.append(leaf)
    src += [200, 201]; dst += [201, 200]
    edges = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    want = _tri_brute(edges)
    for blocks in (1, 7):
        ds = _to_ds(ray_session, src, dst, blocks=blocks)
        got = triangle_count(ds, num_partitions=3,
                             degree_mode="exchange")
        assert got["n_triangles"][0].as_py() == want == 11

    rng = np.random.default_rng(23)
    s = rng.integers(0, 80, 900)
    d = rng.integers(0, 80, 900)
    edges = {(min(a, b), max(a, b))
             for a, b in zip(s.tolist(), d.tolist()) if a != b}
    want = _tri_brute(edges)
    ds = _to_ds(ray_session, s, d, blocks=6)
    bc = triangle_count(ds, num_partitions=4, degree_mode="broadcast")
    ex = triangle_count(ds, num_partitions=4, degree_mode="exchange")
    assert bc["n_triangles"][0].as_py() == ex["n_triangles"][0].as_py() == want
