"""Round-3 invariant gates (stages/gates.py): every gate must be able
to go RED — each test plants a violation through the gate's
falsifiability knob and asserts the gate output diverges from the
oracle's expectation, plus a green-path check on a clean corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fastcdc_rs_ray.stages import gates as G


def _docs(n=60):
    import ray.data as rd

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "chunk", "shuffle",
             "window", "join", "scan", "stream"]
    texts = [" ".join(rng.choice(words, 30).tolist()) for _ in range(n)]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _embs(n=80, dim=64):
    import ray.data as rd

    rng = np.random.default_rng(5)
    m = rng.normal(scale=0.3, size=(n, dim)).astype(np.float32)
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(n)], pa.int32()),
    }))


def test_ann_recall_monotone_red_path(ray_session):
    from fastcdc_rs_ray.stages.ann import load_queries_from_dataset

    ds = _embs(64)
    qids, qmat = load_queries_from_dataset(ds, 4)
    green = G.ann_recall_monotone(ds, qids, qmat, k=5, n_cells=8,
                                  probes=(1, 2, 8)).to_pandas()
    assert int(green.endpoint_permille[0]) == 1000
    assert int(green.n_monotone[0]) == 2
    red = G.ann_recall_monotone(ds, qids, qmat, k=5, n_cells=8,
                                probes=(1, 2, 8),
                                truth_k=9).to_pandas()
    assert int(red.endpoint_permille[0]) < 1000


def test_doc_neardup_twin_gate_red_path(ray_session):
    green = G.doc_neardup_twin_gate(_docs(), every=10).to_pandas()
    assert int(green.n_planted[0]) == 6
    assert int(green.n_coclustered[0]) == 6
    red = G.doc_neardup_twin_gate(_docs(), every=10,
                                  mutate=True).to_pandas()
    assert int(red.n_coclustered[0]) < int(red.n_planted[0])


def test_pagerank_mass_gate_red_path(ray_session):
    t = pa.table({"node": pa.array([1, 2, 3], pa.int64()),
                  "rank_q": pa.array([100, 100, 100], pa.int64())})
    ok = G.pagerank_mass_gate(t, scale=1000, damping_pct=85).to_pandas()
    assert int(ok.n_ge_base[0]) == 3 and int(ok.mass_le_scale[0]) == 1
    bad = pa.table({"node": pa.array([1, 2, 3], pa.int64()),
                    "rank_q": pa.array([100, 10, 2000], pa.int64())})
    red = G.pagerank_mass_gate(bad, scale=1000, damping_pct=85).to_pandas()
    assert int(red.n_ge_base[0]) < 3 or int(red.mass_le_scale[0]) == 0


def test_pca_rayleigh_gate_red_path(ray_session):
    green = G.pca_rayleigh_gate(_embs()).to_pandas()
    assert int(green.lam_ge_avg[0]) == 1
    red = G.pca_rayleigh_gate(_embs(), shrink_pct=1).to_pandas()
    assert int(red.lam_ge_avg[0]) == 0


def test_ridge_normal_gate_red_path(ray_session):
    green = G.ridge_normal_gate(_embs()).to_pandas()
    assert int(green.normal_ok[0]) == 1
    red = G.ridge_normal_gate(_embs(), perturb=10.0).to_pandas()
    assert int(red.normal_ok[0]) == 0


def test_kcenter_radius_gate_red_path():
    good = pa.table({"rank": pa.array([0, 1, 2, 3], pa.int64()),
                     "vec_id": pa.array([0, 9, 4, 7], pa.int64()),
                     "dist_q": pa.array([-1, 100, 90, 90], pa.int64())})
    ok = G.kcenter_radius_gate(good).to_pandas()
    assert int(ok.n_nonincreasing[0]) == 2
    bad = pa.table({"rank": pa.array([0, 1, 2, 3], pa.int64()),
                    "vec_id": pa.array([0, 9, 4, 7], pa.int64()),
                    "dist_q": pa.array([-1, 80, 90, 70], pa.int64())})
    red = G.kcenter_radius_gate(bad).to_pandas()
    assert int(red.n_nonincreasing[0]) == 1


def test_kmeans_history_gate_red_path():
    ok = G.kmeans_history_gate([9.0, 5.0, 5.0, 4.9], 100).to_pandas()
    assert int(ok.monotone_ok[0]) == 1
    red = G.kmeans_history_gate([9.0, 5.0, 6.0, 4.9], 100).to_pandas()
    assert int(red.monotone_ok[0]) == 0


def test_kmeans_inertia_gate_green(ray_session):
    out = G.kmeans_inertia_gate(_embs(), k=4, n_iter=6).to_pandas()
    assert int(out.monotone_ok[0]) == 1
    assert int(out.n_vecs[0]) == 80


def test_hll_merge_gate_red_path(ray_session):
    import ray.data as rd

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([i % 97 for i in range(2000)], pa.int64())}))
    green = G.hll_merge_users_gate(ev).to_pandas()
    assert int(green.n_exact[0]) == 97
    assert int(green.merge_equal[0]) == 1
    assert int(green.within_tol[0]) == 1
    red = G.hll_merge_users_gate(ev, fake_second=12345.0).to_pandas()
    assert int(red.merge_equal[0]) == 0


def test_compress_double_gate_red_path(ray_session):
    green = G.compress_double_gate(_docs()).to_pandas()
    assert int(green.n_docs[0]) > 0
    assert int(green.n_lower[0]) == int(green.n_docs[0])
    red = G.compress_double_gate(_docs(), factor=1).to_pandas()
    assert int(red.n_lower[0]) < int(red.n_docs[0])


def test_locality_gain_gate_red_path(ray_session):
    green = G.locality_gain_gate(_docs(), every=5).to_pandas()
    assert int(green.gain_ok[0]) == 1
    red = G.locality_gain_gate(_docs(), every=5, swap=True).to_pandas()
    assert int(red.gain_ok[0]) == 0


def test_semdedup_planted_gate_red_path(ray_session):
    green = G.semdedup_planted_gate(_embs(), every=5).to_pandas()
    assert int(green.n_planted[0]) == 16
    assert int(green.n_dropped[0]) == 16
    red = G.semdedup_planted_gate(_embs(), every=5, tau=1.5).to_pandas()
    assert int(red.n_dropped[0]) == 0


def test_hist_spread_gate_red_path(ray_session):
    from fastcdc_rs_ray.sources.transcripts import transcripts_from_documents
    from fastcdc_rs_ray.stages.assemble import assemble

    conv = assemble(
        transcripts_from_documents("/root/testdata/sf0.001"),
        num_partitions=4)
    green = G.hist_spread_gate(conv).to_pandas()
    assert int(green.nc_hi_narrower[0]) == 1
    red = G.hist_spread_gate(conv, lo_level=3, hi_level=0).to_pandas()
    assert int(red.nc_hi_narrower[0]) == 0


def test_bpe_replay_sql_byte_level_and_ws_class(ray_session):
    """The bpe_train_merges oracle is BYTE-level (hex pairs — 'é' is
    195,169, never codepoint 233) and tokenizes with the engine's full
    whitespace class incl. \\r: engine and SQL agree on an adversarial
    corpus (review r3 findings)."""
    import duckdb
    import ray.data as rd

    from fastcdc_rs_ray.pipelines.queries import _bpe_replay_sql
    from fastcdc_rs_ray.stages.bpe import bpe_train

    docs = pa.table({"text": pa.array([
        "foo\rbar foo\rbar baz qux " * 3,
        "ééé ééé ééé aa bb aa bb",
        "normal words normal words here",
    ], pa.string())})
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(_bpe_replay_sql(4) + ' ORDER BY "rank"').fetchdf()
    got = bpe_train(rd.from_arrow(docs), n_merges=4).select(
        ["rank", "left", "right", "new_id", "n"]).to_pandas()
    assert got.reset_index(drop=True).astype("int64").equals(
        want.astype("int64"))
    # byte-level: the second merge is the UTF-8 pair of 'é'
    assert (195, 169) in set(zip(want["left"], want["right"]))


def test_embed_outliers_gate_green_and_red(ray_session):
    """Green path: the 1-row digest agrees with a direct computation
    over embed_outliers' own output.  Red path: perturbing ONE
    embedding component flips s_mod/vm_mod (so the gate is falsifiable),
    and permuting dist2 across rows flips vm_mod even though
    n/s_mod/min/max are permutation-blind."""
    from fastcdc_rs_ray.stages.vecagg import embed_outliers

    M = G.OUTLIER_GATE_MOD
    emb = _embs(60)
    out = embed_outliers(emb).to_pandas().sort_values("vec_id")
    d2 = out["dist2"].to_numpy()
    vid = out["vec_id"].to_numpy()
    g = G.embed_outliers_gate(_embs(60)).to_pandas().iloc[0]
    assert g["n"] == len(d2)
    assert g["s_mod"] == int((d2 % M).sum())
    assert g["d_min"] == int(d2.min()) and g["d_max"] == int(d2.max())
    assert g["vm_mod"] == int(((vid % M) * (d2 % M) % M).sum())

    # red knob 1: one perturbed component changes the digest
    def poke(t):
        e = t["embedding"].combine_chunks()
        flat = e.flatten().to_numpy(zero_copy_only=False).copy()
        flat[0] += 7.0
        import pyarrow as _pa
        return _pa.table({
            "vec_id": t["vec_id"],
            "embedding": _pa.FixedSizeListArray.from_arrays(
                _pa.array(flat, _pa.float32()), 64).cast(
                _pa.list_(_pa.float32())),
            "label": t["label"],
        })

    g2 = G.embed_outliers_gate(
        _embs(60).map_batches(poke, batch_format="pyarrow")
    ).to_pandas().iloc[0]
    assert (g2["s_mod"], g2["vm_mod"]) != (g["s_mod"], g["vm_mod"])

    # red knob 2: a cross-row permutation of dist2 keeps n/s/min/max
    # but flips the vec_id-mixing digest
    perm = np.roll(d2, 1)
    assert int((perm % M).sum()) == g["s_mod"]
    assert int(((vid % M) * (perm % M) % M).sum()) != g["vm_mod"]


def test_bigfile_stitch_gate_paths(ray_session, tmp_path):
    from fastcdc_rs_ray.cdc.config import ChunkerConfig

    rng = np.random.default_rng(41)
    p = str(tmp_path / "big.bin")
    with open(p, "wb") as f:
        f.write(rng.integers(0, 256, 400_000, dtype=np.uint8).tobytes())
    cfg = ChunkerConfig(min_size=256, avg_size=1024, max_size=4096)
    g = G.bigfile_stitch_gate(p, cfg, range_bytes=32 << 10,
                              overlap=16 << 10).to_pandas().iloc[0]
    assert g["total_bytes"] == 400_000 and g["stitch_eq_whole"] == 1
    # red knob: sequential arm under a different config
    other = ChunkerConfig(min_size=128, avg_size=512, max_size=2048)
    r = G.bigfile_stitch_gate(p, cfg, range_bytes=32 << 10,
                              overlap=16 << 10,
                              whole_cfg=other).to_pandas().iloc[0]
    assert r["stitch_eq_whole"] == 0
    # budget RAISE
    with pytest.raises(ValueError):
        G.bigfile_stitch_gate(p, cfg, byte_budget=1000)


def test_neardup_incr_twin_gate_red_path(ray_session):
    g = G.neardup_incr_twin_gate(_docs(80)).to_pandas().iloc[0]
    assert g["n_planted"] > 0 and g["n_matched"] == g["n_planted"]
    r = G.neardup_incr_twin_gate(_docs(80), tau=1.1).to_pandas().iloc[0]
    assert r["n_matched"] == 0


def test_media_roundtrip_gate_red_path(ray_session):
    g = G.media_roundtrip_gate(48).to_pandas().iloc[0]
    assert g["n_media"] == 48 and g["n_roundtrip_ok"] == 48
    r = G.media_roundtrip_gate(48, corrupt=True).to_pandas().iloc[0]
    assert r["n_roundtrip_ok"] < 48


def test_fingerprint_twin_gate_red_path(ray_session):
    g = G.fingerprint_twin_gate(_docs(90)).to_pandas().iloc[0]
    assert g["n_planted"] == 9 and g["n_equal"] == 9
    r = G.fingerprint_twin_gate(_docs(90), perturb=True).to_pandas().iloc[0]
    assert r["n_equal"] < r["n_planted"]


def test_embed_lsh_twin_gate_red_path(ray_session):
    g = G.embed_lsh_twin_gate(_embs(60)).to_pandas().iloc[0]
    assert g["n_planted"] == 12 and g["n_paired"] == 12
    r = G.embed_lsh_twin_gate(_embs(60), tau=1.1).to_pandas().iloc[0]
    assert r["n_paired"] == 0


def test_pq_endpoint_gate_red_path(ray_session):
    from fastcdc_rs_ray.stages.ann import load_queries_from_dataset

    emb = _embs(70)
    qids, qmat = load_queries_from_dataset(emb, 4)
    g = G.pq_endpoint_gate(_embs(70), qids, qmat, k=5).to_pandas().iloc[0]
    assert g["n_queries"] == 4 and g["match_permille"] == 1000
    r = G.pq_endpoint_gate(_embs(70), qids, qmat, k=5,
                           truth_k=9).to_pandas().iloc[0]
    assert r["match_permille"] < 1000


def test_neardup_keep_gate_red_path(ray_session):
    import ray.data as rd

    import fastcdc_rs_ray.pipelines.queries as Q

    t = Q.transcripts_from_documents("/root/testdata/sf0.001")
    g = G.neardup_keep_gate(t).to_pandas().iloc[0]
    assert g["n_exact_twins"] > 0 and g["n_both_kept"] == 0
    r = G.neardup_keep_gate(
        Q.transcripts_from_documents("/root/testdata/sf0.001"),
        keep_all=True).to_pandas().iloc[0]
    assert r["n_both_kept"] == r["n_exact_twins"] > 0


def test_media_thumbs_gate_red_path(ray_session):
    g = G.media_thumbs_gate(40).to_pandas().iloc[0]
    assert g["n_images"] == 20 and g["n_thumb_ok"] == 20
    r = G.media_thumbs_gate(40, wrong_thumb=17).to_pandas().iloc[0]
    assert r["n_thumb_ok"] == 0


def test_stream_parity_gate_green(ray_session):
    g = G.stream_parity_gate("/root/testdata/sf0.001").to_pandas().iloc[0]
    assert g["n_docs"] > 0 and g["n_equal"] == g["n_docs"]


def test_cluster_terms_gate_red_path(ray_session):
    g = G.cluster_terms_gate(_docs(80), _embs(80), k=4,
                             top_n=2).to_pandas().iloc[0]
    assert g["n_rows"] == 8 and g["n_consistent"] == 8
    r = G.cluster_terms_gate(_docs(80), _embs(80), k=4, top_n=2,
                             perturb=True).to_pandas().iloc[0]
    assert r["n_consistent"] == 0


def test_cluster_terms_gate_subcorpus_universe(ray_session):
    """sf0.1 shape: embeddings cover only HALF the documents — the
    gate's recount must use the CLUSTERED sub-corpus (the pipeline's
    counting universe), not the full document table (the first gate
    version's bug: full-corpus recount ~2.5x the claimed totals)."""
    g = G.cluster_terms_gate(_docs(120), _embs(60), k=4,
                             top_n=2).to_pandas().iloc[0]
    assert g["n_rows"] == 8 and g["n_consistent"] == 8


def test_media_frames_gate_red_path(ray_session):
    """Green: every media item's sampled-frame count equals the
    payload-header expectation.  Red: a wrong stride in the expectation
    (the falsifiability knob) must drop the match count."""
    from fastcdc_rs_ray.stages import gates as G

    green = G.media_frames_gate(n=40, every_k=4)
    assert green["n_media"][0].as_py() == 40
    assert green["n_frame_match"][0].as_py() == 40
    red = G.media_frames_gate(n=40, every_k=4, wrong_k=3)
    assert red["n_frame_match"][0].as_py() < 40
