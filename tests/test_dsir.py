"""dsir_weights: integer-exact importance-resampling masses vs a
brute-force replica; partition invariance; target-slice semantics."""

import pyarrow as pa

from fastcdc_rs_ray.stages.rarity import dsir_weights

TEXTS = {
    0: "benchmark words appear here often often",          # target (0%50==0)
    1: "often words of the target appear in this doc",
    2: "completely unrelated nonsense zzz qqq www",
    3: "often often often benchmark",
    50: "second target doc shares benchmark words",        # target
    51: "benchmark shares words",
}


def _brute():
    toks = {d: t.split() for d, t in TEXTS.items()}
    cf, tf = {}, {}
    for d, ts in toks.items():
        for w in ts:
            cf[w] = cf.get(w, 0) + 1
            if d % 50 == 0:
                tf[w] = tf.get(w, 0) + 1
    out = {}
    for d, ts in toks.items():
        if d % 50 == 0:
            continue
        out[d] = (sum(tf.get(w, 0) for w in ts),
                  sum(cf[w] for w in ts), len(ts))
    return out


def _run(n_blocks, num_partitions):
    import ray.data as rd

    items = sorted(TEXTS.items())
    step = -(-len(items) // n_blocks)
    tables = []
    for i in range(0, len(items), step):
        part = items[i: i + step]
        tables.append(pa.table({
            "doc_id": pa.array([d for d, _ in part], pa.int64()),
            "text": pa.array([t for _, t in part], pa.string()),
        }))
    out = dsir_weights(rd.from_arrow(tables),
                       num_partitions=num_partitions).to_pandas()
    return {int(r.doc_id): (int(r.tgt_mass), int(r.raw_mass), int(r.n_tokens))
            for r in out.itertuples()}


def test_dsir_matches_brute_force(ray_session):
    assert _run(2, 4) == _brute()


def test_dsir_partition_invariance(ray_session):
    assert _run(1, 2) == _run(3, 7)


def test_dsir_target_docs_excluded(ray_session):
    got = _run(2, 4)
    assert 0 not in got and 50 not in got
    # doc 2 shares no token with the target slice
    assert got[2][0] == 0 and got[2][1] >= got[2][2]
