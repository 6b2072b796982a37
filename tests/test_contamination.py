"""contamination_score: graded word-13-gram decontamination.

Plants a fully-contaminated doc (verbatim benchmark copy), a partially
contaminated doc above the 8% flag threshold, a below-threshold doc, and
clean docs — across blocks — and checks counts, fractions and flags
against the declared integer-arithmetic semantics.
"""

import pyarrow as pa


def _docs(rows):
    ids, texts = zip(*rows)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_contamination_score_planted(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.decontam import contamination_score

    bench = _words("eval", 20)          # 20 tokens -> 8 distinct 13-grams
    full_copy = bench                    # every gram hits -> frac 1.0
    # partial: 13-token benchmark window + 87 unique tokens
    # -> grams total = 100+13-1-12 = 88; hits: only the windows fully
    # inside the quoted prefix = 1 gram; 1/88 = 1.1% -> below 8%
    below = " ".join([_words("eval", 13), _words("uniqb", 87)])
    # above: 40-token benchmark-prefix quote + 20 unique tokens
    # (40+20)-12 = 48 grams; windows fully inside the quote that ALSO
    # appear in bench (bench has 20 tokens, its grams are eval0..eval19
    # windows) -> quoted eval0..eval19 yields 8 hitting grams; but the
    # quote here repeats eval tokens beyond 19?  keep it simple: quote
    # the EXACT 20-token bench then add 20 unique -> 28 grams, 8 hits
    # = 28.6% -> flagged
    above = " ".join([bench, _words("uniqa", 20)])
    clean = _words("clean", 30)

    rows_a = [(0, bench), (7, full_copy), (11, above)]
    rows_b = [(13, below), (17, clean), (50, _words("bench2", 15))]
    ds = rd.from_arrow([_docs(rows_a), _docs(rows_b)])
    out = contamination_score(ds, W=13, bench_mod=50, tau_permille=80)
    rec = {r["doc_id"]: r for r in out.to_pandas().to_dict("records")}

    assert set(rec) == {7, 11, 13, 17}  # benchmark docs 0, 50 excluded
    assert rec[7]["n_grams"] == 8 and rec[7]["n_hits"] == 8
    assert rec[7]["contaminated"] == 1
    assert rec[11]["n_grams"] == 28 and rec[11]["n_hits"] == 8
    assert rec[11]["contaminated"] == 1          # 8/28 = 28.6% >= 8%
    assert rec[13]["n_grams"] == 88 and rec[13]["n_hits"] == 1
    assert rec[13]["contaminated"] == 0          # 1/88 = 1.1% < 8%
    assert rec[17]["n_hits"] == 0 and rec[17]["contaminated"] == 0


def test_contamination_short_docs_absent(ray_session):
    import ray.data as rd

    from fastcdc_rs_ray.stages.decontam import contamination_score

    ds = rd.from_arrow(_docs([(0, _words("e", 20)), (1, _words("x", 12)), (2, _words("y", 13))]))
    out = contamination_score(ds, W=13, bench_mod=50).to_pandas()
    assert set(out["doc_id"]) == {2}  # doc 1 has 12 tokens -> no grams
    assert out.set_index("doc_id").loc[2, "n_grams"] == 1
