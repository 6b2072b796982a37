"""Suffix-array reference + sa_gram_parity gate falsifiability.

The gate's claim (gram exchange ≡ monolithic suffix array) is only
meaningful if the suffix array itself is independently correct and the
gate can FAIL: brute-force pins the SA and the duplicated-position
relation, and a planted threshold mismatch must produce nonzero
difference counts.
"""

import numpy as np
import pyarrow as pa
import pytest

from fastcdc_rs_ray.stages.suffixarray import (
    build_suffix_array,
    duplicated_positions_sa,
    sa_gram_parity,
)


def test_suffix_array_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(40):
        n = int(rng.integers(0, 80))
        d = rng.integers(97, 101, n).astype(np.uint8)  # 4-letter alphabet
        sa = build_suffix_array(d)
        b = bytes(d)
        assert list(sa) == sorted(range(n), key=lambda i: b[i:]), trial


def test_duplicated_positions_brute_force():
    rng = np.random.default_rng(1)

    def brute(ids, texts, L):
        from collections import Counter

        grams = Counter()
        for t in texts:
            for i in range(len(t) - L + 1):
                grams[t[i:i + L]] += 1
        return {
            (did, i + 1)
            for did, t in zip(ids, texts)
            for i in range(len(t) - L + 1)
            if grams[t[i:i + L]] >= 2
        }

    for trial in range(25):
        k = int(rng.integers(1, 6))
        texts = [
            bytes(rng.integers(97, 100, int(rng.integers(0, 50))).astype(np.uint8))
            for _ in range(k)
        ]
        ids = np.arange(k) * 7 + 3
        L = int(rng.integers(2, 6))
        got = duplicated_positions_sa(ids, texts, L).to_pandas()
        got_set = set(zip(got.doc_id.astype(int), got.pos.astype(int)))
        assert got_set == brute(ids, texts, L), (trial, texts, L)


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


_BOILER = "x" * 5 + "shared boilerplate paragraph shared by two documents here"


def test_sa_gram_parity_agrees(ray_session):
    texts = [
        "alpha " + _BOILER + " tail one padding padding padding",
        "beta " + _BOILER + " tail two padding padding padding",
        "gamma entirely unique content with no repeats at all anywhere",
    ]
    out = sa_gram_parity(_docs_ds(texts), L=30, num_partitions=2).to_pandas()
    assert int(out.n_gram_only[0]) == 0
    assert int(out.n_sa_only[0]) == 0
    assert int(out.n_dup_positions[0]) > 0  # the planted boilerplate


def test_sa_gram_parity_falsifiable(ray_session):
    texts = [
        "alpha " + _BOILER + " tail one padding padding padding",
        "beta " + _BOILER + " tail two padding padding padding",
    ]
    # mismatched thresholds: the SA side sees MORE duplicated 29-gram
    # starts than the gram side's 30-gram starts -> nonzero n_sa_only
    out = sa_gram_parity(_docs_ds(texts), L=30, num_partitions=2,
                         sa_L=29).to_pandas()
    assert int(out.n_sa_only[0]) > 0


def test_sa_gram_parity_byte_budget_enforced(ray_session):
    """The gate's driver-side SA pull has an ENFORCED bound: a corpus
    over max_bytes RAISES instead of materializing (advice r02)."""
    import pytest

    texts = ["padding " + _BOILER for _ in range(4)]
    with pytest.raises(ValueError, match="max_bytes"):
        sa_gram_parity(_docs_ds(texts), L=30, num_partitions=2,
                       max_bytes=16)
