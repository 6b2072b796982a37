"""Hypothesis property layer for the geometric kernels: skyline
(_pair_skyline) and interval union (interval_coverage sweep) against
brute-force references.  The pure-kernel properties run without Ray; one
end-to-end case per kernel runs through the Dataset path in the
deterministic tests (test_param_sweep.py-style modules cover those)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fastcdc_rs_ray.stages.skyline import _pair_skyline


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=1, max_size=60))
def test_pair_skyline_matches_bruteforce(points):
    q = np.asarray([p[0] for p in points], np.int64)
    nt = np.asarray([p[1] for p in points], np.int64)
    fq, fnt = _pair_skyline(q, nt)
    got = set(zip(fq.tolist(), fnt.tolist()))

    uniq = set(zip(q.tolist(), nt.tolist()))

    def dominated(a):
        return any(b[0] >= a[0] and b[1] >= a[1] and b != a for b in uniq
                   if (b[0] > a[0] or b[1] > a[1]))

    want = {p for p in uniq if not dominated(p)}
    assert got == want


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 10_000)),
                min_size=1, max_size=80),
       st.integers(1, 500))
def test_interval_union_sweep_matches_bruteforce(rows, window):
    """Replicates interval_coverage's per-partition sweep (sorted
    segmented cummax) and checks covered length + island count per user
    against a brute-force merge."""
    u = np.asarray([r[0] for r in rows], np.int64)
    s = np.asarray([r[1] for r in rows], np.int64)

    # --- kernel (mirrors stages/intervals.py sweep) ---
    order = np.lexsort((s, u))
    uu, ss = u[order], s[order]
    ss = ss - ss.min()
    ee = ss + window
    newu = np.concatenate([[True], uu[1:] != uu[:-1]])
    seg = np.cumsum(newu) - 1
    big = ee.max() + 1
    off = seg * big
    cme = np.maximum.accumulate(ee + off) - off
    brk = np.concatenate([[True], (ss[1:] > cme[:-1]) | newu[1:]])
    isl = np.cumsum(brk) - 1
    isl_end = np.zeros(isl[-1] + 1, np.int64)
    np.maximum.at(isl_end, isl, ee)
    isl_start = ss[np.flatnonzero(brk)]
    isl_user = uu[np.flatnonzero(brk)]
    got = {}
    for usr, st_, en in zip(isl_user.tolist(), isl_start.tolist(),
                            isl_end.tolist()):
        c, n = got.get(usr, (0, 0))
        got[usr] = (c + en - st_, n + 1)

    # --- brute force ---
    want = {}
    base = s.min()
    for usr in set(u.tolist()):
        ivs = sorted((int(x) - int(base), int(x) - int(base) + window)
                     for x in s[u == usr])
        merged = []
        for a, b in ivs:
            if merged and a <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], b))
            else:
                merged.append((a, b))
        want[usr] = (sum(b - a for a, b in merged), len(merged))

    assert got == want
