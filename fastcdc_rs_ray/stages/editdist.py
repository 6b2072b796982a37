"""Edit-distance verification of near-dup candidate pairs.

The character-level verify tier above token Jaccard: exact Levenshtein
distance for every candidate pair, matching DuckDB's ``levenshtein()`` so
the oracle checks it bit-for-bit.

Vectorization: the classic DP row recurrence has a sequential horizontal
dependency (insertions), but rewriting row j as
``cur[j] = min_k<=j (cur_noins[k] + (j - k))`` turns it into a prefix-min
of ``cur_noins[k] - k`` — one ``np.minimum.accumulate`` per row — so the
whole batch of pairs advances one row per step with NO per-cell or
per-pair Python work in the hot loop (pairs are padded to the batch max
length; finished pairs snapshot their answer as the row index passes
their length).  Work is O(P * maxlen^2) vectorized — the right shape for
a CANDIDATE-sized verify stage (pairs after LSH/Jaccard pruning), never
for a corpus-wide scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_OUT = pa.schema([
    ("src", pa.int64()), ("dst", pa.int64()), ("editdist", pa.int64()),
])


def _char_matrix(texts: list[bytes], width: int, pad: int) -> np.ndarray:
    m = np.full((len(texts), width), pad, np.int16)
    for i, s in enumerate(texts):       # matrix build only; DP is loop-free
        a = np.frombuffer(s, np.uint8)
        m[i, : len(a)] = a
    return m


def levenshtein_batch(a_texts: list[bytes], b_texts: list[bytes]) -> np.ndarray:
    """Exact Levenshtein for each (a, b) pair, vectorized across pairs."""
    P = len(a_texts)
    la = np.array([len(s) for s in a_texts], np.int64)
    lb = np.array([len(s) for s in b_texts], np.int64)
    if P == 0:
        return np.zeros(0, np.int64)
    maxa, maxb = int(la.max()), int(lb.max())
    A = _char_matrix(a_texts, max(maxa, 1), pad=-1)
    B = _char_matrix(b_texts, max(maxb, 1), pad=-2)  # pads never equal
    ans = np.where(la == 0, lb, 0).astype(np.int64)

    prev = np.broadcast_to(
        np.arange(maxb + 1, dtype=np.int64), (P, maxb + 1)).copy()
    js = np.arange(maxb + 1, dtype=np.int64)
    done0 = la == 0
    for i in range(1, maxa + 1):
        cost = (A[:, i - 1, None] != B).astype(np.int64)       # (P, maxb)
        noins = np.empty((P, maxb + 1), np.int64)
        noins[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=noins[:, 1:])
        # cur[j] = min_{k<=j} noins[k] + (j-k)  ==  prefmin(noins - j)[j] + j
        cur = np.minimum.accumulate(noins - js[None, :], axis=1) + js[None, :]
        hit = la == i
        if hit.any():
            ans[hit] = cur[hit, lb[hit]]
        prev = cur
    ans[done0] = lb[done0]
    return ans


def pair_edit_distances(documents_ds, pairs_ds, num_partitions: int = 8):
    """(src, dst) candidate pairs -> (src, dst, editdist): texts attach via
    a broadcast id->text map (the pair endpoint set is candidate-sized by
    construction), DP runs distributed per pair block."""
    import ray

    pairs = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in pairs_ds.iter_batches(batch_format="pyarrow")]
        + [pa.schema([("src", pa.int64()), ("dst", pa.int64())]).empty_table()]
    )
    if len(pairs) == 0:
        return _OUT.empty_table()
    need = np.unique(np.concatenate([
        pairs["src"].combine_chunks().to_numpy(zero_copy_only=False),
        pairs["dst"].combine_chunks().to_numpy(zero_copy_only=False)]))
    nref = ray.put(need)

    def project(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        want = ray.get(nref)
        pos = np.searchsorted(want, ids)
        pos_c = np.minimum(pos, len(want) - 1)
        keep = want[pos_c] == ids
        return t.filter(pa.array(keep))

    texts_t = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in documents_ds.map_batches(project, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    tid = texts_t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(tid, kind="stable")
    tid = tid[order]
    ttext = texts_t["text"].combine_chunks().take(
        pa.array(order, pa.int64()))
    tref = ray.put({"ids": tid,
                    "texts": [s.encode() for s in ttext.to_pylist()]})

    import ray.data as rd

    def dp_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _OUT.empty_table()
        lut = ray.get(tref)
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        si = np.searchsorted(lut["ids"], s)
        di = np.searchsorted(lut["ids"], d)
        a = [lut["texts"][i] for i in si.tolist()]
        b = [lut["texts"][i] for i in di.tolist()]
        return pa.table({
            "src": pa.array(s, pa.int64()),
            "dst": pa.array(d, pa.int64()),
            "editdist": pa.array(levenshtein_batch(a, b), pa.int64()),
        }).cast(_OUT)

    return rd.from_arrow(pairs).map_batches(
        dp_block, batch_format="pyarrow", batch_size=64)
