"""Vector aggregates over embedding columns (centroid per group).

The training-data op behind cluster-centroid dedup and per-domain drift
monitoring: mean embedding per group.  The reference has no vector math
(SURVEY.md §2.5 — no aggregations at all); this is the engine's
list<float> aggregate pattern:

- ONE tag-union keyed exchange on doc id co-locates each vector with its
  group label (both sides may be huge — no broadcast),
- per-block accumulation is a single numpy matmul-style scatter-add into
  a (groups x dim) matrix, emitted as (group, dim, sum, n) partials,
- the driver merges |groups| x dim x partitions rows.

Exactness: components are float32; both the Ray side and the SQL oracle
quantize with ``floor(float64(x) * 1e6)`` — the float32->float64 cast is
exact, the multiply is the same IEEE op, and floor has no tie rule to
diverge on (numpy round is half-even, SQL round is half-away — floor
sidesteps that class of mismatch).  Sums are then exact int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QUANT = 1_000_000.0


def embedding_centroids(embeddings_ds, documents_ds, dim: int = 64,
                        num_partitions: int = 8):
    """-> (lang, dim_no [1-based], sum_q, n): per-language per-dimension
    quantized component sums (the centroid is sum_q / n / 1e6)."""
    schema = pa.schema([
        ("jkey", pa.int64()), ("tag", pa.int8()),
        ("emb", pa.list_(pa.float32())), ("lang", pa.string()),
    ])

    def emb_side(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "jkey": pc.cast(t["vec_id"], pa.int64()),
            "tag": pa.array(np.zeros(n, np.int8), pa.int8()),
            "emb": pc.cast(t["embedding"], pa.list_(pa.float32())),
            "lang": pa.nulls(n, pa.string()),
        }).cast(schema)

    def doc_side(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "jkey": pc.cast(t["doc_id"], pa.int64()),
            "tag": pa.array(np.ones(n, np.int8), pa.int8()),
            "emb": pa.nulls(n, pa.list_(pa.float32())),
            "lang": t["lang"],
        }).cast(schema)

    mixed = embeddings_ds.map_batches(emb_side, batch_format="pyarrow").union(
        documents_ds.map_batches(doc_side, batch_format="pyarrow")
    )
    mixed = mixed.repartition(num_blocks=num_partitions, keys=["jkey"])

    empty = pa.table({
        "lang": pa.array([], pa.string()),
        "dim_no": pa.array([], pa.int64()),
        "sum_q": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
    })

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["jkey"].combine_chunks().to_numpy(zero_copy_only=False)
        esel = np.flatnonzero(tag == 0)
        dsel = np.flatnonzero(tag == 1)
        if len(esel) == 0 or len(dsel) == 0:
            return empty
        # group label lookup: doc ids are unique, sorted searchsorted map
        dk = k[dsel]
        order = np.argsort(dk, kind="stable")
        dk = dk[order]
        langs = t["lang"].combine_chunks().take(
            pa.array(dsel[order], pa.int64()))
        enc = langs.dictionary_encode()
        lang_codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(dk, k[esel])
        pos_c = np.minimum(pos, len(dk) - 1)
        hit = dk[pos_c] == k[esel]
        esel, pos_c = esel[hit], pos_c[hit]
        if len(esel) == 0:
            return empty
        emb = t["emb"].combine_chunks().take(pa.array(esel, pa.int64()))
        mat = np.asarray(
            emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(len(esel), -1)
        q = np.floor(mat * QUANT).astype(np.int64)
        g = lang_codes[pos_c]
        ng = len(enc.dictionary)
        d = q.shape[1]
        sums = np.zeros((ng, d), dtype=np.int64)
        np.add.at(sums, g, q)
        counts = np.bincount(g, minlength=ng).astype(np.int64)
        # inner-join semantics: a lang whose docs matched no vector in this
        # block must not emit (the oracle's JOIN produces no such rows)
        live = np.flatnonzero(counts > 0)
        sums, counts = sums[live], counts[live]
        nl = len(live)
        lang_out = enc.dictionary.take(
            pa.array(np.repeat(live, d), pa.int64()))
        return pa.table({
            "lang": lang_out,
            "dim_no": pa.array(np.tile(np.arange(1, d + 1), nl), pa.int64()),
            "sum_q": pa.array(sums.reshape(-1), pa.int64()),
            "n": pa.array(np.repeat(counts, d), pa.int64()),
        })

    parts = mixed.map_batches(partial, batch_format="pyarrow", batch_size=None)
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in parts.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(tabs)
    langs = t["lang"].combine_chunks()
    enc = langs.dictionary_encode()
    lc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dims = t["dim_no"].to_numpy(zero_copy_only=False)
    key = lc * (int(dims.max()) + 1 if len(dims) else 1) + dims
    uk, inv = np.unique(key, return_inverse=True)
    s = np.zeros(len(uk), dtype=np.int64)
    n = np.zeros(len(uk), dtype=np.int64)
    np.add.at(s, inv, t["sum_q"].to_numpy(zero_copy_only=False))
    np.add.at(n, inv, t["n"].to_numpy(zero_copy_only=False))
    base = int(dims.max()) + 1 if len(dims) else 1
    return pa.table({
        "lang": enc.dictionary.take(pa.array(uk // base, pa.int64())),
        "dim_no": pa.array(uk % base, pa.int64()),
        "sum_q": pa.array(s, pa.int64()),
        "n": pa.array(n, pa.int64()),
    })


EMBEDDING_CENTROIDS_SQL = """
SELECT lang, CAST(i AS BIGINT) AS dim_no,
       CAST(SUM(CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000)
                     AS BIGINT)) AS BIGINT) AS sum_q,
       CAST(COUNT(*) AS BIGINT) AS n
FROM embeddings
JOIN documents ON vec_id = doc_id
CROSS JOIN range(1, 65) t(i)
GROUP BY lang, i
"""


def embedding_gram(embeddings_ds, dim: int = 64, quant: float = QUANT):
    """-> (i, j, gram_q) upper triangle (1-based, i <= j) of the exact
    quantized Gram matrix  G = Q^T Q,  Q = floor(float64(embedding) * 1e6).

    The covariance / PCA building block: each block contributes one
    (dim x dim) int64 matmul partial — GRID-sized, so the op needs ZERO
    keyed exchange; the driver merges dim^2 x blocks rows in Python
    arbitrary-precision ints (no silent wrap) and the result is emitted
    as int64.  Quantization matches embedding_centroids (floor after an
    exact float32->float64 cast: no rounding-rule divergence vs SQL).

    Overflow bounds: per-block partial |G_ij| <= block_rows * quant^2
    (4096-row blocks with |x|<=1: ~4e15, safe in int64); the MERGED value
    must also fit int64 — with |x|<=1 that holds to ~9.2e6 rows per 1e6
    quant, and the driver RAISES (not wraps) beyond it.  The 100 TB
    configuration drops quant to 1e3 (exact to ~9.2e12 rows) — same code
    path, one constant.
    """

    def gram_partial(t: pa.Table) -> pa.Table:
        iu, ju = np.triu_indices(dim)
        if len(t) == 0:
            return pa.table({
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        emb = t["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * quant).astype(np.int64).reshape(len(t), dim)
        g = q.T @ q
        return pa.table({
            "i": pa.array(iu + 1, pa.int64()),
            "j": pa.array(ju + 1, pa.int64()),
            "s": pa.array(g[iu, ju], pa.int64()),
        })

    acc: dict[tuple[int, int], int] = {}
    parts = embeddings_ds.select_columns(["embedding"]).map_batches(
        gram_partial, batch_format="pyarrow", batch_size=4096)
    for b in parts.iter_batches(batch_format="pyarrow"):
        ii = b["i"].to_numpy(zero_copy_only=False)
        jj = b["j"].to_numpy(zero_copy_only=False)
        ss = b["s"].to_numpy(zero_copy_only=False)
        for i, j, s in zip(ii.tolist(), jj.tolist(), ss.tolist()):
            acc[(i, j)] = acc.get((i, j), 0) + s
    lim = (1 << 63) - 1
    bad = [k for k, v in acc.items() if abs(v) > lim]
    if bad:
        raise OverflowError(
            f"embedding_gram: merged cell(s) {bad[:3]} exceed int64; "
            f"lower quant (see docstring overflow bounds)")
    keys = sorted(acc)
    return pa.table({
        "i": pa.array([k[0] for k in keys], pa.int64()),
        "j": pa.array([k[1] for k in keys], pa.int64()),
        "gram_q": pa.array([acc[k] for k in keys], pa.int64()),
    })


EMBEDDING_GRAM_SQL = """
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(SUM(
         CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000)
              AS BIGINT)
         * CAST(FLOOR(CAST(embedding[CAST(j AS INT)] AS DOUBLE) * 1000000)
                AS BIGINT)
       ) AS BIGINT) AS gram_q
FROM embeddings
CROSS JOIN range(1, 65) t(i)
CROSS JOIN range(1, 65) u(j)
WHERE j >= i
GROUP BY i, j
"""


def embedding_pca_projection(embeddings_ds, dim: int = 64,
                             quant: float = QUANT, n_iter: int = 64):
    """-> (vec_id, proj_q): exact int64 projection of every embedding
    onto the corpus's top principal direction (uncentered PCA / top
    right-singular vector).

    Two stages:
    1. the distributed part is :func:`embedding_gram` (grid-sized
       partials, zero exchange); the driver runs ``n_iter`` fixed power
       iterations on the tiny dim x dim matrix (start vector = ones,
       sign fixed so the largest-|component| entry is positive) and
       quantizes the direction to int64 (floor(v * 1e6));
    2. one streaming map_batches computes the exact integer dot product
       q . w per row (|q|,|w| <= 1e6 -> 6.4e13 max at dim 64, safe) —
       bit-identical under any partitioning because the broadcast w is
       the single source of float work.

    rows-only in the registry (eigenvectors are not SQL-expressible);
    pytest pins parity with a single-matrix numpy replica and partition
    invariance (tests/test_pca.py)."""
    import ray

    gram = embedding_gram(embeddings_ds, dim=dim, quant=quant)
    g = np.zeros((dim, dim), np.float64)
    gi = gram["i"].to_numpy(zero_copy_only=False) - 1
    gj = gram["j"].to_numpy(zero_copy_only=False) - 1
    gv = gram["gram_q"].to_numpy(zero_copy_only=False).astype(np.float64)
    g[gi, gj] = gv
    g[gj, gi] = gv
    v = np.ones(dim, np.float64) / np.sqrt(dim)
    for _ in range(n_iter):
        v = g @ v
        nrm = np.linalg.norm(v)
        if nrm == 0.0:
            v = np.ones(dim, np.float64) / np.sqrt(dim)
            break
        v = v / nrm
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    w = np.floor(v * quant).astype(np.int64)
    wref = ray.put(w)

    def project(t: pa.Table, _wref=wref) -> pa.Table:
        ww = ray.get(_wref)
        if len(t) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "proj_q": pa.array([], pa.int64())})
        emb = t["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * quant).astype(np.int64).reshape(len(t), dim)
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "proj_q": pa.array(q @ ww, pa.int64()),
        })

    return embeddings_ds.select_columns(["vec_id", "embedding"]).map_batches(
        project, batch_format="pyarrow")


#: outlier-distance quantization — coarser than QUANT so the exact
#: integer n*q - S arithmetic stays in int64 (see embed_outliers bounds)
OUTLIER_QUANT = 1_000.0


def embed_outliers(embeddings_ds, dim: int = 64,
                   quant: float = OUTLIER_QUANT):
    """-> (vec_id, label, dist2): per-vector EXACT squared distance to
    its own label's centroid, in the cross-multiplied integer basis

        dist2 = sum_i (n_label * q_i(v) - S_label_i)^2

    (q = floor(f64(x) * 1e3), S = per-label component sums, n = label
    count) — the division-free form of ||q - S/n||^2 scaled by n^2, so
    the within-label outlier RANKING is exact and the SQL oracle
    hash-matches.  The embedding-space outlier/mislabel detector of the
    curation tier.

    Two streaming passes, ZERO keyed exchange: pass 1 reduces each block
    to (labels x dim) int64 partial sums + counts (grid-sized; driver
    merge + ray.put broadcast), pass 2 computes dist2 vectorized per row.

    Overflow bound: |n*q - S| <= 2 * n * quant, so dist2 <= dim * 4 *
    n^2 * quant^2 — at quant 1e3 and dim 64 that is int64-safe to
    n ~ 1.9e5 rows per label; larger labels need a coarser quant (one
    constant, same code path — the embedding_gram discipline).

    Input discipline (shared with the SQL oracle): non-finite embedding
    values RAISE (np.floor(nan).astype(int64) would silently wrap to
    INT64_MIN where DuckDB yields NULL — a silent hash divergence), and
    every integer step is bound-checked in Python ints so an overflow
    RAISES where the oracle's BIGINT multiply would raise too — the two
    sides agree or both fail, never silently diverge."""
    import ray

    I64_MAX = (1 << 63) - 1

    def _quantize(t: pa.Table) -> np.ndarray:
        flat = t["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        if len(flat) != len(t) * dim:
            raise ValueError(
                f"embed_outliers: expected dim={dim} embeddings, got "
                f"{len(flat)} values over {len(t)} rows")
        if not np.isfinite(flat).all():
            raise ValueError(
                "embed_outliers: non-finite embedding value — "
                "np.floor would wrap to INT64_MIN where the SQL oracle "
                "yields NULL; clean the input first")
        scaled = flat * quant
        if np.abs(scaled).max(initial=0.0) >= float(I64_MAX):
            raise ValueError(
                "embed_outliers: quantized component exceeds int64")
        return np.floor(scaled).astype(np.int64).reshape(len(t), dim)

    def sum_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        lab = pc.cast(t["label"], pa.int64()).to_numpy(zero_copy_only=False)
        q = _quantize(t)
        # per-block partial-sum bound, checked in Python ints (no wrap):
        # n rows x |q|max accumulated into one int64 cell
        if len(t) and int(np.abs(q).max()) * len(t) > I64_MAX:
            raise ValueError(
                "embed_outliers: per-block component sum would overflow "
                "int64 — use a coarser quant")
        ulab, inv = np.unique(lab, return_inverse=True)
        s = np.zeros((len(ulab), dim), np.int64)
        np.add.at(s, inv, q)
        n = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ulab, dim), pa.int64()),
            "i": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                  len(ulab)), pa.int64()),
            "s": pa.array(s.reshape(-1), pa.int64()),
            "n": pa.array(np.repeat(n, dim), pa.int64()),
        })

    # ROW-EXACT merge (round-4 root cause of the driver's two-round
    # embed_outliers red row): the original loop did
    # ``sums[L][i[m]] += s[m]`` + ``counts[L] += n[m][0]``, which is
    # only correct when every iter_batches batch holds AT MOST ONE
    # partial block's rows per label — numpy fancy-index += drops
    # duplicate indices and n[m][0] takes one block's count.  The
    # default 256-row iter_batches COALESCES small partial blocks, so
    # at high parallelism (driver: 32 cpus -> 64 tiny read blocks) two
    # partials' rows for one label could share a batch and silently
    # corrupt S and N — invisible at the replica's 8 cpus, where the
    # 640-row partials happened to align with the 256-row batches.
    # np.add.at accumulates duplicate (label, i) pairs exactly, the
    # count rides only on each partial's i == 0 row (exactly one per
    # (partial, label), whatever the batching), and batch_size=None
    # yields whole blocks so a partial is never split mid-label either.
    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    src = embeddings_ds.select_columns(["vec_id", "embedding", "label"])
    for b in src.map_batches(sum_partial, batch_format="pyarrow"
                             ).iter_batches(batch_format="pyarrow",
                                            batch_size=None):
        if not b.num_rows:
            continue
        lab = b["label"].to_numpy(zero_copy_only=False)
        i = b["i"].to_numpy(zero_copy_only=False)
        s = b["s"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        for L in np.unique(lab):
            m = lab == L
            sums.setdefault(int(L), np.zeros(dim, np.int64))
            np.add.at(sums[int(L)], i[m], s[m])
            first = m & (i == 0)
            counts[int(L)] = counts.get(int(L), 0) + int(n[first].sum())
    labs = sorted(sums)
    S = np.stack([sums[L] for L in labs]) if labs else np.zeros((0, dim),
                                                                np.int64)
    N = np.asarray([counts[L] for L in labs], np.int64)
    lab_index = {L: k for k, L in enumerate(labs)}
    bref = ray.put((S, N, lab_index))

    def dist(t: pa.Table, _bref=bref) -> pa.Table:
        if len(t) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "dist2": pa.array([], pa.int64())})
        Sm, Nm, idx = ray.get(_bref)
        lab = pc.cast(t["label"], pa.int64()).to_numpy(zero_copy_only=False)
        k = np.asarray([idx[int(L)] for L in lab], np.int64)
        q = _quantize(t)
        # exact Python-int overflow gates for n*q - S and the dim-term
        # squared sum (the oracle's BIGINT arithmetic raises here too)
        qmax = int(np.abs(q).max()) if len(t) else 0
        nmax = int(Nm.max()) if len(Nm) else 0
        smax = int(np.abs(Sm).max()) if Sm.size else 0
        dmax = nmax * qmax + smax
        if dmax > I64_MAX or dim * dmax * dmax > I64_MAX:
            raise ValueError(
                "embed_outliers: n*q - S arithmetic would overflow "
                "int64 — use a coarser quant (see docstring bound)")
        diff = Nm[k][:, None] * q - Sm[k]
        d2 = np.einsum("ij,ij->i", diff, diff)
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "label": pa.array(lab, pa.int64()),
            "dist2": pa.array(d2, pa.int64()),
        })

    return src.map_batches(dist, batch_format="pyarrow")


EMBED_OUTLIERS_SQL = """
WITH qv AS (
  SELECT vec_id, label, i,
         CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000)
              AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(1, 65) t(i)
), s AS (
  SELECT label, i, SUM(q) AS s, COUNT(*) AS n FROM qv GROUP BY label, i
)
SELECT qv.vec_id, CAST(qv.label AS BIGINT) AS label,
       CAST(SUM((s.n * qv.q - s.s) * (s.n * qv.q - s.s)) AS BIGINT) AS dist2
FROM qv JOIN s ON qv.label = s.label AND qv.i = s.i
GROUP BY qv.vec_id, qv.label
"""


def embedding_xty(embeddings_ds, dim: int = 64, quant: float = QUANT):
    """-> (i, xty_q) [1-based]: exact int64 X^T y over the embedding
    table with y = the integer ``label`` column — the second sufficient
    statistic of closed-form ridge regression (X^T X is
    :func:`embedding_gram`).  Same zero-exchange grid-partial plan:
    each block contributes one dim-vector int64 partial, the driver
    merges in Python bigints and RAISES on int64 overflow."""

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        y = pc.cast(t["label"], pa.int64()).to_numpy(zero_copy_only=False)
        flat = t["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * quant).astype(np.int64).reshape(len(t), dim)
        s = q.T @ y
        return pa.table({
            "i": pa.array(np.arange(1, dim + 1), pa.int64()),
            "s": pa.array(s, pa.int64()),
        })

    acc = [0] * dim
    for b in embeddings_ds.select_columns(["embedding", "label"]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        ii = b["i"].to_numpy(zero_copy_only=False)
        ss = b["s"].to_numpy(zero_copy_only=False)
        for i, s in zip(ii.tolist(), ss.tolist()):
            acc[i - 1] += s
    lim = (1 << 63) - 1
    if any(abs(v) > lim for v in acc):
        raise OverflowError("embedding_xty: merged component exceeds "
                            "int64; lower quant")
    return pa.table({
        "i": pa.array(range(1, dim + 1), pa.int64()),
        "xty_q": pa.array(acc, pa.int64()),
    })


EMBEDDING_XTY_SQL = """
SELECT CAST(i AS BIGINT) AS i,
       CAST(SUM(
         CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000)
              AS BIGINT) * CAST(label AS BIGINT)
       ) AS BIGINT) AS xty_q
FROM embeddings
CROSS JOIN range(1, 65) t(i)
GROUP BY i
"""


def ridge_fit_scores(embeddings_ds, dim: int = 64, quant: float = QUANT,
                     lam_q2: int = 10**12):
    """-> (vec_id, score_q): closed-form ridge regression trained
    DISTRIBUTED and applied in one broadcast pass.

    Training is exact sufficient statistics — G = X^T X
    (:func:`embedding_gram`) and b = X^T y (:func:`embedding_xty`), both
    zero-exchange grid partials — followed by a driver-side 64x64 solve
    of (G + lam_q2 * I) w = b (lam_q2 is lambda in the quantized basis:
    G scales as quant^2, so lam_q2 = 1e12 means lambda = 1 in raw
    units).  The solve is the only float step; the learned direction
    re-quantizes to int64 (floor(w_unit * 1e6), w scaled to unit max
    |component|) and scoring is an exact integer dot product — the
    embedding_pca discipline, so scores are bit-identical under any
    partitioning.  pytest pins parity with a single-matrix numpy replica
    and sign/ranking recovery of a planted linear signal
    (tests/test_ridge.py)."""
    import ray

    gram = embedding_gram(embeddings_ds, dim=dim, quant=quant)
    xty = embedding_xty(embeddings_ds, dim=dim, quant=quant)
    g = np.zeros((dim, dim), np.float64)
    gi = gram["i"].to_numpy(zero_copy_only=False) - 1
    gj = gram["j"].to_numpy(zero_copy_only=False) - 1
    gv = gram["gram_q"].to_numpy(zero_copy_only=False).astype(np.float64)
    g[gi, gj] = gv
    g[gj, gi] = gv
    b = xty["xty_q"].to_numpy(zero_copy_only=False).astype(np.float64)
    w = np.linalg.solve(g + float(lam_q2) * np.eye(dim), b)
    mx = np.max(np.abs(w))
    if mx > 0:
        w = w / mx
    wq = np.floor(w * quant).astype(np.int64)
    wref = ray.put(wq)

    def score(t: pa.Table, _wref=wref) -> pa.Table:
        if len(t) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "score_q": pa.array([], pa.int64())})
        ww = ray.get(_wref)
        flat = t["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * quant).astype(np.int64).reshape(len(t), dim)
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "score_q": pa.array(q @ ww, pa.int64()),
        })

    return embeddings_ds.select_columns(["vec_id", "embedding"]).map_batches(
        score, batch_format="pyarrow")
