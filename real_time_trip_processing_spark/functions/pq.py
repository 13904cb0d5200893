"""Product quantization (PQ) — the compression half of a production
vector index (IVF-PQ), completing the X3 surface next to `ivf_topk`
(coarse quantizer) and `embedding_quantize_int8` (scalar quantizer).

A vector is split into ``m`` subspaces; each subspace gets its own
k-entry codebook (L2 Lloyd, the PQ standard — Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011); a vector is
stored as ``m`` small codes (m=8, k=16 → 8 nibbles ≈ 4 bytes for a
64-dim float vector, a 64× compression). Search uses asymmetric
distance computation (ADC): the query stays exact, per-(subspace, code)
inner products are precomputed into a lookup table, and scoring a
corpus vector is ``m`` table lookups — no float vector is ever read at
query time.

Scale shape:
- TRAINING is driver-coordinated like `kmeans_fit_rows`: per iteration
  only (m × k × sub_dim) partial sums cross to the driver; the corpus
  never moves. Assignment runs as an Arrow-batched argmin kernel (dense
  linear algebra — the measured ~100× win over interpreted Catalyst
  higher-order functions, see `similarity._srp_sig_arrow`).
- ENCODING is the same Arrow kernel: one (batch × dim) · (dim × m·k)
  matmul per Arrow batch, row-local, zero shuffle.
- ADC SEARCH is pure JVM expressions: the per-query LUT rides in as a
  broadcast literal, scoring is ``m`` `element_at` lookups + adds
  inside whole-stage codegen, and the only exchange in the plan is the
  per-query top-k window over (query_id, cand_id, score) rows. The
  corpus side reads CODES (bytes), not vectors — at 100 TB this is the
  difference between scanning 4 bytes/vector and 256.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: [subspace][code][sub_dim] — driver-resident, like CentroidRows.
SubCodebooks = list[list[list[float]]]


def _slices(dim: int, m: int) -> list[tuple[int, int]]:
    assert dim % m == 0
    sub = dim // m
    return [(j * sub, (j + 1) * sub) for j in range(m)]


def _encode_kernel(books: SubCodebooks, dim: int):
    """Arrow-batched PQ encoder: argmin-L2 code per subspace.

    ||x_j - c||² = ||c||² - 2·x_j·c + const(x) → argmin over codes
    needs only the (sub_dim × k) matmul plus the precomputed ||c||²
    row; ties resolve to the LOWEST code (np.argmin contract), so
    encoding is deterministic for a fixed codebook."""
    mats = [np.array(b, dtype=np.float64) for b in books]  # k × sub
    norms = [np.sum(b * b, axis=1) for b in mats]
    bounds = _slices(dim, len(books))

    @F.pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.array([np.asarray(r, dtype=np.float64) for r in v])
        codes = np.empty((x.shape[0], len(mats)), dtype=np.int32)
        for j, ((lo, hi), cb, cn) in enumerate(zip(bounds, mats, norms)):
            d = cn[None, :] - 2.0 * (x[:, lo:hi] @ cb.T)
            codes[:, j] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return encode


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    dim: int = 64,
    id_col: str = "vec_id",
) -> SubCodebooks:
    """Train per-subspace codebooks with L2 Lloyd iterations.

    Init: per subspace, the slices of the ``k`` lowest-id vectors (the
    deterministic init discipline of `kmeans_fit_rows`; ``id_col``
    names the id like everywhere else in this API — training must run
    on the same frames the search half accepts). Update: one aggregate
    per iteration producing (m × k × sub_dim) means — the only data
    that ever reaches the driver. Empty codes keep their previous
    centroid."""
    bounds = _slices(dim, m)
    v = emb.select(F.col(vec_col).cast("array<double>").alias("v"))

    init = (
        emb.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(init) < k:
        # the rebuild loop indexes books[j][c] for every c < k — a
        # too-small corpus would die with a bare IndexError deep in the
        # update pass instead of saying what's wrong
        raise ValueError(
            f"pq_train needs at least k={k} vectors to seed the "
            f"codebooks; corpus has {len(init)}"
        )
    books: SubCodebooks = [
        [list(r["v"][lo:hi]) for r in init] for lo, hi in bounds
    ]

    for _ in range(iters):
        enc = _encode_kernel(books, dim)
        coded = v.select("v", enc(F.col("v")).alias("codes"))
        # one aggregate: mean of every (subspace, code, sub_dim) cell
        sums = (
            coded.select(
                F.posexplode("v").alias("d", "x"),
                F.col("codes"),
            )
            .select(
                (F.col("d") / (dim // m)).cast("int").alias("j"),
                (F.col("d") % (dim // m)).alias("sd"),
                F.element_at("codes", (F.col("d") / (dim // m)).cast("int") + 1).alias(
                    "code"
                ),
                "x",
            )
            .groupBy("j", "code", "sd")
            .agg(F.avg("x").alias("mean"))
            .collect()
        )
        cell = {(r["j"], r["code"], r["sd"]): r["mean"] for r in sums}
        books = [
            [
                [
                    cell.get((j, c, sd), books[j][c][sd])
                    for sd in range(dim // m)
                ]
                for c in range(k)
            ]
            for j in range(m)
        ]
    return books


def pq_encode(
    emb: DataFrame,
    books: SubCodebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(vec_id, codes array<int>) — the stored form of the index."""
    enc = _encode_kernel(books, dim)
    return emb.select(
        F.col(id_col).alias("cand_id"),
        enc(F.col(vec_col).cast("array<double>")).alias("codes"),
    )


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    books: SubCodebooks,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance top-k by approximate cosine: exact query ×
    reconstructed corpus vector, scored entirely from lookup tables.

    The queries (a handful of probes) are collected driver-side — the
    same discipline as the codebook — and ride back in as ONE broadcast
    DataFrame carrying each query's (m × k) dot-product LUT; the
    codebook-norm LUT is a global literal. The corpus codes stream
    through a single scan × broadcast cross join, and scoring a row is
    ``m`` `element_at` lookups into each LUT: pure codegen'd
    expressions over the codes column; the embedding column does not
    exist in this plan at all."""
    from .similarity import has_quant_direction

    spark = corpus_codes.sparkSession
    # zero-direction queries have no cosine and would LUT-score as NaN
    # everywhere — excluded, the engine-wide retrieval rule (round 7).
    # Candidates are CODES here (zero-ness is not recoverable from
    # them); a zero cand reconstructs to its subspace centroids and
    # scores finitely, which PQ's approximation contract tolerates.
    queries = queries.filter(has_quant_direction(F.col(vec_col)))
    q_rows = queries.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    id_type = dict(corpus_codes.dtypes)["cand_id"]
    q_lut = spark.createDataFrame(
        [
            (qr[id_col],) + _query_lut(qr["v"], books, dim)
            for qr in q_rows
        ],
        f"query_id {id_type}, q_norm DOUBLE, dot_lut ARRAY<ARRAY<DOUBLE>>",
    )
    scored = (
        corpus_codes.crossJoin(F.broadcast(q_lut))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", _adc_score(books).alias("score"))
    )
    return _rank_topk(scored, k)


def _query_lut(
    v, books: SubCodebooks, dim: int
) -> tuple[float, list[list[float]]]:
    """(||q||, per-(subspace, code) dot-product table) for one query.

    One gemv per subspace (codebook matrix @ query slice), not k
    row-wise dots — the LUT build dominated `ann_join_ivfpq_persisted`
    at sf0.1 (m·k tiny np.dot calls per build × nprobe builds per
    query ≈ 3.4 s of the measured 3.65 s; the gemv form is ~12×
    cheaper). Both persisted serve paths build LUTs HERE, so they stay
    bit-identical to each other by construction regardless of how BLAS
    accumulates."""
    qv = np.asarray(v, dtype=np.float64)
    return (
        float(np.sqrt(np.dot(qv, qv))),
        [
            (np.array(cb, dtype=np.float64) @ qv[lo:hi]).tolist()
            for (lo, hi), cb in zip(_slices(dim, len(books)), books)
        ],
    )


def _adc_score(books: SubCodebooks) -> "F.Column":
    """Approximate cosine from the codes column + the row's `dot_lut` /
    `q_norm` columns + the global codebook-norm literal — m element_at
    lookups per LUT, all codegen'd."""
    from .similarity import _double_matrix_literal

    mats = [np.array(b, dtype=np.float64) for b in books]
    # _double_matrix_literal, not bare numeric literals: the SQL parser
    # types a bare decimal literal as DECIMAL (or DOUBLE only when the
    # repr happens to use exponent form), so the LUT's element type —
    # and whether the nrm sums run in decimal — would vary with the
    # codebook's magnitudes; the helper's CAST('…' AS DOUBLE) trick
    # round-trips repr(float) exactly (its documented purpose)
    norm_lut = _double_matrix_literal(
        [[float(np.dot(c, c)) for c in cb] for cb in mats]
    )
    dot_expr = None
    nrm_expr = None
    for j in range(len(books)):
        code_j = F.element_at("codes", j + 1) + 1
        d = F.element_at(F.element_at("dot_lut", j + 1), code_j)
        n = F.element_at(F.element_at(norm_lut, j + 1), code_j)
        dot_expr = d if dot_expr is None else dot_expr + d
        nrm_expr = n if nrm_expr is None else nrm_expr + n
    return dot_expr / (F.col("q_norm") * F.sqrt(nrm_expr))


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    from ..operators.sorts import topk_per_group

    top = topk_per_group(scored, ["query_id"], [F.desc("score"), F.col("cand_id")], k)
    return top.select(
        "query_id",
        "cand_id",
        F.round("score", 8).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    books: SubCodebooks,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    codebook=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """The composed IVF-PQ index: coarse quantizer prunes the scan to
    ``nprobe / n_centroids`` of the corpus, PQ codes compress what is
    scanned, ADC LUTs score it — the standard billion-vector layout
    (FAISS IVF-PQ) as one DataFrame plan.

    Corpus side: centroid assignment (row-local, `nearest_centroid`) +
    PQ encoding (Arrow kernel) in a single projection — at real scale
    this frame IS the persisted index (bucket/partition it by cent_id
    so probes prune partitions). Query side: the probe list and the
    ADC LUTs are computed driver-side from the handful of probe
    vectors and broadcast as one (query, cent_id) frame; the join on
    cent_id replaces `pq_adc_topk`'s cross join, so only probed
    buckets are ever scored. Scores for surviving pairs are IDENTICAL
    to the full-scan `pq_adc_topk` (same codes, same LUTs — pinned in
    tests)."""
    from .similarity import _resolve_centroids, has_quant_direction

    # zero-direction queries excluded — see pq_adc_topk (round 7)
    queries = queries.filter(has_quant_direction(F.col(vec_col)))
    rows = _resolve_centroids(emb, codebook, n_centroids, id_col, vec_col)
    corpus = emb.select(
        F.col(id_col).alias("cand_id"),
        assign_encode_kernel(rows, books, dim)(
            F.col(vec_col).cast("array<double>")
        ).alias("ae"),
    ).select(
        "cand_id",
        F.col("ae.cent_id").alias("cent_id"),
        F.col("ae.codes").alias("codes"),
    )

    q_rows = queries.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    id_type = dict(emb.dtypes)[id_col]  # not hard-coded: string ids work
    q_lut = emb.sparkSession.createDataFrame(
        probe_luts(rows, books, q_rows, nprobe, dim, id_col),
        f"query_id {id_type}, cent_id INT, q_norm DOUBLE,"
        " dot_lut ARRAY<ARRAY<DOUBLE>>",
    )

    scored = (
        corpus.join(F.broadcast(q_lut), "cent_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", _adc_score(books).alias("score"))
    )
    return _rank_topk(scored, k)


def assign_encode_kernel(rows, books: SubCodebooks, dim: int):
    """Assignment + encoding FUSED into one struct-returning kernel: the
    vector column crosses the Arrow boundary once, not once per UDF
    (two separate pandas UDFs plan as two ArrowEvalPython stages, each
    re-shipping the full embedding column). Math is identical to
    `similarity.nearest_centroid_kernel` + `_encode_kernel` — pinned by
    test_ivfpq_scores_match_full_scan. Shared by the in-query
    `ivfpq_topk` and the persisted-index build (`ivf_index`)."""
    from .similarity import _quant_codebook, _quant_np

    qrows = _quant_codebook(rows)
    cids = np.array([c for c, _, _ in qrows], dtype=np.int64)
    ct = np.array([q for _, q, _ in qrows], dtype=np.float64).T  # dim × k
    cn = np.array([n for _, _, n in qrows])
    mats = [np.array(b, dtype=np.float64) for b in books]
    bnorms = [np.sum(b * b, axis=1) for b in mats]
    bounds = _slices(dim, len(books))

    @F.pandas_udf("struct<cent_id: int, codes: array<int>>")
    def assign_encode(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"cent_id": [], "codes": []})
        x = np.array([np.asarray(r, dtype=np.float64) for r in v])
        q = _quant_np(v)
        s = (q @ ct) / (
            np.sqrt(np.einsum("ij,ij->i", q, q))[:, None] * cn[None, :]
        )
        cent = cids[np.argmax(s, axis=1)].astype("int32")
        codes = np.empty((x.shape[0], len(mats)), dtype=np.int32)
        for j, ((lo, hi), cb, cnorm) in enumerate(zip(bounds, mats, bnorms)):
            d = cnorm[None, :] - 2.0 * (x[:, lo:hi] @ cb.T)
            codes[:, j] = np.argmin(d, axis=1)
        return pd.DataFrame({"cent_id": cent, "codes": list(codes)})

    return assign_encode


def probe_luts(
    rows, books: SubCodebooks, q_rows, nprobe: int, dim: int,
    id_col: str = "vec_id",
) -> list[tuple]:
    """(query_id, probed cent_id, q_norm, dot LUT) rows for the
    broadcast query frame. Probe ranking uses the same quantized metric
    as corpus assignment so a query's probed buckets are the buckets
    its neighbors were assigned to (mixing exact and quantized metrics
    could disagree on knife-edge centroid boundaries). Shared by the
    in-query and persisted serve paths."""
    from .similarity import _quant_codebook, _quant_np

    qcents = [
        (cid, np.asarray(q, dtype=np.float64), n)
        for cid, q, n in _quant_codebook(rows)
    ]
    lut_rows = []
    for qr in q_rows:
        qv = _quant_np([qr["v"]])[0]
        qn = float(np.sqrt(np.dot(qv, qv)))
        ranked = sorted(
            qcents,
            key=lambda c: (-(float(np.dot(qv, c[1])) / (qn * c[2] or 1.0)), c[0]),
        )
        q_norm, dot_lut = _query_lut(qr["v"], books, dim)
        for cid, _, _ in ranked[:nprobe]:
            lut_rows.append((qr[id_col], int(cid), q_norm, dot_lut))
    return lut_rows
