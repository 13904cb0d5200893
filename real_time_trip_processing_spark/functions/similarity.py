"""Vector / set similarity for the extension surface (SURVEY §2.12).

Design for 100 TB:
- cosine top-k: the *query* side is small (k probes) → broadcast it;
  the corpus side streams through a map-side nested loop that emits
  (query, candidate, score) and the planner's TakeOrdered/window-top-k
  keeps only k per query. Dot products run as built-in higher-order
  functions on double arrays — JVM-side, no Python.
- IVF / k-means assignment: the codebook is k × dim scalars — it rides
  into the plan as an array LITERAL and every centroid is scored inside
  the row (transform + argmax). No join, no extra rows, and no exchange
  ever carries an embedding column (pinned by
  tests/test_plan_shapes.py::test_kmeans_assignment_no_vector_shuffle).
- SRP-LSH near-dup: sign-random-projections over integer-quantized
  vectors with ±1 planes derived from md5 — pure integer arithmetic,
  so the whole bucketing pipeline is order-independent and replayable
  bit-for-bit by the DuckDB oracle (declared queries go hash-green,
  not rows-only).
- n-gram Jaccard near-dup: inverted-index self-join (explode shingles →
  equi-join on shingle → count per pair) instead of the O(n²) cross
  join; doc-frequency capping bounds the worst-case bucket.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .text import shingle_rows, shingle_set_rows

#: (cent_id, vector) pairs, cent_id ascending — a driver-side codebook.
CentroidRows = list[tuple[int, list[float]]]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over array<double> — deterministic
    order (matches a scalar loop bit-for-bit)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------------------
# Quantized-integer cosine: the bit-exact fast path
#
# Every *declared* similarity score is computed over SRP_QUANT-quantized
# vectors (round(x·1e6), half away from zero — the same contract as the
# SRP signatures).  Quantized dots and squared norms are exact integers,
# and for dim·max(q)² < 2^53 every intermediate of the float64 math is an
# exactly-representable integer — so accumulation ORDER cannot change a
# single bit.  numpy BLAS matmul, the interpreted JVM fold, and DuckDB's
# list_dot_product all produce identical doubles, which is what lets the
# hot paths run as Arrow kernels while the oracles stay hash-green.
# Resolution cost: |Δcosine| ≤ ~2·dim·1e-6/|v| — invisible at ROUND(,8)
# scale for unit-ish embeddings, and *identical* on both engines either
# way.
# ---------------------------------------------------------------------------

#: float64 stays exact for integers below this bound (2^53).
_EXACT_F64 = float(2**53)


def quant_vec(col: Column) -> Column:
    """array<double> → array<long>: the shared SRP_QUANT quantization
    (Spark round() is half away from zero, same as DuckDB/numpy's
    sign·floor(|x|+0.5))."""
    return F.transform(
        col.cast("array<double>"), lambda x: F.round(x * SRP_QUANT).cast("long")
    )


def qdot(a: Column, b: Column) -> Column:
    """Exact integer dot product over two quantized (long) arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def qnorm(qa: Column) -> Column:
    """sqrt of the exact integer squared norm of a quantized array."""
    return F.sqrt(qdot(qa, qa).cast("double"))


def qcos(a: Column, b: Column) -> Column:
    """Quantized cosine, JVM-fold flavor — interpreted (not codegen'd),
    kept as the Python-free fallback and the bit-parity cross-check for
    the Arrow kernels (equality is exact, not approximate)."""
    qa, qb = quant_vec(a), quant_vec(b)
    return qdot(qa, qb).cast("double") / (qnorm(qa) * qnorm(qb))


def has_quant_direction(col: Column) -> Column:
    """True iff the quantized vector has a cosine direction — exactly
    ``qdot(quant_vec(v), quant_vec(v)) > 0`` under three-valued logic
    (NULL array, NULL element, empty array and all-zero-quant rows all
    evaluate non-true and drop), but as two short-circuiting array
    scans instead of four interpreted passes plus two long-array
    allocations. The zero-vector exclusion runs over EVERY corpus row
    in the similarity entry points, so its constant factor is scan
    cost: at 1M × 64 (tools/scale_vectors.py corpus) the qdot form
    adds +2.3 s per pass over the bare scan (0.22 s); this form adds
    +0.33 s. sim_topk steady-state at 1M stays at the pre-guard
    ~1.3–1.6 s envelope."""
    arr = col.cast("array<double>")
    no_nulls = ~F.exists(arr, lambda x: x.isNull())
    any_nonzero = F.exists(
        arr, lambda x: F.round(x * SRP_QUANT).cast("long") != 0
    )
    return no_nulls & any_nonzero


def _quant_np(vecs) -> np.ndarray:
    """Stack an iterable of array<double> rows and quantize to float64
    values that are exact integers. Raises if the exactness bound
    (dim·max(q)² < 2^53) could be violated — at that point lower
    SRP_QUANT rather than silently losing bit-parity."""
    m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs]) * SRP_QUANT
    q = np.sign(m) * np.floor(np.abs(m) + 0.5)
    if q.size and q.shape[1] * float(np.abs(q).max()) ** 2 >= _EXACT_F64:
        raise ValueError(
            "quantized dot may exceed 2^53 — lower SRP_QUANT for this corpus"
        )
    return q


def qcos_pair_kernel():
    """Arrow pair-scoring kernel: quantized cosine over (va, vb) rows —
    one vectorized einsum per batch instead of three interpreted
    dim-length folds per pair (the ~100× constant-factor gap measured in
    `_srp_sig_arrow`'s docstring). Bit-identical to `qcos` by integer
    exactness."""

    @F.pandas_udf("double")
    def score(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A, B = _quant_np(va), _quant_np(vb)
        d = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        return pd.Series(d / (na * nb))

    return score


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """X3: brute-force top-k cosine per query vector, scored over
    quantized vectors (bit-exact across engines; see module note).

    ``impl="arrow"`` (default, the 100 TB shape): the probe set is
    collected driver-side — bounded by design, probes are ≤ thousands of
    k×dim scalars, the same discipline as the IVF codebook collect — and
    scoring is ONE float64 BLAS matmul per corpus Arrow batch inside
    ``mapInPandas``. Each batch emits only its local top-k per query
    (safe: under the strict total order (score DESC, cand_id ASC) every
    global top-k row ranks ≤ k inside its own batch), so the final
    ranking window sees n_batches·k rows per query, never the corpus —
    and the corpus is scanned exactly once, never duplicated per query
    (the crossJoin flavor ships n_queries copies of every vector
    through the join).

    ``impl="builtin"``: JVM-only fold flavor (interpreted HOFs, no
    driver collect, no Python) — the cross-check and fallback; identical
    output bit-for-bit.
    """
    from ..operators.sorts import topk_per_group

    # zero-quantized vectors (all |x| below the quantization resolution
    # — padding/zero embeddings, real at corpus scale) have NO cosine
    # direction: their score is 0/0 = NaN, and Spark orders NaN as the
    # GREATEST double while numpy sorts it last — the builtin flavor
    # would rank a zero vector as every query's top neighbor while the
    # arrow flavor drops it. Exclude them on BOTH sides, both impls.
    def _nonzero(df):
        return df.filter(has_quant_direction(F.col(vec_col)))

    corpus, queries = _nonzero(corpus), _nonzero(queries)

    if impl == "arrow":
        id_type = dict(corpus.dtypes)[id_col]
        q_rows = sorted(
            (r[0], list(r[1]))
            for r in queries.select(
                id_col, F.col(vec_col).cast("array<double>")
            ).collect()
        )
        if not q_rows:  # empty probe set: np.stack would crash; the
            # correct answer is simply no results
            schema_empty = (
                f"query_id {dict(corpus.dtypes)[id_col]},"
                f" cand_id {dict(corpus.dtypes)[id_col]},"
                " score double, rank int"
            )
            return corpus.sparkSession.createDataFrame([], schema_empty)
        qt = _quant_np([v for _, v in q_rows]).T  # dim × nq
        qn = np.sqrt((qt * qt).sum(axis=0))
        qids = [i for i, _ in q_rows]
        schema = f"query_id {id_type}, cand_id {id_type}, score double"

        def scan(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                c = _quant_np(pdf[vec_col])
                s = c @ qt  # exact: every intermediate is an integer < 2^53
                cn = np.sqrt(np.einsum("ij,ij->i", c, c))
                scores = s / (cn[:, None] * qn[None, :])
                cids = pdf[id_col].to_numpy()
                out_q, out_c, out_s = [], [], []
                for j, qid in enumerate(qids):
                    mask = cids != qid
                    cand, sc = cids[mask], scores[mask, j]
                    take = np.lexsort((cand, -sc))[:k]
                    out_q.extend([qid] * len(take))
                    out_c.extend(cand[take])
                    out_s.extend(sc[take])
                yield pd.DataFrame(
                    {"query_id": out_q, "cand_id": out_c, "score": out_s}
                )

        scored = corpus.select(id_col, vec_col).mapInPandas(scan, schema)
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            quant_vec(F.col(vec_col)).alias("q_vec"),
        ).withColumn("q_norm", qnorm(F.col("q_vec")))
        c = corpus.select(
            F.col(id_col).alias("cand_id"),
            quant_vec(F.col(vec_col)).alias("c_vec"),
        ).withColumn("c_norm", qnorm(F.col("c_vec")))
        # Norms hoisted ONCE per side; per-pair work is one integer fold.
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("cand_id") != F.col("query_id"))
            .select(
                "query_id",
                "cand_id",
                (
                    qdot(F.col("q_vec"), F.col("c_vec")).cast("double")
                    / (F.col("q_norm") * F.col("c_norm"))
                ).alias("score"),
            )
        )
    top = topk_per_group(
        scored, ["query_id"], [F.desc("score"), F.col("cand_id")], k
    )
    return top.select("query_id", "cand_id", F.round("score", 8).alias("score"), "rank")


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    Exact all-pairs flavor — the correctness/recall reference that the
    SRP-LSH scale path (`srp_near_dup`) is verified against in tests.
    Scores use the same quantized-cosine contract as the declared
    queries so subset tests compare bit-for-bit. O(n²): NOT a declared
    query shape at corpus scale — keep it on samples and test fixtures.
    """
    # same zero-vector exclusion as srp_near_dup (NaN scores otherwise
    # pass `NaN >= threshold` under Spark's NaN-greatest ordering)
    emb = emb.filter(has_quant_direction(F.col(vec_col)))
    a = emb.select(F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = emb.select(F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", qcos(F.col("va"), F.col("vb")).alias("score"))
        .filter(F.col("score") >= threshold)
        .select("a", "b", F.round("score", 8).alias("score"))
    )


def _int_matrix_literal(matrix: list[list[int]]) -> Column:
    """A nested int matrix as ONE `F.expr` call. PySpark's `F.lit(list)`
    maps `lit` over every element — k × dim py4j round-trips (seconds of
    plan-build time for a 96×64 plane matrix). A single SQL string
    parses JVM-side in one call, and ConstantFolding collapses the
    CreateArray tree into one Literal node before the expensive
    optimizer passes run."""
    body = ",".join(
        "array(" + ",".join(str(int(v)) for v in row) + ")" for row in matrix
    )
    return F.expr(f"array({body})")


def _double_matrix_literal(matrix: list[list[float]]) -> Column:
    """Same single-call trick for doubles. String→double CAST round-trips
    `repr(float)` exactly, so the literal is bit-identical to the
    driver-side values (keeps assignment oracle-reproducible)."""
    body = ",".join(
        "array(" + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in row) + ")"
        for row in matrix
    )
    return F.expr(f"array({body})")


def _centroid_literals(rows: CentroidRows) -> tuple[Column, Column]:
    """The codebook as two array literals: vectors (cent_id-ascending)
    and the matching cent_id array — one py4j call each, not k × dim."""
    rows = sorted(rows, key=lambda r: r[0])
    vec_arr = _double_matrix_literal([vec for _, vec in rows])
    cid_arr = F.expr(
        "array(" + ",".join(str(int(cid)) for cid, _ in rows) + ")"
    )
    return vec_arr, cid_arr


def _quant_codebook(rows: CentroidRows):
    """Driver-side quantization of a codebook: cent_id-ascending lists
    of (cid, quantized int coords, norm). The norm is sqrt of the exact
    integer squared norm — Python's math.sqrt is the same
    correctly-rounded IEEE sqrt as the JVM/numpy/DuckDB ones, so the
    double is bit-identical everywhere."""
    import math

    out = []
    for cid, vec in sorted(rows, key=lambda r: r[0]):
        q = [
            int(math.floor(abs(x) * SRP_QUANT + 0.5)) * (1 if x >= 0 else -1)
            for x in vec
        ]
        n = math.sqrt(float(sum(v * v for v in q)))
        if n == 0.0:
            # a zero-quantized centroid has no cosine direction: its
            # score column is NaN in every assignment kernel, and
            # np.argmax treats NaN as the max — the WHOLE corpus would
            # silently assign to the dead centroid while no query ever
            # probes it (recall collapse). Degenerate codebooks fail
            # loudly at the single choke point every path shares.
            raise ValueError(
                f"centroid {cid} quantizes to the zero vector — no "
                "cosine direction; retrain the codebook or drop it"
            )
        out.append((int(cid), q, n))
    return out


def _qcent_literals(rows: CentroidRows) -> tuple[Column, Column, Column]:
    """Quantized codebook as three literals: int coord matrix, cent_id
    array, and the per-centroid norm array (norms precomputed driver
    side — re-deriving them per ROW inside a lambda would re-run a
    k×dim fold for every record)."""
    qrows = _quant_codebook(rows)
    qc_mat = _int_matrix_literal([q for _, q, _ in qrows])
    cid_arr = F.expr("array(" + ",".join(str(c) for c, _, _ in qrows) + ")")
    norm_arr = F.expr(
        "array("
        + ",".join(f"CAST('{n!r}' AS DOUBLE)" for _, _, n in qrows)
        + ")"
    )
    return qc_mat, cid_arr, norm_arr


def centroid_scores(qv: Column, qn: Column, rows: CentroidRows) -> Column:
    """Array of quantized-cosine scores of (pre-quantized) vector ``qv``
    (with hoisted norm ``qn``) against every centroid, cent_id
    ascending — the shared JVM scoring expression for assignment and
    probe selection."""
    qc_mat, _, norm_arr = _qcent_literals(rows)
    return F.zip_with(
        qc_mat,
        norm_arr,
        lambda c, nc: qdot(qv, c).cast("double") / (qn * nc),
    )


def nearest_centroid(vec: Column, rows: CentroidRows) -> Column:
    """cent_id of the nearest centroid by quantized cosine, ties to the
    lower cent_id — a single-row expression (no join, no shuffle).
    Interpreted-fold flavor; `nearest_centroid_kernel` is the Arrow
    fast path, bit-identical by integer exactness."""
    _, cid_arr, _ = _qcent_literals(rows)
    qv = quant_vec(vec)
    scores = centroid_scores(qv, qnorm(qv), rows)
    # array_position returns the FIRST index of the max → lowest cent_id
    return F.element_at(
        cid_arr, F.array_position(scores, F.array_max(scores)).cast("int")
    )


def nearest_centroid_kernel(rows: CentroidRows):
    """Arrow assignment kernel: quantized-cosine argmax over the
    codebook in one BLAS matmul per batch — ties to the lower cent_id
    (argmax returns the first maximum over cent_id-ascending columns).
    Bit-identical to `nearest_centroid` by integer exactness."""
    qrows = _quant_codebook(rows)
    cids = np.array([c for c, _, _ in qrows], dtype=np.int64)
    ct = np.array([q for _, q, _ in qrows], dtype=np.float64).T  # dim × k
    cn = np.array([n for _, _, n in qrows])

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        q = _quant_np(v)
        s = (q @ ct) / (
            np.sqrt(np.einsum("ij,ij->i", q, q))[:, None] * cn[None, :]
        )
        return pd.Series(cids[np.argmax(s, axis=1)].astype("int32"))

    return assign


def probe_rows_kernel(
    queries: DataFrame,
    rows: CentroidRows,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe rows ``(query_id, q_vec, cent_id)`` — each query row's
    nprobe nearest centroids, computed ROW-LOCALLY in one Arrow kernel
    (round 12, guide §4.2). The JVM formulation this replaces on the
    ann_join paths (quant_vec + qnorm + centroid_scores + array_sort +
    slice + explode) is INTERPRETED per row — Catalyst does not codegen
    higher-order lambdas — and measured 0.41 s vs 0.28 s for this
    kernel at sf0.1 with identical probe sets. Bit-identical probe
    choice: scores are exact-integer quantized cosines (every
    intermediate an integer < 2^53, so BLAS vs JVM fold order is
    irrelevant) and the tie-break replays array_sort's (-score,
    cent_id) struct order via the same lexsort every bucket kernel
    uses. Emits the RAW double vector alongside, as the JVM explosion
    did; fewer than nprobe centroids yields them all (slice
    semantics)."""
    qrows = _quant_codebook(rows)
    cids = np.array([c for c, _, _ in qrows], dtype=np.int64)
    ct = np.array([q for _, q, _ in qrows], dtype=np.float64).T  # dim × k
    cn = np.array([n for _, _, n in qrows])
    id_type = dict(queries.dtypes)[id_col]
    schema = f"query_id {id_type}, q_vec array<double>, cent_id int"

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            q = _quant_np(pdf[vec_col])
            s = (q @ ct) / (
                np.sqrt(np.einsum("ij,ij->i", q, q))[:, None] * cn[None, :]
            )
            order = np.lexsort(
                (np.broadcast_to(cids, s.shape), -s), axis=-1
            )[:, :nprobe]
            width = order.shape[1]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf[id_col].to_numpy(), width),
                    "q_vec": [v for v in vecs for _ in range(width)],
                    "cent_id": cids[order].ravel().astype("int32"),
                }
            )

    return queries.select(id_col, vec_col).mapInPandas(scan, schema)


def _resolve_centroids(
    corpus: DataFrame,
    codebook: DataFrame | CentroidRows | None,
    n_centroids: int,
    id_col: str,
    vec_col: str,
) -> CentroidRows:
    """Driver-side codebook rows from whichever form the caller holds.
    Collecting is k × dim scalars — the codebook is driver-resident by
    design (MLlib KMeans discipline); the corpus never moves.

    The default first-N-ids codebook excludes zero-direction vectors
    HERE, not in each caller: a zero-quantized vector at id <
    n_centroids would become a stored zero-norm centroid, and every
    downstream probe-selection cosine divides by the centroid norm —
    the persisted builders (ivf_index_build / ivfpq_index_build) used
    to resolve from the unfiltered corpus while ivf_topk pre-filtered,
    so the 'bit-identical' in-query and persisted paths could diverge
    (and ANSI mode crashed on the division). Filters commute, so the
    pre-filtering callers see the same rows as before."""
    if codebook is None:
        rows = (
            corpus.filter(has_quant_direction(F.col(vec_col)))
            .filter(F.col(id_col) < n_centroids)
            .select(
                F.col(id_col).cast("int").alias("cent_id"),
                F.col(vec_col).cast("array<double>").alias("cv"),
            )
            .collect()
        )
    elif isinstance(codebook, DataFrame):
        rows = codebook.select(
            F.col("cent_id").cast("int"), F.col("centroid").cast("array<double>")
        ).collect()
    else:
        return list(codebook)
    return [(int(r[0]), list(r[1])) for r in rows]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | CentroidRows | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """X3 scale path: IVF-style approximate top-k cosine, scored over
    quantized vectors (bit-exact across engines; see module note).

    Coarse quantizer: the first ``n_centroids`` vectors stand in for
    k-means centroids by default; pass ``codebook`` (from
    ``kmeans.kmeans_fit``) to use a trained one (same plan, better
    buckets). Scale shape:

    - ``impl="arrow"`` (default, the 100 TB shape): assignment, probe
      filtering and candidate scoring are FUSED into one `mapInPandas`
      scan — per Arrow batch, one assignment matmul against the
      codebook literal, then per query one gathered matvec over only
      the rows whose centroid that query probes (the IVF work saving:
      O(N · nprobe / n_centroids) scored candidates), emitting local
      top-k per query (safe under the strict (score desc, cand_id asc)
      order — the `cosine_topk` argument). The corpus is scanned once
      and NEVER joined, duplicated per query, or shuffled with its
      vectors; probe selection runs driver-side over the collected
      probe vectors (bounded, the codebook discipline) with the same
      quantized-integer cosine and tie-break as the JVM path;
    - ``impl="builtin"`` (Python-free fallback/cross-check): row-local
      JVM assignment fold over the centroid literal, probe selection as
      (−score, cent_id) struct sort, broadcast probe join on cent_id,
      interpreted-fold candidate scoring — bit-identical output;
    - either way the only shuffle in the plan is the final per-query
      top-k window over (query_id, cand_id, score) rows.

    Deterministic tie-breaks (centroid id, candidate id) keep the
    result oracle-reproducible.
    """
    from ..operators.sorts import topk_per_group

    # zero-direction vectors don't participate in cosine retrieval —
    # same rule and rationale as cosine_topk (round 7: a zero PROBE
    # divided by its zero norm in the probe-selection math, a zero
    # candidate's NaN score could surface in an under-full bucket's
    # top-k where numpy and SQL NaN orderings disagree); the _QDIR'd
    # oracles replay the exclusion
    corpus = corpus.filter(has_quant_direction(F.col(vec_col)))
    queries = queries.filter(has_quant_direction(F.col(vec_col)))
    rows = _resolve_centroids(corpus, codebook, n_centroids, id_col, vec_col)

    if impl == "arrow":
        # Fused scan: assignment, probe filtering and candidate scoring
        # in ONE mapInPandas pass over the corpus — no assignment UDF
        # stage, no probe join, no per-pair rows. The join flavor this
        # replaces materialized one row PER (query, candidate) carrying
        # BOTH 64-dim vectors (~1 KB/pair; ~0.5 GB at 1M rows × 16
        # queries) and paid per-pair Arrow stacking in the scorer — at
        # 1M rows it benched SLOWER than brute force. Here each batch
        # does one assignment matmul, then per query one gathered
        # matvec over only the rows whose centroid that query probes
        # (the IVF work saving, N·nprobe/n_centroids), emitting local
        # top-k (safe under the strict (score desc, cand_id asc) order,
        # exactly as `cosine_topk`). Probe selection runs driver-side
        # over the collected probe vectors (bounded — same discipline
        # as the codebook) with the same quantized-integer cosine and
        # (score desc, cent_id asc) tie-break as the JVM expression
        # path, so results stay bit-identical and oracle-green.
        id_type = dict(corpus.dtypes)[id_col]
        qrows = _quant_codebook(rows)  # cent_id-ascending
        ct = np.array([q for _, q, _ in qrows], dtype=np.float64).T  # dim×k
        cn = np.array([n for _, _, n in qrows])
        q_rows = sorted(
            (r[0], list(r[1]))
            for r in queries.select(
                id_col, F.col(vec_col).cast("array<double>")
            ).collect()
        )
        qt = _quant_np([v for _, v in q_rows]).T  # dim × nq
        qn = np.sqrt((qt * qt).sum(axis=0))
        qids = [i for i, _ in q_rows]
        s_q = (qt.T @ ct) / (qn[:, None] * cn[None, :])  # nq × k
        n_q, n_cent = s_q.shape
        probe_bool = np.zeros((n_q, n_cent), dtype=bool)
        for j in range(n_q):
            order = np.lexsort((np.arange(n_cent), -s_q[j]))
            probe_bool[j, order[: min(nprobe, n_cent)]] = True
        schema = f"query_id {id_type}, cand_id {id_type}, score double"

        def scan(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                c = _quant_np(pdf[vec_col])
                cn_r = np.sqrt(np.einsum("ij,ij->i", c, c))
                cent_idx = np.argmax(
                    (c @ ct) / (cn_r[:, None] * cn[None, :]), axis=1
                )
                cids_b = pdf[id_col].to_numpy()
                out_q, out_c, out_s = [], [], []
                for j, qid in enumerate(qids):
                    m = probe_bool[j][cent_idx] & (cids_b != qid)
                    if not m.any():
                        continue
                    idx = np.flatnonzero(m)
                    sc = (c[idx] @ qt[:, j]) / (cn_r[idx] * qn[j])
                    take = np.lexsort((cids_b[idx], -sc))[:k]
                    out_q.extend([qid] * len(take))
                    out_c.extend(cids_b[idx][take])
                    out_s.extend(sc[take])
                if out_q:
                    yield pd.DataFrame(
                        {"query_id": out_q, "cand_id": out_c, "score": out_s}
                    )

        scored = corpus.select(id_col, vec_col).mapInPandas(scan, schema)
    else:
        _, cid_arr, _ = _qcent_literals(rows)
        assigned = corpus.select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).cast("array<double>").alias("c_vec"),
        ).withColumn("cent_id", nearest_centroid(F.col("c_vec"), rows))

        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
            quant_vec(F.col(vec_col)).alias("q_qv"),
        ).withColumn("q_qn", qnorm(F.col("q_qv")))
        probe_pairs = F.zip_with(
            centroid_scores(F.col("q_qv"), F.col("q_qn"), rows),
            cid_arr,
            lambda s, cid: F.struct((-s).alias("ns"), cid.alias("cid")),
        )
        probes = q.select(
            "query_id",
            "q_vec",
            F.explode(F.slice(F.array_sort(probe_pairs), 1, nprobe)).alias("p"),
        ).select("query_id", "q_vec", F.col("p.cid").alias("cent_id"))

        joined = assigned.join(F.broadcast(probes), "cent_id").filter(
            F.col("cand_id") != F.col("query_id")
        )
        scored = joined.select(
            "query_id",
            "cand_id",
            qcos(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    top = topk_per_group(scored, ["query_id"], [F.desc("score"), F.col("cand_id")], k)
    return top.select(
        "query_id", "cand_id", F.round("score", 8).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def ann_join_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | CentroidRows | None = None,
    impl: str = "cogroup",
    max_bucket: int | None = None,
) -> DataFrame:
    """ANN JOIN — IVF top-k where the QUERY side is a full table, not a
    handful of broadcast probes (the retrieval-enrichment join: every
    new document finds its nearest corpus neighbors).

    `ivf_topk` deliberately treats queries as bounded (collected
    driver-side for the fused scan, or broadcast in the JVM flavor);
    that shape dies when |Q| ≈ |corpus|. Here BOTH sides stay
    distributed: corpus rows take their centroid in-row, query rows
    explode into their nprobe probe buckets in-row, and the two streams
    meet per cent_id bucket.

    ``impl="cogroup"`` (default, the scale shape): the bucket meeting
    is a COGROUP — corpus vectors shuffle once (N rows), probe vectors
    nprobe·|Q| rows, and each bucket is scored with ONE |Q_b|×|C_b|
    quantized matmul emitting per-(query, bucket) local top-k. The
    candidate pairs are never materialized as rows (the pair join ships
    BOTH 64-dim vectors on every candidate row — ~1 KB × N·nprobe/n_cent
    per query), and corpus assignment runs on the Arrow kernel
    (`nearest_centroid_kernel` — the interpreted in-row fold alone cost
    more than the whole cogroup at 1k×1k). Local bucket top-k is exact
    because a candidate lives in exactly one bucket.

    ``impl="pairs"`` (Python-lean fallback/cross-check): plain cent_id
    equi-join + Arrow pair-kernel scoring — same bits, one row per
    candidate pair.

    Both flavors end in the usual (score desc, cand_id asc) top-k
    window over ≤ nprobe·k survivors per query, so results are
    bit-reproducible and oracle-replayable.

    Scale discipline: candidate fan-out per query is
    N·nprobe/n_centroids — size n_centroids ~ √N (the IVF rule) so
    buckets stay ~√N wide. A hot centroid is shuffle skew: the pairs
    flavor leaves it to AQE's skew-join split, but the cogroup flavor's
    group is atomic — one Python worker owns the whole bucket. Pass
    ``max_bucket`` to bound that: one extra assignment pass over the
    corpus counts bucket sizes (only ≤ n_centroids count rows ever
    reach the driver — codebook discipline), any bucket
    wider than ``max_bucket`` splits into ceil(width/max_bucket)
    hash-salted sub-buckets (corpus rows pick ONE salt by id hash;
    probing queries replicate to ALL that bucket's salts), and scoring
    runs per (cent_id, salt). Results are bit-identical: every
    (query, candidate) pair still meets exactly once, local top-k per
    sub-bucket is exact under the strict (score desc, cand_id asc)
    order, and the final window merges sub-bucket survivors. Centroids
    ride as a driver-resident codebook (k × dim scalars, MLlib KMeans
    discipline).
    """
    from ..operators.sorts import topk_per_group

    # zero-direction exclusion, both sides (round 7): a zero QUERY
    # crashed the JVM probe-selection expression outright under ANSI
    # mode (divide by its zero norm — found by the zero-vector parity
    # suite), and a zero candidate's NaN score could leak into an
    # under-full bucket's top-k. Same rule as cosine_topk/ivf_topk;
    # the _QDIR'd oracle replays it.
    corpus = corpus.filter(has_quant_direction(F.col(vec_col)))
    queries = queries.filter(has_quant_direction(F.col(vec_col)))
    rows = _resolve_centroids(corpus, codebook, n_centroids, id_col, vec_col)
    _, cid_arr, _ = _qcent_literals(rows)

    assigned = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    )
    if impl == "cogroup":
        assigned = assigned.withColumn(
            "cent_id", nearest_centroid_kernel(rows)(F.col("c_vec"))
        )
    else:
        assigned = assigned.withColumn(
            "cent_id", nearest_centroid(F.col("c_vec"), rows)
        )

    if impl == "cogroup":
        # round 12 (guide §4.2): probe selection in the Arrow kernel —
        # the JVM explosion below is interpreted per row; see
        # probe_rows_kernel (bit-identical probe sets, 0.41 → 0.28 s
        # at sf0.1)
        probes = probe_rows_kernel(queries, rows, nprobe, id_col, vec_col)
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
            quant_vec(F.col(vec_col)).alias("q_qv"),
        ).withColumn("q_qn", qnorm(F.col("q_qv")))
        probe_pairs = F.zip_with(
            centroid_scores(F.col("q_qv"), F.col("q_qn"), rows),
            cid_arr,
            lambda s, cid: F.struct((-s).alias("ns"), cid.alias("cid")),
        )
        probes = q.select(
            "query_id",
            "q_vec",
            F.explode(F.slice(F.array_sort(probe_pairs), 1, nprobe)).alias("p"),
        ).select("query_id", "q_vec", F.col("p.cid").alias("cent_id"))

    if impl == "cogroup":
        id_type = dict(corpus.dtypes)[id_col]
        schema = f"query_id {id_type}, cand_id {id_type}, score double"

        def score_bucket(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            """One bucket: left = corpus members, right = probing
            queries. One quantized matmul, per-query local top-k."""
            if len(left) == 0 or len(right) == 0:
                return pd.DataFrame({"query_id": [], "cand_id": [], "score": []})
            C = _quant_np(left["c_vec"])
            Q = _quant_np(right["q_vec"])
            cn = np.sqrt(np.einsum("ij,ij->i", C, C))
            qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
            sc = (Q @ C.T) / (qn[:, None] * cn[None, :])
            cids = left["cand_id"].to_numpy()
            qids = right["query_id"].to_numpy()
            out_q, out_c, out_s = [], [], []
            for j in range(len(qids)):
                m = cids != qids[j]
                if not m.any():
                    continue
                idx = np.flatnonzero(m)
                take = idx[np.lexsort((cids[idx], -sc[j, idx]))[:k]]
                out_q.extend([qids[j]] * len(take))
                out_c.extend(cids[take])
                out_s.extend(sc[j, take])
            return pd.DataFrame(
                {"query_id": out_q, "cand_id": out_c, "score": out_s}
            )

        group_keys = ["cent_id"]
        if max_bucket is not None:
            # Bounded collect: one count per centroid. Assignment is
            # deterministic, so the sizes job and the main plan agree
            # even though the kernel runs in both.
            sizes = assigned.groupBy("cent_id").count().collect()
            n_salts = {
                int(r["cent_id"]): max(
                    1, -(-int(r["count"]) // int(max_bucket))
                )
                for r in sizes
            }
            if any(v > 1 for v in n_salts.values()):
                salt_map = F.create_map(
                    *[F.lit(x) for cn_ in n_salts.items() for x in cn_]
                )
                width = F.coalesce(
                    salt_map[F.col("cent_id")], F.lit(1)
                ).cast("int")
                assigned = assigned.withColumn(
                    "_salt",
                    F.pmod(F.xxhash64("cand_id"), width).cast("int"),
                )
                probes = probes.withColumn(
                    "_salt", F.explode(F.sequence(F.lit(0), width - 1))
                )
                group_keys = ["cent_id", "_salt"]
        scored = (
            assigned.groupby(*group_keys)
            .cogroup(probes.groupby(*group_keys))
            .applyInPandas(score_bucket, schema)
        )
    else:
        joined = assigned.join(probes, "cent_id").filter(
            F.col("cand_id") != F.col("query_id")
        )
        scored = joined.select(
            "query_id",
            "cand_id",
            qcos_pair_kernel()(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    top = topk_per_group(
        scored, ["query_id"], [F.desc("score"), F.col("cand_id")], k
    )
    return top.select(
        "query_id", "cand_id", F.round("score", 8).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


#: quantization scale for the SRP integer path: six decimal digits keeps
#: every |q| ≤ ~2^21 for unit-ish embeddings, so a dim-4096 signed dot
#: still fits a BIGINT with > 2^20 headroom.
SRP_QUANT = 1_000_000

#: Signature-FORMULA version for persisted SRP indexes
#: (`streaming/dedup.seed_srp_index` / `stream_embed_near_sink` stamp
#: it into the ``_SIG_FORMAT`` marker and assert it at index read —
#: the MinHash class-domain episode's lesson applied family-wide: a
#: formula change shifts every persisted bit string, and a stale index
#: silently screens nothing). v1 = md5-parity ±1 planes over
#: SRP_QUANT-quantized vectors. Bump on any change that shifts
#: persisted ``sig`` values.
SRP_SIG_VERSION = 1


def srp_signs(num_bits: int, dim: int) -> list[list[int]]:
    """±1 projection planes derived from md5(\"srp:bit:coord\") parity —
    no RNG state, reproducible in any engine that has md5 (the DuckDB
    oracle replays them exactly)."""
    return [
        [
            1 if int(hashlib.md5(f"srp:{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
            for j in range(dim)
        ]
        for i in range(num_bits)
    ]


def _srp_sig_expr(num_bits: int, dim: int) -> Column:
    """The signature as pure JVM expressions over column ``qv``
    (quantized vector): num_bits interpreted higher-order-function folds
    per row. Correct and Python-free, but Catalyst does not codegen
    higher-order functions — each of the num_bits × dim element steps
    is an interpreted eval, ~100× slower per element than the Arrow
    kernel. Kept as the no-Python fallback / cross-check."""
    # ONE expr call for the whole plane matrix (num_bits × dim): a single
    # py4j round-trip, folded to one Catalyst Literal node, so plan
    # construction is O(1) in num_bits.
    planes = _int_matrix_literal(srp_signs(num_bits, dim))
    dots = F.transform(
        planes,
        lambda p: F.aggregate(
            F.zip_with(F.col("qv"), p, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return F.array_join(
        F.transform(dots, lambda d: F.when(d >= 0, F.lit("1")).otherwise(F.lit("0"))),
        "",
    )


def _srp_sig_arrow(num_bits: int, dim: int):
    """Arrow-batched signature kernel: one int64 matmul per batch.

    Bit-for-bit identical to `_srp_sig_expr`: quantization replicates
    Spark/DuckDB ROUND (half away from zero) and the plane dots are
    int64 sums — order-independent, so BLAS accumulation order cannot
    flip a sign bit. This is dense linear algebra, exactly the workload
    where a vectorized Pandas UDF beats interpreted Catalyst
    higher-order functions by ~100× (pyspark guide: prefer built-ins
    EXCEPT where they can't express the computation efficiently —
    num_bits × dim folds per row is that case)."""
    planes_t = np.array(srp_signs(num_bits, dim), dtype=np.int64).T  # dim×bits

    @F.pandas_udf("string")
    def sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        m = np.array([np.asarray(x, dtype=np.float64) for x in v]) * SRP_QUANT
        # ROUND half-away-from-zero == Spark round() == DuckDB round()
        q = (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)
        bits = (q @ planes_t >= 0).astype(np.uint8) + ord("0")
        return pd.Series(
            [bits[i].tobytes().decode("ascii") for i in range(bits.shape[0])]
        )

    return sig


def srp_buckets(
    emb: DataFrame,
    num_bits: int,
    bands: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """(vid, band, bh) LSH bucket rows for sign-random-projection over
    integer-quantized vectors.

    Everything before the bucket rows is row-local: quantize → num_bits
    integer dot products against ±1 planes → per-band bit strings →
    explode. Integer sums are order-independent, which is what makes
    the bucketing deterministic across engines, partitionings AND the
    two impls (a float-plane SRP could flip a sign bit on
    summation-order noise).

    ``impl="arrow"`` (default) computes signatures with one int64
    matmul per Arrow batch; ``impl="builtin"`` uses pure JVM
    higher-order functions (slower: interpreted, not codegen'd — kept
    as the Python-free fallback and equivalence cross-check).

    ``dim`` is a schema-level constant of the corpus and must be passed
    in — constructing the plan triggers no Spark job.
    """
    assert num_bits % bands == 0
    return _srp_band_rows(
        srp_signatures(emb, num_bits, dim, id_col, vec_col, impl),
        num_bits,
        bands,
    )


def srp_signatures(
    emb: DataFrame,
    num_bits: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Per-vector SRP bit-string frame ``(vid, sig)`` — the reusable
    state every SRP flavor derives band rows from (the embedding twin
    of `minhash.minhash_signatures`). Signatures are a pure per-row
    function of the vector (deterministic ±1 planes, integer sums), so
    a stored signature equals a recomputed one — which is what makes a
    persisted `srp_corpus_index` a valid cross-cycle index."""
    if impl == "arrow":
        return emb.select(
            F.col(id_col).alias("vid"),
            _srp_sig_arrow(num_bits, dim)(
                F.col(vec_col).cast("array<double>")
            ).alias("sig"),
        )
    qv = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * SRP_QUANT).cast("long"),
    )
    v = emb.select(F.col(id_col).alias("vid"), qv.alias("qv"))
    return v.select("vid", _srp_sig_expr(num_bits, dim).alias("sig"))


def _srp_band_rows(sigs: DataFrame, num_bits: int, bands: int) -> DataFrame:
    """Explode a ``(vid, sig)`` frame to LSH band rows ``(vid, band,
    bh)`` — band keys are substrings of the bit string, so banding a
    stored signature is row-local and free of any vector arithmetic."""
    assert num_bits % bands == 0
    rows_per_band = num_bits // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("sig", b * rows_per_band + 1, rows_per_band).alias("bh"),
        )
        for b in range(bands)
    ]
    return sigs.select("vid", F.explode(F.array(*band_cols)).alias("bk")).select(
        "vid", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )


def srp_corpus_index(
    corpus: DataFrame,
    num_bits: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Persistable SRP corpus index ``(vid, sig, vec)`` for
    `srp_incremental_pairs(corpus_index=...)` — the SRP analog of
    `minhash_signatures` as a corpus index (round-9 ADVICE: without
    it, every ingest cycle re-read and re-signed the FULL corpus).

    One row per corpus vector: the ``num_bits``-char SRP bit string
    (band keys of ANY bands count dividing num_bits are substrings of
    it — banding a stored sig is row-local) and the float64 vector for
    exact verification. Write it to parquet once per corpus refresh and
    read it back across ingest cycles, like
    `streaming/dedup.corpus_hash_index` / `seed_minhash_index`; rows
    with no quantized direction are excluded at build time (the same
    `has_quant_direction` screen the inline path applies). The build is
    a pure scan→project — the signature is row-local, ZERO exchanges."""
    base = corpus.filter(has_quant_direction(F.col(vec_col))).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    if impl == "arrow":
        return base.select(
            "vid",
            _srp_sig_arrow(num_bits, dim)(F.col("vec")).alias("sig"),
            "vec",
        )
    qv = F.transform(
        F.col("vec"), lambda x: F.round(x * SRP_QUANT).cast("long")
    )
    return base.withColumn("qv", qv).select(
        "vid", _srp_sig_expr(num_bits, dim).alias("sig"), "vec"
    )


def srp_incremental_pairs(
    batch: DataFrame | None,
    corpus: DataFrame | None = None,
    num_bits: int = 16,
    bands: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bucket_cap: int | None = None,
    impl: str = "arrow",
    corpus_index: DataFrame | None = None,
    batch_index: DataFrame | None = None,
) -> DataFrame:
    """Incremental embedding near-dup — the per-ingest-cycle shape of
    `srp_near_dup`, the embedding twin of
    `minhash.minhash_incremental_pairs`: each NEW batch vector is
    screened against the ALREADY-INGESTED corpus. Returns verified
    pairs ``(a, b, score)`` with ``a`` a corpus id and ``b`` a batch id
    — never batch×batch or corpus×corpus.

    Scale shape: SRP bucket rows on both sides (row-local integer
    signatures — `srp_buckets`), then ONE (band, bh) equi-join with the
    BATCH on the probe side. The candidate stream is bounded by
    |batch| × (width of the corpus buckets the batch actually lands
    in) — an ingest-cycle cost, never the corpus self-join's Σ K².
    Verification is the exact quantized cosine (Arrow pair kernel by
    default; ``impl="builtin"`` keeps the bit-identical JVM fold as the
    Python-free cross-check). ``bucket_cap`` is the corpus-side
    degenerate-bucket guard, same LOUDLY-deterministic drop semantics
    as `srp_near_dup(bucket_cap=...)` — a corpus bucket wider than the
    cap contributes no candidates (both engines replay the drop); at
    100 TB set it to bound the per-batch-vector worst case. If per-pair
    transfer ever dominates an ingest cycle, the fused side-tagged
    cogroup kernel (score cross-side blocks per bucket, no pair rows —
    `srp_near_dup`'s kernel with a side split) is the upgrade path;
    at ingest-cycle batch sizes the join flavor's candidate mass is
    small, which is why it is the declared shape.

    ``corpus_index`` — a precomputed `srp_corpus_index` frame
    ``(vid, sig, vec)`` (round-9 ADVICE; the srp analog of the minhash
    twin's ``corpus_sigs``): band rows come from substrings of the
    STORED bit string and verification reads the STORED vector, so the
    corpus is never re-read or re-signed per ingest cycle — persist it
    to parquet once per corpus refresh and reuse it across cycles.
    When given, ``corpus`` is ignored (pass ``None``); signatures are
    a pure per-row function of the vector, so the stored path is
    bit-identical to inline recomputation (test-pinned).

    ``batch_index`` — the same `srp_corpus_index`-shaped frame for the
    BATCH side (round 9): band rows and verification vectors come from
    it instead of re-signing/re-scanning ``batch``, so a caller that
    already built the batch's index rows (the streaming sink computes
    them once per micro-batch for the self-screen, the corpus screen
    AND the index append) pays the row-local signature pass exactly
    once. ``batch`` is then ignored. Bit-identical to the inline path
    by the same purity argument, test-pinned alongside corpus_index."""
    if batch is None and batch_index is None:
        # symmetric with the corpus-side guard below (round-9 ADVICE:
        # this used to surface as AttributeError('NoneType') from
        # batch.filter, far from the misconfiguration)
        raise ValueError("pass batch or batch_index")
    if corpus is None and corpus_index is None:
        raise ValueError("pass corpus or corpus_index")
    if impl == "arrow":
        # Round-11 (guide §4.1/§8 and this docstring's own upgrade
        # path, promoted to the default): the FUSED side-tagged cogroup
        # kernel. The join flavor materialized every candidate pair as
        # a Spark row (distinct exchange), attached BOTH float64
        # vectors via two joins, and crossed the Python boundary once
        # per pair with 2·dim doubles. The fused flavor unions
        # side-tagged (vid, quantized-float32 vec, band, bh) rows,
        # shuffles them ONCE, and scores each bucket's corpus×batch
        # block with one einsum — candidate pairs never exist as rows;
        # only survivors leave the kernel. Measured at sf0.1: 1.83 s →
        # 1.15 s median, identical rows (pairs colliding in several
        # bands score identically — integer-exact math — and the final
        # distinct collapses them, as in `srp_near_dup`).
        return _srp_incremental_fused(
            batch, batch_index, corpus, corpus_index,
            num_bits, bands, threshold, dim, bucket_cap, id_col, vec_col,
        )
    # impl="builtin": the Python-free candidate-join cross-check —
    # bucket equi-join, distinct, two vector-attach joins, JVM qcos fold
    if batch_index is not None:
        bb = _srp_band_rows(
            batch_index.select("vid", "sig"), num_bits, bands
        ).select(F.col("vid").alias("b"), "band", "bh")
        vb = batch_index.select(
            F.col("vid").alias("b"), F.col("vec").alias("vb")
        )
    else:
        batch = batch.filter(has_quant_direction(F.col(vec_col)))
        bb = srp_buckets(
            batch, num_bits, bands, dim, id_col, vec_col, impl
        ).select(F.col("vid").alias("b"), "band", "bh")
        vb = batch.select(
            F.col(id_col).alias("b"),
            F.col(vec_col).cast("array<double>").alias("vb"),
        )
    if corpus_index is not None:
        cb = _srp_band_rows(
            corpus_index.select("vid", "sig"), num_bits, bands
        ).select(F.col("vid").alias("a"), "band", "bh")
        va = corpus_index.select(
            F.col("vid").alias("a"), F.col("vec").alias("va")
        )
    else:
        corpus = corpus.filter(has_quant_direction(F.col(vec_col)))
        cb = srp_buckets(
            corpus, num_bits, bands, dim, id_col, vec_col, impl
        ).select(F.col("vid").alias("a"), "band", "bh")
        va = corpus.select(
            F.col(id_col).alias("a"),
            F.col(vec_col).cast("array<double>").alias("va"),
        )
    if bucket_cap is not None:
        from pyspark.sql import Window

        cb = (
            cb.withColumn(
                "_k", F.count(F.lit(1)).over(Window.partitionBy("band", "bh"))
            )
            .filter(F.col("_k") <= bucket_cap)
            .drop("_k")
        )
    cand = bb.join(cb, ["band", "bh"]).select("a", "b").distinct()
    paired = cand.join(va, "a").join(vb, "b")
    scored = paired.select(
        "a", "b", qcos(F.col("va"), F.col("vb")).alias("score")
    )
    return (
        scored.filter(F.col("score") >= threshold)
        .select("a", "b", F.round("score", 8).alias("score"))
    )


def _srp_fused_side_rows(
    frame: DataFrame | None,
    index: DataFrame | None,
    side: int,
    num_bits: int,
    bands: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """``(vid, qv, side, band, bh)`` rows for `_srp_incremental_fused`
    — from a raw frame (row-local Arrow signature kernel) or a stored
    ``(vid, sig, vec)`` index (band keys are substrings of the STORED
    bit string; the quantized verify vector is a row-local transform of
    the stored float64 vector, bit-identical to inline quantization).
    ``bh`` is a codegen'd long (`conv` of the bit substring), the same
    8-byte shuffle key `srp_near_dup`'s kernel uses."""
    rows_per_band = num_bits // bands
    assert num_bits % bands == 0
    assert rows_per_band <= 62, "band hash must fit a signed long"
    if index is not None:
        s = index.select(
            "vid",
            F.transform(
                F.col("vec"),
                lambda x: F.round(x * SRP_QUANT).cast("float"),
            ).alias("qv"),
            "sig",
        )
    else:
        frame = frame.filter(has_quant_direction(F.col(vec_col)))
        s = frame.select(
            F.col(id_col).alias("vid"),
            F.transform(
                F.col(vec_col).cast("array<double>"),
                lambda x: F.round(x * SRP_QUANT).cast("float"),
            ).alias("qv"),
            _srp_sig_arrow(num_bits, dim)(
                F.col(vec_col).cast("array<double>")
            ).alias("sig"),
        )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.conv(
                F.substring("sig", b * rows_per_band + 1, rows_per_band), 2, 10
            ).cast("long").alias("bh"),
        )
        for b in range(bands)
    ]
    return (
        s.select(
            "vid", "qv", F.lit(side).alias("side"),
            F.explode(F.array(*band_cols)).alias("bk"),
        )
        .select(
            "vid", "qv", "side",
            F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"),
        )
    )


def _srp_incremental_fused(
    batch: DataFrame | None,
    batch_index: DataFrame | None,
    corpus: DataFrame | None,
    corpus_index: DataFrame | None,
    num_bits: int,
    bands: int,
    threshold: float,
    dim: int,
    bucket_cap: int | None,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The fused cross-side scoring path of `srp_incremental_pairs`
    (arrow impl): union side-tagged bucket rows (corpus side 0, batch
    side 1), ONE (band, bh) shuffle, and a ``mapInPandas`` kernel that
    scores each bucket's corpus×batch block with a gathered einsum —
    emitting only pairs clearing ``threshold``. The plan is the
    incremental twin of `srp_near_dup`'s kernel: same carry-buffer
    bucket stitching, same float64-exactness guard, same
    quantized-cosine arithmetic (d / (√n_a·√n_b) over exact integer
    dot products), so scores are bit-identical to the join flavor and
    the oracle. ``bucket_cap`` drops buckets whose CORPUS-side width
    exceeds the cap — computed in-kernel over exactly the rows the old
    window counted. When the same frame is passed as both sides (the
    streaming sink's self-screen), every vector appears once per side
    and the kernel emits all ordered cross pairs incl. a == b, exactly
    like the candidate equi-join did; the caller's ``a < b`` filter
    keeps its semantics."""
    src = batch_index if batch_index is not None else batch
    id_type = (
        dict(src.dtypes)["vid"] if batch_index is not None
        else dict(src.dtypes)[id_col]
    )
    rows = _srp_fused_side_rows(
        corpus, corpus_index, 0, num_bits, bands, dim, id_col, vec_col
    ).unionAll(
        _srp_fused_side_rows(
            batch, batch_index, 1, num_bits, bands, dim, id_col, vec_col
        )
    )
    # explicit width (not AQE's bytes advisory): compute-dense block
    # kernel — the same pin, for the same measured reason, as
    # `srp_near_dup`'s bucket exchange
    n_part = max(1, rows.sparkSession.sparkContext.defaultParallelism)
    part = rows.repartition(n_part, "band", "bh").sortWithinPartitions(
        "band", "bh", "side", "vid"
    )
    thr = float(threshold)
    cap = bucket_cap
    schema = f"a {id_type}, b {id_type}, score double"

    def _flush(pdf):
        if pdf is None or len(pdf) == 0:
            return None
        band_arr = pdf["band"].to_numpy()
        bh_arr = pdf["bh"].to_numpy()
        side_arr = pdf["side"].to_numpy()
        change = (band_arr[1:] != band_arr[:-1]) | (bh_arr[1:] != bh_arr[:-1])
        bounds = np.flatnonzero(change) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pdf)]))
        # rows sorted (band, bh, side, vid): each bucket is corpus rows
        # then batch rows; the side sum IS the batch width
        n_batch = np.add.reduceat(side_arr, starts)
        sizes = ends - starts
        n_corp = sizes - n_batch
        live = (n_batch >= 1) & (n_corp >= 1)
        if cap is not None:
            live &= n_corp <= cap
        if not live.any():
            return None
        vids = pdf["vid"].to_numpy()
        qvn = pdf["qv"].to_numpy()
        a_l, b_l, s_l = [], [], []
        for s0, e0, m_c in zip(starts[live], ends[live], n_corp[live]):
            qc = np.stack(
                [np.asarray(x, dtype=np.float64) for x in qvn[s0:s0 + m_c]]
            )
            qb = np.stack(
                [np.asarray(x, dtype=np.float64) for x in qvn[s0 + m_c:e0]]
            )
            mx = max(np.abs(qc).max(), np.abs(qb).max())
            if mx >= float(2**24) or qc.shape[1] * mx * mx >= _EXACT_F64:
                raise ValueError(
                    "quantized coords exceed the float32/float64 exactness "
                    "bound — lower SRP_QUANT for this corpus"
                )
            sc = (qc @ qb.T) / (
                np.sqrt(np.einsum("ij,ij->i", qc, qc))[:, None]
                * np.sqrt(np.einsum("ij,ij->i", qb, qb))[None, :]
            )
            ii, jj = np.nonzero(sc >= thr)
            if len(ii):
                a_l.append(vids[s0:s0 + m_c][ii])
                b_l.append(vids[s0 + m_c:e0][jj])
                s_l.append(sc[ii, jj])
        if not a_l:
            return None
        return pd.DataFrame(
            {
                "a": np.concatenate(a_l),
                "b": np.concatenate(b_l),
                "score": np.concatenate(s_l),
            }
        )

    def scan(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            last_band = pdf["band"].iloc[-1]
            last_bh = pdf["bh"].iloc[-1]
            tail = (pdf["band"] == last_band) & (pdf["bh"] == last_bh)
            carry = pdf[tail].reset_index(drop=True)
            out = _flush(pdf[~tail].reset_index(drop=True))
            if out is not None:
                yield out
        out = _flush(carry)
        if out is not None:
            yield out

    pairs = part.mapInPandas(scan, schema)
    return pairs.distinct().select(
        "a", "b", F.round("score", 8).alias("score")
    )


def srp_near_dup(
    emb: DataFrame,
    num_bits: int = 16,
    bands: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    impl: str = "arrow",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Embedding near-dup, LSH-bucketed: sign-random-projection banding
    prunes the pair space, quantized cosine (bit-exact across engines —
    see module note) verifies candidates — output is a
    no-false-positive subset of ``embedding_near_dup``; recall is
    tuned by bands/bits (collision prob per bit = 1 − θ/π).

    ``impl="arrow"`` (default) FUSES candidate generation and
    verification: bucket rows are hash-partitioned and sorted on
    (band, bh), and a ``mapInPandas`` kernel scores every bucket in
    its partition with vectorized gathered einsums, emitting only the
    pairs clearing ``threshold`` — the B² candidate pairs are never
    materialized as Spark rows at all. The whole plan is scan →
    signature kernel → ONE shuffle of (vid, quantized-float32 vec,
    band, bh) rows → block kernel → distinct over survivors. Compare
    the pair-join flavor (``impl="builtin"``, kept as the Python-free
    fallback/cross-check): bucket self-join, a distinct over every
    candidate pair, two vector-attach joins, and per-pair transfer of
    both vectors — at a low threshold the candidate mass is a large
    multiple of the corpus and that flavor moves |pairs|·2·dim doubles
    where this one moves |corpus|·bands quantized float32s.

    The shuffle DOES carry the quantized vector (4 bytes/coord —
    float32 holds integers ≤ 2^24 exactly, checked in-kernel): that is
    the deliberate trade. At 100 TB it is bands·4·dim bytes per vector
    once, versus a candidate-pair stream that is quadratic per bucket.
    The bucket repartition pins an EXPLICIT partition count scaled to
    the cluster (default parallelism) instead of letting AQE size
    the exchange by bytes: the kernel is compute-dense (m² einsum per
    bucket), so a bytes advisory coalesces it onto a fraction of the
    cores (measured: 6 tasks on 32 cores at sf0.1, +30% median and 2×
    the run-to-run spread — see the inline note). ``bucket_cap`` is the
    degenerate-bucket guard for production skew (a bucket with m
    members costs m² work; capped buckets are dropped — LOUDLY
    deterministic, both engines replay the cap). The declared query
    leaves it off.

    A pair colliding in several bands is scored in each — identical
    bits every time (integer-exact math), so the final ``distinct``
    collapses duplicates without a groupBy. Buckets are vid-sorted by
    the partition sort, so upper-triangle emission yields a < b; a
    bucket split across Arrow batches is stitched by the kernel's
    carry buffer (the sort makes groups contiguous).
    """
    # zero-quantized vectors have no cosine direction (score 0/0 = NaN;
    # Spark orders NaN greatest — a zero vector would pair with its
    # whole bucket in the builtin flavor while the arrow kernel's
    # `sc >= thr` drops NaN): exclude them up front, both impls
    emb = emb.filter(has_quant_direction(F.col(vec_col)))
    if impl == "arrow":
        id_type = dict(emb.dtypes)[id_col]
        rows_per_band = num_bits // bands
        assert num_bits % bands == 0
        # band hash as a LONG (conv from the bit substring, codegen'd):
        # the bucket shuffle key is 8 bytes instead of an
        # up-to-62-char string, and the kernel's bucket-boundary scan
        # is integer compares instead of per-row string work.
        assert rows_per_band <= 62, "band hash must fit a signed long"
        sig = _srp_sig_arrow(num_bits, dim)
        qv32 = F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * SRP_QUANT).cast("float"),
        )
        s = emb.select(
            F.col(id_col).alias("vid"),
            qv32.alias("qv"),
            sig(F.col(vec_col).cast("array<double>")).alias("sig"),
        )
        band_cols = [
            F.struct(
                F.lit(b).alias("band"),
                F.conv(
                    F.substring("sig", b * rows_per_band + 1, rows_per_band),
                    2,
                    10,
                ).cast("long").alias("bh"),
            )
            for b in range(bands)
        ]
        rows = s.select(
            "vid", "qv", F.explode(F.array(*band_cols)).alias("bk")
        ).select("vid", "qv", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
        # EXPLICIT partition count = one wave of task slots, NOT AQE's
        # bytes-based advisory: the block kernel is compute-dense (m²
        # einsum per bucket), so sizing this exchange by bytes
        # coalesces it onto a fraction of the cores. Measured at
        # sf0.1/local[32]: AQE coalesced the stage to 6 tasks — median
        # 0.84–0.96 s with a 0.62–1.6 s run-to-run spread (fat
        # stragglers + GC sensitivity); pinned to parallelism (32
        # tasks) the same query runs 0.73–0.79 s median in a 0.68–0.87
        # band, and 2× parallelism is WORSE again (~1.0 s — 64 Python
        # worker invocations of fixed Arrow overhead outweigh the
        # smoothing). The round-4→5 bench "drift" on this query was
        # session-level draws from the wide coalesced distribution,
        # not a code change (BENCH_HISTORY note, round 6).
        n_part = max(1, emb.sparkSession.sparkContext.defaultParallelism)
        part = rows.repartition(n_part, "band", "bh").sortWithinPartitions(
            "band", "bh", "vid"
        )

        thr = float(threshold)
        cap = bucket_cap
        schema = f"a {id_type}, b {id_type}, score double"

        def _flush(pdf):
            """Score every complete bucket in ``pdf`` (rows sorted by
            (band, bh, vid)) with one gathered einsum."""
            if pdf is None or len(pdf) == 0:
                return None
            band_arr = pdf["band"].to_numpy()
            bh_arr = pdf["bh"].to_numpy()
            change = (band_arr[1:] != band_arr[:-1]) | (bh_arr[1:] != bh_arr[:-1])
            bounds = np.flatnonzero(change) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(pdf)]))
            # At high bits/band almost every bucket is a singleton —
            # drop them VECTORIZED before any per-row Python work
            # (vector stacking, the pair loop): a 1M-row partition
            # otherwise spends its time iterating empty buckets and
            # stacking vectors that can never pair.
            sizes = ends - starts
            live = sizes >= 2
            if cap is not None:
                live &= sizes <= cap
            if not live.any():
                return None
            l_starts, l_sizes = starts[live], sizes[live]
            take = np.concatenate(
                [np.arange(s0, s0 + m) for s0, m in zip(l_starts, l_sizes)]
            )
            vids = pdf["vid"].to_numpy()[take]
            q = np.stack(
                [np.asarray(x, dtype=np.float64)
                 for x in pdf["qv"].to_numpy()[take]]
            )
            if (
                np.abs(q).max() >= float(2**24)
                or q.shape[1] * float(np.abs(q).max()) ** 2 >= _EXACT_F64
            ):
                raise ValueError(
                    "quantized coords exceed the float32/float64 exactness "
                    "bound — lower SRP_QUANT for this corpus"
                )
            # pair indices in the COMPACTED (live-rows-only) space
            offs = np.concatenate(([0], np.cumsum(l_sizes)[:-1]))
            ia_l, ib_l = [], []
            for o, m in zip(offs, l_sizes):
                iu, ju = np.triu_indices(m, 1)
                ia_l.append(iu + o)
                ib_l.append(ju + o)
            ia = np.concatenate(ia_l)
            ib = np.concatenate(ib_l)
            n2 = np.einsum("ij,ij->i", q, q)
            d = np.einsum("ij,ij->i", q[ia], q[ib])
            sc = d / (np.sqrt(n2[ia]) * np.sqrt(n2[ib]))
            keep = sc >= thr
            if not keep.any():
                return None
            return pd.DataFrame(
                {"a": vids[ia[keep]], "b": vids[ib[keep]], "score": sc[keep]}
            )

        def scan(batches):
            carry = None
            for pdf in batches:
                if carry is not None and len(carry):
                    pdf = pd.concat([carry, pdf], ignore_index=True)
                last_band = pdf["band"].iloc[-1]
                last_bh = pdf["bh"].iloc[-1]
                tail = (pdf["band"] == last_band) & (pdf["bh"] == last_bh)
                carry = pdf[tail].reset_index(drop=True)
                out = _flush(pdf[~tail].reset_index(drop=True))
                if out is not None:
                    yield out
            out = _flush(carry)
            if out is not None:
                yield out

        pairs = part.mapInPandas(scan, schema)
        return pairs.distinct().select(
            "a", "b", F.round("score", 8).alias("score")
        )

    bucketed = srp_buckets(emb, num_bits, bands, dim, id_col, vec_col, impl=impl)
    if bucket_cap is not None:
        # the same degenerate-bucket guard the arrow kernel applies —
        # the fallback flavor must honor the dial too, or setting it
        # changes results between impls AND leaves the O(m²) hot bucket
        # unbounded exactly where the cap was requested
        from pyspark.sql import Window as W

        bucketed = (
            bucketed.withColumn(
                "_k", F.count(F.lit(1)).over(W.partitionBy("band", "bh"))
            )
            .filter(F.col("_k") <= bucket_cap)
            .drop("_k")
        )
    spread = emb.sparkSession.sparkContext.defaultParallelism
    candidates = (
        bucketed.alias("l")
        .join(bucketed.alias("r"), ["band", "bh"])
        .select(F.col("l.vid").alias("a"), F.col("r.vid").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .repartition(spread, "a", "b")
    )
    va = emb.select(
        F.col(id_col).alias("a"),
        quant_vec(F.col(vec_col)).alias("va"),
    ).withColumn("na", qnorm(F.col("va")))
    vb = emb.select(
        F.col(id_col).alias("b"),
        quant_vec(F.col(vec_col)).alias("vb"),
    ).withColumn("nb", qnorm(F.col("vb")))
    return (
        candidates.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            (
                qdot(F.col("va"), F.col("vb")).cast("double")
                / (F.col("na") * F.col("nb"))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
        .select("a", "b", F.round("score", 8).alias("score"))
    )


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs by shingle-set Jaccard.

    Inverted-index join (`_shingle_pair_intersections`): explode
    distinct shingles, self-join on the shingle, count shared shingles
    per (a,b) pair, then ``|A∩B| / (|A|+|B|-|A∩B|)``. ``max_df`` drops
    shingles appearing in more than that many docs (stop-shingles) —
    the standard cap that keeps the join's bucket sizes bounded at
    corpus scale.
    """
    return (
        _shingle_pair_intersections(docs, n, id_col, text_col, max_df)
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "sz_a", "sz_b", F.round("jaccard", 8).alias("jaccard"))
    )


def _shingle_pair_intersections(
    docs: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    max_df: int | None,
) -> DataFrame:
    """Shared inverted-index core of the exact pairwise screens
    (`jaccard_pairs`, `containment_pairs`): one shingle explode, one
    equi-self-join on the shingle (never a cross join), one pair-keyed
    count, two size joins — ``(a, b, inter, sz_a, sz_b)`` with
    ``a < b``. Everything downstream is a per-row formula, so the
    similarity measures differ only in arithmetic, not in shuffle
    shape.

    Round-11 shape (guide §2 — remove shuffles outright): the original
    built ``shingle_rows(...).dropDuplicates`` postings and referenced
    them FOUR times (both self-join sides + two size-by-doc joins), so
    the token-stream window exchange and the dedup aggregate executed
    4× — 14 Exchanges / 4 scans in the dedup_containment plan. Now
    `shingle_set_rows` builds the distinct set and its size MAP-SIDE
    (zero exchanges) and the sizes ride the postings through the one
    shingle equi-join; grouping by ``(a, b, sz_a, sz_b)`` — sizes are
    functionally dependent on the ids — makes both size joins vanish.
    3 Exchanges / 2 scans, no Window. Result-identical: same distinct
    shingle sets, same |A∩B| counts, and the sizes were always the
    per-doc distinct-shingle counts.

    The ``max_df`` stop-shingle flavor keeps the aggregate shape
    because its documented sizes are POST-filter (rare-shingle counts),
    which a map-side per-doc size cannot know."""
    if max_df is None:
        # Round-11 join-strategy pass (guide §3.1 "pick the strategy
        # deliberately"): SHUFFLED-HASH self-join on the shingle, both
        # sides the SAME kernel subtree. Without the hint the planner
        # broadcast the b side — a full second evaluation of the
        # shingle kernel feeding a driver-collected hash relation of
        # every posting; with it, both sides hash-partition on ``sh``
        # with canonically identical exchanges, so AQE's stage reuse
        # evaluates the kernel ONCE and the second side reads the
        # shuffle output (final plan: one MapInPandas + ReusedExchange
        # — plans/r11/dedup_containment_after.txt). No sort (the old
        # pinned-repartition's compute-dense-SMJ rationale died with
        # the sort), and the ENSURE_REQUIREMENTS exchange leaves AQE
        # free to size the stage. Measured at sf0.1 (6 runs, median):
        # broadcast+pin 1.15–1.29 s → SMJ shared 0.92 s → SHJ shared
        # 0.82 s, identical rows. Per-partition build state is the
        # postings of that partition's shingles — the same mass a
        # bucket's pair loop already bounds; ``max_df`` stays the
        # production cap for degenerate shingles.
        sh = shingle_set_rows(docs, n, id_col, text_col)
        a = sh.select(F.col("doc").alias("a"), F.col("sz").alias("sz_a"), "sh")
        b = sh.select(F.col("doc").alias("b"), F.col("sz").alias("sz_b"), "sh")
        return (
            a.join(b.hint("shuffle_hash"), "sh")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("inter"))
            .select("a", "b", "inter", "sz_a", "sz_b")
        )
    # Round-11 second pass over the stop-shingle flavor (guide §2.4 +
    # §3.1, the same two fixes the max_df=None branch got): postings
    # come from `shingle_set_rows`' MAP-SIDE distinct kernel — zero
    # exchanges where `shingle_rows(...).dropDuplicates` paid the
    # token-stream window shuffle plus a dedup aggregate PER
    # EVALUATION of this subtree — and the self-join is a
    # SHUFFLED-HASH join so the a/b sides' canonically identical
    # exchanges share one evaluation at runtime instead of the planner
    # broadcasting a second full one. The aggregate SIZES branch stays:
    # the documented sz_a/sz_b are POST-filter (rare-shingle) counts,
    # which the kernel's pre-filter per-doc size cannot know; same
    # distinct (doc, sh) universe either way (kernel equivalence is
    # test-pinned), so df/sizes/pairs are all unchanged.
    sh = shingle_set_rows(docs, n, id_col, text_col).select("doc", "sh")
    rare = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("sh")
    )
    sh = sh.join(rare, "sh")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc").alias("a"), "sh")
    b = sh.select(F.col("doc").alias("b"), "sh")
    inter = (
        a.join(b.hint("shuffle_hash"), "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("b"), F.col("sz").alias("sz_b"))
    return inter.join(sa, "a").join(sb, "b")


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup screen by shingle-set CONTAINMENT:
    ``|A∩B| / min(|A|, |B|)`` — the measure that catches a short
    document embedded inside a long one (quotes, boilerplate headers,
    excerpt pages), which Jaccard structurally misses: a 20-shingle doc
    fully contained in a 400-shingle doc has containment 1.0 but
    Jaccard 0.05, below any sane pair threshold. Standard in LLM-corpus
    curation alongside the symmetric screen (same role as the
    containment variant of MinHash in the dedup literature).

    Same inverted-index join shape as `jaccard_pairs` (shared core —
    one shingle shuffle, no cross join, `max_df` stop-shingle cap for
    bounded buckets at corpus scale); only the final per-row formula
    differs. ``containment`` is the containment of the SMALLER side in
    the larger — direction is recoverable from ``sz_a``/``sz_b``.
    """
    return (
        _shingle_pair_intersections(docs, n, id_col, text_col, max_df)
        .withColumn(
            "containment",
            F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "a", "b", "inter", "sz_a", "sz_b",
            F.round("containment", 8).alias("containment"),
        )
    )


def corpus_postings_index(
    corpus: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The persistable corpus side of `containment_incremental_pairs`:
    distinct ``(doc, sh)`` postings. Shingle once, write to parquet,
    reuse across ingest cycles — the same dial as
    `minhash.corpus_hash_index` / `srp_corpus_index`: per cycle the
    corpus is a columnar read partitioned on the join key's hash, not
    a re-shingling of every document body. Postings are a pure per-doc
    function of content, so appending a cycle's kept docs' postings
    keeps the index equal to a rebuild (the family's append==rebuild
    contract).

    Round-11 (guide §2.4): the distinct set is built MAP-SIDE by
    `shingle_set_rows`' kernel — the index write no longer pays the
    token-stream window exchange plus the dropDuplicates aggregate.
    Same (doc, sh) content (kernel equivalence test-pinned), so the
    persisted index and the append==rebuild contract are unchanged."""
    return shingle_set_rows(corpus, n, id_col, text_col).select("doc", "sh")


def containment_incremental_pairs(
    batch: DataFrame,
    corpus: DataFrame | None,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    corpus_postings: DataFrame | None = None,
    corpus_df: DataFrame | None = None,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Incremental flavor of `containment_pairs`: screen a NEW ingest
    batch against the already-ingested corpus for short-in-long
    embedding (recycled boilerplate, quote pages, excerpt mirrors) —
    the ingest-time twin of the batch screen, same shape as
    `minhash_incremental_pairs`: batch shingles × corpus shingles is
    an equi-join on the shingle with the small batch on one side,
    NEVER a corpus self-join. ``max_df`` drops shingles whose CORPUS
    document frequency exceeds the cap (stop-shingles measured where
    the mass is), bounding join bucket sizes.

    Per-cycle cost, stated honestly (round-11 review): the corpus
    postings are SCANNED once for the bucket join, but never
    corpus-wide AGGREGATED for sizes — ``sz_b`` is computed over the
    postings of MATCHED docs only (a semi-join against the pair set,
    which is persisted under the owned-cache contract so the branch
    doesn't recompute the bucket join; release with
    `caching.release_owned_caches` on the returned frame). The one
    corpus-wide aggregate left is the ``max_df`` document-frequency
    table — pass ``corpus_df`` (a persisted ``(sh, df)`` frame built
    once at index time alongside `corpus_postings_index`) to remove
    it; it is only consulted when ``max_df`` is set.

    Output ``(a, b, inter, sz_a, sz_b, containment)`` with ``a`` from
    the batch, ``b`` from the corpus; ``containment`` is of the
    smaller side in the larger, as in `containment_pairs`.

    Pass ``corpus_postings`` (a persisted `corpus_postings_index`
    frame) instead of ``corpus`` to skip re-shingling the corpus —
    result-identical (postings are a pure function of content;
    test-pinned), and per cycle the corpus side becomes a columnar
    read instead of a full text pass.

    ``broadcast_batch`` (r11 ADVICE): the batch postings are the
    definitionally-small build side per ingest cycle, so they are
    broadcast by default and the corpus postings stream map-side
    through the join (guide §3.1). A deployment whose ingest cycles
    outgrow the broadcast/driver cap passes ``False`` to degrade to a
    shuffle join with identical semantics instead of failing the job —
    the documented escape is now a parameter, not a library edit."""
    from .caching import attach_owned

    def _build(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_batch else df.hint("shuffle_hash")

    if (corpus is None) == (corpus_postings is None):
        raise ValueError("pass exactly one of corpus or corpus_postings")
    if max_df is None:
        # Round-11 shape (guide §2): sizes ride the postings map-side
        # (`shingle_set_rows`), so the batch is shingled ONCE instead of
        # twice (the sz_a aggregate branch is gone) and, on the raw-
        # corpus path, the corpus once instead of twice — the matched-
        # docs semi-join, the persist that existed only to feed it, and
        # both size joins all disappear; the one pair aggregate groups
        # by (a, b, sz_a, sz_b), functionally dependent on the ids.
        # Result-identical: same distinct sets, same counts, and the
        # pre-filter size IS the documented size when no stop-shingle
        # cap is set. The persisted-postings path keeps the matched-docs
        # size aggregate (the index stores no sizes — adding them would
        # change the persisted format).
        # no pinned shingle exchange here (unlike the self-join core):
        # the batch side is small by construction, so the planner
        # broadcasts it and pinned repartitions would be pure overhead
        # — measured +0.25 s/run at sf0.1 for zero plan benefit
        bsh = shingle_set_rows(batch, n, id_col, text_col).select(
            F.col("doc").alias("a"), F.col("sz").alias("sz_a"), "sh"
        )
        # Round-11 join-strategy pass (guide §3.1): BROADCAST the
        # BATCH postings — left to estimates the planner built the
        # hash relation from the CORPUS side (observed in the
        # dedup_containment_incremental plan: BuildRight over the 6/7
        # slice), collecting ~7× the rows to the driver and shipping
        # them to every task. The batch is the definitionally-small
        # side (one ingest cycle); with the hint the corpus postings
        # stream map-side through the join and are never shuffled or
        # collected — the §3.1 ideal. Measured at sf0.1: 1.19 s →
        # 1.01 s median, identical rows. At 100 TB a cycle's postings
        # are bounded by the micro-batch size dial; if a deployment's
        # batches outgrow the broadcast cap, drop the hint and the
        # planner falls back to a shuffle with the same semantics.
        if corpus is not None:
            csh = shingle_set_rows(corpus, n, id_col, text_col).select(
                F.col("doc").alias("b"), F.col("sz").alias("sz_b"), "sh"
            )
            return (
                _build(bsh).join(csh, "sh")
                .groupBy("a", "b", "sz_a", "sz_b")
                .agg(F.count(F.lit(1)).alias("inter"))
                .withColumn(
                    "containment",
                    F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")),
                )
                .filter(F.col("containment") >= threshold)
                .select(
                    "a", "b", "inter", "sz_a", "sz_b",
                    F.round("containment", 8).alias("containment"),
                )
            )
        csh = corpus_postings
        inter = (
            # same §3.1 build-side fix as the raw-corpus branch above:
            # the persisted postings stream map-side past the
            # broadcast batch instead of being shuffled or collected
            _build(bsh).join(
                csh.select(F.col("doc").alias("b"), "sh"), "sh"
            )
            .groupBy("a", "b", "sz_a")
            .agg(F.count(F.lit(1)).alias("inter"))
            .persist()
        )
        sz_b = (
            csh.join(inter.select(F.col("b").alias("doc")).distinct(), "doc")
            .groupBy("doc")
            .agg(F.count(F.lit(1)).alias("sz_b"))
        )
        out = (
            inter.join(sz_b.withColumnRenamed("doc", "b"), "b")
            .withColumn(
                "containment",
                F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")),
            )
            .filter(F.col("containment") >= threshold)
            .select(
                "a", "b", "inter", "sz_a", "sz_b",
                F.round("containment", 8).alias("containment"),
            )
        )
        return attach_owned(out, [inter])
    # Round-11 second pass over the stop-shingle flavor: batch postings
    # from the map-side distinct kernel (same (doc, sh) universe, no
    # window exchange + dedup aggregate per evaluation), and the same
    # §3.1 build-side fix as the max_df=None branches — the BATCH is
    # the definitionally-small side, so it is broadcast and the corpus
    # postings stream map-side through the join instead of being
    # shuffled or collected. sz_a stays an aggregate: the documented
    # size is POST-filter (rare-shingle count).
    bsh = shingle_set_rows(batch, n, id_col, text_col).select("doc", "sh")
    csh = (
        corpus_postings
        if corpus_postings is not None
        else corpus_postings_index(corpus, n, id_col, text_col)
    )
    df_tbl = (
        corpus_df
        if corpus_df is not None
        else csh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    )
    rare = df_tbl.filter(F.col("df") <= max_df).select("sh")
    csh = csh.join(rare, "sh")
    bsh = bsh.join(rare, "sh")
    sz_a = bsh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz_a"))
    inter = (
        _build(bsh.select(F.col("doc").alias("a"), "sh"))
        .join(csh.select(F.col("doc").alias("b"), "sh"), "sh")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
        .persist()
    )
    # sizes for MATCHED corpus docs only: the semi-join keeps the size
    # aggregate's shuffle proportional to the pair set, not the corpus
    sz_b = (
        csh.join(inter.select(F.col("b").alias("doc")).distinct(), "doc")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("sz_b"))
    )
    out = (
        inter.join(sz_a.withColumnRenamed("doc", "a"), "a")
        .join(sz_b.withColumnRenamed("doc", "b"), "b")
        .withColumn(
            "containment",
            F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "a", "b", "inter", "sz_a", "sz_b",
            F.round("containment", 8).alias("containment"),
        )
    )
    return attach_owned(out, [inter])


def random_projection(
    emb: DataFrame,
    dim_out: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Johnson-Lindenstrauss-style dimensionality reduction with ±1
    (Achlioptas) planes — the cheap PCA substitute a pipeline runs
    before clustering / LSH when the raw embedding width is overkill.

    Deterministic across engines, partitionings AND impls: the input is
    integer-quantized (same ``SRP_QUANT`` contract as the SRP path), so
    each projection is an exact int64 dot against md5-parity ±1 planes —
    no float summation order anywhere. ``proj`` is the raw integer
    coordinate; ``y`` rescales by 1/(QUANT·√dim_out) per the JL lemma.

    ``impl="arrow"`` (default) computes all ``dim_out`` dots as one
    int64 matmul per Arrow batch — the same kernel shape as
    `_srp_sig_arrow`, and the same reason: Catalyst interprets
    higher-order functions, so the builtin flavor pays dim_out × dim
    interpreted evals per row. ``impl="builtin"`` keeps the JVM fold as
    the Python-free fallback/cross-check (bit-identical by integer
    exactness).

    Scale shape: entirely row-local (plane matrix rides in the kernel
    closure / as one literal); the only data movement is the corpus
    scan itself. Output is exploded to (id, dim, value) rows — a layout
    that stays canonicalizable and lets downstream ops pivot as needed.
    """
    scale = float(SRP_QUANT) * math.sqrt(float(dim_out))
    if impl == "arrow":
        planes_t = np.array(srp_signs(dim_out, dim), dtype=np.int64).T  # dim×out
        id_type = dict(emb.dtypes)[id_col]
        schema = f"{id_col} {id_type}, dim int, proj long, y double"

        def scan(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                q = _quant_np(pdf[vec_col]).astype(np.int64)
                p = q @ planes_t  # rows × dim_out, exact int64
                n, m = p.shape
                y = p.ravel() / scale
                # ROUND half-away-from-zero == Spark/DuckDB round()
                # (np.round is banker's rounding — a tie would flip)
                y8 = np.sign(y) * np.floor(np.abs(y) * 1e8 + 0.5) / 1e8
                yield pd.DataFrame(
                    {
                        id_col: np.repeat(pdf[id_col].to_numpy(), m),
                        "dim": np.tile(np.arange(m, dtype=np.int32), n),
                        "proj": p.ravel(),
                        "y": y8,
                    }
                )

        return emb.select(id_col, vec_col).mapInPandas(scan, schema)

    planes = _int_matrix_literal(srp_signs(dim_out, dim))
    qv = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * SRP_QUANT).cast("long"),
    )
    projs = F.transform(
        planes,
        lambda p: F.aggregate(
            F.zip_with(qv, p, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return emb.select(
        F.col(id_col), F.posexplode(projs).alias("dim", "proj")
    ).select(
        id_col,
        F.col("dim").cast("int").alias("dim"),
        "proj",
        F.round(
            F.col("proj")
            / (F.lit(float(SRP_QUANT)) * F.sqrt(F.lit(float(dim_out)))),
            8,
        ).alias("y"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Embedding-space decontamination: corpus vectors whose cosine to
    ANY eval-set vector reaches ``threshold`` — the semantic analogue of
    ``curation.ngram_decontaminate`` (catches paraphrased benchmark
    leakage that no n-gram overlap sees). Scores use the quantized
    contract (bit-exact across engines; see module note).

    Scale shape exploits the asymmetry: eval sets are thousands of
    vectors while the corpus is billions. ``impl="arrow"`` (default)
    collects the eval set driver-side (bounded by design — the same
    k×dim-scalars discipline as the IVF codebook) and scores each
    corpus Arrow batch with ONE float64 BLAS matmul; the per-candidate
    best eval item is an in-batch argmax (each candidate lives in
    exactly one batch), so the plan is a pure scan→kernel projection —
    ZERO exchanges, the corpus never shuffles and no top-1 window
    exists at all. ``impl="builtin"`` keeps the JVM crossJoin(broadcast)
    + top-1-window flavor as the Python-free fallback/cross-check.
    Ties go to the lower eval id in both flavors (argmax returns the
    first maximum over eval-id-ascending columns).
    """
    # Zero-quantized vectors (either side) have no cosine direction:
    # the score is 0/0 = NaN. The two flavors used to DISAGREE on them
    # — numpy's `NaN >= thr` is False (arrow drops) while Spark SQL
    # orders NaN greatest (`NaN >= 0.4` is true — builtin keeps, and a
    # zero EVAL vector would argmax-capture every candidate). Exclude
    # on both sides, both impls, mirroring cosine_topk/srp_near_dup;
    # the declared oracle carries the same _QDIR guard.
    corpus = corpus.filter(has_quant_direction(F.col(vec_col)))
    eval_set = eval_set.filter(has_quant_direction(F.col(vec_col)))
    if impl == "arrow":
        id_type = dict(corpus.dtypes)[id_col]
        e_rows = sorted(
            (r[0], list(r[1]))
            for r in eval_set.select(
                id_col, F.col(vec_col).cast("array<double>")
            ).collect()
        )
        et = _quant_np([v for _, v in e_rows]).T  # dim × n_eval
        en = np.sqrt((et * et).sum(axis=0))
        eids = np.array([i for i, _ in e_rows])
        thr = float(threshold)
        schema = f"cand_id {id_type}, best_eval_id {id_type}, score double"

        def scan(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                c = _quant_np(pdf[vec_col])
                s = c @ et  # exact integer math in float64
                cn = np.sqrt(np.einsum("ij,ij->i", c, c))
                scores = s / (cn[:, None] * en[None, :])
                j = np.argmax(scores, axis=1)  # first max → lowest eval_id
                best = scores[np.arange(len(j)), j]
                keep = best >= thr
                yield pd.DataFrame(
                    {
                        "cand_id": pdf[id_col].to_numpy()[keep],
                        "best_eval_id": eids[j[keep]],
                        "score": best[keep],
                    }
                )

        flagged = corpus.select(id_col, vec_col).mapInPandas(scan, schema)
        return flagged.select(
            "cand_id", "best_eval_id", F.round("score", 8).alias("score")
        )

    from ..operators.sorts import topk_per_group

    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        quant_vec(F.col(vec_col)).alias("c_vec"),
    ).withColumn("c_norm", qnorm(F.col("c_vec")))
    e = eval_set.select(
        F.col(id_col).alias("eval_id"),
        quant_vec(F.col(vec_col)).alias("e_vec"),
    ).withColumn("e_norm", qnorm(F.col("e_vec")))
    scored = c.crossJoin(F.broadcast(e)).select(
        "cand_id",
        "eval_id",
        (
            qdot(F.col("c_vec"), F.col("e_vec")).cast("double")
            / (F.col("c_norm") * F.col("e_norm"))
        ).alias("score"),
    )
    best = topk_per_group(
        scored, ["cand_id"], [F.desc("score"), F.col("eval_id")], 1
    ).drop("rank")
    return best.filter(F.col("score") >= threshold).select(
        "cand_id",
        F.col("eval_id").alias("best_eval_id"),
        F.round("score", 8).alias("score"),
    )
