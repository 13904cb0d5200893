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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .text import shingle_rows

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


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X3: brute-force exact top-k cosine per query vector.

    ``queries`` (small) is broadcast; corpus partitions score locally and
    the ranking window keeps k per query. Arrays are cast to double so
    the fold matches the oracle's double arithmetic exactly.
    """
    from ..operators.sorts import topk_per_group

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("q_norm", norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).withColumn("c_norm", norm(F.col("c_vec")))
    # Norms are computed ONCE per side (identical doubles to the inline
    # cosine: same sequential fold, just hoisted out of the pair loop) —
    # the per-pair work drops from three dim-length folds to one.
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("score"),
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
    O(n²): NOT a declared query shape at corpus scale — keep it on
    samples and test fixtures.
    """
    a = emb.select(F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = emb.select(F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("score"))
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


def nearest_centroid(vec: Column, rows: CentroidRows) -> Column:
    """cent_id of the nearest centroid by cosine, ties to the lower
    cent_id — a single-row expression (no join, no shuffle). Scoring
    uses the same sequential `cosine` fold as the exact queries, so
    assignment agrees bit-for-bit with the SQL oracles' arithmetic."""
    vec_arr, cid_arr = _centroid_literals(rows)
    scores = F.transform(vec_arr, lambda c: cosine(vec, c))
    # array_position returns the FIRST index of the max → lowest cent_id
    return F.element_at(
        cid_arr, F.array_position(scores, F.array_max(scores)).cast("int")
    )


def _resolve_centroids(
    corpus: DataFrame,
    codebook: DataFrame | CentroidRows | None,
    n_centroids: int,
    id_col: str,
    vec_col: str,
) -> CentroidRows:
    """Driver-side codebook rows from whichever form the caller holds.
    Collecting is k × dim scalars — the codebook is driver-resident by
    design (MLlib KMeans discipline); the corpus never moves."""
    if codebook is None:
        rows = (
            corpus.filter(F.col(id_col) < n_centroids)
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
) -> DataFrame:
    """X3 scale path: IVF-style approximate top-k cosine.

    Coarse quantizer: the first ``n_centroids`` vectors stand in for
    k-means centroids by default; pass ``codebook`` (from
    ``kmeans.kmeans_fit``) to use a trained one (same plan, better
    buckets). Scale shape:

    - corpus→centroid assignment scores every centroid INSIDE the row
      (centroid array literal + transform/argmax): a pure map-side
      projection — no join, no window, and no exchange whose rows carry
      the embedding column (the k-fold vector-shuffle of a join-based
      assignment is gone);
    - each query picks its ``nprobe`` nearest buckets the same way
      (row-local sort of (−score, cent_id) structs), then the tiny
      (queries × nprobe) probe table is broadcast against the assigned
      corpus — the corpus streams through a map-side hash join keyed on
      cent_id, scoring only O(N · nprobe / n_centroids) candidates;
    - the only shuffle in the plan is the final per-query top-k window
      over (query_id, cand_id, score) rows.

    Deterministic tie-breaks (centroid id, candidate id) keep the
    result oracle-reproducible.
    """
    from ..operators.sorts import topk_per_group

    rows = _resolve_centroids(corpus, codebook, n_centroids, id_col, vec_col)
    vec_arr, cid_arr = _centroid_literals(rows)

    assigned = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    )
    assigned = assigned.withColumn(
        "cent_id", nearest_centroid(F.col("c_vec"), rows)
    ).withColumn("c_norm", norm(F.col("c_vec")))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("q_norm", norm(F.col("q_vec")))
    probe_pairs = F.zip_with(
        F.transform(vec_arr, lambda c: cosine(F.col("q_vec"), c)),
        cid_arr,
        lambda s, cid: F.struct((-s).alias("ns"), cid.alias("cid")),
    )
    probes = q.select(
        "query_id",
        "q_vec",
        "q_norm",
        F.explode(F.slice(F.array_sort(probe_pairs), 1, nprobe)).alias("p"),
    ).select("query_id", "q_vec", "q_norm", F.col("p.cid").alias("cent_id"))

    scored = (
        assigned.join(F.broadcast(probes), "cent_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("score"),
        )
    )
    top = topk_per_group(scored, ["query_id"], [F.desc("score"), F.col("cand_id")], k)
    return top.select(
        "query_id", "cand_id", F.round("score", 8).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


#: quantization scale for the SRP integer path: six decimal digits keeps
#: every |q| ≤ ~2^21 for unit-ish embeddings, so a dim-4096 signed dot
#: still fits a BIGINT with > 2^20 headroom.
SRP_QUANT = 1_000_000


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
    rows_per_band = num_bits // bands

    if impl == "arrow":
        s = emb.select(
            F.col(id_col).alias("vid"),
            _srp_sig_arrow(num_bits, dim)(
                F.col(vec_col).cast("array<double>")
            ).alias("sig"),
        )
    else:
        qv = F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * SRP_QUANT).cast("long"),
        )
        v = emb.select(F.col(id_col).alias("vid"), qv.alias("qv"))
        s = v.select("vid", _srp_sig_expr(num_bits, dim).alias("sig"))

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("sig", b * rows_per_band + 1, rows_per_band).alias("bh"),
        )
        for b in range(bands)
    ]
    return s.select("vid", F.explode(F.array(*band_cols)).alias("bk")).select(
        "vid", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
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
) -> DataFrame:
    """Embedding near-dup, LSH-bucketed: sign-random-projection banding
    prunes the pair space, exact cosine verifies candidates — output is
    a no-false-positive subset of ``embedding_near_dup``; recall is
    tuned by bands/bits (collision prob per bit = 1 − θ/π).

    Scale shape: signatures are computed row-locally (Arrow int64
    matmul — zero shuffle, no plan-time Spark job); candidate
    generation is a per-(band, bits) bucket self-join like MinHash
    banding (functions/minhash.py); only candidate pairs are
    exact-verified. Verify-stage hygiene: per-vector norms are computed
    ONCE on the 2×N vector sides (not once per pair — identical
    doubles, 3× less fold work), and the deduped pair list is
    explicitly spread across the cluster before vectors are attached —
    the repartition moves only (a, b) id rows, and stops AQE from
    coalescing the pair partitions to one core because the PRE-join
    bytes look small (the verify compute after vector-attach is the
    real cost it can't see).
    """
    # No persist: the signature kernel is one Arrow matmul per batch —
    # recomputing it on both sides of the self-join is cheaper than the
    # cache materialization barrier (measured 4s penalty per cache miss
    # at sf0.1 vs zero steady-state win; fresh UDF instances make
    # logical-plan cache hits unreliable across query rebuilds).
    bucketed = srp_buckets(emb, num_bits, bands, dim, id_col, vec_col, impl=impl)
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
        F.col(vec_col).cast("array<double>").alias("va"),
    ).withColumn("na", norm(F.col("va")))
    vb = emb.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    ).withColumn("nb", norm(F.col("vb")))
    return (
        candidates.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("score"),
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

    Inverted-index join: explode distinct shingles, self-join on the
    shingle, count shared shingles per (a,b) pair, then
    ``|A∩B| / (|A|+|B|-|A∩B|)``. ``max_df`` drops shingles appearing in
    more than that many docs (stop-shingles) — the standard cap that
    keeps the join's bucket sizes bounded at corpus scale.
    """
    sh = shingle_rows(docs, n, id_col, text_col).dropDuplicates(["doc", "sh"])
    if max_df is not None:
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
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "sz_a", "sz_b", F.round("jaccard", 8).alias("jaccard"))
    )


def random_projection(
    emb: DataFrame,
    dim_out: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss-style dimensionality reduction with ±1
    (Achlioptas) planes — the cheap PCA substitute a pipeline runs
    before clustering / LSH when the raw embedding width is overkill.

    Deterministic across engines and partitionings: the input is
    integer-quantized (same ``SRP_QUANT`` contract as the SRP path), so
    each projection is an exact int64 dot against md5-parity ±1 planes —
    no float summation order anywhere. ``proj`` is the raw integer
    coordinate; ``y`` rescales by 1/(QUANT·√dim_out) per the JL lemma.

    Scale shape: entirely row-local (plane matrix rides in as one
    literal); the only data movement is the corpus scan itself. Output
    is exploded to (id, dim, value) rows — a layout that stays
    canonicalizable and lets downstream ops pivot as needed.
    """
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
) -> DataFrame:
    """Embedding-space decontamination: corpus vectors whose cosine to
    ANY eval-set vector reaches ``threshold`` — the semantic analogue of
    ``curation.ngram_decontaminate`` (catches paraphrased benchmark
    leakage that no n-gram overlap sees).

    Scale shape is the same asymmetry: eval sets are thousands of
    vectors while the corpus is billions, so the eval side is broadcast
    and scoring is a map-side loop inside the corpus scan — the corpus
    never shuffles; the only exchange is the per-candidate top-1
    window on (id, eval_id, score) rows. Reports each flagged vector's
    closest eval item (ties toward the lower eval id) for the audit
    trail.
    """
    from ..operators.sorts import topk_per_group

    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).withColumn("c_norm", norm(F.col("c_vec")))
    e = eval_set.select(
        F.col(id_col).alias("eval_id"),
        F.col(vec_col).cast("array<double>").alias("e_vec"),
    ).withColumn("e_norm", norm(F.col("e_vec")))
    scored = c.crossJoin(F.broadcast(e)).select(
        "cand_id",
        "eval_id",
        (dot(F.col("c_vec"), F.col("e_vec")) / (F.col("c_norm") * F.col("e_norm"))).alias(
            "score"
        ),
    )
    best = topk_per_group(
        scored, ["cand_id"], [F.desc("score"), F.col("eval_id")], 1
    ).drop("rank")
    return best.filter(F.col("score") >= threshold).select(
        "cand_id",
        F.col("eval_id").alias("best_eval_id"),
        F.round("score", 8).alias("score"),
    )
