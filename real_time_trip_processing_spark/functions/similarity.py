"""Vector / set similarity for the extension surface (SURVEY §2.12).

Design for 100 TB:
- cosine top-k: the *query* side is small (k probes) → broadcast it;
  the corpus side streams through a map-side nested loop that emits
  (query, candidate, score) and the planner's TakeOrdered/window-top-k
  keeps only k per query. Dot products run as built-in higher-order
  functions on double arrays — JVM-side, no Python.
- n-gram Jaccard near-dup: inverted-index self-join (explode shingles →
  equi-join on shingle → count per pair) instead of the O(n²) cross
  join; doc-frequency capping bounds the worst-case bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import shingle_rows


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
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("score"),
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

    Exact all-pairs flavor — the correctness reference. At corpus scale
    the pair space must be pruned first (sign-random-projection buckets,
    i.e. SimHash-for-vectors, or the IVF buckets below); this exact form
    is what those candidates are verified against.
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


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """X3 scale path: IVF-style approximate top-k cosine.

    Coarse quantizer: the first ``n_centroids`` vectors stand in for
    k-means centroids by default; pass ``codebook`` — (cent_id,
    centroid) from ``kmeans.kmeans_fit`` — to use a trained one (same
    plan, better buckets). Every corpus vector is assigned to its
    nearest centroid (one broadcast pass); each query probes its
    ``nprobe`` nearest centroid buckets and scores only those vectors —
    the scan cost drops from O(N) to O(N * nprobe / n_centroids) per
    query, the standard IVF trade. Deterministic tie-breaks (centroid
    id, candidate id) keep the result oracle-reproducible.
    """
    from ..operators.sorts import topk_per_group

    if codebook is not None:
        centroids = codebook.select(
            "cent_id", F.col("centroid").cast("array<double>").alias("cv")
        )
    else:
        centroids = corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    )
    assigned = topk_per_group(
        c.crossJoin(F.broadcast(centroids)).select(
            "cand_id", "c_vec", "cent_id", cosine(F.col("c_vec"), F.col("cv")).alias("cs")
        ),
        ["cand_id"],
        [F.desc("cs"), F.col("cent_id")],
        1,
    ).select("cand_id", "c_vec", "cent_id")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    probes = topk_per_group(
        q.crossJoin(F.broadcast(centroids)).select(
            "query_id", "q_vec", "cent_id", cosine(F.col("q_vec"), F.col("cv")).alias("qs")
        ),
        ["query_id"],
        [F.desc("qs"), F.col("cent_id")],
        nprobe,
    ).select("query_id", "q_vec", "cent_id")

    scored = (
        probes.join(assigned, "cent_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    )
    top = topk_per_group(scored, ["query_id"], [F.desc("score"), F.col("cand_id")], k)
    return top.select(
        "query_id", "cand_id", F.round("score", 8).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def _srp_planes(num_bits: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1) — splitmix64
    bit-mix per (bit, coord), no RNG state, reproducible everywhere."""
    planes = []
    for i in range(num_bits):
        row = []
        for j in range(dim):
            x = ((i * dim + j + 1) * 0x9E3779B97F4A7C15) % (1 << 64)
            x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
            x = (x ^ (x >> 27)) * 0x94D049BB133111EB % (1 << 64)
            x ^= x >> 31
            row.append((x / float(1 << 64)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def srp_near_dup(
    emb: DataFrame,
    num_bits: int = 16,
    bands: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup, LSH-bucketed: sign-random-projection
    (SimHash-for-vectors) banding prunes the pair space, exact cosine
    verifies candidates — output is a no-false-positive subset of
    ``embedding_near_dup``; recall is tuned by bands/bits (collision
    prob per bit = 1 - θ/π).

    Scale shape: the projection is posexplode + broadcast join with the
    (num_bits × dim) plane table + one hash aggregation — never a cross
    join; candidate generation is a per-bucket self-join like MinHash
    banding (functions/minhash.py).
    """
    assert num_bits % bands == 0
    rows_per_band = num_bits // bands
    spark = emb.sparkSession
    dim = len(emb.select(vec_col).first()[0])

    planes = spark.createDataFrame(
        [
            (i, j, w)
            for i, row in enumerate(_srp_planes(num_bits, dim))
            for j, w in enumerate(row)
        ],
        "bit INT, j INT, w DOUBLE",
    )
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("j", "x"),
    )
    # one shuffle: num_bits partial sums per vector
    signs = (
        v.join(F.broadcast(planes), "j")
        .groupBy("vid", "bit")
        .agg(F.sum(F.col("x") * F.col("w")).alias("p"))
        .select("vid", "bit", (F.col("p") >= 0).cast("int").alias("s"))
    )
    sig = signs.groupBy("vid").pivot("bit", list(range(num_bits))).agg(F.first("s"))
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(str(b * rows_per_band + r)) for r in range(rows_per_band)]
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    bucketed = sig.select("vid", F.explode(F.array(*band_cols)).alias("bk")).select(
        "vid", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    candidates = (
        bucketed.alias("l")
        .join(bucketed.alias("r"), ["band", "bh"])
        .select(F.col("l.vid").alias("a"), F.col("r.vid").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va"))
    vb = emb.select(F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        candidates.join(va, "a")
        .join(vb, "b")
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("score"))
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
