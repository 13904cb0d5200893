"""Extension queries over ``embeddings``: similarity search + MinHash-LSH
near-dup (SURVEY §2.12, X2/X3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.minhash import minhash_lsh_pairs
from ..functions.similarity import cosine_topk, embedding_near_dup, ivf_topk
from ..sources import table
from .registry import declare

_COS = (
    "list_dot_product(qv, cv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
)


@declare(
    "sim_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings),
         s AS (SELECT query_id, cand_id, {_COS} AS score
               FROM q CROSS JOIN c WHERE cand_id <> query_id),
         r AS (SELECT query_id, cand_id, score,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, cand_id) AS rank
               FROM s)
    SELECT query_id, cand_id, ROUND(score, 8) AS score, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def sim_topk(spark, sf_dir):
    """X3: exact brute-force top-k cosine for 5 probe vectors — the
    correctness baseline for ANN. Probes broadcast; corpus scored
    map-side; ranking window keeps k per probe."""
    emb = table(spark, sf_dir, "embeddings")
    top = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    return top.withColumn("rank", F.col("rank").cast("long"))


@declare("dedup_near_minhash", oracle=None)  # rows-only: LSH bucketing is not SQL-oracle-able
def dedup_near_minhash(spark, sf_dir):
    """X2 scale flavor: MinHash signatures over 3-gram shingles, banded
    LSH bucketing, exact-Jaccard verification of candidates only. The
    100 TB path: pair space is per-bucket, never O(n²); verified output
    is a subset of dedup_near_shingle's exact answer."""
    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        n=3,
        num_perm=32,
        bands=8,
        threshold=0.2,
    )


@declare(
    "dedup_near_embedding",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         p AS (SELECT x.vec_id AS a, y.vec_id AS b,
                      list_dot_product(x.vec, y.vec) /
                      (sqrt(list_dot_product(x.vec, x.vec)) * sqrt(list_dot_product(y.vec, y.vec)))
                        AS score
               FROM v x JOIN v y ON x.vec_id < y.vec_id)
    SELECT a, b, ROUND(score, 8) AS score FROM p WHERE score >= 0.4
    """,
)
def dedup_near_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs — exact all-pairs reference
    flavor (the LSH/IVF bucket paths are verified against this). The
    synthetic embeddings have no true duplicates (max pairwise cosine
    ~0.51), so the threshold is set where pairs exist."""
    return embedding_near_dup(table(spark, sf_dir, "embeddings"), threshold=0.4)


@declare("dedup_near_embedding_lsh", oracle=None)  # rows-only: SRP bucketing not SQL-oracle-able
def dedup_near_embedding_lsh(spark, sf_dir):
    """Embedding near-dup scale path: sign-random-projection banding +
    exact-cosine verification — a no-false-positive subset of
    dedup_near_embedding (subset/recall pinned by unit test
    tests/test_operators.py::test_srp_near_dup_subset)."""
    from ..functions.similarity import srp_near_dup

    return srp_near_dup(
        table(spark, sf_dir, "embeddings"), num_bits=16, bands=8, threshold=0.4
    )


_IVF_COS = lambda x, y: (  # noqa: E731
    f"list_dot_product({x}, {y}) / "
    f"(sqrt(list_dot_product({x}, {x})) * sqrt(list_dot_product({y}, {y})))"
)

@declare(
    "sim_ivf_topk",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
                  FROM embeddings WHERE vec_id < 16),
         c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS c_vec FROM embeddings),
         q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
               FROM embeddings WHERE vec_id < 5),
         asg AS (SELECT cand_id, c_vec, cent_id,
                        row_number() OVER (PARTITION BY cand_id
                                           ORDER BY {_IVF_COS("c_vec", "cv")} DESC, cent_id) AS rn
                 FROM c CROSS JOIN cent),
         probes AS (SELECT query_id, q_vec, cent_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY {_IVF_COS("q_vec", "cv")} DESC, cent_id) AS rn
                    FROM q CROSS JOIN cent),
         s AS (SELECT p.query_id, a.cand_id, {_IVF_COS("p.q_vec", "a.c_vec")} AS score
               FROM probes p JOIN asg a ON p.cent_id = a.cent_id
               WHERE a.rn = 1 AND p.rn <= 4 AND a.cand_id <> p.query_id),
         r AS (SELECT query_id, cand_id, score,
                      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, cand_id) AS rank
               FROM s)
    SELECT query_id, cand_id, ROUND(score, 8) AS score, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def sim_ivf_topk(spark, sf_dir):
    """X3 scale path: IVF-style ANN — coarse-quantize the corpus into
    centroid buckets, probe only the nprobe nearest buckets per query.
    Scan cost per query drops O(N) → O(N·nprobe/n_centroids)."""
    emb = table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 5),
                    k=3, n_centroids=16, nprobe=4)


@declare(
    "multimodal_features",
    oracle="""
    SELECT doc_id, 'application/x-fake' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    """X6: binary media columns + Arrow-batched pandas-UDF feature
    extraction (functions/multimodal.py). The histogram features are
    Python-side (not SQL-expressible) so the oracle checks the
    SQL-expressible projection (ids, types, byte lengths); the feature
    values themselves are pinned by unit tests."""
    from ..functions.multimodal import extract_features, synth_media

    docs = table(spark, sf_dir, "documents")
    return extract_features(synth_media(docs)).select(
        "doc_id", "media_type", "byte_len"
    )


@declare(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
               FROM embeddings),
    s AS (SELECT vec_id, vec,
                 greatest(list_max(list_transform(vec, x -> abs(x))), 1e-30)
                   AS mx
          FROM v)
    SELECT vec_id, ROUND(mx, 6) AS scale,
           array_to_string(
             list_transform(vec, x -> CAST(round(127 * x / mx) AS BIGINT)),
             ',') AS qvec
    FROM s
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization (the 4× memory cut every
    vector store applies before ANN): scale = max|x|, q = round(127·x/s).
    Pure array expressions — map-side, zero shuffles; the quantized
    vector serializes as a csv string so the oracle hash covers every
    element exactly."""
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).withColumn(
        "mx",
        F.greatest(
            F.array_max(F.transform(F.col("vec"), lambda x: F.abs(x))),
            F.lit(1e-30),
        ),
    )
    q = F.transform(
        F.col("vec"), lambda x: F.round(F.lit(127) * x / F.col("mx")).cast("long")
    )
    return v.select(
        "vec_id",
        F.round("mx", 6).alias("scale"),
        F.array_join(q.cast("array<string>"), ",").alias("qvec"),
    )


@declare("sim_ivf_topk_trained")
def sim_ivf_topk_trained(spark, sf_dir):
    """X3 full scale path: IVF probing over a TRAINED codebook (k-means,
    functions/kmeans.py) instead of the first-k quantizer — the exact
    pipeline a production vector index runs (train → assign → probe).
    Iterative training isn't SQL-expressible → rows-only check; recall
    vs the exact `sim_topk` is asserted in
    tests/test_operators.py::test_ivf_trained_recall."""
    from ..functions.kmeans import kmeans_fit
    from ..functions.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    cb = kmeans_fit(emb, k=8, iters=2)
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=3, nprobe=3, codebook=cb
    )


@declare("kmeans_codebook")
def kmeans_codebook(spark, sf_dir):
    """IVF codebook training: 3 Lloyd's iterations, k=8, deterministic
    init (functions/kmeans.py) — the one genuinely iterative vector
    algorithm, like dedup_canonical_docs for graphs. Not SQL-expressible
    (iterative fixpoint) → rows-only driver check; the convergence math
    is pinned by tests/test_operators.py::test_kmeans_converges. Output
    long-form (cent_id, pos, val) so schema and count (k × dim) are
    stable."""
    from ..functions.kmeans import kmeans_fit

    emb = table(spark, sf_dir, "embeddings")
    cb = kmeans_fit(emb, k=8, iters=3)
    return cb.select(
        "cent_id", F.posexplode("centroid").alias("pos", "val")
    ).select("cent_id", F.col("pos").cast("long").alias("pos"),
             F.round("val", 6).alias("val"))


@declare(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (SELECT doc_id, hex(encode(text)) AS ph FROM documents),
    idx AS (
      SELECT doc_id, ph,
             unnest(range(0, CAST(ceil(length(ph) / 32.0) AS BIGINT), 4)) AS i
      FROM b)
    SELECT doc_id, i AS frame_idx,
           substr(ph, CAST(i * 32 + 1 AS BIGINT), 32) AS frame_hex,
           CAST(length(substr(ph, CAST(i * 32 + 1 AS BIGINT), 32)) / 2
                AS BIGINT) AS frame_len
    FROM idx
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """X6 video-style frame sampling: chunk each payload into 16-byte
    frames, keep every 4th — mapInPandas fan-out with zero shuffles
    (functions/multimodal.py sample_frames). The oracle replays the
    byte slicing on the hex encoding of the same payload, so frame
    boundaries, sampled indices, and frame bytes are all value-checked."""
    from ..functions.multimodal import sample_frames, synth_media

    docs = table(spark, sf_dir, "documents")
    frames = sample_frames(synth_media(docs), frame_bytes=16, stride=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.hex("frame").alias("frame_hex"),
        "frame_len",
    )
