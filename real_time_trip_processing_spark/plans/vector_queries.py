"""Extension queries over ``embeddings``/``documents``: similarity
search, MinHash-LSH and SRP-LSH near-dup (SURVEY §2.12, X2/X3).

Every query here is hash-adjudicable. The two LSH pipelines are built
from engine-portable primitives (md5-derived hashes / ±1 planes,
integer arithmetic) so the DuckDB oracles replay candidate generation
*and* verification bit-for-bit; the two iterative queries (k-means,
trained IVF) declare deterministic invariants (conservation, recall
bands) whose oracle side is exactly computable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.caching import attach_owned
from ..functions.minhash import (
    _perm_constants,
    minhash_incremental_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
)
from ..functions.similarity import (
    SRP_QUANT,
    cosine_topk,
    ivf_topk,
    random_projection,
    semantic_decontaminate,
    srp_buckets,
    srp_incremental_pairs,
    srp_near_dup,
    srp_signs,
)
from ..sources import table
from .registry import declare

_COS = (
    "list_dot_product(qv, cv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
)

#: SRP_QUANT integer quantization of the embedding column — scores over
#: these lists are exact integer ratios (every float64 intermediate is an
#: integer < 2^53), so DuckDB's list_dot_product, Spark's JVM fold and
#: numpy's BLAS matmul agree bit-for-bit regardless of summation order.
_QV = (
    "list_transform(CAST(embedding AS DOUBLE[]), "
    f"x -> round(x * {SRP_QUANT}.0))"
)


def _QDIR(expr: str) -> str:
    """DuckDB replay of ``similarity.has_quant_direction`` over a
    quantized list expression: no NULL elements AND at least one
    nonzero quant (NULL/empty lists evaluate non-true and drop — the
    same three-valued logic as the Spark guard). Every oracle whose
    Spark side calls ``has_quant_direction`` (cosine_topk /
    srp_near_dup consumers) must carry this so a zero-quantized
    embedding — real at corpus scale — cannot diverge the engines:
    Spark drops it while a guard-less DuckDB replay would emit
    NaN-score rows (DuckDB orders NaN greatest, same as Spark, so the
    NaN rows would RANK, not sink)."""
    return (
        f"(len(list_filter({expr}, x -> x IS NULL)) = 0"
        f" AND len(list_filter({expr}, x -> x <> 0)) > 0)"
    )


@declare(
    "sim_topk",
    oracle=f"""
    WITH q0 AS (SELECT vec_id, {_QV} AS qv FROM embeddings
                WHERE {_QDIR(_QV)}),
         q AS (SELECT vec_id AS query_id, qv FROM q0 WHERE vec_id < 5),
         c AS (SELECT vec_id AS cand_id, qv AS cv FROM q0),
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
    """X3: brute-force top-k cosine for 5 probe vectors — the
    correctness baseline for ANN, scored over SRP_QUANT-quantized
    vectors (bit-exact across engines). Probes ride driver-side into an
    Arrow kernel; each corpus batch is ONE BLAS matmul emitting its
    local top-k; the final window ranks n_batches·k rows per probe."""
    emb = table(spark, sf_dir, "embeddings")
    top = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    return top.withColumn("rank", F.col("rank").cast("long"))


def _minhash_common_ctes(n: int, num_perm: int, bands: int) -> str:
    """Shared DuckDB CTE chain for every MinHash-LSH oracle: shingles →
    md5-60-bit hashes → universal-hash signatures (shared Python
    source: _perm_constants) → banded (doc, band, bh) rows. Factored so
    the capped and uncapped oracles replay ONE pipeline definition — a
    fix to shingle construction or hash reduction cannot silently
    diverge the two declared queries."""
    rpb = num_perm // bands
    consts = _perm_constants(num_perm)
    sig_aggs = ",\n            ".join(
        f"MIN(({a} * (h31 + 1) + {b}) % 2147483647) AS s{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT doc, {b} AS band, {key} AS bh FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"CAST(s{b * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for b in range(bands)
    )
    return f"""sh0 AS (
      SELECT doc_id AS doc, unnest(list_distinct(sh_list)) AS sh
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i:i+{n - 1}], ' ')
                FOR i IN range(1, greatest(len(toks) - {n - 1}, 1) + 1)] AS sh_list
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t0) t1),
    hd AS (SELECT DISTINCT doc,
                  CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
           FROM sh0),
    sig AS (SELECT doc, {sig_aggs}
            FROM (SELECT doc, h % 2147483646 AS h31 FROM hd) GROUP BY doc),
    bnd AS ({band_selects})"""


def _minhash_verify_tail(threshold: float) -> str:
    """Shared exact-Jaccard verification over a ``cand(a, b)`` CTE the
    caller defines — the declared output columns of both LSH dedup
    flavors."""
    return f"""sizes AS (SELECT doc, COUNT(*) AS sz FROM hd GROUP BY doc),
    inter AS (SELECT c.a, c.b, COUNT(*) AS inter
              FROM cand c
              JOIN hd x ON x.doc = c.a
              JOIN hd y ON y.doc = c.b AND y.h = x.h
              GROUP BY c.a, c.b)
    SELECT i.a, i.b, i.inter,
           ROUND(i.inter / (sa.sz + sb.sz - i.inter), 8) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc = i.a
    JOIN sizes sb ON sb.doc = i.b
    WHERE i.inter / (sa.sz + sb.sz - i.inter) >= {threshold}
    """


def _minhash_oracle(
    n: int = 3, num_perm: int = 32, bands: int = 8, threshold: float = 0.2
) -> str:
    """DuckDB replay of the ENTIRE deterministic MinHash-LSH pipeline:
    same shingles, same md5-60-bit hashes, same universal-hash
    signature constants (shared Python source: _perm_constants), same
    band keys, same exact-Jaccard verification. Any drift anywhere in
    the pipeline hash-mismatches the declared query."""
    return f"""
    WITH {_minhash_common_ctes(n, num_perm, bands)},
    cand AS (SELECT DISTINCT l.doc AS a, r.doc AS b
             FROM bnd l JOIN bnd r
               ON l.band = r.band AND l.bh = r.bh AND l.doc < r.doc),
    {_minhash_verify_tail(threshold)}"""


@declare("dedup_near_minhash", oracle=_minhash_oracle())
def dedup_near_minhash(spark, sf_dir):
    """X2 scale flavor: MinHash signatures over 3-gram shingles, banded
    LSH bucketing, exact-Jaccard verification of candidates only. The
    100 TB path: pair space is per-bucket, never O(n²); verified output
    is a subset of dedup_near_shingle's exact answer.

    Declared in the deterministic (md5-hash) flavor so the DuckDB
    oracle can replay signatures, banding AND verification — the LSH
    pipeline itself is hash-adjudicated, not just row-counted. The
    xxhash64 flavor (det=False) is the same plan with a cheaper hash."""
    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        n=3,
        num_perm=32,
        bands=8,
        threshold=0.2,
        det=True,
    )


def _srp_sql_ctes(
    num_bits: int = 16, bands: int = 8, dim: int = 64,
    guard_zero: bool = False,
) -> str:
    """Shared DuckDB CTE chain replaying srp_buckets exactly: integer
    quantization, md5-parity ±1 planes (same Python source: srp_signs),
    order-independent integer dots, per-band bit strings.

    ``guard_zero`` mirrors the Spark entry point: srp_near_dup filters
    ``has_quant_direction`` before bucketing (NaN verify scores
    otherwise), so its oracles must replay the exclusion (_QDIR);
    srp_buckets alone does NOT filter (sign bits are well-defined for
    the zero vector), so diversity_sample_srp's oracle must not."""
    rpb = num_bits // bands
    signs = srp_signs(num_bits, dim)
    values = ",".join(
        f"({i},{j + 1},{s})" for i, row in enumerate(signs) for j, s in enumerate(row)
    )
    guard = f" WHERE {_QDIR('qv')}" if guard_zero else ""
    return f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    q AS (SELECT * FROM (SELECT vec_id, list_transform(vec,
                 x -> CAST(round(x * {SRP_QUANT}.0) AS BIGINT)) AS qv FROM v){guard}),
    ex AS (SELECT vec_id, unnest(qv) AS x, unnest(range(1, len(qv)+1)) AS j FROM q),
    planes(bit, j, s) AS (VALUES {values}),
    dots AS (SELECT e.vec_id, p.bit, SUM(e.x * p.s) AS d
             FROM ex e JOIN planes p ON p.j = e.j GROUP BY e.vec_id, p.bit),
    bks AS (SELECT vec_id, CAST(bit // {rpb} AS INT) AS band,
                   string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END,
                              '' ORDER BY bit) AS bh
            FROM dots GROUP BY vec_id, bit // {rpb})
    """


@declare(
    "dedup_near_embedding",
    oracle=f"""
    WITH {_srp_sql_ctes(96, 16, 64, guard_zero=True)},
    cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
             FROM bks l JOIN bks r
               ON l.band = r.band AND l.bh = r.bh AND l.vec_id < r.vec_id),
    s AS (SELECT a, b,
                 list_dot_product(x.qv, y.qv) /
                 (sqrt(list_dot_product(x.qv, x.qv)) *
                  sqrt(list_dot_product(y.qv, y.qv))) AS score
          FROM cand JOIN q x ON x.vec_id = a JOIN q y ON y.vec_id = b)
    SELECT a, b, ROUND(score, 8) AS score FROM s WHERE score >= 0.4
    """,
)
def dedup_near_embedding(spark, sf_dir):
    """Embedding near-dup — the SCALE path is the declared query:
    sign-random-projection banding prunes the pair space, and candidate
    generation + quantized-cosine verification are FUSED into one
    per-bucket matmul kernel (applyInPandas) — the candidate pairs are
    never materialized as Spark rows; only surviving pairs leave the
    kernel. No join anywhere in the plan; signatures and verification
    are integer arithmetic (bit-exact across engines), so the oracle
    replays the whole pipeline (planes included) and hash-matches.

    The exact all-pairs form (functions/similarity.embedding_near_dup)
    stays in tests as the recall/no-false-positive reference
    (tests/test_operators.py::test_srp_near_dup_subset).

    Config: 6 bits/band × 16 bands = 64 buckets per band. Candidate
    mass scales as bands/2^(bits_per_band) — this config carries 1/8th
    the candidate pairs of a 2-bit-band layout at identical verify
    precision; bits_per_band is THE 100 TB dial (production near-dup
    thresholds run 16-20 bits/band → 65k-1M buckets)."""
    return srp_near_dup(
        table(spark, sf_dir, "embeddings"),
        num_bits=96, bands=16, threshold=0.4, dim=64,
    )


@declare(
    "dedup_near_embedding_incremental",
    oracle=f"""
    WITH {_srp_sql_ctes(96, 16, 64, guard_zero=True)},
    cand AS (SELECT DISTINCT r.vec_id AS a, l.vec_id AS b
             FROM bks l JOIN bks r ON l.band = r.band AND l.bh = r.bh
             WHERE l.vec_id % 7 = 0 AND r.vec_id % 7 <> 0),
    s AS (SELECT a, b,
                 list_dot_product(x.qv, y.qv) /
                 (sqrt(list_dot_product(x.qv, x.qv)) *
                  sqrt(list_dot_product(y.qv, y.qv))) AS score
          FROM cand JOIN q x ON x.vec_id = a JOIN q y ON y.vec_id = b)
    SELECT a, b, ROUND(score, 8) AS score FROM s WHERE score >= 0.4
    """,
)
def dedup_near_embedding_incremental(spark, sf_dir):
    """Embedding near-dup, incremental flavor — the per-ingest-cycle
    screen (the vec_id % 7 == 0 slice is the new batch, the rest the
    ingested corpus), the embedding twin of `dedup_near_incremental`:
    SRP bucket rows on both sides, ONE (band, bh) equi-join with the
    small batch probing the corpus — never the corpus self-join — and
    exact quantized-cosine verification (Arrow pair kernel,
    bit-identical to the JVM fold). Candidate mass is bounded by
    |batch| × matched-bucket width, an ingest-cycle cost; the
    `bucket_cap` dial bounds the corpus-side width at 100 TB.
    Signatures, banding, the cross-split join AND verification are
    integer-exact, so the oracle replays the whole pipeline."""
    emb = table(spark, sf_dir, "embeddings")
    return srp_incremental_pairs(
        emb.filter(F.col("vec_id") % 7 == 0),
        emb.filter(F.col("vec_id") % 7 != 0),
        num_bits=96, bands=16, threshold=0.4, dim=64,
    )


@declare(
    "dedup_near_embedding_lsh",
    oracle=f"""
    WITH {_srp_sql_ctes(96, 16, 64)},
    per_band AS (SELECT band, COUNT(*) AS n_vectors,
                        COUNT(DISTINCT bh) AS n_buckets
                 FROM bks GROUP BY band),
    pairs AS (SELECT l.band, COUNT(*) AS n_pairs
              FROM bks l JOIN bks r
                ON l.band = r.band AND l.bh = r.bh AND l.vec_id < r.vec_id
              GROUP BY l.band)
    SELECT pb.band, pb.n_vectors, pb.n_buckets,
           COALESCE(p.n_pairs, 0) AS n_pairs
    FROM per_band pb LEFT JOIN pairs p ON p.band = pb.band
    """,
)
def dedup_near_embedding_lsh(spark, sf_dir):
    """SRP-LSH bucket diagnostics — the tuning view every LSH deploy
    needs: per band, how many distinct buckets and how many candidate
    pairs the band contributes (the band-level cost/recall dial).
    Deterministic end-to-end (integer signatures), so bucket structure
    itself is hash-adjudicated against the oracle's replay.

    Pair counts are the CLOSED FORM Σ k·(k−1)/2 over bucket widths —
    one aggregate, O(buckets) — never a bucket self-join that
    materializes Σ k² rows just to count them (on the head-heavy
    corpora where this diagnostic matters, that join IS the quadratic
    hazard it exists to measure; same fix as minhash_band_stats,
    round 6). The oracle keeps the join formulation — identical
    counts, adjudicating the closed form against an independent
    derivation."""
    bucketed = srp_buckets(
        table(spark, sf_dir, "embeddings"), num_bits=96, bands=16, dim=64
    )
    widths = bucketed.groupBy("band", "bh").agg(
        F.count(F.lit(1)).alias("k")
    )
    return widths.groupBy("band").agg(
        F.sum("k").cast("long").alias("n_vectors"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.col("k") * (F.col("k") - 1) / 2).cast("long").alias("n_pairs"),
    )


_IVF_COS = lambda x, y: (  # noqa: E731
    f"list_dot_product({x}, {y}) / "
    f"(sqrt(list_dot_product({x}, {x})) * sqrt(list_dot_product({y}, {y})))"
)

#: shared by sim_ivf_topk and sim_ivf_persisted — the persisted-index
#: serve path is bit-identical to the in-query path by construction, so
#: both declare the SAME DuckDB replay.
_IVF_ORACLE = f"""
    WITH qn AS (SELECT vec_id, {_QV} AS qv FROM embeddings
                WHERE {_QDIR(_QV)}),
         cent AS (SELECT vec_id AS cent_id, qv AS cv
                  FROM qn WHERE vec_id < 16),
         c AS (SELECT vec_id AS cand_id, qv AS c_vec FROM qn),
         q AS (SELECT vec_id AS query_id, qv AS q_vec
               FROM qn WHERE vec_id < 5),
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
    """


@declare("sim_ivf_topk", oracle=_IVF_ORACLE)
def sim_ivf_topk(spark, sf_dir):
    """X3 scale path: IVF-style ANN — coarse-quantize the corpus into
    centroid buckets (row-local argmax over the centroid literal —
    zero shuffle of vectors), probe only the nprobe nearest buckets per
    query. Scan cost per query drops O(N) → O(N·nprobe/n_centroids)."""
    emb = table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 5),
                    k=3, n_centroids=16, nprobe=4)


@declare("sim_ivf_persisted", oracle=_IVF_ORACLE)
def sim_ivf_persisted(spark, sf_dir):
    """X3 serving path: the SAME IVF query served from a PERSISTED
    index (functions/ivf_index.py). The build step — assignment +
    quantization of every corpus vector, the part SCALE.md measured as
    dominating `sim_ivf_topk`'s wall — runs once (content-addressed: a
    (row count, id+vector content hash) manifest skips rebuilds until the corpus
    drifts) and lays cells out as parquet partitioned by cent_id;
    serving reads ONLY the probed cells via parquet partition pruning
    and scores stored integer vectors. Bit-identical to `sim_ivf_topk`
    (same oracle SQL, hash-adjudicated)."""
    import hashlib
    import os

    from ..functions.ivf_index import (
        default_index_root, ivf_index_ensure, ivf_persisted_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = ivf_index_ensure(
        emb,
        os.path.join(default_index_root(), f"ivf_emb_{tag}_c16"),
        n_centroids=16,
    )
    return ivf_persisted_topk(
        spark, idx, emb.filter(F.col("vec_id") < 5), k=3, nprobe=4
    )


#: declared recall floor for sim_ivf_recall (k=10, nprobe=4 of 16
#: centroids, 20 probes). Measured recall@10 on the driver testdata:
#: 0.830 (sf0.001), 0.805 (sf0.01), 0.895 (sf0.1). The floor follows
#: the same just-under-the-band rule as _PQ_RECALL_BAND (round 8:
#: 0.70 → 0.73, ~0.07 under the 0.805 low end — recall is
#: DETERMINISTIC here: first-N centroids, quantized-integer scoring,
#: no seed variance, so the observed band is exact per corpus): a pass
#: means the index geometry is sound, and a centroid/pruning
#: regression (recall collapse toward nprobe/n_centroids = 0.25) flips
#: recall_ok and fails the hash compare. The oracle ALSO replays both
#: sides exactly (IVF replay + exact top-k in SQL), so even a recall
#: change WITHIN the band is caught as a value mismatch on n_hit.
#:
#: Round 10 considered the offered 0.73 → 0.78 raise (the band
#: reproduced again this round) and DECLINED it, for the same reason
#: the PQ floor was widened to 0.52: determinism is per corpus draw,
#: the driver regenerates testdata between rounds, and a gate that can
#: flap on a redraw with no code regression costs more than the extra
#: 0.05 of floor buys — the floor's job is separating "geometry sound"
#: from the 0.25 pruning-collapse mode, and 0.73 does that with 3×
#: margin. The exact per-corpus numbers are adjudicated anyway by the
#: oracle's n_hit value compare, which is tighter than any floor.
_RECALL_BAND = 0.73

_RECALL_ORACLE = f"""
    WITH qn AS (SELECT vec_id, {_QV} AS qv FROM embeddings
                WHERE {_QDIR(_QV)}),
         cent AS (SELECT vec_id AS cent_id, qv AS cv
                  FROM qn WHERE vec_id < 16),
         c AS (SELECT vec_id AS cand_id, qv AS c_vec FROM qn),
         q AS (SELECT vec_id AS query_id, qv AS q_vec
               FROM qn WHERE vec_id < 20),
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
         approx AS (SELECT query_id, cand_id FROM (
               SELECT query_id, cand_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, cand_id) AS rank
               FROM s) WHERE rank <= 10),
         ex_s AS (SELECT q.query_id, c.cand_id,
                         {_IVF_COS("q.q_vec", "c.c_vec")} AS score
                  FROM q CROSS JOIN c WHERE c.cand_id <> q.query_id),
         exact AS (SELECT query_id, cand_id FROM (
               SELECT query_id, cand_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, cand_id) AS rank
               FROM ex_s) WHERE rank <= 10),
         agg AS (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
                        CAST(COUNT(*) AS BIGINT) AS n_expected
                 FROM exact),
         hagg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
                  FROM exact e JOIN approx a
                  ON e.query_id = a.query_id AND e.cand_id = a.cand_id)
    SELECT n_queries, CAST(10 AS INT) AS k, CAST(4 AS INT) AS nprobe,
           n_expected, n_hit,
           ROUND(CAST(n_hit AS DOUBLE) / n_expected, 8) AS recall,
           (CAST(n_hit AS DOUBLE) / n_expected >= {_RECALL_BAND}) AS recall_ok
    FROM agg CROSS JOIN hagg
    """


@declare("sim_ivf_recall", oracle=_RECALL_ORACLE)
def sim_ivf_recall(spark, sf_dir):
    """X3 quality CONTRACT: recall@10 of the IVF path against exact
    brute force, as a declared query — an index regression (bad
    centroids, broken cell pruning, probe-selection drift) now fails
    CORRECTNESS instead of only a tool nobody re-runs
    (tools/recall_ann.py measures the nprobe↔recall dial; this pins
    one point of the curve plus the `recall_ok >= _RECALL_BAND` floor).
    Both sides compute recall independently — Spark via
    ivf_topk/cosine_topk, DuckDB by replaying IVF and exact top-k in
    SQL — so the hash compare adjudicates the exact n_hit, not just
    the band."""
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, probes, k=10).select("query_id", "cand_id")
    approx = ivf_topk(
        emb, probes, k=10, n_centroids=16, nprobe=4
    ).select("query_id", "cand_id")
    agg = exact.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_expected"),
    )
    hagg = exact.join(approx, ["query_id", "cand_id"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return agg.crossJoin(hagg).select(
        "n_queries",
        F.lit(10).cast("int").alias("k"),
        F.lit(4).cast("int").alias("nprobe"),
        "n_expected",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_expected"), 8).alias("recall"),
        (F.col("n_hit") / F.col("n_expected") >= _RECALL_BAND).alias(
            "recall_ok"
        ),
    )


#: declared recall floor for sim_ivfpq_recall (k=10, nprobe=4 of 16,
#: m=32 k=16 ADC). Measured recall@10 on the driver testdata: 0.645
#: (sf0.001), 0.630 (sf0.01), 0.570 (sf0.1) — PQ distortion costs
#: ~0.2 recall vs the uncompressed IVF path (sim_ivf_recall's
#: 0.805–0.895), which is the expected ADC trade. Training is
#: DETERMINISTIC (lowest-id init, fixed iters — no seed variance), so
#: the observed band is exact per corpus; the floor sits just under
#: its low end and far above failure modes: broken cell pruning
#: degrades toward nprobe/n_centroids ≈ 0.25, a collapsed quantizer
#: toward ~0. reproduce_claims.py independently re-measures the raw
#: number against the same floor and the 0.5–0.75 envelope.
#:
#: Margin history: round 9 raised 0.50 → 0.55 after the measurements
#: reproduced exactly across the round-8 testdata regeneration; the
#: round-9 ADVICE pointed out that left only 0.02 under the sf0.1
#: point (0.57), and determinism is per CORPUS — a future testdata
#: REDRAW re-rolls the measured band and could flap this correctness
#: gate with no code regression (exactly what round 8's regeneration
#: did to other queries). Round 10 settles at 0.52: still >2× above
#: the 0.25 pruning-failure mode, but with redraw headroom — the
#: just-under-the-band rule applies to bands measured on ONE corpus
#: draw only when the gate can be re-baselined on a redraw, which the
#: driver's regeneration cadence doesn't allow mid-round.
_PQ_RECALL_BAND = 0.52

_PQ_RECALL_ORACLE = f"""
    WITH qn AS (SELECT vec_id, {_QV} AS qv FROM embeddings
                WHERE {_QDIR(_QV)}),
         c AS (SELECT vec_id AS cand_id, qv AS c_vec FROM qn),
         q AS (SELECT vec_id AS query_id, qv AS q_vec
               FROM qn WHERE vec_id < 20),
         ex_s AS (SELECT q.query_id, c.cand_id,
                         {_IVF_COS("q.q_vec", "c.c_vec")} AS score
                  FROM q CROSS JOIN c WHERE c.cand_id <> q.query_id),
         exact AS (SELECT query_id, cand_id FROM (
               SELECT query_id, cand_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, cand_id) AS rank
               FROM ex_s) WHERE rank <= 10)
    SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(10 AS INT) AS k, CAST(4 AS INT) AS nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_expected,
           TRUE AS recall_ok
    FROM exact
    """


@declare("sim_ivfpq_recall", oracle=_PQ_RECALL_ORACLE)
def sim_ivfpq_recall(spark, sf_dir):
    """X3 quality contract for the COMPRESSED path — the PQ twin of
    `sim_ivf_recall`: recall@10 of IVF-PQ ADC search against exact
    brute force, with the `recall_ok >= _PQ_RECALL_BAND` floor on the
    hash-compared output. PQ training is a float fixpoint, so unlike
    the IVF contract the oracle cannot replay the approximate side —
    it replays the EXACT side (n_queries, n_expected) and adjudicates
    the declared floor: a quantizer or pruning regression flips
    recall_ok and hash-mismatches. The raw recall number is kept OFF
    the declared output for that reason (not engine-replayable); it is
    measured in the module constant's comment and re-checked by
    tools/reproduce_claims.py."""
    from ..functions.pq import ivfpq_topk, pq_train

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    books = pq_train(emb, m=32, k=16, iters=2)
    approx = ivfpq_topk(
        emb, probes, books, k=10, n_centroids=16, nprobe=4
    ).select("query_id", "cand_id")
    exact = cosine_topk(emb, probes, k=10).select("query_id", "cand_id")
    agg = exact.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_expected"),
    )
    hagg = exact.join(approx, ["query_id", "cand_id"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return agg.crossJoin(hagg).select(
        "n_queries",
        F.lit(10).cast("int").alias("k"),
        F.lit(4).cast("int").alias("nprobe"),
        "n_expected",
        (F.col("n_hit") / F.col("n_expected") >= _PQ_RECALL_BAND).alias(
            "recall_ok"
        ),
    )


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


@declare(
    "sim_ivf_topk_trained",
    oracle=f"""
    SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_results,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5 AND {_QDIR(_QV)}
    """,
)
def sim_ivf_topk_trained(spark, sf_dir):
    """X3 full scale path: IVF probing over a TRAINED codebook
    (k-means, functions/kmeans.py) instead of the first-k quantizer —
    the exact pipeline a production vector index runs (train → assign →
    probe).

    Training is an iterative float fixpoint (mean-summation order makes
    centroid low bits engine/run-specific), so the declared result is
    the deterministic CONTRACT of the index: every probe returns
    exactly k results whose recall@k against the exact brute-force
    top-k (computed side-by-side in the same plan) clears ⅔. The
    oracle computes the contract exactly; an index whose recall
    degrades hash-mismatches. Measured recall on this corpus is 1.0
    (tests/test_operators.py::test_ivf_trained_recall)."""
    from ..functions.kmeans import kmeans_fit_rows

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cb = kmeans_fit_rows(emb, k=8, iters=2)
    ivf = ivf_topk(emb, queries, k=3, nprobe=3, codebook=cb).select(
        "query_id", "cand_id"
    )
    exact = cosine_topk(emb, queries, k=3).select("query_id", "cand_id")
    hits = (
        ivf.join(exact, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    per_q = ivf.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_results"))
    return (
        per_q.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.col("n_results").cast("long").alias("n_results"),
            (F.coalesce(F.col("hits"), F.lit(0)) >= 2).alias("recall_ok"),
        )
    )


@declare(
    "sim_pq_topk",
    oracle=f"""
    SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_results,
           TRUE AS quality_ok
    FROM embeddings WHERE vec_id < 5 AND {_QDIR(_QV)}
    """,
)
def sim_pq_topk(spark, sf_dir):
    """X3 compression path: product-quantization ADC search
    (functions/pq.py) — per-subspace L2 codebooks, Arrow-batched
    encoding, pure-codegen lookup-table scoring over the CODES column
    (the embedding column does not exist in the search plan; at 100 TB
    the scan reads 16 bytes/vector instead of 256).

    Like sim_ivf_topk_trained, training is a float fixpoint, so the
    declared result is the index's deterministic CONTRACT: every probe
    returns exactly k results, each probe's ADC top-3 intersects the
    exact brute-force top-10 (computed side-by-side). The oracle
    computes the contract exactly; a quantizer whose precision
    collapses hash-mismatches. Measured on this corpus: ≥2 of 3 ADC
    results are exact-top-10 members per query
    (tests/test_operators.py::test_pq_adc_quality)."""
    from ..functions.pq import pq_adc_topk, pq_encode, pq_train

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    books = pq_train(emb, m=32, k=16, iters=2)
    codes = pq_encode(emb, books)
    adc = pq_adc_topk(codes, queries, books, k=3).select("query_id", "cand_id")
    exact = cosine_topk(emb, queries, k=10).select("query_id", "cand_id")
    hits = (
        adc.join(exact, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    per_q = adc.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_results"))
    return per_q.join(hits, "query_id", "left").select(
        "query_id",
        F.col("n_results").cast("long").alias("n_results"),
        (F.coalesce(F.col("hits"), F.lit(0)) >= 1).alias("quality_ok"),
    )


@declare(
    "sim_ivfpq_topk",
    oracle=f"""
    SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_results,
           TRUE AS quality_ok
    FROM embeddings WHERE vec_id < 5 AND {_QDIR(_QV)}
    """,
)
def sim_ivfpq_topk(spark, sf_dir):
    """X3 composed index: IVF coarse pruning over PQ-compressed codes
    with ADC scoring (functions/pq.py:ivfpq_topk) — the standard
    billion-vector layout (coarse cells prune the scan to
    nprobe/n_centroids of the corpus; codes compress what is scanned
    to m bytes/vector; LUTs score it without touching embeddings).

    Same contract discipline as sim_pq_topk: training is a float
    fixpoint, so the declared result is the index's deterministic
    CONTRACT — every probe returns exactly k results and each probe's
    IVF-PQ top-3 intersects the exact brute-force top-10. ADC score
    parity with the full-scan pq_adc_topk is pinned in
    tests/test_operators.py (same codes, same LUTs)."""
    from ..functions.pq import ivfpq_topk, pq_train

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    books = pq_train(emb, m=32, k=16, iters=2)
    ivfpq = ivfpq_topk(
        emb, queries, books, k=3, n_centroids=8, nprobe=4
    ).select("query_id", "cand_id")
    return _ivfpq_contract(emb, queries, ivfpq)


def _ivfpq_contract(emb, queries, ivfpq):
    """The deterministic IVF-PQ contract frame: every probe returns
    exactly k results and each probe's approximate top-3 intersects the
    exact brute-force top-10 (training is a float fixpoint, so raw
    scores are not the declared result). Shared by the in-query and
    persisted-index flavors."""
    exact = cosine_topk(emb, queries, k=10).select("query_id", "cand_id")
    hits = (
        ivfpq.join(exact, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    per_q = ivfpq.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_results"))
    return per_q.join(hits, "query_id", "left").select(
        "query_id",
        F.col("n_results").cast("long").alias("n_results"),
        (F.coalesce(F.col("hits"), F.lit(0)) >= 1).alias("quality_ok"),
    )


@declare(
    "sim_ivfpq_persisted",
    oracle=f"""
    SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_results,
           TRUE AS quality_ok
    FROM embeddings WHERE vec_id < 5 AND {_QDIR(_QV)}
    """,
)
def sim_ivfpq_persisted(spark, sf_dir):
    """X3 serving path for the COMPOSED index: IVF-PQ from a persisted
    layout (functions/ivf_index.py) — codes cells partitioned by
    cent_id (serve scans m-byte codes from probed cells only, never an
    embedding), PQ codebooks stored WITH the index so codes are always
    scored by the books that encoded them, content-addressed manifest
    skipping rebuilds. PQ training (the expensive step) runs only when
    a build actually happens. Same contract oracle as
    `sim_ivfpq_topk`."""
    import hashlib
    import os

    from ..functions.ivf_index import (
        default_index_root, ivfpq_index_ensure, ivfpq_persisted_topk,
    )
    from ..functions.pq import pq_train

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = ivfpq_index_ensure(
        emb,
        os.path.join(default_index_root(), f"ivfpq_emb_{tag}_c8"),
        books_factory=lambda: pq_train(emb, m=32, k=16, iters=2),
        n_centroids=8,
        m=32,
        k=16,
    )
    ivfpq = ivfpq_persisted_topk(
        spark, idx, queries, k=3, nprobe=4
    ).select("query_id", "cand_id")
    return _ivfpq_contract(emb, queries, ivfpq)


@declare(
    "kmeans_codebook",
    oracle="""
    SELECT CAST(8 AS BIGINT) AS k, TRUE AS dims_ok,
           COUNT(*) AS points_total, TRUE AS improved
    FROM embeddings
    """,
)
def kmeans_codebook(spark, sf_dir):
    """IVF codebook training: 3 Lloyd's iterations, k=8, deterministic
    init (functions/kmeans.py) — the one genuinely iterative vector
    algorithm, like dedup_canonical_docs for graphs.

    Centroid float bits depend on mean-summation order, so the declared
    result asserts the training INVARIANTS that are deterministic:
    codebook size k, centroid dimensionality, conservation (every
    vector assigned exactly once — points_total is hash-matched against
    the oracle's exact count), and that training improved the objective
    (mean best-cosine ≥ init's, computed side-by-side in one pass).
    Convergence math is pinned by
    tests/test_operators.py::test_kmeans_converges."""
    from ..functions.kmeans import kmeans_fit_rows
    from ..functions.similarity import _centroid_literals, cosine

    k, dim = 8, 64
    emb = table(spark, sf_dir, "embeddings")
    init = kmeans_fit_rows(emb, k=k, iters=0)
    fin = kmeans_fit_rows(emb, k=k, iters=3)
    dims_ok = len(fin) == k and all(len(vec) == dim for _, vec in fin)

    vecs = emb.select(F.col("embedding").cast("array<double>").alias("v"))
    def best(rows):
        vec_arr, _ = _centroid_literals(rows)
        return F.array_max(F.transform(vec_arr, lambda c: cosine(F.col("v"), c)))

    agg = vecs.agg(
        F.count(F.lit(1)).alias("points_total"),
        F.avg(best(init)).alias("obj_init"),
        F.avg(best(fin)).alias("obj_fin"),
    )
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        F.lit(dims_ok).alias("dims_ok"),
        F.col("points_total").cast("long").alias("points_total"),
        (F.col("obj_fin") >= F.col("obj_init") - F.lit(1e-9)).alias("improved"),
    )


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


def _rp_planes_values(dim_out: int = 8, dim: int = 64) -> str:
    signs = srp_signs(dim_out, dim)
    return ",".join(
        f"({i},{j + 1},{s})" for i, row in enumerate(signs) for j, s in enumerate(row)
    )


@declare(
    "embedding_random_projection",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    q AS (SELECT vec_id, list_transform(vec,
                 x -> CAST(round(x * {SRP_QUANT}.0) AS BIGINT)) AS qv FROM v),
    ex AS (SELECT vec_id, unnest(qv) AS x, unnest(range(1, len(qv)+1)) AS j FROM q),
    planes(bit, j, s) AS (VALUES {_rp_planes_values(8, 64)}),
    dots AS (SELECT e.vec_id, p.bit, SUM(e.x * p.s) AS d
             FROM ex e JOIN planes p ON p.j = e.j GROUP BY e.vec_id, p.bit)
    SELECT vec_id, CAST(bit AS INT) AS dim, CAST(d AS BIGINT) AS proj,
           ROUND(d / ({SRP_QUANT}.0 * sqrt(8.0)), 8) AS y
    FROM dots
    """,
)
def embedding_random_projection(spark, sf_dir):
    """JL-style ±1 random projection 64 → 8 dims over integer-quantized
    vectors — entirely row-local (plane matrix is one literal), integer
    dots so the reduction is order-independent and the oracle replays it
    bit-for-bit; `y` is the JL-rescaled coordinate."""
    return random_projection(
        table(spark, sf_dir, "embeddings"), dim_out=8, dim=64
    )


@declare(
    "knn_label_vote",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, {_QV} AS qv
               FROM embeddings WHERE vec_id < 50 AND {_QDIR(_QV)}),
         c AS (SELECT vec_id AS cand_id, {_QV} AS cv
               FROM embeddings WHERE {_QDIR(_QV)}),
         s AS (SELECT query_id, cand_id, {_COS} AS score
               FROM q CROSS JOIN c WHERE cand_id <> query_id),
         r AS (SELECT query_id, cand_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, cand_id) AS rank
               FROM s),
         nb AS (SELECT r.query_id, e.label
                FROM r JOIN embeddings e ON e.vec_id = r.cand_id
                WHERE r.rank <= 5),
         v AS (SELECT query_id, label, COUNT(*) AS votes
               FROM nb GROUP BY query_id, label),
         p AS (SELECT query_id, label, votes,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY votes DESC, label) AS rn
               FROM v)
    SELECT p.query_id, p.label AS pred_label, CAST(p.votes AS BIGINT) AS votes,
           e.label AS true_label, p.label = e.label AS correct
    FROM p JOIN embeddings e ON e.vec_id = p.query_id
    WHERE p.rn = 1
    """,
)
def knn_label_vote(spark, sf_dir):
    """kNN classification by neighbor vote — the end-use an ANN index
    serves: each probe's top-5 cosine neighbors vote with their
    ``label``; majority wins (ties toward the smaller label, then
    compared against the probe's own label). Neighbor search is the
    Arrow-kernel brute-force path (one matmul per corpus batch); label
    attach and voting shuffle only (query, label, count) rows."""
    from ..operators.sorts import topk_per_group

    emb = table(spark, sf_dir, "embeddings")
    top = cosine_topk(emb, emb.filter(F.col("vec_id") < 50), k=5)
    votes = (
        top.join(emb.select(F.col("vec_id").alias("cand_id"), "label"), "cand_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    pred = topk_per_group(
        votes, ["query_id"], [F.desc("votes"), F.col("label")], 1
    ).drop("rank")
    truth = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        pred.join(truth, "query_id")
        .select(
            "query_id",
            F.col("label").alias("pred_label"),
            F.col("votes").cast("long").alias("votes"),
            "true_label",
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


@declare(
    "decontaminate_semantic",
    oracle=f"""
    WITH e AS (SELECT vec_id AS eval_id, {_QV} AS qv
               FROM embeddings WHERE vec_id % 97 = 0 AND {_QDIR(_QV)}),
         c AS (SELECT vec_id AS cand_id, {_QV} AS cv
               FROM embeddings WHERE vec_id % 97 <> 0 AND {_QDIR(_QV)}),
         s AS (SELECT cand_id, eval_id, {_COS} AS score FROM c CROSS JOIN e),
         r AS (SELECT cand_id, eval_id, score,
                      row_number() OVER (PARTITION BY cand_id
                                         ORDER BY score DESC, eval_id) AS rn
               FROM s)
    SELECT cand_id, eval_id AS best_eval_id, ROUND(score, 8) AS score
    FROM r WHERE rn = 1 AND score >= 0.4
    """,
)
def decontaminate_semantic(spark, sf_dir):
    """Semantic (embedding-space) benchmark decontamination: corpus
    vectors within cosine 0.4 of any eval vector (vec_id % 97 == 0
    stands in for the eval set), each with its closest eval item. The
    eval set rides driver-side into an Arrow kernel (bounded, codebook
    discipline); the corpus is scored one BLAS matmul per batch with an
    in-batch argmax — a pure scan→kernel projection, ZERO exchanges."""
    emb = table(spark, sf_dir, "embeddings")
    return semantic_decontaminate(
        emb.filter(F.col("vec_id") % 97 != 0),
        emb.filter(F.col("vec_id") % 97 == 0),
        threshold=0.4,
    )


def _minhash_band_oracle(n: int = 3, num_perm: int = 32, bands: int = 8) -> str:
    rpb = num_perm // bands
    consts = _perm_constants(num_perm)
    sig_aggs = ",\n            ".join(
        f"MIN(({a} * (h31 + 1) + {b}) % 2147483647) AS s{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT doc, {b} AS band, {key} AS bh FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"CAST(s{b * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH sh0 AS (
      SELECT doc_id AS doc, unnest(list_distinct(sh_list)) AS sh
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i:i+{n - 1}], ' ')
                FOR i IN range(1, greatest(len(toks) - {n - 1}, 1) + 1)] AS sh_list
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t0) t1),
    hd AS (SELECT DISTINCT doc,
                  CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
           FROM sh0),
    sig AS (SELECT doc, {sig_aggs}
            FROM (SELECT doc, h % 2147483646 AS h31 FROM hd) GROUP BY doc),
    bnd AS ({band_selects}),
    per_band AS (SELECT band, COUNT(*) AS n_docs, COUNT(DISTINCT bh) AS n_buckets
                 FROM bnd GROUP BY band),
    pairs AS (SELECT l.band, COUNT(*) AS n_pairs
              FROM bnd l JOIN bnd r ON l.band = r.band AND l.bh = r.bh
                                   AND l.doc < r.doc
              GROUP BY l.band)
    SELECT pb.band, pb.n_docs, pb.n_buckets,
           COALESCE(p.n_pairs, 0) AS n_pairs
    FROM per_band pb LEFT JOIN pairs p ON p.band = pb.band
    """


def _minhash_capped_oracle(
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    max_bucket: int = 3,
) -> str:
    """DuckDB replay of the CAPPED MinHash-LSH pipeline — the 100 TB
    production configuration (`minhash_lsh_pairs(max_bucket=K)`):
    buckets wider than K contribute linear star edges between docs
    sharing the FULL signature (hub = min doc per (band, bucket,
    signature) group) instead of K² cross pairs; narrow buckets are
    exactly the uncapped pipeline. Every step is deterministic SQL —
    widths are a GROUP BY, hubs a MIN window — so the cap's semantics
    are hash-adjudicated end-to-end, not just row-counted."""
    full_sig = " || '|' || ".join(
        f"CAST(s{i} AS VARCHAR)" for i in range(num_perm)
    )
    return f"""
    WITH {_minhash_common_ctes(n, num_perm, bands)},
    fsg AS (SELECT doc, {full_sig} AS fs FROM sig),
    w AS (SELECT band, bh, COUNT(*) AS k FROM bnd GROUP BY band, bh),
    bnd2 AS (SELECT b.doc, b.band, b.bh, f.fs, w.k
             FROM bnd b
             JOIN w ON w.band = b.band AND w.bh = b.bh
             JOIN fsg f ON f.doc = b.doc),
    narrow AS (SELECT * FROM bnd2 WHERE k <= {max_bucket}),
    hot AS (SELECT * FROM bnd2 WHERE k > {max_bucket}),
    hubs AS (SELECT band, bh, fs, MIN(doc) AS hub
             FROM hot GROUP BY band, bh, fs),
    star AS (SELECT h2.hub AS a, h1.doc AS b
             FROM hot h1
             JOIN hubs h2 ON h1.band = h2.band AND h1.bh = h2.bh
                         AND h1.fs = h2.fs
             WHERE h1.doc <> h2.hub),
    cand AS (SELECT DISTINCT a, b FROM (
               SELECT l.doc AS a, r.doc AS b
               FROM narrow l
               JOIN narrow r ON l.band = r.band AND l.bh = r.bh
                            AND l.doc < r.doc
               UNION ALL
               SELECT a, b FROM star)),
    {_minhash_verify_tail(threshold)}"""


@declare(
    "dedup_near_minhash_capped",
    oracle=_minhash_capped_oracle(3, 32, 8, 0.2, max_bucket=3),
)
def dedup_near_minhash_capped(spark, sf_dir):
    """X2 — the PRODUCTION configuration of MinHash-LSH dedup, with the
    hot-bucket cap ON the correctness gate. On head-heavy corpora the
    widest band buckets grow with N, so the uncapped banded self-join's
    Σ K² candidate mass grows quadratically (measured 347.5 s at 2 M
    docs on the zipfian harness corpus; 54.2 s capped — SCALE.md);
    `max_bucket=K` bounds every over-wide bucket to linear star edges
    between docs sharing the full signature, preserving dup-cluster
    connectivity at O(group).

    The dial is scale-relative: K=3 here fires on this corpus's widest
    buckets (4–5 docs at test SFs) and exercises the exact code path
    K≈500 runs at 2 M docs — the DuckDB oracle replays widths, hub
    selection, star edges AND verification, so the capped semantics are
    hash-adjudicated every round, closing the round-5 gap where only
    the quadratic uncapped flavor was declared."""
    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        n=3,
        num_perm=32,
        bands=8,
        threshold=0.2,
        det=True,
        max_bucket=3,
    )


@declare(
    "dedup_near_incremental",
    oracle=f"""
    WITH {_minhash_common_ctes(3, 32, 8)},
    cand AS (SELECT DISTINCT r.doc AS a, l.doc AS b
             FROM bnd l JOIN bnd r ON l.band = r.band AND l.bh = r.bh
             WHERE l.doc % 7 = 0 AND r.doc % 7 <> 0),
    {_minhash_verify_tail(0.2)}""",
)
def dedup_near_incremental_q(spark, sf_dir):
    """X2 incremental flavor — near-dup screening of a NEW ingest batch
    (the doc_id % 7 == 0 slice) against the already-ingested corpus
    (the rest), completing the near-dup family's batch → incremental
    progression alongside `dedup_incremental` (exact) and
    `dedup_spans_incremental` (spans). The candidate join is
    batch-bands × corpus-bands — an equi-join with the small batch on
    one side, never the corpus self-join — and the corpus ships
    signatures + hashed shingle sets only (at 100 TB: a persisted
    `minhash_signatures` index reused across ingest cycles, the
    `corpus_hash_index` dial). Declared det (md5) so DuckDB replays
    shingling, signatures, banding, the cross-split candidate join AND
    exact-Jaccard verification — hash-adjudicated end to end.

    Round 12 (guide §1.2 — don't compute things twice): batch and
    corpus are %7 slices of ONE table and a signature is a pure per-doc
    function, so BOTH sides come from a single shared
    `minhash_signatures` pass, filtered on the signature frame — one
    documents scan and one kernel instantiation where the previous
    shape re-scanned and re-shingled the same table per side. Identical
    rows (slice-then-sign ≡ sign-then-slice, per-doc purity)."""
    docs = table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, n=3, num_perm=32, det=True).persist()
    return attach_owned(
        minhash_incremental_pairs(
            None,
            n=3,
            num_perm=32,
            bands=8,
            threshold=0.2,
            det=True,
            batch_sigs=sigs.filter(F.col("doc") % 7 == 0),
            corpus_sigs=sigs.filter(F.col("doc") % 7 != 0),
        ),
        [sigs],
    )


def _minhash_incremental_capped_oracle(
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    max_bucket: int = 3,
) -> str:
    """DuckDB replay of the CAPPED incremental pipeline: corpus bucket
    widths are counted over CORPUS band rows only (the batch never
    widens a bucket it is screened against), over-wide buckets expose
    one hub per full-signature group, and batch docs match hubs only on
    FULL signature equality — `minhash_incremental_pairs(max_bucket=K)`
    exactly, every step deterministic SQL."""
    full_sig = " || '|' || ".join(
        f"CAST(s{i} AS VARCHAR)" for i in range(num_perm)
    )
    return f"""
    WITH {_minhash_common_ctes(n, num_perm, bands)},
    fsg AS (SELECT doc, {full_sig} AS fs FROM sig),
    bb AS (SELECT b.doc, b.band, b.bh, f.fs
           FROM bnd b JOIN fsg f ON f.doc = b.doc WHERE b.doc % 7 = 0),
    cb AS (SELECT b.doc, b.band, b.bh, f.fs
           FROM bnd b JOIN fsg f ON f.doc = b.doc WHERE b.doc % 7 <> 0),
    w AS (SELECT band, bh, COUNT(*) AS k FROM cb GROUP BY band, bh),
    cbt AS (SELECT c.doc, c.band, c.bh, c.fs, w.k
            FROM cb c JOIN w ON w.band = c.band AND w.bh = c.bh),
    narrow AS (SELECT c.doc AS a, b.doc AS b
               FROM bb b JOIN cbt c ON c.band = b.band AND c.bh = b.bh
               WHERE c.k <= {max_bucket}),
    hubs AS (SELECT band, bh, fs, MIN(doc) AS hub
             FROM cbt WHERE k > {max_bucket} GROUP BY band, bh, fs),
    wide AS (SELECT h.hub AS a, b.doc AS b
             FROM bb b JOIN hubs h ON h.band = b.band AND h.bh = b.bh
                                  AND h.fs = b.fs),
    cand AS (SELECT DISTINCT a, b FROM (
               SELECT a, b FROM narrow UNION ALL SELECT a, b FROM wide)),
    {_minhash_verify_tail(threshold)}"""


@declare(
    "dedup_near_incremental_capped",
    oracle=_minhash_incremental_capped_oracle(3, 32, 8, 0.2, max_bucket=3),
)
def dedup_near_incremental_capped(spark, sf_dir):
    """X2 — the PRODUCTION configuration of incremental near-dup
    screening: the hot-bucket cap bounds the corpus side of the
    batch × corpus band join. On head-heavy corpora the widest CORPUS
    buckets grow with the ingested corpus, so every ingest cycle's
    screening cost would grow with Σ(batch hits × corpus width); with
    the cap an over-wide bucket exposes one representative per
    full-signature group (min corpus doc), so heavily-duplicated corpus
    content still flags its batch twins at O(width) while
    cross-signature band collisions — the measured false-positive mass
    — are dropped. K=3 fires on this corpus's widest buckets,
    exercising the exact path K≈500 runs at production widths; the
    oracle replays widths, hubs, full-signature matching AND
    verification."""
    docs = table(spark, sf_dir, "documents")
    # one shared signature pass, filtered per side — see
    # dedup_near_incremental_q (round 12)
    sigs = minhash_signatures(docs, n=3, num_perm=32, det=True).persist()
    return attach_owned(
        minhash_incremental_pairs(
            None,
            n=3,
            num_perm=32,
            bands=8,
            threshold=0.2,
            det=True,
            max_bucket=3,
            batch_sigs=sigs.filter(F.col("doc") % 7 == 0),
            corpus_sigs=sigs.filter(F.col("doc") % 7 != 0),
        ),
        [sigs],
    )


@declare("dedup_near_minhash_lsh", oracle=_minhash_band_oracle(3, 32, 8))
def dedup_near_minhash_lsh(spark, sf_dir):
    """MinHash-LSH band diagnostics (twin of the SRP view): per band,
    docs bucketed, distinct buckets, candidate pairs — the tuning view
    for the bands/num_perm dial, oracle-replayed end-to-end from the
    same md5-deterministic signatures as dedup_near_minhash."""
    from ..functions.minhash import minhash_band_stats

    return minhash_band_stats(
        table(spark, sf_dir, "documents"), n=3, num_perm=32, bands=8
    )


@declare(
    "embedding_norm_stats",
    oracle="""
    WITH v AS (SELECT label,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))) AS nrm
               FROM embeddings)
    SELECT label, COUNT(*) AS n,
           ROUND(AVG(nrm), 6) AS mean_norm,
           ROUND(MIN(nrm), 8) AS min_norm,
           ROUND(MAX(nrm), 8) AS max_norm,
           ROUND(quantile_cont(nrm, 0.5), 8) AS median_norm
    FROM v GROUP BY label
    """,
)
def embedding_norm_stats(spark, sf_dir):
    """Embedding hygiene: per-label L2-norm distribution (count, mean,
    min/max, median) — the sanity dashboard that catches un-normalized
    or degenerate vectors before they poison cosine search. Norms are
    the same sequential fold as every similarity query; one map-side
    projection plus a tiny per-label aggregate."""
    from ..functions.similarity import norm

    emb = table(spark, sf_dir, "embeddings")
    v = emb.select(
        "label", norm(F.col("embedding").cast("array<double>")).alias("nrm")
    )
    return v.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("nrm"), 6).alias("mean_norm"),
        F.round(F.min("nrm"), 8).alias("min_norm"),
        F.round(F.max("nrm"), 8).alias("max_norm"),
        F.round(F.expr("percentile(nrm, 0.5)"), 8).alias("median_norm"),
    )


#: shared by ann_join_ivf and ann_join_persisted — the persisted-cells
#: serve path is bit-identical by construction (same stored codebook,
#: same integer scores), so both declare the SAME DuckDB replay.
_ANN_JOIN_ORACLE = f"""
    WITH qn AS (SELECT vec_id, {_QV} AS qv FROM embeddings
                WHERE {_QDIR(_QV)}),
         cent AS (SELECT vec_id AS cent_id, qv AS cv
                  FROM qn WHERE vec_id % 2 = 0 AND vec_id < 32),
         c AS (SELECT vec_id AS cand_id, qv AS c_vec
               FROM qn WHERE vec_id % 2 = 0),
         q AS (SELECT vec_id AS query_id, qv AS q_vec
               FROM qn WHERE vec_id % 2 = 1),
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
    """


@declare("ann_join_ivf", oracle=_ANN_JOIN_ORACLE)
def ann_join_ivf(spark, sf_dir):
    """ANN JOIN — retrieval enrichment where the query side is a full
    table (every odd-id vector finds its top-3 even-id neighbors), not
    a broadcastable probe set. Both sides stay distributed: in-row
    centroid assignment on the corpus, in-row nprobe bucket explosion
    on the queries, cogrouped bucket matmuls — no collect of the query
    side anywhere (functions/similarity.ann_join_ivf). ``max_bucket``
    keeps the hot-centroid SALTING path on the driver's correctness
    gate, not just unit-pinned: buckets wider than 50 rows split into
    hash-salted sub-buckets, bit-identically (the oracle is the same
    either way)."""
    from ..functions.similarity import ann_join_ivf as _aj, has_quant_direction

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    # explicit codebook mirrors the oracle's cent CTE exactly: even ids
    # < 32 WITH a cosine direction — _quant_codebook fails loudly on a
    # zero-norm centroid, so the direction filter is load-bearing the
    # moment the corpus contains a zero vector at a codebook id
    codebook = corpus.filter(F.col("vec_id") < 32).filter(
        has_quant_direction(F.col("embedding"))
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("centroid"),
    )
    return _aj(
        corpus,
        emb.filter(F.col("vec_id") % 2 == 1),
        k=3,
        nprobe=4,
        codebook=codebook,
        max_bucket=50,
    )


@declare("ann_join_persisted", oracle=_ANN_JOIN_ORACLE)
def ann_join_persisted_q(spark, sf_dir):
    """The same full-table ANN join served from the PERSISTED cells
    (functions/ivf_index.ann_join_persisted): the corpus side's
    assignment + quantization were paid at build time; query rows take
    their probe buckets in-row against the stored codebook and meet the
    stored integer cells in the cogroup. Bit-identical to
    `ann_join_ivf` (same oracle, hash-adjudicated)."""
    import hashlib
    import os

    from ..functions.ivf_index import (
        ann_join_persisted, default_index_root, ivf_index_ensure,
    )
    from ..functions.similarity import has_quant_direction

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    # direction-filtered like ann_join_ivf's (and the oracle's cent CTE)
    codebook = corpus.filter(F.col("vec_id") < 32).filter(
        has_quant_direction(F.col("embedding"))
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("centroid"),
    )
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = ivf_index_ensure(
        corpus,
        os.path.join(default_index_root(), f"ivf_even_{tag}_c16"),
        n_centroids=16,
        codebook=codebook,
    )
    return ann_join_persisted(
        spark, idx, emb.filter(F.col("vec_id") % 2 == 1), k=3, nprobe=4
    )


@declare(
    "ann_join_ivfpq_persisted",
    oracle=f"""
    SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_results,
           TRUE AS corpus_quality_ok
    FROM embeddings WHERE vec_id % 2 = 1 AND {_QDIR(_QV)}
    """,
)
def ann_join_ivfpq_persisted_q(spark, sf_dir):
    """The full-table ANN join served from the persisted COMPRESSED
    layout (functions/ivf_index.ann_join_ivfpq_persisted): every odd-id
    vector finds its top-3 even-id neighbors by ADC over stored m-byte
    codes — both sides distributed (in-row probe explosion + cogrouped
    bucket LUT-gathers), no embedding read at serve time. Completes the
    serve matrix: {{topk, join}} × {{ivf, ivf-pq}} × {{in-query,
    persisted}}.

    PQ training is a float fixpoint, so the declared result is the
    index's deterministic CONTRACT: every query returns exactly k
    results, plus a corpus-level quality flag — the fraction of queries
    whose ADC top-3 intersects the exact brute-force top-10 must clear
    0.99 (measured: 1.0 at sf0.001/sf0.01, 0.998 at sf0.1 — 2 of 1,000
    odd queries genuinely land all-compressed-misses at this geometry,
    so a per-query flag would encode corpus noise, not index health;
    the rate is deterministic per corpus). Bit-identity of the
    underlying op with `ivfpq_persisted_topk` is pinned in
    tests/test_ivf_persisted.py."""
    import hashlib
    import os

    from ..functions.ivf_index import (
        ann_join_ivfpq_persisted, default_index_root, ivfpq_index_ensure,
    )
    from ..functions.pq import pq_train

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    queries = emb.filter(F.col("vec_id") % 2 == 1)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = ivfpq_index_ensure(
        corpus,
        os.path.join(default_index_root(), f"ivfpq_even_{tag}_c8"),
        books_factory=lambda: pq_train(corpus, m=32, k=16, iters=2),
        n_centroids=8,
        m=32,
        k=16,
    )
    adc = ann_join_ivfpq_persisted(
        spark, idx, queries, k=3, nprobe=4
    ).select("query_id", "cand_id")
    # One pass over the ADC output (round-11 optimization): the original
    # shape referenced `adc` from three places (hits inner-join, per-q
    # count, and the per-q frame again in the final crossJoin), and with
    # no common exchange between a (query_id, cand_id) join key and a
    # (query_id) aggregate key Spark re-executed the whole cogrouped ADC
    # subtree THREE times and the brute-force check once. A left join
    # against the exact top-10 marks hits in-line, one aggregate computes
    # (n_results, hit) per query, and the corpus-level 0.99 rate is an
    # unpartitioned window over the 1-row-per-query frame (bounded by the
    # query count — the same frame the crossJoin broadcast carried).
    # Equivalence: count over a left join against a unique (query_id,
    # cand_id) right side preserves the left multiplicity, max(coalesce(
    # __m, 0)) ≥ 1 iff the inner join would have found ≥ 1 hit, and
    # avg of identical 0.0/1.0 doubles is order-insensitive — the oracle
    # hash-adjudicates all three columns.
    from pyspark.sql import Window as _W

    exact = (
        cosine_topk(corpus, queries, k=10)
        .select("query_id", "cand_id")
        .withColumn("__m", F.lit(1))
    )
    per_q = (
        adc.join(exact, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_results"),
            F.max(F.coalesce(F.col("__m"), F.lit(0))).alias("__hit"),
        )
    )
    return per_q.withColumn(
        "corpus_quality_ok",
        F.avg(
            F.when(F.col("__hit") >= 1, 1.0).otherwise(0.0)
        ).over(_W.partitionBy())
        >= 0.99,
    ).select("query_id", "n_results", "corpus_quality_ok")


@declare(
    "diversity_sample_srp",
    oracle=f"""
    WITH {_srp_sql_ctes(10, 1, 64)}
    SELECT bh AS bucket, COUNT(*) AS n_members,
           MIN(vec_id) AS keep_id
    FROM bks GROUP BY bh
    """,
)
def diversity_sample_srp(spark, sf_dir):
    """SemDeDup-style diversity downsampling: partition embedding space
    into 2^10 SRP sign-buckets (one 10-bit band — buckets ARE coarse
    semantic cells) and keep one deterministic survivor per occupied
    cell. Coverage-preserving: every populated region of the space
    keeps a representative, dense regions collapse hardest — the
    curation complement of near-dup REMOVAL. Row-local signatures
    (Arrow int64 matmul), ONE bucket-keyed aggregate; survivor choice
    (min id) is reproducible in any engine. num_bits is the
    compression dial: +1 bit ≈ half the reduction ratio."""
    from ..functions.similarity import srp_buckets

    b = srp_buckets(table(spark, sf_dir, "embeddings"), 10, 1, 64)
    return b.groupBy(F.col("bh").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("vid").alias("keep_id"),
    )


@declare(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH RECURSIVE {_srp_sql_ctes(96, 16, 64, guard_zero=True)},
    cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
             FROM bks l JOIN bks r
               ON l.band = r.band AND l.bh = r.bh AND l.vec_id < r.vec_id),
    sc AS (SELECT a, b,
                  list_dot_product(x.qv, y.qv) /
                  (sqrt(list_dot_product(x.qv, x.qv)) *
                   sqrt(list_dot_product(y.qv, y.qv))) AS score
           FROM cand JOIN q x ON x.vec_id = a JOIN q y ON y.vec_id = b),
    pairs AS (SELECT a, b FROM sc WHERE score >= 0.4),
    edges AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b AS u, a AS v FROM pairs),
    reach(node, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node),
    cc AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT emb.vec_id,
           COALESCE(cc.component, emb.vec_id) AS canonical_id,
           (COALESCE(cc.component, emb.vec_id) = emb.vec_id) AS is_canonical
    FROM embeddings emb LEFT JOIN cc ON cc.node = emb.vec_id
    """,
)
def dedup_semantic_clusters(spark, sf_dir):
    """SemDeDup-style SEMANTIC dedup end-to-end: SRP-bucketed near-dup
    pairs (the dedup_near_embedding pipeline) fed into min-label
    connected components — every vector maps to its cluster's canonical
    survivor. The iteration moves ids only (two longs per edge,
    ids-only checkpoint); vectors are touched exactly once, in the
    bucketed pair kernel. The oracle replays pairs AND the component
    fixpoint (recursive CTE) — the embedding analog of
    dedup_canonical_docs."""
    from ..functions.similarity import srp_near_dup
    from ..operators.graph import dedup_canonical

    emb = table(spark, sf_dir, "embeddings")
    pairs = srp_near_dup(
        emb, num_bits=96, bands=16, threshold=0.4, dim=64
    ).select("a", "b")
    return dedup_canonical(emb, pairs, id_col="vec_id").select(
        F.col("doc_id").alias("vec_id"), "canonical_id", "is_canonical"
    )


@declare(
    "embedding_outliers",
    oracle=f"""
    WITH qn AS (SELECT vec_id, {_QV} AS qv FROM embeddings),
         cent AS (SELECT vec_id AS cent_id, qv AS cv
                  FROM qn WHERE vec_id < 16),
         asg AS (SELECT vec_id, qv, cent_id,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY {_IVF_COS("qv", "cv")} DESC, cent_id) AS rn,
                        {_IVF_COS("qv", "cv")} AS score
                 FROM qn CROSS JOIN cent),
         s AS (SELECT vec_id, cent_id, score FROM asg WHERE rn = 1),
         z AS (SELECT vec_id, cent_id, score,
                      (score - AVG(score) OVER (PARTITION BY cent_id))
                      / stddev_samp(score) OVER (PARTITION BY cent_id) AS zs
               FROM s)
    SELECT vec_id, cent_id, ROUND(score, 8) AS score,
           ROUND(zs, 4) AS z,
           CASE WHEN zs IS NOT NULL AND zs <= -2 THEN 1 ELSE 0 END AS is_outlier
    FROM z
    """,
)
def embedding_outliers(spark, sf_dir):
    """Embedding-space anomaly screen — the vector analog of the rule
    quality gate: each vector's cosine to its own cluster centroid,
    z-scored within the cluster; members ≥ 2σ below their cluster's
    typical similarity are flagged (mislabeled / corrupted / off-
    distribution embeddings, the pre-training hygiene pass). In-row
    assignment against the codebook literal (zero vector shuffle —
    same contract as sim_ivf_topk), one cent_id exchange shared by the
    mean and stddev windows."""
    from pyspark.sql import Window as W

    from ..functions.similarity import (
        _resolve_centroids, centroid_scores, nearest_centroid,
        qnorm, quant_vec,
    )

    emb = table(spark, sf_dir, "embeddings")
    rows = _resolve_centroids(emb, None, 16, "vec_id", "embedding")
    v = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("vec"),
        quant_vec(F.col("embedding")).alias("qv"),
    ).withColumn("qn", qnorm(F.col("qv")))
    scored = v.withColumn(
        "cent_id", nearest_centroid(F.col("vec"), rows)
    ).withColumn(
        "score",
        F.element_at(
            centroid_scores(F.col("qv"), F.col("qn"), rows),
            F.col("cent_id").cast("int") + 1,
        ),
    )
    wc = W.partitionBy("cent_id")
    z = (F.col("score") - F.avg("score").over(wc)) / F.stddev_samp(
        "score"
    ).over(wc)
    return scored.select(
        "vec_id",
        F.col("cent_id").cast("long").alias("cent_id"),
        F.round("score", 8).alias("score"),
        F.round(z, 4).alias("z"),
        F.when(z.isNotNull() & (z <= -2), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_outlier"),
    )
