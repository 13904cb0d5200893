"""Every declared query vs its DuckDB oracle at sf0.001 — the in-repo
mirror of the driver's correctness gate."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import compare, duck_con  # noqa: E402

from real_time_trip_processing_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, con, name):
    q = REGISTRY[name]
    spark_pdf = q.builder(spark, SF_DIR).toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only contract: must execute
        return
    duck_pdf = con.execute(q.oracle).fetchdf()
    issues = [i for i in compare(name, spark_pdf, duck_pdf) if not i.startswith("dtype note")]
    assert not issues, f"{name}: {issues}"


ZERO_VEC_QUERIES = [
    # every declared query whose Spark side excludes zero-quantized
    # vectors (has_quant_direction) — the oracle must replay the
    # exclusion (_QDIR) or the engines diverge the moment a corpus
    # contains one (ADVICE r6: masked until now only because the
    # driver testdata has no zero vectors).
    "sim_topk",
    "decontaminate_semantic",
    "dedup_near_embedding",
    "dedup_semantic_clusters",
    "sim_ivf_recall",
    "sim_ivfpq_recall",
    # round-7 second pass: the IVF/ANN family — a zero QUERY used to
    # CRASH the ann_join probe-selection expression under ANSI mode
    # (divide by its zero norm), and a zero candidate's NaN score could
    # surface in an under-full bucket's top-k
    "sim_ivf_topk",
    "sim_ivf_persisted",
    "sim_ivf_topk_trained",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "sim_ivfpq_persisted",
    "ann_join_ivf",
    "ann_join_persisted",
    "ann_join_ivfpq_persisted",  # round 8: compressed-cells join flavor
    "dedup_near_embedding_incremental",  # round 8: both sides guarded
    "knn_label_vote",
    # and ones whose Spark side does NOT exclude them (srp_buckets sign
    # bits are well-defined at zero; int8 quantization is row-local) —
    # pins that the guard was not blanket-applied where it would
    # WRONGLY drop rows.
    "dedup_near_embedding_lsh",
    "diversity_sample_srp",
    "embedding_quantize_int8",
]


@pytest.fixture(scope="module")
def zero_vec_sf_dir(tmp_path_factory):
    """A tiny embeddings corpus that CONTAINS zero-direction vectors:
    one exact zero and one below quantization resolution (both
    corpus-side ids — ivf centroids/probes stay clean, so the IVF
    builders run rather than raise)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(60, 64)).astype(np.float32)
    vecs[50] = 0.0                      # exact zero vector
    vecs[51] = np.float32(1e-9)        # quantizes to zero (sub-resolution)
    d = tmp_path_factory.mktemp("zerovec")
    tbl = pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(60)], pa.int32()),
    })
    papq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ZERO_VEC_QUERIES)
def test_oracle_parity_with_zero_vectors(spark, name, zero_vec_sf_dir):
    q = REGISTRY[name]
    spark_pdf = q.builder(spark, zero_vec_sf_dir).toPandas()
    duck_pdf = duck_con(zero_vec_sf_dir).execute(q.oracle).fetchdf()
    issues = [i for i in compare(name, spark_pdf, duck_pdf)
              if not i.startswith("dtype note")]
    assert not issues, f"{name}: {issues}"
    # the zero vectors must be absent from pair/score outputs but
    # PRESENT in the unguarded bucket diagnostics
    flat = spark_pdf.to_numpy().ravel().tolist()
    if name in ("sim_topk", "dedup_near_embedding"):
        assert 50 not in flat and 51 not in flat


@pytest.fixture(scope="module")
def zero_vec_low_id_sf_dir(tmp_path_factory):
    """The ADVICE-r7 corpus shape the high-id fixture deliberately
    dodged: zero-direction vectors at LOW ids — id 3 sits inside BOTH
    the default-codebook range (vec_id < 16) and the query range
    (vec_id < 5); id 12 inside the codebook range only. Before round 8
    the persisted builders resolved the default first-N codebook from
    the UNFILTERED corpus, so id 3 became a stored zero-norm centroid:
    probe-selection cosine divides by the centroid norm (ANSI crash /
    NaN ranking) and the persisted path diverged from the in-query
    path. Both sides now exclude zero-direction rows at codebook
    resolution (_resolve_centroids) and at kmeans init."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    rng = np.random.RandomState(11)
    vecs = rng.uniform(-1, 1, size=(60, 64)).astype(np.float32)
    vecs[3] = 0.0                   # exact zero: query + centroid range
    vecs[12] = np.float32(1e-9)     # sub-resolution zero: centroid range
    d = tmp_path_factory.mktemp("zerovec_lowid")
    tbl = pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(60)], pa.int32()),
    })
    papq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ZERO_VEC_QUERIES)
def test_oracle_parity_with_zero_vectors_at_low_ids(
    spark, name, zero_vec_low_id_sf_dir
):
    q = REGISTRY[name]
    spark_pdf = q.builder(spark, zero_vec_low_id_sf_dir).toPandas()
    duck_pdf = duck_con(zero_vec_low_id_sf_dir).execute(q.oracle).fetchdf()
    issues = [i for i in compare(name, spark_pdf, duck_pdf)
              if not i.startswith("dtype note")]
    assert not issues, f"{name}: {issues}"
    # zero vectors excluded from pair/score outputs even when they sit
    # in the codebook/query id ranges (only id columns — low ids like 3
    # legitimately appear as rank values)
    id_cols = [c for c in spark_pdf.columns
               if c.endswith("_id") or c in ("vec_id", "left", "right")]
    ids = spark_pdf[id_cols].to_numpy().ravel().tolist() if id_cols else []
    if name in ("sim_topk", "dedup_near_embedding"):
        assert 3 not in ids and 12 not in ids
