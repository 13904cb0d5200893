"""Physical-plan regression tests — the SCALE.md claims, asserted.

Correctness tests prove the small-SF answer; these prove the *shape*
that survives 100 TB: broadcasts where a dimension is small, filters
pushed into the parquet scan, one exchange where one suffices, top-k
compiled to TakeOrderedAndProject instead of a global sort.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].builder(spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_star_join_broadcasts_dimensions(spark):
    """region_revenue: every dim join is broadcast — the fact table
    never shuffles for the join."""
    plan = plan_of(spark, "region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_filters_reach_the_scan(spark):
    """range_join_1h: the event_type predicates are pushed into the
    parquet scan on both sides."""
    plan = plan_of(spark, "range_join_1h")
    assert "EqualTo(event_type,purchase)" in plan
    assert "EqualTo(event_type,view)" in plan


def test_scan_prunes_columns(spark):
    """kpi_daily reads only ts+value+event_id from a 6-column table."""
    plan = plan_of(spark, "kpi_daily")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"ts", "value", "event_id"}


def test_window_suite_single_exchange(spark):
    """window_showcase: four analytic expressions share one Window node
    over one Exchange + one Sort."""
    plan = plan_of(spark, "window_showcase")
    # exactly one shuffle exchange and one Window operator
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\n\(\d+\) Window", plan)) == 1


def test_topk_avoids_global_sort(spark):
    """limit_topk: ORDER BY .. LIMIT k is TakeOrderedAndProject —
    per-partition heaps, no range-partition exchange."""
    plan = plan_of(spark, "limit_topk")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_matcher_one_exchange_per_side(spark):
    """match_start_end: per-side first-match dedup rides the same hash
    exchange as the join — two exchanges total (one per side)."""
    plan = plan_of(spark, "match_start_end")
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) <= 2


def test_kpi_partial_aggregation(spark):
    """kpi_daily: partial (map-side) + final HashAggregate around one
    exchange — input rows collapse before they shuffle."""
    plan = plan_of(spark, "kpi_daily")
    assert len(re.findall(r"\n\(\d+\) HashAggregate", plan)) == 2
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1


def test_q6_shape_single_pipelined_stage(spark):
    """revenue_forecast_delta: all predicates scan-pushed, 4-column read
    schema, one exchange (partial→final global agg)."""
    plan = plan_of(spark, "revenue_forecast_delta")
    for pushed in (
        "GreaterThanOrEqual(l_shipdate,",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThan(l_quantity,24.0)",
    ):
        assert pushed in plan, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1


def test_q3_topk_and_broadcasts(spark):
    """top_unshipped_orders: top-10 compiles to TakeOrderedAndProject
    (no single-partition window), segment filter is scan-pushed, and
    the filtered dims broadcast."""
    plan = plan_of(spark, "top_unshipped_orders")
    assert "TakeOrderedAndProject" in plan
    assert len(re.findall(r"\n\(\d+\) Window", plan)) == 0
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_doc_lm_score_three_corpus_passes(spark):
    """doc_lm_score: exactly THREE corpus passes — probe stream, the
    (w1,w2) count aggregate, and the vocabulary distinct. The prefix
    totals must come from a window over the count table (one
    vocabulary-sized exchange), never from a groupBy+join back, which
    re-ran the whole corpus count aggregate as a fourth pass."""
    plan = plan_of(spark, "doc_lm_score")
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 3, plan
    assert len(re.findall(r"\n\(\d+\) Window", plan)) == 1, plan


def test_grouping_sets_single_expand(spark):
    """kpi_grouping_sets: three grouping sets = ONE Expand + one
    aggregate exchange, not three scans."""
    plan = plan_of(spark, "kpi_grouping_sets")
    assert len(re.findall(r"\n\(\d+\) Expand", plan)) == 1
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 1


def test_streaks_reuse_user_partitioning(spark):
    """user_daily_streaks: the distinct, the window and the final agg
    all hash on user_id — at most two exchanges appear (distinct +
    window share; the (user, anchor) agg adds one)."""
    plan = plan_of(spark, "user_daily_streaks")
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) <= 2


def test_no_python_udfs_in_relational_plans(spark):
    """The reference-parity surface is 100% JVM expressions — no
    BatchEvalPython / ArrowEvalPython stages anywhere."""
    for name in (
        "kpi_daily", "match_start_end", "pricing_summary", "region_revenue",
        "cleaning_pipeline", "dedup_exact_text", "window_showcase",
        "asof_join", "sessionize", "dataset_split", "corpus_prep",
    ):
        plan = plan_of(spark, name)
        assert "EvalPython" not in plan, f"{name} crosses the Python boundary"


def test_q5_shape_one_shuffle_join_pair(spark):
    """local_supplier_volume: customer/supplier/nation/region all
    broadcast; the only shuffle join pair is lineitem x orders."""
    plan = plan_of(spark, "local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1


def test_q17_shape_no_aggregate_broadcast_back(spark):
    """small_qty_avg_revenue: the per-part cutoff is a window over the
    brand-reduced join output — a single hash-partitioned exchange, no
    join of lineitem against a lineitem-derived aggregate (which would
    not be broadcastable at scale)."""
    plan = plan_of(spark, "small_qty_avg_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"hashpartitioning\(l_partkey", plan)) >= 1


def test_q18_single_lineitem_pass(spark):
    """large_volume_customers (r11 shape): the HAVING aggregate IS the
    final per-order quantity, so lineitem is scanned and aggregated
    exactly once — no semi join back to the fact, no re-aggregate of
    raw line rows. One lineitem scan, one sum(l_quantity) aggregate."""
    plan = plan_of(spark, "large_volume_customers")
    assert "LeftSemi" not in plan, plan
    assert plan.count("lineitem.parquet") == 1, plan
    assert len(re.findall(r"partial_sum\(l_quantity", plan)) == 1, plan


def test_q19_part_disjunction_prunes_build_side(spark):
    """brand_discount_revenue: the part-only OR branches filter the
    broadcast build side before the hash table is built."""
    plan = plan_of(spark, "brand_discount_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the part scan carries the brand/size disjunction as a pushed filter
    assert re.search(r"PushedFilters: \[.*Or\(.*p_brand.*\]", plan) or "p_brand" in plan


def test_q22_anti_join(spark):
    """idle_rich_customers: NOT EXISTS compiles to a left-anti join on
    the date-pruned orders scan; the scalar average arrives by
    broadcast, not a per-row subquery."""
    plan = plan_of(spark, "idle_rich_customers")
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_kmeans_assignment_no_vector_shuffle(spark):
    """Cluster assignment scores every centroid inside the row: the
    plan is a pure projection — zero exchanges, zero joins — so no
    shuffle ever carries the embedding column (the k-fold vector
    blow-up of a join-based assignment can't exist)."""
    from real_time_trip_processing_spark.functions.kmeans import assign_clusters
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, SF_DIR, "embeddings")
    vecs = emb.selectExpr("vec_id AS vid", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    rows = [(i, [float(j == i) for j in range(64)]) for i in range(4)]
    df = assign_clusters(vecs, rows)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan


def test_ivf_no_exchange_carries_vectors(spark):
    """sim_ivf_topk: the corpus never shuffles — assignment is
    row-local, the probe table is the broadcast side, and the only
    hash-partitioned exchange is the final per-query top-k over
    (query_id, cand_id, score)."""
    plan = plan_of(spark, "sim_ivf_topk")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # every shuffle exchange must be the compact scored-rows one: no
    # exchange argument list may mention a vector column
    for m in re.finditer(r"\n\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan):
        cols = m.group(1)
        assert "c_vec" not in cols and "q_vec" not in cols, plan


def test_srp_fused_bucket_verify_shape(spark):
    """dedup_near_embedding: candidate generation and verification are
    fused into the per-bucket kernel — the plan has NO join of any kind
    (the pair-join flavor's bucket self-join, candidate distinct and
    two vector-attach joins are gone) and at most two shuffles: the
    bucket groupBy (which deliberately carries the 4-byte quantized
    vector — corpus·bands rows, never the quadratic pair stream) and
    the survivor distinct. No shuffle may carry the RAW embedding
    column."""
    plan = plan_of(spark, "dedup_near_embedding")
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    exchanges = re.findall(r"\n\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert len(exchanges) <= 2, plan
    for cols in exchanges:
        assert "embedding" not in cols and "va" not in cols and "vb" not in cols, plan
    assert "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan, plan


def test_decontaminate_fused_scan_no_shuffle(spark):
    """decontaminate_ngrams (arrow default): tokenize → shingle →
    membership → per-doc distinct-hit count fused into one kernel over
    the corpus scan — NO join and NO exchange of corpus rows anywhere
    in the plan (the bench gram set is a driver-side collect, bounded
    by the eval set)."""
    plan = plan_of(spark, "decontaminate_ngrams")
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert "MapInPandas" in plan, plan
    # corpus-side: scan → filter/project → kernel, zero exchanges
    assert "\n(1) Scan" in plan or "Scan parquet" in plan
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 0, plan


def test_decontaminate_builtin_bench_grams_broadcast(spark):
    """The Python-free fallback keeps the broadcast shape: grams built
    row-locally, benchmark gram set as the broadcast build side, every
    exchange carrying hit-grain rows only."""
    from real_time_trip_processing_spark.functions import curation as C
    from real_time_trip_processing_spark.sources import table

    df = C.ngram_decontaminate(
        table(spark, SF_DIR, "documents"),
        bench_pred=F.col("doc_id") % 97 == 0,
        n=4,
        impl="builtin",
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    exchanges = re.findall(
        r"\n\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan
    )
    assert len(exchanges) == 3, plan
    for cols in exchanges:
        assert "text#" not in cols and "pos#" not in cols, plan


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    join bucket-to-bucket: the sort-merge join runs with ZERO shuffle
    exchange — the hash partitioning was paid once at write time."""
    from real_time_trip_processing_spark.operators.maintenance import write_bucketed
    from real_time_trip_processing_spark.sources import table

    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    write_bucketed(
        li, "li_bkt", 4, ["l_orderkey"], ["l_orderkey"], path=str(tmp_path / "li")
    )
    write_bucketed(
        od, "od_bkt", 4, ["o_orderkey"], ["o_orderkey"], path=str(tmp_path / "od")
    )
    try:
        joined = (
            spark.table("li_bkt")
            .hint("merge")
            .join(
                spark.table("od_bkt"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan, plan
        # and it computes the same rows as the unbucketed join
        expect = li.join(od, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS od_bkt")


def test_srp_plan_builds_without_spark_job(spark):
    """srp_near_dup takes dim as a parameter — constructing the plan
    must trigger no Spark job (the round-1 shape ran a .first() per
    construction)."""
    from real_time_trip_processing_spark.functions.similarity import srp_near_dup
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, SF_DIR, "embeddings")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None) or []
    df = srp_near_dup(emb, num_bits=8, bands=4, threshold=0.4, dim=64)
    after = tracker.getJobIdsForGroup(None) or []
    assert len(after) == len(before), "plan construction ran a Spark job"
    assert df.columns == ["a", "b", "score"]


def test_dynamic_partition_pruning(spark, tmp_path):
    """A date-partitioned fact joined to a selectively-filtered dim
    prunes fact partitions at RUNTIME via dynamic partition pruning:
    the dim filter's values are broadcast into the fact scan's
    partition filters, so at 100 TB the scan touches only the matching
    date directories — static pushdown can't do this because the dates
    come from the other side of the join."""
    from real_time_trip_processing_spark.sources import table

    fact = table(spark, SF_DIR, "events").withColumn(
        "d", F.date_trunc("day", "ts").cast("string")
    )
    fact.write.partitionBy("d").mode("overwrite").parquet(str(tmp_path / "fact"))
    dim = (
        fact.select("d").distinct().limit(2)
        .withColumn("tag", F.lit("keep"))
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    dm = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("tag") == "keep")
    joined = f.join(dm, "d").groupBy("d").count()
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), plan


def test_shard_manifest_no_global_sort(spark):
    """The training-order manifest must NOT range-sort the corpus: shard
    assignment is map-side and positions are per-shard windows, so the
    only exchange is the hash partition on shard_id. A Sort node may
    exist only inside the window (per-partition), never a range
    exchange."""
    plan = plan_of(spark, "shard_manifest")
    assert "rangepartitioning" not in plan.lower(), plan
    import re as _re

    assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_dedup_incremental_hash_only_shuffles(spark):
    """Both sides hash map-side: every exchange key is the 32-byte
    text_hash, and no exchange row carries the document body."""
    plan = plan_of(spark, "dedup_incremental")
    import re as _re

    keys = _re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert keys, plan  # formatted mode puts partitioning on Arguments lines
    for k in keys:
        assert "text_hash" in k, k
    assert "rangepartitioning" not in plan, plan


def test_srp_incremental_fused_shape(spark):
    """The incremental embed screen (r11 fused shape): ONE bucket
    exchange feeding ONE MapInPandas block kernel — candidate pairs
    never exist as Spark rows, so there is no per-pair ArrowEvalPython,
    no vector-attach join after the kernel, and no candidate-distinct
    aggregate below it (the only distinct runs over the kernel's
    survivors). Guards the regression this replaced: the join flavor's
    cloned pair-score kernel and its two BroadcastHashJoins."""
    plan = plan_of(spark, "dedup_near_embedding_incremental")
    assert "MapInPandas" in plan, plan
    assert "ArrowEvalPython" in plan, plan  # the row-local sig kernel
    import re as _re

    # exactly one (band, bh) exchange below the kernel; the only other
    # exchange is the survivors' distinct
    bucket_ex = _re.findall(r"hashpartitioning\(band", plan)
    assert len(bucket_ex) == 1, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_random_projection_row_local(spark):
    """Dimensionality reduction is a pure projection over the scan —
    zero exchanges, zero joins; the plane matrix is one folded literal."""
    plan = plan_of(spark, "embedding_random_projection")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_winsorized_clip_broadcasts_percentiles(spark):
    """The percentile aggregate (~|event_type| rows) must come back by
    broadcast so the clip is map-side — the event-grain data shuffles
    only for the final partial aggregate."""
    plan = plan_of(spark, "winsorized_stats")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_semantic_decontaminate_zero_exchange(spark):
    """The eval set rides driver-side into the Arrow kernel and the
    per-candidate best-eval argmax happens in-batch — the plan is a
    pure scan→kernel projection: no join of any kind and ZERO
    exchanges (the corpus never shuffles; there is no top-1 window)."""
    plan = plan_of(spark, "decontaminate_semantic")
    assert "MapInPandas" in plan or "EvalPython" in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    import re as _re

    hash_ex = _re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert hash_ex == [], plan


# The EXACT set of queries whose plan legitimately contains a
# nested-loop/cartesian join — every one a bounded broadcast: either a
# 1-row scalar frame glued onto the stream (totals, thresholds,
# corpus-size N) or a handful of broadcast probe rows scored against
# the scan. Anything new landing here must justify itself.
_SCALAR_FRAME_JOINS = {
    "ann_join_ivfpq_persisted",   # 1-row corpus-quality flag broadcast
    "bloom_semi_join",            # 1-row Bloom-bitmap frame broadcast
    "bm25_search",                # 1-row N/avgdl stats frame broadcast
    "keyword_search",             # 1-row corpus-count frame broadcast
    "doc_lm_score",               # 1-row vocabulary-size frame broadcast
    "idle_rich_customers",        # Q22: scalar avg acctbal broadcast
    "important_parts",            # Q11-style: scalar value threshold
    "near_dup_rate",              # 1x1 totals x involved-count frames
    "promo_part_suppliers",       # scalar revenue threshold broadcast
    "referential_integrity",      # scalar violation-count frames
    "signup_to_purchase_latency", # 1x1 scalar latency frames
    "sim_ivf_recall",             # 1x1 expected-count x hit-count frames
    "sim_ivfpq_recall",           # 1x1 expected-count x hit-count frames
    "sim_pq_topk",                # 5 broadcast query-LUT rows x codes scan
    "tfidf_top_terms",            # corpus-size N scalar broadcast
    "weighted_sample",            # 1x1 totals frame
}


def test_registry_wide_plan_hygiene(spark):
    """EVERY declared query's physical plan, checked for the two global
    anti-patterns: row-at-a-time Python UDFs (BatchEvalPython — the
    Arrow boundary is allowed, the pickle boundary is not) and
    unexpected cartesian/nested-loop joins (allowed only for the
    whitelisted scalar-frame combinations, which are 1-row builds)."""
    offenders_udf, offenders_join = [], []
    for name in sorted(REGISTRY):
        plan = plan_of(spark, name)
        if "BatchEvalPython" in plan:
            offenders_udf.append(name)
        if (
            ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan)
            and name not in _SCALAR_FRAME_JOINS
        ):
            offenders_join.append(name)
    assert not offenders_udf, f"row-wise Python UDFs in: {offenders_udf}"
    assert not offenders_join, f"unexpected cartesian joins in: {offenders_join}"


def test_keyword_search_take_ordered(spark):
    """keyword_search / bm25_search: the top-20 is TakeOrderedAndProject
    (per-partition heaps), never a range-partitioned global sort."""
    for name in ("keyword_search", "bm25_search"):
        plan = plan_of(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "rangepartitioning" not in plan.lower(), name


def test_ann_join_cogroup_no_pair_rows(spark):
    """ann_join_ivf: candidate scoring is the cogrouped bucket kernel —
    no equi-join materializing per-candidate vector pairs, no cartesian
    anywhere, corpus assignment on the Arrow kernel."""
    plan = plan_of(spark, "ann_join_ivf")
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # pairs flavor would show one


def test_bloom_prefilter_sits_below_semi_join(spark):
    """bloom_semi_join: the bitmap bit tests run in a Filter on the
    probe scan side (map-side pruning BEFORE the semi join), and the
    verify join is a real left-semi."""
    plan = plan_of(spark, "bloom_semi_join")
    assert "LeftSemi" in plan
    assert "shiftright" in plan  # the bit test expression
    # the bit test must appear above the probe scan, not after the join:
    # in formatted explain the Filter node listing contains the test
    filt = [seg for seg in plan.split("\n\n") if "shiftright" in seg]
    assert filt, "bloom bit-test filter missing from the plan"


def test_pack_sequences_no_single_task_stream_window(spark):
    """The round-3 scale flaw, pinned closed on the declared BUCKETED
    query: the prefix sum must never run as
    Window.partitionBy(lang).orderBy(doc_id) over the full stream (ONE
    task sorts an entire language). The big window partitions by
    (lang, _bkt); the only lang-partitioned window runs over the tiny
    per-bucket subtotal frame (ordered by _bkt, bounded at n_buckets
    rows per stream)."""
    import re as _re

    plan = plan_of(spark, "pack_sequences_bucketed")
    # the hazardous shape: partition lang, order doc_id directly
    assert not _re.search(r"windowspecdefinition\(lang#\d+, doc_id#", plan), plan
    # the fixed shape: bucket in the partition spec ahead of doc_id
    assert _re.search(
        r"windowspecdefinition\(lang#\d+, _bkt#\d+, doc_id#", plan
    ), plan


def test_pack_sequences_auto_picks_single_window_below_crossover(spark):
    """n_buckets='auto' must take the cheap single-window branch at
    test scale (largest stream far below PACK_BUCKETED_CROSSOVER): no
    percentile-ladder machinery, no _bkt column in the plan — the
    fixed-overhead price of the distributed path is only paid when a
    stream is big enough to need it."""
    import re as _re

    plan = plan_of(spark, "pack_sequences")
    assert "_bkt" not in plan, plan
    assert _re.search(r"windowspecdefinition\(lang#\d+, doc_id#", plan), plan


def test_declare_rejects_duplicate_names():
    """Registry collisions must be loud: until round 7 two modules
    both declared `dataset_split` and import order silently picked the
    winner, shadowing the documented salted flavor. declare() now
    raises at import time instead."""
    from real_time_trip_processing_spark.plans.registry import REGISTRY, declare

    name = next(iter(REGISTRY))
    with pytest.raises(ValueError, match="collision"):
        declare(name)(lambda spark, sf_dir: None)


def test_both_dataset_split_flavors_declared():
    """The round-6 shadowing victim and its twin both exist under
    distinct names with full oracles."""
    for name in ("dataset_split", "dataset_split_by_source"):
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name
