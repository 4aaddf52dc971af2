"""Physical-plan assertions: the scale properties (pushdown, pruning,
broadcast, partial aggregation) must actually appear in the executed plans,
not just in design notes. Guards against plan regressions."""

from __future__ import annotations

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_column_pruning(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["q1_pricing_summary"](spark, SF_DIR))
    # shipdate filter reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # scan reads only the referenced columns, not all 16 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema
    # partial aggregation before the exchange (map-side combine)
    assert "partial_sum" in plan or "partial_avg" in plan


def test_join_5way_broadcasts_dims(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["join_inner_5way"](spark, SF_DIR))
    # small dimensions must broadcast — a shuffle join of nation/region
    # against the fact table would be a 100 TB-scale bug
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_group_by_range_single_window_no_extra_shuffle(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["range_15m_fill_linear"](spark, SF_DIR))
    # fill scaffold joins broadcast; the only wide ops are the bucket agg
    # exchange and the (tiny, lattice-sized) window sort
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange") <= 3


def test_topk_uses_take_ordered(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["sort_topk"](spark, SF_DIR))
    # ORDER BY + LIMIT must compile to TakeOrdered (per-partition top-k +
    # merge), never a global sort
    assert "TakeOrderedAndProject" in plan


def test_asof_join_is_single_sort(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["asof_join_users"](spark, SF_DIR))
    # the union-scaffold as-of join: one window, no nested-loop join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_match_recognize_simple_pattern_compiles_to_jvm(spark):
    """Single-variable patterns (the spikes shape) take the JVM fast
    path: pure window/filter plan, NO Python worker node anywhere."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["match_recognize_spikes"](spark, SF_DIR))
    assert "FlatMapGroupsInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan  # lag + row_number execute as window exec


def test_match_recognize_nfa_fans_out_all_cores(spark, catalog):
    """Patterns beyond the fast path (quantifiers/sequences) stay on the
    NFA — the Python slow path must keep an explicit-numPartitions
    repartition (REPARTITION_BY_NUM), which AQE never coalesces — without
    it the tiny-by-bytes shuffle collapses onto a few cores (observed 4x
    wall-clock on events at sf0.1)."""
    from griddb_spark.operators import match_recognize

    ev = catalog.load("events")
    # UP+ DOWN with PREV-based defines is row-DISJOINT, so since r6 it
    # compiles to the two-var window fast path — no Python node at all
    fast = match_recognize(
        ev,
        pattern="UP+ DOWN",
        define={"UP": "value > PREV(value)", "DOWN": "value < PREV(value)"},
        measures={"peak": "LAST(value)"},
        partition_by=["user_id"],
        order_by="ts",
    )
    assert "FlatMapGroupsInPandas" not in _plan(fast)
    # three-variable sequences stay on the NFA and must fan out
    df = match_recognize(
        ev,
        pattern="UP+ DOWN+ UP2",
        define={"UP": "value > PREV(value)", "DOWN": "value < PREV(value)",
                "UP2": "value > PREV(value)"},
        measures={"peak": "LAST(value)"},
        partition_by=["user_id"],
        order_by="ts",
    )
    plan = _plan(df)
    assert "REPARTITION_BY_NUM" in plan, plan
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan


def test_block_pair_kernels_fan_out(spark):
    """GEMM block-pair kernels (cosine all-pairs) are compute-bound with
    tiny shuffle bytes — the explicit repartition on (pa, pb) must survive
    into the executed plan."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_dedup_embed_cosine"](spark, SF_DIR))
    assert "REPARTITION_BY_NUM" in plan, plan


def test_shingle_filter_stays_above_exchange(spark):
    """minhash's pre-shingle filter must be a cheap source-column predicate
    below the exchange; the shingle transform itself must NOT appear in
    the scan-stage Filter (predicate pushdown would re-evaluate it on the
    narrow pre-repartition side). Inspects the un-checkpointed shingle
    stage — minhash_lsh_pairs materializes it eagerly, after which the
    lineage (and so the plan) is truncated."""
    from pyspark.sql import functions as F

    from griddb_spark.catalog import ContainerCatalog
    from griddb_spark.pipeline.dedup import hashed_shingles

    import re

    docs = ContainerCatalog(spark, SF_DIR).load("documents")
    plan = _plan(hashed_shingles(docs, "doc_id", "text"))
    data_filters = re.findall(r"DataFilters: \[([^\]]*)\]", plan)
    assert data_filters
    # the expensive per-row shingle builder (slice+concat_ws loop) must not
    # be evaluated in any scan-side filter — only the cheap token-count
    # predicate may push down
    for df_ in data_filters:
        assert "concat_ws" not in df_ and "array_distinct" not in df_, df_


def test_multimodal_stages_fan_out_and_prune(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_multimodal_resize"](spark, SF_DIR))
    # blobs decode in Python — the stage must fan out across cores, not
    # run in the single-file scan partition
    assert "MapInPandas" in plan
    assert "REPARTITION_BY_NUM" in plan or "hashpartitioning" in plan
    # only the columns the stage needs reach the scan (text -> media),
    # never the full documents row
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read_schema and "source" not in read_schema

    plan_f = _plan(workload.QUERIES["pipe_multimodal_frames"](spark, SF_DIR))
    assert "MapInPandas" in plan_f


def test_repetition_stats_scan_fused_no_shuffle(spark):
    """Repetition signals are per-row expressions: the plan must be a
    pruned scan + projections — zero aggregation exchanges beyond the
    explicit spread repartition."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_quality_repetition"](spark, SF_DIR))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "source" not in read_schema
    assert "HashAggregate" not in plan  # no agg — pure map stage
    assert plan.count("Exchange") <= 1  # only the explicit core-spread


def test_sessionize_two_narrow_shuffles(spark):
    """Gaps-and-islands sessionization: one hash exchange on the key
    reused by both the window sort and the final groupBy — AQE/planner
    must not add a second wide exchange."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["sessionize_events"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan


def test_embed_normalize_scan_prunes_to_used_columns(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_embed_normalize"](spark, SF_DIR))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "embedding" in read_schema and "label" not in read_schema


def test_cms_partial_aggregation_bounds_shuffle(spark):
    """The count-min register aggregation must map-side combine: the
    exchange then carries at most depth*width partial counters per task."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_sketch_cms"](spark, SF_DIR))
    assert "partial_count" in plan
    # the probe side reads the tiny sketch via broadcast, never a shuffle
    assert "BroadcastHashJoin" in plan


def test_bloom_contamination_broadcasts_bit_set(spark):
    """The bloom bit-set (<= m rows) must broadcast; the corpus gram side
    never shuffles for the membership test."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_decontam_bloom"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_span_dedup_no_cartesian_two_keyed_exchanges(spark):
    """Global span dedup = rank exchange keyed by span hash + reassembly
    exchange keyed by doc — and nothing quadratic."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_dedup_spans"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") >= 2


def test_embed_canonical_anti_join_broadcasts_losers(spark):
    """End-to-end embedding dedup: the corpus-side anti-join against the
    (tiny) loser list must be a broadcast join, corpus scanned once."""
    from griddb_spark import workload

    plan = _plan(
        workload.QUERIES["pipe_dedup_embed_canonical"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_q6_predicates_reach_scan_no_join(spark):
    """TPC-H Q6: every predicate pushed to the reader, no exchange except
    the final single-row reduce."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["q6_forecast_revenue"](spark, SF_DIR))
    # the full filter set reaches the scan as data filters (the plan
    # string truncates the PushedFilters list, so assert on DataFilters)
    assert "DataFilters: [isnotnull(l_shipdate" in plan
    assert "(l_shipdate" in plan.split("DataFilters:")[1]
    assert "Join" not in plan


def test_q5_snowflake_broadcasts_all_dims(spark):
    """TPC-H Q5: supplier/nation/region broadcast; only the fact-side
    joins shuffle."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["q5_local_supplier"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_curation_report_broadcasts_flag_lists(spark):
    """The curation report's loser/contaminated flags must arrive as
    broadcast joins — the corpus is scanned once, never shuffled for the
    flag lookups."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_curation_report"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_tpch_suite_no_cartesian_dims_broadcast(spark):
    """The new TPC-H shapes: every dimension side must broadcast (or at
    least never degrade to a cartesian/nested-loop), and the correlated
    scalar-subquery folds (q2/q17) must stay equi-joins."""
    from griddb_spark import workload

    for q in ("q2_min_cost_supplier", "q8_market_share",
              "q9_product_profit", "q11_important_stock",
              "q12_shipmode_priority", "q15_top_supplier",
              "q16_parts_supplier", "q17_small_quantity",
              "q19_disjunctive_revenue", "q20_promotion_parts",
              "q21_waiting_supplier"):
        plan = _plan(workload.QUERIES[q](spark, SF_DIR))
        assert "CartesianProduct" not in plan, q
        # q12/q21/q11/q15 legitimately carry one broadcast-NLJ for the
        # single-row scalar (cross join of an aggregate); anything else
        # with a nested loop is a planning bug
        if q not in ("q11_important_stock", "q15_top_supplier"):
            assert "BroadcastNestedLoopJoin" not in plan, q
    p8 = _plan(workload.QUERIES["q8_market_share"](spark, SF_DIR))
    assert p8.count("BroadcastHashJoin") >= 4  # dims all broadcast


def test_leading_hint_pins_join_order(spark, catalog):
    """/*+ Leading(...) */ must actually change the Catalyst join tree:
    the hinted leading table heads the left-deep chain (Catalyst keeps
    syntactic join order absent cost-based reordering)."""
    from griddb_spark.sql.translate import griddb_sql

    q = ("SELECT /*+ Leading({order}) */ count(*) AS n "
         "FROM customer, orders, lineitem "
         "WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey")

    def first_table(sql):
        plan = griddb_sql(
            spark, catalog, sql
        )._jdf.queryExecution().optimizedPlan().toString()
        # relations print as `Relation [l_orderkey...] parquet` — identify
        # each table by its column prefix, in tree (join) order
        pos = {t: plan.find(f"Relation [{p}_")
               for t, p in (("customer", "c"), ("orders", "o"),
                            ("lineitem", "l"))}
        assert all(p >= 0 for p in pos.values())
        return min(pos, key=pos.get)

    assert first_table(q.format(order="lineitem orders customer")) == "lineitem"
    assert first_table(q.format(order="customer orders lineitem")) == "customer"


def test_assign_clusters_is_shuffle_free(spark):
    """Nearest-centroid assignment must be a pure projection: literal
    centroids + higher-order-function cosines + struct argmax — NO
    Exchange in the physical plan (at 100 TB it pipelines into the scan)."""
    from griddb_spark import workload
    from griddb_spark.pipeline import assign_clusters, kmeans_fit

    emb = workload.cat(spark, SF_DIR).load("embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=1)
    plan = _plan(assign_clusters(emb, cents).select("vec_id", "cluster"))
    assert "Exchange" not in plan
    # the large-k Arrow GEMM path is a projection too
    cents20 = kmeans_fit(emb, "vec_id", "embedding", k=20, iters=1)
    assert len(cents20) > 16
    plan20 = _plan(assign_clusters(emb, cents20).select("vec_id", "cluster"))
    assert "Exchange" not in plan20 and "ArrowEvalPython" in plan20


def test_table_row_count_hint_forces_broadcast(spark):
    """/*+ TableRowCount(nation, 25) */ must surface as a BroadcastHashJoin
    with nation on the build side (the reference uses the hinted count to
    pick the small/driving join side; Spark's analogue is broadcast)."""
    from griddb_spark import workload

    plan = _plan(
        workload.QUERIES["sql_frontend_row_count_hint"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q7_broadcasts_dims_and_pushes_nation_pair(spark):
    """q7's nation-pair literals must reach the nation scans (dim
    pre-filter before the fact chain) and every dim join must broadcast —
    no dim table may degrade to a sort-merge join."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["q7_volume_shipping"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3  # cn, sn, supplier-side
    assert "In(n_name, [NATION_1,NATION_2])" in plan or \
           "In(n_name, [NATION_1, NATION_2])" in plan
    # the shipdate range is pushed into the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_inverted_index_truncates_before_collect(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_inverted_index"](spark, SF_DIR))
    # two keyed shuffles total: the (doc,term) tf combine and the term
    # window; the final group reuses the term partitioning (no 3rd
    # exchange), so the rank filter provably runs BEFORE collect_list
    assert plan.count("Exchange hashpartitioning") <= 2


def test_bm25_broadcasts_stats_and_dfreq(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_bm25_search"](spark, SF_DIR))
    # query-term doc frequencies join broadcast; corpus stats ride a
    # broadcast 1-row nested loop; never a shuffled cartesian
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_gopher_rules_scan_fused_no_shuffle(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_quality_gopher"](spark, SF_DIR))
    # the whole rule battery is per-row column math: zero wide ops
    assert "Exchange" not in plan


def test_pq_encode_is_pure_projection(spark):
    from griddb_spark import workload
    from griddb_spark.pipeline import pq_encode, pq_train

    emb = workload.cat(spark, SF_DIR).load("embeddings")
    books = pq_train(emb, "vec_id", "embedding", in_dim=64, m=4, k=8)
    plan = _plan(pq_encode(emb, "vec_id", "embedding", books))
    # codebooks are literals: encoding must not shuffle or join
    assert "Exchange" not in plan and "Join" not in plan


def test_weighted_fixed_k_global_is_take_ordered(spark):
    from griddb_spark import workload
    from griddb_spark.pipeline import weighted_fixed_k

    docs = workload.cat(spark, SF_DIR).load("documents")
    plan = _plan(
        weighted_fixed_k(docs.select("doc_id", "n_chars"), "doc_id",
                         "n_chars", k=10)
    )
    # global top-k must be per-partition + merge, never a full sort
    assert "TakeOrderedAndProject" in plan


def test_dsir_broadcasts_weight_table(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_dsir_select"](spark, SF_DIR))
    # the 512-row bucket-weight table joins broadcast; top-k is
    # TakeOrdered
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_random_project_gemm_no_shuffle(spark):
    from griddb_spark import workload
    from griddb_spark.pipeline import random_project

    emb = workload.cat(spark, SF_DIR).load("embeddings")
    plan = _plan(random_project(emb, "vec_id", "embedding", 64, 16))
    assert "Exchange" not in plan


def test_kmv_partial_max_combines_before_exchange(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_sketch_kmv"](spark, SF_DIR))
    # the distinct on (group, hash) must partially aggregate map-side so
    # the exchange carries combined registers, not raw rows
    assert "partial" in plan.lower()


def test_write_curated_broadcasts_drop_set_not_keep_set(spark):
    """VERDICT r5 #1: the curated-publish join must broadcast the small
    DROP-set as a left-anti build side — broadcasting the keep-set (the
    majority of the corpus) is a driver-killer at 100 TB."""
    from pyspark.sql import functions as F

    from griddb_spark import workload
    from griddb_spark.pipeline.dedup import _anti_join_losers

    report = workload.QUERIES["pipe_curation_report"](spark, SF_DIR)
    drop = report.filter(F.col("keep") == 0).select("doc_id")
    docs = workload.cat(spark, SF_DIR).load("documents")
    kept = _anti_join_losers(
        docs.filter(F.col("doc_id") % 41 != 0), drop, "doc_id"
    )
    plan = _plan(kept)
    # anti-join against the drop list, broadcast build side = drop side
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    # the old corpus-scale shape: a keep-set broadcast left-semi
    assert "LeftSemi" not in plan


def test_ivfpq_batch_single_join_tree_no_union(spark):
    """VERDICT r5 #3: batch ANN serving must be ONE join tree — the
    point-probe form folds a plan branch per query with unionAll, which
    is O(|queries|) driver-built branches at a 10^4-query batch."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["pipe_ann_ivfpq_batch"](spark, SF_DIR))
    assert "Union" not in plan
    # probe routing and LUT both arrive as broadcast joins
    assert "BroadcastHashJoin" in plan


def test_ivfpq_index_probe_is_partition_pruned(spark, tmp_path):
    """A probe against the persisted IVF-PQ index must read only the
    probed cell directories: the cluster filter lands in the scan's
    PartitionFilters, not as a post-scan Filter over a full read."""
    from pyspark.sql import functions as F

    from griddb_spark import workload
    from griddb_spark.pipeline import ivfpq_index_topk, ivfpq_index_write

    emb = workload.cat(spark, SF_DIR).load("embeddings")
    path = str(tmp_path / "idx")
    ivfpq_index_write(emb, path, "vec_id", "embedding", in_dim=64,
                      coarse_k=8, m=4, k=8)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    out = ivfpq_index_topk(spark, path, qdf, nprobe=2, topk=5)
    plan = _plan(out)
    seg = plan.split("PartitionFilters:")
    assert len(seg) > 1 and "cluster" in seg[1].splitlines()[0]
    assert "Union" not in plan  # one join tree, batch formulation


def test_range_join_is_equi_join_not_nested_loop(spark, catalog):
    """The bucketed interval join must plan as a hash equi-join on the
    bucket key — never BroadcastNestedLoopJoin or a cartesian product
    (the non-equi-join scale trap it exists to avoid). Left-join variant
    included."""
    from pyspark.sql import functions as F

    from griddb_spark.operators import range_join

    ev = catalog.load("events")
    wins = ev.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("win_id"),
        F.col("ts").alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("we"),
    )
    for how in ("inner", "left"):
        j = range_join(ev.select("ts", "user_id"), wins, "ts", "ws", "we",
                       bucket_sec=3600, how=how)
        plan = _plan(j)
        assert "BroadcastNestedLoopJoin" not in plan, how
        assert "CartesianProduct" not in plan, how
        assert "Join" in plan, how


def test_range_join_left_keeps_unmatched_points(spark, catalog):
    from pyspark.sql import functions as F

    from griddb_spark.operators import range_join

    ev = catalog.load("events").select("ts", "user_id").limit(2000)
    n_points = ev.count()
    wins = ev.limit(1).select(
        F.lit(1).alias("win_id"),
        F.col("ts").alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 1 MINUTE")).alias("we"),
    )
    inner = range_join(ev, wins, "ts", "ws", "we", how="inner")
    left = range_join(ev, wins, "ts", "ws", "we", how="left")
    n_inner, n_left = inner.count(), left.count()
    assert n_points > 0 and n_left >= n_points  # every point survives
    assert 0 < n_inner < n_points  # the 1-minute window matches a strict subset
    assert left.filter(F.col("win_id").isNull()).count() == n_left - n_inner


def test_bucketed_join_has_no_exchange_on_join_inputs(spark):
    """Bucketed tables co-locate the join: both scans read Bucketed: true
    and the sort-merge join takes ZERO exchange on either input — the
    only Exchange left is the final groupBy on a different key."""
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["join_bucketed_colocated"](spark, SF_DIR))
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    # exactly one exchange: the post-join aggregation on c_mktsegment
    assert plan.count("Exchange") == 1, plan


def test_range_join_matches_naive_on_random_intervals(spark):
    """Property check: bucketed range_join == the naive nested-loop
    BETWEEN join on random points/intervals (including empty, instant,
    multi-bucket, and overlapping intervals)."""
    import random

    from pyspark.sql import functions as F

    from griddb_spark.operators import range_join

    rng = random.Random(7)
    base = 1_704_067_200  # epoch seconds
    pts = [(i, base + rng.randint(0, 50_000)) for i in range(300)]
    ivs = []
    for w in range(40):
        s = base + rng.randint(0, 50_000)
        ivs.append((w, s, s + rng.choice([0, 30, 3_600, 10_000, 40_000])))
    p = spark.createDataFrame(pts, "pid int, sec long").select(
        "pid", F.timestamp_seconds("sec").alias("ts"))
    iv = spark.createDataFrame(ivs, "win int, s long, e long").select(
        "win", F.timestamp_seconds("s").alias("ws"),
        F.timestamp_seconds("e").alias("we"))
    got = sorted(
        (r.pid, r.win)
        for r in range_join(p, iv, "ts", "ws", "we", bucket_sec=3600).collect()
    )
    want = sorted(
        (pid, w) for pid, sec in pts for w, s, e in ivs if s <= sec <= e
    )
    assert got == want and len(want) > 0


def test_zorder_expr_matches_python_reference(spark):
    """Property check: the Morton interleave Column == a plain-Python
    bit-interleave on random values (including range extremes)."""
    import random

    from pyspark.sql import functions as F

    from griddb_spark.dml import zorder_expr

    rng = random.Random(11)
    rows = [(i, rng.randint(-50, 950), rng.randint(3, 77)) for i in range(400)]
    rows += [(1000, -50, 3), (1001, 950, 77)]  # extremes
    df = spark.createDataFrame(rows, "i int, x long, y long")
    bits = 6
    z = zorder_expr([(F.col("x"), -50, 950), (F.col("y"), 3, 77)], bits=bits)
    got = {r.i: r.z for r in df.select("i", z.alias("z")).collect()}

    def ref(x, y):
        out = 0
        for d, (v, mn, mx) in enumerate([(x, -50, 950), (y, 3, 77)]):
            b = max(0, min((1 << bits) - 1,
                           (v - mn) * (1 << bits) // (mx - mn + 1)))
            for k in range(bits):
                out |= ((b >> k) & 1) << (k * 2 + d)
        return out

    for i, x, y in rows:
        assert got[i] == ref(x, y), (i, x, y, got[i], ref(x, y))


def test_no_index_scan_hint_blocks_pushdown(spark, catalog):
    """/*+ NoIndexScan(t) */ (sql_compiler.h:44-45, applyScanOption
    sql_compiler.cpp:10128-10138) forces the full-scan posture: the
    predicate must NOT reach the parquet scan (PushedFilters empty — no
    row-group/page skipping), results identical, and the effect is
    statement-scoped (the next plain statement pushes down again).
    IndexScan(t) is the default posture and strips to a no-op."""
    import re

    from griddb_spark.sql.translate import griddb_sql

    q = ("SELECT {hint}o_orderstatus, count(*) AS n FROM orders "
         "WHERE o_totalprice > 150000 GROUP BY o_orderstatus")

    def run(sql):
        d = griddb_sql(spark, catalog, sql)
        pushed = re.findall(
            r"PushedFilters: \[([^\]]*)\]",
            d._jdf.queryExecution().toString(),
        )
        return pushed, d

    plain_f, plain = run(q.format(hint=""))
    assert any("o_totalprice" in f for f in plain_f)
    hint_f, hinted = run(q.format(hint="/*+ NoIndexScan(orders) */ "))
    assert not any("o_totalprice" in f for f in hint_f)
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, hinted.collect()))
    after_f, _ = run(q.format(hint=""))
    assert any("o_totalprice" in f for f in after_f)
    idx_f, _ = run(q.format(hint="/*+ IndexScan(orders) */ "))
    assert any("o_totalprice" in f for f in idx_f)


def test_index_join_hint_flips_physical_strategy(spark, catalog):
    """/*+ IndexJoin(a b) */ / /*+ NoIndexJoin(a b) */ (sql_compiler.h:
    47-48, findJoinMethodHint sql_compiler.cpp:10217-10221): the
    index-nested-loop analog is a hash-lookup join, so IndexJoin pins
    ShuffledHashJoin on the inner side and NoIndexJoin pins SortMergeJoin
    — both overriding the default broadcast choice for the pair, results
    identical."""
    from griddb_spark.sql.translate import griddb_sql

    q = ("SELECT {hint}c_mktsegment, count(*) AS n "
         "FROM orders JOIN customer ON o_custkey = c_custkey "
         "GROUP BY c_mktsegment")

    def run(sql):
        d = griddb_sql(spark, catalog, sql)
        return d._jdf.queryExecution().executedPlan().toString(), d

    merge_p, merge_d = run(q.format(hint="/*+ NoIndexJoin(orders customer) */ "))
    assert "SortMergeJoin" in merge_p, merge_p
    hash_p, hash_d = run(q.format(hint="/*+ IndexJoin(orders customer) */ "))
    assert "ShuffledHashJoin" in hash_p, hash_p
    assert sorted(map(tuple, merge_d.collect())) == \
        sorted(map(tuple, hash_d.collect()))


def test_index_join_hint_multiple_pairs(spark, catalog):
    """GridDB consumes one (No)IndexJoin hint per table PAIR
    (sql_compiler.cpp:10217 findJoinMethodHint) — a statement carrying two
    hints must map BOTH (ADVICE r7: pat.search took only the first)."""
    from griddb_spark.sql.translate import _apply_index_join

    q = ("SELECT /*+ IndexJoin(orders customer) */ "
         "/*+ IndexJoin(lineitem orders) */ c_mktsegment, count(*) AS n "
         "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
         "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment")
    out = _apply_index_join(q)
    assert "SHUFFLE_HASH(customer)" in out
    assert "SHUFFLE_HASH(orders)" in out
    assert "IndexJoin" not in out.replace("SHUFFLE_HASH", "")


def test_no_index_scan_hint_on_group_by_range(spark, catalog):
    """A (No)IndexScan hint on a GROUP BY RANGE statement must parse
    (hints now extract before dispatch) and honor the full-scan barrier,
    values identical to the unhinted statement."""
    from griddb_spark.sql.translate import griddb_sql

    q = ("SELECT {hint}avg(value) AS avg_value FROM events "
         "WHERE ts BETWEEN TIMESTAMP('2024-01-01T00:00:00Z') AND "
         "TIMESTAMP('2024-01-01T02:00:00Z') "
         "GROUP BY RANGE(ts) EVERY(15, MINUTE)")
    plain = griddb_sql(spark, catalog, q.format(hint=""))
    hinted = griddb_sql(
        spark, catalog, q.format(hint="/*+ NoIndexScan(events) */ "))
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, hinted.collect()))


def test_no_index_scan_barrier_is_statement_local(spark, catalog):
    """The NoIndexScan barrier must never replace the session-global view:
    mid-flight and after, the plain view name still plans WITH pushdown,
    and no barrier temp view survives the statement."""
    import re

    from griddb_spark.sql.translate import griddb_sql

    griddb_sql(
        spark, catalog,
        "SELECT /*+ NoIndexScan(orders) */ count(*) AS n FROM orders "
        "WHERE o_totalprice > 150000",
    )
    # session view untouched: a plain statement pushes the predicate down
    d = spark.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > 150000")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]",
                        d._jdf.queryExecution().toString())
    assert any("o_totalprice" in f for f in pushed)
    leftovers = [t.name for t in spark.catalog.listTables()
                 if "__noidxscan_" in t.name]
    assert not leftovers, leftovers


def test_adc_lut_join_stats_dispatch(spark, catalog, monkeypatch):
    """Batch ANN serving (VERDICT r7 item 5): the m·k·|queries| ADC LUT
    broadcasts below ADC_LUT_BROADCAST_MAX_ROWS and switches to a
    shuffle hash join above it (both sides co-partitioned on
    (q_id, subspace, code)) — values identical either way."""
    from griddb_spark.pipeline import similarity as S

    emb = catalog.load("embeddings").filter("vec_id < 64")
    qdf = emb.filter("vec_id < 8").selectExpr(
        "vec_id AS q_id", "embedding AS qv")

    def run():
        d = S.ivfpq_topk_batch(
            emb, "vec_id", "embedding", in_dim=64, queries=qdf,
            coarse_k=2, m=4, k=4, nprobe=2, topk=3)
        plan = d._jdf.queryExecution().executedPlan().toString()
        return plan, sorted(map(tuple, d.collect()))

    bcast_plan, bcast_rows = run()
    assert "BroadcastHashJoin" in bcast_plan
    monkeypatch.setattr(S, "ADC_LUT_BROADCAST_MAX_ROWS", 1)
    shuf_plan, shuf_rows = run()
    assert "ShuffledHashJoin" in shuf_plan
    assert bcast_rows == shuf_rows


def test_cost_based_hint_family(spark, catalog):
    """/*+ (No)CostBasedJoinDriving/Join/IndexScan() */
    (sql_compiler.h:55-60, 5.9 cost-based index scan): statement-scoped
    optimizer-strategy flips — NoCostBasedJoinDriving pins the static
    (rule-based) plan with NO AdaptiveSparkPlan node, values identical,
    and every session conf is restored afterwards."""
    from griddb_spark.sql.translate import griddb_sql

    before = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.adaptive.enabled", "spark.sql.cbo.enabled",
                  "spark.sql.optimizer.dynamicPartitionPruning.enabled")
    }
    q = ("SELECT {h}c_mktsegment, count(*) AS n "
         "FROM orders JOIN customer ON o_custkey = c_custkey "
         "GROUP BY c_mktsegment")

    def run(h):
        d = griddb_sql(spark, catalog, q.format(h=h))
        plan = d._jdf.queryExecution().executedPlan().toString()
        return plan, sorted(map(tuple, d.collect()))

    plain_p, plain_r = run("")
    assert "AdaptiveSparkPlan" in plain_p
    rb_p, rb_r = run("/*+ NoCostBasedJoinDriving() */ ")
    assert "AdaptiveSparkPlan" not in rb_p
    assert rb_r == plain_r
    cb_p, cb_r = run("/*+ CostBasedJoin() CostBasedIndexScan() */ ")
    assert cb_r == plain_r
    after = {k: spark.conf.get(k, None) for k in before}
    assert after == before, (before, after)


def test_cost_hint_on_group_by_range(spark, catalog):
    """A (No)CostBased* hint on a GROUP BY RANGE statement must parse
    (extraction happens before dispatch) and return values identical to
    the unhinted statement, with session confs restored."""
    from griddb_spark.sql.translate import griddb_sql

    before = spark.conf.get("spark.sql.adaptive.enabled", None)
    q = ("SELECT {h}avg(value) AS avg_value FROM events "
         "WHERE ts BETWEEN TIMESTAMP('2024-01-01T00:00:00Z') AND "
         "TIMESTAMP('2024-01-01T02:00:00Z') "
         "GROUP BY RANGE(ts) EVERY(15, MINUTE)")
    plain = griddb_sql(spark, catalog, q.format(h=""))
    hinted = griddb_sql(
        spark, catalog, q.format(h="/*+ NoCostBasedJoinDriving() */ "))
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, hinted.collect()))
    assert spark.conf.get("spark.sql.adaptive.enabled", None) == before


def test_no_index_scan_hint_on_aliased_table(spark, catalog):
    """NoIndexScan(t) with an aliased FROM t x reference: the barrier
    applies (PushedFilters empty), qualified alias refs still resolve,
    values identical."""
    import re

    from griddb_spark.sql.translate import griddb_sql

    q = ("SELECT {h}o.o_orderstatus AS s, count(*) AS n FROM orders o "
         "WHERE o.o_totalprice > 150000 GROUP BY o.o_orderstatus")
    plain = griddb_sql(spark, catalog, q.format(h=""))
    hinted = griddb_sql(spark, catalog,
                        q.format(h="/*+ NoIndexScan(orders) */ "))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]",
                        hinted._jdf.queryExecution().toString())
    assert not any("o_totalprice" in f for f in pushed)
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, hinted.collect()))


def test_bucketed_q18_eliminates_fact_join_exchanges(spark):
    """join_bucketed_q18's co-location receipt, regression-pinned: with
    lineitem and orders bucketed (+sorted) on the orderkey, the
    fact-to-fact join AND the HAVING groupBy plan with NO exchange and
    NO sort — the only shuffles left are the custkey join's. The plain
    q18 plan over the same data keeps its orderkey exchanges, so the
    pin also proves the bucketed layout (not tiny-sf planning) removed
    them. This is the plan shape the 100x probe measured at 8.3x
    (scripts/probe_bucketed_100x.json, exchanges 5 -> 3)."""
    from griddb_spark import workload

    bucketed = _plan(
        workload.QUERIES["join_bucketed_q18"](spark, SF_DIR))
    plain = _plan(
        workload.QUERIES["q18_large_volume"](spark, SF_DIR))

    # bucketed scans announce themselves, and the hinted fact join is a
    # sort-merge join (broadcast would hide the co-location)
    assert "Bucketed: true" in bucketed
    assert "SortMergeJoin" in bucketed
    # ZERO exchange keyed on the bucket key: neither the orderkey join
    # nor the HAVING groupBy repartitions (both sides pre-clustered)
    assert "hashpartitioning(l_orderkey" not in bucketed
    assert "hashpartitioning(o_orderkey" not in bucketed
    # the custkey join legitimately shuffles; nothing else may
    shuffles = bucketed.count("Exchange hashpartitioning")
    assert shuffles <= 2, bucketed
    # the sorted buckets also satisfy the SMJ's ordering: no Sort node
    # directly feeding the merge join on the bucket key
    assert bucketed.count("Sort [l_orderkey") == 0
    # control: the plain layout DOES pay orderkey exchanges (at least
    # the HAVING groupBy), so the pin fails loudly if the comparison
    # ever stops being meaningful
    assert "hashpartitioning(l_orderkey" in plain
