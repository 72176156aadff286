"""Physical-plan quality gates: assert the optimizations we rely on at
100 TB actually appear in the plans — predicate pushdown into the parquet
scan, column pruning, broadcast joins for dim lookups, partial (map-side)
aggregation, and no Python in JVM-only paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_realtime_dw4_0_spark.plans.catalog import CATALOG


def plan_of(spark, sf_dir, name: str) -> str:
    df = CATALOG[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_predicates_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q6_forecast_revenue")
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q6_column_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q6_forecast_revenue")
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 4 referenced columns are read, not all 11
    assert "l_extendedprice" in schema and "l_returnflag" not in schema


def test_f1_reads_single_column(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "f1_route_split")
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "event_type" in schema and "props" not in schema and "value" not in schema


def test_lookup_joins_broadcast(spark, sf_dir):
    for name in ("j4_lookup_join_inner", "j5_lookup_join_left", "tpch_q5_local_supplier_volume"):
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name


def test_windowed_agg_partial(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "a2_traffic_window_pv")
    # map-side combine before the shuffle
    assert "partial_count" in plan or "partial" in plan.lower()


def test_whole_stage_codegen_on_scan_agg(spark, sf_dir):
    df = CATALOG["tpch_q1_pricing_summary"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes the plan only at execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # whole-stage-codegen stages print as "*(n) Operator"
    assert "*(1)" in plan or "*(2)" in plan


def test_no_python_udf_in_jvm_paths(spark, sf_dir):
    # everything except the declared pandas-UDF ops stays JVM-side
    pandas_ok = {"ann_cosine_pairs", "multimodal_features", "ann_lsh_topk"}
    for name in (
        "tpch_q1_pricing_summary", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "text_langid", "text_quality", "a2_traffic_window_pv",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_interval_join_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j3_interval_join")
    # equi-key keeps it a hash/sort-merge join, never a cartesian product
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_join_single_pass_no_pair_explosion(spark, sf_dir):
    """The as-of join must stay a union + windowed carry-forward — never a
    join operator (equi+range materializes every co-keyed pair)."""
    plan = plan_of(spark, sf_dir, "asof_join_attribution")
    assert "Window" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
                "BroadcastHashJoin", "ShuffledHashJoin"):
        assert bad not in plan, f"asof join degraded to {bad}"


def test_sampling_split_is_narrow(spark, sf_dir):
    """Hash split/sample assignment is a pure map — the only exchange in
    the catalog queries is their audit groupBy rollup."""
    for name in ("sample_split_assign", "sample_stratified"):
        plan = plan_of(spark, sf_dir, name)
        # one partial+final agg pair → exactly one shuffle boundary
        assert plan.count("Exchange hashpartitioning") <= 1, name
        assert "Join" not in plan, name


def test_prefix_jaccard_no_cartesian_and_partial_agg(spark, sf_dir):
    """The jaccard plan of record (prefix join): candidate generation is
    an equi-join on shingle (never a cartesian), and the distinct runs
    with a partial (map-side) aggregate before its shuffle."""
    plan = plan_of(spark, sf_dir, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_" in plan or "HashAggregate" in plan


def test_q4_semi_join_and_pushdown(spark, sf_dir):
    """Correlated EXISTS must decorrelate to a LeftSemi join with the
    orders date filter pushed into the scan — no subquery-per-row."""
    plan = plan_of(spark, sf_dir, "tpch_q4_order_priority")
    assert "LeftSemi" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "o_orderdate" in pushed


def test_session_window_single_shuffle(spark, sf_dir):
    """Session windows need exactly one keyed shuffle (by user) — the
    merge/sort happens within partitions, no second Exchange."""
    plan = plan_of(spark, sf_dir, "w_session_window")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cosine_grid_no_exchange_storm(spark, sf_dir):
    """The block-grid cosine plan: one shuffle into grid cells (the
    groupBy), and the GEMM kernel is FlatMapGroupsInPandas — Python only
    at the Arrow-batch boundary."""
    from flink_realtime_dw4_0_spark.operators import similarity
    from flink_realtime_dw4_0_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    df = similarity.cosine_pairs(emb, threshold=0.3, n_blocks=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q21_semi_and_anti_joins(spark, sf_dir):
    """Q21's EXISTS/NOT EXISTS run as semi/anti joins (never a count-
    based rewrite or cartesian), with the nation filter broadcast."""
    plan = plan_of(spark, sf_dir, "tpch_q21_suppliers_waiting")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q19_brand_prefilter_reaches_part_scan(spark, sf_dir):
    """The OR-of-conjunctions' common brand IN-list prunes the part scan
    (build side), not just the joined rows."""
    plan = plan_of(spark, sf_dir, "tpch_q19_discounted_revenue")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln and "p_brand" in ln]
    assert pushed, plan


def test_q7_dim_filters_before_facts(spark, sf_dir):
    """Q7's nation-name filter shrinks the broadcast dims before they
    meet lineitem/orders — the filter must appear below the broadcast
    exchange, not above the join."""
    plan = plan_of(spark, sf_dir, "tpch_q7_volume_shipping")
    assert "BroadcastHashJoin" in plan
    assert plan.count("n_name") >= 2  # both dim copies carry the filter


def test_tfidf_df_window_no_extra_join(spark, sf_dir):
    """Doc frequency comes from a token-partitioned window: no
    SortMergeJoin against a token aggregate, no broadcast of the
    distinct-token table."""
    plan = plan_of(spark, sf_dir, "text_tfidf_keywords")
    assert "SortMergeJoin" not in plan, plan


def test_moving_avg_single_user_shuffle(spark, sf_dir):
    """The trailing-hour RANGE frame runs on ONE hashpartitioning
    exchange by user_id (both window functions share the frame)."""
    plan = plan_of(spark, sf_dir, "w_moving_avg_range")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SinglePartition" not in plan


def test_vocab_build_distributed_rank(spark, sf_dir):
    """Vocabulary ids are assigned by the distributed prefix sum — the
    plan must show a range partitioning and never a single-partition
    funnel."""
    plan = plan_of(spark, sf_dir, "text_vocab_build")
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan


def test_q9_partsupp_broadcast_single_fact_shuffle(spark, sf_dir):
    """Q9's derived partsupp comes from the filtered part set, so the
    composite-key (partkey, suppkey) join must be a broadcast — the only
    sort-merge/shuffle join allowed is lineitem→orders on orderkey."""
    plan = plan_of(spark, sf_dir, "tpch_q9_product_type_profit")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln and "p_name" in ln]
    assert pushed, "p_name LIKE filter must reach the part scan"


def test_q2_min_cost_integer_join_no_cartesian(spark, sf_dir):
    """Q2's correlated-min rewrite: the (partkey, cost=min) back-join is
    an equi-join (hash or sort-merge) on the composite key, never a
    nested-loop, and the region/nation/supplier dims broadcast.  The two
    BroadcastNestedLoopJoin Cross nodes inside the derived partsupp are
    deliberate (1-row supplier-count × 4-row index) and excluded."""
    plan = plan_of(spark, sf_dir, "tpch_q2_min_cost_supplier")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the min-cost back-join must be keyed on (ps_partkey, cost)
    assert any(
        j in plan
        for j in ("SortMergeJoin [ps_partkey", "BroadcastHashJoin [ps_partkey")
    ), plan
    # only the derived-partsupp cross joins may be nested-loop: 2 per
    # derivation, and the eur subtree appears on both sides of the
    # min-cost back-join (the broadcast exchanges themselves are reused)
    assert plan.count("BroadcastNestedLoopJoin") <= 4


def test_q20_candidate_semi_chain_broadcasts(spark, sf_dir):
    """Q20: the 'small%' partsupp subset and the candidate supplier list
    are both dim-scale and must broadcast; the lineitem year aggregate is
    the single fact shuffle."""
    plan = plan_of(spark, sf_dir, "tpch_q20_part_promotion")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln and "l_shipdate" in ln]
    assert pushed, "shipdate year-range must reach the lineitem scan"


def test_lsh_ann_distinct_before_vectors(spark, sf_dir):
    """The candidate distinct must shuffle (query_id, neighbor_id) id
    pairs only; embedding arrays join in AFTER dedup, once per side —
    otherwise every shared bucket re-ships both vectors at dim*8 bytes."""
    from flink_realtime_dw4_0_spark.operators import similarity
    from flink_realtime_dw4_0_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 25 == 0)
    df = similarity.lsh_bucket_topk(probes, emb, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the distinct is a two-phase HashAggregate on the id pair; no
    # aggregate carries an embedding column as a grouping key
    for line in plan.splitlines():
        if "HashAggregate" in line and "keys=" in line:
            keys = line.split("keys=")[1].split("]")[0]
            assert "vq" not in keys and "vc" not in keys and "embedding" not in keys, line


def test_bloom_decontaminate_broadcasts_positions(spark, sf_dir):
    """The bloom position set (bounded by m=65,536) must broadcast; the
    corpus probe side must never shuffle for the membership join."""
    plan = plan_of(spark, sf_dir, "dedup_decontaminate_bloom")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_cell_join_no_cartesian(spark, sf_dir):
    """Cell-bounded comparisons: the self-join must be an equi-join on
    the cell code (shuffle or broadcast hash), never a cartesian."""
    plan = plan_of(spark, sf_dir, "dedup_semantic_cells")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_substring_windows_partial_agg_on_fingerprints(spark, sf_dir):
    """The global window-frequency count must partial-aggregate map-side
    (HashAggregate below the exchange) and carry fingerprints, not text."""
    plan = plan_of(spark, sf_dir, "dedup_substring_windows")
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_temporal_join_single_key_shuffle_no_pair_explosion(spark, sf_dir):
    """The SCD2 temporal join rides the asof union+window plan: one sort
    per key partition, no join-then-filter pair explosion."""
    plan = plan_of(spark, sf_dir, "j8_scd2_temporal_join")
    assert "CartesianProduct" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_changelog_aggregate_partial_maxby(spark, sf_dir):
    """Latest-per-key via max_by must partial-aggregate before the
    user_id exchange (the point of avoiding a row_number window)."""
    plan = plan_of(spark, sf_dir, "cdc_changelog_aggregate")
    assert "Window" not in plan  # no per-key sort window anywhere
    # map-side combine proof: a partial max_by BELOW the user_id exchange
    assert "partial_max_by" in plan
    assert plan.index("partial_max_by") > plan.index("Exchange hashpartitioning(user_id")


def test_zorder_layout_rowgroup_skipping(spark, tmp_path):
    """Z-order clustering must make single-dimension predicates skip
    row groups that a differently-sorted layout cannot: same filtered
    result, but the z-ordered scan materializes a fraction of the rows
    (parquet min/max stats exclude whole files/row groups)."""
    from flink_realtime_dw4_0_spark.operators import layout

    base = spark.range(20000).select(
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
         .cast("long") % 1024).alias("x"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("y"), F.col("id").cast("string"))), 1, 6), 16, 10)
         .cast("long") % 1024).alias("y"),
        F.col("id").alias("v"),
    )
    zp, sp = str(tmp_path / "z"), str(tmp_path / "s")
    layout.write_zordered(base, zp, ["x", "y"], bits=10, n_files=16)
    base.repartitionByRange(16, "v").sortWithinPartitions("v") \
        .write.mode("overwrite").parquet(sp)

    def scan(path):
        df = spark.read.parquet(path).filter(F.col("x") < 128)
        df.collect()
        leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return df.count(), leaf.metrics().apply("numOutputRows").value()

    n_z, read_z = scan(zp)
    n_s, read_s = scan(sp)
    assert n_z == n_s > 0                      # same answer
    assert read_s == 20000                     # unclustered reads everything
    # 16 files = 2 z-prefix bits per dim -> x<128 lives in ~1/4 of the files
    assert read_z <= 0.45 * read_s


def test_cep_match_no_cartesian(spark, sf_dir):
    """Every CEP stage is a keyed equi-join + min-agg; the plan must
    contain no cartesian/nested-loop product."""
    from flink_realtime_dw4_0_spark.plans.catalog import CATALOG

    df = CATALOG["cep_match_sequence"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_ratios_broadcast(spark, sf_dir):
    """DSIR scoring must broadcast the m-bucket log-ratio table against
    the exploded feature stream — the feature stream must never
    sort-merge against a 4096-row side."""
    from flink_realtime_dw4_0_spark.plans.catalog import CATALOG

    df = CATALOG["text_dsir_logweights"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_basket_pairs_no_cartesian(spark, sf_dir):
    from flink_realtime_dw4_0_spark.plans.catalog import CATALOG

    df = CATALOG["assoc_part_pairs"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_banded_interval_join_no_cartesian_and_equals_naive(spark, sf_dir):
    """The keyless interval join must plan as a hash equi-join on the
    time bucket (no cartesian / nested loop) and return exactly the
    naive theta-join's pairs."""
    from flink_realtime_dw4_0_spark.operators import joins
    from flink_realtime_dw4_0_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts"))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))

    banded = joins.banded_interval_join(
        views, buys, left_ts="v_ts", right_ts="p_ts",
        lo="0 seconds", hi="5 minutes")
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    naive = views.crossJoin(buys).filter(
        (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 5 minutes")))
    got = sorted((r.view_id, r.purchase_id)
                 for r in banded.select("view_id", "purchase_id").collect())
    want = sorted((r.view_id, r.purchase_id)
                  for r in naive.select("view_id", "purchase_id").collect())
    assert got == want and got

    # a band narrower than the window (more buckets per row) must agree too
    narrow = joins.banded_interval_join(
        views, buys, left_ts="v_ts", right_ts="p_ts",
        lo="0 seconds", hi="5 minutes", band_seconds=60)
    got2 = sorted((r.view_id, r.purchase_id)
                  for r in narrow.select("view_id", "purchase_id").collect())
    assert got2 == want


def test_banded_interval_join_non_utc_session(spark, sf_dir):
    """Interval widths must be timezone-independent: in a non-UTC
    session a bare TIMESTAMP literal parses in the session zone, and a
    naive unix_micros(epoch + INTERVAL) shifts left-side buckets by
    ~offset/band while the right side stays put — silently dropping
    matches.  Run the banded join under Asia/Shanghai (+08:00) with a
    band narrower than the window (the default band width cancels the
    offset, so only a narrow band exposes the bug) and require equality
    with the naive theta-join."""
    from flink_realtime_dw4_0_spark.operators import joins
    from flink_realtime_dw4_0_spark.sources.files import load_table

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
        ev = load_table(spark, sf_dir, "events")
        views = ev.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts"))
        buys = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
        banded = joins.banded_interval_join(
            views, buys, left_ts="v_ts", right_ts="p_ts",
            lo="0 seconds", hi="5 minutes", band_seconds=60)
        naive = views.crossJoin(buys).filter(
            (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 5 minutes")))
        got = sorted((r.view_id, r.purchase_id)
                     for r in banded.select("view_id", "purchase_id").collect())
        want = sorted((r.view_id, r.purchase_id)
                      for r in naive.select("view_id", "purchase_id").collect())
        assert got == want and got
        # negative lo (look-back window) must survive non-UTC too
        back = joins.banded_interval_join(
            views, buys, left_ts="v_ts", right_ts="p_ts",
            lo="-5 minutes", hi="0 seconds", band_seconds=60)
        naive_back = views.crossJoin(buys).filter(
            (F.col("p_ts") >= F.col("v_ts") - F.expr("INTERVAL 5 minutes"))
            & (F.col("p_ts") <= F.col("v_ts")))
        got_b = sorted((r.view_id, r.purchase_id)
                       for r in back.select("view_id", "purchase_id").collect())
        want_b = sorted((r.view_id, r.purchase_id)
                        for r in naive_back.select("view_id", "purchase_id").collect())
        assert got_b == want_b
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """Storage-bucketed join (layout.write_bucketed): orders and lineitem
    bucketed + sorted on the join key must sort-merge-join with ZERO
    Exchange and ZERO Sort in the physical plan — the storage-level
    co-location that turns a recurring 100 TB fact⋈fact shuffle into a
    per-bucket local merge.  The same join on the raw parquet plans an
    Exchange on both sides (asserted as the contrast)."""
    from flink_realtime_dw4_0_spark.operators import layout
    from flink_realtime_dw4_0_spark.sources.files import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # AQE rewrites SMJ plans at runtime; disable for a stable plan probe
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        layout.write_bucketed(
            o, "t_orders_b", ["o_orderkey"], 4,
            sort_cols=["o_orderkey"], path=str(tmp_path / "ob"))
        layout.write_bucketed(
            li, "t_lineitem_b", ["l_orderkey"], 4,
            sort_cols=["l_orderkey"], path=str(tmp_path / "lb"))
        ob = spark.table("t_orders_b")
        lb = spark.table("t_lineitem_b")
        j = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan   # co-located: no shuffle either side
        assert "+- Sort" not in plan    # sortBy carried: no re-sort either

        raw = o.join(li, o.o_orderkey == li.l_orderkey)
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in raw_plan   # the contrast: raw parquet shuffles

        # correctness: identical row count both ways
        assert j.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_round4_operator_plan_shapes(spark, sf_dir):
    """Plan gates for the round-4 operators: C4 is a pure narrow
    projection (zero exchanges), PSI has exactly one aggregation
    exchange plus a broadcast of the 1-row total, and the temperature
    mixture broadcasts its quota table rather than shuffling the corpus
    twice."""
    from flink_realtime_dw4_0_spark.operators import quality, sampling, text
    from flink_realtime_dw4_0_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")

    c4_plan = text.c4_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in c4_plan  # per-row array calculus only

    psi = quality.psi_drift(orders, "o_totalprice", "o_orderstatus", "O", "F",
                            lo=0.0, hi=500000.0, n_bins=10)
    psi.collect()  # AQE finalizes the plan at runtime
    psi_plan = psi._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in psi_plan  # 1-row total broadcast back
    # the per-bin and total branches of the union share the counts
    # aggregation via runtime exchange reuse — the fact scan + shuffle
    # is not paid twice — and the split filter reaches the parquet scan
    assert "ReusedExchange" in psi_plan
    assert "In(o_orderstatus" in psi_plan

    mix = sampling.temperature_mixture(docs, temperature=0.7, total=300)
    mix_plan = mix._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in mix_plan      # quota table broadcast
    assert "CartesianProduct" not in mix_plan


def test_estimator_plan_shapes(spark, sf_dir):
    """Plan gates for the end-to-end sketch estimators (r5 VERDICT #7):
    count-min probes derive their depth positions in ONE pass over the
    probe plan (no per-row Union re-evaluation) feeding a single join
    against the registers; histogram quantiles run a FIXED number of
    window passes shared by every requested prob (the tiny probs frame
    is broadcast — never a window per prob, never a cartesian)."""
    from flink_realtime_dw4_0_spark.operators import text
    from flink_realtime_dw4_0_spark.operators.profiling import (
        countmin_estimate_df, countmin_registers, histogram_quantiles_df,
        histogram_registers,
    )
    from flink_realtime_dw4_0_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    toks = docs.select(F.explode(text.tokenize("text")).alias("token"))
    regs = countmin_registers(toks, "token")
    probe = spark.createDataFrame([("alpha",), ("beta",)], "token string")
    cm_plan = (
        countmin_estimate_df(regs, probe)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Union" not in cm_plan  # one pass over the probe plan
    assert cm_plan.count("Join") == 1  # depth rows/key -> registers, once

    regs_h = histogram_registers(orders, "o_totalprice", ["o_orderstatus"],
                                 20000.0)
    def win_plan(probs):
        return (
            histogram_quantiles_df(regs_h, ["o_orderstatus"], 20000.0, probs)
            ._jdf.queryExecution().executedPlan().toString()
        )
    p1, p3 = win_plan([0.5]), win_plan([0.1, 0.5, 0.9])
    # the cumsum + total windows are a FIXED cost: more probs, same plan
    assert p1.count("Window [") == p3.count("Window [") == 2
    assert "BroadcastNestedLoopJoin" in p3  # broadcast probs, not cartesian
    assert "CartesianProduct" not in p3
    assert p3.count("Exchange hashpartitioning") <= 2


def test_skip_replay_plan_shape(spark, sf_dir):
    """The after-match skip replay must stay ONE key-partitioned
    mapInPandas pass over the completed chains (a per-group
    applyInPandas here cost ~1 ms x |keys| and made the skip entries
    10x their chain at bench scale — the r6 finding).  Gate: exactly
    one Python-eval node, reached through exactly one extra hash
    exchange + sort beyond the chain plan, and NO FlatMapGroupsInPandas
    (the per-group operator)."""
    from flink_realtime_dw4_0_spark.operators import cep
    from flink_realtime_dw4_0_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events")
    pat = [
        {"name": "view", "where": F.col("event_type") == "view"},
        {"name": "click", "where": F.col("event_type") == "click"},
        {"name": "purchase", "where": F.col("event_type") == "purchase"},
    ]
    def plan(am):
        df = cep.match_pattern(ev, pat, within="7 DAY",
                               max_anchors_per_key=5, emit="all",
                               after_match=am)
        return df._jdf.queryExecution().executedPlan().toString()

    base = plan("no_skip")
    for am in ("skip_past_last", "skip_to_first:click"):
        p = plan(am)
        assert "FlatMapGroupsInPandas" not in p, am  # per-key Python: banned
        assert p.count("MapInPandas") == 1, am       # one replay pass
        # one repartition(key) + one sortWithinPartitions beyond the chain
        extra_ex = (p.count("Exchange hashpartitioning")
                    - base.count("Exchange hashpartitioning"))
        assert extra_ex <= 1, (am, extra_ex)
        assert p.count("Sort [") - base.count("Sort [") <= 1, am
