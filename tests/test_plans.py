"""Physical-plan guardrails: the SURVEY §4 scale claims as assertions."""

from __future__ import annotations

from mapreducekmean_spark.contract import registry
from mapreducekmean_spark.plans import (
    count_exchanges,
    count_joins,
    has_broadcast_join,
    has_pushed_filters,
    has_wholestage_codegen,
)

REG = registry()


def test_assign_nearest_is_shuffle_free(spark, sf_small):
    """R6 assignment must be a pure projection over the scan: the centroid
    literal is constant-folded, so there is no join and no exchange."""
    df = REG["assign_nearest"].fn(spark, sf_small)
    assert count_exchanges(df) == 0
    assert has_wholestage_codegen(df)


def test_centroid_update_single_shuffle(spark, sf_small):
    """R7-R9: exactly one exchange (the groupBy on cluster_id), with
    partial aggregation before it."""
    df = REG["centroid_update"].fn(spark, sf_small)
    assert count_exchanges(df) == 1


def test_q1_filter_pushdown(spark, sf_small):
    """The shipdate predicate must reach the parquet scan."""
    df = REG["tpch_q1_pricing"].fn(spark, sf_small)
    assert has_pushed_filters(df, "l_shipdate")


def test_q6_all_predicates_pushed(spark, sf_small):
    """Q6 is the pure-pushdown case: every range predicate must reach the
    parquet scan."""
    df = REG["tpch_q6_forecast"].fn(spark, sf_small)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert has_pushed_filters(df, col), col


def test_q3_broadcasts_dimension(spark, sf_small):
    df = REG["tpch_q3_top_orders"].fn(spark, sf_small)
    assert has_broadcast_join(df)


def test_q5_broadcasts_dimensions(spark, sf_small):
    df = REG["tpch_q5_regional_revenue"].fn(spark, sf_small)
    assert has_broadcast_join(df)


def test_scan_points_prunes_columns(spark, sf_small):
    """Column pruning: a 2-column projection must not read the whole
    embeddings file schema (ReadSchema carries only what's needed)."""
    from mapreducekmean_spark.plans import formatted_plan

    df = REG["scan_points"].fn(spark, sf_small).select("vec_id")
    plan = formatted_plan(df)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and all("label" not in ln for ln in read)


def test_cosine_topk_broadcasts_queries(spark, sf_small):
    df = REG["cosine_topk"].fn(spark, sf_small)
    assert has_broadcast_join(df)


def test_rollup_single_shuffle(spark, sf_small):
    """ROLLUP must plan as Expand + partial/final HashAggregate with ONE
    exchange — not one shuffle per grouping set."""
    df = REG["orders_rollup"].fn(spark, sf_small)
    assert count_exchanges(df) == 1
    assert "Expand" in _plan(df)


def test_cube_single_shuffle(spark, sf_small):
    df = REG["events_cube"].fn(spark, sf_small)
    assert count_exchanges(df) == 1
    assert "Expand" in _plan(df)


def test_json_stats_stays_jvm_side(spark, sf_small):
    """from_json is a codegen'd JVM expression — no Python evaluation
    node may appear in the plan."""
    plan = _plan(REG["events_json_stats"].fn(spark, sf_small))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asof_join_single_shuffle_no_nested_loop(spark, sf_small):
    """The union-window as-of formulation must plan ONE hash exchange on
    the key and NO nested-loop join (the naive inequality-join plan)."""
    df = REG["events_asof_purchase"].fn(spark, sf_small)
    plan = _plan(df)
    assert count_exchanges(df) == 1
    assert "NestedLoop" not in plan


def test_running_spend_single_shuffle(spark, sf_small):
    """One hash-partition on o_custkey feeds both window functions."""
    df = REG["running_spend"].fn(spark, sf_small)
    assert count_exchanges(df) == 1


def test_range_join_is_equi_no_nested_loop(spark, sf_small):
    """The bucketed range join must plan as an EQUI hash join on
    (user_id, blk) with the interval as a residual filter — never the
    nested-loop/cartesian plan a raw inequality join produces — and the
    event_type filters must reach the parquet scans."""
    df = REG["events_range_join"].fn(spark, sf_small)
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan
    assert "EqualTo(event_type,purchase)" in plan
    assert "EqualTo(event_type,view)" in plan


def _plan(df):
    from mapreducekmean_spark.plans import formatted_plan

    return formatted_plan(df)


def test_word_count_partial_agg_before_both_exchanges(spark, sf_small):
    """The canonical MR workload: map-side partial aggregation must sit
    below the token-keyed exchange (stopword skew absorbed at the
    mappers), and the whole plan is exactly the two agg exchanges."""
    df = REG["word_count"].fn(spark, sf_small)
    assert count_exchanges(df) == 2
    plan = _plan(df)
    # two partial/final HashAggregate pairs, no sort-based fallback
    assert plan.count("HashAggregate") >= 4
    assert "SortAggregate" not in plan


def test_bigram_lm_window_over_distinct_bigrams(spark, sf_small):
    """The per-w1 normalizer window must consume the aggregated
    distinct-bigram table, not the raw explode: the Generate sits below
    the aggregation exchange."""
    plan = _plan(REG["bigram_lm"].fn(spark, sf_small))
    assert "Generate" in plan and "Window" in plan
    gen = plan.index("Generate")
    win = plan.index("Window")
    # formatted_plan prints top-down: the window appears above (before)
    # the explode in the operator listing
    assert win < gen


def test_points_csv_scan_pushes_filter_no_exchange(spark, sf_small):
    """The custom Python DataSource path: zero exchanges (pure
    partitioned scan) and the numeric predicate accepted by
    pushFilters."""
    df = REG["points_csv_scan"].fn(spark, sf_small)
    assert count_exchanges(df) == 0
    assert "BatchScan points" in _plan(df)


def test_dedup_verify_no_nested_loop_all_hash_joins(spark, sf_small):
    """End-to-end dedup composition: every join is a hash join (the
    candidate set joins back to the materialized shingle table), never
    a nested loop over the corpus."""
    plan = _plan(REG["dedup_verify"].fn(spark, sf_small))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan


def test_q13_in_join_predicate_pushed_left_outer(spark, sf_small):
    """Q13's load-bearing shape: the priority predicate lives INSIDE the
    LEFT OUTER join yet must still reach the orders parquet scan as a
    pushed filter; customer prunes to its join column."""
    df = REG["tpch_q13_custdist"].fn(spark, sf_small)
    plan = _plan(df)
    assert "LeftOuter" in plan
    assert has_pushed_filters(df, "o_orderpriority")
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_q16_anti_join_and_distinct_agg(spark, sf_small):
    """Q16's NOT-IN must plan as an anti hash join (null-safe, shuffle-
    friendly), with the negative-balance predicate pushed to the
    supplier scan; no nested loop anywhere."""
    df = REG["tpch_q16_supplier_cnt"].fn(spark, sf_small)
    plan = _plan(df)
    assert "LeftAnti" in plan
    assert has_pushed_filters(df, "s_acctbal")
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_corpus_clean_no_nested_loop(spark, sf_small):
    """The composed cleaning pipeline must stay hash-join/window shaped
    end-to-end — no nested loop or cartesian anywhere in the cascade."""
    df = REG["corpus_clean"].fn(spark, sf_small)
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan
    # stage 1 is a plain filter on the fused quality expression and
    # the audit assembly starts from the same fused projection — the
    # two corpus×corpus quality re-attach joins the r11 verdict
    # flagged are gone, leaving the near-dup machinery's 8 (LSH
    # candidate pair join, verify joins, audit left-joins)
    assert count_joins(df) == 8


def test_capped_range_join_stays_equi_hash(spark, sf_small):
    """The view cap adds one window pass but must not change the join
    strategy: still an equi hash join on (user_id, blk), no nested
    loop, with both event-type predicates pushed to the scans."""
    df = REG["events_range_join_capped"].fn(spark, sf_small)
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan
    assert "EqualTo(event_type,purchase)" in plan
    assert "EqualTo(event_type,view)" in plan
    assert "Window" in plan  # the cap itself


def test_q7_broadcasts_both_nation_roles(spark, sf_small):
    """Q7 joins nation twice under different roles — both must
    broadcast; the ship-window predicate reaches the lineitem scan."""
    df = REG["tpch_q7_volume"].fn(spark, sf_small)
    assert has_broadcast_join(df)
    assert has_pushed_filters(df, "l_shipdate")
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_q17_broadcasts_filtered_part(spark, sf_small):
    """Q17's filtered part dim must broadcast into the lineitem scan
    with the brand/size predicates pushed to the part scan; the
    per-part average is one window, not a self-join."""
    df = REG["tpch_q17_small_qty"].fn(spark, sf_small)
    assert has_broadcast_join(df)
    assert has_pushed_filters(df, "p_brand")
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_q22_anti_join_with_pushed_date(spark, sf_small):
    """Q22's dormancy test must plan as an anti hash join with the
    order-date cutoff pushed to the orders scan. The scalar average
    correctly plans as a single-row BroadcastNestedLoopJoin (the
    inequality against a 1-row build side — the scalar-subquery shape,
    not a data-sized nested loop), so only Cartesian is banned."""
    df = REG["tpch_q22_idle_balance"].fn(spark, sf_small)
    plan = _plan(df)
    assert "LeftAnti" in plan
    assert has_pushed_filters(df, "o_orderdate")
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalar side


def test_dedup_semantic_single_shuffle_per_stage(spark, sf_small):
    """Semantic dedup must stay cell-bucketed: the only wide operations
    are the cell-assignment projection (shuffle-free, constant-folded
    centroids) feeding ONE exchange into the per-cell applyInPandas —
    never an all-pairs join."""
    df = REG["dedup_semantic"].fn(spark, sf_small)
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "FlatMapGroupsInPandas" in plan


def test_q21_semi_anti_hash_joins_no_nested_loop(spark, sf_small):
    """Q21's EXISTS/NOT-EXISTS must plan as LeftSemi/LeftAnti HASH joins
    on l_orderkey with the supplier inequality as residual — never the
    nested-loop plan a correlated subquery can degrade to. The order
    status filter must reach the orders scan."""
    df = REG["tpch_q21_waiting_supplier"].fn(spark, sf_small)
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "EqualTo(o_orderstatus,F)" in plan


def test_q9_broadcasts_all_dims(spark, sf_small):
    """Q9: filtered part + supplier + nation broadcast; p_name LIKE is
    pushed to the part scan (StringContains)."""
    df = REG["tpch_q9_profit"].fn(spark, sf_small)
    plan = _plan(df)
    assert has_broadcast_join(df)
    assert "StringContains(p_name,gear)" in plan


def test_q11_single_fact_scan(spark, sf_small):
    """Q11's grand total must be derived from the per-part aggregate,
    never a second lineitem scan: the aggregate is checkpointed at
    build, so the final plan reads the materialized blocks
    (ExistingRDD) and touches lineitem.parquet zero times."""
    plan = _plan(REG["tpch_q11_part_value"].fn(spark, sf_small))
    assert plan.count("lineitem.parquet") == 0
    assert "ExistingRDD" in plan


def test_decontaminate_hash_joins_on_digest(spark, sf_small):
    """Decontamination must plan hash joins (gram digest, doc_id) —
    never a nested loop over the corpus — with partial aggregation
    before the per-doc count's exchange."""
    df = REG["decontaminate"].fn(spark, sf_small)
    plan = _plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan


def test_embedding_quantize_projection_pass_no_join(spark, sf_small):
    """Pass 2 of scalar quantization must be a pure constant-folded
    projection: the (min, max) literals are baked in, so the output
    plan has NO join and NO exchange — the broadcast-small-state shape
    (R5), like assign_nearest."""
    df = REG["embedding_quantize"].fn(spark, sf_small)
    plan = _plan(df)
    assert count_exchanges(df) == 0
    assert "Join" not in plan


def test_minhash_signature_one_shared_exchange(spark, sf_small):
    """The MinHash signature build must pay exactly ONE exchange (the
    gram window's doc_id partitioning, which the min-aggregate reuses)
    and must contain NO interpreted higher-order-function lambdas in
    the gram path — the array/HOF formulations computed identical
    values 10-14× slower at the 500k-doc probe (CodegenFallback)."""
    df = REG["dedup_minhash_sig"].fn(spark, sf_small)
    assert count_exchanges(df) == 1
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for hof in ("zip_with", "transform(", "array_min"):
        assert hof not in plan, hof
    # partial min aggregation must sit below the (single, shared)
    # exchange-established partitioning
    assert "partial_min" in plan


def test_q2_joins_back_on_group_extremum(spark, sf_small):
    """Q2's correlated max must plan as hash joins (aggregate joined
    back), never a per-part nested-loop subquery."""
    plan = _plan(REG["tpch_q2_best_supplier"].fn(spark, sf_small))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan


def test_q20_single_fact_scan_semi_join(spark, sf_small):
    """Q20: the per-part totals derive from the checkpointed pair
    aggregate (no second lineitem scan) and the supplier verdict is a
    LEFT SEMI hash join."""
    plan = _plan(REG["tpch_q20_excess_volume"].fn(spark, sf_small))
    assert plan.count("lineitem.parquet") == 0  # pairs checkpointed
    assert "LeftSemi" in plan


def test_dataset_mixture_pure_projection(spark, sf_small):
    """Mixture sampling must be computable at scan site: a narrow
    projection with NO exchange, no join, no aggregate."""
    df = REG["dataset_mixture"].fn(spark, sf_small)
    assert count_exchanges(df) == 0
    plan = _plan(df)
    assert "Join" not in plan and "Aggregate" not in plan


def test_ann_quantized_broadcasts_queries(spark, sf_small):
    """The quantized top-k must broadcast the small query batch, like
    cosine_topk — never shuffle the corpus against it."""
    df = REG["ann_quantized"].fn(spark, sf_small)
    assert has_broadcast_join(df)


def test_pack_sequences_broadcasts_bucket_offsets(spark, sf_small):
    """The two-level prefix sum must broadcast the tiny per-bucket
    offset table back to the corpus — the whole point of the
    decomposition is that the only per-source-global state is
    bucket-granular and broadcastable."""
    df = REG["pack_sequences"].fn(spark, sf_small)
    assert has_broadcast_join(df)


def test_doc_repetition_no_global_state(spark, sf_small):
    """Every exchange in the repetition pass is keyed by doc_id (plus
    gram/token) — no corpus-global aggregation anywhere, so the plan
    contains no single-partition exchange."""
    plan = _plan(REG["doc_repetition"].fn(spark, sf_small))
    assert "SinglePartition" not in plan


def test_bucketed_join_and_agg_no_exchange(spark, sf_small, tmp_path):
    """Bucketed layout pays the shuffle once at write time: an
    equi-join of two tables bucketed on their join keys, and a
    group-by on the bucket key, must both plan with ZERO Exchange
    nodes — and return exactly what the unbucketed plans return."""
    from mapreducekmean_spark.sources import (
        load_table,
        read_bucketed,
        write_bucketed,
    )

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    od = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey"
    )
    write_bucketed(
        li, "t_li_bkt", "l_orderkey", buckets=4, path=str(tmp_path / "li")
    )
    write_bucketed(
        od, "t_od_bkt", "o_orderkey", buckets=4, path=str(tmp_path / "od")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bli, bod = read_bucketed(spark, "t_li_bkt"), read_bucketed(
            spark, "t_od_bkt"
        )
        j = bli.join(bod, bli.l_orderkey == bod.o_orderkey)
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        expected = sorted(
            tuple(r)
            for r in li.join(od, li.l_orderkey == od.o_orderkey).collect()
        )
        assert sorted(tuple(r) for r in j.collect()) == expected

        from pyspark.sql import functions as F

        agg = bli.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        assert "Exchange" not in _plan(agg)
        base = sorted(
            tuple(r)
            for r in li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
            .collect()
        )
        assert sorted(tuple(r) for r in agg.collect()) == base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_li_bkt")
        spark.sql("DROP TABLE IF EXISTS t_od_bkt")


def test_partitioned_layout_prunes_scan(spark, sf_small, tmp_path):
    """A filter on a partition column must prune at the DIRECTORY level:
    the plan's PartitionFilters carries the predicate, the data filter
    list does not, and the pruned scan reads only matching partitions'
    rows — equal to filtering the unpartitioned table."""
    from pyspark.sql import functions as F

    from mapreducekmean_spark.sources import load_table, write_partitioned

    ev = load_table(spark, sf_small, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, "day")
    some_day = ev.select("day").orderBy("day").first()["day"]

    part = spark.read.parquet(path).filter(F.col("day") == some_day)
    plan = _plan(part)
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "day" in m.group(1), plan
    expected = ev.filter(F.col("day") == some_day).count()
    assert part.count() == expected > 0


def test_bm25_broadcasts_idf_no_corpus_shuffle_on_query(spark, sf_small):
    """The per-query side of BM25 must broadcast the tiny idf table
    into the postings join — never shuffle the tf index against it."""
    from mapreducekmean_spark.operators.search import (
        bm25_search,
        corpus_stats_for_search,
        term_frequencies,
    )
    from mapreducekmean_spark.operators.text import documents

    docs = documents(spark, sf_small)
    tf = term_frequencies(docs).localCheckpoint()
    n, a = corpus_stats_for_search(docs)
    df = bm25_search(docs, "table scan", 5, tf=tf, n_docs=n, avgdl=a)
    assert has_broadcast_join(df)


def test_bm25_indexed_query_reads_only_its_buckets(spark, sf_small, tmp_path):
    """A query against the LANDED term-bucketed BM25 index must be
    postings-bound in the plan, not just in prose: the query terms push
    into the tf scan as In-filters AND prune buckets (only the buckets
    the terms hash to are read); the df aggregate lands on the scan's
    own term partitioning with no Exchange below the idf broadcast; the
    single shuffle left is the per-doc score aggregate over matched
    postings."""
    from mapreducekmean_spark.operators.search import (
        bm25_search_indexed,
        land_bm25_index,
    )
    from mapreducekmean_spark.operators.text import documents

    docs = documents(spark, sf_small)
    land_bm25_index(spark, docs, "t_bm25_plan", str(tmp_path / "idx"))
    df = bm25_search_indexed(spark, "table scan", "t_bm25_plan")
    plan = _plan(df)
    tree = plan.split("\n\n")[0]
    # one data shuffle total: the doc-keyed score aggregate.
    shuffles = [
        ln for ln in tree.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    assert len(shuffles) == 1, tree
    assert "BroadcastHashJoin" in tree, tree
    # term filter pushed to the bucketed scan, buckets pruned.
    assert "In(term" in plan, plan
    import re

    ms = re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert ms, plan
    assert all(int(a) < int(b) for a, b in ms), ms


def test_domain_cap_partial_group_limit_before_shuffle(spark, sf_small):
    """domain_cap's rank-filter must trigger Spark's WindowGroupLimit
    rewrite with a PARTIAL pass before the exchange — every map task
    prunes to cap rows per source it sees, so a mega-domain's shuffle
    volume is tasks x cap, never its row count."""
    from mapreducekmean_spark.plans import formatted_plan

    df = REG["domain_cap"].fn(spark, sf_small)
    plan = formatted_plan(df)
    # two WindowGroupLimit nodes (Partial + Final), the first upstream
    # of the exchange: in the formatted tree the deepest node prints
    # last, so the partial one appears AFTER the Exchange line.
    assert plan.count("WindowGroupLimit") >= 2
    exchange_pos = plan.find("Exchange")
    partial_pos = plan.rfind("WindowGroupLimit")
    assert 0 <= exchange_pos < partial_pos


def test_shuffle_export_broadcasts_bucket_offsets(spark, sf_small):
    """shuffle_export's rank join must broadcast the 65536-row offsets
    table; the corpus side shuffles exactly once (by rank bucket)."""
    from mapreducekmean_spark.plans import has_broadcast_join

    df = REG["shuffle_export"].fn(spark, sf_small)
    assert has_broadcast_join(df)


def test_gapfill_spine_broadcast_no_volume_shuffle(spark, sf_small):
    """hourly_gapfill: the only Exchange carries the hourly AGGREGATE
    (hours × types rows), never raw events — the spine/type grid joins
    by broadcast."""
    from mapreducekmean_spark.plans.inspect import formatted_plan

    df = REG["events_gapfill"].fn(spark, sf_small)
    df.collect()
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quality_unpivot_is_shuffle_free(spark, sf_small):
    """DataFrame.unpivot is a per-row Expand projection: zero
    exchanges, wide→long without touching the shuffle system."""
    from mapreducekmean_spark.plans.inspect import formatted_plan

    df = REG["quality_unpivot"].fn(spark, sf_small)
    assert count_exchanges(df) == 0
    assert "Expand" in formatted_plan(df)


def test_doc_top_terms_partial_group_limit(spark, sf_small):
    """doc_top_terms' per-doc top-k orders by a computed column, so the
    WindowGroupLimit rewrite must insert the PARTIAL pass before the
    doc_id exchange — a mega-document's candidate terms prune map-side
    (the domain_cap shape)."""
    from mapreducekmean_spark.plans import formatted_plan

    df = REG["doc_top_terms"].fn(spark, sf_small)
    plan = formatted_plan(df)
    assert plan.count("WindowGroupLimit") >= 2
    exchange_pos = plan.find("Exchange")
    partial_pos = plan.rfind("WindowGroupLimit")
    assert 0 <= exchange_pos < partial_pos


def test_every_declared_plan_is_hygienic(spark, sf_small):
    """Global plan gate over the ENTIRE declared surface: no declared
    query may plan a row-at-a-time Python UDF (BatchEvalPython — the
    Arrow-batched mapInPandas/mapInArrow kernels plan as different
    nodes and stay allowed) or a CartesianProduct (every cross join in
    the repo is a broadcast 1-row totals join, which plans as
    BroadcastNestedLoopJoin). One machine check instead of 138
    individual pins — a regression in any future operator fails here
    by name."""
    from mapreducekmean_spark.plans import formatted_plan

    bad = {}
    for name, q in REG.items():
        plan = formatted_plan(q.fn(spark, sf_small))
        hits = [
            marker
            for marker in ("BatchEvalPython", "CartesianProduct")
            if marker in plan
        ]
        if hits:
            bad[name] = hits
    assert not bad, f"plan-hygiene violations: {bad}"


def test_quantile_sketch_builds_map_side(spark, sf_small):
    """The bottom-k sketch's rank orders by the computed md5 key, so
    WindowGroupLimit must prune to k rows per type BEFORE the exchange
    — the sketch is built map-side like the CMS counters."""
    from mapreducekmean_spark.plans import formatted_plan

    df = REG["events_quantile_sketch"].fn(spark, sf_small)
    plan = formatted_plan(df)
    assert plan.count("WindowGroupLimit") >= 2
    exchange_pos = plan.find("Exchange")
    partial_pos = plan.rfind("WindowGroupLimit")
    assert 0 <= exchange_pos < partial_pos


def test_doc_chunk_is_map_only(spark, sf_small):
    """Context-window chunking must be a pure per-row explode — no
    exchange anywhere (at 100 TB it is scan → explode → write)."""
    df = REG["doc_chunk"].fn(spark, sf_small)
    assert count_exchanges(df) == 0
    assert has_wholestage_codegen(df)


def test_domain_quality_filter_broadcasts_thresholds(spark, sf_small):
    """The per-source thresholds (one row per source) must broadcast
    back to the per-doc side; the ranking window runs over the distinct
    (source, quality) level table, never corpus volume. The plan must
    contain EXACTLY ONE join — the broadcast threshold join. A second
    join means the quality score was re-attached via a doc_id
    self-join (the r11-verdict scale trap: AQE broadcasts the whole
    corpus's score projection at fixture scale, a corpus-volume
    sort-merge shuffle at 100 TB) instead of fused via quality_expr."""
    df = REG["domain_quality_filter"].fn(spark, sf_small)
    assert has_broadcast_join(df)
    assert count_joins(df) == 1


def test_dedup_apply_best_hash_agg_no_sort(spark, sf_small):
    """The quality-argmax must plan as a plain hash aggregate with
    map-side partial aggregation — the (quality, -doc_id) order
    embedding exists precisely so the plan avoids SortAggregate's
    per-task sort (a struct-max would fall back to it)."""
    from mapreducekmean_spark.plans import formatted_plan

    df = REG["dedup_apply_best"].fn(spark, sf_small)
    plan = formatted_plan(df)
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan
    assert "partial_max" in plan.lower() or "partial" in plan.lower()
    # content hash + quality come out of ONE fused projection: the
    # whole plan is scan → project → partial agg → exchange → final
    # agg → project, with ZERO joins (a doc_id self-join re-attaching
    # the score is the r11-verdict 100-TB scale trap)
    assert count_joins(df) == 0


def test_quality_deciles_level_table_only(spark, sf_small):
    """The decile calibration must do ALL its work on the distinct
    quality level table: one corpus aggregation, then only
    level-table-sized operators — the two joins are the broadcast
    10-row/1-row threshold attaches, never a corpus-volume side, and
    there is no per-doc window (the single-partition window runs over
    the level table, bounded by the score's 6-dp precision)."""
    df = REG["quality_deciles"].fn(spark, sf_small)
    assert count_joins(df) == 2
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_host_stats_level_table_arithmetic(spark, sf_small):
    """The per-source report must aggregate the corpus ONCE to the
    (source, content_hash) level and do everything else on level
    tables: exactly one join (level x corpus-count, both
    distinct-content-sized — never a corpus-volume side), hash
    aggregates throughout (partial agg absorbs hot content groups
    map-side), no sort-based fallback."""
    df = REG["host_stats"].fn(spark, sf_small)
    assert count_joins(df) == 1
    plan = _plan(df)
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_gopher_quality_is_map_only(spark, sf_small):
    """The Gopher rules are a pure per-row projection — no exchange."""
    df = REG["gopher_quality"].fn(spark, sf_small)
    assert count_exchanges(df) == 0


def test_bm25_index_stats_distributed_topk(spark, sf_small):
    """The heavy-terms cut must plan as TakeOrderedAndProject (each
    task ships its local top-n) — never a single-partition global
    window over the vocabulary."""
    from mapreducekmean_spark.plans import formatted_plan

    df = REG["bm25_index_stats"].fn(spark, sf_small)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_quality_deciles_window_over_level_table(spark, sf_small):
    """Structural pin for the bounded-window claim (r12 verdict item
    #8): every Window node's input subtree must pass through a
    HashAggregate before reaching the parquet scan — the
    single-partition window runs over the post-aggregate quality LEVEL
    table (6-dp-precision bounded), never over corpus rows. A refactor
    that moved the window onto the per-doc side would plan
    Window → Sort/Exchange → Project → Scan with no aggregate between
    and fail here."""
    from mapreducekmean_spark.plans import formatted_plan

    plan = formatted_plan(REG["quality_deciles"].fn(spark, sf_small))
    tree = plan.split("\n\n")[0].splitlines()
    win_rows = [i for i, ln in enumerate(tree) if "Window (" in ln]
    assert win_rows, "plan lost its Window node"
    for i in win_rows:
        below = []
        for ln in tree[i + 1:]:
            below.append(ln)
            if "Scan parquet" in ln:
                break
        assert any("HashAggregate" in ln for ln in below), (
            "Window input reaches the scan without an aggregate — the "
            "decile window is running over corpus rows:\n" + "\n".join(tree)
        )


def _only_widening_exchanges(df):
    """True when every shuffle Exchange in the plan IS the adaptive
    round-robin scan widening (functions/skew.widen_narrow_scan) — the
    r14 optimization that parallelizes the Arrow decode kernels over
    narrow single-split fixture scans. At production scale the widening
    is the identity (the scan already has >= parallelism splits), so
    the production plan stays map-only; any other exchange flavor
    (hash/range keyed, or a SinglePartition collapse from e.g. a global
    limit) would be a real regression, so each Exchange's Arguments
    line must name RoundRobinPartitioning explicitly."""
    counts = _exchange_partitioning_counts(df)
    return sum(counts.values()) == counts.get("roundrobinpartitioning", 0)


def _keyed_exchange_count(df) -> int:
    """Number of key-partitioned (hash/range) shuffle Exchanges in the
    formatted plan."""
    counts = _exchange_partitioning_counts(df)
    return counts.get("hashpartitioning", 0) + counts.get(
        "rangepartitioning", 0
    )


def _exchange_partitioning_counts(df) -> dict:
    """Exchange count per partitioning flavor in the formatted plan.
    Formatted mode prints each detail node's partitioning on the
    Arguments line that follows it, so the tally pairs every
    ``(n) Exchange`` entry with its next Arguments line."""
    import re

    lines = _plan(df).splitlines()
    counts: dict = {}
    for i, line in enumerate(lines):
        if not re.match(r"^\(\d+\) Exchange", line.strip()):
            continue
        for follow in lines[i + 1 : i + 4]:
            fs = follow.strip().lower()
            if fs.startswith("arguments:"):
                m = re.search(r"(\w*partitioning|singlepartition)", fs)
                kind = m.group(1) if m else "unknown"
                counts[kind] = counts.get(kind, 0) + 1
                break
    return counts


def test_audio_fp_real_is_map_only(spark, sf_small):
    """The real WAV decode→fingerprint row is one JVM projection
    (payload synthesis) + one Arrow pass (decode kernel): no join, no
    key-partitioned exchange — identical shape to production audio
    ingest (the conditional round-robin scan widening vanishes on
    production-width inputs)."""
    df = REG["audio_fp_real"].fn(spark, sf_small)
    assert count_exchanges(df) <= 1 and _only_widening_exchanges(df)
    assert count_joins(df) == 0


def test_video_dhash_real_is_map_only(spark, sf_small):
    """The real Y4M decode→frame-dHash row is one JVM projection + one
    Arrow pass emitting several rows per asset: no join, no
    key-partitioned exchange (widening allowed, see above)."""
    df = REG["video_dhash_real"].fn(spark, sf_small)
    assert count_exchanges(df) <= 1 and _only_widening_exchanges(df)
    assert count_joins(df) == 0


def test_host_stats_delta_report_is_level_table_only(spark, sf_small):
    """The maintained report must read the landed snapshot (level
    rows), never a corpus: exactly one join (the level x level dup
    accounting), hash aggregates throughout — the host_stats pin
    applied to the snapshot-backed variant."""
    df = REG["host_stats_delta"].fn(spark, sf_small)
    assert count_joins(df) == 1
    plan = _plan(df)
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_dataset_importance_broadcasts_bucket_ratios(spark, sf_small):
    """DSIR importance weights: the 256-row bucket-ratio table must
    BROADCAST onto the first-k gram rows; the other two joins are both
    bounded-side attaches — the 1-row gram-totals broadcast onto the
    256-row count table (normalization) and the per-doc weight attach
    onto the doc base (doc_id keyed, both sides sharing the
    aggregation partitioning). Exactly three joins, none of them a
    corpus-volume re-score join, no cartesian (count_joins counts
    CartesianProduct nodes too)."""
    df = REG["dataset_importance"].fn(spark, sf_small)
    assert has_broadcast_join(df)
    assert count_joins(df) == 3


def test_quality_deciles_delta_report_is_level_table_only(spark, sf_small):
    """The maintained decile report must read the landed LEVEL
    snapshot, never a corpus — same join budget as the one-shot
    (the two broadcast threshold attaches) with its window over the
    snapshot levels."""
    df = REG["quality_deciles_delta"].fn(spark, sf_small)
    assert count_joins(df) == 2
    plan = _plan(df)
    assert "SortMergeJoin" not in plan


def test_corpus_diff_is_level_table_join(spark, sf_small):
    """The version diff must collapse both sides to (source, hash)
    levels BEFORE the one full-outer join — never a corpus-volume
    join — with hash aggregates throughout."""
    df = REG["corpus_diff"].fn(spark, sf_small)
    assert count_joins(df) == 1
    plan = _plan(df)
    assert "HashAggregate" in plan
    assert "Cartesian" not in plan


def test_seq_len_histogram_single_agg_no_joins(spark, sf_small):
    """The length histogram is one fused projection + one partial-agg
    group-by: exactly one exchange, zero joins."""
    df = REG["seq_len_histogram"].fn(spark, sf_small)
    assert count_exchanges(df) == 1
    assert count_joins(df) == 0


def test_embedding_stats_partial_agg_no_joins(spark, sf_small):
    """The drift report is posexplode + partial-agg group-by on the
    dimension index: one exchange (d rows per task cross the wire),
    zero joins, no sort-based aggregate fallback."""
    df = REG["embedding_stats"].fn(spark, sf_small)
    assert count_exchanges(df) == 1
    assert count_joins(df) == 0
    assert "SortAggregate" not in _plan(df)


def test_corpus_diff_delta_reads_only_snapshots(spark, sf_small):
    """The snapshot-backed diff must be pure level-table work: one
    full-outer level join, hash aggregates, and NO tokenize/Generate
    anywhere — the corpus is never re-read."""
    df = REG["corpus_diff_delta"].fn(spark, sf_small)
    assert count_joins(df) == 1
    plan = _plan(df)
    assert "HashAggregate" in plan
    assert "Generate" not in plan  # no explode = no re-tokenization


def test_seq_len_histogram_delta_reads_only_snapshot(spark, sf_small):
    """The maintained histogram report must be pure level-table work
    off the landed snapshot: zero joins, no tokenize (no regexp split
    Generate) — the corpus is never re-read."""
    df = REG["seq_len_histogram_delta"].fn(spark, sf_small)
    assert count_joins(df) == 0
    plan = _plan(df)
    assert "Generate" not in plan  # no explode = no re-tokenization


def test_embedding_stats_delta_reads_only_snapshot(spark, sf_small):
    """The maintained drift report must read the d-row snapshot only:
    zero joins, no posexplode Generate — the vectors are never
    re-exploded."""
    df = REG["embedding_stats_delta"].fn(spark, sf_small)
    assert count_joins(df) == 0
    plan = _plan(df)
    assert "Generate" not in plan


def test_blocklist_filter_is_map_only(spark, sf_small):
    """The C4 blocklist rule is a per-row projection: zero exchanges,
    zero joins — the literal-array membership never becomes a join."""
    df = REG["blocklist_filter"].fn(spark, sf_small)
    assert count_exchanges(df) == 0
    assert count_joins(df) == 0


def test_video_scene_cuts_one_window_no_joins(spark, sf_small):
    """The scene-cut profile is the decode pass + ONE per-clip window
    lag: a single asset-keyed exchange, zero joins (plus at most the
    conditional round-robin scan widening, which vanishes on
    production-width inputs)."""
    df = REG["video_scene_cuts"].fn(spark, sf_small)
    assert _keyed_exchange_count(df) == 1
    assert count_exchanges(df) <= 2
    assert count_joins(df) == 0


def test_audio_segments_real_is_map_only(spark, sf_small):
    """The activity segmentation is synthesis + one Arrow pass emitting
    run-length rows: no join, no key-partitioned exchange (widening
    allowed, see _only_widening_exchanges) — identical plan class to
    the fingerprint it shares its decode with."""
    df = REG["audio_segments_real"].fn(spark, sf_small)
    assert count_exchanges(df) <= 1 and _only_widening_exchanges(df)
    assert count_joins(df) == 0
