"""Plan-shape tests: the 100 TB criteria as assertions (pushdown,
pruning, broadcast choice, no accidental Python, bounded shuffles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from decisions_kinesis_spark.config import FilterVerb, PayloadFilter
from decisions_kinesis_spark.functions.filters import apply_payload_filters
from decisions_kinesis_spark.operators import relational, similarity
from decisions_kinesis_spark.operators.asof import asof_join_events_orders
from decisions_kinesis_spark.operators.payload import flagship_premium_filter
from decisions_kinesis_spark.plans.audit import audit_plan
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_flagship_filter_pushdown_and_codegen(spark):
    a = audit_plan(flagship_premium_filter(spark, SF))
    # the attribute predicate reaches the parquet scan...
    a.assert_pushed("EqualTo(event_type,purchase)")
    # ...and the whole JSON predicate stays JVM-side
    a.assert_no_python()
    assert a.shuffles == 0  # pure scan→filter→project pipeline


def test_q1_column_pruning(spark):
    a = audit_plan(relational.q1_pricing_summary(spark, SF))
    # 11-column table pruned to the 7 used columns
    a.assert_pruned_to(0, 7)
    a.assert_pushed("LessThanOrEqual(l_shipdate")
    a.assert_no_python()


def test_q3_broadcasts_dimension(spark):
    a = audit_plan(relational.q3_shipping_priority(spark, SF))
    a.assert_broadcasts(1)  # customer side explicitly broadcast
    a.assert_pushed("EqualTo(c_mktsegment,BUILDING)")
    a.assert_no_python()


def test_q5_broadcasts_all_dims(spark):
    a = audit_plan(relational.q5_local_supplier_volume(spark, SF))
    a.assert_broadcasts(4)  # customer, supplier, nation, region
    a.assert_no_python()


def test_q19_or_predicate_stays_single_broadcast_join(spark):
    # OR-of-ANDs predicate must not break the broadcast join or drop
    # to Python; the part filter cannot push (disjunction spans both
    # sides) but the join is still one broadcast hash join
    a = audit_plan(relational.q19_disjunctive_revenue(spark, SF))
    a.assert_broadcasts(1)
    a.assert_no_python()


def test_q4_semi_join_no_row_explosion(spark):
    a = audit_plan(relational.q4_order_priority(spark, SF))
    a.assert_no_python()
    # date-range filter reaches the orders scan
    a.assert_pushed("GreaterThanOrEqual(o_orderdate")


def test_q22_anti_join_broadcasts_scalar(spark):
    a = audit_plan(relational.q22_sales_opportunity(spark, SF))
    a.assert_no_python()
    a.assert_broadcasts(2)  # scalar avg frame + nation dim


def test_tfidf_broadcasts_scalar_frame(spark):
    from decisions_kinesis_spark.operators import textops

    a = audit_plan(textops.text_tfidf_topk(spark, SF))
    # N-docs scalar frame is always broadcast; the vocabulary-sized
    # doc-freq frame is deliberately NOT forced (AQE decides)
    a.assert_broadcasts(1)
    a.assert_no_python()


def test_ivf_broadcasts_centroids_and_queries(spark):
    # The seeded assignment is materialized at construction (r13: its
    # 2-3 consumers each replayed the N·√N pass), so the probe plan
    # reads it as an RDD scan — the centroid broadcast lives in the
    # materialization job, the query-frame broadcast in the probe.
    a = audit_plan(similarity.ann_ivf_topk(spark, SF))
    a.assert_broadcasts(1)  # query frame (probe side)
    assert "Scan ExistingRDD" in a.plan  # materialized assignment
    assert "Scan parquet" not in a.plan  # no corpus re-scan in the tail
    a.assert_no_python()


def test_funnel_pushes_type_filters(spark):
    from decisions_kinesis_spark.operators import windows_ext

    a = audit_plan(windows_ext.events_funnel_conversion(spark, SF))
    a.assert_pushed("EqualTo(event_type,signup)", "EqualTo(event_type,purchase)")
    a.assert_no_python()


def test_asof_union_carry_single_shuffle_sort(spark):
    a = audit_plan(asof_join_events_orders(spark, SF))
    a.assert_no_python()
    # one exchange per union branch on user_id, then the window sort —
    # no join explosion, no Python
    a.assert_max_shuffles(2)


def test_filter_compiler_stays_codegen(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    filters = [
        PayloadFilter("k", FilterVerb.GREATER_THAN, "10"),
        PayloadFilter("k", FilterVerb.LESS_THAN, "90"),
        PayloadFilter("k", FilterVerb.CONTAINS_CI, "5"),
    ]
    a = audit_plan(apply_payload_filters(ev, "props", filters))
    a.assert_no_python()
    assert a.codegen_spans >= 1
    assert a.shuffles == 0


def test_ann_uses_broadcast_not_shuffle_join(spark):
    a = audit_plan(similarity.ann_cosine_topk(spark, SF))
    a.assert_broadcasts(1)  # query side broadcast against the corpus
    a.assert_no_python()


def test_decontam_broadcasts_eval_gram_set(spark):
    from decisions_kinesis_spark.operators import corpus

    a = audit_plan(corpus.decontam_eval_overlap(spark, SF))
    a.assert_broadcasts(1)  # eval gram set; train side never shuffles for it
    a.assert_no_python()


def test_decontam_falls_back_to_shuffle_join_above_limit(spark, monkeypatch):
    """The eval-gram broadcast is count-gated.  Auto-broadcast is
    disabled for the whole test so ONLY the gate's explicit hint can
    broadcast: below the limit the hint still forces the broadcast;
    with the limit forced to 0 the hint disappears and the join
    degrades to a shuffled equi-join on the 8-byte gram key instead of
    broadcasting an arbitrarily large eval side.  (At sf fixtures the
    planner would auto-broadcast the tiny frame either way — that's
    the planner sizing real data, not the operator forcing it.)"""
    from decisions_kinesis_spark.operators import corpus

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = audit_plan(corpus.decontam_eval_overlap(spark, SF))
        a.assert_broadcasts(1)  # hinted: broadcasts despite threshold -1
        a.assert_no_python()
        monkeypatch.setattr(corpus, "_EVAL_BCAST_LIMIT", 0)
        a = audit_plan(corpus.decontam_eval_overlap(spark, SF))
        assert a.broadcast_joins == 0, "eval side must not broadcast above limit"
        a.assert_no_python()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_semdedup_broadcasts_centroids_single_bounded_shuffle(spark):
    a = audit_plan(similarity.semdedup_prune(spark, SF))
    a.assert_broadcasts(1)  # centroid frame; the corpus never shuffles to assign
    a.assert_no_python()
    # argmin groupBy + the per-cell ranking window — nothing else
    a.assert_max_shuffles(2)


def test_ivf_refined_mean_keeps_partial_aggregation(spark):
    """The Lloyd mean must reduce map-side: integer-quantized member
    sums (partial_sum in the plan), never a per-member collect_list
    (the pre-round-4 ordered fold gathered every cell member per
    dimension, disabling partial aggregation)."""
    refined = similarity._ivf_refined_centroids(spark, SF)
    plan = refined._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan, "member sum lost partial aggregation"
    assert "collect_list(struct(vec_id" not in plan, (
        "per-member collect_list resurfaced in the Lloyd mean"
    )
    audit_plan(refined).assert_no_python()


def test_tokenizer_broadcasts_vocab_row(spark):
    from decisions_kinesis_spark.operators import corpus

    a = audit_plan(corpus.tokenize_bpe_greedy(spark, SF))
    a.assert_broadcasts(1)  # one-row vocabulary frame
    a.assert_no_python()


def test_mixture_weights_broadcast_total(spark):
    from decisions_kinesis_spark.operators import corpus

    a = audit_plan(corpus.mix_domain_weights(spark, SF))
    a.assert_broadcasts(1)  # single-row corpus-total frame
    a.assert_no_python()


def test_every_registered_query_plan_is_clean(spark):
    """Global plan hygiene: NO registered query may contain row-at-a-time
    Python (BatchEvalPython) or an unintended CartesianProduct.  Arrow
    paths (ArrowEvalPython / FlatMapsInPandas / MapInPandas) are the
    sanctioned Python tiers; broadcast nested-loop joins against tiny
    broadcast frames (scalar aggregates, centroid sets) are intended."""
    import __spark_entry__ as entry

    for name, fn in entry.queries().items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, f"{name} uses row-Python"
        assert "CartesianProduct" not in plan, f"{name} has a cartesian product"


def test_pandas_paths_are_arrow_not_row_python(spark):
    from decisions_kinesis_spark.operators.asof import (
        asof_join_events_orders_pandas,
    )

    a = audit_plan(asof_join_events_orders_pandas(spark, SF))
    assert a.arrow_eval  # cogroup runs via Arrow
    assert not a.python_eval  # never row-at-a-time


def test_events_scan_prunes_props_when_unused(spark):
    ev = load_table(spark, "events", SF)
    a = audit_plan(ev.groupBy("event_type").count())
    a.assert_pruned_to(0, 1)


def test_repetition_gate_two_bounded_shuffles_no_python(spark):
    from decisions_kinesis_spark.operators import corpus

    a = audit_plan(corpus.quality_repetition_flags(spark, SF))
    a.assert_no_python()
    # gram counts + per-doc pivot + the doc_chars join — nothing
    # corpus-sized funnels through one reducer
    a.assert_max_shuffles(4)


def test_interpolated_lm_broadcasts_total_only(spark):
    from decisions_kinesis_spark.operators import corpus

    a = audit_plan(corpus.lm_interpolated_score(spark, SF))
    a.assert_no_python()
    a.assert_broadcasts(1)  # the 1-row token total; vocab joins AQE-sized


def test_iterated_tokenizer_broadcasts_unit_row(spark):
    from decisions_kinesis_spark.operators import corpus

    a = audit_plan(corpus.tokenize_bpe_iterative(spark, SF))
    a.assert_no_python()
    # mined-unit array is one broadcast row, exactly like the
    # single-round tokenizer's vocabulary
    assert a.broadcast_joins >= 1


def test_leakage_report_prunes_train_side_with_broadcast(spark):
    from decisions_kinesis_spark.operators import corpus

    a = audit_plan(corpus.decontam_leakage_by_eval(spark, SF))
    a.assert_no_python()
    # eval gram set + hits frame both broadcast under the count gate:
    # the training side never shuffles before the scan-side prune
    assert a.broadcast_joins >= 2


def test_ppm_feature_extract_is_arrow_map_only(spark):
    from decisions_kinesis_spark.operators import multimodal

    a = audit_plan(multimodal.multimodal_feature_extract(spark, SF))
    assert a.arrow_eval  # mapInPandas decode tier
    assert not a.python_eval  # never row-at-a-time
    assert a.shuffles == 0  # pure per-partition map


def test_ivf_pq_probe_joins_codes_not_vectors(spark):
    """IVF-PQ ADC (similarity.ann_ivf_pq): the probe phase must ride
    broadcast joins (codebook, candidate ids, ADC table, shortlist,
    query frame) — the corpus shuffles only for the map-side-combining
    argmin groupBys (cell + code assignment) and the two tiny top-R /
    top-k windows, never to move full vectors through a shuffled
    pair join."""
    a = audit_plan(similarity.ann_ivf_pq(spark, SF))
    a.assert_no_python()
    # centroids + codebook + cand ids + ADC table + shortlist + q ≥ 6
    assert a.broadcast_joins >= 6
    assert "CartesianProduct" not in a.plan


def test_fuzzy_decontam_broadcasts_eval_side(spark):
    """Fuzzy decontamination (corpus.decontam_minhash_fuzzy): the
    benchmark side's band table, shingle set, and size frame broadcast;
    the training corpus is pruned by band collision before the
    exact-Jaccard verification — never an all-pairs or shuffled
    train-vs-eval join."""
    from decisions_kinesis_spark.operators import corpus

    a = audit_plan(corpus.decontam_minhash_fuzzy(spark, SF))
    a.assert_no_python()
    assert a.broadcast_joins >= 3  # eval bands + eval shingles + eval sizes
    assert "CartesianProduct" not in a.plan


def test_classifier_apply_broadcasts_weight_table(spark):
    """quality_classifier_score: the 4096-row weight table broadcasts
    against the token stream; the corpus shuffles only for the per-doc
    sum (map-side combining)."""
    from decisions_kinesis_spark.operators import corpus

    a = audit_plan(corpus.quality_classifier_score(spark, SF))
    a.assert_no_python()
    a.assert_broadcasts(1)
    a.assert_max_shuffles(1)


def test_budget_plan_single_corpus_pass(spark):
    """token_budget_plan: one corpus aggregation; totals ride 1-row
    broadcasts — no second corpus scan."""
    from decisions_kinesis_spark.operators import corpus

    a = audit_plan(corpus.token_budget_plan(spark, SF))
    a.assert_no_python()
    assert a.broadcast_joins >= 2  # total_tokens + w_sum


def test_hybrid_rrf_fuses_bounded_frames(spark):
    """retrieval_hybrid_rrf: both rankers join the query-term frame by
    broadcast and reduce map-side; the fusion joins two ≤ queries×k
    row frames — no cartesian, no Python."""
    from decisions_kinesis_spark.operators import textops

    a = audit_plan(textops.retrieval_hybrid_rrf(spark, SF))
    a.assert_no_python()
    assert a.broadcast_joins >= 3  # query terms ×2 rankers + 1-row stats
    assert "CartesianProduct" not in a.plan


def test_quality_keeper_is_agg_join_not_window(spark):
    """dedup_quality_keeper: keeper selection must be the
    map-side-combining max_by agg + equi-join-back shape (the
    dedup_exact discipline), never a window over cluster ids that
    piles a hot cluster into one partition."""
    from decisions_kinesis_spark.operators import dedup

    a = audit_plan(dedup.dedup_quality_keeper(spark, SF))
    a.assert_no_python()
    plan = a.plan
    assert "max_by" in plan
    assert "CartesianProduct" not in plan


def test_kmv_sketch_uses_window_group_limit(spark):
    """agg_kmv_distinct: the k-smallest-per-group rank must compile to
    a WindowGroupLimit plan (per-partition partial top-k before the
    shuffle), not a whole-group sort."""
    from decisions_kinesis_spark.operators import relational

    a = audit_plan(relational.agg_kmv_distinct(spark, SF))
    a.assert_no_python()
    assert "WindowGroupLimit" in a.plan


def test_gapfill_grid_from_span_frame_not_corpus(spark):
    """events_gapfill_locf: the dense grid is generated from the
    |types|-row span frame; the corpus contributes one aggregation
    and is never exploded."""
    from decisions_kinesis_spark.operators import windows_ext

    a = audit_plan(windows_ext.events_gapfill_locf(spark, SF))
    a.assert_no_python()
    assert "CartesianProduct" not in a.plan


def test_kmv_set_ops_reuses_hash_frame(spark):
    """agg_kmv_set_ops: per-pair k-smallest is WindowGroupLimit; no
    cartesian; the pair table broadcasts."""
    from decisions_kinesis_spark.operators import relational

    a = audit_plan(relational.agg_kmv_set_ops(spark, SF))
    a.assert_no_python()
    # r13: the hash frame and the per-pair bottom-k members are
    # materialized at construction (multi-consumer frames) — the
    # WindowGroupLimit bottom-k runs in the members job; the report
    # plan reads the materialized frames as RDD scans
    assert "Scan ExistingRDD" in a.plan
    assert "CartesianProduct" not in a.plan
    assert a.broadcast_joins >= 1


def test_fuzzy_match_broadcasts_dirty_probe_side(spark):
    """fuzzy_match_suppliers: the dirty probe set broadcasts; pairs
    exist only inside nation blocks (no cartesian); best match is a
    map-side-combining min_by, not a window."""
    from decisions_kinesis_spark.operators import relational

    a = audit_plan(relational.fuzzy_match_suppliers(spark, SF))
    a.assert_no_python()
    a.assert_broadcasts(1)
    assert "CartesianProduct" not in a.plan
    assert "min_by" in a.plan


def test_wav_feature_extract_is_arrow_map_only(spark):
    from decisions_kinesis_spark.operators import multimodal

    a = audit_plan(multimodal.multimodal_audio_features(spark, SF))
    assert a.arrow_eval  # mapInPandas decode tier
    assert not a.python_eval  # never row-at-a-time
    assert a.shuffles == 0  # pure per-partition map


def test_resize_is_arrow_map_only(spark):
    from decisions_kinesis_spark.operators import multimodal

    a = audit_plan(multimodal.multimodal_resize_stats(spark, SF))
    assert a.arrow_eval and not a.python_eval
    assert a.shuffles == 0


def test_cdc_merge_broadcasts_change_batch(spark):
    """cdc_upsert_orders: the change batch and the 1-row offset
    broadcast against the base (the copy-on-write merge join); the
    base never shuffles."""
    from decisions_kinesis_spark.operators import relational

    a = audit_plan(relational.cdc_upsert_orders(spark, SF))
    a.assert_no_python()
    assert a.broadcast_joins >= 2  # changes + offset
    assert "CartesianProduct" not in a.plan


def test_mad_outliers_single_flag_pass(spark):
    """events_mad_outliers: median and MAD frames broadcast back; the
    flag count folds into ONE aggregation over the joined dev frame
    (no second percentile pipeline)."""
    from decisions_kinesis_spark.operators import windows_ext

    a = audit_plan(windows_ext.events_mad_outliers(spark, SF))
    a.assert_no_python()
    assert a.broadcast_joins >= 2  # med frame + mad frame
    assert "CartesianProduct" not in a.plan


def test_udtf_exchange_is_python_stage_width(spark):
    """When the session's shuffle width covers the wanted Python width,
    the UDTF input is ONE explicit REPARTITION_BY_NUM exchange at
    exactly spark.sql.shuffle.partitions — the count match is what
    lets EnsureRequirements elide the UDTF's own REPARTITION_BY_COL
    exchange (HashPartitioning.semanticEquals includes the partition
    COUNT, so any other number plans two full shuffles)."""
    from decisions_kinesis_spark.operators import udfs

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    width = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        a = audit_plan(udfs.udtf_window_stats(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert f"{width}), REPARTITION_BY_NUM" in a.plan, a.plan
    assert a.plan.count("Exchange") == 1, a.plan
    assert "ArrowEvalPythonUDTF" in a.plan


def test_udtf_narrow_session_keeps_single_exchange(spark):
    """When the session's shuffle width is BELOW the wanted Python
    width, a pre-exchange cannot widen the Python stage — the UDTF's
    own PARTITION BY exchange re-partitions the rows regardless — so
    repartition_for_python backs off and the plan carries exactly ONE
    exchange instead of two full shuffles of the same rows.  The
    narrow width is set EXPLICITLY (ADVICE r13: relying on the suite
    default of 8 being < defaultParallelism breaks on ≤8-core boxes)."""
    from decisions_kinesis_spark.operators import udfs

    if spark.sparkContext.defaultParallelism < 2:
        pytest.skip("no width below defaultParallelism on a 1-core box")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    narrow = max(1, spark.sparkContext.defaultParallelism // 2)
    spark.conf.set("spark.sql.shuffle.partitions", str(narrow))
    try:
        a = audit_plan(udfs.udtf_window_stats(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a.plan.count("Exchange") == 1, a.plan
    assert "REPARTITION_BY_COL" in a.plan
    assert "ArrowEvalPythonUDTF" in a.plan


def test_repartition_for_python_matches_session_shuffle_width(spark):
    from decisions_kinesis_spark.functions.parallel import repartition_for_python

    want = spark.sparkContext.defaultParallelism
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * want))
    try:
        wide = repartition_for_python(spark.range(100), "id")
        # covered session: exactly the shuffle width (count match → the
        # downstream REPARTITION_BY_COL exchange can be elided)
        assert wide.rdd.getNumPartitions() == 2 * want
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # narrow session: unchanged input — a pre-shuffle could not widen
    # the Python stage here.  Width set explicitly below the wanted
    # width (ADVICE r13: the suite default of 8 is not narrow on
    # ≤8-core boxes).
    narrow = max(1, want // 2)
    spark.conf.set("spark.sql.shuffle.partitions", str(narrow))
    try:
        base = spark.range(100)
        assert (
            repartition_for_python(base, "id").rdd.getNumPartitions()
            == base.rdd.getNumPartitions()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
