"""Physical-plan regression tests: the scale properties BENCH/PLANS.md
documents, locked in as assertions so a refactor can't silently
reintroduce a shuffle, a global single-partition exchange, or a
text-keyed wide exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mapside_ops_have_zero_exchanges(docs):
    from rdf_indexes_spark.operators.sampling import hash_sample
    from rdf_indexes_spark.operators.textops import chunk_documents, redact_pii

    for name, df in (
        ("chunk_documents", chunk_documents(docs, 32, 24)),
        ("redact_pii", redact_pii(docs)),
        ("hash_sample", hash_sample(docs, 0.25)),
    ):
        p = _plan(df)
        assert "Exchange" not in p, f"{name} grew a shuffle:\n{p[:1500]}"


def test_duplicate_spans_shuffles_only_hashes(docs):
    """The one wide exchange keys on the two fingerprint longs — token
    arrays and window text must never appear in an exchange."""
    from rdf_indexes_spark.operators.dedup import duplicate_spans

    p = _plan(duplicate_spans(docs, k=8))
    ex = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert ex, p[:1500]
    for l in ex:
        assert "_h0" in l and "_h1" in l, l
        assert "_ts" not in l and "text" not in l, l


def test_pack_sequences_has_no_global_window(docs):
    """The prefix sum must stay two-phase: range exchange yes, but no
    Exchange SinglePartition (the global-window trap)."""
    from rdf_indexes_spark.operators.textops import pack_sequences

    p = _plan(pack_sequences(docs, target_tokens=500, num_partitions=8))
    # (the range exchange runs above the localCheckpoint cut, so it is
    # not in this plan; what must NEVER appear is the naive global
    # window's Exchange SinglePartition)
    assert "SinglePartition" not in p, p[:2000]
    assert "Window" in p and "_pid" in p, p[:1500]  # per-partition scan phase


def test_sessionize_single_keyed_exchange(spark):
    from rdf_indexes_spark.operators.dialogue import sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts"
    )
    p = _plan(sessionize(ev, key_col="user_id", gap="30 minutes"))
    assert p.count("Exchange hashpartitioning") <= 2  # partial+final agg pair
    assert "SinglePartition" not in p


def test_winnow_array_path_zero_exchanges(docs):
    from rdf_indexes_spark.operators.dedup import winnow_fingerprints

    p = _plan(winnow_fingerprints(docs, k=5, w=4))
    assert "Exchange" not in p, p[:1500]


def test_decontaminate_broadcasts_bench_and_never_ships_text(docs):
    """Benchmark grams ride a BroadcastExchange; the corpus side's only
    wide exchange is the per-doc aggregation keyed on doc_id — document
    text must never appear in any exchange."""
    from rdf_indexes_spark.operators.contamination import decontaminate

    df = decontaminate(
        docs.filter("doc_id % 19 != 0"), docs.filter("doc_id % 19 = 0"), n=3
    )
    p = _plan(df)
    assert "BroadcastExchange" in p, p[:2000]
    for l in p.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "text" not in l, l


def test_remove_spans_never_ships_text_wide(docs):
    from rdf_indexes_spark.operators.contamination import (
        remove_contaminated_spans,
    )

    df = remove_contaminated_spans(
        docs.filter("doc_id % 19 != 0"), docs.filter("doc_id % 19 = 0"), n=3
    )
    p = _plan(df)
    assert "BroadcastExchange" in p, p[:2000]
    for l in p.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "text#" not in l, l


def test_weighted_sampling_ops_zero_exchange(docs):
    from rdf_indexes_spark.operators.sampling import upsample, weighted_sample

    w = docs.withColumn("w", F.least(F.col("n_chars") / F.lit(1000.0), F.lit(1.0)))
    for name, df in (
        ("weighted_sample", weighted_sample(w, "w")),
        ("upsample", upsample(w, "w")),
    ):
        p = _plan(df)
        assert "Exchange" not in p, f"{name} grew a shuffle:\n{p[:1500]}"


def test_triangle_count_no_cartesian_no_global_exchange(spark):
    from rdf_indexes_spark.operators.graph import triangle_count

    e = spark.createDataFrame(
        [(i, (i * 7 + 3) % 50) for i in range(200)], "src long, dst long"
    )
    p = _plan(triangle_count(e))
    # all three triangle joins are hash equi-joins on node keys — a
    # cartesian or nested-loop join here would be quadratic in |V|
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # no single-partition global exchange anywhere
    assert "SinglePartition" not in p


def test_c4_clean_zero_exchange(docs):
    from rdf_indexes_spark.operators.textops import c4_clean

    p = _plan(c4_clean(docs))
    assert "Exchange" not in p, f"c4_clean grew a shuffle:\n{p[:1500]}"


def test_cooccurrence_no_text_in_wide_exchanges(spark):
    """Pair expansion joins on the group key and aggregates on item
    pairs — hash partitioned exchanges only, no single-partition funnel
    except the broadcast one-row total."""
    from rdf_indexes_spark.operators.graph import cooccurrence_counts

    df = spark.createDataFrame(
        [(i % 17, f"t{i % 7}") for i in range(300)], "group_id long, item string"
    )
    p = _plan(cooccurrence_counts(df))
    assert "CartesianProduct" not in p
    # the only nested-loop join is the broadcast of the one-row n_groups
    assert p.count("BroadcastNestedLoopJoin") <= 1


def test_fim_transform_zero_exchange(docs):
    from rdf_indexes_spark.operators.textops import fim_transform

    p = _plan(fim_transform(docs, rate=0.5))
    assert "Exchange" not in p, p[:1500]


def test_render_chat_single_keyed_exchange(spark):
    """Render = ONE conversation-keyed hash exchange (sort_array inside
    the aggregate — no sort exchange, no window)."""
    from rdf_indexes_spark.operators.dialogue import render_chat

    df = spark.createDataFrame(
        [("c", 0, "user", "x")], "conv_id string, turn_idx long, role string, text string"
    )
    p = _plan(render_chat(df))
    assert p.count("Exchange hashpartitioning") == 1, p[:2000]
    assert "SinglePartition" not in p


def test_loss_spans_no_text_in_exchange(spark):
    """Offsets ride as precomputed lengths: the window exchange carries
    longs, never the turn text."""
    from rdf_indexes_spark.operators.dialogue import loss_spans

    df = spark.createDataFrame(
        [("c", 0, "assistant", "x")],
        "conv_id string, turn_idx long, role string, text string",
    )
    p = _plan(loss_spans(df))
    ex = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert ex, p[:1500]
    for l in ex:
        assert "text" not in l, l


def test_predicate_profile_no_single_partition(spark):
    """Both groupings are (p, ·)-keyed hash aggregates; the final join
    of two |P|-sized frames must not collapse to SinglePartition on the
    data path (SMJ/SHJ/BHJ all fine)."""
    from rdf_indexes_spark.operators.schema import predicate_profile

    df = spark.createDataFrame([("a", "p", "b")], "s string, p string, o string")
    p = _plan(predicate_profile(df))
    assert "Exchange SinglePartition" not in p, p[:2000]
    assert "CartesianProduct" not in p


def test_conversation_census_single_exchange(spark):
    """Both census ops are one keyed hash aggregate — exactly one data
    exchange, no window, no SinglePartition."""
    import datetime as dt

    from rdf_indexes_spark.operators.dialogue import conversation_stats, tool_stats

    df = spark.createDataFrame(
        [("c", 0, "user", "x", None, dt.datetime(2024, 1, 1))],
        "conv_id string, turn_idx long, role string, text string, tool string, ts timestamp",
    )
    for name, out in (
        ("conversation_stats", conversation_stats(df)),
        ("tool_stats", tool_stats(df)),
    ):
        p = _plan(out)
        # the countDistinct expand legitimately adds its own keyed
        # exchange; anything beyond the agg pair is a regression
        assert p.count("Exchange hashpartitioning") <= 2, f"{name}:\n{p[:2000]}"
        assert "SinglePartition" not in p, name
        assert "Window" not in p, name


def test_fact_provenance_single_exchange(spark):
    import datetime as dt

    from rdf_indexes_spark.operators.schema import current_facts, fact_provenance

    df = spark.createDataFrame(
        [("a", "p", "b", "c1", dt.datetime(2024, 1, 1))],
        "s string, p string, o string, conv_id string, ts timestamp",
    )
    # fact_provenance pays the countDistinct expand (2 exchanges);
    # current_facts is a plain max_by aggregate (exactly 1)
    assert _plan(fact_provenance(df)).count("Exchange hashpartitioning") == 2
    pc = _plan(current_facts(df.drop("conv_id")))
    assert pc.count("Exchange hashpartitioning") == 1, pc[:2000]
    for p in (_plan(fact_provenance(df)), pc):
        assert "SinglePartition" not in p


def test_negative_samples_no_cartesian(spark):
    """Draw resolution is equi-joins only — no cartesian/nested-loop
    anywhere in the plan."""
    from rdf_indexes_spark.operators.sampling import negative_samples

    df = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 11), (3, 1, 12)], "s long, p long, o long"
    )
    p = _plan(negative_samples(df, n_neg=2))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]


def test_asof_join_union_scan_plan(spark):
    """The as-of join must be the union-and-scan plan: ONE keyed
    exchange + window — never an inequality join (no cartesian, no
    BroadcastNestedLoop, no SortMergeJoin at all)."""
    import datetime as dt

    from rdf_indexes_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1), 1)], "key string, ts timestamp, x int"
    )
    right = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1), "v")], "key string, ts timestamp, v string"
    )
    p = _plan(asof_join(left, right, on=["key"]))
    assert p.count("Exchange hashpartitioning") == 1, p[:2000]
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
                "SinglePartition"):
        assert bad not in p, f"{bad} in plan:\n{p[:2000]}"


def test_interval_join_equi_only(spark):
    """The range join must plan as an equi-join on (keys, bin) — no
    nested-loop, no cartesian, no inequality join."""
    from rdf_indexes_spark.operators.temporal import interval_point_join

    pts = spark.createDataFrame([("k", 5, 1)], "key string, t long, pid long")
    ivs = spark.createDataFrame([("k", 0, 10, 1)], "key string, lo long, hi long, iid long")
    p = _plan(interval_point_join(pts, ivs, "t", "lo", "hi", on=["key"]))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in p, f"{bad} in plan:\n{p[:2000]}"
    assert "_bin" in p


def test_rdfs_closure_broadcasts_schema_side(spark):
    """The instance-scale typing join must be a BroadcastHashJoin on the
    schema-sized closure — never a sort-merge/cartesian over instances."""
    from rdf_indexes_spark.operators.schema import rdfs_closure

    df = spark.createDataFrame(
        [("a", "sub", "b"), ("x", "type", "a")], "s string, p string, o string"
    )
    p = _plan(rdfs_closure(df, "sub", "type"))
    assert "BroadcastHashJoin" in p, p[:2000]
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in p, f"{bad} in plan:\n{p[:2000]}"


def test_smush_rewrite_joins_are_broadcast(spark):
    """The corpus-scale rewrite must be two BroadcastHashJoins against
    the checkpointed class map — never a shuffle of the fact stream."""
    from rdf_indexes_spark.operators.canonicalize import smush

    df = spark.createDataFrame(
        [("a2", "sameAs", "a1"), ("a2", "knows", "b")],
        "s string, p string, o string",
    )
    p = _plan(smush(df, "sameAs"))
    assert p.count("BroadcastHashJoin") >= 2, p[:2000]
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in p, f"{bad} in plan:\n{p[:2000]}"


def test_rhodf_rules_join_broadcast_only(spark):
    """Every ρdf rule joins the instance stream against a broadcast
    schema frame; the only wide exchange is the final dedup."""
    from rdf_indexes_spark.operators.schema import rhodf_entailment

    df = spark.createDataFrame(
        [("w", "sp", "r"), ("w", "dom", "C"), ("a", "w", "b")],
        "s string, p string, o string",
    )
    p = _plan(rhodf_entailment(df, "sc", "sp", "dom", "rng", "type"))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in p, f"{bad} in plan:\n{p[:2000]}"
    assert p.count("Exchange hashpartitioning") == 1, p[:2000]


def test_property_table_single_aggregate(spark):
    """The pivot must plan as ONE hash-aggregate pair (partial+final,
    one exchange) with the predicate filter pushed — no per-predicate
    join fan-out and no extra distinct-values job."""
    from rdf_indexes_spark.operators.schema import property_table

    df = spark.createDataFrame(
        [("e", "a", "1"), ("e", "b", "2")], "s string, p string, o string"
    )
    p = _plan(property_table(df, ["a", "b"]))
    assert p.count("Exchange hashpartitioning") == 1, p[:1500]
    assert "Join" not in p, p[:1500]
    assert "partial_min" in p, p[:1500]  # map-side combine before the wire
    # numeric payloads must stay in HashAggregate (string min is
    # inherently sort-based in Spark — fixed-width buffers only)
    dfl = spark.createDataFrame([("e", "a", 1)], "s string, p string, o long")
    pl = _plan(property_table(dfl, ["a", "b"]))
    assert "HashAggregate" in pl and "SortAggregate" not in pl, pl[:1500]


def test_stratified_sample_window_group_limit(docs):
    """The row_number filter must infer WindowGroupLimit so map tasks
    pre-prune to local top-n before the stratum exchange."""
    from rdf_indexes_spark.operators.sampling import stratified_sample

    p = _plan(stratified_sample(docs, 5, "lang"))
    assert "WindowGroupLimit" in p, p[:2000]
    assert p.count("Exchange hashpartitioning") == 1, p[:2000]


def test_time_resample_corpus_crosses_once(spark):
    """One corpus-scale aggregate; span/grid frames are bucket-scale.
    The grid join must be an equi-join, never a nested loop."""
    from rdf_indexes_spark.operators.temporal import time_resample

    df = spark.createDataFrame([("a", 100, 2)], "k string, t long, v long")
    p = _plan(time_resample(df, "t", 10, ["k"], "v"))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in p, f"{bad} in plan:\n{p[:2000]}"
    assert "partial_count" in p, p[:2000]  # map-side combine on the corpus agg


def test_grouped_quantiles_single_exchange(spark):
    from rdf_indexes_spark.functions.ranking import grouped_quantiles

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    p = _plan(grouped_quantiles(df, ["g"], "v"))
    assert p.count("Exchange hashpartitioning") == 1, p[:2000]
    assert "Join" not in p, p[:2000]


def test_trailing_counts_single_window_exchange(spark):
    """One key-partitioned exchange; no self-join, no explode."""
    from rdf_indexes_spark.operators.temporal import trailing_counts

    df = spark.createDataFrame([("u", 100, 1)], "k string, t long, v long")
    p = _plan(trailing_counts(df, "t", ["k"], 60, "v"))
    assert p.count("Exchange hashpartitioning") == 1, p[:1500]
    assert "Join" not in p and "Generate" not in p, p[:1500]


def test_keep_best_single_aggregate_no_window(docs):
    """Survivor dedup is one partial+final max_by aggregate — no window
    (whole-group sort), no join-back."""
    from rdf_indexes_spark.operators.dedup import keep_best

    p = _plan(keep_best(docs, ["lang", "source"], "n_chars"))
    assert p.count("Exchange hashpartitioning") == 1, p[:1500]
    assert "Window" not in p and "Join" not in p, p[:1500]
    assert "partial_max" in p, p[:1500]


def test_lm_surprisal_no_python_and_long_exchanges(docs):
    """LM training + scoring stay whole-JVM (no BatchEvalPython) and the
    scoring joins exchange count payloads, never document text."""
    from rdf_indexes_spark.operators.textops import lm_bigram_surprisal

    p = _plan(lm_bigram_surprisal(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p[:1500]
    for l in p.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "text" not in l, l


def test_vote_classifier_no_python_and_broadcast_totals(docs):
    """Classifier plan: JVM-only; the N/V totals ride a broadcast (no
    corpus-sized exchange for the 1-row frame)."""
    from rdf_indexes_spark.operators.textops import vote_quality_classifier

    pos = docs.filter(F.col("doc_id") % 7 == 0)
    neg = docs.filter(F.col("doc_id") % 7 != 0)
    p = _plan(vote_quality_classifier(docs, pos, neg))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p[:1500]
    assert "BroadcastExchange" in p, p[:1500]


def test_source_overlap_exchanges_carry_hashed_longs(docs):
    """The distinct and the pair join must key on the 8-byte gram hash —
    gram strings (or text) in a wide exchange would defeat the one-pass
    keyed generation."""
    from rdf_indexes_spark.operators.contamination import source_overlap

    p = _plan(source_overlap(docs))
    ex = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert ex, p[:1500]
    for l in ex:
        assert "text" not in l, l
    # the generate emits bigint gram keys, not strings
    assert "xxhash64(array_join" in p, p[:2000]
