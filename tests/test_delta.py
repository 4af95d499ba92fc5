"""Incremental ingest (delta.merge_delta / compact): id stability,
triple-set equality vs batch-local rebuilds, append-generation reads,
quarantine mode, and multi-level merges."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from rdf_indexes_spark import delta as dl
from rdf_indexes_spark.pipeline import run_pipeline
from rdf_indexes_spark.plans.router import select
from rdf_indexes_spark.synth import generate


def _decoded(spark, ranked, triples):
    """triples (s,p,o ids) → string triples via the (role, term, id) dict."""
    out = triples
    for role, col in (("s", "s"), ("p", "p"), ("o", "o")):
        v = ranked.filter(F.col("role") == role).select(
            F.col("id").alias(col), F.col("term").alias(f"{col}_term")
        )
        out = out.join(v, col)
    return {
        (r["s_term"], r["p_term"], r["o_term"])
        for r in out.select("s_term", "p_term", "o_term").collect()
    }


@pytest.fixture(scope="module")
def base_and_delta(spark):
    a = spark.createDataFrame(generate(400, seed=21).transcripts)
    b = spark.createDataFrame(generate(250, seed=22).transcripts)
    wd = tempfile.mkdtemp(prefix="delta_base_")
    art = run_pipeline(spark, a, wd, num_partitions=8, input_id="a")
    counters = dl.merge_delta(spark, wd, b, num_partitions=8, delta_id="b")
    return a, b, wd, art, counters


def test_merged_triples_equal_union_of_batch_local_runs(spark, base_and_delta):
    a, b, wd, art, counters = base_and_delta
    # the documented contract: merge == base ∪ (delta run batch-locally),
    # decoded to strings (ids differ between the two dictionaries)
    solo_wd = tempfile.mkdtemp(prefix="delta_solo_")
    solo = run_pipeline(spark, b, solo_wd, num_partitions=8, input_id="b")
    ranked, triples, _ = dl.read_index(spark, wd)
    got = _decoded(spark, ranked, triples)
    base_dec = _decoded(
        spark,
        spark.read.parquet(os.path.join(wd, "vocabs_ranked")),
        art.triples,
    )
    solo_dec = _decoded(
        spark,
        spark.read.parquet(os.path.join(solo_wd, "vocabs_ranked")),
        solo.triples,
    )
    assert got == base_dec | solo_dec
    assert counters["total_triples"] == len(got)
    assert counters["new_triples"] == len(got) - len(base_dec)


def test_id_stability_and_density(spark, base_and_delta):
    _, _, wd, _, _ = base_and_delta
    base = spark.read.parquet(os.path.join(wd, "vocabs_ranked")).select(
        "role", "term", F.col("id").alias("base_id")
    )
    merged = dl.read_vocab_ranked(spark, wd)
    # every base (role, term) keeps its id
    changed = (
        base.join(merged, ["role", "term"])
        .filter(F.col("base_id") != F.col("id"))
        .count()
    )
    assert changed == 0
    # per role: ids are exactly 0..n-1 (dense, no collision with new ids)
    for r in merged.groupBy("role").agg(
        F.count("*").alias("n"),
        F.countDistinct("id").alias("d"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    ).collect():
        assert r["n"] == r["d"] == r["hi"] + 1 and r["lo"] == 0


def test_appended_generations_answer_router_queries(spark, base_and_delta):
    _, _, wd, _, _ = base_and_delta
    ranked, triples, tables = dl.read_index(spark, wd)
    want = {(r["s"], r["p"], r["o"]) for r in triples.collect()}
    # every permutation table carries the full merged set
    for name, t in tables.items():
        assert {(r["s"], r["p"], r["o"]) for r in t.collect()} == want, name
    # a routed pattern query over the multi-generation layout
    some = triples.first()
    got = {tuple(r) for r in select(tables, s=some["s"]).collect()}
    assert got == {t for t in want if t[0] == some["s"]}


def test_second_merge_offsets_past_first_level(spark, base_and_delta):
    _, _, wd, _, _ = base_and_delta
    c = spark.createDataFrame(generate(150, seed=23).transcripts)
    before = dl.read_vocab_ranked(spark, wd)
    sizes = {r["role"]: r["n"] for r in before.groupBy("role").agg(F.count("*").alias("n")).collect()}
    counters = dl.merge_delta(spark, wd, c, num_partitions=8, delta_id="c")
    merged = dl.read_vocab_ranked(spark, wd)
    for r in merged.groupBy("role").agg(
        F.count("*").alias("n"), F.countDistinct("id").alias("d"), F.max("id").alias("hi")
    ).collect():
        assert r["n"] == r["d"] == r["hi"] + 1
        assert r["n"] >= sizes[r["role"]]
    assert len(dl._levels(wd)) == 2
    assert counters["total_triples"] == dl.read_triples(spark, wd).count()


def test_compact_collapses_generations(spark, base_and_delta):
    _, _, wd, _, _ = base_and_delta
    _, triples, _ = dl.read_index(spark, wd)
    want = {tuple(r) for r in triples.collect()}
    dl.compact(spark, wd, num_partitions=8)
    _, _, tables = dl.read_index(spark, wd)
    for name, t in tables.items():
        assert {tuple(r) for r in t.collect()} == want, name


def test_quarantine_mode_drops_unknown_terms(spark):
    a = spark.createDataFrame(generate(300, seed=31).transcripts)
    b = spark.createDataFrame(generate(200, seed=32).transcripts)
    wd = tempfile.mkdtemp(prefix="delta_q_")
    run_pipeline(spark, a, wd, num_partitions=8, input_id="a")
    base_vocab = dl.read_vocab_ranked(spark, wd).count()
    base_triples = dl.read_triples(spark, wd).count()
    counters = dl.merge_delta(
        spark, wd, b, num_partitions=8, extend_vocab=False, delta_id="q"
    )
    assert dl.read_vocab_ranked(spark, wd).count() == base_vocab  # frozen
    assert counters["quarantined"] > 0  # fresh seed ⇒ unseen surfaces exist
    # only triples whose three terms were already known got added
    ranked, triples, _ = dl.read_index(spark, wd)
    assert triples.count() == base_triples + counters["new_triples"]
    for role, col in (("s", "s"), ("p", "p"), ("o", "o")):
        v = ranked.filter(F.col("role") == role).select(F.col("id").alias(col))
        assert triples.join(v, col, "left_anti").count() == 0


def test_sketch_mode_stats_refresh(spark):
    """stats_mode='sketch': num_triples exact, distinct counts within
    HLL error of the exact row, base sketched exactly ONCE, and
    approx_stats answers from sketches alone after any merge."""
    a = spark.createDataFrame(generate(300, seed=31).transcripts)
    b = spark.createDataFrame(generate(150, seed=32).transcripts)
    c = spark.createDataFrame(generate(150, seed=33).transcripts)
    wd = tempfile.mkdtemp(prefix="delta_sketch_")
    run_pipeline(spark, a, wd, num_partitions=8, input_id="a")

    dl.merge_delta(spark, wd, b, num_partitions=8, delta_id="b", stats_mode="sketch")
    base_sk = dl._base_sketch_path(wd)
    assert os.path.isdir(base_sk)
    mtime = max(
        os.path.getmtime(os.path.join(base_sk, f)) for f in os.listdir(base_sk)
    )
    dl.merge_delta(spark, wd, c, num_partitions=8, delta_id="c", stats_mode="sketch")
    # base sketch untouched by the second merge (no base rescan)
    assert mtime == max(
        os.path.getmtime(os.path.join(base_sk, f)) for f in os.listdir(base_sk)
    )

    from rdf_indexes_spark.operators import permutations as perm

    got = dl.approx_stats(spark, wd).first().asDict()
    stored = spark.read.parquet(os.path.join(wd, "perms", "stats")).first().asDict()
    exact = perm.compute_stats(dl.read_triples(spark, wd)).first().asDict()
    assert got == stored  # the persisted row IS the sketch merge
    assert got["num_triples"] == exact["num_triples"]  # additive-exact
    for k, v in exact.items():
        if k != "num_triples":
            assert abs(got[k] - v) / max(1, v) < 0.05, (k, got[k], v)
    with pytest.raises(ValueError):
        dl.merge_delta(spark, wd, c, stats_mode="bogus")
