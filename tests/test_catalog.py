"""SQL-surface catalog: temp-view registration over testdata and a
built index, with the pattern contract phrased in plain SQL."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rdf_indexes_spark.catalog import register_index, register_testdata, sql_pattern


def test_register_testdata_views(spark):
    names = register_testdata(spark, "/root/testdata/sf0.001", prefix="t_")
    assert "t_documents" in names and "t_lineitem" in names
    n = spark.sql("SELECT count(*) AS n FROM t_documents").first()["n"]
    assert n == spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()


def test_register_index_and_sql_pattern(spark, transcripts, workdir):
    from rdf_indexes_spark.pipeline import run_pipeline
    from rdf_indexes_spark.plans.router import select

    wd = os.path.join(workdir, "catalog_idx")
    art = run_pipeline(spark, transcripts, wd, input_id="catalog")
    names = register_index(spark, os.path.join(wd, "perms"), prefix="cx_")
    # run_pipeline's layout holds perms under perms/perms5 (the fallback
    # branch) and no stats/vocabs beside it — permutation views only
    assert {"cx_spo", "cx_pos", "cx_osp", "cx_ops", "cx_pso"} <= set(names)

    t = art.triples.orderBy("s", "p", "o").first()
    # SQL view answers == router answers for a bound-prefix pattern
    got_sql = sorted(
        (r["s"], r["p"], r["o"])
        for r in spark.sql(f"SELECT s, p, o FROM cx_spo WHERE s = {t.s}").collect()
    )
    got_router = sorted(
        (r["s"], r["p"], r["o"])
        for r in select(art.permutations, s=t.s).collect()
    )
    assert got_sql == got_router and got_sql

    # sql_pattern routes ?P? to the pos view and matches the router
    got_sql_p = sorted(
        (r["s"], r["p"], r["o"]) for r in sql_pattern(spark, "cx_", p=t.p).collect()
    )
    got_router_p = sorted(
        (r["s"], r["p"], r["o"]) for r in select(art.permutations, p=t.p).collect()
    )
    assert got_sql_p == got_router_p and got_sql_p

    # the SQL plan partition-prunes exactly like the router's scan
    plan = (
        spark.sql(f"SELECT s, p, o FROM cx_pos WHERE p = {t.p}")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "perm" in plan


def test_register_index_cli_layout(spark, cli_tx_index):
    """The CLI-built layout (perms5 + stats + vocabs at the index root)
    registers stats and vocab views too. Uses the session-shared CLI
    build (conftest.cli_tx_index) read-only — registration never
    mutates the index."""
    _, out, _ = cli_tx_index
    names = register_index(spark, out, prefix="cli_")
    assert "cli_stats" in names
    assert {"cli_vocab_s", "cli_vocab_p", "cli_vocab_o"} <= set(names)
    row = spark.sql("SELECT * FROM cli_stats").first()
    assert row["num_triples"] > 0
    # vocab ids are dense 0..n-1 (line-number contract)
    v = spark.sql("SELECT min(id) AS lo, max(id) AS hi, count(*) AS n FROM cli_vocab_p").first()
    assert v["lo"] == 0 and v["hi"] == v["n"] - 1
