"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on the same parquet, compare row count,
column names, and order-insensitive values (sorted by all columns)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entry_mod.SF_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif out[c].dtype.kind == "f":
            # NaN-free before sorting: tuples containing NaN have no total
            # order, so sorted() output depends on input order (flaky)
            out[c] = out[c].round(9).fillna(float("-inf"))
    return sorted(map(tuple, out.itertuples(index=False, name=None)))


ORACLE = entry_mod.oracle_sql()
ALL = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, name):
    got = ALL[name](spark, SF_DIR).toPandas()
    want = duck.execute(ORACLE[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    g, w = _canon(got), _canon(want)
    mism = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:5]
    assert g == w, f"{name}: first mismatches {[(g[i], w[i]) for i in mism]}"


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    if name == "kg_triples":
        pytest.skip("full pipeline covered by test_pipeline.py (slow)")
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert [f.name for f in df.schema] == ["s", "p", "o"]


def test_driver_order_contract():
    """The queries() dict order IS the driver's verification schedule
    (the per-round sweep covers the first ~50 keys in dict order).
    Pin the round-5 contract: 5 permanent sentinels lead, the 36-key
    never-driver-verified rotation queue follows immediately, the five
    round-5 oracle twins (PQ / SemDeDup / pagerank / kcore /
    communities) sit inside the 50-key window, the first 50 are all
    oracle-backed, and the explicit order covers every key exactly
    once."""
    qs = list(entry_mod.queries())
    osql = entry_mod.oracle_sql()
    assert qs[:5] == [
        "b2_dense_ids",
        "c1_sort_permutation",
        "e1_broadcast_join",
        "f2_pattern_sp",
        "kg_fuse_facts",
    ]
    head = qs[:50]
    assert all(k in osql for k in head), [k for k in head if k not in osql]
    # queue boundaries: positions 6 and 41 of the rotation queue
    assert qs[5] == "kg_weighted_distances"
    assert qs[40] == "hybrid_search_rrf"
    for twin in (
        "ann_pq_topk_oracle",
        "semantic_dedup_oracle",
        "kg_pagerank_oracle",
        "kg_kcore_oracle",
        "kg_communities_oracle",
    ):
        assert twin in head
    order = entry_mod._DRIVER_ORDER
    assert len(order) == len(set(order)) == len(qs)
    assert qs == [k for k in order if k in set(qs)]
