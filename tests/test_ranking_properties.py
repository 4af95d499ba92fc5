"""Property-based tests (hypothesis) for the distributed rank helpers —
the machinery under B2 dense ids and E5 rank remap. For arbitrary
(group, value) multisets with duplicates and ties, both the
driver-offset (dense_ids_grouped) and fully-distributed (grouped_rank)
implementations must emit, per group, a dense 0..k-1 rank permutation
whose order agrees with the requested sort order (ties may break either
way, but tied rows must occupy a contiguous rank block)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rdf_indexes_spark.functions.ranking import dense_ids_grouped, grouped_rank

ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-50, 50)), min_size=1, max_size=60
)


def _check(rows, out_rows):
    by_group: dict[int, list[tuple[int, int]]] = {}
    for r in out_rows:
        by_group.setdefault(r["g"], []).append((r["rank"], r["v"]))
    # same multiset of (group, value) in and out
    assert sorted((r["g"], r["v"]) for r in out_rows) == sorted(rows)
    for vals in by_group.values():
        ranks = sorted(r for r, _ in vals)
        assert ranks == list(range(len(vals)))  # dense 0..k-1
        # reading values in rank order must be a valid ascending sort
        in_rank_order = [v for _, v in sorted(vals)]
        assert in_rank_order == sorted(in_rank_order)


@settings(max_examples=8, deadline=None)
@given(rows=ROWS)
def test_grouped_rank_is_dense_per_group_sort(spark, rows):
    df = spark.createDataFrame(rows, "g int, v int")
    out = grouped_rank(df, "g", [F.asc("v")], id_col="rank", num_partitions=5)
    _check(rows, out.collect())


@settings(max_examples=8, deadline=None)
@given(rows=ROWS)
def test_dense_ids_grouped_matches_contract(spark, rows):
    df = spark.createDataFrame(rows, "g int, v int")
    out = dense_ids_grouped(df, "g", [F.asc("v")], id_col="rank", num_partitions=5)
    _check(rows, out.collect())
