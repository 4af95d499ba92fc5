"""Benchmark decontamination: ground-truth n-gram overlap semantics and
the hashed-key (production) vs raw-string (audit) path equivalence."""

from __future__ import annotations

from rdf_indexes_spark.operators.contamination import decontaminate


def _rows(df):
    return sorted(
        (r["doc_id"], r["n_hit_ngrams"], r["n_bench_docs"], r["contaminated"])
        for r in df.collect()
    )


def test_decontaminate_ground_truth(spark):
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),  # grams: "a b c" (bench 10+12), "b c d" (12), "c d e"
            (2, "x y z"),  # "x y z" (bench 11)
            (3, "a b"),  # too short for 3-grams: clean, still present
            (4, "m n o p"),  # no overlap: clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (10, "q a b c q"),
            (11, "x y z x y z"),
            (12, "a b c d"),
        ],
        "doc_id long, text string",
    )
    got = _rows(decontaminate(corpus, bench, n=3))
    assert got == [
        (1, 2, 2, 1),  # {"a b c","b c d"} hit; bench docs {10, 12}
        (2, 1, 1, 1),
        (3, 0, 0, 0),
        (4, 0, 0, 0),
    ]


def test_decontaminate_hashed_matches_raw(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter("doc_id % 19 != 0")
    bench = docs.filter("doc_id % 19 = 0")
    hashed = _rows(decontaminate(corpus, bench, n=3, hashed_keys=True))
    raw = _rows(decontaminate(corpus, bench, n=3, hashed_keys=False))
    assert hashed == raw
    # the synthetic vocabulary is tiny, so 3-gram contamination must be
    # non-trivial in both directions (some hits, and per-doc zeros only
    # if a doc is genuinely disjoint)
    assert any(r[3] == 1 for r in hashed)


def test_remove_contaminated_spans_ground_truth(spark):
    from rdf_indexes_spark.operators.contamination import (
        remove_contaminated_spans,
    )

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),  # "a b c" (bench 11) covers 1..3 and
            # "b c d" (bench 10) covers 2..4 → cut pos 1..4
            (2, "a b c"),  # fully covered → empty
            (3, "m n o p"),  # clean → normalized passthrough
            (4, "a b"),  # too short for grams → passthrough
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "x b c d y"), (11, "a b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["removed_tokens"])
        for r in remove_contaminated_spans(corpus, bench, n=3).collect()
    }
    assert got == {
        1: ("e", 4),
        2: ("", 3),
        3: ("m n o p", 0),
        4: ("a b", 0),
    }


def test_remove_spans_overlapping_hits_union(spark):
    # two overlapping hits ("a b c" at 1, "b c d" at 2) cover pos 1..4 —
    # union, not double-count
    from rdf_indexes_spark.operators.contamination import (
        remove_contaminated_spans,
    )

    corpus = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(10, "a b c"), (11, "b c d")], "doc_id long, text string"
    )
    [r] = remove_contaminated_spans(corpus, bench, n=3).collect()
    assert (r["text"], r["removed_tokens"]) == ("e f", 4)


def test_decontaminate_case_and_whitespace(spark):
    corpus = spark.createDataFrame([(1, "  A  b\tC ")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    assert _rows(decontaminate(corpus, bench, n=3)) == [(1, 1, 1, 1)]


def test_source_overlap_ground_truth(spark):
    from rdf_indexes_spark.operators.contamination import source_overlap

    docs = spark.createDataFrame(
        [
            # srcA grams (n=2): {"a b", "b c"}; srcB: {"b c", "c d"};
            # srcC: {"x y"} (disjoint)
            (1, "A", "a b c"),
            (2, "B", "b c d"),
            (3, "B", "b c"),  # duplicate gram within B — distinct-set semantics
            (4, "C", "x y"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r["source_a"], r["source_b"]): (
            r["ngrams_a"],
            r["ngrams_b"],
            r["common"],
            r["containment_a_in_b"],
        )
        for r in source_overlap(docs, n=2, source_col="source").collect()
    }
    # only overlapping ordered pairs appear; C is disjoint → absent
    assert got == {
        ("A", "B"): (2, 2, 1, 0.5),
        ("B", "A"): (2, 2, 1, 0.5),
    }
