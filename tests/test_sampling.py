"""Deterministic sampling operators: reproducibility, nesting, growth
stability, mixture proportions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_indexes_spark.operators import sampling as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


def _ids(df):
    return {r[0] for r in df.select("doc_id").collect()}


def test_hash_sample_deterministic_and_nested(docs):
    a1 = _ids(S.hash_sample(docs, 0.2))
    a2 = _ids(S.hash_sample(docs, 0.2))
    assert a1 == a2  # reproducible
    b = _ids(S.hash_sample(docs, 0.5))
    assert a1 <= b  # nested: variate < 0.2 implies < 0.5
    n = docs.count()
    assert abs(len(b) / n - 0.5) < 0.1  # rate is roughly honored


def test_hash_sample_stable_under_growth(docs):
    """A row's fate never changes when OTHER rows arrive — the property
    df.sample() lacks."""
    half = docs.filter(F.col("doc_id") < 250)
    got_half = _ids(S.hash_sample(half, 0.3))
    got_full = {i for i in _ids(S.hash_sample(docs, 0.3)) if i < 250}
    assert got_half == got_full


def test_hash_sample_rate_bounds(docs):
    assert S.hash_sample(docs, 0.0).count() == 0
    assert S.hash_sample(docs, 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        S.hash_sample(docs, 1.5)


def test_mixture_sample_proportions(docs):
    """Peak stratum rides whole; output shares approach the weights."""
    w = {"en": 0.5, "fr": 0.25, "de": 0.25}
    out = S.mixture_sample(docs, w, stratum_col="lang").toPandas()
    # unweighted strata drop entirely
    assert set(out["lang"]) <= set(w)
    shares = out["lang"].value_counts(normalize=True)
    for lang, want in w.items():
        assert abs(shares.get(lang, 0.0) - want) < 0.15, (lang, shares)
    # determinism
    again = S.mixture_sample(docs, w, stratum_col="lang").toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_mixture_sample_peak_stratum_whole(docs):
    """The most over-demanded stratum gets rate 1.0 — every one of its
    rows survives (pure downsampling, nothing duplicated)."""
    counts = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    w = {"de": 0.9, "en": 0.1}
    demand = {s: w[s] / counts[s] for s in w}
    peak = max(demand, key=demand.get)
    out = S.mixture_sample(docs, w, stratum_col="lang")
    kept_peak = out.filter(F.col("lang") == peak).count()
    assert kept_peak == counts[peak]


def test_mixture_sample_errors_and_missing(docs, spark):
    with pytest.raises(ValueError):
        S.mixture_sample(docs, {})
    with pytest.raises(ValueError):
        S.mixture_sample(docs, {"en": -1.0})
    # weights naming only absent strata -> empty result, not an error
    assert S.mixture_sample(docs, {"nope": 1.0}, stratum_col="lang").count() == 0


def test_mixture_report_matches_pandas(docs):
    got = S.mixture_report(docs, ["source"]).toPandas()
    pdf = docs.toPandas()
    want = (
        pdf.assign(
            tokens=pdf["text"].map(lambda t: 0 if not t.strip() else len(t.strip().split())),
            chars=pdf["text"].str.len(),
        )
        .groupby("source")
        .agg(docs=("doc_id", "size"), tokens=("tokens", "sum"), chars=("chars", "sum"))
        .reset_index()
        .sort_values("source")
    )
    g = got.sort_values("source").reset_index(drop=True)
    assert list(g["source"]) == list(want["source"])
    assert list(g["docs"]) == list(want["docs"])
    assert list(g["tokens"]) == list(want["tokens"])
    assert list(g["chars"]) == list(want["chars"])
    assert (abs(g["mean_chars"] - g["chars"] / g["docs"]) < 1e-9).all()


def test_split_corpus_deterministic_partition(docs):
    """Every doc gets exactly one split; splits partition the corpus,
    approximate the fractions, and never migrate under growth."""
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = S.split_corpus(docs, fr).select("doc_id", "split").toPandas()
    assert len(out) == docs.count()
    shares = out["split"].value_counts(normalize=True)
    for k, w in fr.items():
        assert abs(shares.get(k, 0) - w) < 0.1, (k, shares)
    # growth stability: restricting the corpus never changes a verdict
    import pyspark.sql.functions as F
    half = docs.filter(F.col("doc_id") < 250)
    small = S.split_corpus(half, fr).select("doc_id", "split").toPandas()
    merged = small.merge(out, on="doc_id", suffixes=("_s", "_f"))
    assert (merged["split_s"] == merged["split_f"]).all()
    # errors
    import pytest as _pt
    with _pt.raises(ValueError):
        S.split_corpus(docs, {"train": 0.5})
    with _pt.raises(ValueError):
        S.split_corpus(docs, {})


def test_weighted_sample_is_variate_filter(docs):
    w = docs.withColumn("w", F.least(F.col("n_chars") / F.lit(1000.0), F.lit(1.0)))
    got = {r[0] for r in S.weighted_sample(w, "w").select("doc_id").collect()}
    manual = {
        r["doc_id"]
        for r in w.select("doc_id", "w").collect()
        if ((S._A * (r["doc_id"] % S._P) + S._B) % S._P) / S._P < r["w"]
    }
    assert got == manual
    # weight 1.0 keeps everything, weight 0.0 keeps nothing
    assert S.weighted_sample(w.withColumn("w", F.lit(1.0)), "w").count() == docs.count()
    assert S.weighted_sample(w.withColumn("w", F.lit(0.0)), "w").count() == 0


def test_upsample_multiplicity_and_determinism(docs):
    w = docs.withColumn("w", F.lit(1.0) + (F.col("doc_id") % 3) / F.lit(2.0))
    out = S.upsample(w, "w").select("doc_id", "copy_idx")
    rows = out.groupBy("doc_id").count().collect()
    by_doc = {r["doc_id"]: r["count"] for r in rows}
    for doc_id, n in by_doc.items():
        wt = 1.0 + (doc_id % 3) / 2.0
        extra = 1 if ((S._A * (doc_id % S._P) + S._B) % S._P) / S._P < wt - int(wt) else 0
        assert n == int(wt) + extra, doc_id
    # copy_idx is 0..n-1 per doc
    mx = out.groupBy("doc_id").agg(F.max("copy_idx").alias("m")).collect()
    for r in mx:
        assert r["m"] == by_doc[r["doc_id"]] - 1
    # deterministic across invocations
    again = {(r[0], r[1]) for r in S.upsample(w, "w").select("doc_id", "copy_idx").collect()}
    assert {(r[0], r[1]) for r in out.collect()} == again


def test_upsample_zero_weight_drops_and_cap_holds(docs):
    zero = docs.withColumn("w", F.lit(0.0))
    assert S.upsample(zero, "w").count() == 0
    huge = docs.withColumn("w", F.lit(1000.0))
    counts = S.upsample(huge, "w", max_copies=4).groupBy("doc_id").count().collect()
    assert counts and all(r["count"] == 4 for r in counts)


def test_negative_samples_model_parity(spark):
    """Exact python replay of the draw/bump/filter contract."""
    from rdf_indexes_spark.operators.sampling import (
        _NS_A1, _NS_A2, _NS_A3, _NS_C, _NS_D, negative_samples,
    )
    from rdf_indexes_spark.operators.dedup import _P

    triples = [(1, 7, 100), (1, 7, 101), (2, 7, 100), (2, 8, 102), (3, 8, 101)]
    df = spark.createDataFrame(triples, "s long, p long, o long")
    pool = sorted({o for _, _, o in triples})
    rank_of = {o: i for i, o in enumerate(pool)}
    n = len(pool)
    want = set()
    for s, p, o in triples:
        for j in range(2):
            h = (s % _P * _NS_A1 + p % _P * _NS_A2 + o % _P * _NS_A3
                 + j * _NS_C + _NS_D) % _P
            r = h % n
            if r == rank_of[o]:
                r = (r + 1) % n
            cand = (s, p, pool[r], j)
            if (cand[0], cand[1], cand[2]) not in {t for t in triples}:
                want.add(cand)
    got = {
        (r.s, r.p, r.o, r.neg_idx)
        for r in negative_samples(df, n_neg=2).collect()
    }
    assert got == want
    # negatives never equal their positive even unfiltered
    unfiltered = negative_samples(df, n_neg=2, filter_true=False)
    assert unfiltered.count() == len(triples) * 2
    # determinism across layouts
    again = {
        (r.s, r.p, r.o, r.neg_idx)
        for r in negative_samples(df.repartition(5), n_neg=2).collect()
    }
    assert again == got


def test_negative_samples_draws_spread_and_errors(spark):
    import pytest as _pytest

    from rdf_indexes_spark.operators.sampling import negative_samples

    df = spark.createDataFrame(
        [(i, 1, i % 50 + 1000) for i in range(300)], "s long, p long, o long"
    )
    out = negative_samples(df, n_neg=1, filter_true=False)
    # draws cover a broad slice of the 50-entity pool
    assert out.select("o").distinct().count() > 25
    # replacements always come from the object pool
    assert out.join(df.select("o").distinct(), "o", "left_anti").count() == 0
    with _pytest.raises(ValueError):
        negative_samples(df, n_neg=0)
    one = spark.createDataFrame([(1, 1, 5)], "s long, p long, o long")
    with _pytest.raises(ValueError):
        negative_samples(one)


def test_stratified_sample_exact_counts_and_determinism(spark):
    from rdf_indexes_spark.operators.dedup import _P
    from rdf_indexes_spark.operators.sampling import _A, _B, stratified_sample

    rows = [(i, f"s{i % 3}") for i in range(100)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = stratified_sample(df, 5, "stratum").collect()
    by_s = {}
    for r in out:
        by_s.setdefault(r.stratum, []).append(r.doc_id)
    assert {s: len(v) for s, v in by_s.items()} == {"s0": 5, "s1": 5, "s2": 5, "tiny": 1}
    # manual recount: hash-ordered prefix per stratum
    for s, ids in by_s.items():
        pool = [i for i, st in rows if st == s]
        pool.sort(key=lambda k: ((_A * (k % _P) + _B) % _P, k))
        assert sorted(ids) == sorted(pool[:5])
    # layout invariance
    again = stratified_sample(df.repartition(7), 5, "stratum").collect()
    assert {(r.doc_id, r.stratum) for r in again} == {(r.doc_id, r.stratum) for r in out}
