"""Deterministic corpus sampling — the reproducibility-critical cousins
of `df.sample()` that a training-data pipeline actually needs.

`df.sample()` is seed-and-partitioning dependent: add one file to the
input and every row's fate changes. These operators decide each row's
fate from a HASH OF ITS KEY alone, so a sample is (a) reproducible
across runs, cluster sizes, and input layouts, (b) stable under corpus
growth (old rows keep their verdict when new rows arrive — the property
that makes incremental pipeline re-runs cheap), and (c) replayable by
any engine with integer arithmetic (the driver's DuckDB oracle replays
them value-for-value).

Hash: the repo's affine family over the 31-bit Mersenne prime
(operators/dedup.py `_P` — every intermediate fits a signed 64-bit long
under Spark 4's ANSI mode). The uniform variate for key k is
``((a*h + b) mod P) / P`` with ``h = k mod P`` — plain JVM-side column
arithmetic, whole-stage codegen, no UDF.

All selection predicates are pure SELECT-side filters: no shuffle, no
aggregation on the data path (``mixture_sample`` runs ONE tiny
count-per-stratum agg to turn target weights into acceptance rates,
then filters map-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _P

# default affine parameters: any fixed (a, b) with 0 < a < 2^30 works;
# these are arbitrary odd constants, recorded here as THE contract the
# oracle replays
_A = 0x2545F491  # 625_341_585 < 2^30
_B = 0x1B873593 % _P  # 461_845_907


def _variate(key: Column, a: int = _A, b: int = _B) -> Column:
    """Uniform-ish variate in [0, 1) from an integer key column —
    engine-portable: (a * (key mod P) + b) mod P, over P."""
    h = F.pmod(key.cast("long"), F.lit(_P))
    return F.pmod(F.lit(a) * h + F.lit(b), F.lit(_P)) / F.lit(float(_P))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    a: int = _A,
    b: int = _B,
) -> DataFrame:
    """Keep each row iff variate(key) < rate. Deterministic per key:
    the same key is kept or dropped in every run, at every scale, on
    every engine — and a key's verdict never changes when OTHER rows
    come or go (unlike df.sample)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_variate(F.col(key_col), a, b) < F.lit(float(rate)))


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    a: int = _A,
    b: int = _B,
) -> DataFrame:
    """Resample the corpus toward a target MIXTURE (the data-mixture
    step of LLM corpus preparation): ``weights`` gives each stratum's
    target share of the output; per-stratum acceptance rates are scaled
    so the most over-demanded stratum is taken whole (pure downsampling
    — no row is ever duplicated) and every other stratum is thinned to
    hit the target proportions exactly in expectation.

    rate_s = (w_s / n_s) / max_t(w_t / n_t)  — one tiny
    count-per-stratum aggregate sizes the rates; the data path is a
    single map-side filter on the deterministic per-key variate.
    Strata missing from ``weights`` (and NULLs) are dropped. Returns
    rows with their original columns.
    """
    if not weights:
        raise ValueError("weights must name at least one stratum")
    bad = {k: w for k, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"negative weights: {bad}")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    demand = {
        s: w / counts[s] for s, w in weights.items() if w > 0 and counts.get(s)
    }
    if not demand:  # nothing requested exists in the data
        return df.filter(F.lit(False))
    peak = max(demand.values())
    rates = {s: d / peak for s, d in demand.items()}
    rate_expr = None
    for s, r in rates.items():
        cond = F.col(stratum_col) == F.lit(s)
        rate_expr = (
            F.when(cond, F.lit(r)) if rate_expr is None else rate_expr.when(cond, F.lit(r))
        )
    rate_expr = rate_expr.otherwise(F.lit(0.0))
    return df.filter(_variate(F.col(key_col), a, b) < rate_expr)


def mixture_report(
    df: DataFrame,
    stratum_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-composition report per stratum: docs, total whitespace
    tokens, total chars, mean doc length — the numbers a mixture
    decision is made from. One hash-aggregate; sorted by stratum for
    stable output."""
    cols = stratum_cols or ["source"]
    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    return (
        df.groupBy(*cols)
        .agg(
            F.count("*").alias("docs"),
            F.sum(toks).cast("long").alias("tokens"),
            F.sum(F.length(F.col(text_col))).cast("long").alias("chars"),
            (F.sum(F.length(F.col(text_col))) / F.count("*")).alias("mean_chars"),
        )
        .orderBy(*cols)
    )


def split_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    a: int = _A,
    b: int = _B,
) -> DataFrame:
    """Deterministic train/val/test assignment: each key's variate falls
    into one of the cumulative [0,1) intervals defined by ``fractions``
    (insertion order; they must sum to ~1). Adds a ``split`` column.

    Inherits every hash_sample property — reproducible across engines
    and layouts, stable under corpus growth (a doc never migrates
    between splits when other docs arrive: the leakage-safety property
    random splits lack). Pure codegen CASE over the variate."""
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(w < 0 for w in fractions.values()):
        raise ValueError("fractions must be non-negative")
    v = _variate(F.col(key_col), a, b)
    expr = None
    acc = 0.0
    for name, w in fractions.items():
        acc += w
        cond = v < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float-sum slack: the last interval absorbs rounding
    last = list(fractions)[-1]
    return df.withColumn("split", expr.otherwise(F.lit(last)))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str = "doc_id",
    a: int = _A,
    b: int = _B,
) -> DataFrame:
    """Per-row acceptance probability: keep row iff variate(key) <
    weight (a quality score in [0, 1] — the quality-weighted sampling
    step of CCNet/DCLM-style pipelines). Same determinism contract as
    hash_sample: a row's fate depends only on its own key and weight,
    so re-runs, repartitions, and corpus growth never flip it. Pure
    map-side filter, no shuffle."""
    return df.filter(
        _variate(F.col(key_col), a, b) < F.col(weight_col).cast("double")
    )


def upsample(
    df: DataFrame,
    weight_col: str,
    key_col: str = "doc_id",
    max_copies: int = 16,
    a: int = _A,
    b: int = _B,
) -> DataFrame:
    """Weighted multiplicity (the up-sampling half of data mixing):
    each row appears floor(w) + Bernoulli(frac(w)) times — the
    expectation is exactly w — with a ``copy_idx`` column (0..n-1)
    distinguishing repeats for downstream packing/shuffling. The
    Bernoulli draw is the deterministic per-key variate, so the
    materialized corpus is identical across runs and layouts.
    ``max_copies`` caps a bad weight column from exploding the corpus;
    weights <= 0 drop the row. Map-side generate (one explode), no
    shuffle."""
    w = F.col(weight_col).cast("double")
    extra = (_variate(F.col(key_col), a, b) < (w - F.floor(w))).cast("long")
    n = F.least(F.floor(w).cast("long") + extra, F.lit(int(max_copies)))
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


# negative-sampling hash constants: distinct multipliers per role keep
# the three ids from cancelling; every product stays under 2^61 and the
# five-term sum under 2^63 (ANSI-mode safe)
_NS_A1, _NS_A2, _NS_A3 = _A, _B, 1_000_003
_NS_C, _NS_D = 69_069, 12_345


def negative_samples(
    triples: DataFrame,
    n_neg: int = 1,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    filter_true: bool = True,
) -> DataFrame:
    """KG-embedding training negatives (TransE-family corruption): for
    every (s, p, o) triple emit ``n_neg`` corrupted copies with the
    OBJECT replaced by a pseudo-random entity from the object pool —
    deterministically, so the training set is a pure function of the
    graph (rerun-stable, engine-replayable), unlike `rand()`-based
    corruption. To corrupt subjects, pass the frame with s/o swapped.

    Replacement for (s, p, o, j): rank r = H(s, p, o, j) mod n over the
    sorted distinct-object pool (H = the repo's 31-bit affine family,
    one multiplier per role); a draw that lands on the TRUE object is
    bumped one rank (cyclically), so a negative never equals its
    positive. With ``filter_true`` (the literature's "filtered"
    setting) corrupted triples that happen to exist elsewhere in the
    graph are anti-joined away — per-triple negative counts may then
    drop below ``n_neg``.

    Returns (s, p, o, neg_idx) — o is the REPLACEMENT entity.

    Scale shape: the pool ranking is the two-phase distributed rank
    (functions.ranking.dense_ids — no global window); draws explode
    map-side; the rank→entity resolution is ONE equi-join against the
    pool-sized rank table (broadcast by Catalyst when it fits); the
    optional filter is one anti-join keyed on (s, p, o). Skew-free:
    draw ranks are hash-uniform by construction.
    """
    from ..functions.ranking import dense_ids

    if n_neg < 1:
        raise ValueError(f"n_neg must be >= 1, got {n_neg}")
    t = triples.select(
        F.col(s_col).cast("long").alias("s"),
        F.col(p_col).cast("long").alias("p"),
        F.col(o_col).cast("long").alias("o"),
    )
    pool = t.select("o").distinct()
    n = pool.count()
    if n < 2:
        raise ValueError(f"object pool must hold >= 2 entities, got {n}")
    ranked = dense_ids(pool, ["o"], id_col="rank").select(
        "rank", F.col("o").alias("_neg")
    )
    # the true object's own rank, for the collision bump
    with_rank = t.join(
        ranked.select(F.col("rank").alias("_orank"), F.col("_neg").alias("o")), "o"
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(n_neg - 1))).alias("neg_idx")
    drawn = with_rank.select("s", "p", "o", "_orank", j).withColumn(
        "_h",
        F.pmod(
            F.pmod(F.col("s"), F.lit(_P)) * F.lit(_NS_A1)
            + F.pmod(F.col("p"), F.lit(_P)) * F.lit(_NS_A2)
            + F.pmod(F.col("o"), F.lit(_P)) * F.lit(_NS_A3)
            + F.col("neg_idx") * F.lit(_NS_C)
            + F.lit(_NS_D),
            F.lit(_P),
        ),
    )
    r = F.pmod(F.col("_h"), F.lit(n))
    drawn = drawn.withColumn(
        "rank",
        F.when(r == F.col("_orank"), F.pmod(r + 1, F.lit(n))).otherwise(r),
    )
    out = drawn.join(ranked, "rank").select(
        "s", "p", F.col("_neg").alias("o"), F.col("neg_idx").cast("long").alias("neg_idx")
    )
    if filter_true:
        out = out.join(t.distinct(), ["s", "p", "o"], "left_anti")
    return out


def stratified_sample(
    df: DataFrame,
    n: int,
    stratum_col: str,
    key_col: str = "doc_id",
    a: int = _A,
    b: int = _B,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum — the hash-ordered
    prefix of each stratum: rank rows by the affine variate of their
    key (ties by key) and keep the first n. Deterministic per key set,
    stable under corpus growth ONLY in distribution (a new low-hash row
    displaces the current rank-n row — exactness and growth-stability
    are mutually exclusive; ``hash_sample`` trades the other way).

    Plan: one stratum-keyed exchange; the row_number filter compiles to
    WindowGroupLimit (Spark 3.5+), so every map task pre-prunes to its
    local top-n per stratum BEFORE the wire — the shuffle carries
    O(strata × n × tasks) rows, not the corpus.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql import Window

    hv = F.pmod(
        F.lit(a) * F.pmod(F.col(key_col).cast("long"), F.lit(_P)) + F.lit(b),
        F.lit(_P),
    )
    w = Window.partitionBy(stratum_col).orderBy(hv.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(int(n)))
        .drop("_rn")
    )
