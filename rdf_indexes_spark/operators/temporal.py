"""Temporal joins Spark has no native operator for: AS-OF join and the
point-in-time KG snapshot built on it.

The naive formulation — an inequality theta-join followed by a
per-probe-row max — explodes: Spark plans `l.key = r.key AND r.ts <=
l.ts` as a hash join on key whose output is |probe| × (quotes per key)
BEFORE the max prunes it; a hot key with a year of quotes multiplies
every probe row by that year. The implementation here is the classic
UNION-AND-SCAN plan instead (the one kdb+/QuestDB/DuckDB execute
natively): tag quote rows 0 and probe rows 1, sort each key's rows once
by (ts, tag), and carry the most recent quote forward with a running
``last(ignorenulls)`` window — ONE key-partitioned exchange + sort, per
row O(1) state, output exactly |probe| rows. Hot keys cost their own
row count, never a cross product.

``fact_as_of`` applies the same plan shape to ``schema.fact_history``
output: the graph as believed at time T.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
    tolerance_s: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """AS-OF LEFT join: every ``left`` row picks up ONE ``right`` row
    for the same ``on`` keys —

    - direction='backward' (default): the LARGEST right_ts <= left_ts
      (inclusive; among right rows tied on that ts, the largest payload
      wins — a deterministic rule, not shuffle luck);
    - direction='forward': the SMALLEST right_ts >= left_ts (inclusive;
      ties take the smallest payload).

    Left rows with no match keep NULLs.

    Output: every left column (original names) + every non-key,
    non-ts right column renamed ``{col}{suffix}`` + the matched
    timestamp as ``{right_ts}{suffix}``.

    ``tolerance_s``: with timestamps, a match further than this many
    seconds away is discarded (NULLed), pandas.merge_asof-style.

    Scale shape: one union (map-side), ONE exchange + sort keyed on
    ``on``, one running-window pass, one filter — no inequality join,
    no per-key blowup; cost is |left| + |right| rows through a single
    shuffle regardless of key skew.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    for k in on:
        if k in (left_ts, right_ts):
            raise ValueError("key columns and ts columns must be distinct")
    payload = [c for c in right.columns if c not in on and c != right_ts]
    l_cols = list(left.columns)
    clash = {f"{c}{suffix}" for c in payload + [right_ts]} & set(l_cols)
    if clash:
        raise ValueError(f"suffixed right columns clash with left: {sorted(clash)}")

    probe = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_l"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("_mts"),
                    *[F.col(c) for c in payload],
                ).alias("x")
            ).schema["x"].dataType.simpleString()
        ).alias("_q"),
        F.lit(1).alias("_tag"),
    )
    build = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ts"),
        F.lit(None).cast(probe.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(
            F.col(right_ts).alias("_mts"), *[F.col(c) for c in payload]
        ).alias("_q"),
        F.lit(0).alias("_tag"),
    )
    if direction == "backward":
        # builds sort BEFORE probes at equal ts (inclusive <=); running
        # last() in the preceding frame = most recent prior build
        w = (
            Window.partitionBy(*on)
            .orderBy("_ts", "_tag", "_q")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = F.last("_q", ignorenulls=True).over(w)
    else:
        # probes sort BEFORE builds at equal ts (inclusive >=); running
        # first() in the following frame = earliest later build
        w = (
            Window.partitionBy(*on)
            .orderBy("_ts", F.desc("_tag"), "_q")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carry = F.first("_q", ignorenulls=True).over(w)
    matched = (
        probe.unionByName(build)
        .withColumn("_m", carry)
        .filter(F.col("_tag") == 1)
    )
    if tolerance_s is not None:
        gap = F.unix_timestamp(F.col("_ts")) - F.unix_timestamp(F.col("_m._mts"))
        ok = (
            gap if direction == "backward" else -gap
        ) <= F.lit(int(tolerance_s))
        matched = matched.withColumn(
            "_m", F.when(ok, F.col("_m")).otherwise(F.lit(None))
        )
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in l_cols],
        F.col("_m._mts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in payload],
    )


def fact_as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time KG snapshot from ``schema.fact_history`` output:
    the (s, p, o) rows whose [valid_from, valid_to) interval covers
    ``ts`` (a datetime or ISO string). A pure map-side filter over the
    history table — the payoff of materializing SCD-2 intervals once.
    """
    t = F.lit(ts).cast("timestamp")
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("s", "p", "o", "version")


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_width: int = 3600,
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Range join: every point row × every interval row (same ``on``
    keys) with start <= point <= end — WITHOUT the
    BroadcastNestedLoopJoin Spark plans for a raw inequality join
    (quadratic at scale; the driver OOMs building the broadcast side).

    Plan: bucketize. Each interval explodes onto the fixed-width bins
    it covers; each point maps to its ONE bin; the join is a plain
    equi-join on (keys..., bin) — shuffled, partition-parallel,
    skew-handled like any hash join — then the exact containment
    predicate filters bin-mates. A (point, interval) pair can only meet
    in the point's own bin, so no dedup pass is needed.

    ``bin_width`` trades explosion for selectivity: intervals produce
    ceil(len/width)+1 rows (guarded by ``max_bins_per_interval`` — a
    degenerate open-ended interval raises instead of silently emitting
    a billion rows); a width far above typical interval length degrades
    toward per-key cross products. Columns are int64 (epochs or any
    integer domain). Output: all point columns + all interval columns
    (names must not clash).
    """
    on = on or []
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(f"point/interval column clash: {sorted(clash)}")
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    p, s, e = F.col(point_col), F.col(start_col), F.col(end_col)
    w = F.lit(int(bin_width))
    nbins = (F.floor(e / w) - F.floor(s / w) + 1).cast("long")
    guarded = intervals.withColumn(
        "_nb",
        F.when(
            nbins <= F.lit(int(max_bins_per_interval)), nbins
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval exceeds max_bins_per_interval="
                        f"{max_bins_per_interval} at bin_width={bin_width}: "
                    ),
                    s.cast("string"), F.lit(".."), e.cast("string"),
                )
            ).cast("long")
        ),
    )
    binned_i = guarded.select(
        "*",
        F.explode(
            F.sequence(F.floor(s / w), F.floor(s / w) + F.col("_nb") - 1)
        ).alias("_bin"),
    ).drop("_nb")
    binned_p = points.withColumn("_bin", F.floor(p / w))
    return (
        binned_p.join(binned_i, [*on, "_bin"])
        .filter((s <= p) & (p <= e))
        .drop("_bin")
    )


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str | None = None,
    resolutions: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Hypertable-style multi-resolution rollup: per (key..., bucket)
    at EVERY requested resolution, in ONE aggregation pass —

      resolution, bucket_start (epoch s), key..., n_rows,
      sum_x1e2 (value summed in exact hundredths; NULL without a value
      column), min/max epoch of the contributing rows

    Each input row is map-side stamped with one bucket column per
    resolution (date_trunc), then a single GROUPING SETS aggregate
    computes all resolutions in one shuffle — the Spark-first shape for
    continuous-aggregate maintenance (vs one groupBy per resolution =
    one full pass + exchange each). Output rows are resolution-tagged
    and bucket-keyed, ready to upsert into a rollup table.

    Resolutions must be date_trunc units (``minute hour day week month
    year``). Values aggregate as round(value*100) integers: exact,
    order-free, engine-portable (a raw double sum drifts in the last
    ulp across partitionings).
    """
    allowed = {"minute", "hour", "day", "week", "month", "year"}
    bad = [r for r in resolutions if r not in allowed]
    if bad:
        raise ValueError(f"unsupported resolutions: {bad}")
    keys = key_cols or []
    stamped = events.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        (F.round(F.col(value_col) * 100).cast("long") if value_col else F.lit(None).cast("long")).alias("_v"),
        *[
            F.unix_timestamp(F.date_trunc(r, F.col(ts_col))).alias(f"_b_{r}")
            for r in resolutions
        ],
    )
    gsets = [[*keys, f"_b_{r}"] for r in resolutions]
    gcols = list(dict.fromkeys(c for g in gsets for c in g))  # stable order
    agg = stamped.groupingSets(gsets, *[F.col(c) for c in gcols]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_v").alias("sum_x1e2"),
        F.min(F.unix_timestamp("_ts")).alias("first_epoch"),
        F.max(F.unix_timestamp("_ts")).alias("last_epoch"),
    )
    resolution = None
    for r in resolutions:
        cond = F.col(f"_b_{r}").isNotNull()
        resolution = (
            F.when(cond, F.lit(r)) if resolution is None
            else resolution.when(cond, F.lit(r))
        )
    bucket = F.coalesce(*[F.col(f"_b_{r}") for r in resolutions])
    return agg.select(
        resolution.alias("resolution"),
        bucket.cast("long").alias("bucket_start"),
        *[F.col(k) for k in keys],
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("sum_x1e2").cast("long").alias("sum_x1e2"),
        F.col("first_epoch").cast("long").alias("first_epoch"),
        F.col("last_epoch").cast("long").alias("last_epoch"),
    )


def time_resample(
    df: DataFrame,
    ts_col: str,
    step: int,
    key_cols: list[str],
    value_col: str | None = None,
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Gap-filling resample: (keys..., bucket, n[, total]) on a fixed
    ``step``-second grid with EMPTY buckets materialized as zeros
    between each key's first and last event — the downsampling shape
    every time-series consumer assumes (a missing bucket means "no
    row", which silently breaks rolling averages and charts alike).

    ``bucket`` is the epoch-second bucket start (long); ``ts_col`` may
    be a timestamp or an integer epoch column. ``value_col`` (integer)
    adds an exact summed ``total`` per bucket (0 when empty).

    Plan: ONE corpus-scale aggregate to (keys, bucket); the grid is
    rebuilt from a keys-scale span frame via sequence()+explode (bounded
    by ``max_buckets_per_key`` — a degenerate span raises instead of
    exploding) and left-joins the bucket counts — every post-aggregate
    frame is bucket-scale, never corpus-scale. Corpus rows cross the
    wire exactly once.
    """
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    ts_type = df.schema[ts_col].dataType.simpleString()
    epoch = (
        F.unix_timestamp(F.col(ts_col))
        if ts_type.startswith("timestamp")
        else F.col(ts_col).cast("long")
    )
    b = (F.floor(epoch / F.lit(step)) * F.lit(step)).cast("long")
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("long")).alias("total"))
    per = df.groupBy(*key_cols, b.alias("bucket")).agg(*aggs)

    nb = ((F.max("bucket") - F.min("bucket")) / F.lit(step) + 1).cast("long")
    spans = per.groupBy(*key_cols).agg(
        F.min("bucket").alias("_lo"),
        F.when(nb <= F.lit(int(max_buckets_per_key)), F.max("bucket"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"key span exceeds max_buckets_per_key="
                        f"{max_buckets_per_key} at step={step}: "
                    ),
                    F.min("bucket").cast("string"),
                    F.lit(".."),
                    F.max("bucket").cast("string"),
                )
            ).cast("long")
        )
        .alias("_hi"),
    )
    grid = spans.select(
        *key_cols,
        F.explode(F.sequence("_lo", "_hi", F.lit(step))).alias("bucket"),
    )
    out = grid.join(per, [*key_cols, "bucket"], "left")
    fill = ["n"] + (["total"] if value_col is not None else [])
    return out.fillna(0, subset=fill)


def trailing_counts(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    window_s: int,
    value_col: str | None = None,
) -> DataFrame:
    """Point-in-time trailing-window features: every input row gains
    ``n_prev`` (count of the key's rows in the ``window_s`` seconds
    STRICTLY before it) and, with ``value_col``, ``sum_prev`` (their
    exact integer sum, 0 when empty). Rows at the SAME instant are
    excluded from each other's window — the leakage-safe convention
    for training features (a same-timestamp peer is not "the past").

    Plan: ONE key-partitioned RANGE-frame window over epoch seconds —
    no self-join, no explode; cost is the sort within each key's
    partition. Per-key history length is the skew bound (the same
    shape as sessionize); keys are users/sessions, naturally bounded.
    """
    if window_s < 1:
        raise ValueError(f"window_s must be >= 1, got {window_s}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    ts_type = df.schema[ts_col].dataType.simpleString()
    epoch = (
        F.unix_timestamp(F.col(ts_col))
        if ts_type.startswith("timestamp")
        else F.col(ts_col).cast("long")
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_epoch"))
        .rangeBetween(-int(window_s), -1)
    )
    out = df.withColumn("_epoch", epoch).withColumn(
        "n_prev", F.count(F.lit(1)).over(w)
    )
    if value_col is not None:
        out = out.withColumn(
            "sum_prev",
            F.coalesce(F.sum(F.col(value_col).cast("long")).over(w), F.lit(0)),
        )
    return out.drop("_epoch")


def event_transitions(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Markov transition census: (prev_state, state, n) counted over
    each key's time-ordered event sequence — the bigram model of user
    journeys / dialogue acts. Ties in the timestamp are ordered by
    ``tiebreak_col`` (required for determinism when timestamps can
    collide; pass the event id).

    Plan: one key-partitioned window (lag) + one tiny (state, state)
    hash aggregate with map-side partials — two exchanges, the second
    over |states|² rows.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.select(
            F.col(state_col).alias("state"),
            F.lag(F.col(state_col)).over(w).alias("prev_state"),
        )
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "state")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def retention_cohorts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    unit: str = "week",
) -> DataFrame:
    """Classic cohort-retention triangle: keys are cohorted by the
    period of their FIRST event; for every (cohort, period_offset) the
    number of distinct keys active in that later period. The product-
    analytics staple (DAU/WAU retention curves) over the engine's
    events stream.

    ``unit`` ∈ {day, week, month}. Offsets are EXACT integer period
    arithmetic (day counts / 7 for weeks, year*12+month deltas for
    months) — never float date math, so the result is engine-portable.

    Plan: one key-keyed min aggregate (map-side partials) → |keys|
    frame; one equi-join back on the key (the natural co-partitioned
    join — both sides hash on the key, no broadcast of a corpus-scale
    frame); one (cohort, offset, key) distinct whose partial
    aggregation dedups each key's repeat activity map-side BEFORE the
    exchange; one tiny (cohort, offset) count. No window, no global
    sort; hub users cost their own rows only.
    """
    if unit not in ("day", "week", "month"):
        raise ValueError(f"unit must be day/week/month, got {unit!r}")
    trunc = lambda c: F.date_trunc(unit, F.col(c)).cast("date")  # noqa: E731
    firsts = (
        df.groupBy(key_col)
        .agg(F.min(ts_col).alias("_first_ts"))
        .select(F.col(key_col), F.date_trunc(unit, F.col("_first_ts")).cast("date").alias("cohort"))
    )
    activity = df.select(F.col(key_col), trunc(ts_col).alias("_period"))
    joined = activity.join(firsts, key_col)
    if unit == "day":
        offset = F.datediff("_period", "cohort")
    elif unit == "week":
        offset = (F.datediff("_period", "cohort") / 7).cast("int")
    else:  # month — pure integer month index delta, no months_between float
        offset = (F.year("_period") * 12 + F.month("_period")) - (
            F.year("cohort") * 12 + F.month("cohort")
        )
    return (
        joined.select("cohort", offset.cast("int").alias("period_offset"), key_col)
        .distinct()
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    within_s: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion census: for each prefix of ``steps``,
    how many keys performed those event types in strictly increasing
    timestamp order (optionally all within ``within_s`` seconds of the
    first step). Returns (step_idx, step, n_keys) with n_keys
    monotonically non-increasing down the funnel.

    Semantics: a key converts through step k iff it has a step-k event
    STRICTLY after its chosen step-(k-1) time; the chosen time is the
    EARLIEST valid one (min-aggregated), which maximizes the remaining
    window — so the count is the standard "could complete the funnel"
    semantics and is deterministic under timestamp ties without any
    tiebreak column.

    Plan: one filtered scan per step (the event_type predicate is
    pushed to the source scan), each joined to the survivors frame on
    the key — |keys|-scale frames after the first aggregate, so every
    join after step 0 is key-keyed over shrinking inputs. No window,
    no driver loop over data; ``steps`` is metadata-sized.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("_t"))
        .withColumn("_t0", F.col("_t"))
    )
    levels = [cur.select(F.lit(0).alias("step_idx"), F.lit(steps[0]).alias("step"), key_col)]
    for i, step in enumerate(steps[1:], 1):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(key_col), F.col(ts_col).alias("_ts")
        )
        cond = F.col("_ts") > F.col("_t")
        if within_s is not None:
            cond = cond & (
                F.col("_ts") <= F.col("_t0") + F.expr(f"INTERVAL {int(within_s)} SECONDS")
            )
        cur = (
            ev.join(cur, key_col)
            .filter(cond)
            .groupBy(key_col)
            .agg(F.min("_ts").alias("_t"), F.min("_t0").alias("_t0"))
        )
        levels.append(cur.select(F.lit(i).alias("step_idx"), F.lit(step).alias("step"), key_col))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return (
        out.groupBy("step_idx", "step")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .select(F.col("step_idx").cast("int"), "step", "n_keys")
    )
