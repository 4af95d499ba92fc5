from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1)


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


def test_asof_join_golden(spark):
    from rdf_indexes_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("k", _ts(5), "p1"), ("k", _ts(10), "p2"), ("k", _ts(0), "p0"),
         ("z", _ts(9), "pz")],
        "key string, ts timestamp, pl string",
    )
    right = spark.createDataFrame(
        [("k", _ts(1), "qa"), ("k", _ts(5), "qb"), ("k", _ts(7), "qc")],
        "key string, ts timestamp, quote string",
    )
    got = {
        (r.key, r.ts): (r.ts_r, r.quote_r)
        for r in asof_join(left, right, on=["key"]).collect()
    }
    assert got == {
        ("k", _ts(0)): (None, None),       # nothing at or before
        ("k", _ts(5)): (_ts(5), "qb"),     # inclusive equality
        ("k", _ts(10)): (_ts(7), "qc"),    # latest prior
        ("z", _ts(9)): (None, None),       # key absent from right
    }
    # tolerance discards the 3-minute-stale match
    tol = {
        (r.key, r.ts): r.quote_r
        for r in asof_join(left, right, on=["key"], tolerance_s=120).collect()
    }
    assert tol[("k", _ts(10))] is None and tol[("k", _ts(5))] == "qb"


def test_asof_join_matches_pandas_merge_asof(spark):
    """Parity with pandas.merge_asof on random unique-(key,ts) data —
    the de-facto semantic oracle for backward as-of joins."""
    import random

    from rdf_indexes_spark.operators.temporal import asof_join

    rng = random.Random(7)
    lrows = sorted(
        {(f"k{rng.randrange(5)}", _ts(rng.randrange(500))) for _ in range(300)}
    )
    rrows = sorted(
        {(f"k{rng.randrange(5)}", _ts(rng.randrange(500))) for _ in range(200)}
    )
    lpd = pd.DataFrame(lrows, columns=["key", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(
        [(k, t, f"v{k}{t:%H%M}") for k, t in rrows], columns=["key", "ts", "val"]
    ).sort_values("ts")
    want = pd.merge_asof(lpd, rpd, on="ts", by="key", direction="backward")
    want_map = {
        (r.key, r.ts.to_pydatetime()): (None if pd.isna(r.val) else r.val)
        for r in want.itertuples()
    }
    left = spark.createDataFrame(lpd, "key string, ts timestamp")
    right = spark.createDataFrame(rpd, "key string, ts timestamp, val string")
    got = {
        (r.key, r.ts): r.val_r
        for r in asof_join(left, right, on=["key"]).collect()
    }
    assert got == want_map


def test_asof_join_deterministic_tie_and_layout(spark):
    """Duplicate right timestamps resolve to the LARGEST payload, at
    any partitioning."""
    from rdf_indexes_spark.operators.temporal import asof_join

    left = spark.createDataFrame([("k", _ts(9), 1)], "key string, ts timestamp, x int")
    right = spark.createDataFrame(
        [("k", _ts(3), "a"), ("k", _ts(3), "b"), ("k", _ts(3), "c")],
        "key string, ts timestamp, v string",
    )
    for rp in (right, right.repartition(7)):
        assert asof_join(left, rp, on=["key"]).first().v_r == "c"


def test_asof_join_errors(spark):
    import pytest as _pytest

    from rdf_indexes_spark.operators.temporal import asof_join

    df = spark.createDataFrame([("k", _ts(0), 1)], "key string, ts timestamp, v int")
    with _pytest.raises(ValueError):
        asof_join(df, df, on=["ts"])
    with _pytest.raises(ValueError):
        asof_join(df.withColumn("v_r", F.lit(1)), df, on=["key"])


def test_fact_as_of_snapshot(spark):
    """fact_as_of(history, T) == current_facts over only the assertions
    up to T — for several cut points of a random stream."""
    from rdf_indexes_spark.operators.schema import current_facts, fact_history
    from rdf_indexes_spark.operators.temporal import fact_as_of

    import random

    rng = random.Random(13)
    rows = [
        (f"s{rng.randrange(6)}", "p", f"v{rng.randrange(3)}", _ts(rng.randrange(300)))
        for _ in range(150)
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, ts timestamp")
    hist = fact_history(df).localCheckpoint()
    for cut in (50, 150, 299):
        t = _ts(cut)
        want = {
            (r.s, r.p): r.o
            for r in current_facts(df.filter(F.col("ts") <= t)).collect()
        }
        got = {(r.s, r.p): r.o for r in fact_as_of(hist, t).collect()}
        assert got == want, f"cut={cut}"


def test_interval_point_join_brute_force_parity(spark):
    """Bucketized range join equals the brute-force inequality join on
    random keyed data, at several bin widths (result must be
    width-invariant)."""
    import random

    from rdf_indexes_spark.operators.temporal import interval_point_join

    rng = random.Random(21)
    pts = [(f"k{rng.randrange(4)}", rng.randrange(0, 1000), i) for i in range(200)]
    ivs = []
    for j in range(60):
        a = rng.randrange(0, 1000)
        ivs.append((f"k{rng.randrange(4)}", a, a + rng.randrange(0, 150), j))
    points = spark.createDataFrame(pts, "key string, t long, pid long")
    intervals = spark.createDataFrame(ivs, "key string, lo long, hi long, iid long")
    want = {
        (k, t, pid, j)
        for k, t, pid in pts
        for kk, a, b, j in ivs
        if kk == k and a <= t <= b
    }
    for bw in (7, 64, 1000):
        got = {
            (r.key, r.t, r.pid, r.iid)
            for r in interval_point_join(
                points, intervals, "t", "lo", "hi", on=["key"], bin_width=bw
            ).collect()
        }
        assert got == want, f"bin_width={bw}"
    # no duplicate pairs at any width
    out = interval_point_join(points, intervals, "t", "lo", "hi", on=["key"], bin_width=7)
    assert out.count() == len(want)


def test_interval_point_join_guard_and_errors(spark):
    import pytest as _pytest

    from rdf_indexes_spark.operators.temporal import interval_point_join

    points = spark.createDataFrame([(5, 1)], "t long, pid long")
    huge = spark.createDataFrame([(0, 10_000_000, 1)], "lo long, hi long, iid long")
    with _pytest.raises(Exception) as ei:
        interval_point_join(
            points, huge, "t", "lo", "hi", bin_width=1, max_bins_per_interval=100
        ).collect()
    assert "max_bins_per_interval" in str(ei.value)
    with _pytest.raises(ValueError):
        interval_point_join(points, points, "t", "lo", "hi")


def test_interval_point_join_sessions_composition(spark):
    """Compose with sessionize: every event lands back in exactly the
    session that contains it (boundary-inclusive on both ends)."""
    import datetime as dt

    from rdf_indexes_spark.operators.dialogue import sessionize
    from rdf_indexes_spark.operators.temporal import interval_point_join

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    import random
    rng = random.Random(2)
    for u in range(5):
        t = 0
        for _ in range(40):
            t += rng.randrange(1, 4000)
            rows.append((u, t0 + dt.timedelta(seconds=t)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    sess = sessionize(ev, key_col="user_id", ts_col="ts", gap="30 minutes")
    pts = ev.select("user_id", F.unix_timestamp("ts").alias("t"))
    j = interval_point_join(
        pts, sess, "t", "session_start_s", "session_last_s",
        on=["user_id"], bin_width=600,
    )
    # every event matched exactly one session
    assert j.count() == ev.count()
    assert j.groupBy("user_id", "t").count().filter("count > 1").count() == 0


def test_time_rollup_golden_and_consistency(spark):
    """Bucket math golden + cross-resolution consistency: day rows are
    the sums of their hour rows, grand totals match the corpus."""
    import random

    from rdf_indexes_spark.operators.temporal import time_rollup

    rng = random.Random(31)
    rows = [
        (f"k{rng.randrange(3)}",
         T0 + dt.timedelta(minutes=rng.randrange(0, 60 * 72)),
         rng.randrange(0, 1000) / 100.0)
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = time_rollup(df, key_cols=["k"], value_col="v").collect()
    hours = [r for r in out if r.resolution == "hour"]
    days = [r for r in out if r.resolution == "day"]
    assert sum(r.n_rows for r in hours) == len(rows)
    assert sum(r.n_rows for r in days) == len(rows)
    assert sum(r.sum_x1e2 for r in hours) == sum(r.sum_x1e2 for r in days)
    assert sum(r.sum_x1e2 for r in days) == round(
        sum(round(v * 100) for _, _, v in rows)
    )
    # each day row aggregates exactly its hours
    from collections import defaultdict
    per_day = defaultdict(int)
    for r in hours:
        per_day[(r.k, r.bucket_start - r.bucket_start % 86400)] += r.n_rows
    assert per_day == {(r.k, r.bucket_start): r.n_rows for r in days}


def test_time_rollup_no_value_and_errors(spark):
    import pytest as _pytest

    from rdf_indexes_spark.operators.temporal import time_rollup

    df = spark.createDataFrame([("k", T0)], "k string, ts timestamp")
    r = time_rollup(df, key_cols=["k"], resolutions=("day",)).first()
    assert r.sum_x1e2 is None and r.n_rows == 1 and r.resolution == "day"
    with _pytest.raises(ValueError):
        time_rollup(df, resolutions=("fortnight",))


def test_asof_join_forward_matches_pandas(spark):
    """direction='forward' parity with pandas.merge_asof forward on
    random unique-(key,ts) data, plus tolerance semantics."""
    import random

    from rdf_indexes_spark.operators.temporal import asof_join

    rng = random.Random(19)
    lrows = sorted(
        {(f"k{rng.randrange(5)}", _ts(rng.randrange(500))) for _ in range(250)}
    )
    rrows = sorted(
        {(f"k{rng.randrange(5)}", _ts(rng.randrange(500))) for _ in range(150)}
    )
    lpd = pd.DataFrame(lrows, columns=["key", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(
        [(k, t, f"v{k}{t:%H%M}") for k, t in rrows], columns=["key", "ts", "val"]
    ).sort_values("ts")
    left = spark.createDataFrame(lpd, "key string, ts timestamp")
    right = spark.createDataFrame(rpd, "key string, ts timestamp, val string")
    for tol in (None, 3600):
        kw = {} if tol is None else {"tolerance": pd.Timedelta(seconds=tol)}
        want = pd.merge_asof(lpd, rpd, on="ts", by="key", direction="forward", **kw)
        want_map = {
            (r.key, r.ts.to_pydatetime()): (None if pd.isna(r.val) else r.val)
            for r in want.itertuples()
        }
        got = {
            (r.key, r.ts): r.val_r
            for r in asof_join(
                left, right, on=["key"], direction="forward",
                **({} if tol is None else {"tolerance_s": tol}),
            ).collect()
        }
        assert got == want_map, f"tol={tol}"


def test_asof_join_direction_errors(spark):
    import pytest as _pytest

    from rdf_indexes_spark.operators.temporal import asof_join

    df = spark.createDataFrame([("k", _ts(0), 1)], "key string, ts timestamp, v int")
    with _pytest.raises(ValueError):
        asof_join(df, df.drop("v"), on=["key"], direction="nearest")


def test_time_resample_golden(spark):
    """Gaps fill with zeros per key between that key's own min and max
    bucket; totals sum exactly; epoch-int and timestamp inputs agree."""
    import datetime as dt

    from rdf_indexes_spark.operators.temporal import time_resample

    rows = [
        ("a", 100, 5), ("a", 105, 7),   # bucket 100 (n=2, total=12)
        ("a", 130, 1),                   # bucket 130; 110,120 missing
        ("b", 200, 4),                   # single bucket
    ]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    got = {
        (r.k, r.bucket): (r.n, r.total)
        for r in time_resample(df, "t", 10, ["k"], "v").collect()
    }
    assert got == {
        ("a", 100): (2, 12), ("a", 110): (0, 0), ("a", 120): (0, 0),
        ("a", 130): (1, 1), ("b", 200): (1, 4),
    }
    # timestamp input, no value column
    ts = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, 0, 5)),
         ("a", dt.datetime(2024, 1, 1, 0, 2, 0))],
        "k string, ts timestamp",
    )
    out = time_resample(ts, "ts", 60, ["k"]).collect()
    lo = min(r.bucket for r in out)
    assert sorted((r.bucket - lo, r.n) for r in out) == [(0, 1), (60, 0), (120, 1)]


def test_time_resample_guard_and_errors(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from rdf_indexes_spark.operators.temporal import time_resample

    df = spark.createDataFrame([("a", 0, 1), ("a", 10**9, 1)], "k string, t long, v long")
    with pytest.raises(SparkRuntimeException, match="max_buckets_per_key"):
        time_resample(df, "t", 1, ["k"], max_buckets_per_key=100).collect()
    with pytest.raises(ValueError):
        time_resample(df, "t", 0, ["k"])
    with pytest.raises(ValueError):
        time_resample(df, "t", 10, [])


def test_trailing_counts_golden(spark):
    """Strict-past window: same-instant peers excluded, window edge
    inclusive at -window_s, sums exact, keys independent."""
    from rdf_indexes_spark.operators.temporal import trailing_counts

    rows = [
        ("u", 100, 1, "a"), ("u", 100, 2, "b"),  # peers: not each other's past
        ("u", 105, 4, "c"),                      # sees both 100s
        ("u", 160, 8, "d"),                      # 60s window: sees 105 & 100s
        ("u", 166, 16, "e"),                     # sees only 160 (105 < 106)
        ("v", 100, 32, "f"),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v long, id string")
    got = {r.id: (r.n_prev, r.sum_prev)
           for r in trailing_counts(df, "t", ["k"], 60, "v").collect()}
    assert got == {
        "a": (0, 0), "b": (0, 0), "c": (2, 3), "d": (3, 7), "e": (1, 8),
        "f": (0, 0),
    }


def test_event_transitions_golden(spark):
    from rdf_indexes_spark.operators.temporal import event_transitions

    rows = [
        ("u", 1, 1, "x"), ("u", 2, 2, "y"), ("u", 3, 3, "x"),
        ("v", 1, 4, "y"), ("v", 2, 5, "y"),
        ("w", 9, 9, "x"),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, "k string, t long, id long, s string")
    got = {(r.prev_state, r.state): r.n
           for r in event_transitions(df, "t", "k", "s", "id").collect()}
    assert got == {("x", "y"): 1, ("y", "x"): 1, ("y", "y"): 1}


def test_retention_cohorts_golden(spark):
    """Two day-cohorts; user u2 skips day 1 and returns day 2 — the
    triangle must show the gap (no offset-1 row for u2's cohort)."""
    from rdf_indexes_spark.operators.temporal import retention_cohorts

    rows = [
        ("u1", _ts(0)), ("u1", _ts(60 * 24)),            # day0 cohort, active d0+d1
        ("u2", _ts(10)), ("u2", _ts(60 * 48 + 5)),       # day0 cohort, active d0+d2
        ("u3", _ts(60 * 24)),                            # day1 cohort, active d1 only
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        (str(r.cohort), r.period_offset): r.n_active
        for r in retention_cohorts(df, "ts", "user_id", "day").collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,   # u1+u2
        ("2024-01-01", 1): 1,   # u1 only
        ("2024-01-01", 2): 1,   # u2 returns
        ("2024-01-02", 0): 1,   # u3's own cohort
    }


def test_retention_cohorts_week_month_units(spark):
    from rdf_indexes_spark.operators.temporal import retention_cohorts

    rows = [
        ("a", dt.datetime(2024, 1, 2)),   # week of Jan 1 (Mon), month Jan
        ("a", dt.datetime(2024, 1, 10)),  # next week, same month
        ("a", dt.datetime(2024, 3, 5)),   # +9 weeks, +2 months
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    wk = {r.period_offset for r in retention_cohorts(df, unit="week", key_col="user_id").collect()}
    assert wk == {0, 1, 9}
    mo = {r.period_offset for r in retention_cohorts(df, unit="month", key_col="user_id").collect()}
    assert mo == {0, 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        retention_cohorts(df, unit="fortnight")


def test_funnel_golden(spark):
    """Order strictness + completion window: u1 converts fully; u2 did
    click BEFORE view (doesn't count); u3 purchases outside 1h window."""
    from rdf_indexes_spark.operators.temporal import funnel

    rows = [
        ("u1", _ts(0), "view"), ("u1", _ts(1), "click"), ("u1", _ts(2), "purchase"),
        ("u2", _ts(5), "click"), ("u2", _ts(6), "view"),
        ("u3", _ts(0), "view"), ("u3", _ts(2), "click"), ("u3", _ts(120), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    got = {
        r.step_idx: (r.step, r.n_keys)
        for r in funnel(df, ["view", "click", "purchase"], within_s=3600).collect()
    }
    assert got == {0: ("view", 3), 1: ("click", 2), 2: ("purchase", 1)}


def test_funnel_earliest_valid_semantics(spark):
    """The chosen step time is the EARLIEST valid one, so a later
    step-2 event can still pair with an early step-1 event."""
    from rdf_indexes_spark.operators.temporal import funnel

    rows = [
        ("u", _ts(0), "a"), ("u", _ts(1), "b"), ("u", _ts(0), "b"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    got = {r.step_idx: r.n_keys for r in funnel(df, ["a", "b"]).collect()}
    # the t=0 'b' is NOT strictly after a's t=0; the t=1 'b' is
    assert got == {0: 1, 1: 1}
    # same-instant only → no conversion
    df2 = spark.createDataFrame(
        [("u", _ts(0), "a"), ("u", _ts(0), "b")],
        "user_id string, ts timestamp, event_type string",
    )
    got2 = {r.step_idx: r.n_keys for r in funnel(df2, ["a", "b"]).collect()}
    assert got2 == {0: 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel(df, [])
