"""Event-stream (batch view) operators over the ``events`` table:
sessionization and time-windowed aggregation.

The reference is strictly batch-iterative with no time semantics
(SURVEY.md §2.2: date/time + windows absent) — these are the engine's
LLM-pipeline extensions. The streaming variants (same logic over
``readStream`` with watermarks) live in ``mapreducekmean_spark.streaming``.

Determinism: all time math is integer epoch-microseconds
(``unix_micros`` ≙ DuckDB ``epoch_us``), so outputs are exact integers —
no float hazard. Ordering ties are broken by ``event_id`` (unique).

Scale: sessionize is one shuffle (hash by ``user_id``) + a linear
window pass per user partition — per-key work is linear, so skew
degrades gracefully (measured, SCALE.md r4: 868k rows/s with a
zipf(1.2) head user holding 18% of 10M events; as-of 1.6M rows/s same
data). The bucketed range join diffuses hot users across (user,
time-bucket) composite keys — the measured skew relief; AQE skew-join
is the backstop for skew the key design can't spread. Windowed
aggregation is partial+final HashAggregate — shuffle payload is one
row per (window, type) regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducekmean_spark.sources import load_table

#: Session gap threshold: 30 minutes, in microseconds.
SESSION_GAP_US = 30 * 60 * 1_000_000


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def sessionize(ev: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Classic lag+cumsum sessionization: a new session starts when the
    gap since the user's previous event exceeds ``gap_us``.

    Output: one row per (user_id, session_id) with event count, exact
    duration in microseconds, and the session's event-type diversity.
    """
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = ev.withColumn("us", us).withColumn(
        "session_id", F.sum(new_sess).over(run).cast("bigint")
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )


def closed_sessions(ev: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Batch twin of ``streaming.stream_sessionize``: the sessions a
    single-micro-batch streaming run EMITS — every session except each
    user's final (still-open) one, in the stream's output schema
    (``user_id, session_start_us, n_events, duration_us``).

    Declared as an oracle query so the streaming semantics gain a
    driver-checked row (the driver is batch-only);
    ``tests/test_streaming.py`` pins this query equal row-for-row to the
    actual ``applyInPandasWithState`` stream output on the shared
    fixture. Scale shape is ``sessionize``'s: one hash shuffle on
    user_id + linear window passes."""
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = ev.withColumn("us", us).withColumn(
        "session_id", F.sum(new_sess).over(run).cast("bigint")
    )
    sess = with_sess.groupBy("user_id", "session_id").agg(
        F.min("us").alias("session_start_us"),
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )
    w_user = Window.partitionBy("user_id")
    return (
        sess.withColumn("last_sess", F.max("session_id").over(w_user))
        .filter(F.col("session_id") < F.col("last_sess"))
        .select("user_id", "session_start_us", "n_events", "duration_us")
    )


def hourly_rollup(ev: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event type: count, exact cent-sum of
    ``value``, distinct users. ``value`` is 2-decimal in the fixture, so
    summing in integer cents keeps the aggregate exact cross-engine."""
    cents = F.round(F.col("value") * 100).cast("bigint")
    hour_s = F.unix_seconds(F.date_trunc("hour", "ts"))
    return (
        ev.groupBy(
            hour_s.alias("hour_start_s"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents).cast("double") / 100).alias("sum_value"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


def user_funnel(ev: DataFrame) -> DataFrame:
    """Per-user conditional aggregation (the pivot shape as portable SQL):
    event counts by type + first/last activity in epoch seconds."""
    def n_of(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast(
            "bigint"
        )

    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        n_of("signup").alias("n_signup"),
        n_of("click").alias("n_click"),
        n_of("view").alias("n_view"),
        n_of("purchase").alias("n_purchase"),
        n_of("error").alias("n_error"),
        F.min(F.unix_seconds(F.date_trunc("second", "ts"))).alias("first_s"),
        F.max(F.unix_seconds(F.date_trunc("second", "ts"))).alias("last_s"),
    )


#: Range-join lookback window: 24 hours, in microseconds.
RANGE_JOIN_WINDOW_US = 24 * 3600 * 1_000_000


def purchases_with_recent_views(
    ev: DataFrame, window_us: int = RANGE_JOIN_WINDOW_US
) -> DataFrame:
    """RANGE JOIN (an operator Spark lacks natively): for each purchase,
    the count (and value cent-sum — exact) of the same user's *view*
    events in the half-open interval ``[purchase_ts - window_us,
    purchase_ts)``.

    Scale shape: the naive formulation is an inequality join, which
    Spark plans as a per-key nested loop (O(n·m) per user). Instead the
    time axis is bucketed at the window width: a view in range of a
    purchase at time t lies in the purchase's bucket or the one before,
    so the probe side (purchases) emits two bucket keys and the join is
    a plain shuffled equi hash join on (user_id, bucket) — uniform
    keys, linear work, the standard bucketed range-join decomposition
    (same trick as ``dedup.ngram_jaccard_pairs`` on the id axis). The
    residual interval predicate runs as a post-join filter on integer
    microseconds, so results are exact.
    """
    us = F.unix_micros("ts")
    # integer div, not float floor(us/w): epoch micros are ~1.7e15 and
    # the bucket edge must be exact; fixture times are post-1970 so
    # div == floor
    blk = F.expr(f"unix_micros(ts) div {window_us}")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        us.alias("buy_us"),
        F.explode(F.array(blk - 1, blk)).alias("blk"),
    )
    views = _finite_value(ev.filter(F.col("event_type") == "view")).select(
        "user_id",
        us.alias("view_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("view_cents"),
        blk.alias("blk"),
    )
    joined = buys.join(views, ["user_id", "blk"]).filter(
        (F.col("view_us") >= F.col("buy_us") - window_us)
        & (F.col("view_us") < F.col("buy_us"))
    )
    return joined.groupBy("purchase_id", "user_id", "buy_us").agg(
        F.count("*").alias("n_views"),
        (F.sum("view_cents").cast("double") / 100).alias("view_value"),
    )


#: Per-(user, bucket) view cap for the bounded range join — the 100 TB
#: remedy SCALE.md names for hot keys whose correct trailing-window
#: answer is itself quadratic in key density.
RANGE_JOIN_VIEW_CAP = 64


def purchases_with_recent_views_capped(
    ev: DataFrame,
    window_us: int = RANGE_JOIN_WINDOW_US,
    view_cap: int = RANGE_JOIN_VIEW_CAP,
) -> DataFrame:
    """Bounded-output range join: ``purchases_with_recent_views`` with
    the candidate views pre-capped to the ``view_cap`` MOST RECENT per
    (user, 24h time bucket) before the join.

    Semantics delta (documented, deterministic): ``n_views``/
    ``view_value`` count only a user's last ``view_cap`` views within
    each window-width bucket — EXACT whenever every user has ≤
    ``view_cap`` views per bucket (always true on the fixtures), a
    most-recent truncation beyond it (ties impossible: the order key
    ``(view_us, event_id)`` is unique). This bounds the join's per-key
    work at ``2·view_cap`` candidate rows per purchase, so a zipf head
    key whose *correct* answer is quadratic in its density (SCALE.md:
    the semantic blowup no join strategy fixes) degrades to a capped,
    linear-sized computation instead of 10^10 output pairs. The cap
    itself is one window pass per (user, bucket) partition — the same
    linear per-key shape as sessionize."""
    us = F.unix_micros("ts")
    blk = F.expr(f"unix_micros(ts) div {window_us}")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        us.alias("buy_us"),
        F.explode(F.array(blk - 1, blk)).alias("blk"),
    )
    w_cap = Window.partitionBy("user_id", "blk").orderBy(
        F.col("view_us").desc(), F.col("view_event_id").desc()
    )
    views = (
        _finite_value(ev.filter(F.col("event_type") == "view"))
        .select(
            "user_id",
            F.col("event_id").alias("view_event_id"),
            us.alias("view_us"),
            F.round(F.col("value") * 100).cast("bigint").alias("view_cents"),
            blk.alias("blk"),
        )
        .withColumn("rn", F.row_number().over(w_cap))
        .filter(F.col("rn") <= view_cap)
        .drop("rn", "view_event_id")
    )
    joined = buys.join(views, ["user_id", "blk"]).filter(
        (F.col("view_us") >= F.col("buy_us") - window_us)
        & (F.col("view_us") < F.col("buy_us"))
    )
    return joined.groupBy("purchase_id", "user_id", "buy_us").agg(
        F.count("*").alias("n_views"),
        (F.sum("view_cents").cast("double") / 100).alias("view_value"),
    )


def _finite_value(ev: DataFrame) -> DataFrame:
    """Guard numeric ``value`` paths against NULL/NaN rows: NaN casts to 0
    in Spark but errors DuckDB's CAST, and NULLs sort NULLS FIRST in
    Spark windows vs NULLS LAST in DuckDB — so both engines agree only on
    the finite subset. Fixtures contain no such rows (the filter is free),
    but the operators must not silently diverge on dirtier data."""
    return ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))


def value_histogram(ev: DataFrame, bucket_width: float = 50.0) -> DataFrame:
    """Fixed-width histogram of ``value`` per event type (the
    ``width_bucket`` shape): bucket ordinal, count, and exact cent-sum.
    Pure partial+final HashAggregate — shuffle payload is one row per
    (type, bucket) at any scale."""
    ev = _finite_value(ev)
    cents = F.round(F.col("value") * 100).cast("bigint")
    width_c = int(round(bucket_width * 100))
    # FLOOR division (cents - pmod is the largest multiple of width ≤
    # cents), matching DuckDB's `//` on negative cents too — Spark's
    # `div` truncates toward zero and would diverge below 0.
    bucket = F.expr(
        f"(CAST(round(value * 100) AS BIGINT)"
        f" - pmod(CAST(round(value * 100) AS BIGINT), {width_c}))"
        f" div {width_c}"
    )
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        (F.sum(cents).cast("double") / 100).alias("sum_value"),
    )


def value_quantiles(ev: DataFrame) -> DataFrame:
    """Exact per-group quantiles (p50/p90/p99 of ``value`` per event
    type) using the type-1 (inverted-CDF) definition: the smallest value
    whose cumulative count reaches 1-based sorted position ``ceil(p·n)``.

    Why not ``percentile``/``quantile_cont``: engines interpolate with
    float arithmetic whose rounding isn't specified cross-engine; the
    positional definition picks an *actual data value* via pure integer
    index math, so results are exact.

    Scale shape — histogram + cumulative sum, NOT a per-group sort: a
    row_number over ``partitionBy(event_type)`` would sort entire groups
    on single tasks (event_type has a handful of values — the textbook
    low-cardinality-key window skew). Instead the heavy pass is a
    partial+final count on (event_type, cents) — tens of thousands of
    uniform keys — and the window's cumulative sum runs over that tiny
    distinct-value table. Equivalent by construction: the element at
    sorted position k is the smallest value with cumulative count ≥ k.
    At extreme value cardinality the sketch path (``approx_percentile``)
    is the alternative — engine-specific, hence not the oracle surface.
    """
    ev = _finite_value(ev)
    cents = F.round(F.col("value") * 100).cast("bigint")
    hist = ev.groupBy("event_type", cents.alias("cents")).agg(
        F.count("*").alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("event_type"))
    )

    def pick(num: int, den: int):
        # smallest value at/after 1-based position ceil(n·num/den)
        pos = F.expr(f"(n * {num} + {den - 1}) div {den}")
        return F.min(F.when(F.col("cum") >= pos, F.col("cents")))

    return cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (pick(1, 2).cast("double") / 100).alias("p50"),
        (pick(9, 10).cast("double") / 100).alias("p90"),
        (pick(99, 100).cast("double") / 100).alias("p99"),
    )


def user_retention_cohorts(ev: DataFrame) -> DataFrame:
    """Classic retention matrix: users grouped by first-seen week
    (cohort), counted per subsequent activity week with the week offset.

    Two aggregations: first-seen per user (partial+final min on
    user_id), broadcast-joined back (the cohort table is one row per
    user — at true scale it stays a shuffle join on user_id, which AQE
    picks automatically), then distinct users per (cohort, activity)
    week pair. Week truncation is ISO-Monday in both engines; all time
    math in epoch seconds."""
    week_s = F.unix_seconds(F.date_trunc("week", "ts"))
    first = ev.groupBy("user_id").agg(F.min(week_s).alias("cohort_s"))
    j = ev.select("user_id", week_s.alias("week_s")).join(first, "user_id")
    return (
        j.groupBy("cohort_s", "week_s")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
        .withColumn(
            # integer div: offsets are non-negative multiples of a week
            # (cohort is the min), so div == floor == DuckDB's //
            "week_offset",
            F.expr(f"(week_s - cohort_s) div {7 * 86400}"),
        )
    )


def approx_user_counts(ev: DataFrame, rsd: float = 0.02) -> DataFrame:
    """HLL++ sketch aggregation: per event type, approximate distinct
    users alongside the exact count.

    The 100 TB rationale: exact COUNT(DISTINCT) shuffles every distinct
    key; ``approx_count_distinct`` carries a fixed-size HyperLogLog++
    sketch through partial/final aggregation — constant shuffle payload
    per group at any input size. Rows-only contract entry (sketch
    internals are engine-specific); the accuracy bound is pinned by a
    pytest invariant instead (|approx-exact|/exact well within 3·rsd).
    """
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.count("*").alias("n_events"),
    )


def approx_user_counts_checked(ev: DataFrame, rsd: float = 0.02) -> DataFrame:
    """The oracle-facing form of ``approx_user_counts``: the raw HLL++
    estimate is engine-specific (sketch internals differ), so instead of
    emitting it, emit the sketch's accuracy VERDICT — whether the
    estimate landed within 3·rsd of the exact count — alongside the
    engine-agnostic exact columns. The DuckDB twin computes the exact
    truth and asserts the verdict TRUE, turning the former rows-only
    entry into a value-hash-checked claim: "the engine's sketch
    satisfies its accuracy contract on this data". The sketch aggregate
    still executes in full (same plan as the raw form)."""
    base = approx_user_counts(ev, rsd)
    tol = 3.0 * rsd
    return base.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(tol) * F.col("exact_users")
        ).alias("approx_ok"),
    )


#: Stream-stream interval join attribution window (streaming/jobs.py
#: ``stream_view_purchase_join`` uses the same 30 minutes).
ATTRIBUTION_WINDOW_MIN = 30


def view_purchase_attribution(
    ev: DataFrame, within_minutes: int = ATTRIBUTION_WINDOW_MIN
) -> DataFrame:
    """Batch twin of ``streaming.stream_view_purchase_join``: purchases
    attributed to every preceding view by the same user within the
    attribution window, in the stream job's output schema (timestamps
    as epoch micros so the driver compare is integer-exact).

    Declared as an oracle query so the stream-stream interval join
    semantics gain a driver-checked row (the driver is batch-only);
    ``tests/test_streaming.py`` pins this query equal row-for-row to
    the actual watermarked stream-stream join output on the shared
    fixture. Scale shape: an EQUI hash join on user_id with the time
    interval as the join residual — the batch plan needs no
    time-bucketing because the equality key alone bounds each probe,
    unlike the key-free trailing-window range join
    (``purchases_with_recent_views``)."""
    us = F.unix_micros("ts")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        us.alias("view_us"),
        F.col("event_id").alias("view_id"),
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        us.alias("buy_us"),
        F.col("event_id").alias("buy_id"),
    )
    win_us = within_minutes * 60 * 1_000_000
    return (
        views.join(
            buys,
            (F.col("v_user") == F.col("b_user"))
            & (F.col("buy_us") >= F.col("view_us"))
            & (F.col("buy_us") <= F.col("view_us") + win_us),
        )
        .select("v_user", "view_id", "buy_id", "view_us", "buy_us")
    )


def hourly_gapfill(ev: DataFrame) -> DataFrame:
    """Gap-filled hourly series: every (hour, event_type) cell between
    the corpus's first and last hour, zero-filled where no events
    landed — the time-series densification every dashboard/forecast
    consumer needs before windowed math (a missing bucket is NOT the
    same as a zero bucket to a moving average). The reference engine
    has nothing like this (3 Java files, one K-Means job; KMeans.java).

    Scale shape: the hour spine is ``explode(sequence(lo, hi))`` off a
    1-row min/max aggregate — spine size = hours × types, time-bounded
    not data-bounded — cross-joined with the distinct type list and
    LEFT-joined against the hourly aggregate. Everything integer
    (epoch-second hour starts, counts), so the twin hashes exactly.
    """
    hour_s = F.unix_seconds(F.date_trunc("hour", "ts"))
    counts = ev.groupBy(hour_s.alias("hour_start_s"), "event_type").agg(
        F.count("*").alias("n_raw")
    )
    bounds = ev.agg(
        F.min(hour_s).alias("lo"), F.max(hour_s).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(3600))
        ).alias("hour_start_s")
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    return grid.join(counts, ["hour_start_s", "event_type"], "left").select(
        "hour_start_s",
        "event_type",
        F.coalesce("n_raw", F.lit(0)).cast("bigint").alias("n"),
        F.col("n_raw").isNull().alias("filled"),
    )


def _group_median(
    df: DataFrame, group_col: str | list[str], val_col: str, out_col: str
) -> DataFrame:
    """Type-1 (inverted-CDF) median of an INTEGER column per group via
    the histogram+cumsum positional pick — the ``value_quantiles``
    machinery, shared so the anomaly detectors' median passes are
    one copy of the arithmetic. Exact: pure integer index math over
    actual data values. ``group_col`` may be a composite key (the
    seasonal detector groups by (event_type, hour-of-day))."""
    cols = [group_col] if isinstance(group_col, str) else list(group_col)
    hist = df.groupBy(*cols, val_col).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy(*cols)
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "tot", F.sum("cnt").over(Window.partitionBy(*cols))
    )
    pos = F.expr("(tot + 1) div 2")  # 1-based ceil(tot/2)
    return cum.groupBy(*cols).agg(
        F.min(F.when(F.col("cum") >= pos, F.col(val_col))).alias(out_col)
    )


#: anomaly threshold: |n − median| > MAD_K × MAD flags the bucket.
MAD_K = 3


def hourly_anomaly(ev: DataFrame) -> DataFrame:
    """Robust anomaly detection over the DENSIFIED hourly series:
    per event type, flag hours whose count deviates from the type's
    median by more than ``MAD_K`` × the median absolute deviation —
    median/MAD instead of mean/stddev so the detector itself is not
    dragged by the outliers it hunts, and the zero-filled grid
    (:func:`hourly_gapfill`) so silent hours are anomalies too (the
    classic monitoring miss). Every quantity is an integer (counts,
    type-1 medians of counts, integer deviations), so the verdict is
    an exact integer comparison — no float anywhere.

    Scale shape: gapfill's grid (hours × types) is time-bounded; both
    median passes run the histogram+cumsum positional pick over that
    bounded table (never a per-group row sort); one broadcast-sized
    (type, med, mad) table joins back.
    """
    g = hourly_gapfill(ev).select("hour_start_s", "event_type", "n")
    med = _group_median(g, "event_type", "n", "med")
    d = g.join(med, "event_type").withColumn(
        "dev", F.abs(F.col("n") - F.col("med"))
    )
    mad = _group_median(d, "event_type", "dev", "mad")
    return (
        d.join(mad, "event_type")
        .select(
            "hour_start_s",
            "event_type",
            "n",
            "med",
            "mad",
            (F.col("dev") > MAD_K * F.col("mad")).alias("is_anomaly"),
        )
    )


def hourly_anomaly_seasonal(ev: DataFrame) -> DataFrame:
    """Seasonal-baseline anomaly detection: :func:`hourly_anomaly` with
    the median/MAD baseline per (event_type, HOUR-OF-DAY) instead of a
    single global baseline per type. A daily-periodic stream (busy
    noon, quiet 3am) makes the global detector flag every normal quiet
    night as anomalous; here each hour is judged against other
    instances of the SAME wall-clock hour, so periodic lows are the
    baseline and only genuine deviations (a silent noon, a 3am spike)
    fire — pinned against the global form's false positive in
    tests/test_edge_cases.py.

    Hour-of-day is ``(hour_start_s div 3600) % 24`` (UTC) — pure
    integer arithmetic, identical in the DuckDB twin; everything else
    is the shared :func:`_group_median` histogram+cumsum pick, so the
    verdict stays an exact integer comparison.

    Scale shape: identical to the global form — the grouped medians run
    over the time-bounded gapfilled grid; the baseline join-back table
    grows only 24× (types × 24), still broadcast-sized.
    """
    hod = F.expr("(hour_start_s div 3600) % 24")
    g = (
        hourly_gapfill(ev)
        .select("hour_start_s", "event_type", "n")
        .withColumn("hod", hod)
    )
    keys = ["event_type", "hod"]
    med = _group_median(g, keys, "n", "med")
    d = g.join(med, keys).withColumn(
        "dev", F.abs(F.col("n") - F.col("med"))
    )
    mad = _group_median(d, keys, "dev", "mad")
    return d.join(mad, keys).select(
        "hour_start_s",
        "event_type",
        F.col("hod").cast("bigint").alias("hod"),
        "n",
        "med",
        "mad",
        (F.col("dev") > MAD_K * F.col("mad")).alias("is_anomaly"),
    )
