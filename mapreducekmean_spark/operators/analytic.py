"""Analytic operator coverage absent from the reference (SURVEY.md §2.2
rows "Set ops", "Window functions", "Date/time fns", "Array/map/JSON
fns", plus multi-dimensional GROUPING SETS): rollup, cube, set
operations, JSON extraction, and running-window analytics over the
TPC-H-ish fixtures.

The reference has exactly one aggregation (the per-cluster mean,
``/root/reference/src/MapReduceKMean/PointsReducer.java:17-36``) and no
grouping-set / set-op / JSON / window surface anywhere in its three
source files — these operators are the engine's general-analytics
extension, each with an exact DuckDB oracle in ``contract.py``.

Cross-engine exactness:
- Money/value sums run in integer cents (``round(x*100)`` → BIGINT).
  Fixture audit: every ``o_totalprice``/``value`` is within 4e-9 of an
  integer cent count, so the rounding boundary is never in play and both
  engines round identically.
- ``GROUPING`` bits are computed explicitly (``2*grouping(a) +
  grouping(b)``) instead of relying on engine-specific ``GROUPING_ID``
  bit orders.
- Window frames are fully ordered (date + unique key tie-break), and the
  running sums are integer, so accumulation order cannot produce float
  drift.

Scale notes (100 TB design intent):
- ``rollup``/``cube`` plan as a single Expand + partial/final
  HashAggregate — one shuffle regardless of how many grouping sets, and
  Expand's row multiplication happens *before* the partial aggregate, so
  the shuffle payload stays one row per (group, set).
- Set ops are hash aggregations/joins on the projected key only —
  column-pruned to one BIGINT per row before any exchange.
- ``from_json`` is a JVM-side codegen'd expression (no Python).
- The running-spend window shuffles once on ``o_custkey``; skewed
  customers are bounded by orders-per-customer, and AQE skew handling
  covers the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducekmean_spark.sources import load_table


# Shared integer-cent money kernel (the cross-engine exactness rule) —
# single-sourced from the relational module.
from mapreducekmean_spark.operators.relational import _cents  # noqa: E402


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (o_orderpriority, o_orderstatus): detail rows, per-priority
    subtotals, and the grand total in one pass.

    gid disambiguates real NULL keys from super-aggregate rows:
    0=detail, 1=priority subtotal, 3=grand total.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "price_c", _cents("o_totalprice")
    )
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        (F.grouping("o_orderpriority") * 2 + F.grouping("o_orderstatus"))
        .cast("bigint")
        .alias("gid"),
        F.count("*").alias("n_orders"),
        (F.sum("price_c").cast("double") / 100).alias("total_price"),
    )


def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (event_type, hour-of-day): all four grouping sets — per
    (type, hour), per type, per hour, and grand total — one Expand +
    one shuffle."""
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("hour_of_day", F.hour("ts").cast("bigint"))
        .withColumn("value_c", _cents("value"))
    )
    return ev.cube("event_type", "hour_of_day").agg(
        (F.grouping("event_type") * 2 + F.grouping("hour_of_day"))
        .cast("bigint")
        .alias("gid"),
        F.count("*").alias("n"),
        (F.sum("value_c").cast("double") / 100).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: day and day+hour
    aggregates (plus the grand total) in ONE pass via ROLLUP over two
    truncations of the same timestamp — the continuous-aggregate shape a
    time-series store maintains, planned as a single Expand + one
    shuffle. Epoch-second keys, integer-cent sums: exact."""
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("day_s", F.unix_seconds(F.date_trunc("day", "ts")))
        .withColumn("hour_s", F.unix_seconds(F.date_trunc("hour", "ts")))
        .withColumn("value_c", _cents("value"))
    )
    return ev.rollup("day_s", "hour_s").agg(
        (F.grouping("day_s") * 2 + F.grouping("hour_s"))
        .cast("bigint")
        .alias("gid"),
        F.count("*").alias("n"),
        (F.sum("value_c").cast("double") / 100).alias("sum_value"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION (distinct semantics, matching ANSI):

    (urgent-order custkeys ∩ finished-order custkeys)
      ∪ (BUILDING-segment custkeys ∖ urgent-order custkeys)
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    building = c.select(F.col("c_custkey").alias("custkey")).where(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        urgent.intersect(finished)
        .union(building.subtract(urgent))
        .distinct()
    )


def customer_set_ops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (ALL variants — duplicates preserved):
    urgent-order custkeys EXCEPT ALL finished-order custkeys, then
    INTERSECT ALL with BUILDING-segment custkeys replicated per order.
    Output keeps multiplicity, aggregated to (custkey, n) so the result
    is deterministic and compact."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    building_orders = o.join(
        c.filter(F.col("c_mktsegment") == "BUILDING"),
        o.o_custkey == c.c_custkey,
    ).select(F.col("o_custkey").alias("custkey"))
    bag = urgent.exceptAll(finished).intersectAll(building_orders)
    return bag.groupBy("custkey").agg(F.count("*").alias("n"))


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (``props`` is a JSON object column): parse with
    ``from_json`` (JVM codegen, no Python) and aggregate the extracted
    integer per event type."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        # BIGINT, matching the oracle's CAST(... AS BIGINT): with 'k INT'
        # a value >= 2^31 would become NULL only on the Spark side.
        "k", F.from_json("props", "k BIGINT").getField("k")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type count matrix via ``groupBy().pivot()``
    with an explicit value list (explicit values keep the schema static —
    at scale an implicit pivot needs an extra distinct pass first).
    Absent combinations coalesce to 0, matching the oracle's
    COUNT(CASE...) semantics."""
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", list(EVENT_TYPES)).count()
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


def sample_stratified(
    spark: SparkSession, sf_dir: str, per_lang: int = 20
) -> DataFrame:
    """Deterministic stratified sampling: the ``per_lang``
    smallest-md5-keyed documents of every language — the reproducible,
    cross-engine version of ``df.sampleBy`` (same trick as the K-Means
    init, SURVEY §2.1 R3). One shuffle on the stratum key; the per-group
    top-k is a rank filter, not a sort of the whole stratum."""
    from mapreducekmean_spark.functions.hashing import stable_order_key

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        stable_order_key("doc_id"), F.col("doc_id")
    )
    return (
        docs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= per_lang)
        .select("doc_id", "lang", "rnk")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """AS-OF join (an operator Spark lacks natively): for each left row,
    the right row with the greatest ``right_time`` <= ``left_time`` for
    the same key — expressed as the scalable union→window pattern
    instead of an inequality join:

    union both sides tagged (right sorts before left at equal times, so
    <= is inclusive) → one hash partition on the key → one sort by
    (time, tag) → ``last(value, ignorenulls=True)`` over an unbounded
    preceding frame carries the most recent right value onto every left
    row. ONE shuffle + one sort, versus the O(n·m)-per-key nested loop
    an inequality join plans; this is the standard at-scale formulation
    (a sort-merge as-of). Left rows with no prior right row keep NULLs
    (as-of LEFT semantics).

    Duplicate (key, right_time) right rows: the sort ends with the value
    columns themselves, so the winning duplicate is deterministic
    (largest value tuple) on any engine and any partitioning. Note that
    ``last(..., ignorenulls)`` is per-column — if duplicates contain
    NULLs in some value columns, each column is carried from the last
    row where *it* was non-null (the usual union→window as-of caveat).
    """
    payload = [c for c in left.columns if c not in (on, left_time)]
    lt = left.select(
        on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        *payload,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in value_cols
        ],
    )
    rt = right.select(
        on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in payload
        ],
        *value_cols,
    )
    w = (
        Window.partitionBy(on)
        .orderBy(
            "__t",
            "__tag",
            *[F.col(c).asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols
    ]
    return (
        lt.unionByName(rt)
        .select(on, F.col("__t").alias(left_time), "__tag", *payload, *carried)
        .where(F.col("__tag") == 1)
        .drop("__tag")
    )


def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF demo on events: each view joined to the same user's most
    recent purchase at-or-before it (fixture audit: no (user, ts)
    duplicates at any sf, so the result is fully deterministic).
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.unix_micros("ts").alias("view_us"),
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("buy_us"),
        F.col("event_id").alias("last_buy_id"),
        F.col("value").alias("last_buy_value"),
    )
    return asof_join(
        views,
        buys,
        on="user_id",
        left_time="view_us",
        right_time="buy_us",
        value_cols=["last_buy_id", "last_buy_value"],
    )


def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/argmax aggregate: per nation, the customer holding the
    largest balance. The ordering key is made unique (cent balance
    composed with custkey) so the argmax is deterministic — max_by tie
    semantics are engine-undefined otherwise."""
    c = load_table(spark, sf_dir, "customer")
    # unique ordering key: balance dominates, custkey breaks ties
    ordk = _cents("c_acctbal") * 10_000_000 + F.col("c_custkey")
    return (
        c.withColumn("ordk", ordk)
        .groupBy("c_nationkey")
        .agg(
            F.max_by("c_custkey", "ordk").alias("top_custkey"),
            (F.max(_cents("c_acctbal")).cast("double") / 100).alias(
                "max_balance"
            ),
            F.count("*").alias("n_customers"),
        )
        .select(
            F.col("c_nationkey").cast("bigint").alias("nationkey"),
            "top_custkey",
            "max_balance",
            "n_customers",
        )
    )


def orders_list_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg: per customer, the sorted list of their order keys.
    collect_list order is nondeterministic under parallel aggregation —
    sorting the result array restores cross-engine determinism. The list
    is serialized to a comma-joined string so external comparators that
    hash row values (pandas-style) can handle it; the DuckDB oracle emits
    the identical string via string_agg(... ORDER BY ...)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_list("o_orderkey"))
        ).alias("orderkeys"),
        F.count("*").alias("n_orders"),
    )


def customer_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function suite in one pass: dense_rank, percent_rank, and
    ntile(4) over customers ranked by account balance within their market
    segment. Fully ordered (cent-exact balance + custkey tie-break) so
    every rank is deterministic; one shuffle on the segment key."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "bal_c", _cents("c_acctbal")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("bal_c").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


def revenue_7d_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per customer, total order value within the
    trailing 7 days of each order (value-based frame — unlike ROWS
    frames, the result is independent of tie order by construction).
    Time is integer epoch seconds; sums are integer cents — exact."""
    o = load_table(spark, sf_dir, "orders")
    epoch_s = F.unix_seconds(F.date_trunc("second", "o_orderdate"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("epoch_s"))
        .rangeBetween(-7 * 86400, 0)
    )
    return (
        o.withColumn("epoch_s", epoch_s)
        .withColumn("price_c", _cents("o_totalprice"))
        .select(
            "o_custkey",
            "o_orderkey",
            "epoch_s",
            (F.sum("price_c").over(w).cast("double") / 100).alias(
                "revenue_7d"
            ),
            F.count("*").over(w).alias("n_orders_7d"),
        )
    )


def running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: sequence number, running spend
    (integer-cent cumulative sum → exact), and days since the previous
    order (lag). One shuffle on ``o_custkey``; frame fully ordered by
    (o_orderdate, o_orderkey) so results are deterministic."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "price_c", _cents("o_totalprice")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("seq"),
        (F.sum("price_c").over(run).cast("double") / 100).alias(
            "running_spend"
        ),
        F.datediff(
            F.to_date("o_orderdate"),
            F.to_date(F.lag("o_orderdate").over(w)),
        )
        .cast("bigint")
        .alias("gap_days"),
    )


def quality_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the wide→long reshape the engine lacked: the
    quality_score metrics as (doc_id, metric, value) rows via
    ``DataFrame.unpivot`` (Spark's native melt; one narrow projection
    per row, no shuffle — the reference has nothing comparable).
    Values are the already-rounded 6-dp doubles, so the long form
    hashes exactly like the wide form."""
    from mapreducekmean_spark.operators.text import documents, quality_score

    wide = quality_score(documents(spark, sf_dir))
    return wide.unpivot(
        "doc_id",
        ["len_kchars", "alpha_ratio", "ttr", "quality"],
        "metric",
        "value",
    )
