"""Relational operator coverage over the TPC-H-ish star schema:
scan → filter → project → join (broadcast + shuffle) → aggregate →
window → sort → limit → semi/anti join.

The reference has no relational surface beyond its one group-by mean
(SURVEY.md §2.2) — this module is the engine's general-query coverage,
shaped after public TPC-H queries (Q1/Q3/Q5 outlines) and graded against
DuckDB oracles.

Cross-engine exactness: every monetary aggregate is summed in integer
cents/micro-units (fixture prices are 2-decimal; discounts/taxes
2-decimal, so price*(1-disc) is exact in 10^-4 units and
price*(1-disc)*(1+tax) in 10^-6 units) then divided back once — integer
sums are order-independent, so Spark's partial/final aggregation and
DuckDB agree to the bit, with no rounding slack needed.

Scale notes:
- ``region``/``nation``/small dims join via ``F.broadcast`` — no shuffle.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE picks
  the strategy and coalesces partitions at runtime.
- Aggregations are partial+final (map-side combine) by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducekmean_spark.sources import load_table


def _utc_ts(iso_date: str) -> Column:
    """A date-boundary literal as an explicit UTC instant. A bare
    ``lit(str).cast("timestamp")`` interprets the wall clock in the
    SESSION timezone, so query windows would shift on a non-UTC session
    (ADVICE r4); building the epoch integer driver-side and wrapping it
    in ``timestamp_micros`` is session-independent by construction."""
    from datetime import datetime, timezone

    dt = datetime.strptime(iso_date, "%Y-%m-%d").replace(tzinfo=timezone.utc)
    return F.timestamp_micros(F.lit(int(dt.timestamp()) * 1_000_000))


def _cents(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def _disc_price_e4(price: Column, disc: Column) -> Column:
    """price*(1-disc) in exact 10^-4 currency units."""
    return F.round(price * (1 - disc) * 10_000).cast("bigint")


def _charge_e6(price: Column, disc: Column, tax: Column) -> Column:
    """price*(1-disc)*(1+tax) in exact 10^-6 currency units."""
    return F.round(price * (1 - disc) * (1 + tax) * 1_000_000).cast("bigint")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big scan + filter + 8-agg group-by (the heaviest
    partial-aggregation path in the engine)."""
    li = load_table(spark, sf_dir, "lineitem")
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= _utc_ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            (F.sum(_cents(price)).cast("double") / 100).alias("sum_base_price"),
            (F.sum(_disc_price_e4(price, disc)).cast("double") / 10_000).alias(
                "sum_disc_price"
            ),
            (F.sum(_charge_e6(price, disc, tax)).cast("double") / 1_000_000).alias(
                "sum_charge"
            ),
            F.round(F.sum("l_quantity") / F.count("*"), 6).alias("avg_qty"),
            F.round(
                F.sum(_cents(price)).cast("double") / 100 / F.count("*"), 6
            ).alias("avg_price"),
            F.round(
                F.sum(_cents(disc)).cast("double") / 100 / F.count("*"), 6
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def top_unshipped_orders(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered 3-way join + group-by + top-k sort.
    ``customer`` is broadcast (small side); revenue ranked in exact
    10^-4 units with orderkey tie-break so the limit is deterministic."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _utc_ts("1995-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _utc_ts("1995-03-15")
    )
    rev_e4 = _disc_price_e4(F.col("l_extendedprice"), F.col("l_discount"))
    joined = (
        li.join(
            orders, li.l_orderkey == orders.o_orderkey, "inner"
        ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
    )
    agg = joined.groupBy(
        "l_orderkey",
        F.unix_seconds(F.date_trunc("second", "o_orderdate")).alias(
            "o_orderdate_s"
        ),
        "o_orderpriority",
    ).agg((F.sum(rev_e4).cast("double") / 10_000).alias("revenue"))
    return agg.orderBy(
        F.col("revenue").desc(), F.col("l_orderkey").asc()
    ).limit(k)


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join across all six tables with
    broadcast dims, revenue per nation (exact 10^-4 unit sums)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev_e4 = _disc_price_e4(F.col("l_extendedprice"), F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg(
            (F.sum(rev_e4).cast("double") / 10_000).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the purest pushdown case — scan with three
    range predicates (all pushed to parquet) and a single exact-unit
    aggregate. No join, no shuffle beyond the final single-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    rev_e4 = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 10_000
    ).cast("bigint")
    return (
        li.filter(
            (F.col("l_shipdate") >= _utc_ts("1994-01-01"))
            & (F.col("l_shipdate") < _utc_ts("1995-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(rev_e4).cast("double") / 10_000).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact⋈dimension (lineitem⋈part, part broadcast)
    with a conditional aggregate — monthly revenue, promo revenue, and
    the promo share ratio. Sums run in exact 10^-4 units; the share is
    one double division of two exact integers (cross-engine identical),
    rounded at 6 dp."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev_e4 = _disc_price_e4(F.col("l_extendedprice"), F.col("l_discount"))
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("rev_e4", rev_e4)
        .withColumn(
            "month_start_s",
            F.unix_seconds(F.date_trunc("month", "l_shipdate")),
        )
    )
    promo_e4 = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("rev_e4")).otherwise(
            F.lit(0)
        )
    )
    total_e4 = F.sum("rev_e4")
    return j.groupBy("month_start_s").agg(
        (total_e4.cast("double") / 10_000).alias("revenue"),
        (promo_e4.cast("double") / 10_000).alias("promo_revenue"),
        F.round(
            promo_e4.cast("double") / total_e4.cast("double"), 6
        ).alias("promo_share"),
    )


def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-style semi join — orders from one quarter
    having at least one line item shipped more than 60 days after the
    order date (the fixture lacks l_commitdate, so late shipping stands
    in for the commit/receipt comparison), counted per priority.

    The semi join keys on l_orderkey (equi, shuffled) with the date
    comparison as a residual — never a nested loop."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _utc_ts("1994-01-01"))
        & (F.col("o_orderdate") < _utc_ts("1994-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


def top_return_customers(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer — fact⋈fact
    shuffle join (lineitem⋈orders) plus broadcast dims, exact 10^-4
    unit sums, deterministic top-k (revenue desc, custkey asc)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev_e4 = _disc_price_e4(F.col("l_extendedprice"), F.col("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        (F.sum(rev_e4).cast("double") / 10_000).alias("revenue_lost"),
        F.count("*").alias("n_items"),
    )
    return agg.orderBy(
        F.col("revenue_lost").desc(), F.col("c_custkey").asc()
    ).limit(k)


def large_quantity_orders(
    spark: SparkSession, sf_dir: str, min_qty: float = 150.0
) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-semi-join — orders whose total
    line quantity exceeds the threshold, joined back to customers. The
    HAVING aggregate runs partial+final on l_orderkey; only qualifying
    keys (a small set) reach the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    j = orders.join(big, orders.o_orderkey == big.l_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return j.select(
        "c_custkey",
        "o_orderkey",
        F.unix_seconds(F.date_trunc("second", "o_orderdate")).alias(
            "o_orderdate_s"
        ),
        (_cents(F.col("o_totalprice")).cast("double") / 100).alias(
            "o_totalprice"
        ),
        F.col("total_qty").cast("bigint").alias("total_qty"),
    )


def bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brackets over
    lineitem⋈part (part broadcast) — the OR-of-ANDs predicate shape
    that exercises CNF conversion / partial pushdown, summed in exact
    10^-4 units."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    bracket = (
        ((brand == "Brand#12") & size.between(1, 15) & qty.between(1, 20))
        | ((brand == "Brand#23") & size.between(1, 25) & qty.between(10, 30))
        | ((brand == "Brand#34") & size.between(1, 35) & qty.between(20, 40))
    )
    rev_e4 = _disc_price_e4(F.col("l_extendedprice"), F.col("l_discount"))
    return j.filter(bracket).agg(
        (F.sum(rev_e4).cast("double") / 10_000).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def top_orders_per_customer(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Window top-k per group: each customer's k largest orders
    (row_number with totalprice desc, orderkey tie-break)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
    )


def segment_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join coverage: per market segment, customers with and
    without any order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    )
    without = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    )
    a = with_orders.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_with_orders")
    )
    b = without.groupBy("c_mktsegment").agg(F.count("*").alias("n_without"))
    return (
        a.join(b, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without", F.lit(0)).alias("n_without"),
        )
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count.

    The load-bearing detail is the LEFT OUTER join with the predicate
    *inside* the join (orders restricted to non-urgent priorities):
    customers whose only orders are urgent must surface with count 0,
    which a post-join filter would destroy. Two aggregation levels:
    count qualifying orders per customer, then count customers per
    order-count bucket. Pure counts — cross-engine exact with no
    rounding. Scale: the join shuffles on custkey; both aggregations are
    partial+final on small key domains.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("1-")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute,
    excluding a brand/type slice and (via LEFT ANTI join) every supplier
    in bad standing (negative account balance — standing in for Q16's
    complaints subquery). The anti join replaces NOT IN with its
    null-safe, shuffle-friendly plan; count(DISTINCT) runs as Spark's
    two-phase distinct aggregate. Pure counts — cross-engine exact.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").startswith("MEDIUM POLISHED")
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    good = li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
    j = good.join(part, good.l_partkey == part.p_partkey)
    return (
        j.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            "p_brand",
            "p_type",
            F.col("p_size").asc(),
        )
    )


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (adapted: every nation pair — the fixture has no
    partsupp and the classic two-nation filter is a constant): revenue
    flowing supplier-nation → customer-nation per ship year, 1995-1996.
    The double-dimension join (nation twice, under different roles) is
    the shape being exercised; both sides broadcast. Revenue sums in
    exact 10^-4 units; year() runs on the UTC-pinned session, matching
    the oracle's naive timestamps."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _utc_ts("1995-01-01"))
        & (F.col("l_shipdate") < _utc_ts("1997-01-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_name").alias("cust_nation"),
    )
    rev_e4 = _disc_price_e4(F.col("l_extendedprice"), F.col("l_discount"))
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        (F.sum(rev_e4).cast("double") / 10_000).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (adapted: brand + size filter — the fixture part
    has no container): yearly-average revenue lost to small orders —
    lineitems whose quantity is below 20% of their part's average.
    The aggregate-vs-own-average shape: one window avg per part
    partition (the filtered part dim broadcasts into the lineitem
    scan), then a single global aggregate. l_quantity is integral in
    the fixture, so the per-part average is exact in double and the
    0.2× threshold compare is engine-identical."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") < 15)
    )
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    w = Window.partitionBy("p_partkey")
    cents = _cents(F.col("l_extendedprice"))
    small = j.withColumn("avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return small.agg(
        (F.sum(cents).cast("double") / 100 / 7.0).alias("avg_yearly"),
        F.count("*").alias("n_items"),
    )


def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: market segment in place of the phone
    country code the fixture lacks, and dormancy — no orders on/after
    2000-01-01 — in place of never-ordered, which is vacuous on a
    fixture where every customer has orders): customers with
    above-average positive balance and no recent orders, counted per
    segment. The scalar-subquery-plus-anti-join shape: the average is
    one broadcast row (exact cent arithmetic), the dormancy test a
    left-anti join against the date-filtered orders."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _utc_ts("2000-01-01")
    )
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(bal_cents).cast("double") / F.count("*")).alias(
                "avg_cents"
            )
        )
    )
    rich = cust.join(F.broadcast(avg_pos), bal_cents > F.col("avg_cents"))
    idle = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        (F.sum(bal_cents).cast("double") / 100).alias("total_bal"),
    )


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier revenue over a ship-date window,
    then the supplier(s) whose revenue EQUALS the maximum — the
    aggregate-joined-against-its-own-max shape (Q15's revenue view +
    scalar subquery). Revenue sums in exact 10^-4 units; the max
    comparison is integer-exact, so ties are deterministic. Scale: one
    partial+final aggregate on l_suppkey; the 1-row max broadcasts back
    over the (small) per-supplier aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _utc_ts("1996-01-01"))
        & (F.col("l_shipdate") < _utc_ts("1996-04-01"))
    )
    rev_e4 = _disc_price_e4(F.col("l_extendedprice"), F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(rev_e4).alias("rev_e4")
    )
    best = per_supp.agg(F.max("rev_e4").alias("best_e4"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_supp.join(F.broadcast(best), F.col("rev_e4") == F.col("best_e4"))
        .join(supp, per_supp.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_e4").cast("double") / 10_000).alias("total_revenue"),
        )
    )


def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: the fixture has no partsupp, so unit
    cost is the part's retail price — profit = discounted revenue minus
    retailprice×quantity): profit per supplier nation per order year for
    parts whose name contains 'gear'.

    The Q9 skeleton is the point: a part-name LIKE filter pruning the
    part dim BEFORE it broadcasts into the lineitem scan, a four-way
    join fanning out to two dims and one fact, then a two-key
    aggregate. Revenue in exact 10^-4 units and cost in exact cents
    (retail price is 2-decimal, quantity integral) keep the sum
    order-independent and cross-engine exact.

    Scale: part/supplier/nation broadcast; the only shuffles are the
    orders equi-join and the final (nation, year) aggregate — both on
    uniform keys. Reference ground: the group-by mean of
    PointsReducer.java:17-36 generalized to multi-table facts."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("gear")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit_e4 = _disc_price_e4(
        F.col("l_extendedprice"), F.col("l_discount")
    ) - _cents(F.col("p_retailprice")) * F.col("l_quantity").cast(
        "bigint"
    ) * 100
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    ).agg(
        (F.sum(profit_e4).cast("double") / 10_000).alias("sum_profit"),
        F.count("*").alias("n_items"),
    )


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_6's share of AMERICA-region 'widget'
    revenue per order year, 1995-1996. The conditional-aggregate-ratio
    shape: share = sum(CASE supplier-nation)/sum(all), computed from two
    exact integer sums in one aggregate pass (never two queries). The
    ratio is a single double division of exact bigints — deterministic
    cross-engine.

    Scale: every dim (part, supplier, nation×2, region) broadcasts;
    orders⋈customer and lineitem⋈orders shuffle on their keys. The
    CASE-sum avoids a second pass or a self-join that a naive
    numerator/denominator split would cost."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").endswith("widget")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _utc_ts("1995-01-01"))
        & (F.col("o_orderdate") < _utc_ts("1997-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    n_cust = nation.select("n_nationkey", "n_regionkey")
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    rev_e4 = _disc_price_e4(F.col("l_extendedprice"), F.col("l_discount"))
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
    )
    target = F.when(F.col("supp_nation") == "NATION_6", rev_e4).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(target).alias("nation_e4"),
            F.sum(rev_e4).alias("total_e4"),
        )
        .select(
            "o_year",
            (F.col("nation_e4").cast("double") / F.col("total_e4")).alias(
                "mkt_share"
            ),
            (F.col("total_e4").cast("double") / 10_000).alias("total_revenue"),
        )
    )


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the fixture has no ship mode or
    commit/receipt dates, so the grouping key is l_linestatus and
    'late' means shipped >90 days after the order date): per line
    status, how many late-shipped items belonged to critical-priority
    orders vs not, plus the late revenue. The CASE-sum priority-split
    over a fact-fact join is the exercised shape.

    Scale: one orders⋈lineitem shuffle join (both sides date-filtered
    before the exchange), one tiny aggregate. The 90-day lateness test
    is a pushed-down column comparison, not a UDF."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _utc_ts("1996-01-01"))
        & (F.col("l_shipdate") < _utc_ts("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    crit = (
        F.when(
            F.col("o_orderpriority").startswith("1-")
            | F.col("o_orderpriority").startswith("2-"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
    )
    rev_e4 = _disc_price_e4(F.col("l_extendedprice"), F.col("l_discount"))
    return late.groupBy("l_linestatus").agg(
        F.sum(crit).alias("high_line_count"),
        (F.count("*") - F.sum(crit)).alias("low_line_count"),
        (F.sum(rev_e4).cast("double") / 10_000).alias("late_revenue"),
    )


def waiting_suppliers(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q21 shape (adapted lateness: shipped >60 days after the
    order date): suppliers who were the ONLY late shipper in a
    finished multi-supplier order. EXISTS (another supplier in the
    order) as a left-semi self-join, NOT EXISTS (another LATE supplier)
    as a left-anti self-join — both keyed on l_orderkey with the
    supplier-inequality as the join residual, the null-safe
    shuffle-friendly plan Spark gives for correlated EXISTS.

    Scale: three scans of lineitem (base + two self-join sides), each
    pruned to (orderkey, suppkey[, lateness]) before the exchange; all
    three shuffles hash on the same uniform l_orderkey, and AQE
    coalesces. Top-k by count with name tie-break is deterministic."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    late_pred = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late_pred)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    l3 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late_pred)
        .select(
            F.col("l_orderkey").alias("o3_key"),
            F.col("l_suppkey").alias("s3_key"),
        )
    )
    cand = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2_key"))
        & (F.col("l_suppkey") != F.col("s2_key")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3_key"))
        & (F.col("l_suppkey") != F.col("s3_key")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cand.join(F.broadcast(supp), cand.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
    )


def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp, so 'inventory value' is
    each part's total discounted lineitem revenue): parts whose revenue
    exceeds 1.5× the mean per-part revenue. Q11's literal fraction-of-
    total cutoff degenerates on a fixture whose part count grows with
    sf (all rows at sf0.001, none at sf0.1); the mean-relative form
    keeps the same group-filter-vs-scalar-subquery shape with a
    scale-stable selectivity. One per-part aggregate, one 1-row
    (total, n_parts) re-derived FROM that aggregate (never a second
    fact scan), and an integer cross-multiplied threshold
    (value×n×2 > total×3) so the filter is exact — no double division
    on the comparison path. (The cross product stays under int64 here;
    at real scale the compare would divide once in double instead.)

    Scale: single shuffle on l_partkey; the per-part aggregate (n_parts
    rows, orders of magnitude smaller than the fact) is materialized
    ONCE via localCheckpoint — without it Catalyst re-derives the grand
    total from a second full lineitem scan (no common-subtree reuse
    across a self-referencing aggregate) — then the 1-row total
    broadcasts back over it."""
    li = load_table(spark, sf_dir, "lineitem")
    rev_e4 = _disc_price_e4(F.col("l_extendedprice"), F.col("l_discount"))
    per_part = (
        li.groupBy("l_partkey")
        .agg(F.sum(rev_e4).alias("value_e4"), F.count("*").alias("n_items"))
        .localCheckpoint()
    )
    total = per_part.agg(
        F.sum("value_e4").alias("total_e4"),
        F.count("*").alias("n_parts"),
    )
    part = load_table(spark, sf_dir, "part")
    return (
        per_part.join(
            F.broadcast(total),
            F.col("value_e4") * F.col("n_parts") * 2
            > F.col("total_e4") * 3,
        )
        .join(F.broadcast(part), per_part.l_partkey == part.p_partkey)
        .select(
            "l_partkey",
            "p_name",
            (F.col("value_e4").cast("double") / 10_000).alias("total_value"),
            "n_items",
        )
    )


def best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp/ps_supplycost, so 'best' is
    the HIGHEST account balance among suppliers who actually shipped
    the part, and the part slice is a size + type filter): for each
    part in the slice, the winning supplier in region ASIA.

    Q2's load-bearing shape is the correlated per-group extremum joined
    back against its own group — here as one aggregate over the
    distinct (part, supplier) shipment pairs and an equi join back on
    (partkey, balance), which Spark plans as two hash joins instead of
    a per-part subquery loop. Ties on the max balance keep every tying
    supplier, exactly like Q2's min(ps_supplycost) — deterministic
    because the output carries the supplier key.

    Scale: lineitem projects to its two join columns before the
    distinct (uniform keys); part/supplier/nation broadcast; the
    join-back runs on the (small) per-part aggregate."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") < 10) & F.col("p_type").startswith("SMALL")
    )
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    offers = pairs.join(
        F.broadcast(part), pairs.l_partkey == part.p_partkey
    ).join(F.broadcast(supp), pairs.l_suppkey == supp.s_suppkey)
    best = offers.groupBy(F.col("p_partkey").alias("bp_key")).agg(
        F.max("s_acctbal").alias("best_bal")
    )
    return (
        offers.join(
            F.broadcast(best),
            (F.col("p_partkey") == F.col("bp_key"))
            & (F.col("s_acctbal") == F.col("best_bal")),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
        )
    )


def excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp availqty, so the 'excess'
    test is a supplier shipping MORE THAN HALF of a part's total 1996
    volume): suppliers in region EUROPE who dominated any 'red'-named
    part's yearly volume — the nested semi-join chain (supplier ←
    qualifying (part, supplier) volumes ← filtered part), Q20's
    skeleton with the aggregate-vs-aggregate threshold standing in for
    availqty.

    Scale: the per-(part, supplier) and per-part volumes come off ONE
    date+name-filtered lineitem scan (the per-part total derives from
    the pair aggregate, not a second scan); the dominance test is an
    integer compare after a broadcast join of the two small aggregates;
    the supplier verdict is a LEFT SEMI join — never a per-supplier
    subquery."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _utc_ts("1996-01-01"))
        & (F.col("l_shipdate") < _utc_ts("1997-01-01"))
    )
    vols = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("pair_qty"))
        .localCheckpoint()
    )
    totals = vols.groupBy(F.col("l_partkey").alias("tp_key")).agg(
        F.sum("pair_qty").alias("part_qty")
    )
    dominant = vols.join(
        F.broadcast(totals),
        (F.col("l_partkey") == F.col("tp_key"))
        & (F.col("pair_qty") * 2 > F.col("part_qty")),
    ).select("l_suppkey")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        supp.join(
            dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name", "n_name")
    )
