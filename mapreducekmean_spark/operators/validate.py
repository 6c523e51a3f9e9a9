"""Data-quality expectations: the validation gate a pipeline runs
before trusting a landed table (the Great-Expectations shape, engine-
side). Each expectation is one aggregate over its table — uniqueness,
null/range bounds, referential integrity — emitted as a uniform
``(tbl, check, violations, ok)`` report row. The reference engine has
nothing like this (its 3 Java files run one K-Means job; KMeans.java
crashes on malformed rows rather than reporting them — see SURVEY §2.2
"Filter/predicates").

Scale shape: every check is a partial+final aggregate or a broadcast/
hash anti-join count — one pass per table (Spark shares the scan across
same-table checks where the plan allows), no row-level materialization
of violations (the report is counts; a debugging variant would add a
LIMIT'd sample). The report itself is a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducekmean_spark.sources import load_table


def _report_row(tbl: str, check: str, violations) -> DataFrame:
    return violations.select(
        F.lit(tbl).alias("tbl"),
        F.lit(check).alias("check"),
        F.col("v").cast("bigint").alias("violations"),
        (F.col("v") == 0).alias("ok"),
    )


def _dup_count(df: DataFrame, col: str) -> DataFrame:
    """Rows beyond the first per key — 0 iff the column is unique."""
    return df.agg(
        (F.count(col) - F.countDistinct(col)).alias("v")
    )


def data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture suite's expectation report over the landed tables."""
    return expectations_report(
        orders=load_table(spark, sf_dir, "orders"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
        customer=load_table(spark, sf_dir, "customer"),
        events=load_table(spark, sf_dir, "events"),
        documents=load_table(spark, sf_dir, "documents"),
    )


def expectations_report(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    events: DataFrame,
    documents: DataFrame,
) -> DataFrame:
    """Key uniqueness on every primary key, null/range bounds on the
    measure columns, and the two fact→dimension referential checks —
    one report row per expectation. Frames are injectable so tests can
    prove each check FIRES on corrupted data, not just passes on the
    clean fixtures."""
    checks = [
        _report_row(
            "orders", "o_orderkey_unique", _dup_count(orders, "o_orderkey")
        ),
        _report_row(
            "orders",
            "o_totalprice_positive",
            orders.agg(
                F.sum(
                    (
                        F.col("o_totalprice").isNull()
                        | (F.col("o_totalprice") <= 0)
                    ).cast("bigint")
                ).alias("v")
            ),
        ),
        _report_row(
            "orders",
            "o_custkey_in_customer",
            orders.join(
                customer.select("c_custkey"),
                orders.o_custkey == F.col("c_custkey"),
                "left_anti",
            ).agg(F.count("*").alias("v")),
        ),
        _report_row(
            "lineitem",
            "quantity_in_bounds",
            lineitem.agg(
                F.sum(
                    (
                        F.col("l_quantity").isNull()
                        | (F.col("l_quantity") <= 0)
                        | (F.col("l_quantity") > 100)
                    ).cast("bigint")
                ).alias("v")
            ),
        ),
        _report_row(
            "lineitem",
            "orderkey_in_orders",
            lineitem.join(
                orders.select(F.col("o_orderkey").alias("_ok")),
                lineitem.l_orderkey == F.col("_ok"),
                "left_anti",
            ).agg(F.count("*").alias("v")),
        ),
        _report_row(
            "customer", "c_custkey_unique", _dup_count(customer, "c_custkey")
        ),
        _report_row(
            "events", "event_id_unique", _dup_count(events, "event_id")
        ),
        _report_row(
            "events",
            "ts_not_null",
            events.agg(
                F.sum(F.col("ts").isNull().cast("bigint")).alias("v")
            ),
        ),
        _report_row(
            "documents",
            "text_nonempty",
            documents.agg(
                F.sum(
                    (
                        F.col("text").isNull() | (F.length("text") == 0)
                    ).cast("bigint")
                ).alias("v")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
