"""Scale-pattern tests: the 100 TB techniques, demonstrated and asserted
at fixture scale — bucketed co-located joins (no exchange), salted joins
(row-identical to plain joins under skew)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from mapreducekmean_spark.functions.skew import salted_join
from mapreducekmean_spark.plans import count_exchanges
from mapreducekmean_spark.sources import load_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, sf_small, tmp_path, no_broadcast):
    """Pre-bucketing both fact tables on the join key makes the join a
    co-located sort-merge with ZERO shuffle exchanges — the layout
    strategy for repeated fact-fact joins at 100 TB."""
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_li = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    try:
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / t_orders))
            .saveAsTable(t_orders)
        )
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / t_li))
            .saveAsTable(t_li)
        )
        joined = spark.table(t_li).join(
            spark.table(t_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert count_exchanges(joined) == 0
        # and it still returns the right row count
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")


def test_unbucketed_join_shuffles_for_contrast(spark, sf_small, no_broadcast):
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert count_exchanges(joined) >= 2  # both sides hash-partition


def test_salted_join_matches_plain_inner(spark, sf_small):
    """Row-identical results on a skewed key distribution (orders:
    o_custkey is many-to-one onto customers)."""
    orders = load_table(spark, sf_small, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey"
    )
    cust = load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    salted = salted_join(orders, cust, "custkey", n_salts=8)
    plain = orders.join(cust, "custkey")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "zz")], "k int, v string"
    )
    small = spark.createDataFrame([(1, "X"), (2, "Y")], "k int, w string")
    got = sorted(
        map(tuple, salted_join(big, small, "k", n_salts=4, how="left").collect())
    )
    want = sorted(
        map(tuple, big.join(small, "k", "left").collect())
    )
    assert got == want


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, "id", how="full")
