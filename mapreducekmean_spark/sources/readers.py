"""Typed fixture readers + reference-native CSV points source."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: All driver-generated fixture tables (see /root/repo/TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Columns stored as parquet TIMESTAMP(NANOS). Spark reads them as bigint
#: (``spark.sql.legacy.parquet.nanosAsLong``); we floor nanos→micros the
#: same way DuckDB's Python conversion does, restoring TimestampType.
_NANOS_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``.

    Parquet scan → Catalyst gets predicate pushdown + column pruning for
    free; this replaces the reference's whole-file text re-reads
    (``/root/reference/src/KMeans.java:54-58,214``).

    The nanos conf is set here (runtime conf, idempotent) rather than at
    session-build time so ANY SparkSession — including a vanilla one built
    by an external harness — can read the TIMESTAMP(NANOS) fixtures.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # Without this, reading events.parquet dies with PARQUET_TYPE_ILLEGAL:
    # INT64 (TIMESTAMP(NANOS,false)) on sessions that didn't go through
    # our session factory.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # Exact integer floor-division (pmod keeps the remainder
            # non-negative, so pre-epoch nanos floor like DuckDB's).
            # float-based F.floor(col/1000) would lose precision: int64
            # nanos exceed double's 2^53 exact range.
            df = df.withColumn(
                col,
                F.timestamp_micros(
                    F.expr(f"(`{col}` - pmod(`{col}`, 1000)) div 1000")
                ),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


POINTS_SCHEMA = T.StructType(
    [
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
    ]
)


def read_points_csv(spark: SparkSession, path: str, strict: bool = False) -> DataFrame:
    """Read the reference-native ``"x,y"`` points file.

    Reference parity: ``PointsMapper.java:61-63`` does
    ``value.toString().split(",")`` + two ``Double.parseDouble`` with no
    guard — a malformed line kills the task (SURVEY.md §1.2). Engine
    policy: parse with a typed schema; malformed fields become NULL and are
    dropped by the validity filter (the ``filter_valid`` operator) unless
    ``strict`` re-enables fail-fast semantics.
    """
    mode = "FAILFAST" if strict else "PERMISSIVE"
    df = spark.read.csv(path, schema=POINTS_SCHEMA, mode=mode)
    if strict:
        return df
    inf = float("inf")
    return df.filter(
        F.col("x").isNotNull()
        & F.col("y").isNotNull()
        & ~F.isnan("x")
        & ~F.isnan("y")
        & (F.abs("x") != inf)
        & (F.abs("y") != inf)
    )
