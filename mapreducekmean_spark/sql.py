"""The SQL entry point: fixture tables as temp views + portable-SQL query
execution.

The reference has no SQL surface at all (SURVEY.md §3.1: its "IR" is
Hadoop ``Configuration`` strings); this module exposes the engine the way
a warehouse user expects — register the catalog, run SQL, get a
DataFrame. Catalyst treats ``spark.sql(...)`` and the DataFrame API
identically (same logical plan space), so everything the plan guardrail
tests pin (pushdown, broadcast, single-exchange aggregation) holds for
SQL-entered queries too.

``PORTABLE_QUERIES`` are written in the ANSI subset that Spark SQL and
DuckDB share — the contract runs the *identical text* on both engines,
the strongest cross-engine statement in the suite (no per-engine
translation at all). Rules for staying in the subset: integer-cent money
math (``CAST(round(x*100) AS BIGINT)``), no engine-specific functions,
explicit casts on every aggregate output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from mapreducekmean_spark.sources import TABLES, load_table


#: (session id, table) → sf_dir currently registered — avoids re-reading
#: parquet schemas + catalog calls on every query execution, while a
#: *different* sf_dir for the same session still re-registers (views
#: always reflect the last requested directory).
_REGISTERED: dict[tuple[int, str], str] = {}


def register_views(
    spark: SparkSession,
    sf_dir: str,
    force: bool = False,
    only: tuple[str, ...] | None = None,
) -> None:
    """Register fixture tables as temp views (idempotent per
    (session, table, sf_dir) unless ``force``).

    ``only`` restricts registration to the named tables — queries register
    lazily (just what they reference), so one unreadable fixture can never
    poison unrelated SQL.
    """
    for name in only if only is not None else TABLES:
        if not force and _REGISTERED.get((id(spark), name)) == sf_dir:
            continue
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        _REGISTERED[(id(spark), name)] = sf_dir


def referenced_tables(query: str) -> tuple[str, ...]:
    """Fixture tables a SQL text references (case-insensitive word-boundary
    match — SQL identifiers are case-insensitive, so ``FROM EVENTS`` must
    register ``events``). Returns ALL tables when nothing matches: an
    unrecognized spelling (quoted/qualified identifiers) must degrade to
    the register-everything behavior, never to TABLE_OR_VIEW_NOT_FOUND."""
    hits = tuple(
        name
        for name in TABLES
        if re.search(rf"\b{name}\b", query, re.IGNORECASE)
    )
    return hits if hits else tuple(TABLES)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir, only=referenced_tables(query))
    return spark.sql(query)


#: Identical text runs on Spark and DuckDB (the oracle IS the query).
PORTABLE_QUERIES: dict[str, str] = {
    "sql_nation_balance": """
SELECT n_name,
       count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
         AS total_balance,
       CAST(max(c_custkey) AS BIGINT) AS max_custkey
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING count(*) > 5
""",
    # Correlated scalar subquery: customers above their own nation's
    # average balance. The average is computed from identical integer
    # cent sums on both engines, so the comparison is exact.
    "sql_above_nation_avg": """
SELECT c_custkey, c_nationkey
FROM customer c
WHERE CAST(round(c_acctbal * 100) AS BIGINT) > (
  SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
         / count(*)
  FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
""",
}


def sql_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer balance via the SQL entry point — the query
    text doubles as its own DuckDB oracle."""
    return run_sql(spark, sf_dir, PORTABLE_QUERIES["sql_nation_balance"])
