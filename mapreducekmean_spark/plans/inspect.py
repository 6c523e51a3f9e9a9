"""Physical-plan inspection helpers (string-level, version-tolerant)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string ``df.explain(mode)`` would print."""
    qe = df._jdf.queryExecution()  # noqa: SLF001 - no public accessor
    try:
        return qe.explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
                mode
            )
        )
    except Exception:
        return qe.toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (broadcast exchanges excluded — those are the cheap kind).

    Counts the formatted-mode *detail* entries (``(n) Exchange``) so each
    node is counted exactly once (the tree section repeats them)."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange", line.strip())
    )


def count_joins(df: DataFrame) -> int:
    """Number of join operators of ANY strategy in the physical plan
    (broadcast, sort-merge, shuffled-hash, nested-loop, AND cartesian —
    Spark's cross-join node is named ``CartesianProduct``, no "Join" in
    the name, so a ``\\w*Join`` match alone would let a cartesian plan
    pass a ``count_joins == 0`` pin; r12 advice), counted from the
    formatted-mode detail entries so each node is counted exactly once.
    The pin for "no join on the per-doc side": asserting
    ``has_broadcast_join`` alone cannot catch a corpus×corpus
    self-join that AQE happens to broadcast at fixture scale (r11
    verdict)."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) (\w*Join|CartesianProduct)", line.strip())
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or (
        "BroadcastNestedLoopJoin" in formatted_plan(df)
    )


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan advertises a pushed filter containing
    ``fragment`` (e.g. a column name)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line and "[]" not in line:
            return True
    return False


def has_wholestage_codegen(df: DataFrame) -> bool:
    """Formatted mode marks codegen stages with ``[codegen id : N]``."""
    return "codegen id" in formatted_plan(df)
