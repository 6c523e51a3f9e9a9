"""Materialization bookkeeping for iterative / self-join operators.

``localCheckpoint`` is the engine's standard way to (a) materialize a
subtree once before a self-join and (b) truncate lineage inside iterative
loops — but the checkpointed blocks live in the block manager until the
backing RDD is garbage-collected on the JVM side, which is asynchronous
and can be long after the query that created them finished. On a shared
session (the bench harness runs 70+ queries back to back) those orphaned
blocks create memory pressure that taxes *later* queries' shuffles.

These helpers make the lifetime explicit: snapshot the set of persistent
RDD ids before a materialization, then free exactly the ids a finished
stage no longer needs. Unpersisting a localCheckpoint'd RDD whose blocks
are still referenced by a live plan would be unrecoverable (lineage is
truncated), so callers only free RDDs that are provably dead — a
previous iteration's superseded state, or everything after a query's
result has been fully consumed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of all currently persisted RDDs in this context (includes
    localCheckpoint blocks, which Spark registers as persisted RDDs)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(e.getKey()) for e in jmap.entrySet().toArray()}


def unpersist_rdd_ids(
    spark: SparkSession, ids: set[int], blocking: bool = False
) -> None:
    """Free the blocks of the given persisted RDD ids (no-op for ids that
    already disappeared). Only pass ids whose data is provably no longer
    reachable from any live plan — checkpointed RDDs cannot recompute."""
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for e in jmap.entrySet().toArray():
        if int(e.getKey()) in ids:
            e.getValue().unpersist(blocking)


def clear_persistent_rdds(spark: SparkSession, blocking: bool = False) -> None:
    """Free every persisted RDD in the context. For harness use between
    independent queries (bench.py): each declared query rebuilds its plan
    from the parquet sources, so nothing carries over by design."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for e in jmap.entrySet().toArray():
        e.getValue().unpersist(blocking)
