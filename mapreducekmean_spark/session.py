"""SparkSession factory.

Replaces the reference's ``Configuration`` wiring
(``/root/reference/src/KMeans.java:155-176``) with a real session: AQE on,
shuffle parallelism sized to cores (not the 200 default), UTC session
timezone (required for DuckDB-oracle timestamp parity), Arrow enabled for
the Pandas-UDF slow path.

Scale notes (100 TB / 1000-executor design intent):
- AQE + coalescePartitions lets the runtime right-size post-shuffle
  partitions instead of hand-tuning ``spark.sql.shuffle.partitions``.
- ``spark.sql.adaptive.skewJoin.enabled`` handles skewed join keys
  (hot users in ``events``, hot buckets in LSH joins) without manual salting.
- Locally we run one JVM (``local[N]``); the same plans run unchanged on a
  cluster because nothing here assumes single-process execution.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mapreducekmean_spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    # Pandas-UDF/stateful operators are pickled by module reference, so
    # executor Python workers must be able to import this package no
    # matter the caller's cwd (on a cluster this is the --py-files path).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker_pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in worker_pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{worker_pp}" if worker_pp else repo_root
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescing floor (minPartitionSize) stays at Spark's 1m
        # default: a 16k floor was tried for the CPU-heavy small-byte
        # tokenize/md5 stages (isolated dedup_verify -22%) but the full
        # suite REGRESSED 174->207 s — every iterative loop and
        # snapshot-writing query paid more tasks and more output files
        # than the signature stages saved (OPTIMIZATION_r14.md). The
        # parallelism fix that survived measurement is the conditional
        # scan widening (functions/skew.widen_narrow_scan) at the heavy
        # map-side kernels instead.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Custom Python data sources (sources/points_datasource.py) may
        # implement pushFilters; the capability is config-gated.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Fixture parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type, so read as bigint nanos and convert in the
        # loaders (sources/readers.py) — DuckDB truncates the same way.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        .config("spark.ui.enabled", "false")
    )
    # Measurement/ops hook (guide §1): extra session confs from the
    # environment, ``k=v;k=v`` — used by the profiling scripts to turn
    # on the event log for offline per-job analysis without changing
    # any default the bench or driver sees. Every applied override is
    # printed to stderr so a stray/leftover env var can never SILENTLY
    # displace a correctness-relevant default (session timezone, AQE
    # flags) in a bench or driver run — conf drift is visible in the
    # run's own capture.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in filter(None, (s.strip() for s in extra.split(";"))):
        key, _, val = kv.partition("=")
        print(
            f"[session] SPARK_GRAFT_EXTRA_CONF override: "
            f"{key.strip()}={val.strip()}",
            file=sys.stderr,
        )
        builder = builder.config(key.strip(), val.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def local_rows_df(spark: SparkSession, rows, schema: str):
    """``createDataFrame`` over a SMALL driver-local row list, pinned to
    ONE partition.

    The default local-data path parallelizes across
    ``defaultParallelism`` slices (32 here), so a 10-row frame becomes
    32 mostly-empty Python partitions; any downstream ``coalesce(1)``
    — the natural move before writing a tiny table — then evaluates
    every slice SERIALLY inside one task, each paying a Python-worker
    round trip. Measured at local[32]: a 10-row centroid-table write
    cost **4.5-5.5 s warm**; the same write off a 1-slice parallelize
    is **~0.2 s**. Every bounded driver-side table in the engine
    (centroids, PQ codebooks, index stats rows, pack state) goes
    through here."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), 1), schema
    )
