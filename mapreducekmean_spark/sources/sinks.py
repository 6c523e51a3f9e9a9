"""Sinks: parquet/CSV/JSON writers and the versioned iteration archive.

Reference surface being re-expressed (SURVEY.md §2.1 R10/R12):
- R10 file sink — reducer output written as text part-files
  (``/root/reference/src/MapReduceKMean/PointsReducer.java:33`` via
  ``/root/reference/src/KMeans.java:215``).
- R12 archive — per-iteration output dir renamed to
  ``/kMeanArchive<output>_iteration_<i>`` (``KMeans.java:146,190-193``),
  i.e. a hand-rolled versioned sink.

Engine mapping: parquet is the primary format (columnar, splittable,
statistics for pushdown); the archive is a **partitioned table**
(``iteration=<i>`` directory partitions) instead of dir renames — at
scale that makes the whole history one queryable table with partition
pruning, and writers for different iterations never contend.

``points_csv`` round-trips the reference-native ``"x,y"`` text format so
a user of the reference can produce/consume byte-compatible files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Primary sink. Splittable columnar output; partition count follows
    the upstream plan (use ``df.coalesce(n)`` for small dimension-sized
    results to avoid tiny-file sprawl)."""
    df.write.mode(mode).parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_points_csv(points: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Reference-native text sink: one ``"x,y"`` line per point
    (byte-format parity with the file ``PointsMapper.java:61-63`` parses).
    """
    points.select(
        F.concat_ws(",", F.col("x"), F.col("y")).alias("value")
    ).write.mode(mode).text(path)


def archive_iteration(
    centroids: DataFrame, archive_path: str, iteration: int
) -> None:
    """R12 versioned sink: append this iteration's centroids under an
    ``iteration=<i>`` partition. k rows per iteration → coalesce(1) keeps
    one file per partition; the history stays one partition-pruned table.
    """
    centroids.coalesce(1).withColumn(
        "iteration", F.lit(iteration)
    ).write.mode("append").partitionBy("iteration").parquet(archive_path)


def read_archive(spark: SparkSession, archive_path: str) -> DataFrame:
    """The full iteration history as one DataFrame; filtering on
    ``iteration`` prunes to single directory partitions."""
    return spark.read.parquet(archive_path)
