"""Custom Python DataSource for the reference-native ``"x,y"`` points
format — ``spark.read.format("points").load(path)``.

This is the Spark-4 idiomatic form of the reference's only connector
(``TextInputFormat`` line scan wired at
``/root/reference/src/KMeans.java:214``, parsed at
``src/MapReduceKMean/PointsMapper.java:59-63``), built on the public
``pyspark.sql.datasource`` API:

- **Partitioned scan**: one ``InputPartition`` per file — files read in
  parallel across executors, like the reference's per-block splits.
- **Filter pushdown**: numeric comparisons on x/y are accepted by
  ``pushFilters`` and applied inside the reader, so filtered scans ship
  only surviving rows into the plan (the custom-source analogue of
  parquet ``PushedFilters``).
- **Safe parse**: malformed lines are dropped (engine policy,
  SURVEY.md §1.2) instead of the reference's task-killing
  ``NumberFormatException``; NaN/±Inf coordinates are treated as
  malformed, matching ``read_points_csv``'s validity filter.

The vectorized parquet path (``sources/readers.py``) remains the
production format; this source exists for byte-format parity and as the
template for custom-connector extension.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType


@dataclass
class _FilePartition(InputPartition):
    path: str


def _passes(v: float, op: str, bound: float) -> bool:
    return {
        "=": v == bound,
        ">": v > bound,
        ">=": v >= bound,
        "<": v < bound,
        "<=": v <= bound,
    }[op]


class PointsReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("points source requires a path")
        self._path = path
        #: (column, op, bound) conjuncts applied during the scan.
        self._pushed: list[tuple[str, str, float]] = []

    def pushFilters(self, filters: list[Filter]):  # noqa: N802 (API name)
        """Accept numeric comparisons on x/y; everything else is returned
        for Spark to evaluate post-scan."""
        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        for f in filters:
            op = ops.get(type(f))
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if (
                op is not None
                and col in ("x", "y")
                and isinstance(f.value, (int, float))
            ):
                self._pushed.append((col, op, float(f.value)))
            else:
                yield f  # unsupported → Spark applies it

    def partitions(self):
        if os.path.isdir(self._path):
            files = sorted(
                os.path.join(self._path, f)
                for f in os.listdir(self._path)
                if not f.startswith((".", "_"))
            )
        else:
            files = [self._path]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        pushed = self._pushed
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                parts = line.strip().split(",")
                if len(parts) != 2:
                    continue
                try:
                    x, y = float(parts[0]), float(parts[1])
                except ValueError:
                    continue
                if not (math.isfinite(x) and math.isfinite(y)):
                    continue
                row = {"x": x, "y": y}
                if all(_passes(row[c], op, b) for c, op, b in pushed):
                    yield (x, y)


class PointsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "points"

    def schema(self) -> str:
        return "x double, y double"

    def reader(self, schema: StructType) -> PointsReader:
        return PointsReader(self.options)


def register(spark) -> None:
    """Idempotently register the source: afterwards
    ``spark.read.format("points").load(path)`` works anywhere in the
    session."""
    from mapreducekmean_spark.shipping import ship_package

    # the DataSource class is pickled by reference — workers must be able
    # to import this module even when the driver found it via sys.path
    ship_package(spark)
    # a reader that implements pushFilters is REJECTED (not degraded)
    # when this conf is off, and vanilla external sessions default it
    # off — set it here like the nanos conf in load_table, so the
    # source works on any session
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PointsDataSource)
