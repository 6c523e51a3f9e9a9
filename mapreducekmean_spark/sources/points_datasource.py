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
- **Sink half**: ``df.write.format("points").mode(...).save(path)``
  emits the reference's exact ``"x,y"`` line format with
  task-temp + commit-rename atomicity (``PointsWriter``) — full
  source/sink parity with ``KMeans.java:214-215``.

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
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
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


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_path: str
    final_name: str
    rows: int


class PointsWriter(DataSourceWriter):
    """Sink half of the source — emits the reference's exact ``"x,y"``
    line format (the byte layout ``PointsReducer.java:32-33`` consumes
    and ``KMeans.java:214-215`` wires as job I/O).

    Task-temp + driver-commit rename, FileOutputCommitter-style: each
    task writes ``.part-*.tmp`` (invisible to the reader, which skips
    dot/underscore names) and only ``commit()`` renames the full set
    into place; ``abort()`` removes the temps. In overwrite mode the
    new files are renamed into place BEFORE old part files are removed,
    so a mid-commit failure can leave a mixed directory but never
    destroys the old data without the new data being present (same
    guarantee class as Hadoop's committer — rename-then-cleanup, not
    atomic swap). Non-finite coordinates are rejected loudly at write
    time (the paired reader drops non-finite rows as malformed, so
    accepting them would make a round trip silently lossy);
    ``repr(float)`` round-trips every finite double bit-exactly
    (round-trip + hypothesis pytest in tests/).
    """

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        path = options.get("path")
        if not path:
            raise ValueError("points sink requires a path")
        self._path = path
        self._overwrite = overwrite
        # per-job suffix (driver-side, pickled to every task): append jobs
        # into a non-empty directory must not reuse part-NNNNN names from
        # an earlier job — that would silently overwrite committed data
        self._job = uuid.uuid4().hex[:8]

    def write(self, iterator) -> _FileCommit:
        import math
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self._path, exist_ok=True)
        final = f"part-{pid:05d}-{self._job}.csv"
        tmp = os.path.join(self._path, f".part-{pid:05d}-{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                x, y = float(row[0]), float(row[1])
                if not (math.isfinite(x) and math.isfinite(y)):
                    raise ValueError(
                        f"points sink rejects non-finite coordinates "
                        f"({x!r}, {y!r}): the points reader drops them as "
                        "malformed, so writing them would silently lose "
                        "rows on read-back"
                    )
                fh.write(f"{x!r},{y!r}\n")
                n += 1
        if n == 0:  # empty partition -> no part file (not 1000s of 0-byte files)
            os.remove(tmp)
            return _FileCommit(tmp_path="", final_name="", rows=0)
        return _FileCommit(tmp_path=tmp, final_name=final, rows=n)

    def commit(self, messages) -> None:
        import os

        # rename the new files into place FIRST: old data is only
        # removed once every new part file is visible, so a mid-commit
        # crash can duplicate (mixed old+new) but never lose data
        new_names = set()
        for m in messages:
            if m is not None and m.tmp_path:
                os.replace(m.tmp_path, os.path.join(self._path, m.final_name))
                new_names.add(m.final_name)
        if self._overwrite:
            for f in os.listdir(self._path):
                p = os.path.join(self._path, f)
                # only regular visible part files are this sink's to
                # delete: skip dot/underscore names (reader-invisible,
                # e.g. _spark_metadata) and subdirectories
                if (
                    f not in new_names
                    and not f.startswith((".", "_"))
                    and os.path.isfile(p)
                ):
                    os.remove(p)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and m.tmp_path and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class PointsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "points"

    def schema(self) -> str:
        return "x double, y double"

    def reader(self, schema: StructType) -> PointsReader:
        return PointsReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> PointsWriter:
        if len(schema.fields) != 2:
            raise ValueError(
                f"points sink expects 2 columns (x, y); got {len(schema.fields)}"
            )
        return PointsWriter(self.options, overwrite)


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
