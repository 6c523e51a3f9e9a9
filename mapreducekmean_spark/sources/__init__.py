"""Sources: typed readers for the fixture tables and the reference-native
points CSV format.

The reference's only source is a line-oriented HDFS text scan of ``"x,y"``
CSV points (``/root/reference/src/KMeans.java:214`` wires the input path;
``/root/reference/src/MapReduceKMean/PointsMapper.java:59-63`` parses each
line). Here the primary format is parquet (columnar, predicate pushdown,
column pruning); :func:`read_points_csv` preserves exact reference-format
parity with *safe* parsing instead of the reference's crash-on-malformed
behavior (unguarded ``Double.parseDouble`` at ``PointsMapper.java:61-63``).
"""

from mapreducekmean_spark.sources.readers import (
    TABLES,
    load_table,
    load_tables,
    read_points_csv,
    stage_points_csv,
)
from mapreducekmean_spark.sources.bucketing import (
    compact_bucketed,
    compact_partitions,
    read_bucketed,
    upsert_partitions,
    write_bucketed,
    write_partitioned,
)
from mapreducekmean_spark.sources.points_datasource import (
    register as register_points_source,
)
from mapreducekmean_spark.sources.sinks import (
    archive_iteration,
    read_archive,
    write_csv,
    write_json,
    write_parquet,
    write_points_csv,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "compact_bucketed",
    "compact_partitions",
    "read_bucketed",
    "upsert_partitions",
    "read_points_csv",
    "register_points_source",
    "write_bucketed",
    "write_partitioned",
    "archive_iteration",
    "read_archive",
    "write_csv",
    "write_json",
    "write_parquet",
    "write_points_csv",
]
