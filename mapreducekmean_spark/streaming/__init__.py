"""Structured Streaming surface: streaming K-Means scoring, watermarked
windowed aggregation, and stateful streaming sessionization.

The reference is strictly batch (SURVEY.md §2.2: streaming absent) — this
package is the engine's extension, built on ``readStream`` →
transformations → ``writeStream`` with watermarks for late data and
``applyInPandasWithState`` for the custom stateful operator.

Local tests drive these with a parquet file source + memory sink and
``processAllAvailable()`` (synchronous micro-batch), which exercises the
identical plan that would run against Kafka on a cluster.
"""

from mapreducekmean_spark.streaming.jobs import (
    read_events_stream,
    read_points_stream,
    stream_assign,
    stream_hourly_counts,
    stream_sessionize,
)

__all__ = [
    "read_events_stream",
    "read_points_stream",
    "stream_assign",
    "stream_hourly_counts",
    "stream_sessionize",
]
