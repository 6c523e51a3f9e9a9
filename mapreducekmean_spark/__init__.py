"""PySpark-native analytics engine with the capabilities of
FredShi97/MapReduceKMean, rebuilt Spark-first.

The reference (``/root/reference``) is a Hadoop MapReduce implementation of
Lloyd's K-Means on 2-D points (``src/KMeans.java``,
``src/MapReduceKMean/PointsMapper.java``, ``src/MapReduceKMean/PointsReducer.java``).
This package re-expresses every reference behavior as declarative
DataFrame/SQL plans (Catalyst-optimized, whole-stage-codegen'd, zero
row-at-a-time Python UDFs in the hot path), generalizes d=2 points to
d-dim embedding vectors, and adds the LLM-data-pipeline operator suite
(dedup, similarity search, text analysis, sessionization, streaming,
multimodal plumbing) designed for 100 TB-scale execution.
"""

from mapreducekmean_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
