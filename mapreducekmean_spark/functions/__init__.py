"""Engine expression library: vector math and deterministic hashing.

Everything here is built from ``pyspark.sql.functions`` higher-order
functions — JVM-side, whole-stage-codegen'd, zero Python UDFs — so the
hot paths (distance kernels over 100 TB of embeddings) never cross the
Python boundary.
"""

from mapreducekmean_spark.functions.vector import (
    argmin_index,
    as_double_array,
    centroid_literal,
    cosine_sim,
    dot,
    l2_norm,
    sq_dist,
)
from mapreducekmean_spark.functions.hashing import md5_of, stable_order_key

__all__ = [
    "argmin_index",
    "as_double_array",
    "centroid_literal",
    "cosine_sim",
    "dot",
    "l2_norm",
    "md5_of",
    "sq_dist",
    "stable_order_key",
]
