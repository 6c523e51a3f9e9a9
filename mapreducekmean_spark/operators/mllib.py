"""MLlib K-Means — the production-scale path for the reference's algorithm.

SURVEY.md §1.3: the whole reference program
(``/root/reference/src/KMeans.java`` driver + mapper + reducer) collapses
into ``pyspark.ml.clustering.KMeans``. Two documented semantic deviations
(SURVEY §2.1 R13, §7): MLlib's ``tol`` is Euclidean center movement, not
the reference's per-coordinate Chebyshev test, and init is seeded
k-means|| rather than uniform line sampling — both strictly better, with
the exact-parity path provided by ``operators.kmeans.lloyd``.

Import-gated: if ``pyspark.ml`` is unavailable the DataFrame-Lloyd's path
still covers the full algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducekmean_spark.operators import kmeans as km

try:  # pragma: no cover - import gate
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector

    HAVE_MLLIB = True
except Exception:  # pragma: no cover
    HAVE_MLLIB = False


def mllib_assignments(
    spark: SparkSession,
    sf_dir: str,
    k: int = km.DEFAULT_K,
    max_iter: int = km.DEFAULT_MAX_ITER,
    tol: float = km.DEFAULT_TOL,
    seed: int = 42,
) -> DataFrame:
    """Fit seeded MLlib KMeans on the embeddings table; return per-point
    predictions (rows-only oracle: seeded k-means|| RNG is not
    SQL-reproducible)."""
    if not HAVE_MLLIB:
        raise NotImplementedError("pyspark.ml is not available in this env")
    pts = km.embeddings(spark, sf_dir)
    # Cache through the maxIter fitting passes (MLlib re-scans the input
    # every iteration; measured 4× wall-clock without this), then release —
    # the returned prediction plan recomputes the cheap scan once.
    feats = pts.withColumn("features", array_to_vector("emb")).cache()
    try:
        model = MLKMeans(
            k=k, maxIter=max_iter, tol=tol, seed=seed, featuresCol="features"
        ).fit(feats)
    finally:
        feats.unpersist()
    pred = model.transform(feats)
    return pred.select(
        "vec_id", F.col("prediction").cast("bigint").alias("cluster_id")
    )


def mllib_centroids(
    spark: SparkSession, sf_dir: str, k: int = km.DEFAULT_K, seed: int = 42
) -> list[list[float]]:
    """Cluster centers from the fitted model (driver-side k×d floats)."""
    if not HAVE_MLLIB:
        raise NotImplementedError("pyspark.ml is not available in this env")
    pts = km.embeddings(spark, sf_dir)
    feats = pts.withColumn("features", array_to_vector("emb")).cache()
    try:
        model = MLKMeans(
            k=k, maxIter=km.DEFAULT_MAX_ITER, tol=km.DEFAULT_TOL, seed=seed,
            featuresCol="features",
        ).fit(feats)
    finally:
        feats.unpersist()
    return [list(c) for c in model.clusterCenters()]
