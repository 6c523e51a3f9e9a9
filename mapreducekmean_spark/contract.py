"""The declared-query contract (SURVEY.md §2.3): every operator the engine
claims, as a (Spark callable, DuckDB oracle SQL) pair.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame; the
oracle is ANSI SQL DuckDB runs over the identical parquet (views
``region nation customer supplier part orders lineitem events documents
embeddings``). The driver compares row-count + schema + order-insensitive
value-hash with columns sorted by name — so every computed column is
aliased identically on both sides, integer outputs are cast to BIGINT on
both sides, and multi-row float aggregates are rounded to 6 dp on both
sides (single-value float math is bit-identical by construction — see
``functions/vector.py``).

Queries whose oracle is ``None`` are genuinely non-SQL-expressible
(iterative loops, seeded MLlib, LSH with engine RNG) → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducekmean_spark.operators import kmeans as km

K = km.DEFAULT_K
DIM = 64  # fixture embedding dimensionality (FIXTURES.md)

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only
    doc: str = ""


# --- shared DuckDB CTE fragments (mirror operators/kmeans.py exactly) ---

_PTS = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings"

_INIT = f"""
  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS cluster_id,
         vec_id, emb
  FROM pts
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {K}
"""

_ASSIGN = f"""
  SELECT vec_id, cluster_id, dist FROM (
    SELECT p.vec_id, c.cluster_id,
           list_sum(list_transform(range(1, {DIM} + 1),
                    i -> (p.emb[i] - c.emb[i]) * (p.emb[i] - c.emb[i]))) AS dist
    FROM pts p CROSS JOIN init c
  )
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) = 1
"""

_KM_CTES = f"WITH pts AS ({_PTS}), init AS ({_INIT}), assign AS ({_ASSIGN})"


# --- query definitions ---------------------------------------------------


def _scan_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1+R4 — typed scan/projection of the points table (2-d parity view:
    the reference's points are ``(x, y)`` doubles, PointsMapper.java:61-63)."""
    pts = km.embeddings(spark, sf_dir)
    return pts.select(
        "vec_id",
        F.element_at("emb", 1).alias("x"),
        F.element_at("emb", 2).alias("y"),
        F.col("label").cast("bigint").alias("label"),
    )


_SCAN_POINTS_SQL = """
SELECT vec_id,
       CAST(embedding[1] AS DOUBLE) AS x,
       CAST(embedding[2] AS DOUBLE) AS y,
       CAST(label AS BIGINT) AS label
FROM embeddings
"""


def _sample_init_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 — deterministic k-row init sample (md5 order)."""
    return km.deterministic_init(km.embeddings(spark, sf_dir), K).select(
        "cluster_id", "vec_id"
    )


_SAMPLE_INIT_SQL = f"""
WITH pts AS ({_PTS}), init AS ({_INIT})
SELECT cluster_id, vec_id FROM init
"""


def _assign_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5+R6 — nearest-centroid assignment against the deterministic init
    centroids (broadcast nested loop + argmin, PointsMapper.java:59-81)."""
    pts = km.embeddings(spark, sf_dir)
    cents = km.collect_centroids(km.deterministic_init(pts, K))
    return km.assign(pts, cents).select("vec_id", "cluster_id")


_ASSIGN_SQL = f"""
{_KM_CTES}
SELECT vec_id, cluster_id FROM assign
"""


def _centroid_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7-R9 — one Lloyd's update step: per-cluster per-dimension mean."""
    pts = km.embeddings(spark, sf_dir)
    cents = km.collect_centroids(km.deterministic_init(pts, K))
    return km.centroid_update_long(km.assign(pts, cents), DIM)


_CENTROID_UPDATE_SQL = f"""
{_KM_CTES}
SELECT a.cluster_id,
       CAST(d.dim AS BIGINT) AS dim,
       round(avg(p.emb[CAST(d.dim AS INTEGER) + 1]), 6) AS val,
       count(*) AS n
FROM assign a
JOIN pts p USING (vec_id)
CROSS JOIN (SELECT unnest(range(0, {DIM})) AS dim) d
GROUP BY 1, 2
"""


def _cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 count leg."""
    pts = km.embeddings(spark, sf_dir)
    cents = km.collect_centroids(km.deterministic_init(pts, K))
    return km.cluster_sizes(km.assign(pts, cents))


_CLUSTER_SIZES_SQL = f"""
{_KM_CTES}
SELECT cluster_id, count(*) AS n FROM assign GROUP BY 1
"""


def _wssse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-cluster sum of squared errors (R6 distances, summed)."""
    pts = km.embeddings(spark, sf_dir)
    cents = km.collect_centroids(km.deterministic_init(pts, K))
    return km.wssse_per_cluster(km.assign(pts, cents))


_WSSSE_SQL = f"""
{_KM_CTES}
SELECT cluster_id, round(sum(dist), 6) AS wssse, count(*) AS n
FROM assign GROUP BY 1
"""


def _convergence_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13 — per-cluster Chebyshev movement after one update step."""
    pts = km.embeddings(spark, sf_dir)
    init = km.deterministic_init(pts, K)
    cents = km.collect_centroids(init)
    new_wide = km.centroid_update_wide(km.assign(pts, cents), DIM)
    return km.convergence_delta(new_wide, init, km.DEFAULT_TOL)


_CONVERGENCE_SQL = f"""
{_KM_CTES},
upd AS (
  SELECT a.cluster_id, d.dim, avg(p.emb[CAST(d.dim AS INTEGER) + 1]) AS val
  FROM assign a
  JOIN pts p USING (vec_id)
  CROSS JOIN (SELECT unnest(range(0, {DIM})) AS dim) d
  GROUP BY 1, 2
),
delta AS (
  SELECT i.cluster_id,
         coalesce(max(abs(i.emb[CAST(u.dim AS INTEGER) + 1] - u.val)), 0.0) AS dmax
  FROM init i LEFT JOIN upd u USING (cluster_id)
  GROUP BY 1
)
SELECT cluster_id, round(dmax, 6) AS delta, dmax < {km.DEFAULT_TOL} AS converged
FROM delta
"""


def _filter_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe-parse validity filter — the engine's replacement for the
    reference's crash-on-malformed-row semantics (PointsMapper.java:61-63,
    SURVEY §2.2 Filter row): non-null/finite value, known event type,
    parseable JSON props."""
    from mapreducekmean_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    k_prop = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.filter(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & F.col("ts").isNotNull()
            & F.col("event_type").isin(
                "signup", "click", "error", "view", "purchase"
            )
        )
        .withColumn("k_prop", k_prop)
        .filter(F.col("k_prop").isNotNull())
        .select("event_id", "event_type", "value", "k_prop")
    )


_FILTER_VALID_SQL = """
SELECT event_id, event_type, value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_prop
FROM events
WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
  AND event_type IN ('signup', 'click', 'error', 'view', 'purchase')
  AND json_extract_string(props, '$.k') IS NOT NULL
"""


def _kmeans_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14 — full Lloyd's loop to convergence (rows-only: iterative)."""
    return km.lloyd_assignments(spark, sf_dir, K)


def _queries_core() -> list[Query]:
    return [
        Query("scan_points", _scan_points, _SCAN_POINTS_SQL),
        Query("filter_valid", _filter_valid, _FILTER_VALID_SQL),
        Query("sample_init_det", _sample_init_det, _SAMPLE_INIT_SQL),
        Query("assign_nearest", _assign_nearest, _ASSIGN_SQL),
        Query("centroid_update", _centroid_update, _CENTROID_UPDATE_SQL),
        Query("cluster_sizes", _cluster_sizes, _CLUSTER_SIZES_SQL),
        Query("wssse", _wssse, _WSSSE_SQL),
        Query("convergence_delta", _convergence_delta, _CONVERGENCE_SQL),
        Query("kmeans_full", _kmeans_full, None),
    ]


def registry() -> dict[str, Query]:
    """All declared queries, keyed by contract name."""
    out: dict[str, Query] = {}
    for q in _queries_core():
        out[q.name] = q
    return out
