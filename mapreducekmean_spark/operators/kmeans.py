"""K-Means as declarative DataFrame plans — the reference's entire surface.

Reference: Hadoop MR Lloyd's K-Means —
driver loop ``/root/reference/src/KMeans.java``, map-side assignment
``/root/reference/src/MapReduceKMean/PointsMapper.java``, reduce-side mean
``/root/reference/src/MapReduceKMean/PointsReducer.java``.

Physical shape per iteration (what Catalyst plans from these expressions):
``Scan parquet → Project (codegen'd argmin over a constant-folded centroid
literal) → HashAggregate(partial) → Exchange hashpartitioning(cluster_id)
→ HashAggregate(final)`` — exactly the reference's
map → combine → shuffle → reduce pipeline (``KMeans.java:207-215``), with
two deliberate fixes documented in SURVEY.md §2.1:

- **R8 combiner weighting bug not replicated**: the reference's combiner
  emits unweighted per-split means, so results depend on task split
  boundaries; Spark's partial/final ``avg`` = sum+count is correctly
  weighted.
- **R3 determinism**: centroid init is ``ORDER BY md5(vec_id) LIMIT k``
  instead of ``Random.nextInt`` rejection sampling
  (``KMeans.java:66-74``) — reproducible and cross-engine checkable.

Scale notes: the per-iteration shuffle carries only k×(d sums + count)
after partial aggregation — independent of input row count, so the plan is
scan-bound at 100 TB. Centroids travel as a plan literal (constant-folded,
broadcast with the task binary), never via driver round-trips per task.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducekmean_spark.functions.hashing import stable_order_key
from mapreducekmean_spark.functions.vector import (
    argmin_index,
    as_double_array,
    centroid_literal_sql,
)
from mapreducekmean_spark.sources import load_table

from mapreducekmean_spark.session import local_rows_df

#: Fixture ground truth: embeddings carry labels 0..9 (FIXTURES.md).
DEFAULT_K = 10

#: Reference loop bounds: ``KMeans.java:199,201``.
DEFAULT_TOL = 1e-3
DEFAULT_MAX_ITER = 20


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the points table with the feature column cast to
    ``array<double>`` once (R1 scan + R4 typed projection; the reference
    re-parses the same strings at every hop — we parse exactly once)."""
    df = load_table(spark, sf_dir, "embeddings")
    return df.select(
        "vec_id", as_double_array("embedding").alias("emb"), "label"
    )


def deterministic_init(points: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """R3 — k initial centroids, reproducibly.

    ``orderBy(md5(vec_id)).limit(k)`` plans as TakeOrderedAndProject — a
    per-partition top-k plus a k-row driver merge, one distributed pass.
    The reference needs two full single-threaded scans
    (``KMeans.java:33-100``). Output: (cluster_id 0..k-1, vec_id, emb),
    cluster index assigned in md5 order so DuckDB reproduces it exactly.
    """
    ordered = points.select(
        "vec_id", "emb", stable_order_key("vec_id").alias("h")
    ).orderBy("h", "vec_id").limit(k)
    # The 0..k-1 cluster index is assigned driver-side over the k
    # collected rows (an R11-style k-row collect — every consumer
    # collects these centroids anyway, so job count is unchanged). The
    # former partitionless row_number window produced the same result
    # but tripped WindowExec's "No Partition Defined" scale warning on
    # every kmeans job — noise aimed at unbounded inputs, and Catalyst
    # constant-folds away any literal partition spec that would silence
    # it. The returned LocalRelation broadcasts for free in downstream
    # k-row joins (convergence_delta).
    rows = ordered.collect()
    spark = points.sparkSession
    fields = {f.name: f.dataType.simpleString() for f in points.schema.fields}
    return local_rows_df(spark, 
        [(i, r["vec_id"], list(r["emb"])) for i, r in enumerate(rows)],
        f"cluster_id bigint, vec_id {fields['vec_id']}, emb {fields['emb']}",
    )


#: Driver-side memo for the k-row deterministic-init result, keyed by
#: (realpath(sf_dir), k, embeddings.parquet size+mtime). The init is a
#: k-row LocalRelation; every one-step operator that shares an init
#: (assign/update/sizes/wssse/convergence over the same fixture) would
#: otherwise re-run the same TakeOrderedAndProject job per query — an
#: extra ~0.5 s each at bench scale for identical k rows. The stat
#: fingerprint invalidates the memo if the fixture file is regenerated
#: in place.
_INIT_MEMO: dict[tuple, list[tuple[int, object, list[float]]]] = {}


def _fixture_key(sf_dir: str, k: int) -> tuple:
    import os

    path = os.path.join(os.path.realpath(sf_dir), "embeddings.parquet")
    st = os.stat(path)
    return (path, k, st.st_size, st.st_mtime_ns)


def init_rows(
    spark: SparkSession, sf_dir: str, k: int = DEFAULT_K
) -> list[tuple[int, object, list[float]]]:
    """Memoized ``deterministic_init`` rows for a fixture dir: a k-row
    list of (cluster_id, vec_id, emb). First call per (fixture, k) runs
    the one distributed top-k pass; later calls are driver-local."""
    key = _fixture_key(sf_dir, k)
    if key not in _INIT_MEMO:
        rows = deterministic_init(embeddings(spark, sf_dir), k).collect()
        _INIT_MEMO[key] = [
            (r["cluster_id"], r["vec_id"], list(r["emb"])) for r in rows
        ]
    return _INIT_MEMO[key]


def init_df(spark: SparkSession, sf_dir: str, k: int = DEFAULT_K) -> DataFrame:
    """The memoized init as a k-row LocalRelation (no job when memoized)."""
    return local_rows_df(spark, 
        init_rows(spark, sf_dir, k),
        "cluster_id bigint, vec_id bigint, emb array<double>",
    )


def init_centroids(
    spark: SparkSession, sf_dir: str, k: int = DEFAULT_K
) -> list[list[float]]:
    """The memoized init's centroid vectors, ordered by cluster_id."""
    return [emb for _, _, emb in init_rows(spark, sf_dir, k)]


def collect_centroids(init_df: DataFrame) -> list[list[float]]:
    """Collect the k-row init result into a driver-side list ordered by
    cluster_id (R11 collect — k rows, never the data)."""
    rows = init_df.select("cluster_id", "emb").orderBy("cluster_id").collect()
    return [list(r["emb"]) for r in rows]


def with_distances(points: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add ``dists: array<double>`` — squared L2 to every centroid.

    R5+R6: the broadcast nested-loop of ``PointsMapper.java:59-81`` as one
    whole-stage-codegen projection over a constant-folded literal.
    """
    # Single parsed expression (one py4j call) — semantically identical to
    # F.transform(lit, c -> sq_dist(emb, c)) but without per-lambda driver
    # round trips; the sequential-fold order matches functions/vector.py.
    lit_sql = centroid_literal_sql(centroids)
    return points.withColumn(
        "dists",
        F.expr(
            f"transform({lit_sql}, c -> aggregate("
            "zip_with(emb, c, (x, y) -> (x - y) * (x - y)), "
            "0.0D, (acc, v) -> acc + v))"
        ),
    )


def assign(points: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """R6 — nearest-centroid assignment; first-wins tie-break mirrors the
    strict ``<`` compare at ``PointsMapper.java:70-74``."""
    return with_distances(points, centroids).withColumn(
        "cluster_id", argmin_index(F.col("dists"))
    )


def centroid_update_wide(assigned: DataFrame, dim: int) -> DataFrame:
    """R7-R9 — per-cluster mean as one partial+final HashAggregate.

    One ``avg`` per dimension (d agg expressions over ``element_at``) keeps
    the shuffle payload at k×(d+1) values regardless of input size — the
    correctly-weighted version of the reference's combiner+reducer
    (``PointsReducer.java:17-36``, ``KMeans.java:210``).
    Output: (cluster_id, centroid array<double>, n).
    """
    # One parsed array-of-avgs expression instead of d separate agg
    # columns — identical aggregates, ~200 fewer py4j calls per plan.
    mean_arr = F.expr(
        "array("
        + ",".join(f"avg(element_at(emb, {i + 1}))" for i in range(dim))
        + ")"
    ).alias("centroid")
    return assigned.groupBy("cluster_id").agg(
        mean_arr, F.count("*").alias("n")
    )


def centroid_update_long(assigned: DataFrame, dim: int) -> DataFrame:
    """Oracle-facing long format: (cluster_id, dim, val, n) with ``val``
    rounded to 6 dp (cross-engine float-sum order tolerance, SURVEY §7)."""
    wide = centroid_update_wide(assigned, dim)
    return wide.select(
        "cluster_id",
        F.posexplode("centroid").alias("dim", "val_raw"),
        "n",
    ).select(
        "cluster_id",
        F.col("dim").cast("bigint").alias("dim"),
        F.round("val_raw", 6).alias("val"),
        "n",
    )


def cluster_sizes(assigned: DataFrame) -> DataFrame:
    """R9 count leg — (cluster_id, n)."""
    return assigned.groupBy("cluster_id").agg(F.count("*").alias("n"))


def wssse_per_cluster(assigned: DataFrame) -> DataFrame:
    """Within-cluster sum of squared errors per cluster (model-quality
    metric over the R6 distances), rounded for cross-engine hashing.

    Accepted tolerance: the 6-dp round sits on top of a float sum whose
    partial/final accumulation order differs from a sequential engine's;
    a sum landing within ~1e-16 relative of a 0.5e-6 rounding boundary
    could flip the last digit vs the oracle. Never observed across all
    fixture scales (the per-cluster sums are O(10²) with ~1e-13 absolute
    error); if a future fixture trips it, compare with an epsilon."""
    return (
        assigned.withColumn("min_dist", F.array_min("dists"))
        .groupBy("cluster_id")
        .agg(F.round(F.sum("min_dist"), 6).alias("wssse"), F.count("*").alias("n"))
    )


def convergence_delta(
    new_wide: DataFrame, init_df: DataFrame, tol: float = DEFAULT_TOL
) -> DataFrame:
    """R13 — per-cluster Chebyshev (max per-coordinate abs) movement.

    The reference tests **per-coordinate** absolute movement < tol
    (``KMeans.java:102-111``), not Euclidean distance — preserved here.
    Empty-cluster policy (``KMeans.java:129-144`` semantics): a cluster
    absent from ``new_wide`` keeps its previous centroid → delta 0.
    k-row join; Catalyst broadcasts it.
    """
    old = init_df.select("cluster_id", F.col("emb").alias("old_c"))
    new = new_wide.select("cluster_id", F.col("centroid").alias("new_c"))
    joined = old.join(new, "cluster_id", "left")
    delta = F.when(
        F.col("new_c").isNull(), F.lit(0.0)
    ).otherwise(
        F.array_max(F.zip_with("old_c", "new_c", lambda a, b: F.abs(a - b)))
    )
    return joined.select(
        "cluster_id",
        F.round(delta, 6).alias("delta"),
        (delta < F.lit(tol)).alias("converged"),
    )


@dataclass
class LloydResult:
    centroids: list[list[float]]
    iterations: int
    converged: bool
    history: list[float]  # max per-coord movement per iteration


def lloyd(
    points: DataFrame,
    k: int = DEFAULT_K,
    max_iter: int = DEFAULT_MAX_ITER,
    tol: float = DEFAULT_TOL,
    init_cents: list[list[float]] | None = None,
) -> LloydResult:
    """R14 — the full iterative driver loop, Spark-first.

    Structure mirrors ``KMeans.java:204-234``: one distributed job per
    iteration (assignment + aggregation), k×d floats collected to the
    driver, convergence = every coordinate of every centroid moved < tol
    (``KMeans.java:102-111``). Differences (SURVEY §2.1): correctly
    weighted partial aggregation (R8) and deterministic init (R3).
    Empty clusters keep their previous centroid (``KMeans.java:129-144``).

    ``points`` should be cached by the caller when iterating (the reference
    re-reads its input file every iteration; we scan the cached DataFrame).
    """
    cents = (
        init_cents
        if init_cents is not None
        else collect_centroids(deterministic_init(points, k))
    )
    if len(cents) < k:
        raise ValueError(
            f"k={k} exceeds the {len(cents)} distinct input points; "
            f"reduce k or supply more points"
        )
    blocks = _numpy_blocks(points)
    # Caching pays off only when the loop re-reads the blocks across
    # per-iteration jobs; the one-partition path runs exactly one job.
    cache = blocks.getNumPartitions() > 1
    if cache:
        blocks = blocks.cache()
    try:
        cents, history, converged, it = _iterate(
            blocks, cents, k, max_iter, tol
        )
    finally:
        if cache:
            blocks.unpersist()
    return LloydResult(cents, it, converged, history)


def _numpy_blocks(points: DataFrame):
    """The hot-loop representation: (ids, X) numpy blocks. Built once per
    ``lloyd`` call and cached — the same row-major matrix blocking MLlib
    uses for its Lloyd loop.

    The build is columnar end-to-end: ``mapInArrow`` delivers Arrow
    record batches to the Python worker (no per-row Row objects), the
    batch's flat ``list<double>`` buffer reshapes straight into the
    (n, d) float64 matrix, and each block travels back to the RDD side
    as ONE row holding two binary blobs — so the only per-row pickling
    left is one tuple per ~10k-row batch, not one per point. At 100 TB
    this is the difference between an Arrow memcpy pass and paying
    Python deserialization for every input row.
    """

    def pack(batches):
        import numpy as np
        import pyarrow as pa

        out_schema = pa.schema(
            [
                pa.field("ids", pa.binary()),
                pa.field("xs", pa.binary()),
                pa.field("n", pa.int64()),
                pa.field("d", pa.int64()),
            ]
        )
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            ids = np.ascontiguousarray(ids, dtype=np.int64)
            # list<double> → offset-aware flat values → (n, d) matrix
            flat = batch.column(1).flatten().to_numpy(zero_copy_only=False)
            X = np.ascontiguousarray(flat, dtype=np.float64).reshape(n, -1)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([ids.tobytes()], type=pa.binary()),
                    pa.array([X.tobytes()], type=pa.binary()),
                    pa.array([n], type=pa.int64()),
                    pa.array([X.shape[1]], type=pa.int64()),
                ],
                schema=out_schema,
            )

    def unpack(row):
        import numpy as np

        ids = np.frombuffer(row.ids, dtype=np.int64)
        X = np.frombuffer(row.xs, dtype=np.float64).reshape(row.n, row.d)
        return ids, X

    packed = points.select("vec_id", "emb").mapInArrow(
        pack, "ids binary, xs binary, n bigint, d bigint"
    )
    return packed.rdd.map(unpack)


def _block_partials(X, C):
    """Per-block Lloyd partials: (k×d sums, k counts) of the nearest-
    centroid assignment of ``X`` against ``C``. The ONE copy of the
    iteration math — both the distributed per-iteration jobs and the
    single-task loop call this, so their arithmetic is identical by
    construction.

    Exactness: squared-L2 accumulates per-dimension (``acc += d*d`` one
    dimension at a time), bit-identical to the sequential HOF fold in
    ``functions/vector.py``; ``argmin`` is first-wins like the strict
    ``<`` compare at ``PointsMapper.java:70-74``.
    """
    import numpy as np

    k_, dim = C.shape
    n_loc = X.shape[0]
    dists = np.empty((n_loc, k_))
    for j in range(k_):
        acc = np.zeros(n_loc)
        for d in range(dim):
            diff = X[:, d] - C[j, d]
            acc += diff * diff
        dists[:, j] = acc
    a = np.argmin(dists, axis=1)
    sums = np.zeros((k_, dim))
    counts = np.zeros(k_, dtype=np.int64)
    for j in range(k_):
        m = a == j
        counts[j] = int(m.sum())
        if counts[j]:
            sums[j] = X[m].sum(axis=0)
    return sums, counts


def _advance(C, sums, counts, tol):
    """One centroid update step: empty clusters keep the previous
    centroid (``KMeans.java:129-144``); movement is the max per-coordinate
    abs delta (``KMeans.java:102-111``). Shared by both loop drivers."""
    import numpy as np

    new = C.copy()  # empty clusters keep the previous centroid
    nz = counts > 0
    new[nz] = sums[nz] / counts[nz, None]
    move = float(np.max(np.abs(new - C))) if C.shape[0] else 0.0
    return new, move, move < tol


def _loop_over_blocks(blks, C, max_iter, tol):
    """The Lloyd loop over an in-memory list of (ids, X) blocks — the
    single-partition body. Partials fold left in block order, exactly the
    order a one-partition ``treeReduce`` folds its per-block results, so
    the centroids are bit-identical to the distributed path's."""
    history: list[float] = []
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        sums = counts = None
        for _ids, X in blks:
            s, c = _block_partials(X, C)
            if sums is None:
                sums, counts = s, c
            else:
                sums = sums + s
                counts = counts + c
        if sums is None:
            raise ValueError("empty input: no blocks to iterate over")
        C, move, done = _advance(C, sums, counts, tol)
        history.append(move)
        if done:
            converged = True
            break
    return C, history, converged, it


def _iterate(blocks, cents, k, max_iter, tol):
    """The per-iteration engine: broadcast C, one ``treeReduce`` of
    (k×d sums, k counts) per iteration — the map→combine→shuffle→reduce
    of ``KMeans.java:207-215`` with nothing but the k×(d+1) partial
    aggregates crossing the wire (depth-2 tree merge = the 1000-executor
    shape, exactly MLlib's ``RDD.treeAggregate`` strategy).

    Why RDD and not the DataFrame agg here: the declared one-step
    operators (``assign_nearest``/``centroid_update``) keep the
    declarative plan, but a *driver loop* re-analyzes that plan every
    iteration — measured ~208 ms of Catalyst analysis per iteration at
    fixture scale (the centroid literal changes, so nothing is reused)
    plus ~250 ms interpreted-HOF execution, ≈0.45 s/iter. The numpy
    block path runs the identical math vectorized with zero per-
    iteration planning: ≈0.21 s/iter measured, same assignments
    (0 mismatches over 20 iterations at sf0.1).

    Adaptive single-task fold: when ``blocks`` has ONE partition, every
    per-iteration job is a one-task job whose reduce is just that
    partition's left fold — so the whole loop runs inside a single task
    (``mapPartitions`` over the same blocks, same ``_block_partials`` /
    ``_advance`` math, same fold order → bit-identical centroids),
    turning up-to-20 jobs into 1. This build's Python-task floor is
    ~150 ms/job regardless of work, so the collapse is worth ~3 s at
    fixture scale; on production inputs (many partitions) the
    distributed per-iteration loop below runs unchanged.
    """
    import numpy as np

    sc = blocks.context
    C = np.array(cents, dtype=np.float64)
    k_, dim = C.shape
    history: list[float] = []
    converged = False
    it = 0
    if blocks.getNumPartitions() == 1:
        max_iter_, tol_ = max_iter, tol

        def run(parts_iter):
            yield _loop_over_blocks(list(parts_iter), C, max_iter_, tol_)

        C, history, converged, it = blocks.mapPartitions(run).collect()[0]
        return [list(map(float, c)) for c in C], history, converged, it
    # tree depth scales with partition count like MLlib's treeAggregate:
    # a depth-2 merge bounds driver fan-in at ~sqrt(P) for the
    # 1000-executor case; below ~64 partitions a single reduce suffices
    # (measured equivalent at fixture scale — the loop there is bounded
    # by per-job scheduling latency, ~0.2 s/iter, not by the merge)
    depth = 1 if blocks.getNumPartitions() <= 64 else 2
    for it in range(1, max_iter + 1):
        bc = sc.broadcast(C)

        def part(block):
            _ids, X = block
            return _block_partials(X, bc.value)

        sums, counts = blocks.map(part).treeReduce(
            lambda x, y: (x[0] + y[0], x[1] + y[1]), depth=depth
        )
        bc.unpersist()
        C, move, done = _advance(C, sums, counts, tol)
        history.append(move)
        if done:
            converged = True
            break
    return [list(map(float, c)) for c in C], history, converged, it


def lloyd_assignments(
    spark: SparkSession, sf_dir: str, k: int = DEFAULT_K
) -> DataFrame:
    """End-to-end: run Lloyd's to convergence, return final per-point
    assignments + final centroids in long format (rows-only oracle —
    iterative, not single-statement SQL)."""
    pts = embeddings(spark, sf_dir).cache()
    try:
        result = lloyd(pts, k, init_cents=init_centroids(spark, sf_dir, k))
        assigned = assign(pts, result.centroids)
        return assigned.select(
            "vec_id",
            "cluster_id",
            F.lit(result.iterations).cast("bigint").alias("iterations"),
            F.lit(result.converged).alias("converged"),
        )
    finally:
        pts.unpersist()
