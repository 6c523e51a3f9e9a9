"""Product quantization (PQ) — the vector-store compression step past
scalar quantization.

Public algorithm: Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011). Split each d-dim vector into M
subvectors, learn a tiny K-means codebook PER SUBSPACE, and store each
vector as M small codes — here M=8 subspaces × K=16 codes = 4 bits per
subspace, 32 bits per 64-d vector (128× smaller than the float64 math,
16× smaller than the engine's 8-bit scalar quantization) — while query
time uses ASYMMETRIC distance (ADC): the query stays exact, each
database vector's distance is approximated as the sum of M table
lookups.

The reference has nothing like this (its only vector op is the full
K-Means loop, ``/root/reference/src/KMeans.java``); PQ belongs to the
engine's ANN family as the compression tier: IVF prunes WHERE to look
(``similarity.land_ivf_index``), PQ shrinks WHAT is stored and scanned.

Spark mapping — deliberately the same shapes as the oracle-checked
K-Means core, just M codebooks at once:

- **training** is Lloyd over all M subspaces SIMULTANEOUSLY in one
  DataFrame pass per iteration: assignment is a constant-folded
  codebook literal (R5's broadcast-small-state shape), the update is
  ONE posexplode + groupBy (sub, code) partial+final aggregate whose
  shuffle payload is M×K×(d/M + 1) values regardless of input rows —
  ``kmeans.centroid_update_wide``'s bound, multiplied by M;
- **init** is the md5-deterministic k-sample (``deterministic_init``'s
  ordering), so training is reproducible run to run with no RNG;
- **encoding** is a pure codegen projection (no shuffle, no Python);
- **ADC scoring** computes each query's M×K lookup table driver-side
  (a handful of floats — the same bounded-collect class as the k-row
  centroid collect), folds it into a literal, and scores every
  encoded row with one ``aggregate`` over its M codes: the scan reads
  4-byte codes, never the 512-byte raw vectors. Empty cells keep
  their previous centroid, mirroring ``KMeans.java:129-144`` policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducekmean_spark.functions.hashing import stable_order_key
from mapreducekmean_spark.functions.vector import argmin_index
from mapreducekmean_spark.operators import kmeans as km

#: Subspace count (d must divide evenly) and codes per subspace.
PQ_M = 8
PQ_K = 16
#: Lloyd iterations per training run — fixed (not convergence-tested)
#: so the training cost is a known constant number of passes.
PQ_ITERS = 4


def _codebook_lit(codebooks: list[list[list[float]]]) -> Column:
    """All M codebooks as one literal array<array<array<double>>> —
    constant-folded into every assignment/encoding projection."""
    return F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(v)) for v in code])
                    for code in cb
                ]
            )
            for cb in codebooks
        ]
    )


def _sub_col(emb: Column, sub: int, ds: int) -> Column:
    return F.slice(emb, sub * ds + 1, ds)


def _code_cols(
    emb: Column, codebooks: list[list[list[float]]]
) -> list[Column]:
    """Per-subspace nearest-code index (squared-L2 argmin, first-wins
    tie-break like ``kmeans.assign``)."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    cb = _codebook_lit(codebooks)
    out = []
    for sub in range(m):
        sv = _sub_col(emb, sub, ds)
        dists = F.transform(
            F.element_at(cb, sub + 1),
            lambda c: F.aggregate(
                F.zip_with(sv, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        out.append(argmin_index(dists))
    return out


def train_pq_codebooks(
    points: DataFrame,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
) -> list[list[list[float]]]:
    """Train the M codebooks: deterministic init (the k md5-smallest
    vectors, each sliced into its M subvectors — no RNG), then
    ``iters`` simultaneous-subspace Lloyd passes. Returns
    ``codebooks[sub][code] == list of d/m floats``."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ds = dim // m
    seed_rows = (
        points.select("vec_id", "emb", stable_order_key("vec_id").alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"PQ training needs at least k={k} vectors, got {len(seed_rows)}"
        )
    codebooks = [
        [list(map(float, r.emb[sub * ds : (sub + 1) * ds])) for r in seed_rows]
        for sub in range(m)
    ]
    for _ in range(iters):
        codes = _code_cols(F.col("emb"), codebooks)
        # one pass: (sub, code, subvec) rows → per-cell mean. The
        # explode fans each input row into M narrow rows BEFORE the
        # partial aggregate, which collapses every task's output to
        # ≤ M×K cells — the k×(d+1) shuffle bound of centroid_update,
        # times M.
        cells = points.select(
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            codes[sub].alias("code"),
                            _sub_col(F.col("emb"), sub, ds).alias("sv"),
                        )
                        for sub in range(m)
                    ]
                )
            ).alias("sub", "cs")
        ).select("sub", "cs.code", "cs.sv")
        mean_arr = F.expr(
            "array("
            + ",".join(f"avg(element_at(sv, {i + 1}))" for i in range(ds))
            + ")"
        ).alias("centroid")
        updated = (
            cells.groupBy("sub", "code").agg(mean_arr).collect()
        )
        for r in updated:  # empty cells keep their previous centroid
            codebooks[r.sub][r.code] = [float(v) for v in r.centroid]
    return codebooks


def pq_encode(
    points: DataFrame, codebooks: list[list[list[float]]]
) -> DataFrame:
    """(vec_id, codes array<int>) — M codes per vector, one narrow
    codegen projection (the compressed representation a 100 TB vector
    store actually lands: 32 bits/vector at the default M×K)."""
    codes = _code_cols(F.col("emb"), codebooks)
    return points.select(
        "vec_id",
        F.array(*[c.cast("int") for c in codes]).alias("codes"),
    )


def pq_adc_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    m: int = PQ_M,
    codes_k: int = PQ_K,
    iters: int = PQ_ITERS,
) -> DataFrame:
    """End-to-end PQ ANN: train → encode → ADC top-k for the standard
    query batch (first N_QUERIES vectors, like the other ANN paths).

    ADC: each query's exact subvectors against each codebook give an
    M×K table of partial squared distances, computed DRIVER-side from
    the collected query batch (N_QUERIES×M×K floats — bounded), then
    folded in as a literal; a database vector's approximate distance
    is the sum of its M looked-up entries — the scan touches ONLY the
    4-byte code arrays. Output ranks ascending by approximate distance
    (squared L2), ties by neighbor id."""
    from mapreducekmean_spark.operators.similarity import N_QUERIES

    pts = km.embeddings(spark, sf_dir).select("vec_id", "emb")
    dim = len(pts.select("emb").first()["emb"])
    ds = dim // m
    codebooks = train_pq_codebooks(pts, dim, m, codes_k, iters)
    encoded = pq_encode(pts, codebooks).localCheckpoint()

    q_rows = sorted(
        pts.filter(F.col("vec_id") < N_QUERIES).collect(),
        key=lambda r: r.vec_id,
    )
    # one flat M*K table per query: lut[sub*K + code] = partial sq dist
    lut_rows = []
    for q in q_rows:
        lut = []
        for sub in range(m):
            sv = q.emb[sub * ds : (sub + 1) * ds]
            for code in range(codes_k):
                c = codebooks[sub][code]
                lut.append(
                    float(sum((a - b) * (a - b) for a, b in zip(sv, c)))
                )
        lut_rows.append((int(q.vec_id), lut))
    q_lut = spark.createDataFrame(
        lut_rows, "q_id bigint, lut array<double>"
    )
    # ONE scan of the 4-byte-code table, broadcast nested loop against
    # the tiny LUT batch (cosine_topk's physical shape, but the scan
    # side is 128x narrower than the raw vectors)
    pairs = encoded.join(
        F.broadcast(q_lut), F.col("vec_id") != F.col("q_id")
    )
    dist = F.aggregate(
        F.zip_with(
            "codes",
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda code, sub: F.element_at(
                F.col("lut"), (sub * codes_k + code + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            dist.alias("adc_dist"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "neighbor_id",
            "rank",
            F.round("adc_dist", 6).alias("adc_dist"),
        )
    )


def pq_reconstruction_mse(
    points: DataFrame, codebooks: list[list[list[float]]]
) -> float:
    """Mean squared reconstruction error of the PQ code over the
    corpus — the training-quality metric (should fall as iters/K grow,
    property-tested)."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    cb = _codebook_lit(codebooks)
    codes = _code_cols(F.col("emb"), codebooks)
    err_terms = []
    for sub in range(m):
        recon = F.element_at(
            F.element_at(cb, sub + 1), (codes[sub] + 1).cast("int")
        )
        err_terms.append(
            F.aggregate(
                F.zip_with(
                    _sub_col(F.col("emb"), sub, ds),
                    recon,
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    total = points.select(
        sum(err_terms[1:], err_terms[0]).alias("se")
    ).agg(F.avg("se").alias("mse"))
    return float(total.collect()[0]["mse"])
