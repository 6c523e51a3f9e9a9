"""CLI entry point — the reference's driver surface (SURVEY.md §2.1 R15).

Reference: ``java KMeans <k> <hdfs://host:port> <input> <output>``
(``/root/reference/src/KMeans.java:152-176``); per-iteration archive dirs
(``KMeans.java:146``); final report lines
``Iteration finished at iter:<i> Converged: <bool>`` and
``Centriod.<i> x: <x> y: <y>`` (``KMeans.java:236-240``, including the
reference's "Centriod" spelling for drop-in log compatibility).

Engine form: ``python -m mapreducekmean_spark <k> <input> <output>
[--archive DIR] [--max-iter N] [--tol T] [--dim D]``. The HDFS root URL
argument is dropped — Spark path URIs carry the filesystem. Input is the
reference-native ``"x,y"`` CSV (or parquet with an array column via
``--format parquet``); output is the reference's text format
``<clusterId>\t<x>, <y>`` plus an optional iteration-partitioned parquet
archive instead of directory renames.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from mapreducekmean_spark.session import get_spark, local_rows_df


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m mapreducekmean_spark",
        description="Lloyd's K-Means over a points file (Spark-native "
        "re-expression of the MapReduceKMean driver).",
    )
    p.add_argument("k", type=int, help="number of clusters")
    p.add_argument("input", help="points path ('x,y' CSV, or parquet)")
    p.add_argument("output", help="output dir for final centroids (text)")
    p.add_argument("--archive", default=None, help="iteration history dir")
    p.add_argument("--max-iter", type=int, default=20)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument(
        "--format", choices=("csv", "parquet"), default="csv",
        help="csv = reference-native 'x,y' lines; parquet = table with "
        "an array<float/double> 'embedding' (or 'emb') column",
    )
    return p


def load_points(spark, path: str, fmt: str):
    """Points as (vec_id, emb: array<double>). CSV points get a stable id
    from their content: xxhash64(x, y, dup_rank), where dup_rank is the
    row_number within identical (x, y) groups — the reference has no
    point ids at all, so any deterministic id works for init
    reproducibility. The window partitions by (x, y), so this is a keyed
    shuffle, never the single-partition global sort a bare
    ``Window.orderBy`` would plan (rows inside one (x, y) group are
    byte-identical, so their relative order can't affect the output).
    Hash collisions would only merge two points' init-ordering keys —
    ~n²/2⁶⁴, ignorable."""
    from pyspark.sql import Window

    if fmt == "csv":
        from mapreducekmean_spark.sources import read_points_csv

        pts = read_points_csv(spark, path)
        dup = Window.partitionBy("x", "y").orderBy(F.lit(0))
        return pts.select(
            F.xxhash64("x", "y", F.row_number().over(dup)).alias("vec_id"),
            F.array("x", "y").cast("array<double>").alias("emb"),
        )
    df = spark.read.parquet(path)
    emb = "embedding" if "embedding" in df.columns else "emb"
    if emb not in df.columns:
        raise SystemExit(
            "parquet input needs an 'embedding' or 'emb' array column; "
            f"found {df.columns}"
        )
    id_candidates = [
        c for c in ("vec_id", "id", "doc_id") if c in df.columns
    ] or [c for c in df.columns if c != emb]
    if not id_candidates:
        raise SystemExit("parquet input needs an id column besides the embedding")
    return df.select(
        F.col(id_candidates[0]).cast("bigint").alias("vec_id"),
        F.col(emb).cast("array<double>").alias("emb"),
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark("mapreducekmean-cli")

    from mapreducekmean_spark.operators import kmeans as km
    from mapreducekmean_spark.sources.sinks import archive_iteration

    pts = load_points(spark, args.input, args.format).cache()
    try:
        dim_row = pts.select(F.size("emb").alias("d")).first()
        if dim_row is None:
            print("no valid points in input", file=sys.stderr)
            return 1
        dim = dim_row["d"]
        cents = km.collect_centroids(km.deterministic_init(pts, args.k))
        if len(cents) < args.k:
            print(
                f"k={args.k} exceeds the {len(cents)} valid input points",
                file=sys.stderr,
            )
            return 1
        converged = False
        it = 0
        for it in range(1, args.max_iter + 1):
            wide = km.centroid_update_wide(km.assign(pts, cents), dim)
            if args.archive:
                archive_iteration(wide, args.archive, it)
            got = {
                int(r["cluster_id"]): list(r["centroid"])
                for r in wide.collect()
            }
            new = [got.get(i, cents[i]) for i in range(args.k)]
            move = max(
                (
                    abs(a - b)
                    for oc, nc in zip(cents, new)
                    for a, b in zip(oc, nc)
                ),
                default=0.0,
            )
            cents = new
            if move < args.tol:
                converged = True
                break

        # Reference text sink: "<clusterId>\t<c0>, <c1>, ..." per line
        # (PointsReducer.java:32-33 emits "<id>\t<x>, <y>").
        out_rows = [
            (i, ", ".join(repr(v) for v in c)) for i, c in enumerate(cents)
        ]
        local_rows_df(spark, out_rows, "cluster_id long, centroid string").coalesce(
            1
        ).select(
            F.concat_ws("\t", F.col("cluster_id"), F.col("centroid")).alias(
                "value"
            )
        ).write.mode("overwrite").text(args.output)

        # Reference report format (KMeans.java:236-240).
        print(f"Iteration finished at iter:{it} Converged: {str(converged).lower()}")
        for i, c in enumerate(cents):
            coords = " ".join(
                f"{axis}: {v!r}"
                for axis, v in zip(("x", "y", *map(str, range(2, dim))), c)
            )
            print(f"Centriod.{i} {coords}")
        return 0
    finally:
        pts.unpersist()


if __name__ == "__main__":
    raise SystemExit(main())
