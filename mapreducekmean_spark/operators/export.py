"""Training-data export: deterministic global shuffle and sharding.

A pretraining run wants the corpus in pseudo-random order, split into
a fixed number of shard files, and it wants that order REPRODUCIBLE —
re-running the export (or re-running it after a resume) must place
every document at the same (shard, position). The reference engine has
nothing like this (its 3 Java files run one K-Means job; see
KMeans.java); this is part of the engine's LLM-pipeline surface.

Scale design — the naive formulation is a global ``row_number()`` over
``ORDER BY md5(seed || doc_id)``, a single-partition window that dies
at 100 TB. The implementation is the same two-level trick as
``text.pack_sequences``: the md5 key's leading 4 hex chars form 65 536
buckets (a scan-site projection, no shuffle beyond the one the
per-bucket aggregate needs), per-bucket counts are a 65 536-row table
whose running offsets are a driver-scale window, and each document's
global rank is its bucket offset plus a within-bucket ``row_number``
whose partitions hold ~n/65 536 rows. Because hex digits sort the same
lexicographically and numerically, (bucket, key) order IS global key
order, so the distributed rank equals the naive one — the DuckDB twin
uses the naive single window as the implementation-independence check.

Spark's physical strategy for the final sort-by-key write would be a
range-partitioned sort (sample-based partitioner); md5 keys are
uniform, so there is no skew by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default shuffle seed and shard count for the declared query; a real
#: export picks its own (both are plumbed through).
SHUFFLE_SEED = 7
N_SHARDS = 16

#: leading hex chars of the md5 key used as the coarse rank bucket;
#: 4 chars = 65 536 buckets bounds within-bucket window partitions at
#: corpus/65 536 rows while the offsets table stays driver-scale.
SHUFFLE_BUCKET_CHARS = 4


def shuffle_export(
    docs: DataFrame,
    seed: int = SHUFFLE_SEED,
    n_shards: int = N_SHARDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a deterministic global shuffle rank and a
    round-robin shard: ``shuffle_rank`` is the document's position in
    ``ORDER BY md5(seed || '|' || id), id`` (the id tie-break makes the
    order total even under md5 collisions), ``shard = rank % n_shards``
    and ``pos_in_shard = rank // n_shards``. Round-robin keeps shards
    balanced to within one row — no shard skew regardless of corpus
    size. Output: ``(doc_id, shuffle_rank, shard, pos_in_shard)``.

    A writer partitions by ``shard`` and sorts by ``pos_in_shard``
    within each; both are pure functions of (seed, id), so a resumed or
    re-run export reproduces the identical layout.
    """
    from pyspark.sql import Window

    key = F.md5(
        F.concat_ws(
            "|", F.lit(str(int(seed))), F.col(id_col).cast("string")
        )
    )
    d = docs.select(
        F.col(id_col),
        key.alias("skey"),
    ).withColumn(
        "bkt",
        F.conv(F.substring("skey", 1, SHUFFLE_BUCKET_CHARS), 16, 10).cast(
            "bigint"
        ),
    )
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("bkt")
        .agg(F.count("*").alias("n"))
        .select(
            "bkt",
            F.coalesce(F.sum("n").over(wb), F.lit(0)).alias("off"),
        )
    )
    wd = (
        Window.partitionBy("bkt")
        .orderBy("skey", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rank = (F.col("off") + F.coalesce(F.count("*").over(wd), F.lit(0))).cast(
        "bigint"
    )
    ns = F.lit(int(n_shards)).cast("bigint")
    return (
        d.join(F.broadcast(offsets), "bkt")
        .select(F.col(id_col), rank.alias("shuffle_rank"))
        .select(
            id_col,
            "shuffle_rank",
            (F.col("shuffle_rank") % ns).alias("shard"),
            F.floor(F.col("shuffle_rank") / ns)
            .cast("bigint")
            .alias("pos_in_shard"),
        )
    )


#: curriculum knobs: seed for the within-tier shuffle; quality-band
#: edges (applied to quality_score's ROUNDED 6-dp score, so the tier
#: assignment is cross-engine exact). The fixture corpus scores in
#: [0.77, 0.96], so these edges split it ~25/50/25 at every scale; a
#: real run picks edges off its own score distribution.
CURRICULUM_SEED = 11
CURRICULUM_EDGES = (0.86, 0.80)


def curriculum_order(docs: DataFrame, seed: int = CURRICULUM_SEED) -> DataFrame:
    """Curriculum ordering for training: documents ranked tier-major —
    highest quality band first (tier 0/1/2 split at ``CURRICULUM_EDGES``
    over ``text.quality_score``'s rounded score) — with a deterministic
    seeded shuffle WITHIN each tier, so every epoch shard sees a random
    mix of its band rather than fixture order. ``curriculum_rank`` is
    the document's position in ``ORDER BY tier, md5(seed|doc_id),
    doc_id``; a training exporter feeds it straight into
    ``shuffle_export``-style sharding.

    Scale shape — same two-level rank as ``shuffle_export``: the
    within-bucket windows partition on (tier, 4-hex-char bucket)
    (≈ corpus/(3·65536) rows each), the offsets table is tiers×65536
    rows computed in one driver-scale window, and hex ordering equals
    key ordering, so the distributed rank equals the naive single
    global window the DuckDB twin runs. No global sort anywhere.
    """
    from pyspark.sql import Window

    from mapreducekmean_spark.operators.text import quality_score

    q = quality_score(docs).select("doc_id", "quality")
    hi, mid = CURRICULUM_EDGES
    tier = (
        F.when(F.col("quality") >= hi, F.lit(0))
        .when(F.col("quality") >= mid, F.lit(1))
        .otherwise(F.lit(2))
        .cast("bigint")
    )
    key = F.md5(
        F.concat_ws(
            "|", F.lit(str(int(seed))), F.col("doc_id").cast("string")
        )
    )
    d = q.select(
        "doc_id",
        tier.alias("tier"),
        key.alias("skey"),
    ).withColumn(
        "bkt",
        F.conv(F.substring("skey", 1, SHUFFLE_BUCKET_CHARS), 16, 10).cast(
            "bigint"
        ),
    )
    wb = Window.orderBy("tier", "bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        d.groupBy("tier", "bkt")
        .agg(F.count("*").alias("n"))
        .select(
            "tier",
            "bkt",
            F.coalesce(F.sum("n").over(wb), F.lit(0)).alias("off"),
        )
    )
    wd = (
        Window.partitionBy("tier", "bkt")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rank = (F.col("off") + F.coalesce(F.count("*").over(wd), F.lit(0))).cast(
        "bigint"
    )
    return (
        d.join(F.broadcast(offsets), ["tier", "bkt"])
        .select("doc_id", "tier", rank.alias("curriculum_rank"))
    )


def write_shards(
    docs: DataFrame,
    path: str,
    seed: int = SHUFFLE_SEED,
    n_shards: int = N_SHARDS,
    id_col: str = "doc_id",
) -> None:
    """Materialize the deterministic shuffle as training shard files:
    one parquet file per ``shard=`` directory, rows stored in
    ``pos_in_shard`` order, so a data loader streams each shard
    sequentially and the global visit order is exactly
    :func:`shuffle_export`'s rank order. Re-running the export rewrites
    byte-identical shards (rank is a pure function of (seed, id)).

    Physical shape: one hash exchange on ``shard`` (uniform by
    construction — round-robin assignment), an in-partition sort by
    position (no global sort), one file per shard via
    ``repartition(shard)``. At 100 TB you raise ``n_shards`` until a
    shard is a few GB; the plan is unchanged.
    """
    ranked = docs.join(
        shuffle_export(docs, seed=seed, n_shards=n_shards, id_col=id_col),
        id_col,
    )
    (
        ranked.repartition(int(n_shards), "shard")
        .sortWithinPartitions("shard", "pos_in_shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


#: token budget per source for the declared query (bites at every
#: fixture scale: the smallest source carries ~3.7k tokens at sf0.001);
#: the seed drives the md5 visit order.
TOKEN_BUDGET = 1000
BUDGET_SEED = 13


def budget_sample(
    docs: DataFrame,
    budget: int = TOKEN_BUDGET,
    seed: int = BUDGET_SEED,
) -> DataFrame:
    """Token-budget subsampling: per source, visit documents in
    deterministic ``md5(seed|doc_id)`` order and keep each document
    that STARTS while the source's token budget remains (the crossing
    document is kept whole — budgets are floors, a training mixture
    wants at-least-N tokens, and truncation is the packer's job).
    The "sample 1B tokens per source" step of building a training mix,
    reproducible by construction.

    Scale shape — per-source running token sums via the same two-level
    decomposition as ``curriculum_order``: within-bucket windows
    partition on (source, 4-hex md5 bucket), the per-(source, bucket)
    offsets table is driver-scale (sources × 65 536 worst case,
    ~sources × occupied buckets in practice) and broadcast back, and
    hex order equals key order so the distributed cumulative sum equals
    the naive single per-source window the DuckDB twin runs.

    Output: ``(doc_id, source, n_tok, cum_before, kept)``.
    """
    from pyspark.sql import Window

    from mapreducekmean_spark.operators.text import tokens

    key = F.md5(
        F.concat_ws(
            "|", F.lit(str(int(seed))), F.col("doc_id").cast("string")
        )
    )
    d = docs.select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("bigint").alias("n_tok"),
        key.alias("skey"),
    ).withColumn(
        "bkt",
        F.conv(F.substring("skey", 1, SHUFFLE_BUCKET_CHARS), 16, 10).cast(
            "bigint"
        ),
    )
    wb = Window.partitionBy("source").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        d.groupBy("source", "bkt")
        .agg(F.sum("n_tok").alias("t"))
        .select(
            "source",
            "bkt",
            F.coalesce(F.sum("t").over(wb), F.lit(0)).alias("off"),
        )
    )
    wd = (
        Window.partitionBy("source", "bkt")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = (
        F.col("off") + F.coalesce(F.sum("n_tok").over(wd), F.lit(0))
    ).cast("bigint")
    return (
        d.join(F.broadcast(offsets), ["source", "bkt"])
        .select(
            "doc_id",
            "source",
            "n_tok",
            cum_before.alias("cum_before"),
            (cum_before < F.lit(int(budget))).alias("kept"),
        )
    )
