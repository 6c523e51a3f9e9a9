"""Bucketed-table layout — the shuffle-elimination tool for repeated
big-big joins.

The reference engine re-shuffles its input for every job
(``/root/reference/src/KMeans.java:204-234`` submits a fresh MR job per
iteration; each pays a full sort/shuffle). Spark's answer for data that
is joined or aggregated on the same key again and again is to pay the
shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions rows
into a fixed number of files per partition and records the layout in the
catalog. Every later equi-join or aggregation on that key reads the
buckets co-located — the physical plan contains NO Exchange on either
side (see ``tests/test_plans.py::test_bucketed_join_no_exchange``).

At 100 TB this is the difference between re-shuffling the fact table per
query and never shuffling it at all: land `lineitem` bucketed by
``l_orderkey`` and every orders join, order-level rollup, and
dedup-by-key becomes a local merge. The bucket count is the knob that
bounds per-bucket file size (buckets × executors ≈ write parallelism;
pick so each bucket file stays in the 128 MB–1 GB band).

Caveats worth designing around (all standard, none local-mode
artifacts):

- Both join sides must be bucketed with the SAME key and bucket counts
  that divide each other, or Spark falls back to shuffling the
  non-conforming side.
- ``sortBy`` at write time additionally removes the per-task Sort from
  sort-merge joins.
- Bucketed tables go through ``saveAsTable`` (the layout lives in the
  catalog, not the parquet footer); plain ``.parquet(path)`` writes
  lose the metadata. An explicit ``path`` makes the table external, so
  the data outlives the catalog entry.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from mapreducekmean_spark.session import local_rows_df


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-within-bucket)
    parquet table registered in the session catalog.

    ``key`` may be one column or a list (composite bucket key). With
    ``path`` the table is external (data survives catalog drops) —
    required in tests, where the warehouse dir is process-global but
    fixtures are per-test tmpdirs.
    """
    keys = [key] if isinstance(key, str) else list(key)
    # Repartition on the bucket key with the bucket count BEFORE the
    # write: repartition's HashPartitioning and the bucket spec use the
    # same Murmur3 hash, so each write task holds exactly one bucket and
    # emits ONE file per bucket. That matters twice — small-file control
    # (a w-task write would otherwise emit up to w files *per bucket*),
    # and sort elision: Spark's scan only reports per-bucket sort order
    # when a bucket is a single file, so multi-file buckets silently
    # re-Sort on every sort-merge join, forfeiting half the layout's
    # benefit.
    w = (
        df.repartition(buckets, *keys)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, *keys)
    )
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the only path
    that preserves the bucket layout for join planning)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Write parquet laid out as ``col=value`` partition directories —
    the OTHER write-time layout tool next to :func:`write_bucketed`:
    bucketing kills the shuffle for key joins/aggs, partitioning kills
    the SCAN for selective filters. A predicate on a partition column
    never opens non-matching files at all (``PartitionFilters`` in the
    plan, checked by ``tests/test_plans.py``); at 100 TB a day's query
    over a date-partitioned events table reads one directory, not the
    table. Choose LOW-cardinality columns (date, region, source) —
    every distinct value is a directory, and millions of tiny
    partitions destroy the scan they were meant to save.
    """
    cols = (
        [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols)
    )
    df.write.mode(mode).partitionBy(*cols).parquet(path)


@contextmanager
def _dynamic_overwrite(spark: SparkSession):
    """Scope partitionOverwriteMode=dynamic to one write and restore
    the session's prior value afterwards — shared by every helper that
    replaces partitions in place."""
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def upsert_partitions(
    updates: DataFrame,
    path: str,
    partition_cols: str | list[str],
) -> None:
    """Partition-level upsert: replace exactly the ``col=value``
    directories present in ``updates``, leave every other partition's
    files untouched — Spark's dynamic partition overwrite
    (``partitionOverwriteMode=dynamic``), scoped to this one write.

    This is the idempotent-backfill primitive a 100 TB pipeline runs
    daily: recompute one day (or source, or shard), write it, and the
    job can crash-and-rerun without corrupting neighbors or needing a
    table-wide rewrite. Contrast with static overwrite mode (the
    default), where ``mode("overwrite")`` would DELETE the whole table
    first — the classic foot-gun this helper exists to scope away.
    Row-level merge semantics (update-else-insert by key) need a table
    format with a transaction log (Delta/Iceberg — out of scope here);
    partition granularity is what plain parquet layouts can do
    atomically-enough (per-partition directory swap).
    """
    with _dynamic_overwrite(updates.sparkSession):
        write_partitioned(updates, path, partition_cols, mode="overwrite")


def compact_bucketed(
    spark: SparkSession,
    table: str,
) -> dict[str, int]:
    """Small-file compaction for a BUCKETED external table: after N
    appends each bucket holds N files (``write_bucketed`` emits one
    file per bucket per write), and every bucket-pruned query pays N
    file opens where land time paid one. Compaction rewrites the table
    back to the land-time grain — exactly one file per bucket — under
    the SAME bucket/sort spec, so the Exchange-free join property and
    bucket pruning survive verbatim (pinned in tests/test_bucketing.py
    and tests/test_plans.py).

    The spec is INTROSPECTED from the catalog (bucket columns, count,
    sort columns, location) rather than passed in — a caller-supplied
    spec that disagreed with the landed one would silently re-layout
    the table, the exact failure a compactor must not have.

    Mechanics: the compacted copy is written beside the data as a
    temporary bucketed table (the only write path that records bucket
    metadata), then swapped in by directory rename and REFRESH. The
    swap is two renames; a crash between them leaves the old data
    complete at ``<path>.__old`` — recoverable by hand, never silently
    half-compacted. Do not run concurrently with appends to the same
    index (standard for maintenance windows on plain parquet layouts).

    Returns ``{"files_before": n, "files_after": m}``."""
    import os
    import urllib.parse

    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }
    loc = desc.get("Location", "")
    parsed = urllib.parse.urlparse(loc)
    if parsed.scheme not in ("", "file"):
        raise NotImplementedError(
            "compact_bucketed swaps directories on the local "
            "filesystem; remote URIs need the Hadoop FileSystem API"
        )
    path = parsed.path or loc
    buckets = int(desc["Num Buckets"])
    keys = [c.strip(" `") for c in desc["Bucket Columns"].strip("[]").split(",")]
    sort_raw = desc.get("Sort Columns", "[]").strip("[]")
    sort_cols = [c.strip(" `") for c in sort_raw.split(",") if c.strip(" `")]
    if sort_cols and sort_cols != keys:
        # write_bucketed always sorts by the bucket keys; rewriting a
        # table sorted by OTHER columns would silently change its
        # landed sort spec — the exact class of quiet re-layout this
        # compactor exists to prevent. (Every index this engine lands
        # sorts by its bucket key, so this gate is future-proofing.)
        raise NotImplementedError(
            f"compact_bucketed: table {table} sorts by {sort_cols} but "
            f"buckets by {keys}; rewriting would replace the sort spec "
            f"with the bucket keys. Extend write_bucketed with an "
            f"independent sort spec first."
        )

    def count_files(p: str) -> int:
        return sum(
            1
            for _root, _d, files in os.walk(p)
            for f in files
            if not f.startswith(("_", "."))
        )

    files_before = count_files(path)
    tmp_table = f"{table}__compacting"
    tmp_path = f"{path}.__compact"
    # a sibling table (not overwrite-in-place) keeps compaction a
    # streaming scan→write — overwriting the table being read is
    # refused by Spark, and a localCheckpoint workaround would hold
    # the whole table in executor memory.
    #
    # Force the BUCKET-AWARE scan (scoped): auto-bucketed-scan turns
    # it off for plans with no join/agg to exploit it, leaving one
    # partition PER FILE — the planned write then sees the table's
    # hash distribution as already satisfied, elides every exchange,
    # and faithfully rewrites N files per bucket back as N files per
    # bucket (observed: 16 in, 16 "compacted" out). With the bucketed
    # scan on, each bucket's files merge into ONE task, so compaction
    # is a shuffle-free local merge per bucket — the scan's own
    # partitioning satisfies the write's requirement, no Exchange
    # anywhere (this is also why appends must never run concurrently).
    abs_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    abs_old = spark.conf.get(abs_key)
    spark.conf.set(abs_key, "false")
    try:
        write_bucketed(
            spark.table(table),
            tmp_table,
            keys,
            buckets,
            tmp_path,
            sort=bool(sort_cols),
        )
    finally:
        spark.conf.set(abs_key, abs_old)
    spark.sql(f"DROP TABLE {tmp_table}")  # external: files stay
    old_path = f"{path}.__old"
    os.rename(path, old_path)
    os.rename(tmp_path, path)
    import shutil

    shutil.rmtree(old_path)
    spark.sql(f"REFRESH TABLE {table}")
    return {
        "files_before": files_before,
        "files_after": count_files(path),
    }


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: str | list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Small-file compaction for a partitioned parquet layout: rewrite
    every partition's data into ``ceil(bytes / target)`` files of
    roughly ``target_file_bytes`` each, via the same scoped dynamic
    partition overwrite as :func:`upsert_partitions`.

    Why it exists at 100 TB: streaming sinks, frequent upserts, and
    over-parallel writers leave thousands of KB-sized files per
    partition; every later scan then pays per-file open/footer costs
    that dwarf the data read (the classic "small files problem").
    Compaction is the maintenance half of the layout tools — bucketing
    and partitioning choose WHERE rows live, compaction keeps the file
    grain scan-friendly as the table churns.

    File counts are chosen PER PARTITION from that partition's own
    byte size (the directory walk already visits every file, so the
    per-partition totals are free): a skewed layout — one huge
    partition among many small ones — gets its big partition split
    into enough files while the small ones compact to exactly one,
    where a mean-based global choice would leave the big partition's
    files oversized and shred the small ones (ADVICE r5). Partition
    directory values are matched back to rows by TYPED null-safe
    equality (dir string cast to the column's read-back type —
    partition-type inference safe, Hive NULL sentinel handled), and
    an unmatched row aborts the rewrite rather than mis-sizing it.

    Returns ``{"files_before": n, "files_after": m}``. The rewrite
    reads committed data only and replaces partitions wholesale, so a
    crash mid-compaction leaves each partition either old or new —
    the same granularity guarantee upserts rely on.
    """
    import math
    import os
    import urllib.parse

    if "://" in path:
        # sizing below walks the LOCAL filesystem; on hdfs://s3a:// it
        # would silently see zero files and mis-plan every partition.
        # The remote implementation needs the Hadoop FileSystem API —
        # an honest gate beats wrong-but-quiet behavior.
        raise NotImplementedError(
            "compact_partitions sizes files via the local filesystem; "
            "remote URIs need the Hadoop FileSystem API"
        )
    cols = (
        [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols)
    )

    def walk_stats():
        """(n_files, total_bytes, {relative partition dir: bytes})."""
        n_files, n_bytes = 0, 0
        part_bytes: dict[str, int] = {}
        for root, _dirs, files in os.walk(path):
            rel = os.path.relpath(root, path)
            for f in files:
                if not f.startswith(("_", ".")):
                    sz = os.path.getsize(os.path.join(root, f))
                    n_files += 1
                    n_bytes += sz
                    if rel != ".":
                        part_bytes[rel] = part_bytes.get(rel, 0) + sz
        return n_files, n_bytes, part_bytes

    files_before, _bytes_total, part_bytes = walk_stats()
    # Read with partition-type INFERENCE OFF (scoped — the schema
    # resolves eagerly inside spark.read.parquet): inference would read
    # a zero-padded string partition ('hour=00') back as int 0, and the
    # rewrite would then land in a NEW 'hour=0' directory while dynamic
    # overwrite leaves the old 'hour=00' untouched — silent row
    # duplication (caught by the r6 review's encoding test). With
    # inference off, partition values round-trip VERBATIM: same
    # directory names out as in, and downstream readers (which apply
    # their own inference to the unchanged names) see identical types.
    inf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    inf_old = spark.conf.get(inf_key)
    spark.conf.set(inf_key, "false")
    try:
        df = spark.read.parquet(path)
    finally:
        spark.conf.set(inf_key, inf_old)
    from pyspark.sql import functions as F

    # Per-partition file counts from each partition's OWN bytes. The
    # dir name carries the partition values Hive-escaped; unescape them
    # (and map Hive's NULL sentinel back to a real NULL) to match rows.
    plans: list[tuple[tuple[str | None, ...], int]] = []
    for rel, nb in part_bytes.items():
        vals: list[str | None] = []
        for seg in rel.split(os.sep):
            if "=" not in seg:
                break
            raw = urllib.parse.unquote(seg.split("=", 1)[1])
            vals.append(
                None if raw == "__HIVE_DEFAULT_PARTITION__" else raw
            )
        if len(vals) == len(cols):
            plans.append(
                (tuple(vals), max(1, math.ceil(nb / target_file_bytes)))
            )

    key_cols = [F.col(c) for c in cols]
    if not plans or all(pp == 1 for _v, pp in plans):
        compacted = df.repartition(max(1, len(plans)), *key_cols)
    else:
        # hashing by the partition cols alone maps each partition VALUE
        # to one task — it cannot split a big partition into per_part
        # files. The salt must be DETERMINISTIC per row (a
        # monotonically_increasing_id salt re-evaluates differently on
        # stage retry, the SPARK-23207 row-loss class): hash every data
        # column, so a row always lands in the same bucket. Identical
        # rows co-locate, which only skews file sizes, never drops rows.
        # The MODULUS is this row's partition's own file count, joined
        # on via a broadcast of the (tiny) per-partition plan. The join
        # compares TYPED values — the dir string is cast to the column's
        # READ-BACK type, so Spark's partition-type inference cannot
        # desynchronize the match ('hour=00' read back as int 0 would
        # never equal the string '00'; cast('00' as int) = 0 does), and
        # eqNullSafe matches the Hive NULL partition (r6 review).
        dtypes = dict(df.dtypes)
        plan_df = F.broadcast(
            local_rows_df(spark, 
                [(*v, pp) for v, pp in plans],
                ", ".join(
                    [f"__pv_{c} string" for c in cols] + ["__pp int"]
                ),
            )
        )
        cond = None
        for c in cols:
            eq = F.col(c).eqNullSafe(
                F.col(f"__pv_{c}").cast(dtypes[c])
            )
            cond = eq if cond is None else (cond & eq)
        joined = df.join(plan_df, cond, "left")
        # honest gate, not a silent fallback: a row whose partition
        # value matched no walked directory means the match logic and
        # the layout disagree — mis-sizing quietly is the exact failure
        # the per-partition rewrite exists to prevent.
        n_unmatched = joined.filter(F.col("__pp").isNull()).count()
        if n_unmatched:
            raise ValueError(
                f"compact_partitions could not match {n_unmatched} rows "
                f"back to a walked partition directory of {path} — the "
                f"partition values and directory names disagree (exotic "
                f"value encoding?). Refusing to rewrite with a guessed "
                f"file count."
            )
        salt = F.pmod(
            F.hash(*[F.col(c) for c in df.columns]), F.col("__pp")
        )
        total_buckets = sum(pp for _v, pp in plans)
        compacted = (
            joined.withColumn("__salt", salt)
            .repartition(total_buckets, *(key_cols + [F.col("__salt")]))
            .drop("__pp", "__salt", *[f"__pv_{c}" for c in cols])
        )
    with _dynamic_overwrite(spark):
        compacted.write.mode("overwrite").partitionBy(*cols).parquet(path)
    files_after, _b, _p = walk_stats()
    return {"files_before": files_before, "files_after": files_after}


def purge_partition_keys(
    spark: SparkSession,
    path: str,
    part_col: str,
    id_col: str,
    ids: list,
    touched: list | None = None,
) -> dict[str, int]:
    """Targeted row DELETION from a ``col=value``-partitioned layout —
    the right-to-be-forgotten primitive at 100 TB: rewriting the whole
    table to drop a handful of keys is exactly the job nobody can
    afford, so the purge reads ONLY the partitions that hold the keys,
    anti-joins them out, and swaps those directories back
    (copy-on-write, the ``merge_into_snapshot`` economics applied to
    deletes). A partition the purge EMPTIES is removed explicitly —
    dynamic partition overwrite only replaces partitions present in
    the output (the ``merge_into_snapshot`` lesson).

    ``touched``: the partition values holding the ids, when the caller
    can DERIVE them (a key-bucketed snapshot computes ``kb`` from the
    key — zero scans). When None, one column-pruned scan of
    ``(id_col, part_col)`` finds them — bounded output (≤ len(ids)
    rows), and the scan reads only those two columns.

    Idempotent: purging already-absent ids touches the same partitions
    and rewrites them unchanged (or finds nothing to touch). Returns
    ``{"touched_partitions": …, "rows_deleted": …, "removed_dirs": …}``.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    ids = [i for i in ids]
    if not ids:
        return {"touched_partitions": 0, "rows_deleted": 0,
                "removed_dirs": 0}
    if touched is None:
        touched = sorted(
            r[0]
            for r in spark.read.parquet(path)
            .filter(F.col(id_col).isin(ids))
            .select(part_col)
            .distinct()
            .collect()
        )  # bounded: <= len(ids) driver rows
    touched = sorted(set(touched))
    if not touched:
        return {"touched_partitions": 0, "rows_deleted": 0,
                "removed_dirs": 0}
    held = spark.read.parquet(path).filter(
        F.col(part_col).isin(touched)
    )
    kept = (
        # NULL-id rows are kept explicitly: ``~isin`` evaluates to NULL
        # (not TRUE) for a NULL id, and a bare filter would silently
        # delete such rows from every touched partition.
        held.filter(
            (~F.col(id_col).isin(ids)) | F.col(id_col).isNull()
        )
        # sever lineage from the files the upsert replaces
        .localCheckpoint()
    )
    n_before = held.count()
    n_after = kept.count()
    upsert_partitions(kept, path, part_col)
    present = {
        r[0] for r in kept.select(part_col).distinct().collect()
    }
    removed = 0
    for v in touched:
        if v not in present:
            d = os.path.join(path, f"{part_col}={v}")
            existed = os.path.isdir(d)
            shutil.rmtree(d, ignore_errors=True)
            # count only directories that actually existed — a
            # caller-supplied ``touched`` value with no cell directory
            # must not inflate the removed count.
            if existed:
                removed += 1
    return {
        "touched_partitions": len(touched),
        "rows_deleted": int(n_before - n_after),
        "removed_dirs": removed,
    }
