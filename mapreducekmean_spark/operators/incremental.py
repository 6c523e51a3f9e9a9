"""Incremental (delta) dedup against a LANDED signature index.

Every dedup path in ``operators/dedup.py`` scores a corpus against
itself. A production ingest doesn't: it deduplicates each NEW batch
against the signature index of everything already landed, then upserts
the batch into that index — re-signaturing 100 TB of history per
arriving batch would dwarf the batch itself. The reference has no
incremental anything (its one job re-reads the whole input per
iteration, ``/root/reference/src/KMeans.java:54-58``); this module is
the engine-side composition VERDICT r5 asked for ("What's missing #4"),
built from pieces that already exist: the materializable MinHash
signature/band stage (``dedup.minhash_bands``), the distinct-gram
verification table (``dedup.gram_rows``), the shared counting-join
scorer (``dedup.score_candidate_pairs`` — ONE copy of the jaccard
arithmetic, so delta and full-corpus verdicts cannot drift), and the
bucketed layout (``sources/bucketing.py``).

The landed index is three bucketed tables (one logical index, named by
prefix):

- ``{name}_bands``  (doc_id, band, bucket), bucketed by (band, bucket) —
  the LSH candidate join key, so the candidate join against a new batch
  is Exchange-free on the index side.
- ``{name}_grams``  (doc_id, sh) distinct grams, bucketed by doc_id —
  the true-Jaccard counting join (keyed doc_a = landed id) is
  Exchange-free on the index side.
- ``{name}_sizes``  (doc_id, n_sh), bucketed by doc_id — per-doc gram
  counts for the Jaccard denominator, with one row for EVERY landed
  doc (n_sh = 0 for sub-gram docs): the sizes table doubles as the
  landed-id roster the monotone-id guard reads, and a roster that
  silently omitted short docs would let an id collision through
  (r6 review).

Session lifecycle: ``land_dedup_index`` registers the tables in the
CURRENT session's catalog; a NEW session (restart, another driver) must
call ``attach_dedup_index(spark, name, path)`` first — and
``append_to_index`` REFUSES when the tables are absent rather than
letting ``saveAsTable`` silently create fresh empty managed tables that
would shadow the landed corpus (r6 review).

Equivalence contract (pytest-pinned in tests/test_incremental.py):
``land(batch1); delta(batch2)`` produces, for batch2's documents, the
EXACT verdict rows ``minhash_verified_dedup(batch1 ∪ batch2)`` produces
for them — bit-identical jaccard arithmetic, same keep-lowest policy.
Two properties make that exact rather than approximate:

1. The index holds ALL landed docs, kept and dropped alike. One-pass
   pairwise semantics drop doc c for the pair (b, c) even when b was
   itself dropped earlier — pruning dropped docs from the index would
   silently change later verdicts.
2. Batch ids are append-only monotone: every new doc_id must exceed
   every landed doc_id (the realistic ingest property — ids are
   assigned at arrival). The keep-lowest policy orients every cross
   pair as (landed = doc_a) < (new = doc_b); an id collision or
   out-of-order batch would flip orientations mid-index, so
   ``dedup_delta`` REFUSES (two 1-row aggregates, same actionable-guard
   style as the semantic-dedup cell bound) instead of guessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducekmean_spark.operators.dedup import (
    VERIFY_THRESHOLD,
    gram_rows,
    minhash_bands,
    minhash_candidate_pairs,
    score_candidate_pairs,
    verified_pairs,
)
from mapreducekmean_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)

#: Bucket count for all three index tables (one spec so appends always
#: match the landed layout).
INDEX_BUCKETS = 8

#: (suffix, schema DDL, bucket key) per index table — the single source
#: for land/attach/append so the three can never disagree on layout.
_INDEX_TABLES = (
    (
        "bands",
        "doc_id BIGINT, band BIGINT, bucket STRING",
        ["band", "bucket"],
    ),
    ("grams", "doc_id BIGINT, sh STRING", ["doc_id"]),
    ("sizes", "doc_id BIGINT, n_sh BIGINT", ["doc_id"]),
)


def _index_parts(
    docs: DataFrame, shingled: DataFrame | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bands, distinct grams, sizes) for one batch — the three row sets
    every index write/append lands. ``sizes`` carries EVERY doc of the
    batch (0 for docs too short to gram), not just gram-bearing ones:
    it is the id roster the monotone guard trusts."""
    sh = (
        gram_rows(docs).distinct() if shingled is None else shingled
    ).localCheckpoint()
    bands = minhash_bands(docs, shingled=sh)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sizes = (
        docs.select("doc_id")
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_sh", F.lit(0)).cast("bigint").alias("n_sh"),
        )
    )
    return bands, sh, sizes


def land_dedup_index(
    spark: SparkSession,
    docs: DataFrame,
    name: str,
    path: str,
    buckets: int = INDEX_BUCKETS,
) -> None:
    """Create the dedup index of an initial corpus: signature/gram/size
    tables bucketed on their respective join keys (module docstring).
    ``path`` is the external-table root; tables land at
    ``{path}/bands|grams|sizes``."""
    bands, sh, sizes = _index_parts(docs)
    parts = {"bands": bands, "grams": sh, "sizes": sizes}
    for suffix, _schema, key in _INDEX_TABLES:
        write_bucketed(
            parts[suffix],
            f"{name}_{suffix}",
            key,
            buckets,
            f"{path}/{suffix}",
        )


def attach_dedup_index(
    spark: SparkSession,
    name: str,
    path: str,
    buckets: int = INDEX_BUCKETS,
) -> None:
    """Re-register a landed index's external tables in THIS session's
    catalog (after a restart or from another driver). The DDL repeats
    the exact bucket spec ``land_dedup_index`` wrote with — Spark only
    trusts a table's bucket layout through its catalog entry, so a
    plain ``spark.read.parquet`` over the same files would silently
    forfeit the Exchange-free joins. Idempotent: existing registrations
    are left untouched."""
    for suffix, schema, key in _INDEX_TABLES:
        table = f"{name}_{suffix}"
        if spark.catalog.tableExists(table):
            continue
        cluster = ", ".join(key)
        spark.sql(
            f"CREATE TABLE {table} ({schema}) USING parquet "
            f"CLUSTERED BY ({cluster}) SORTED BY ({cluster}) "
            f"INTO {buckets} BUCKETS "
            f"LOCATION '{path}/{suffix}'"
        )


def _require_index(spark: SparkSession, name: str, op: str) -> None:
    missing = [
        f"{name}_{suffix}"
        for suffix, _schema, _key in _INDEX_TABLES
        if not spark.catalog.tableExists(f"{name}_{suffix}")
    ]
    if missing:
        raise ValueError(
            f"{op}: index tables {missing} are not registered in this "
            f"session's catalog. Run land_dedup_index (new index) or "
            f"attach_dedup_index (existing files, e.g. after a session "
            f"restart) first — proceeding would let saveAsTable create "
            f"fresh empty tables that shadow the landed corpus."
        )


def append_to_index(
    spark: SparkSession,
    new_docs: DataFrame,
    name: str,
    buckets: int = INDEX_BUCKETS,
    shingled: DataFrame | None = None,
) -> None:
    """Upsert a (already delta-scored) batch into the landed index.
    ALL batch docs are appended, dropped ones included — a dropped doc
    still canonicalizes future duplicates (module docstring #1).
    Appends reuse each table's landed path and bucket spec, so the
    layout survives and future delta joins stay Exchange-free. Refuses
    when the index is not in the catalog (attach first; a bare append
    would create empty shadow tables). ``shingled``: the batch's
    already-checkpointed distinct-gram table (the ``dedup_delta`` call
    that scored this batch built one — pass it through so the hot
    ingest path tokenizes once, not twice; r6 review)."""
    _require_index(spark, name, "append_to_index")
    bands, sh, sizes = _index_parts(new_docs, shingled=shingled)
    parts = {"bands": bands, "grams": sh, "sizes": sizes}
    for suffix, _schema, key in _INDEX_TABLES:
        write_bucketed(
            parts[suffix],
            f"{name}_{suffix}",
            key,
            buckets,
            mode="append",
        )


def batch_already_indexed(
    spark: SparkSession,
    new_docs: DataFrame,
    name: str,
    shingled: DataFrame | None = None,
) -> bool:
    """True iff this exact batch is ALREADY the tail of the landed
    index — the state a crash between ``append_to_index`` and a
    caller's progress marker leaves behind. Ingest drivers use this to
    make the index append replay-safe: skip the append instead of
    double-landing the batch (and ``dedup_delta`` tolerates re-scoring
    exactly this state).

    Checked by ID and by CONTENT: every batch id in the landed roster,
    every non-batch landed id below the batch minimum, AND the batch's
    per-doc gram counts and band signatures equal to the landed rows
    for those ids. Ids alone would mistake a DIFFERENT document
    re-using the tail's id for a replay and silently wave the id
    collision through the monotone guard (r6 review: caught by the
    short-doc roster test). All index-side joins are keyed on the
    tables' bucket keys; the fast path (no id overlap) costs one
    batch-sized semi join."""
    _require_index(spark, name, "batch_already_indexed")
    idx_sizes = read_bucketed(spark, f"{name}_sizes")
    ids = new_docs.select("doc_id").localCheckpoint()
    n_batch = ids.count()
    if n_batch == 0:
        return False
    present = idx_sizes.join(ids, "doc_id", "left_semi").count()
    if present != n_batch:
        return False
    max_other = (
        idx_sizes.join(ids, "doc_id", "left_anti")
        .agg(F.max("doc_id"))
        .collect()[0][0]
    )
    min_new = ids.agg(F.min("doc_id")).collect()[0][0]
    if max_other is not None and max_other >= min_new:
        return False
    # content check: same gram counts per id, and the batch's band
    # signatures a subset of the landed ones (identical MinHash rows
    # ⇒ same shingle sets for dedup purposes).
    bands, _sh, sizes = _index_parts(new_docs, shingled=shingled)
    landed_sizes = idx_sizes.join(ids, "doc_id", "left_semi").select(
        "doc_id", F.col("n_sh").alias("landed_n_sh")
    )
    mismatched = (
        sizes.join(landed_sizes, "doc_id")
        .filter(F.col("n_sh") != F.col("landed_n_sh"))
        .count()
    )
    if mismatched:
        return False
    idx_bands = read_bucketed(spark, f"{name}_bands")
    missing = bands.join(
        idx_bands, ["doc_id", "band", "bucket"], "left_anti"
    ).count()
    return missing == 0


def _cross_candidates(
    idx_bands: DataFrame, new_bands: DataFrame
) -> DataFrame:
    """(doc_a = landed id, doc_b = new id) for every shared (band,
    bucket) — the one band-join the delta paths share. The doc_a <
    doc_b filter is a tautology under the monotone-id precondition but
    load-bearing defense-in-depth: re-scoring a batch whose rows were
    already appended to the index would otherwise pair every doc with
    ITSELF (jaccard 1.0) and mark the whole batch duplicate."""
    return (
        idx_bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        .join(
            new_bands.select(
                F.col("doc_id").alias("doc_b"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def delta_candidate_pairs(
    spark: SparkSession, new_docs: DataFrame, name: str
) -> DataFrame:
    """LSH candidate pairs of a new batch against the landed index:
    (doc_a = landed id, doc_b = new id) for every shared (band, bucket),
    plus the batch-internal pairs. The index side of the band join reads
    its bucketed layout — zero Exchange above the index scan (pinned in
    tests/test_incremental.py)."""
    _require_index(spark, name, "delta_candidate_pairs")
    sh = gram_rows(new_docs).distinct().localCheckpoint()
    new_bands = minhash_bands(new_docs, shingled=sh).localCheckpoint()
    idx_bands = read_bucketed(spark, f"{name}_bands")
    cross = _cross_candidates(idx_bands, new_bands)
    within = minhash_candidate_pairs(new_docs, bands=new_bands)
    return cross.unionByName(within)


def dedup_delta(
    spark: SparkSession,
    new_docs: DataFrame,
    name: str,
    threshold: float = VERIFY_THRESHOLD,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Per-document dedup verdict for a NEW batch against the landed
    index — ``(doc_id, kept, dup_of)`` exactly as
    ``minhash_verified_dedup`` would report these docs had the whole
    corpus been scored at once (equivalence contract in the module
    docstring; pinned by tests/test_incremental.py).

    Shape: band join → cross candidates (Exchange-free on the index
    side) → true-Jaccard counting join against the landed gram table
    (keyed on the landed id — again the bucket key) → threshold →
    union with the batch-internal verified pairs → keep-lowest verdict.
    The batch's gram table and band table are each built ONCE and feed
    every stage (cross candidates, cross scoring, within-batch pairs) —
    pass ``shingled`` (an already-checkpointed distinct-gram table) to
    extend that sharing across the caller's other stages too. Work
    scales with the BATCH and its candidate fan-out, never with the
    landed corpus size.
    """
    if threshold <= 0:
        raise ValueError(
            "dedup_delta requires threshold > 0 (the counting join "
            "never materializes zero-intersection pairs, same contract "
            "as verified_pairs)"
        )
    _require_index(spark, name, "dedup_delta")
    idx_sizes = read_bucketed(spark, f"{name}_sizes")
    # the sizes table is the full landed-id roster (one row per doc,
    # short docs included), so this max is the true landed ceiling.
    # one job for both 1-row bounds (a crossJoin of two single-row
    # aggregates), not two sequential collects
    (bounds_row,) = (
        idx_sizes.agg(F.max("doc_id").alias("_mx"))
        .crossJoin(new_docs.agg(F.min("doc_id").alias("_mn")))
        .collect()
    )
    max_landed, min_new = bounds_row["_mx"], bounds_row["_mn"]
    if max_landed is not None and min_new is not None and (
        min_new <= max_landed
    ):
        # ONE tolerated overlap: the batch IS already the landed tail —
        # the state a crash between a caller's append_to_index and its
        # progress marker leaves. Re-scoring it yields the identical
        # verdict (_cross_candidates' doc_a < doc_b filter strips the
        # batch's self-pairs; its cross pairs against itself duplicate
        # the within-batch pairs, and the keep-lowest min is
        # idempotent), so replays can converge instead of wedging the
        # stream on this guard (r6 review).
        if not batch_already_indexed(spark, new_docs, name, shingled):
            raise ValueError(
                f"dedup_delta requires append-only monotone ids: new "
                f"batch min doc_id {min_new} <= landed max "
                f"{max_landed}, and the batch is not an exact replay "
                f"of the landed tail. The keep-lowest policy orients "
                f"every cross pair as landed < new; overlapping id "
                f"ranges would flip orientations mid-index. Re-id the "
                f"batch above the landed ceiling before landing it."
            )

    sh = (
        gram_rows(new_docs).distinct().localCheckpoint()
        if shingled is None
        else shingled
    )
    new_bands = minhash_bands(new_docs, shingled=sh).localCheckpoint()
    idx_bands = read_bucketed(spark, f"{name}_bands")
    idx_grams = read_bucketed(spark, f"{name}_grams")

    cross_cand = _cross_candidates(idx_bands, new_bands)
    new_sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    cross_scored = score_candidate_pairs(
        cross_cand,
        idx_grams,
        idx_sizes,
        threshold,
        sh_b=sh,
        sizes_b=new_sizes,
    )
    within = verified_pairs(
        new_docs, threshold, shingled=sh, bands=new_bands
    )
    dup_of = (
        cross_scored.select("doc_a", "doc_b")
        .unionByName(within.select("doc_a", "doc_b"))
        .groupBy("doc_b")
        .agg(F.min("doc_a").alias("dup_of"))
        .withColumnRenamed("doc_b", "doc_id")
    )
    return (
        new_docs.select("doc_id")
        .join(dup_of, "doc_id", "left")
        .select("doc_id", F.col("dup_of").isNull().alias("kept"), "dup_of")
    )


def compact_dedup_index(spark: SparkSession, name: str) -> dict[str, dict]:
    """Small-file maintenance for the landed dedup index: every
    ``append_to_index`` adds one file per bucket per table, so after N
    batches each delta join opens N files per bucket. Routes all three
    tables through ``sources.compact_bucketed`` — the bucket/sort spec
    is introspected from the catalog, so the (band, bucket) composite
    key and the doc_id keys each rewrite under their own landed
    layout and the Exchange-free delta joins survive verbatim (pinned
    in tests/test_incremental.py). Returns per-table file counts."""
    from mapreducekmean_spark.sources.bucketing import compact_bucketed

    _require_index(spark, name, "compact_dedup_index")
    return {
        suffix: compact_bucketed(spark, f"{name}_{suffix}")
        for suffix, _schema, _key in _INDEX_TABLES
    }
