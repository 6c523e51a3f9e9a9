"""Composed corpus-cleaning pipeline — the end-to-end shape an
LLM-pretraining data run executes, as ONE declared Spark plan.

The reference has no text processing (SURVEY.md §2.2); this is the
engine's north-star composition of its own oracle-checked stages, in the
order a production cleaning run applies them (each stage sees only the
survivors of the previous one — the staged semantics, not independent
per-stage flags):

1. **quality gate** (``operators.text.quality_score``): heuristic score
   ≥ 0.5 keeps the document;
2. **exact dedup among quality-passers** (``operators.dedup``
   normalized-md5 groups): the smallest doc_id per content group
   survives;
3. **MinHash near-dup among exact survivors**
   (``operators.dedup.minhash_verified_dedup``): LSH candidates → true
   shingle Jaccard on exactly those candidates → drop the higher id of
   every verified pair.

Output is audit-shaped: one row per INPUT document with its quality
score, per-stage survival flags, the final verdict, and the canonical
id it was folded into when near-dup-dropped. Everything is a
deterministic md5/count/ratio computation, so the whole composition has
an exact DuckDB oracle (contract.py::_CORPUS_CLEAN_SQL).

Scale shape: stage filters are narrow projections; the exact stage is
one window-min over uniform md5 keys; the near-dup stage inherits the
banded-LSH O(n) candidate generation. Composing stages *shrinks* the
expensive late stages (near-dup runs only on quality-passing exact
survivors) — the reason real pipelines stage this way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducekmean_spark.operators import dedup as dd
from mapreducekmean_spark.operators import text as tx

from mapreducekmean_spark.session import local_rows_df


def corpus_clean(
    docs: DataFrame, threshold: float = dd.VERIFY_THRESHOLD
) -> DataFrame:
    """Run the staged cleaning pipeline; return the per-document audit
    table (doc_id, quality, q_pass, exact_keep, kept, dup_of)."""
    # quality is FUSED into the scan-side projection (tx.with_quality:
    # one tokenize per row) and the stage-1 gate is a plain filter on
    # it — never `docs.join(quality_score(docs))`, the corpus×corpus
    # self-join shape the r11 verdict flagged (AQE broadcasts the
    # whole corpus's score projection at fixture scale; at 100 TB it
    # degrades to a corpus-volume sort-merge shuffle).
    dq = tx.with_quality(docs).withColumnRenamed("q_keep", "q_pass")
    stage1 = dq.filter("q_pass").select(*docs.columns)
    # materialize the quality+exact stage once: it is referenced from
    # several downstream subtrees (the near-dup stage's shingle table,
    # candidate join, and verdict join, plus the audit assembly), and
    # each reference would otherwise re-run the tokenize+window plan
    ek = stage1.withColumn(
        "content_hash", F.md5(dd.normalized_text())
    ).withColumn(
        "exact_keep",
        F.col("doc_id")
        == F.min("doc_id").over(Window.partitionBy("content_hash")),
    ).localCheckpoint()
    stage2 = ek.filter("exact_keep").select(*docs.columns)
    verdict = dd.minhash_verified_dedup(stage2, threshold).select(
        "doc_id", F.col("kept").alias("near_kept"), "dup_of"
    )
    return (
        dq.select("doc_id", "quality", "q_pass")
        .join(ek.select("doc_id", "exact_keep"), "doc_id", "left")
        .join(verdict, "doc_id", "left")
        .select(
            "doc_id",
            "quality",
            "q_pass",
            F.coalesce("exact_keep", F.lit(False)).alias("exact_keep"),
            F.coalesce("near_kept", F.lit(False)).alias("kept"),
            "dup_of",
        )
    )


def corpus_clean_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_clean(tx.documents(spark, sf_dir))


def prepare_training_data(
    docs: DataFrame,
    out_path: str,
    threshold: float = dd.VERIFY_THRESHOLD,
) -> dict[str, int]:
    """The WHOLE training-data run, composed end-to-end from the
    engine's tested stages and landed as a training-ready layout:

    1. staged cleaning (:func:`corpus_clean`) — quality gate → exact
       dedup → verified MinHash near-dup;
    2. deterministic mixture sampling (``text.dataset_mixture``) on the
       survivors — per-source keep rates, hash-coin reproducible;
    3. deterministic train/val/test assignment (``text.dataset_split``);
    4. concat-and-chunk placement (``text.pack_sequences``) within each
       split so every surviving document knows its training-sequence
       coordinates;
    5. partitioned parquet write (``split=...`` directories) via the
       layout writer — the grain downstream loaders prune on.

    Returns the stage funnel (counts per stage) for the run report.
    Every stage is deterministic, so re-running over the same corpus
    reproduces the same layout byte-for-byte file contents aside —
    the property a resumable 100 TB ingest needs. Stage order matters
    economically: cleaning shrinks the corpus BEFORE the per-token
    packing pass, and packing runs per (split, source) AFTER sampling
    so sequence ids are dense over what actually ships.
    """
    from mapreducekmean_spark.sources.bucketing import write_partitioned

    audit = corpus_clean(docs, threshold)
    # one materialization of the expensive cleaning subtree: everything
    # downstream (mixture filter, split column, three pack branches,
    # funnel counts) reads this checkpoint, not the LSH plan again
    kept = docs.join(
        audit.filter("kept").select("doc_id"), "doc_id"
    ).localCheckpoint()
    # mixture + split are scan-site EXPRESSIONS (text.mixture_kept_col /
    # text.split_col) — attached with filter/withColumn, never a
    # corpus-wide self-join on doc_id
    staged = (
        kept.filter(tx.mixture_kept_col())
        .withColumn("split", tx.split_col())
        .localCheckpoint()
    )
    packed = None
    for s in ("train", "val", "test"):
        part = tx.pack_sequences(
            staged.filter(F.col("split") == s)
        ).withColumn("split", F.lit(s))
        packed = part if packed is None else packed.unionByName(part)
    out = staged.join(
        packed.select(
            "doc_id", "start_tok", "first_seq", "last_seq", "n_seqs",
            "seq_offset",
        ),
        "doc_id",
    )
    write_partitioned(out, out_path, "split")
    funnel = {
        "input_docs": docs.count(),
        "after_clean": kept.count(),
        "after_mixture": staged.count(),
        "written": out.count(),
    }
    return funnel


def prepare_training_data_incremental(
    spark: SparkSession,
    batch: DataFrame,
    name: str,
    index_path: str,
    out_path: str,
    threshold: float = dd.VERIFY_THRESHOLD,
) -> dict[str, int]:
    """:func:`prepare_training_data` for a CONTINUAL corpus: process one
    arriving batch against the landed state instead of re-running the
    whole history — the refresh shape a production pretraining set
    actually follows (new crawl snapshots month over month).

    Landed state (under ``index_path``, created on the first batch):

    - ``{name}_hashes`` — DISTINCT content hashes of every quality-
      passing doc seen so far, bucketed by hash: the cross-batch half
      of the exact-dedup stage (a batch doc whose hash is landed lost
      to a smaller id by the monotone-id precondition — drop);
    - the ``incremental.land_dedup_index`` band/gram/size tables over
      the exact SURVIVORS seen so far: the cross-batch half of the
      near-dup stage (``dedup_delta``);
    - ``packstate`` — per (split, source) token totals: each batch's
      ``pack_sequences`` runs batch-locally, then shifts ``start_tok``
      by the landed total and re-derives the cut coordinates through
      the SHARED ``text.seq_coords`` (one copy of the arithmetic), so
      sequence ids continue the landed stream exactly.

    EQUIVALENCE (pytest-pinned): with append-only monotone doc_ids,
    running batches b1..bn through this function writes, for every
    document, the IDENTICAL rows ``prepare_training_data(b1 ∪ ... ∪
    bn)`` writes — same survivors (a cross-batch exact duplicate drops
    here at the hash check; sub-gram docs too short to shingle are
    caught by the same hash check, not just jaccard), same splits,
    same sequence coordinates — plus one provenance column,
    ``ingest_batch`` (the batch's max doc_id), which is also the output
    partition key the replay upsert replaces. Stage economics:
    per-batch cost scales with the batch and its candidate fan-out,
    never the corpus.

    Crash/replay semantics (ADVICE r6): every step is individually
    idempotent, so a crashed batch can simply be re-run —

    - a COMPLETED batch replays as a no-op (the per-batch done marker,
      written last, holds the funnel and is returned as-is);
    - the landed hash set stores ``(content_hash, doc_id)`` and the
      cross-batch filter only trusts rows with ``doc_id <`` the batch
      minimum, so hashes a half-done prior attempt landed cannot make
      the rerun drop the batch as duplicates of itself;
    - the near-dup append is guarded by
      ``incremental.batch_already_indexed`` (and ``dedup_delta``
      tolerates re-scoring the batch-is-the-landed-tail state);
    - pack state is VERSIONED per batch (``packstate/asof=<id>``), the
      base always read from a COMPLETE version strictly below this
      batch — a crash mid-write corrupts only the version being
      written, which the rerun rewrites, never the history (the old
      in-place overwrite destroyed all totals on a mid-write crash);
    - output rows land by partition UPSERT on (split, ingest_batch) —
      a rerun replaces its own partitions instead of double-appending.

    Returns the batch funnel."""
    import json
    import os

    from mapreducekmean_spark.operators import incremental as inc
    from mapreducekmean_spark.sources.bucketing import (
        read_bucketed,
        upsert_partitions,
        write_bucketed,
    )

    id_row = batch.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    ).collect()[0]
    if id_row["mx"] is None:
        return {
            "input_docs": 0, "after_quality": 0, "after_exact": 0,
            "after_neardup": 0, "written": 0,
        }
    batch_min, batch_id = int(id_row["mn"]), int(id_row["mx"])
    marker_dir = f"{index_path}/_prep_batches"
    done_marker = f"{marker_dir}/{batch_id}.json"
    if os.path.exists(done_marker):
        with open(done_marker) as f:
            return json.load(f)  # replay of a completed batch: no-op

    # plain filter on the fused quality flag (one tokenize per row,
    # tx.with_quality) — not a self-join against quality_score(batch)
    # (the r11-verdict scale trap)
    stage1 = tx.with_quality(batch).filter("q_keep").select(*batch.columns)
    hashed = stage1.withColumn(
        "content_hash", F.md5(dd.normalized_text())
    ).localCheckpoint()

    ek = hashed.withColumn(
        "exact_keep",
        F.col("doc_id")
        == F.min("doc_id").over(Window.partitionBy("content_hash")),
    )
    # landed-state discovery from the FILESYSTEM, never the session
    # catalog: a new session's (in-memory) catalog is empty while the
    # landed files persist — trusting the catalog would silently
    # OVERWRITE the hash set and signature index (losing every
    # cross-batch duplicate) while packstate, being file-checked,
    # happily continued the offsets (r6 review). Existing files are
    # re-attached instead.
    have_hashes = os.path.exists(f"{index_path}/hashes")
    if have_hashes:
        if not spark.catalog.tableExists(f"{name}_hashes"):
            spark.sql(
                f"CREATE TABLE {name}_hashes "
                f"(content_hash STRING, doc_id BIGINT) "
                f"USING parquet CLUSTERED BY (content_hash) "
                f"SORTED BY (content_hash) INTO {inc.INDEX_BUCKETS} "
                f"BUCKETS LOCATION '{index_path}/hashes'"
            )
        # only rows landed by EARLIER batches count: a crashed prior
        # attempt of THIS batch landed its hashes with doc_id >=
        # batch_min, and trusting those would drop the whole rerun as
        # duplicates of itself (monotone ids make provenance a filter).
        # A NULL doc_id (a hash table written before the provenance
        # column existed) must count as landed-earlier, not silently
        # drop out of the filter and wave its duplicates through.
        landed = read_bucketed(spark, f"{name}_hashes").filter(
            F.col("doc_id").isNull() | (F.col("doc_id") < batch_min)
        )
        ek = ek.join(
            landed.select("content_hash").withColumn("_seen", F.lit(True)),
            "content_hash",
            "left",
        ).withColumn(
            "exact_keep", F.col("exact_keep") & F.col("_seen").isNull()
        )
    stage2 = ek.filter("exact_keep").select(*batch.columns).localCheckpoint()

    have_neardup = os.path.exists(f"{index_path}/neardup/sizes")
    if have_neardup:
        inc.attach_dedup_index(spark, name, f"{index_path}/neardup")
        sh2 = dd.gram_rows(stage2).distinct().localCheckpoint()
        verdict = inc.dedup_delta(spark, stage2, name, threshold, shingled=sh2)
    else:
        sh2 = None
        verdict = dd.minhash_verified_dedup(stage2, threshold)
    # checkpoint: verdict is lazy over the landed index, and the state
    # upserts BELOW change that index — an unmaterialized `kept` would
    # re-evaluate post-append and see the batch as duplicates of itself
    # (caught by the funnel test).
    kept = stage2.join(
        verdict.filter("kept").select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint()

    staged = (
        kept.filter(tx.mixture_kept_col())
        .withColumn("split", tx.split_col())
        .localCheckpoint()
    )

    state_path = f"{index_path}/packstate"
    base_version = _latest_packstate_version(state_path, below=batch_id)
    if base_version is not None:
        state = spark.read.parquet(f"{state_path}/asof={base_version}")
    else:
        state = local_rows_df(spark, 
            [], "split string, source string, tok_total bigint"
        )
    packed = None
    for s in ("train", "val", "test"):
        local = tx.pack_sequences(staged.filter(F.col("split") == s))
        base = state.filter(F.col("split") == s).select(
            "source", F.col("tok_total").alias("_base")
        )
        shifted = (
            local.join(F.broadcast(base), "source", "left")
            .withColumn(
                "start_tok",
                F.col("start_tok") + F.coalesce("_base", F.lit(0)),
            )
            .select("doc_id", "source", "n_tok", "start_tok")
        )
        part = tx.seq_coords(shifted).withColumn("split", F.lit(s))
        packed = part if packed is None else packed.unionByName(part)
    packed = packed.localCheckpoint()

    out = staged.join(
        packed.select(
            "doc_id", "start_tok", "first_seq", "last_seq", "n_seqs",
            "seq_offset",
        ),
        "doc_id",
    ).withColumn("ingest_batch", F.lit(batch_id))
    # partition upsert on (split, ingest_batch): a rerun REPLACES its
    # own partitions instead of double-appending rows (ADVICE r6)
    upsert_partitions(out, out_path, ["split", "ingest_batch"])
    # funnel counts BEFORE the upserts, from materialized frames only —
    # same reason as the kept checkpoint above.
    funnel = {
        "input_docs": batch.count(),
        "after_quality": hashed.count(),
        "after_exact": stage2.count(),
        "after_neardup": kept.count(),
        "written": out.count(),
    }

    # ---- state upserts (each idempotent under rerun — see docstring)
    new_hashes = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("doc_id")
    )
    if have_hashes:
        # append only the genuinely new hashes, keeping the table a set
        # (a rerun finds its prior attempt's rows and appends nothing)
        new_hashes = new_hashes.join(
            read_bucketed(spark, f"{name}_hashes").select("content_hash"),
            "content_hash",
            "left_anti",
        )
        write_bucketed(
            new_hashes, f"{name}_hashes", "content_hash",
            inc.INDEX_BUCKETS, mode="append",
        )
    else:
        write_bucketed(
            new_hashes, f"{name}_hashes", "content_hash",
            inc.INDEX_BUCKETS, f"{index_path}/hashes",
        )
    if have_neardup:
        if not inc.batch_already_indexed(spark, stage2, name, shingled=sh2):
            inc.append_to_index(spark, stage2, name, shingled=sh2)
    else:
        inc.land_dedup_index(spark, stage2, name, f"{index_path}/neardup")
    add = packed.groupBy("split", "source").agg(
        F.sum("n_tok").alias("add_tok")
    )
    new_state = state.join(add, ["split", "source"], "full").select(
        "split",
        "source",
        (
            F.coalesce("tok_total", F.lit(0))
            + F.coalesce("add_tok", F.lit(0))
        ).alias("tok_total"),
    )
    # versioned, never in-place: asof=<batch> is a fresh directory, so
    # a crash mid-write leaves every earlier version intact and the
    # rerun overwrites only this one
    new_state.write.mode("overwrite").parquet(
        f"{state_path}/asof={batch_id}"
    )

    os.makedirs(marker_dir, exist_ok=True)
    tmp = f"{done_marker}.tmp"
    with open(tmp, "w") as f:
        json.dump(funnel, f)
    os.replace(tmp, done_marker)
    return funnel


def _latest_packstate_version(state_path: str, below: int) -> int | None:
    """Largest COMPLETE ``asof=<id>`` version strictly below ``below``
    (a prior attempt of batch ``below`` may have written — or half-
    written — its own version; the rerun's base must predate it).
    Completeness = Spark's _SUCCESS commit marker."""
    import os

    if not os.path.isdir(state_path):
        return None
    versions = []
    flat_files = False
    for d in os.listdir(state_path):
        if not d.startswith("asof="):
            if d.endswith(".parquet"):
                flat_files = True
            continue
        try:
            v = int(d.split("=", 1)[1])
        except ValueError:
            continue
        if v < below and os.path.exists(
            os.path.join(state_path, d, "_SUCCESS")
        ):
            versions.append(v)
    if flat_files and not versions:
        # a packstate written by the pre-versioning layout (flat
        # parquet, overwritten in place): silently treating it as
        # empty would restart every sequence offset at 0 and collide
        # with landed output — refuse loudly instead
        raise ValueError(
            f"packstate at {state_path} uses the old flat layout; "
            f"move it to {state_path}/asof=<last-batch-max-doc-id>/ "
            f"(with a _SUCCESS marker) before running new batches"
        )
    return max(versions) if versions else None
