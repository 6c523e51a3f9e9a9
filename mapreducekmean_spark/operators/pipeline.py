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


def corpus_clean(
    docs: DataFrame, threshold: float = dd.VERIFY_THRESHOLD
) -> DataFrame:
    """Run the staged cleaning pipeline; return the per-document audit
    table (doc_id, quality, q_pass, exact_keep, kept, dup_of)."""
    q = tx.quality_score(docs).select(
        "doc_id", "quality", F.col("keep").alias("q_pass")
    )
    stage1 = docs.join(q.filter("q_pass").select("doc_id"), "doc_id")
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
        docs.select("doc_id")
        .join(q, "doc_id")
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
