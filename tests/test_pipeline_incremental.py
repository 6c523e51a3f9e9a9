"""Continual training-data preparation: batch-by-batch runs against the
landed state must write exactly what the one-shot composed run writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducekmean_spark.operators.pipeline import (
    prepare_training_data,
    prepare_training_data_incremental,
)
from mapreducekmean_spark.operators.text import documents


def _rows(spark, path):
    df = spark.read.parquet(path)
    # the incremental layout carries one extra column the one-shot run
    # doesn't: ingest_batch, the replay-upsert partition key — the
    # equivalence contract is over every DATA column
    cols = sorted(c for c in df.columns if c != "ingest_batch")
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def test_incremental_batches_write_what_the_full_run_writes(
    spark, sf_oracle, tmp_path
):
    """Two monotone-id batches through the incremental pipeline ==
    the one-shot prepare_training_data over their union: same
    survivors, same splits, same CONTINUED sequence coordinates."""
    docs = documents(spark, sf_oracle)
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    b1 = docs.filter(F.col("doc_id") < cut)
    b2 = docs.filter(F.col("doc_id") >= cut)

    full_out = str(tmp_path / "full")
    prepare_training_data(docs, full_out)

    inc_out = str(tmp_path / "inc")
    idx = str(tmp_path / "idx")
    f1 = prepare_training_data_incremental(
        spark, b1, "t_ptd_a", idx, inc_out
    )
    f2 = prepare_training_data_incremental(
        spark, b2, "t_ptd_a", idx, inc_out
    )
    assert f1["written"] and f2["written"]
    assert _rows(spark, inc_out) == _rows(spark, full_out)


def test_incremental_drops_cross_batch_exact_and_near_dups(
    spark, tmp_path
):
    """A batch-2 document that exactly copies a batch-1 document (here:
    including one too SHORT to shingle — only the hash check can catch
    it) or near-copies one must be dropped against the landed state;
    novel documents survive."""
    base = (
        "the quick brown fox jumps over the lazy dog while the "
        "cheerful miller grinds wheat beside the quiet river bank "
        "every morning before the village wakes"
    )
    novel = (
        "completely different subject matter discussing distributed "
        "query engines columnar storage formats and the economics of "
        "shuffle elimination at petabyte scale for training corpora"
    )
    fresh = (
        "fresh unrelated words about gardens orchards beehives and "
        "the patient craft of pruning apple trees through late "
        "winter frost"
    )

    def frame(rows):
        # fixture-shaped: quality_score reads a materialized n_chars
        return spark.createDataFrame(
            [(i, t, "en", src, len(t)) for i, t, src in rows],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        )

    b1 = frame([(1, base, "src3"), (2, novel, "src3")])
    b2 = frame(
        [
            (10, base, "src3"),                      # exact dup of 1
            (11, base + " tail", "src3"),            # near dup of 1
            (12, novel.replace("query", "sql"), "src3"),  # near dup of 2
            (13, fresh, "src3"),                     # novel
        ]
    )
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    prepare_training_data_incremental(spark, b1, "t_ptd_b", idx, out)
    f2 = prepare_training_data_incremental(spark, b2, "t_ptd_b", idx, out)
    assert f2["after_exact"] == 3  # doc 10 dropped at the hash check
    assert f2["after_neardup"] == 1  # 11, 12 dropped vs landed index
    landed = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 10 not in landed and 11 not in landed and 12 not in landed


def test_incremental_pipeline_survives_session_restart(
    spark, sf_oracle, tmp_path
):
    """New session, same index_path: the catalog is empty but the
    landed hash set, signature index, and pack state persist on disk.
    The next batch must re-attach all three (filesystem truth) — a
    catalog-trusting check would silently overwrite the dedup state
    while continuing the pack offsets, the worst of both worlds."""
    docs = documents(spark, sf_oracle)
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    b1 = docs.filter(F.col("doc_id") < cut)
    b2 = docs.filter(F.col("doc_id") >= cut)

    full_out = str(tmp_path / "full")
    prepare_training_data(docs, full_out)

    inc_out = str(tmp_path / "inc")
    idx = str(tmp_path / "idx")
    prepare_training_data_incremental(spark, b1, "t_ptd_c", idx, inc_out)
    # simulate the restart: catalog forgets every landed table
    for t in ("t_ptd_c_hashes", "t_ptd_c_bands", "t_ptd_c_grams",
              "t_ptd_c_sizes"):
        spark.sql(f"DROP TABLE {t}")
    prepare_training_data_incremental(spark, b2, "t_ptd_c", idx, inc_out)
    assert _rows(spark, inc_out) == _rows(spark, full_out)


def test_incremental_pipeline_replay_and_crash_rerun(
    spark, sf_oracle, tmp_path
):
    """Idempotency under the foreachBatch failure modes (ADVICE r6):
    (a) replaying a COMPLETED batch is a no-op that returns the
    recorded funnel and changes no output row; (b) a batch whose prior
    attempt crashed AFTER the state upserts (hashes + near-dup index
    landed, done marker missing — the worst window: the old code would
    drop the whole rerun as duplicates of itself) reruns to the exact
    one-shot result."""
    import os

    from pyspark.sql import functions as F

    docs = documents(spark, sf_oracle)
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    b1 = docs.filter(F.col("doc_id") < cut)
    b2 = docs.filter(F.col("doc_id") >= cut)

    full_out = str(tmp_path / "full")
    prepare_training_data(docs, full_out)

    inc_out = str(tmp_path / "inc")
    idx = str(tmp_path / "idx")
    f1 = prepare_training_data_incremental(spark, b1, "t_ptd_d", idx, inc_out)
    # (a) full replay of the completed batch
    f1_again = prepare_training_data_incremental(
        spark, b1, "t_ptd_d", idx, inc_out
    )
    assert f1_again == f1
    rows_after_b1 = _rows(spark, inc_out)

    f2 = prepare_training_data_incremental(spark, b2, "t_ptd_d", idx, inc_out)
    assert _rows(spark, inc_out) == _rows(spark, full_out)

    # (b) simulate the crash-after-state-upserts window for b2: delete
    # its done marker (and its output partitions, as if the upsert had
    # also died) — state tables still contain b2 — then rerun
    b2_id = int(b2.agg(F.max("doc_id")).collect()[0][0])
    os.remove(f"{idx}/_prep_batches/{b2_id}.json")
    import shutil

    for split_dir in os.listdir(inc_out):
        p = os.path.join(inc_out, split_dir, f"ingest_batch={b2_id}")
        if os.path.isdir(p):
            shutil.rmtree(p)
    assert _rows(spark, inc_out) == rows_after_b1  # b2's output gone
    f2_rerun = prepare_training_data_incremental(
        spark, b2, "t_ptd_d", idx, inc_out
    )
    assert f2_rerun == f2
    assert _rows(spark, inc_out) == _rows(spark, full_out)
