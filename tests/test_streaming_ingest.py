"""Deduplicating streaming ingest: batch-prefix ≡ full-corpus kept set,
replay idempotency, and the end-to-end writeStream smoke."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducekmean_spark.operators.dedup import minhash_verified_dedup
from mapreducekmean_spark.operators.text import documents
from mapreducekmean_spark.streaming.jobs import (
    ingest_dedup_batch,
    stream_ingest_dedup,
)


def _kept_full(spark, docs):
    v = minhash_verified_dedup(docs)
    return sorted(
        r.doc_id for r in v.filter("kept").select("doc_id").collect()
    )


def test_ingest_batches_compose_to_full_corpus_kept_set(
    spark, sf_oracle, tmp_path
):
    """Driving the foreachBatch body directly with three ordered
    batches: the union of kept rows landed at out_path must be exactly
    the kept set of the one-shot full-corpus dedup, and the landed rows
    carry the original full document rows."""
    docs = documents(spark, sf_oracle)
    qs = docs.approxQuantile("doc_id", [1 / 3, 2 / 3], 0.0)
    c1, c2 = int(qs[0]), int(qs[1])
    batches = [
        docs.filter(F.col("doc_id") < c1),
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        docs.filter(F.col("doc_id") >= c2),
    ]
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    for bid, b in enumerate(batches):
        ingest_dedup_batch(spark, b, bid, "t_ing_a", idx, out)

    landed = spark.read.parquet(out)
    assert sorted(r.doc_id for r in landed.collect()) == _kept_full(
        spark, docs
    )
    assert set(landed.columns) == set(docs.columns)


def test_ingest_replay_of_completed_batch_is_noop(
    spark, sf_oracle, tmp_path
):
    """The foreachBatch idempotency contract: re-delivering an already
    completed batch id (restart after a sink-side crash) must change
    neither the landed rows nor the index."""
    docs = documents(spark, sf_oracle)
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    b0 = docs.filter(F.col("doc_id") < cut)
    b1 = docs.filter(F.col("doc_id") >= cut)
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    ingest_dedup_batch(spark, b0, 0, "t_ing_b", idx, out)
    ingest_dedup_batch(spark, b1, 1, "t_ing_b", idx, out)
    before = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    n_idx = spark.table("t_ing_b_sizes").count()

    ingest_dedup_batch(spark, b1, 1, "t_ing_b", idx, out)  # replay
    ingest_dedup_batch(spark, b0, 0, "t_ing_b", idx, out)  # older replay

    after = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert after == before
    assert spark.table("t_ing_b_sizes").count() == n_idx


def test_stream_ingest_dedup_end_to_end(spark, sf_small, tmp_path):
    """writeStream smoke: the file-source documents stream through the
    deduplicating sink lands exactly the full-corpus kept set."""
    from mapreducekmean_spark.streaming.jobs import read_documents_stream

    docs = documents(spark, sf_small)
    stream = read_documents_stream(spark, sf_small)
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    stream_ingest_dedup(stream, "t_ing_c", idx, out)

    landed = spark.read.parquet(out)
    assert sorted(r.doc_id for r in landed.collect()) == _kept_full(
        spark, docs
    )
