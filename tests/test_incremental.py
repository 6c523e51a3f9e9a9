"""Incremental dedup against a landed bucketed index: the
batch-then-delta ≡ full-corpus equivalence contract, the append-only id
guard, the upsert path, and the Exchange-free index-side plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducekmean_spark.operators.dedup import minhash_verified_dedup
from mapreducekmean_spark.operators.incremental import (
    append_to_index,
    dedup_delta,
    delta_candidate_pairs,
    land_dedup_index,
)
from mapreducekmean_spark.operators.text import documents


def _split(docs, lo, hi):
    return docs.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )


def _verdicts(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_equals_full_corpus_dedup(spark, sf_oracle, tmp_path):
    """land(batch1); dedup_delta(batch2) must report batch2's documents
    EXACTLY as minhash_verified_dedup over the whole corpus does —
    same keep/drop set, same dup_of canonicals, bit-identical jaccard
    thresholds underneath."""
    docs = documents(spark, sf_oracle)
    cut = docs.agg(
        F.percentile_approx("doc_id", 0.5).alias("m")
    ).collect()[0]["m"]
    old = docs.filter(F.col("doc_id") < cut)
    new = docs.filter(F.col("doc_id") >= cut)
    assert old.count() and new.count()

    land_dedup_index(spark, old, "t_inc_a", str(tmp_path / "idx"))
    got = _verdicts(dedup_delta(spark, new, "t_inc_a"))

    full = minhash_verified_dedup(docs).filter(F.col("doc_id") >= cut)
    assert got == _verdicts(full)


def test_delta_then_append_composes_over_batches(spark, sf_oracle, tmp_path):
    """Three-batch ingest: land batch1, delta+append batch2, delta
    batch3 — batch3's verdicts must equal the full-corpus run's rows
    for batch3, proving the APPEND preserves index semantics (dropped
    docs included) across upserts."""
    docs = documents(spark, sf_oracle)
    qs = docs.approxQuantile("doc_id", [1 / 3, 2 / 3], 0.0)
    c1, c2 = int(qs[0]), int(qs[1])
    b1 = docs.filter(F.col("doc_id") < c1)
    b2 = _split(docs, c1, c2)
    b3 = docs.filter(F.col("doc_id") >= c2)
    assert b1.count() and b2.count() and b3.count()

    land_dedup_index(spark, b1, "t_inc_b", str(tmp_path / "idx"))
    dedup_delta(spark, b2, "t_inc_b").collect()  # score batch2
    append_to_index(spark, b2, "t_inc_b")
    got = _verdicts(dedup_delta(spark, b3, "t_inc_b"))

    full = minhash_verified_dedup(docs).filter(F.col("doc_id") >= c2)
    assert got == _verdicts(full)


def test_delta_refuses_overlapping_id_ranges(spark, sf_oracle, tmp_path):
    """Append-only monotone ids are a precondition, not an assumption:
    a batch whose ids reach into the landed range must refuse with an
    actionable error, never silently mis-orient pairs."""
    docs = documents(spark, sf_oracle)
    land_dedup_index(spark, docs, "t_inc_c", str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="append-only monotone ids"):
        dedup_delta(spark, docs.limit(10), "t_inc_c")


def test_delta_band_join_no_exchange_on_index_side(
    spark, sf_small, tmp_path
):
    """The point of landing the band table bucketed by (band, bucket):
    the candidate join against a new batch must read the index WITHOUT
    re-shuffling it. With broadcast disabled, the only Exchange in the
    cross-candidate join feeds the (small) batch side — the index scan
    streams straight into the join."""
    from mapreducekmean_spark.operators.dedup import minhash_bands
    from mapreducekmean_spark.plans import formatted_plan
    from mapreducekmean_spark.sources.bucketing import read_bucketed

    docs = documents(spark, sf_small)
    cut = 250
    land_dedup_index(
        spark, docs.filter(F.col("doc_id") < cut), "t_inc_d",
        str(tmp_path / "idx"),
    )
    new = docs.filter(F.col("doc_id") >= cut)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = read_bucketed(spark, "t_inc_d_bands")
        j = idx.select(
            F.col("doc_id").alias("doc_a"), "band", "bucket"
        ).join(
            minhash_bands(new).select(
                F.col("doc_id").alias("doc_b"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        plan = formatted_plan(j)
        # The formatted tree prefixes every line of the join's FIRST
        # child (the index side) with ':'; no Exchange may sit there —
        # the bucketed scan must stream straight into the join. The
        # batch side keeps its (unavoidable) shuffles.
        tree = plan.split("\n\n")[0]
        index_branch = [ln for ln in tree.splitlines() if ":" in ln]
        assert index_branch, tree
        assert not any("Exchange" in ln for ln in index_branch), tree
        assert "SortMergeJoin" in tree, tree
        assert "Bucketed: true" in plan, plan
        # and the delta candidate set itself stays correct under the
        # no-broadcast planner.
        pairs = delta_candidate_pairs(spark, new, "t_inc_d")
        assert pairs.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", old_thresh
        )


def test_sizes_roster_includes_short_docs_for_the_guard(
    spark, tmp_path
):
    """The monotone-id guard reads the landed ceiling from the sizes
    table, so sizes must roster EVERY landed doc — a 2-token doc has no
    grams or bands, but its id still owns its slot. A batch colliding
    with a short doc's id (here: the landed max) must refuse."""
    from mapreducekmean_spark.operators.incremental import (
        land_dedup_index,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "eta theta iota kappa lambda mu"),
        (99, "tiny doc"),  # < 3 tokens: no grams, no bands
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    land_dedup_index(spark, docs, "t_inc_short", str(tmp_path / "idx"))

    sizes = spark.table("t_inc_short_sizes").collect()
    assert {r.doc_id: r.n_sh for r in sizes}[99] == 0

    batch = spark.createDataFrame(
        [(99, "nu xi omicron pi rho sigma")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="landed max 99"):
        dedup_delta(spark, batch, "t_inc_short")


def test_attach_restores_index_in_fresh_catalog(spark, sf_oracle, tmp_path):
    """Session-restart path: drop the catalog entries (external tables —
    files survive), attach_dedup_index re-registers them with the same
    bucket spec, and delta + append work as before; append WITHOUT the
    attach refuses instead of creating empty shadow tables."""
    from mapreducekmean_spark.operators.incremental import (
        append_to_index,
        attach_dedup_index,
    )

    docs = documents(spark, sf_oracle)
    cut = docs.agg(
        F.percentile_approx("doc_id", 0.5).alias("m")
    ).collect()[0]["m"]
    old = docs.filter(F.col("doc_id") < cut)
    new = docs.filter(F.col("doc_id") >= cut)
    idx = str(tmp_path / "idx")
    land_dedup_index(spark, old, "t_inc_att", idx)
    expected = _verdicts(dedup_delta(spark, new, "t_inc_att"))

    # simulate a restart: catalog forgets, files remain
    for sfx in ("bands", "grams", "sizes"):
        spark.sql(f"DROP TABLE t_inc_att_{sfx}")
    with pytest.raises(ValueError, match="attach_dedup_index"):
        append_to_index(spark, new, "t_inc_att")
    with pytest.raises(ValueError, match="attach_dedup_index"):
        dedup_delta(spark, new, "t_inc_att")

    attach_dedup_index(spark, "t_inc_att", idx)
    assert _verdicts(dedup_delta(spark, new, "t_inc_att")) == expected
    append_to_index(spark, new, "t_inc_att")  # and the upsert works
    n_rows = spark.table("t_inc_att_sizes").count()
    assert n_rows == old.count() + new.count()


def test_compact_dedup_index_keeps_verdicts_and_exchange_free_join(
    spark, sf_small, tmp_path
):
    """Compacting the appended index must be invisible to the delta
    path: per-table file counts drop back to the bucket grain, the
    next batch's verdicts are unchanged, and the band join still reads
    the index without re-shuffling it (Bucketed: true, no Exchange on
    the index branch)."""
    import os

    from mapreducekmean_spark.operators.dedup import minhash_bands
    from mapreducekmean_spark.operators.incremental import (
        compact_dedup_index,
    )
    from mapreducekmean_spark.plans import formatted_plan
    from mapreducekmean_spark.sources.bucketing import read_bucketed

    docs = documents(spark, sf_small)
    c1, c2 = 150, 300
    idx_path = str(tmp_path / "idx")
    land_dedup_index(
        spark, docs.filter(F.col("doc_id") < c1), "t_inc_cp", idx_path
    )
    append_to_index(
        spark,
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        "t_inc_cp",
    )
    batch3 = docs.filter(F.col("doc_id") >= c2)
    before = sorted(
        tuple(r) for r in dedup_delta(spark, batch3, "t_inc_cp").collect()
    )

    def files(suffix):
        return sum(
            1
            for _r, _d, fs in os.walk(f"{idx_path}/{suffix}")
            for f in fs
            if not f.startswith(("_", "."))
        )

    pre = {s: files(s) for s in ("bands", "grams", "sizes")}
    stats = compact_dedup_index(spark, "t_inc_cp")
    for s in ("bands", "grams", "sizes"):
        assert stats[s]["files_after"] < pre[s] == stats[s]["files_before"]

    after = sorted(
        tuple(r) for r in dedup_delta(spark, batch3, "t_inc_cp").collect()
    )
    assert after == before and after

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = read_bucketed(spark, "t_inc_cp_bands")
        j = idx.select(
            F.col("doc_id").alias("doc_a"), "band", "bucket"
        ).join(
            minhash_bands(batch3).select(
                F.col("doc_id").alias("doc_b"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        plan = formatted_plan(j)
        tree = plan.split("\n\n")[0]
        index_branch = [ln for ln in tree.splitlines() if ":" in ln]
        assert index_branch and not any(
            "Exchange" in ln for ln in index_branch
        ), tree
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_host_stats_snapshot_batch_prefix_equals_one_shot(
    spark, sf_small, tmp_path
):
    """The delta-maintained host_stats report must equal the one-shot
    host_stats over the union after EVERY batch prefix (not just the
    final state) and over an arbitrary monotone split — the
    agg_delta_maintenance discipline applied to the daily report. Also
    pins replay idempotence: re-applying the last batch (same bid)
    must not change a single row."""
    from mapreducekmean_spark.operators import text as tx

    docs = documents(spark, sf_small).select("doc_id", "source", "text")
    # mirror host_stats' synthesized-dup shape: pad copies + a mirror
    # source so the cross-source dup accounting is load-bearing
    pad = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "source",
        F.concat(F.lit(" "), F.col("text")).alias("text"),
    )
    corpus = docs.unionAll(pad)
    qs = corpus.approxQuantile("doc_id", [1 / 3, 2 / 3], 0.0)
    c1, c2 = int(qs[0]), int(qs[1])
    b1 = corpus.filter(F.col("doc_id") < c1)
    b2 = corpus.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2))
    b3 = corpus.filter(F.col("doc_id") >= c2)
    assert b1.count() and b2.count() and b3.count()

    def report(df):
        return sorted(tuple(r) for r in df.collect())

    path = str(tmp_path / "host_snap")
    tx.host_stats_land(b1, path)
    assert report(tx.host_stats_from_snapshot(spark, path)) == report(
        tx.host_stats(b1)
    )
    tx.host_stats_apply_delta(spark, b2, path, batch_id=1)
    assert report(tx.host_stats_from_snapshot(spark, path)) == report(
        tx.host_stats(b1.unionAll(b2))
    )
    tx.host_stats_apply_delta(spark, b3, path, batch_id=2)
    full = report(tx.host_stats(corpus))
    assert report(tx.host_stats_from_snapshot(spark, path)) == full
    # replay the last batch at the same bid: per-key watermark no-op
    tx.host_stats_apply_delta(spark, b3, path, batch_id=2)
    assert report(tx.host_stats_from_snapshot(spark, path)) == full


def test_quality_deciles_snapshot_batch_prefix_equals_one_shot(
    spark, sf_small, tmp_path
):
    """The delta-maintained decile calibration must equal the one-shot
    quality_deciles after every batch prefix, and replaying the last
    batch at the same bid must change nothing — the host_stats_delta
    discipline on the quality level snapshot (exact: integer level
    keys; q_int/1e6 is bit-identical to round(score, 6))."""
    from mapreducekmean_spark.operators import text as tx

    docs = documents(spark, sf_small).select("doc_id", "text")
    qs = docs.approxQuantile("doc_id", [1 / 3, 2 / 3], 0.0)
    c1, c2 = int(qs[0]), int(qs[1])
    b1 = docs.filter(F.col("doc_id") < c1)
    b2 = docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2))
    b3 = docs.filter(F.col("doc_id") >= c2)
    assert b1.count() and b2.count() and b3.count()

    def report(df):
        return sorted(tuple(r) for r in df.collect())

    path = str(tmp_path / "qdec_snap")
    tx.quality_deciles_land(b1, path)
    assert report(
        tx.quality_deciles_from_snapshot(spark, path)
    ) == report(tx.quality_deciles(b1))
    tx.quality_deciles_apply_delta(spark, b2, path, batch_id=1)
    assert report(
        tx.quality_deciles_from_snapshot(spark, path)
    ) == report(tx.quality_deciles(b1.unionAll(b2)))
    tx.quality_deciles_apply_delta(spark, b3, path, batch_id=2)
    full = report(tx.quality_deciles(docs))
    assert report(tx.quality_deciles_from_snapshot(spark, path)) == full
    tx.quality_deciles_apply_delta(spark, b3, path, batch_id=2)  # replay
    assert report(tx.quality_deciles_from_snapshot(spark, path)) == full


def test_corpus_diff_from_snapshots_equals_one_shot(
    spark, sf_small, tmp_path
):
    """The snapshot-backed version diff must equal corpus_diff over
    the raw corpora, including when the NEW snapshot was built
    incrementally (land + delta fold) — the maintained level state
    carries everything the diff needs."""
    from mapreducekmean_spark.operators import text as tx

    docs = documents(spark, sf_small).select("doc_id", "source", "text")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new_a = docs.filter(F.col("doc_id") % 3 != 0)
    new_b = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", "source", F.concat("text", F.lit(" v2")).alias("text")
    )
    new = new_a.unionAll(new_b)

    o_path = str(tmp_path / "snap_old")
    n_path = str(tmp_path / "snap_new")
    tx.host_stats_land(old, o_path)
    tx.host_stats_land(new_a, n_path)
    tx.host_stats_apply_delta(spark, new_b, n_path, batch_id=1)

    got = sorted(
        tuple(r)
        for r in tx.corpus_diff_from_snapshots(
            spark, o_path, n_path
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in tx.corpus_diff(
            old.select("source", "text"), new.select("source", "text")
        ).collect()
    )
    assert got == want


def test_seq_len_histogram_snapshot_batch_prefix_equals_one_shot(
    spark, sf_small, tmp_path
):
    """The delta-maintained length histogram must equal the one-shot
    seq_len_histogram after every batch prefix, and replaying the last
    batch at the same bid must change nothing — the host_stats_delta
    discipline on the (source, bucket) count/token-sum snapshot (all
    state additive bigints, so exactness is trivial)."""
    from mapreducekmean_spark.operators import text as tx

    docs = documents(spark, sf_small).select("doc_id", "source", "text")
    qs = docs.approxQuantile("doc_id", [1 / 3, 2 / 3], 0.0)
    c1, c2 = int(qs[0]), int(qs[1])
    b1 = docs.filter(F.col("doc_id") < c1)
    b2 = docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2))
    b3 = docs.filter(F.col("doc_id") >= c2)
    assert b1.count() and b2.count() and b3.count()

    def report(df):
        return sorted(tuple(r) for r in df.collect())

    path = str(tmp_path / "slh_snap")
    tx.seq_len_histogram_land(b1, path)
    assert report(
        tx.seq_len_histogram_from_snapshot(spark, path)
    ) == report(tx.seq_len_histogram(b1))
    tx.seq_len_histogram_apply_delta(spark, b2, path, batch_id=1)
    assert report(
        tx.seq_len_histogram_from_snapshot(spark, path)
    ) == report(tx.seq_len_histogram(b1.unionAll(b2)))
    tx.seq_len_histogram_apply_delta(spark, b3, path, batch_id=2)
    full = report(tx.seq_len_histogram(docs))
    assert (
        report(tx.seq_len_histogram_from_snapshot(spark, path)) == full
    )
    tx.seq_len_histogram_apply_delta(spark, b3, path, batch_id=2)
    assert (
        report(tx.seq_len_histogram_from_snapshot(spark, path)) == full
    )


def test_seq_len_snapshot_source_with_separator_roundtrips(
    spark, tmp_path
):
    """The packed (source, bucket) key splits back POSITIONALLY (fixed
    2-digit suffix), so a source containing the separator itself must
    round-trip — the _HOST_KEY_SEP discipline."""
    from mapreducekmean_spark.operators import text as tx

    docs = spark.createDataFrame(
        [("a|b|c", "one two three"), ("plain", "x " * 40)],
        "source string, text string",
    )
    path = str(tmp_path / "slh_sep")
    tx.seq_len_histogram_land(docs, path)
    got = sorted(
        tuple(r)
        for r in tx.seq_len_histogram_from_snapshot(
            spark, path
        ).collect()
    )
    want = sorted(
        tuple(r) for r in tx.seq_len_histogram(docs).collect()
    )
    assert got == want
    assert {r[0] for r in got} == {"a|b|c", "plain"}


def test_embedding_stats_snapshot_batch_prefix_equals_one_shot(
    spark, sf_small, tmp_path
):
    """The delta-maintained drift report must equal the one-shot
    embedding_stats after every batch prefix — the row exercising the
    cdc mins/maxs extension: sums add under the per-key watermark,
    min/max fold by least/greatest. Replaying the last batch at the
    same bid must change nothing (min/max are naturally idempotent,
    the sums are watermark-guarded)."""
    from mapreducekmean_spark.operators import text as tx
    from mapreducekmean_spark.sources import load_table

    embs = load_table(spark, sf_small, "embeddings")
    b1 = embs.filter(F.col("vec_id") % 3 == 0)
    b2 = embs.filter(F.col("vec_id") % 3 == 1)
    b3 = embs.filter(F.col("vec_id") % 3 == 2)
    assert b1.count() and b2.count() and b3.count()

    def report(df):
        return sorted(tuple(r) for r in df.collect())

    path = str(tmp_path / "emb_snap")
    tx.embedding_stats_land(b1, path)
    assert report(
        tx.embedding_stats_from_snapshot(spark, path)
    ) == report(tx.embedding_stats(b1))
    tx.embedding_stats_apply_delta(spark, b2, path, batch_id=1)
    assert report(
        tx.embedding_stats_from_snapshot(spark, path)
    ) == report(tx.embedding_stats(b1.unionAll(b2)))
    tx.embedding_stats_apply_delta(spark, b3, path, batch_id=2)
    full = report(tx.embedding_stats(embs))
    assert (
        report(tx.embedding_stats_from_snapshot(spark, path)) == full
    )
    tx.embedding_stats_apply_delta(spark, b3, path, batch_id=2)
    assert (
        report(tx.embedding_stats_from_snapshot(spark, path)) == full
    )
