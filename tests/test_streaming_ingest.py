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
    # full document rows plus the batch-partition column the
    # replay-idempotent upsert layout adds
    assert set(landed.columns) == set(docs.columns) | {"ingest_batch"}


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


def test_ingest_replay_after_completed_index_append_converges(
    spark, sf_oracle, tmp_path
):
    """The crash window the high-water mark cannot cover: batch N's
    index append completed but the marker write did not. The replay
    must re-score identically (dedup_delta tolerates the batch being
    the landed tail), REPLACE its own output partition rather than
    duplicate it, skip the second index append, and advance the
    marker — the stream converges instead of wedging."""
    import os

    docs = documents(spark, sf_oracle)
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    b0 = docs.filter(F.col("doc_id") < cut)
    b1 = docs.filter(F.col("doc_id") >= cut)
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    ingest_dedup_batch(spark, b0, 0, "t_ing_d", idx, out)
    ingest_dedup_batch(spark, b1, 1, "t_ing_d", idx, out)
    rows_before = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    n_idx = spark.table("t_ing_d_sizes").count()

    # simulate the crash: everything of batch 1 completed EXCEPT the
    # marker — roll it back to batch 0 and replay batch 1.
    with open(os.path.join(idx, "_ingest_high_water"), "w") as f:
        f.write("0")
    ingest_dedup_batch(spark, b1, 1, "t_ing_d", idx, out)

    assert sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    ) == rows_before
    assert spark.table("t_ing_d_sizes").count() == n_idx
    with open(os.path.join(idx, "_ingest_high_water")) as f:
        assert int(f.read()) == 1


def test_ingest_composes_bm25_and_ivf_indexes(spark, sf_oracle, tmp_path):
    """Land once, searchable everywhere: driving batches through the
    ingest with bm25_path/ivf_path keeps the BM25 and IVF indexes in
    lockstep with the landed corpus — post-ingest queries must equal a
    from-scratch rebuild over exactly the landed rows (BM25: fresh
    index over the kept docs; IVF: fresh index under the ingest's own
    frozen centroids). Replays of a completed batch (both the full
    no-op path and the rolled-back-marker path, where each index's own
    content-checked guard must fire) change neither result."""
    import os

    from mapreducekmean_spark.operators.search import (
        bm25_search_indexed,
        land_bm25_index,
    )
    from mapreducekmean_spark.operators.similarity import (
        N_PROBE,
        _probe_cells,
        _queries_and_points,
        _score_probed_cells,
        land_ivf_index_points,
    )

    docs = documents(spark, sf_oracle).withColumn(
        "embedding",
        F.expr(
            "transform(sequence(1, 8), i -> "
            "cast(sin(cast((doc_id + 1) * i as double)) as float))"
        ),
    )
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    batches = [
        docs.filter(F.col("doc_id") < cut),
        docs.filter(F.col("doc_id") >= cut),
    ]
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    bm25 = str(tmp_path / "bm25")
    ivf = str(tmp_path / "ivf")
    for bid, b in enumerate(batches):
        ingest_dedup_batch(
            spark, b, bid, "t_ing_f", idx, out,
            bm25_path=bm25, ivf_path=ivf,
        )

    landed = spark.read.parquet(out).localCheckpoint()

    def bm25_results(name):
        return [
            tuple(r)
            for q in ("table scan", "shuffle partition")
            for r in bm25_search_indexed(spark, q, name).collect()
        ]

    def ivf_results(path):
        cent_rows = spark.read.parquet(f"{path}/centroids").collect()
        cents = [
            r.centroid for r in sorted(cent_rows, key=lambda r: r.cell)
        ]
        qs = (
            landed.orderBy("doc_id")
            .limit(5)
            .select(
                F.col("doc_id").alias("q_id"),
                F.expr(
                    "transform(embedding, v -> cast(v as double))"
                ).alias("q_emb"),
            )
        )
        q_cells = _probe_cells(qs, cents, len(cents), N_PROBE)
        cells = spark.read.parquet(f"{path}/cells").select(
            "vec_id", "emb", F.col("cell").cast("bigint").alias("cell")
        )
        return sorted(
            tuple(r) for r in _score_probed_cells(cells, q_cells, 3).collect()
        )

    grown_bm25 = bm25_results("t_ing_f_bm25")
    grown_ivf = ivf_results(ivf)

    # from-scratch rebuilds over exactly the landed corpus
    land_bm25_index(spark, landed, "t_ing_f_rb", str(tmp_path / "bm25_rb"))
    assert bm25_results("t_ing_f_rb") == grown_bm25
    cent_rows = spark.read.parquet(f"{ivf}/centroids").collect()
    frozen = [r.centroid for r in sorted(cent_rows, key=lambda r: r.cell)]
    ivf_rb = str(tmp_path / "ivf_rb")
    land_ivf_index_points(
        spark,
        landed.select(
            F.col("doc_id").alias("vec_id"),
            F.expr("transform(embedding, v -> cast(v as double))").alias(
                "emb"
            ),
        ),
        ivf_rb,
        ncells=len(frozen),
        cents=frozen,
    )
    assert ivf_results(ivf_rb) == grown_ivf

    # replay a completed batch twice: once as the full marker no-op,
    # once with the marker rolled back so the per-index guards fire
    ingest_dedup_batch(
        spark, batches[1], 1, "t_ing_f", idx, out,
        bm25_path=bm25, ivf_path=ivf,
    )
    with open(os.path.join(idx, "_ingest_high_water"), "w") as f:
        f.write("0")
    ingest_dedup_batch(
        spark, batches[1], 1, "t_ing_f", idx, out,
        bm25_path=bm25, ivf_path=ivf,
    )
    assert bm25_results("t_ing_f_bm25") == grown_bm25
    assert ivf_results(ivf) == grown_ivf
    assert (
        spark.read.parquet(f"{ivf}/cells").count() == landed.count()
    )


def test_ingest_survives_driver_restart_without_relanding(
    spark, sf_oracle, tmp_path
):
    """Driver restart: the session catalog forgets the index tables but
    the files persist. The next batch must RE-ATTACH the landed index
    (filesystem is the source of truth), keep deduplicating against
    history, and never overwrite the landed signatures."""
    docs = documents(spark, sf_oracle)
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    b0 = docs.filter(F.col("doc_id") < cut)
    # batch 1 duplicates batch 0's text under fresh higher ids — every
    # doc must be caught against the LANDED index after the "restart"
    shift = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    b1 = b0.withColumn("doc_id", F.col("doc_id") + shift)
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    ingest_dedup_batch(spark, b0, 0, "t_ing_e", idx, out)
    n0 = b0.count()

    for sfx in ("bands", "grams", "sizes"):  # catalog forgets; files stay
        spark.sql(f"DROP TABLE t_ing_e_{sfx}")
    ingest_dedup_batch(spark, b1, 1, "t_ing_e", idx, out)

    landed = spark.read.parquet(out)
    # no batch-1 doc survived (all are dups of landed history), and the
    # index grew instead of being re-landed from scratch
    assert landed.filter(F.col("doc_id") >= shift).count() == 0
    assert spark.table("t_ing_e_sizes").count() == n0 + b1.count()


def test_ingested_indexes_serve_the_composed_retrieval_chain(
    spark, sf_oracle, tmp_path
):
    """The full production loop: batches flow through the deduplicating
    ingest (landing corpus + BM25 + IVF indexes), then serve_retrieval
    answers a query batch straight off the ingest-maintained indexes —
    and the answers equal serving over indexes rebuilt from scratch on
    the landed corpus (under the ingest's frozen IVF quantizer). No
    manual index maintenance anywhere between ingest and serve."""
    from mapreducekmean_spark.operators.search import (
        land_bm25_index,
        serve_retrieval,
    )
    from mapreducekmean_spark.operators.similarity import (
        land_ivf_index_points,
    )

    docs = documents(spark, sf_oracle).withColumn(
        "embedding",
        F.expr(
            "transform(sequence(1, 8), i -> "
            "cast(sin(cast((doc_id + 1) * i as double)) as float))"
        ),
    )
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    batches = [
        docs.filter(F.col("doc_id") < cut),
        docs.filter(F.col("doc_id") >= cut),
    ]
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    bm25 = str(tmp_path / "bm25")
    ivf = str(tmp_path / "ivf")
    for bid, b in enumerate(batches):
        ingest_dedup_batch(
            spark, b, bid, "t_ing_srv", idx, out,
            bm25_path=bm25, ivf_path=ivf,
        )

    landed = spark.read.parquet(out).localCheckpoint()
    queries = landed.orderBy("doc_id").limit(3).select(
        F.col("doc_id").alias("q_id"),
        "text",
        F.expr("transform(embedding, v -> cast(v as double))").alias(
            "q_emb"
        ),
    ).localCheckpoint()

    def srv(bm25_name, ivf_path):
        return sorted(
            tuple(r)
            for r in serve_retrieval(
                spark, queries, bm25_name, ivf_path, landed,
                k=3, n_cand=5, exclude_self=True,
            ).collect()
        )

    got = srv("t_ing_srv_bm25", ivf)
    assert got and len(got) == 9

    # rebuild both indexes from scratch over exactly the landed corpus
    land_bm25_index(spark, landed, "t_ing_srv_rb", str(tmp_path / "brb"))
    cents = [
        r.centroid
        for r in sorted(
            spark.read.parquet(f"{ivf}/centroids").collect(),
            key=lambda r: r.cell,
        )
    ]
    ivf_rb = str(tmp_path / "ivf_rb")
    land_ivf_index_points(
        spark,
        landed.select(
            F.col("doc_id").alias("vec_id"),
            F.expr("transform(embedding, v -> cast(v as double))").alias(
                "emb"
            ),
        ),
        ivf_rb,
        ncells=len(cents),
        cents=cents,
    )
    assert srv("t_ing_srv_rb", ivf_rb) == got


def test_ingest_composes_ivfpq_index(spark, sf_oracle, tmp_path):
    """The ingest also maintains the compressed IVF-PQ vector store:
    batches driven with ivfpq_path keep the codes-only cells table in
    lockstep with the landed corpus. Post-ingest queries must equal a
    from-scratch rebuild over exactly the landed rows under the
    ingest's own frozen centroids AND codebooks, and a replay (marker
    rolled back so the index's tail-cell guard must fire) changes
    neither the result nor the row count."""
    import os

    from mapreducekmean_spark.operators.pq import (
        ann_ivfpq_indexed,
        land_ivfpq_index_points,
    )

    docs = documents(spark, sf_oracle).withColumn(
        "embedding",
        F.expr(
            "transform(sequence(1, 8), i -> "
            "cast(sin(cast((doc_id + 1) * i as double)) as float))"
        ),
    )
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    batches = [
        docs.filter(F.col("doc_id") < cut),
        docs.filter(F.col("doc_id") >= cut),
    ]
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    ivfpq = str(tmp_path / "ivfpq")
    for bid, b in enumerate(batches):
        ingest_dedup_batch(
            spark, b, bid, "t_ing_pq", idx, out, ivfpq_path=ivfpq,
        )

    landed = spark.read.parquet(out).localCheckpoint()
    qs = (
        landed.orderBy("doc_id")
        .limit(5)
        .select(
            F.col("doc_id").alias("q_id"),
            F.expr("transform(embedding, v -> cast(v as double))").alias(
                "q_emb"
            ),
        )
    )

    def results(path):
        return sorted(
            tuple(r)
            for r in ann_ivfpq_indexed(
                spark, sf_oracle, path, qs=qs
            ).collect()
        )

    grown = results(ivfpq)
    assert grown

    # from-scratch rebuild over exactly the landed corpus, pinned to
    # the ingest's frozen quantizer + codebooks
    cents = [
        r.centroid
        for r in sorted(
            spark.read.parquet(f"{ivfpq}/centroids").collect(),
            key=lambda r: r.cell,
        )
    ]
    cb_rows = spark.read.parquet(f"{ivfpq}/codebooks").collect()
    m = 1 + max(r.sub for r in cb_rows)
    kc = 1 + max(r.code for r in cb_rows)
    cb = [[None] * kc for _ in range(m)]
    for r in cb_rows:
        cb[r.sub][r.code] = list(r.vec)
    rb = str(tmp_path / "ivfpq_rb")
    land_ivfpq_index_points(
        spark,
        landed.select(
            F.col("doc_id").alias("vec_id"),
            F.expr("transform(embedding, v -> cast(v as double))").alias(
                "emb"
            ),
        ),
        rb,
        ncells=len(cents),
        cents=cents,
        codebooks=cb,
    )
    assert results(rb) == grown

    # replay with the marker rolled back: the tail-cell guard no-ops
    n_rows = spark.read.parquet(f"{ivfpq}/cells").count()
    with open(os.path.join(idx, "_ingest_high_water"), "w") as f:
        f.write("0")
    ingest_dedup_batch(
        spark, batches[1], 1, "t_ing_pq", idx, out, ivfpq_path=ivfpq,
    )
    assert spark.read.parquet(f"{ivfpq}/cells").count() == n_rows
    assert results(ivfpq) == grown
    assert n_rows == landed.count()


def test_stream_semantic_dedup_prefix_equals_one_shot(
    spark, sf_oracle, tmp_path
):
    """The embedding twin of the ingest equivalence: three vector
    batches arrive through a real checkpointed file stream
    (maxFilesPerTrigger=1); the landed verdicts over all batches must
    equal the one-shot semantic_dedup over the union under the FIRST
    batch's frozen quantizer — bit-exact, shared _sem_dup_of kernel."""
    import os

    from mapreducekmean_spark.operators import kmeans as km
    from mapreducekmean_spark.operators.similarity import semantic_dedup
    from mapreducekmean_spark.streaming.jobs import stream_semantic_dedup

    pts = km.embeddings(spark, sf_oracle).select("vec_id", "emb")
    mx = pts.agg(F.max("vec_id")).collect()[0][0]
    c1, c2 = (mx + 1) // 2, (mx + 1) * 3 // 4
    src = tmp_path / "vecs"
    src.mkdir()
    batches = [
        pts.filter(F.col("vec_id") < c1),
        pts.filter((F.col("vec_id") >= c1) & (F.col("vec_id") < c2)),
        pts.filter(F.col("vec_id") >= c2),
    ]
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(str(src / f"b{i}"))
        for f_ in (src / f"b{i}").rglob("*"):
            os.utime(f_, (1_000_000 + i * 100, 1_000_000 + i * 100))
    idx = str(tmp_path / "semidx")
    out = str(tmp_path / "semout")
    stream = (
        spark.readStream.schema("vec_id bigint, emb array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    stream_semantic_dedup(stream, idx, out)

    landed = spark.read.parquet(out)
    got = {
        (r.vec_id, r.cell, r.kept, r.dup_of) for r in landed.collect()
    }
    # one-shot ground truth under the FIRST batch's frozen quantizer
    cents = km.collect_centroids(
        km.deterministic_init(batches[0], km.DEFAULT_K)
    )
    want = {
        (r.vec_id, r.cell, r.kept, r.dup_of)
        for r in semantic_dedup(spark, sf_oracle, cents=cents).collect()
    }
    assert got == want
    assert any(not k for (_v, _c, k, _d) in got)  # fixture has dups
    # three batch partitions landed; marker at the last batch id
    parts = {d for d in os.listdir(out) if d.startswith("sem_batch=")}
    assert parts == {"sem_batch=0", "sem_batch=1", "sem_batch=2"}
    with open(os.path.join(idx, "_semdedup_high_water")) as f:
        assert int(f.read()) == 2


def test_semantic_dedup_batch_replay_windows(spark, sf_oracle, tmp_path):
    """Both replay windows of the streaming semantic dedup: a batch at
    or below the high-water mark no-ops even with different content,
    and the crash-after-append window (marker rolled back, vectors
    already in the index) re-lands the identical verdict partition."""
    import os

    from mapreducekmean_spark.operators import kmeans as km
    from mapreducekmean_spark.streaming.jobs import semantic_dedup_batch

    pts = km.embeddings(spark, sf_oracle).select("vec_id", "emb")
    mx = pts.agg(F.max("vec_id")).collect()[0][0]
    split = (mx + 1) // 2
    b0 = pts.filter(F.col("vec_id") < split)
    b1 = pts.filter(F.col("vec_id") >= split)
    idx = str(tmp_path / "semidx")
    out = str(tmp_path / "semout")
    semantic_dedup_batch(spark, b0, 0, idx, out)
    semantic_dedup_batch(spark, b1, 1, idx, out)
    rows = sorted(tuple(r) for r in spark.read.parquet(out).collect())

    # replay at the mark with DIFFERENT content: must no-op
    semantic_dedup_batch(spark, b0, 1, idx, out)
    assert sorted(tuple(r) for r in spark.read.parquet(out).collect()) == rows

    # crash-after-append window: marker back to 0, batch 1's vectors
    # already appended — the delta's anti-join re-scores identically
    marker = os.path.join(idx, "_semdedup_high_water")
    with open(marker, "w") as f:
        f.write("0")
    semantic_dedup_batch(spark, b1, 1, idx, out)
    assert sorted(tuple(r) for r in spark.read.parquet(out).collect()) == rows
    with open(marker) as f:
        assert int(f.read()) == 1


def _one_shot_chunks(spark, docs):
    """Reference: chunk the whole corpus, keep min (doc_id, chunk_id)
    per chunk_hash — what the batched ingest must compose to."""
    from mapreducekmean_spark.operators.text import chunk_documents

    ch = chunk_documents(docs.select("doc_id", "text"))
    first = ch.groupBy("chunk_hash").agg(
        F.min(F.struct("doc_id", "chunk_id")).alias("w")
    )
    kept = ch.join(
        first.select(
            "chunk_hash",
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.chunk_id").alias("chunk_id"),
        ),
        ["chunk_hash", "doc_id", "chunk_id"],
    )
    return sorted(
        (r.doc_id, r.chunk_id, r.chunk_hash) for r in kept.collect()
    )


def _chunky_docs(spark):
    """Synthetic corpus with cross-doc and cross-batch duplicate
    chunks: docs 0/10/20 are byte-identical (every chunk duplicates),
    docs 1/11 share a 64-token prefix (first chunk duplicates), the
    rest are unique. 130 tokens/doc -> 3 chunks each at 64/48."""
    base = " ".join(f"tok{i}" for i in range(130))
    prefix = " ".join(f"pre{i}" for i in range(64))
    rows = []
    for i in range(25):
        if i in (0, 10, 20):
            text = base
        elif i in (1, 11):
            text = prefix + " " + " ".join(f"tail{i}x{j}" for j in range(66))
        else:
            text = " ".join(f"doc{i}w{j}" for j in range(130))
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_ingest_prefix_equals_one_shot(spark, tmp_path):
    """Batches b1..b3 through chunk_ingest_batch land exactly the
    one-shot chunk-dedup result: cross-batch duplicate chunks (doc 10
    and 20 repeating doc 0's, doc 11 repeating doc 1's first window)
    drop against the landed hash table, first occurrences survive."""
    from mapreducekmean_spark.streaming.jobs import chunk_ingest_batch

    docs = _chunky_docs(spark)
    idx = str(tmp_path / "cidx")
    out = str(tmp_path / "cout")
    batches = [
        docs.filter("doc_id < 8"),
        docs.filter("doc_id >= 8 and doc_id < 16"),
        docs.filter("doc_id >= 16"),
    ]
    for bid, b in enumerate(batches):
        chunk_ingest_batch(spark, b, bid, "t_chunk_a", idx, out)

    landed = spark.read.parquet(out)
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_hash) for r in landed.collect()
    )
    assert got == _one_shot_chunks(spark, docs)
    # the duplicate docs' chunks landed only under their first ids
    landed_docs = {r.doc_id for r in landed.collect()}
    assert 10 not in landed_docs and 20 not in landed_docs
    # doc 11 kept its tail chunks but lost the shared first window
    d11 = sorted(
        r.chunk_id for r in landed.filter("doc_id = 11").collect()
    )
    assert d11 == [1, 2]
    # hash-table growth regression (r11 advice): only KEPT hashes are
    # appended — a cross-batch loser's hash must appear exactly once
    # (its first landing), never once per batch it reappears in
    ht = spark.table("t_chunk_a_chunk_hashes")
    assert ht.count() == ht.select("chunk_hash").distinct().count()
    assert ht.count() == landed.count()


def test_chunk_ingest_replay_windows_converge(spark, tmp_path):
    """Replay idempotency both ways: a completed batch id re-delivered
    is a no-op, and a crash AFTER the hash-table append but BEFORE the
    marker (the hardest window) re-runs to the identical landed state
    — the provenance filter keeps the batch from deduping against its
    own half-landed hashes."""
    import os

    from mapreducekmean_spark.streaming.jobs import chunk_ingest_batch

    docs = _chunky_docs(spark)
    idx = str(tmp_path / "cidx")
    out = str(tmp_path / "cout")
    b0 = docs.filter("doc_id < 12")
    b1 = docs.filter("doc_id >= 12")
    chunk_ingest_batch(spark, b0, 0, "t_chunk_b", idx, out)
    chunk_ingest_batch(spark, b1, 1, "t_chunk_b", idx, out)
    before = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    n_hashes = spark.table("t_chunk_b_chunk_hashes").count()

    # completed-batch replays: no-ops
    chunk_ingest_batch(spark, b1, 1, "t_chunk_b", idx, out)
    chunk_ingest_batch(spark, b0, 0, "t_chunk_b", idx, out)
    assert (
        sorted(tuple(r) for r in spark.read.parquet(out).collect())
        == before
    )
    assert spark.table("t_chunk_b_chunk_hashes").count() == n_hashes

    # crash window: marker lost after batch 1 fully applied -> the
    # rerun must converge to the same landed rows and hash rows
    os.remove(os.path.join(idx, "_chunk_ingest_high_water"))
    with open(os.path.join(idx, "_chunk_ingest_high_water"), "w") as f:
        f.write("0")  # as if batch 1's marker write was lost
    chunk_ingest_batch(spark, b1, 1, "t_chunk_b", idx, out)
    assert (
        sorted(tuple(r) for r in spark.read.parquet(out).collect())
        == before
    )
    assert spark.table("t_chunk_b_chunk_hashes").count() == n_hashes


def test_stream_chunk_ingest_end_to_end(spark, tmp_path):
    """The writeStream smoke: the corpus through an actual file-source
    stream lands the one-shot chunk-dedup result. One id-ordered file
    — the monotone-id precondition every ingest here states (file-
    split streams deliver files in discovery order, not id order; an
    upstream writer satisfies the precondition by construction, a
    repartitioned test fixture does not — verified: a 3-way random
    split double-lands the chunk whose first occurrence streams
    late). Multi-batch semantics are pinned by the direct-drive
    tests above."""
    from mapreducekmean_spark.streaming.jobs import stream_chunk_ingest

    docs = _chunky_docs(spark)
    src = str(tmp_path / "src")
    docs.coalesce(1).sortWithinPartitions("doc_id").write.parquet(src)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    idx = str(tmp_path / "sidx")
    out = str(tmp_path / "sout")
    stream_chunk_ingest(stream, "t_chunk_s", idx, out)
    landed = spark.read.parquet(out)
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_hash) for r in landed.collect()
    )
    assert got == _one_shot_chunks(spark, docs)
