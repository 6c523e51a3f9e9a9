"""BM25 retrieval: pinned to a from-scratch pure-Python reference (the
ln() in idf is not cross-engine hashable, so the oracle discipline here
is an independent reimplementation rather than a DuckDB twin)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from mapreducekmean_spark.operators.search import (
    BM25_B,
    BM25_K1,
    bm25_search,
    corpus_stats_for_search,
    term_frequencies,
)
from mapreducekmean_spark.operators.text import TOKEN_RE, documents


def _bm25_reference(rows, query, k1=BM25_K1, b=BM25_B):
    """Textbook BM25 computed with plain dicts from (doc_id, text)."""
    toks = {d: re.findall(TOKEN_RE, t.lower()) for d, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    q_terms = sorted(set(query.lower().split()))
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in q_terms
    }
    out = {}
    for d, v in toks.items():
        s, matched = 0.0, 0
        for q in q_terms:
            tf = v.count(q)
            if tf == 0 or df[q] == 0:
                continue
            matched += 1
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(v) / avgdl)
            )
        if matched:
            out[d] = (round(s, 6), matched)
    return out


def test_bm25_matches_pure_python_reference(spark, sf_oracle):
    docs = documents(spark, sf_oracle)
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    query = "table scan window"
    ref = _bm25_reference(rows, query)
    got = bm25_search(docs, query, top_n=25).collect()
    assert len(got) == 25 and len(ref) >= 25
    ranked = sorted(
        ref.items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:25]
    for r, (d, (score, matched)) in zip(got, ranked):
        assert r.doc_id == d
        assert r.n_matched_terms == matched
        assert r.score == pytest.approx(score, abs=2e-6)


def test_bm25_prefers_matching_docs_and_is_deterministic(spark, sf_oracle):
    docs = documents(spark, sf_oracle)
    a = [tuple(r) for r in bm25_search(docs, "customer query", 10).collect()]
    b = [tuple(r) for r in bm25_search(docs, "customer query", 10).collect()]
    assert a == b and len(a) == 10
    assert all(r[1] > 0 for r in a)  # positive scores (smoothed idf)


def test_bm25_reuses_precomputed_index_and_stats(spark, sf_oracle):
    """Batch-query mode: the materialized tf table plus the once-
    computed corpus stats must change nothing about the results (the
    postings-bound reuse path)."""
    docs = documents(spark, sf_oracle)
    tf = term_frequencies(docs).localCheckpoint()
    n_docs, avgdl = corpus_stats_for_search(docs)
    a = [tuple(r) for r in bm25_search(docs, "vector data", 15).collect()]
    c = [
        tuple(r)
        for r in bm25_search(
            docs, "vector data", 15, tf=tf, n_docs=n_docs, avgdl=avgdl
        ).collect()
    ]
    assert a == c


def test_bm25_zero_token_docs_and_punctuated_query(spark):
    """avgdl averages over ALL documents (including empty ones — the
    textbook definition the reference implements), and the query is
    tokenized with the index's tokenizer so punctuated terms still
    match."""
    rows = [(1, "apple banana apple"), (2, "banana cherry"), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    ref = _bm25_reference(rows, "apple banana")
    got = {
        r.doc_id: r.score
        for r in bm25_search(docs, "apple, BANANA!", top_n=5).collect()
    }
    assert set(got) == set(ref)
    for d, (score, _m) in ref.items():
        assert got[d] == pytest.approx(score, abs=2e-6)


def test_bm25_empty_query_raises(spark, sf_oracle):
    with pytest.raises(ValueError):
        bm25_search(documents(spark, sf_oracle), "  ., ")


def test_bm25_indexed_matches_in_session_path(spark, sf_oracle, tmp_path):
    """Queries against the LANDED bucketed index must score identically
    to the in-session path — the index is a layout change, never a
    semantics change."""
    from mapreducekmean_spark.operators.search import (
        bm25_search_indexed,
        land_bm25_index,
    )

    docs = documents(spark, sf_oracle)
    land_bm25_index(spark, docs, "t_bm25_eq", str(tmp_path / "idx"))
    for q in ("table scan", "shuffle partition"):
        direct = [
            tuple(r) for r in bm25_search(docs, q, top_n=10).collect()
        ]
        indexed = [
            tuple(r)
            for r in bm25_search_indexed(spark, q, "t_bm25_eq").collect()
        ]
        assert indexed == direct


def test_bm25_batch_serve_matches_per_query_path(
    spark, sf_oracle, tmp_path
):
    """The one-pass batch serve path must rank and score IDENTICALLY to
    a per-query bm25_search_indexed loop (same idf, same tie-break),
    and its single postings scan must stay bucket-pruned to the union
    of the batch's terms (SelectedBucketsCount < total) — otherwise the
    batch form would silently trade n job rounds for a full index
    scan. An empty query in the batch raises like the per-query path."""
    from mapreducekmean_spark.operators.search import (
        BM25_INDEX_BUCKETS,
        bm25_search_indexed,
        bm25_search_indexed_batch,
        land_bm25_index,
    )

    docs = documents(spark, sf_oracle)
    land_bm25_index(spark, docs, "t_bm25_batch", str(tmp_path / "idx"))
    queries = [
        (0, "table scan"),
        (1, "shuffle partition"),
        (2, "window"),
    ]
    q_df = spark.createDataFrame(queries, "q_id bigint, text string")
    batch_df = bm25_search_indexed_batch(spark, q_df, "t_bm25_batch")
    got = {
        (r.q_id, r.rank): (r.doc_id, r.score, r.n_matched_terms)
        for r in batch_df.collect()
    }
    want = {}
    for q_id, text in queries:
        for rank, r in enumerate(
            bm25_search_indexed(spark, text, "t_bm25_batch").collect(), 1
        ):
            want[(q_id, rank)] = (r.doc_id, r.score, r.n_matched_terms)
    assert got == want and got

    plan = batch_df._jdf.queryExecution().executedPlan().toString()
    import re as _re

    m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, "batch serve scan lost its bucket pruning"
    assert int(m.group(1)) < int(m.group(2)) == BM25_INDEX_BUCKETS

    with pytest.raises(ValueError, match="empty query"):
        bm25_search_indexed_batch(
            spark,
            spark.createDataFrame(
                [(0, "table"), (1, "...")], "q_id bigint, text string"
            ),
            "t_bm25_batch",
        )


def test_serve_retrieval_equals_hand_composed_chain(
    spark, sf_oracle, tmp_path
):
    """The composed serving operator must equal wiring its four stages
    by hand — batch BM25 over the landed postings (self-filtered and
    re-ranked), IVF candidates over the landed cells with the batch's
    own vectors, RRF fusion, rerank with the batch's own query texts.
    Also: a free-standing query (text + vector NOT in the corpus)
    serves fine with exclude_self off."""
    from mapreducekmean_spark.operators.search import (
        bm25_search_indexed,
        cross_encoder_rerank,
        land_bm25_index,
        rrf_fuse,
        serve_retrieval,
    )
    from mapreducekmean_spark.operators.similarity import (
        ann_ivf_indexed,
        land_ivf_index_points,
    )

    docs = documents(spark, sf_oracle).withColumn(
        "embedding",
        F.expr(
            "transform(sequence(1, 8), i -> "
            "sin(cast((doc_id + 1) * i as double)))"
        ),
    ).localCheckpoint()
    vecs = docs.select(
        F.col("doc_id").alias("vec_id"), F.col("embedding").alias("emb")
    )
    bm25_dir = str(tmp_path / "bm25")
    ivf_dir = str(tmp_path / "ivf")
    land_bm25_index(spark, docs, "t_srv_bm25", bm25_dir)
    land_ivf_index_points(spark, vecs, ivf_dir, ncells=4)

    queries = docs.orderBy("doc_id").limit(3).select(
        F.col("doc_id").alias("q_id"),
        "text",
        F.col("embedding").alias("q_emb"),
    ).localCheckpoint()

    got = sorted(
        tuple(r)
        for r in serve_retrieval(
            spark, queries, "t_srv_bm25", ivf_dir, docs,
            k=3, n_cand=5, exclude_self=True,
        ).collect()
    )

    # hand-composed expectation
    sparse_rows = []
    for q in queries.collect():
        rank = 0
        for h in bm25_search_indexed(
            spark, q.text, "t_srv_bm25", top_n=6
        ).collect():
            if h.doc_id != q.q_id and rank < 5:
                rank += 1
                sparse_rows.append((q.q_id, h.doc_id, rank))
    sparse = spark.createDataFrame(
        sparse_rows, "q_id bigint, doc_id bigint, rank bigint"
    )
    dense = ann_ivf_indexed(
        spark, sf_oracle, ivf_dir, k=5,
        qs=queries.select("q_id", "q_emb"),
    ).select("q_id", F.col("neighbor_id").alias("doc_id"), "rank")
    fused = rrf_fuse([sparse, dense], k=5).localCheckpoint()
    want = sorted(
        tuple(r)
        for r in cross_encoder_rerank(
            fused, docs, k=3,
            q_texts=queries.select("q_id", F.col("text").alias("q_text")),
        ).collect()
    )
    assert got == want and len(got) == 9

    # free-standing query: its text/vector exist only in the batch
    free_q = spark.createDataFrame(
        [(10_000_000, "table scan shuffle partition",
          [0.5] * 8)],
        "q_id bigint, text string, q_emb array<double>",
    )
    out = serve_retrieval(
        spark, free_q, "t_srv_bm25", ivf_dir, docs, k=3, n_cand=5
    ).collect()
    assert len(out) == 3
    assert all(r.ce_score > 0 for r in out)  # batch text reached the scorer


def test_serve_retrieval_over_compressed_ivfpq_store(
    spark, sf_oracle, tmp_path
):
    """dense_kind='ivfpq' serves the chain off the compressed IVFADC
    store — pinned equal to hand-wiring batch sparse + ann_ivfpq_indexed
    ranks + fusion + rerank. An unknown dense_kind refuses."""
    from mapreducekmean_spark.operators.pq import (
        ann_ivfpq_indexed,
        land_ivfpq_index_points,
    )
    from mapreducekmean_spark.operators.search import (
        cross_encoder_rerank,
        land_bm25_index,
        rrf_fuse,
        serve_retrieval,
    )

    docs = documents(spark, sf_oracle).withColumn(
        "embedding",
        F.expr(
            "transform(sequence(1, 8), i -> "
            "sin(cast((doc_id + 1) * i as double)))"
        ),
    ).localCheckpoint()
    land_bm25_index(spark, docs, "t_srv_pq_bm25", str(tmp_path / "bm25"))
    pq_dir = str(tmp_path / "ivfpq")
    land_ivfpq_index_points(
        spark,
        docs.select(
            F.col("doc_id").alias("vec_id"),
            F.col("embedding").alias("emb"),
        ),
        pq_dir,
        ncells=4,
    )
    queries = docs.orderBy("doc_id").limit(3).select(
        F.col("doc_id").alias("q_id"),
        "text",
        F.col("embedding").alias("q_emb"),
    ).localCheckpoint()

    got = sorted(
        tuple(r)
        for r in serve_retrieval(
            spark, queries, "t_srv_pq_bm25", pq_dir, docs,
            k=3, n_cand=5, dense_kind="ivfpq", exclude_self=True,
        ).collect()
    )

    from mapreducekmean_spark.operators.search import (
        bm25_search_indexed,
    )

    sparse_rows = []
    for q in queries.collect():
        rank = 0
        for h in bm25_search_indexed(
            spark, q.text, "t_srv_pq_bm25", top_n=6
        ).collect():
            if h.doc_id != q.q_id and rank < 5:
                rank += 1
                sparse_rows.append((q.q_id, h.doc_id, rank))
    sparse = spark.createDataFrame(
        sparse_rows, "q_id bigint, doc_id bigint, rank bigint"
    )
    dense = ann_ivfpq_indexed(
        spark, sf_oracle, pq_dir, k=5,
        qs=queries.select("q_id", "q_emb"),
    ).select("q_id", F.col("neighbor_id").alias("doc_id"), "rank")
    fused = rrf_fuse([sparse, dense], k=5).localCheckpoint()
    want = sorted(
        tuple(r)
        for r in cross_encoder_rerank(
            fused, docs, k=3,
            q_texts=queries.select("q_id", F.col("text").alias("q_text")),
        ).collect()
    )
    assert got == want and len(got) == 9

    with pytest.raises(ValueError, match="dense_kind"):
        serve_retrieval(
            spark, queries, "t_srv_pq_bm25", pq_dir, docs,
            dense_kind="hnsw",
        )


def test_corpus_stats_null_text_and_empty_corpus(spark):
    """NULL text counts as a zero-length document in avgdl (not skipped,
    not -1 under legacy sizeOfNull); an empty corpus refuses with a
    clear error instead of TypeError(float(None)) (ADVICE r5)."""
    from mapreducekmean_spark.operators.search import (
        corpus_stats_for_search,
    )

    rows = [(1, "a b c d"), (2, None), (3, "e f")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    n, avgdl = corpus_stats_for_search(docs)
    assert n == 3
    assert avgdl == pytest.approx((4 + 0 + 2) / 3)

    empty = docs.filter("doc_id < 0")
    with pytest.raises(ValueError, match="empty corpus"):
        corpus_stats_for_search(empty)


def test_bm25_appended_index_matches_full_rebuild(
    spark, sf_oracle, tmp_path
):
    """Grow-by-append must be invisible to queries: land half the
    corpus, append the other half, and every score equals the index
    built over the whole corpus in one shot — BIT-identical, because
    the stats are integer totals (a stored float avgdl would drift
    per append). A restart between land and append exercises the
    attach + no-shadow-tables path."""
    from pyspark.sql import functions as F

    from mapreducekmean_spark.operators.search import (
        append_bm25_index,
        attach_bm25_index,
        bm25_search_indexed,
        land_bm25_index,
    )

    docs = documents(spark, sf_oracle)
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    half_a = docs.filter(F.col("doc_id") < cut)
    half_b = docs.filter(F.col("doc_id") >= cut)

    p1 = str(tmp_path / "grown")
    land_bm25_index(spark, half_a, "t_bm25_gr", p1)
    # restart simulation: catalog forgets, append must refuse, attach
    # restores
    spark.sql("DROP TABLE t_bm25_gr_tf")
    spark.sql("DROP TABLE t_bm25_gr_stats")
    with pytest.raises(ValueError, match="attach_bm25_index"):
        append_bm25_index(spark, half_b, "t_bm25_gr")
    attach_bm25_index(spark, "t_bm25_gr", p1)
    append_bm25_index(spark, half_b, "t_bm25_gr")

    p2 = str(tmp_path / "oneshot")
    land_bm25_index(spark, docs, "t_bm25_os", p2)
    for q in ("table scan", "shuffle partition"):
        grown = [
            tuple(r)
            for r in bm25_search_indexed(spark, q, "t_bm25_gr").collect()
        ]
        oneshot = [
            tuple(r)
            for r in bm25_search_indexed(spark, q, "t_bm25_os").collect()
        ]
        assert grown == oneshot


def test_bm25_compaction_restores_grain_and_keeps_pruning(
    spark, sf_oracle, tmp_path
):
    """compact_bucketed must restore the land-time one-file-per-bucket
    grain after appends WITHOUT changing the layout contract: same
    results, same bucket spec, and the query plan still prunes to the
    query terms' buckets (SelectedBucketsCount < total) — a compactor
    that silently dropped the bucket metadata would turn every query
    into a full-index scan."""
    import re

    from pyspark.sql import functions as F

    from mapreducekmean_spark.operators.search import (
        BM25_INDEX_BUCKETS,
        append_bm25_index,
        bm25_search_indexed,
        land_bm25_index,
    )
    from mapreducekmean_spark.sources.bucketing import compact_bucketed

    docs = documents(spark, sf_oracle)
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    land_bm25_index(
        spark,
        docs.filter(F.col("doc_id") < cut),
        "t_bm25_cp",
        str(tmp_path / "idx"),
    )
    append_bm25_index(spark, docs.filter(F.col("doc_id") >= cut), "t_bm25_cp")
    before = [
        tuple(r)
        for q in ("table scan", "shuffle partition")
        for r in bm25_search_indexed(spark, q, "t_bm25_cp").collect()
    ]

    stats = compact_bucketed(spark, "t_bm25_cp_tf")
    assert stats["files_after"] == BM25_INDEX_BUCKETS
    assert stats["files_after"] < stats["files_before"]

    after = [
        tuple(r)
        for q in ("table scan", "shuffle partition")
        for r in bm25_search_indexed(spark, q, "t_bm25_cp").collect()
    ]
    assert after == before
    from mapreducekmean_spark.plans import formatted_plan

    plan = formatted_plan(bm25_search_indexed(spark, "table scan", "t_bm25_cp"))
    ms = re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert ms and all(int(a) < int(b) for a, b in ms), plan


def test_bm25_append_replay_and_crash_window(spark, sf_oracle, tmp_path):
    """append_bm25_index must be idempotent under the two failure modes
    a foreachBatch caller replays into it (ADVICE r6): (a) a FULL
    replay of a completed append is a no-op — postings and stats both
    unchanged; (b) a crash BETWEEN the tf append and the stats append
    (simulated by appending tf by hand, as a half-done prior attempt
    left it) is detected by the bucket-pruned posting probe, and the
    retry appends ONLY the missing stats row — the recovered index
    scores identically to the clean path."""
    from pyspark.sql import functions as F

    from mapreducekmean_spark.operators.search import (
        BM25_INDEX_BUCKETS,
        append_bm25_index,
        bm25_search_indexed,
        land_bm25_index,
        term_frequencies,
    )
    from mapreducekmean_spark.sources.bucketing import write_bucketed

    docs = documents(spark, sf_oracle)
    cut = int(docs.approxQuantile("doc_id", [0.5], 0.0)[0])
    half_a = docs.filter(F.col("doc_id") < cut)
    half_b = docs.filter(F.col("doc_id") >= cut)

    p1 = str(tmp_path / "replayed")
    land_bm25_index(spark, half_a, "t_bm25_rp", p1)
    append_bm25_index(spark, half_b, "t_bm25_rp")
    tf_rows = spark.table("t_bm25_rp_tf").count()
    stat_rows = spark.table("t_bm25_rp_stats").count()
    append_bm25_index(spark, half_b, "t_bm25_rp")  # full replay
    assert spark.table("t_bm25_rp_tf").count() == tf_rows
    assert spark.table("t_bm25_rp_stats").count() == stat_rows

    p2 = str(tmp_path / "crashed")
    land_bm25_index(spark, half_a, "t_bm25_cr", p2)
    # half-done prior attempt: tf landed, the stats row never did
    write_bucketed(
        term_frequencies(half_b),
        "t_bm25_cr_tf",
        "term",
        BM25_INDEX_BUCKETS,
        mode="append",
    )
    append_bm25_index(spark, half_b, "t_bm25_cr")  # the retry
    assert (
        spark.table("t_bm25_cr_tf").count()
        == spark.table("t_bm25_rp_tf").count()
    )
    for q in ("table scan", "shuffle partition"):
        crashed = [
            tuple(r)
            for r in bm25_search_indexed(spark, q, "t_bm25_cr").collect()
        ]
        clean = [
            tuple(r)
            for r in bm25_search_indexed(spark, q, "t_bm25_rp").collect()
        ]
        assert crashed == clean


def test_rrf_fuse_over_bm25_and_ivf_matches_python_fusion(
    spark, sf_oracle, tmp_path
):
    """The production hybrid composition: RRF-fuse ranks from the
    landed BM25 index with ranks from the landed IVF index, and pin
    the fused top-k against a from-scratch pure-Python fusion of the
    same two rank lists — the exact 1/(60+r) arithmetic, list order,
    and (score desc, doc_id asc) tie-break."""
    from pyspark.sql import functions as F

    from mapreducekmean_spark.operators.search import (
        RRF_K,
        bm25_search_indexed,
        hybrid_topk,
        land_bm25_index,
        rrf_fuse,
    )
    from mapreducekmean_spark.operators.similarity import (
        ann_ivf_indexed,
        land_ivf_index,
    )

    docs = documents(spark, sf_oracle)
    land_bm25_index(spark, docs, "t_hyb", str(tmp_path / "bm25"))
    ivf = str(tmp_path / "ivf")
    land_ivf_index(spark, sf_oracle, ivf)

    # sparse ranks: each query doc's text against the landed BM25 index
    q_texts = {
        r.doc_id: r.text
        for r in docs.filter(F.col("doc_id") < 3).collect()
        if r.text
    }
    bm25_rows = []
    for q_id, text in q_texts.items():
        for r in bm25_search_indexed(spark, text, "t_hyb", top_n=10).collect():
            if r.doc_id != q_id:
                bm25_rows.append((q_id, r.doc_id, len(bm25_rows)))
    # re-rank per q_id (enumerate above is global)
    by_q: dict[int, list[int]] = {}
    for q_id, doc_id, _ in bm25_rows:
        by_q.setdefault(q_id, []).append(doc_id)
    sparse_rows = [
        (q, d, i + 1) for q, ds in by_q.items() for i, d in enumerate(ds)
    ]
    sparse = spark.createDataFrame(
        sparse_rows, "q_id bigint, doc_id bigint, rank bigint"
    )
    dense_df = ann_ivf_indexed(spark, sf_oracle, ivf).filter(
        F.col("q_id") < 3
    )
    dense = dense_df.select(
        "q_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )

    got = sorted(
        tuple(r) for r in rrf_fuse([sparse, dense], k=3).collect()
    )

    # pure-Python fusion of the same two lists
    dense_rows = [
        (r.q_id, r.neighbor_id, r.rank) for r in dense_df.collect()
    ]
    scores: dict[tuple[int, int], float] = {}
    for q, d, rk in sparse_rows:
        scores[(q, d)] = scores.get((q, d), 0.0) + 1.0 / (RRF_K + rk)
    for q, d, rk in dense_rows:
        scores[(q, d)] = scores.get((q, d), 0.0) + 1.0 / (RRF_K + rk)
    expect = []
    for q in {k[0] for k in scores}:
        cands = sorted(
            ((s, d) for (qq, d), s in scores.items() if qq == q),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        for i, (s, d) in enumerate(cands):
            expect.append((q, d, i + 1, round(s, 6)))
    assert got == sorted(expect) and got


def test_hybrid_topk_runs_and_ranks(spark, sf_oracle):
    """Declared-query smoke at fixture scale: 3 fused rows per query,
    ranks 1..3, fused scores within (0, 2/(RRF_K+1)]."""
    from mapreducekmean_spark.operators.search import RRF_K, hybrid_topk
    from mapreducekmean_spark.operators.similarity import N_QUERIES

    rows = hybrid_topk(spark, sf_oracle).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert len(by_q) == N_QUERIES
    for q, rs in by_q.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3]
        for r in rs:
            assert 0 < r.rrf_score <= 2 / (RRF_K + 1) + 1e-9


def test_cross_encoder_rerank_full_chain(spark, sf_oracle):
    """retrieve → fuse → rerank, pinned end to end: reranking the
    hybrid candidates with the deterministic default scorer must equal
    a pure-Python replay (same pair set, same overlap-ratio arithmetic,
    same (score desc, doc_id) tie-break) — the plumbing contract a
    real cross-encoder model drops into via scorer=."""
    import re

    from pyspark.sql import functions as F

    from mapreducekmean_spark.operators.search import (
        cross_encoder_rerank,
        hybrid_topk,
    )
    from mapreducekmean_spark.operators.text import TOKEN_RE

    docs = documents(spark, sf_oracle)
    cands = hybrid_topk(spark, sf_oracle, k=10).localCheckpoint()
    got = sorted(
        tuple(r) for r in cross_encoder_rerank(cands, docs, k=3).collect()
    )

    text = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}

    def toks(t):
        return set(re.findall(TOKEN_RE, (t or "").lower()))

    expect = []
    by_q: dict[int, list[int]] = {}
    for r in cands.collect():
        by_q.setdefault(r.q_id, []).append(r.doc_id)
    for q_id, dids in by_q.items():
        qt = toks(text.get(q_id))
        scored = []
        for d in dids:
            dt = toks(text.get(d))
            s = len(qt & dt) / len(qt | dt) if qt | dt else 0.0
            scored.append((s, d))
        top = sorted(scored, key=lambda t: (-t[0], t[1]))[:3]
        for i, (s, d) in enumerate(top):
            expect.append((q_id, d, i + 1, round(s, 6)))
    assert got == sorted(expect) and got


def test_cross_encoder_rerank_custom_scorer(spark, sf_oracle):
    """scorer= is the model integration point: a custom callable sees
    the Arrow batch's pair columns and fully controls the ordering
    (here: score by doc text length, verifying the engine applies the
    injected scores rather than any built-in)."""
    from pyspark.sql import functions as F

    from mapreducekmean_spark.operators.search import (
        cross_encoder_rerank,
        hybrid_topk,
    )

    docs = documents(spark, sf_oracle)
    cands = hybrid_topk(spark, sf_oracle, k=5).localCheckpoint()

    def by_len(q_texts, d_texts):
        return [float(len(d or "")) for d in d_texts]

    got = cross_encoder_rerank(cands, docs, k=2, scorer=by_len).collect()
    text_len = {
        r.doc_id: len(r.text or "")
        for r in docs.select("doc_id", "text").collect()
    }
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [1, 2]
        for r in rs:
            assert r.ce_score == float(text_len[r.doc_id])


def test_bm25_full_compaction_collapses_stats_log(
    spark, sf_oracle, tmp_path
):
    """compact_bm25_index after several appends: postings back to one
    file per bucket, the stats append log collapsed to one summary row
    that preserves BOTH reader semantics (summed totals) and the append
    replay guard's ceiling — a replayed append must still no-op, and a
    genuinely new batch must still append."""
    from pyspark.sql import functions as F

    from mapreducekmean_spark.operators.search import (
        BM25_INDEX_BUCKETS,
        append_bm25_index,
        bm25_search_indexed,
        compact_bm25_index,
        land_bm25_index,
    )

    docs = documents(spark, sf_oracle)
    qs = docs.approxQuantile("doc_id", [0.25, 0.5, 0.75], 0.0)
    c1, c2, c3 = int(qs[0]), int(qs[1]), int(qs[2])
    land_bm25_index(
        spark, docs.filter(F.col("doc_id") < c1), "t_bm25_fc",
        str(tmp_path / "idx"),
    )
    append_bm25_index(
        spark,
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        "t_bm25_fc",
    )
    b3 = docs.filter((F.col("doc_id") >= c2) & (F.col("doc_id") < c3))
    append_bm25_index(spark, b3, "t_bm25_fc")
    before = [
        tuple(r)
        for q in ("table scan", "shuffle partition")
        for r in bm25_search_indexed(spark, q, "t_bm25_fc").collect()
    ]
    assert spark.table("t_bm25_fc_stats").count() == 3

    stats = compact_bm25_index(spark, "t_bm25_fc")
    assert stats["tf"]["files_after"] == BM25_INDEX_BUCKETS
    assert stats["stats"]["files_after"] < stats["stats"]["files_before"]
    assert spark.table("t_bm25_fc_stats").count() == 1

    after = [
        tuple(r)
        for q in ("table scan", "shuffle partition")
        for r in bm25_search_indexed(spark, q, "t_bm25_fc").collect()
    ]
    assert after == before

    # replay of the last batch: the collapsed ceiling must still catch it
    tf_rows = spark.table("t_bm25_fc_tf").count()
    append_bm25_index(spark, b3, "t_bm25_fc")
    assert spark.table("t_bm25_fc_tf").count() == tf_rows
    # a genuinely new batch still appends
    append_bm25_index(
        spark, docs.filter(F.col("doc_id") >= c3), "t_bm25_fc"
    )
    assert spark.table("t_bm25_fc_tf").count() > tf_rows


def test_bm25_purge_matches_fresh_land_and_is_idempotent(
    spark, sf_oracle, tmp_path
):
    """purge_bm25_docs' contract: after purging, queries score
    BIT-identically to a fresh land of the remaining corpus (rows gone
    from postings, integer stats share subtracted — df, idf, and avgdl
    all re-derive exactly); re-purging the same ids is a no-op; the
    append replay ceiling survives (a purged id cannot be silently
    re-introduced by an append replay)."""
    from mapreducekmean_spark.operators.search import (
        bm25_search_indexed,
        land_bm25_index,
        purge_bm25_docs,
    )
    from mapreducekmean_spark.operators.text import documents

    docs = documents(spark, sf_oracle)
    purge_ids = [r.doc_id for r in docs.select("doc_id").limit(5).collect()]
    land_bm25_index(spark, docs, "t_bm25_purge", str(tmp_path / "idx"))

    stats = purge_bm25_docs(spark, "t_bm25_purge", purge_ids)
    assert stats["docs_purged"] == 5 and stats["rows_deleted"] > 0

    remaining = docs.filter(~docs.doc_id.isin(purge_ids))
    land_bm25_index(
        spark, remaining, "t_bm25_fresh", str(tmp_path / "fresh")
    )
    for q in ("table scan", "shuffle partition", "query plan"):
        purged = [
            tuple(r)
            for r in bm25_search_indexed(spark, q, "t_bm25_purge").collect()
        ]
        fresh = [
            tuple(r)
            for r in bm25_search_indexed(spark, q, "t_bm25_fresh").collect()
        ]
        assert purged == fresh, q
        assert not any(r[0] in purge_ids for r in purged)

    # idempotent: second purge finds nothing, stats unchanged
    stats2 = purge_bm25_docs(spark, "t_bm25_purge", purge_ids)
    assert stats2 == {"docs_purged": 0, "rows_deleted": 0}
    s = spark.table("t_bm25_purge_stats").collect()
    assert len(s) == 1
    # replay ceiling preserved: max_doc_id still the original corpus max
    orig_max = docs.agg({"doc_id": "max"}).collect()[0][0]
    assert s[0]["max_doc_id"] == orig_max

    # purging unknown ids: clean no-op
    assert purge_bm25_docs(spark, "t_bm25_purge", [10**9]) == {
        "docs_purged": 0,
        "rows_deleted": 0,
    }
