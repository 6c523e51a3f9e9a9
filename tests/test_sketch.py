"""Count-min sketch: guarantees, mergeability, bounded state, and a
cross-engine DuckDB twin (library surface — the declared-query cap is
full this round, so the oracle discipline lives here in pytest)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mapreducekmean_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH_HEX,
    cms_counters,
    cms_estimate,
    cms_heavy_hitters,
)
from mapreducekmean_spark.operators.text import documents, tokens


def test_cms_never_undercounts_and_covers_heavy_hitters(spark, sf_oracle):
    docs = documents(spark, sf_oracle)
    hh = cms_heavy_hitters(docs, threshold_frac=0.01).collect()
    assert hh, "fixture corpus has 1%-heavy tokens"
    assert all(r.never_undercounts for r in hh)
    assert all(r.est >= r.n for r in hh)

    # superset property: every TRUE heavy hitter appears
    ex = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .count()
    )
    total = ex.agg(F.sum("count")).collect()[0][0]
    true_heavy = {
        r.token for r in ex.collect() if r["count"] >= total * 0.01
    }
    got = {r.token for r in hh}
    assert true_heavy <= got


def test_cms_counter_table_bounded_and_mass_conserving(spark, sf_oracle):
    docs = documents(spark, sf_oracle)
    c = cms_counters(docs).collect()
    assert len(c) <= CMS_DEPTH * 16**CMS_WIDTH_HEX
    n_tok = docs.select(F.sum(F.size(tokens("text")))).collect()[0][0]
    by_j: dict = {}
    for r in c:
        by_j[r.j] = by_j.get(r.j, 0) + r.cnt
    # each hash row counts every token exactly once
    assert all(v == n_tok for v in by_j.values()), by_j


def test_cms_mergeable_cellwise(spark, sf_small):
    docs = documents(spark, sf_small)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    whole = {(r.j, r.bucket): r.cnt for r in cms_counters(docs).collect()}
    merged: dict = {}
    for part in (a, b):
        for r in cms_counters(part).collect():
            merged[(r.j, r.bucket)] = merged.get((r.j, r.bucket), 0) + r.cnt
    assert merged == whole


def test_cms_estimates_match_duckdb_twin(spark, sf_oracle):
    """The sketch is deterministic (md5 buckets), so a DuckDB twin must
    reproduce every per-token estimate bit-for-bit."""
    docs = documents(spark, sf_oracle)
    counters = cms_counters(docs)
    ex = docs.select(F.explode(tokens("text")).alias("token")).distinct()
    got = {
        r.token: r.est for r in cms_estimate(ex, counters).collect()
    }

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_oracle}/documents.parquet'"
    )
    twin = con.sql(
        """
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
js AS (SELECT unnest([0, 1, 2, 3]) AS j),
jb AS (
  SELECT j, substr(md5(w), 1 + j * 2, 2) AS bucket
  FROM tok CROSS JOIN js
),
c AS (SELECT j, bucket, count(*) AS cnt FROM jb GROUP BY 1, 2),
ex AS (SELECT DISTINCT w AS token FROM tok),
q AS (
  SELECT token, j, substr(md5(token), 1 + j * 2, 2) AS bucket
  FROM ex CROSS JOIN js
)
SELECT q.token, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
FROM q LEFT JOIN c USING (j, bucket)
GROUP BY 1
"""
    ).fetchall()
    assert dict(twin) == got and got


def test_bottomk_sketch_merges_exactly(spark, sf_oracle):
    """The min-union law, exactly: bottom-k of the full stream equals
    merge(bottom-k(first half), bottom-k(second half)) — the property
    the streaming runner leans on per batch. Row-identical, not
    approximate."""
    from mapreducekmean_spark.operators.events import events
    from mapreducekmean_spark.operators.sketch import (
        bottomk_sample,
        merge_bottomk,
    )

    ev = events(spark, sf_oracle)
    cut = int(ev.approxQuantile("event_id", [0.5], 0.0)[0])
    full = sorted(
        tuple(r) for r in bottomk_sample(ev).collect()
    )
    merged = sorted(
        tuple(r)
        for r in merge_bottomk(
            bottomk_sample(ev.filter(F.col("event_id") < cut)).unionByName(
                bottomk_sample(ev.filter(F.col("event_id") >= cut))
            )
        ).collect()
    )
    assert merged == full and full


def test_sketch_quantiles_within_srs_error_of_exact(spark):
    """Accuracy on a known distribution: 100k uniform values, one
    type — each estimated percentile must land within 4 standard
    errors of the true one (sqrt(p(1-p)/k) of the value range;
    deterministic sketch, so this never flakes — it either holds
    forever or the sampling is broken)."""
    import math

    from mapreducekmean_spark.operators.sketch import (
        QSK_K,
        sketch_quantiles,
    )

    n = 100_000
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.lit(1).alias("user_id"),
        F.lit("view").alias("event_type"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        # uniform over [0, 1000): value = id scrambled by a hash so
        # the sample keys and values are independent
        (
            (
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                    16, 10,
                ).cast("bigint") % 100000
            ).cast("double") / 100
        ).alias("value"),
        F.lit("{}").alias("props"),
    )
    row = sketch_quantiles(ev).collect()[0]
    assert row.n_sampled == QSK_K
    spread_cents = 100_000  # values span [0, 1000) = 100k cents
    for p, est in ((0.5, row.p50_est), (0.9, row.p90_est),
                   (0.99, row.p99_est)):
        true_cents = p * spread_cents
        se = math.sqrt(p * (1 - p) / QSK_K) * spread_cents
        assert abs(est - true_cents) <= 4 * se, (p, est, true_cents, se)


def test_merge_bottomk_collapses_overlapping_inputs(spark, sf_oracle):
    """Min-union exactness must hold for OVERLAPPING inputs too (a
    replayed or overlapping micro-batch): the same event in two merged
    sketches occupies one sample slot, so merge(bottom-k(A),
    bottom-k(A ∪ B-half)) equals the disjoint merge row for row."""
    from mapreducekmean_spark.operators.events import events
    from mapreducekmean_spark.operators.sketch import (
        bottomk_sample,
        merge_bottomk,
    )

    ev = events(spark, sf_oracle)
    cut = int(ev.approxQuantile("event_id", [0.5], 0.0)[0])
    half1 = bottomk_sample(ev.filter(F.col("event_id") < cut))
    half2 = bottomk_sample(ev.filter(F.col("event_id") >= cut))
    want = sorted(
        tuple(r) for r in merge_bottomk(half1.unionByName(half2)).collect()
    )
    # replay half1 a second time: duplicates must not displace keys
    got = sorted(
        tuple(r)
        for r in merge_bottomk(
            half1.unionByName(half2).unionByName(half1)
        ).collect()
    )
    assert got == want and want
