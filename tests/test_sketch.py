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
