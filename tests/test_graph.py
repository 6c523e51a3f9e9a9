"""Graph analytics: degree-ordered triangle counting + deterministic
PageRank (operators/graph.py), and term-lift association mining
(operators/text.py:term_lift_topk)."""

import random

from pyspark.sql import functions as F


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "u bigint, v bigint"
    )


def _naive_triangles(edges):
    """Pure-Python reference: per-node triangle counts by canonical
    triple enumeration."""
    es = set()
    for u, v in edges:
        if u != v:
            es.add((min(u, v), max(u, v)))
    adj = {}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c <= b:
                    continue
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangles_match_naive_on_random_graphs(spark):
    """The degree-ordered wedge enumeration (out-degree bounded by the
    orientation — the O(m^1.5) shape) must count exactly what the
    naive all-triples reference counts, including on graphs with dupes
    and both edge orientations in the input."""
    from mapreducekmean_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    for n, m in [(12, 30), (25, 80), (40, 100)]:
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        # throw in reversed dupes: canonicalization must absorb them
        edges += [(v, u) for u, v in edges[: m // 3]]
        got = {
            r.node: r.triangles
            for r in triangle_counts(_edges_df(spark, edges)).collect()
        }
        assert got == _naive_triangles(edges)


def test_triangles_complete_graph(spark):
    """K5: every node sits on C(4,2) = 6 triangles — each triangle
    counted exactly once despite every wedge being closable."""
    from mapreducekmean_spark.operators.graph import triangle_counts

    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    got = {
        r.node: r.triangles
        for r in triangle_counts(_edges_df(spark, edges)).collect()
    }
    assert got == {i: 6 for i in range(5)}


def test_pagerank_star_and_ring(spark):
    """Structure checks: on a star the center outranks the (equal)
    leaves; on a ring every node's rank is IDENTICAL (bit-equal — the
    sorted-fold sum sees the same operands at every node); rank mass
    stays ~1 on both (no dangling nodes in a symmetrized graph)."""
    from mapreducekmean_spark.operators.graph import pagerank

    star = [(0, i) for i in range(1, 9)]
    rs = {r.node: r["rank"] for r in pagerank(_edges_df(spark, star)).collect()}
    assert rs[0] > max(rs[i] for i in range(1, 9))
    assert len({rs[i] for i in range(1, 9)}) == 1
    assert abs(sum(rs.values()) - 1.0) < 1e-9

    ring = [(i, (i + 1) % 10) for i in range(10)]
    rr = {r.node: r["rank"] for r in pagerank(_edges_df(spark, ring)).collect()}
    assert len(set(rr.values())) == 1
    assert abs(sum(rr.values()) - 1.0) < 1e-9


def test_pagerank_is_deterministic_across_runs(spark):
    """Two runs over the same graph must agree bit-for-bit: the
    neighbor sum folds contributions in sorted-source order, so there
    is no partition-order nondeterminism to round away."""
    from mapreducekmean_spark.operators.graph import pagerank

    rng = random.Random(11)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(90)]
    a = sorted(tuple(r) for r in pagerank(_edges_df(spark, edges)).collect())
    b = sorted(tuple(r) for r in pagerank(_edges_df(spark, edges)).collect())
    assert a == b and a


def test_term_lift_support_pushdown_is_lossless(spark):
    """Filtering terms with df < min_support BEFORE pairing must not
    change any surviving pair: a pair's support is bounded by
    min(df(x), df(y)), so the pushdown only removes pairs that could
    never reach the support floor. Pin against a no-pushdown
    reference computed in pure Python."""
    from mapreducekmean_spark.operators.text import term_lift_topk

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for d in range(40):
        toks = rng.sample(vocab, rng.randrange(2, 7))
        # rare terms (df will stay < min_support)
        if d < 2:
            toks.append(f"rare{d}")
        docs.append((d, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = [
        (r.t1, r.t2, r.c_xy, r.lift)
        for r in term_lift_topk(df, min_support=3, top_n=10).collect()
    ]

    n = len(docs)
    docsets = {d: set(t.split()) for d, t in docs}
    from collections import Counter

    dfc = Counter(t for s in docsets.values() for t in s)
    pair = Counter()
    for s in docsets.values():
        ts = sorted(s)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                pair[(ts[i], ts[j])] += 1
    want = []
    for (a, b), c in pair.items():
        if c >= 3:
            want.append((a, b, c, round(n * c / (dfc[a] * dfc[b]), 6)))
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == want[:10] and got
    assert not any(t.startswith("rare") for r in got for t in (r[0], r[1]))


def _naive_k_core(edges, k):
    es = set()
    for u, v in edges:
        if u != v:
            es.add((min(u, v), max(u, v)))
    adj = {}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items() if ns}


def test_k_core_matches_naive_peeling(spark):
    """Fixed-pass distributed peel == pure-Python peel-to-fixpoint on
    random graphs (passes raised so every case converges; the K5 core
    and pendant chains both exercised)."""
    from mapreducekmean_spark.operators.graph import k_core

    rng = random.Random(13)
    for n, m in [(15, 35), (30, 60)]:
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got = {
            r.node: r.deg
            for r in k_core(_edges_df(spark, edges), passes=12).collect()
        }
        assert got == _naive_k_core(edges, 2)
    # K5 plus a pendant path hanging off node 0: the path peels away
    # over multiple passes, the clique survives with degree 4
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(0, 10), (10, 11), (11, 12)]
    got = {
        r.node: r.deg
        for r in k_core(_edges_df(spark, edges), passes=6).collect()
    }
    assert got == {i: 4 for i in range(5)}


def test_k_core_raises_when_unconverged(spark):
    """A long path needs ~n/2 peel passes for k=2; with passes=2 the
    operator must refuse with the actionable error, never return the
    half-peeled set."""
    import pytest

    from mapreducekmean_spark.operators.graph import k_core

    path = [(i, i + 1) for i in range(12)]
    with pytest.raises(ValueError, match="raise passes"):
        k_core(_edges_df(spark, path), passes=2)
    # and with enough passes the path's 2-core is empty
    assert k_core(_edges_df(spark, path), passes=8).count() == 0
