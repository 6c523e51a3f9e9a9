"""Training export (operators/export.py): the two-level bucketed rank
must be a permutation equal to the naive global order, shards must be
round-robin balanced, and the whole layout must be a pure function of
(seed, id)."""

import hashlib

from pyspark.sql import functions as F

from mapreducekmean_spark.operators.export import (
    N_SHARDS,
    shuffle_export,
)


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in ids], "doc_id bigint, text string"
    )


def _naive(ids, seed, n_shards):
    keyed = sorted(
        (hashlib.md5(f"{seed}|{i}".encode()).hexdigest(), i) for i in ids
    )
    return {
        i: (r, r % n_shards, r // n_shards)
        for r, (_, i) in enumerate(keyed)
    }


def test_rank_matches_naive_global_order(spark):
    ids = list(range(0, 400, 3)) + [10_000_019, 2**40 + 5]
    got = {
        r.doc_id: (r.shuffle_rank, r.shard, r.pos_in_shard)
        for r in shuffle_export(_docs(spark, ids), seed=7).collect()
    }
    assert got == _naive(ids, 7, N_SHARDS)


def test_shards_balanced_and_rank_is_permutation(spark):
    n = 501  # deliberately not a multiple of the shard count
    rows = shuffle_export(_docs(spark, range(n)), seed=3).collect()
    ranks = sorted(r.shuffle_rank for r in rows)
    assert ranks == list(range(n))
    per_shard = {}
    for r in rows:
        per_shard[r.shard] = per_shard.get(r.shard, 0) + 1
    assert max(per_shard.values()) - min(per_shard.values()) <= 1
    # positions within each shard are dense from 0
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_seed_changes_order_but_not_membership(spark):
    ids = list(range(200))
    a = {
        r.doc_id: r.shuffle_rank
        for r in shuffle_export(_docs(spark, ids), seed=1).collect()
    }
    b = {
        r.doc_id: r.shuffle_rank
        for r in shuffle_export(_docs(spark, ids), seed=2).collect()
    }
    assert set(a) == set(b) == set(ids)
    assert a != b  # a different seed is a different permutation
    # and the same seed reproduces the identical layout (resume safety)
    a2 = {
        r.doc_id: r.shuffle_rank
        for r in shuffle_export(_docs(spark, ids), seed=1).collect()
    }
    assert a == a2


def test_custom_id_column(spark):
    df = spark.createDataFrame(
        [(f"u{i}", i) for i in range(50)], "uid string, x bigint"
    )
    rows = shuffle_export(df, seed=5, n_shards=4, id_col="uid").collect()
    assert sorted(r.shuffle_rank for r in rows) == list(range(50))
    assert {r.shard for r in rows} == {0, 1, 2, 3}


def test_writer_layout_partitions_by_shard(spark, tmp_path):
    """The export layout is writable as shard-partitioned parquet and
    reads back with every shard's rows dense in pos_in_shard."""
    out = shuffle_export(_docs(spark, range(100)), seed=9, n_shards=4)
    path = str(tmp_path / "shards")
    out.write.partitionBy("shard").mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 100
    dense = (
        back.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.max("pos_in_shard").alias("mx"),
            F.min("pos_in_shard").alias("mn"),
        )
        .collect()
    )
    for r in dense:
        assert (r.mn, r.mx) == (0, r.n - 1)


def test_curriculum_order_matches_naive_and_is_tier_major(spark, sf_small):
    """The distributed two-level rank must equal the naive global sort
    by (tier, md5 key, doc_id); ranks form an exact permutation and the
    tiers occupy contiguous, ordered rank ranges with every tier
    populated (the edges are chosen to split the fixture)."""
    import hashlib

    from mapreducekmean_spark.operators.export import (
        CURRICULUM_SEED,
        curriculum_order,
    )
    from mapreducekmean_spark.operators.text import documents

    docs = documents(spark, sf_small)
    rows = curriculum_order(docs).collect()
    n = docs.count()
    assert sorted(r.curriculum_rank for r in rows) == list(range(n))
    assert {r.tier for r in rows} == {0, 1, 2}
    key = lambda r: (  # noqa: E731
        r.tier,
        hashlib.md5(f"{CURRICULUM_SEED}|{r.doc_id}".encode()).hexdigest(),
        r.doc_id,
    )
    naive = [r.doc_id for r in sorted(rows, key=key)]
    dist = [
        r.doc_id for r in sorted(rows, key=lambda r: r.curriculum_rank)
    ]
    assert naive == dist
    # tier-major: rank ranges are contiguous per tier, in tier order
    by_tier = {}
    for r in rows:
        by_tier.setdefault(r.tier, []).append(r.curriculum_rank)
    hi = -1
    for t in (0, 1, 2):
        rk = sorted(by_tier[t])
        assert rk[0] == hi + 1 and rk[-1] == hi + len(rk)
        hi = rk[-1]


def test_write_shards_layout_and_order(spark, sf_small, tmp_path):
    """The written shards are the shuffle_export order made physical:
    every shard= dir holds exactly one parquet file, rows inside are in
    pos_in_shard order, and re-reading reconstructs the full rank
    permutation."""
    import os

    from mapreducekmean_spark.operators.export import (
        N_SHARDS,
        shuffle_export,
        write_shards,
    )
    from mapreducekmean_spark.operators.text import documents

    docs = documents(spark, sf_small)
    path = str(tmp_path / "shards")
    write_shards(docs, path)
    dirs = [d for d in os.listdir(path) if d.startswith("shard=")]
    assert len(dirs) == N_SHARDS
    for d in dirs:
        files = [
            f for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1  # one file per shard
    back = spark.read.parquet(path)
    want = {
        (r.doc_id, r.shard, r.pos_in_shard)
        for r in shuffle_export(docs).collect()
    }
    got = {
        (r.doc_id, r.shard, r.pos_in_shard)
        for r in back.select("doc_id", "shard", "pos_in_shard").collect()
    }
    assert got == want
    # in-file order == pos order (read one shard file directly)
    import pyarrow.parquet as pq

    d0 = os.path.join(path, dirs[0])
    f0 = os.path.join(
        d0, [f for f in os.listdir(d0) if f.endswith(".parquet")][0]
    )
    pos = pq.read_table(f0, columns=["pos_in_shard"])["pos_in_shard"].to_pylist()
    assert pos == sorted(pos)


def test_budget_sample_prefix_and_floor_semantics(spark, sf_small):
    """Per source: kept docs are exactly the md5-order prefix whose
    members start under the budget, and the kept token mass reaches the
    budget (floor semantics — the crossing doc is kept whole) unless
    the source ran out of tokens entirely."""
    from mapreducekmean_spark.operators.export import (
        TOKEN_BUDGET,
        budget_sample,
    )
    from mapreducekmean_spark.operators.text import documents

    rows = budget_sample(documents(spark, sf_small)).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert any(not r.kept for r in rows)  # the budget bites somewhere
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.cum_before)
        # cum_before is the running sum of the previous docs' tokens
        run = 0
        for r in rs:
            assert r.cum_before == run
            assert r.kept == (run < TOKEN_BUDGET)
            run += r.n_tok
        kept_toks = sum(r.n_tok for r in rs if r.kept)
        assert kept_toks >= min(TOKEN_BUDGET, sum(r.n_tok for r in rs))


def test_write_shards_rerun_is_identical(spark, sf_small, tmp_path):
    """The docstring's reproducibility claim, pinned: two independent
    exports of the same corpus produce content-identical shard files
    (rank is a pure function of (seed, id); the in-partition sort fixes
    row order, so even the parquet bytes' row sequence agrees)."""
    import hashlib
    import os

    from mapreducekmean_spark.operators.export import write_shards
    from mapreducekmean_spark.operators.text import documents

    docs = documents(spark, sf_small)

    def digest(root):
        out = {}
        for d in sorted(os.listdir(root)):
            if not d.startswith("shard="):
                continue
            (f,) = [
                x
                for x in os.listdir(os.path.join(root, d))
                if x.endswith(".parquet")
            ]
            import pyarrow.parquet as pq

            t = pq.read_table(os.path.join(root, d, f))
            out[d] = hashlib.md5(
                repr(t.to_pydict()).encode()
            ).hexdigest()
        return out

    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_shards(docs, p1)
    write_shards(docs, p2)
    d1, d2 = digest(p1), digest(p2)
    assert d1 and d1 == d2
