"""CDC merge + SCD2 history: semantics on hand-built frames, fixture
invariants, and the no-base-shuffle plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducekmean_spark.operators import cdc
from mapreducekmean_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
)
from mapreducekmean_spark.sources import load_table


def test_cdc_merge_semantics_tiny(spark):
    """Hand-checkable MERGE: update, delete, insert, and a two-change
    key where the higher seq must win."""
    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "k bigint, v bigint"
    )
    changes = spark.createDataFrame(
        [
            (2, 1, "U", 21),  # plain update
            (3, 1, "D", None),  # delete
            (5, 1, "I", 50),  # insert
            (4, 1, "U", 41),  # superseded by seq 2 …
            (4, 2, "U", 42),  # … which wins
        ],
        "k bigint, seq int, op string, v bigint",
    )
    got = {
        (r.k, r.v)
        for r in cdc.cdc_merge(base, changes, key="k").collect()
    }
    assert got == {(1, 10), (2, 21), (4, 42), (5, 50)}


def test_cdc_merge_delete_wins_when_last(spark):
    """A delete with the highest seq must remove the key even if an
    earlier change in the same batch upserted it."""
    base = spark.createDataFrame([(1, 10)], "k bigint, v bigint")
    changes = spark.createDataFrame(
        [(1, 1, "U", 11), (1, 2, "D", None)],
        "k bigint, seq int, op string, v bigint",
    )
    assert cdc.cdc_merge(base, changes, key="k").count() == 0


def test_orders_cdc_snapshot_invariants(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    snap = cdc.orders_cdc_snapshot(orders).cache()
    base_keys = {r.o_orderkey for r in orders.select("o_orderkey").collect()}
    snap_rows = snap.collect()
    snap_keys = {r.o_orderkey for r in snap_rows}
    deleted = {k for k in base_keys if k % cdc.DELETE_MOD == 0}
    inserted = {
        k + cdc.INSERT_KEY_OFFSET
        for k in base_keys
        if k % cdc.INSERT_MOD == 0
        and k % cdc.UPDATE_MOD != 0
        and k % cdc.DELETE_MOD != 0
    }
    assert deleted and inserted  # fixture exercises every branch
    assert snap_keys == (base_keys - deleted) | inserted
    # updated keys carry the bumped price; second update wins on %21
    base_cents = {
        r.o_orderkey: r.c
        for r in orders.select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("c"),
        ).collect()
    }
    by_key = {r.o_orderkey: r for r in snap_rows}
    for k in base_keys - deleted:
        if k % cdc.SECOND_UPDATE_MOD == 0:
            assert by_key[k].price_cents == base_cents[k] + cdc.SECOND_BUMP_CENTS
            assert by_key[k].o_orderstatus == "P"
        elif k % cdc.UPDATE_MOD == 0:
            assert by_key[k].price_cents == base_cents[k] + cdc.UPDATE_BUMP_CENTS
            assert by_key[k].o_orderstatus == "F"
        else:
            assert by_key[k].price_cents == base_cents[k]
    snap.unpersist()


def test_cdc_merge_never_shuffles_base(spark, sf_small):
    """The scale property: the snapshot side reaches its anti-join
    without an Exchange (the batch side broadcasts); no sort-merge
    join anywhere in the plan."""
    orders = load_table(spark, sf_small, "orders")
    df = cdc.orders_cdc_snapshot(orders)
    df.collect()  # let AQE finalize
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # zero shuffles in the merge plan itself: the batch's max-by-seq
    # aggregate ran once inside the localCheckpoint job, and the
    # snapshot scan feeds the anti-join directly
    assert count_exchanges(df) == 0


def test_scd2_segments_tile_each_user(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    hist = cdc.scd2_history(ev).collect()
    per_user: dict[int, list] = {}
    for r in hist:
        per_user.setdefault(r.user_id, []).append(r)
    n_events = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for uid, segs in per_user.items():
        segs.sort(key=lambda r: r.seg_id)
        assert [s.seg_id for s in segs] == list(range(1, len(segs) + 1))
        assert sum(s.n_events for s in segs) == n_events[uid]
        assert [s.is_current for s in segs] == [False] * (len(segs) - 1) + [
            True
        ]
        for a, b in zip(segs, segs[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.status != b.status  # runs are maximal
        assert segs[-1].valid_to_us is None
