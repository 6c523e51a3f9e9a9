"""Warehouse maintenance: CDC merge (MERGE INTO) and SCD type-2 history.

A 100 TB corpus or fact table is never rebuilt — it is MAINTAINED: a
change-data-capture feed of inserts/updates/deletes is merged into the
snapshot, and dimension attributes that change over time are tracked as
type-2 history rows. The reference engine has nothing like this (its 3
Java files run one K-Means job; see KMeans.java); this is part of the
engine's warehouse surface next to the partition-upsert writers in
``sources/sinks.py``.

Scale design — ``cdc_merge`` never shuffles the base snapshot: the
change batch collapses to one final row per key (a key-partitioned
aggregate over the BATCH, which is orders of magnitude smaller than the
base), and the base contributes via a key anti-join that AQE turns into
a broadcast when the batch is small — the common case. The output is
``(base ⟕anti changed-keys) ∪ upserts``, i.e. exactly the MERGE INTO
semantics (WHEN MATCHED UPDATE/DELETE, WHEN NOT MATCHED INSERT) without
a full-outer join over the snapshot. ``scd2_history`` is two windows
partitioned by the dimension key — embarrassingly parallel per key,
no global state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Synthetic-change knobs for the declared query (all interpolated into
#: the DuckDB twin): which keys delete / update / insert, and the exact
#: integer-cent price adjustments, so the whole batch is a pure function
#: of the orders fixture.
DELETE_MOD = 13
UPDATE_MOD = 7
SECOND_UPDATE_MOD = 21  # subset of UPDATE_MOD keys get a 2nd change row
INSERT_MOD = 11
INSERT_KEY_OFFSET = 10_000_000
UPDATE_BUMP_CENTS = 500
SECOND_BUMP_CENTS = 700


def _cents(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def synthetic_changes(orders: DataFrame) -> DataFrame:
    """Derive a deterministic CDC batch from the ``orders`` fixture:
    deletes for keys ``% DELETE_MOD == 0``, updates (+500 cents, status
    'F') for keys ``% UPDATE_MOD == 0``, a SECOND, later update (+700
    cents total from base, status 'P') for keys ``% SECOND_UPDATE_MOD
    == 0`` — exercising last-write-wins — and inserts (key + offset,
    status 'O') for keys ``% INSERT_MOD == 0``. Precedence mirrors a
    real feed: a key can appear multiple times with increasing ``seq``.

    Output: ``(o_orderkey, seq, op, o_custkey, price_cents, o_orderstatus)``.
    """
    k = F.col("o_orderkey")
    base = orders.select(
        k.alias("o_orderkey"),
        F.col("o_custkey"),
        _cents("o_totalprice").alias("price_cents"),
        F.col("o_orderstatus"),
    )
    deletes = base.filter(k % DELETE_MOD == 0).select(
        "o_orderkey",
        F.lit(1).alias("seq"),
        F.lit("D").alias("op"),
        "o_custkey",
        F.lit(None).cast("bigint").alias("price_cents"),
        F.lit(None).cast("string").alias("o_orderstatus"),
    )
    upd = base.filter((k % UPDATE_MOD == 0) & (k % DELETE_MOD != 0))
    updates = upd.select(
        "o_orderkey",
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        "o_custkey",
        (F.col("price_cents") + UPDATE_BUMP_CENTS).alias("price_cents"),
        F.lit("F").alias("o_orderstatus"),
    )
    second = upd.filter(k % SECOND_UPDATE_MOD == 0).select(
        "o_orderkey",
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        "o_custkey",
        (F.col("price_cents") + SECOND_BUMP_CENTS).alias("price_cents"),
        F.lit("P").alias("o_orderstatus"),
    )
    inserts = base.filter(
        (k % INSERT_MOD == 0) & (k % UPDATE_MOD != 0) & (k % DELETE_MOD != 0)
    ).select(
        (F.col("o_orderkey") + INSERT_KEY_OFFSET).alias("o_orderkey"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        "o_custkey",
        F.col("price_cents"),
        F.lit("O").alias("o_orderstatus"),
    )
    return deletes.unionByName(updates).unionByName(second).unionByName(
        inserts
    )


def cdc_merge(
    base: DataFrame,
    changes: DataFrame,
    key: str = "o_orderkey",
    seq: str = "seq",
    op: str = "op",
) -> DataFrame:
    """MERGE the change batch into the snapshot with last-write-wins per
    key: the highest-``seq`` change decides — 'D' removes the key, 'U'/
    'I' upsert the change row's payload. Exactly ANSI ``MERGE INTO``
    (matched-update, matched-delete, not-matched-insert) plus the
    multi-change collapse real CDC feeds need.

    The base is never shuffled: changed keys leave via one LEFT ANTI
    join (broadcast under AQE when the batch is small — the common
    case), and the final per-key change rows come from a max-by-seq
    aggregate over the BATCH only. That collapsed batch feeds BOTH the
    anti-join and the upsert union branch, so it is localCheckpointed —
    one aggregate job, not a per-branch recompute. Payload columns =
    every non-(seq,op) column of ``changes``.
    """
    payload = [c for c in changes.columns if c not in (seq, op)]
    # one struct-max pass: (seq) ordering picks the final change per key
    final = (
        changes.groupBy(key)
        .agg(
            F.max(
                F.struct(
                    F.col(seq).alias("_s"),
                    F.col(op).alias(op),
                    *[F.col(c) for c in payload if c != key],
                )
            ).alias("_w")
        )
        .select(
            key,
            F.col(f"_w.{op}").alias(op),
            *[F.col(f"_w.{c}").alias(c) for c in payload if c != key],
        )
        .localCheckpoint(eager=False)
    )
    survivors = base.join(final.select(key), key, "left_anti")
    upserts = final.filter(F.col(op) != "D").drop(op)
    return survivors.unionByName(upserts)


def orders_cdc_snapshot(orders: DataFrame) -> DataFrame:
    """The declared-query composition: project orders to the integer-
    cent payload, derive the synthetic CDC batch, and MERGE it. Output
    is the post-merge snapshot ``(o_orderkey, o_custkey, price_cents,
    o_orderstatus)``, sorted by the driver's comparator (not here)."""
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        _cents("o_totalprice").alias("price_cents"),
        "o_orderstatus",
    )
    return cdc_merge(base, synthetic_changes(orders))


def scd2_history(ev: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type-2 history of each user's
    ``event_type`` stream: consecutive equal values collapse into one
    validity segment with ``valid_from`` (first event micros),
    ``valid_to`` (next segment's start, NULL while current),
    ``is_current``, and the segment's event count. The run-collapse is
    the classic lag-flag + running-sum segment id; both windows
    partition by ``user_id`` — no global state, skew bounded by the
    busiest user.

    Total order within a user is ``(ts, event_id)`` — event_id is
    unique, so the segmentation is deterministic and the DuckDB twin
    replays it exactly. Validity bounds are emitted as epoch
    microseconds (the ``events_sessionize`` convention: integer time,
    no cross-engine timestamp encoding in the hash).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
    ).withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    seg = flagged.withColumn(
        "seg_id",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    segs = seg.groupBy("user_id", "seg_id").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias("status"),
        F.min(F.struct("ts", "event_id")).alias("_start"),
        F.count("*").alias("n_events"),
    )
    ws = Window.partitionBy("user_id").orderBy("seg_id")
    start_us = F.unix_micros(F.col("_start.ts"))
    return segs.select(
        "user_id",
        "seg_id",
        "status",
        start_us.alias("valid_from_us"),
        F.lead(start_us).over(ws).alias("valid_to_us"),
        F.lead(start_us).over(ws).isNull().alias("is_current"),
        "n_events",
    )
