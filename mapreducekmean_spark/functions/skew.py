"""Skew-handling join utilities for the 100 TB path.

Spark's own partial aggregation makes salted *aggregation* unnecessary
(map-side combine bounds any per-key reducer load at k rows per
partition), and AQE's skew-join splitting (enabled in ``session.py``)
handles most skewed sort-merge joins at runtime. ``salted_join`` is the
explicit fallback for the remaining case: a shuffle join where one hot
key overflows a task even after AQE splitting (e.g. a power-law user_id
against a per-user dimension), or engines/configs where AQE is off.

Mechanics: the big side scatters each row into one of ``n_salts``
sub-keys; the small side is replicated ``n_salts`` times (explode of a
literal range — a size-n broadcastable blowup, NOT a shuffle); the join
key becomes (key, salt), so the hot key's rows spread over ``n_salts``
tasks. Result is row-identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side's hot
    keys scattered across ``n_salts`` sub-partitions.

    ``small`` must be join-key-unique-agnostic safe to replicate (it is
    replicated verbatim; duplicate small-side keys behave exactly as in
    the plain join). Supported ``how``: inner / left (semantics where
    replication is row-preserving).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    big_s = big.withColumn(
        _SALT, F.floor(F.rand(seed) * n_salts).cast("int")
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [on, _SALT], how)
    return out.drop(_SALT)


def shuffle_width(df: DataFrame) -> int:
    """The session's configured shuffle width — the partition count an
    un-coalesced exchange would use. Explicitly repartitioning a
    CPU-bound stage to this width (on the keys the downstream stages
    cluster by) opts that one exchange out of AQE's byte-based
    coalescing — which packs small-byte/CPU-heavy stages into 1-2
    tasks — while staying exactly as scale-adaptive as the config the
    cluster already carries (optimization r14, guide §2.2/§7.3)."""
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto" on some builds
        return int(df.sparkSession.sparkContext.defaultParallelism)


def widen_narrow_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a NARROW input whose plan has fewer
    partitions than the session's parallelism, so a downstream per-row
    kernel (Arrow decode pass, heavyweight projection) actually runs in
    parallel (optimization r14, guide §2.5 "input skew … repartition
    immediately after the read" / §6 input splits).

    A single-file, single-row-group parquet scan is ONE task no matter
    the cluster — every Python-boundary kernel fused onto it runs
    serially (measured: the 5000-asset real-codec decode queries spent
    ~2 s in ONE task at local[32]). The repartition is conditional and
    scale-adaptive: at production scale the scan already has at least
    ``defaultParallelism`` splits and this is the identity — no extra
    exchange is ever added on a well-partitioned input. The shuffle it
    adds on narrow inputs moves only the rows the kernel needs (callers
    project first), and round-robin keeps sizes uniform by construction.

    Probe honesty: ``df.rdd.getNumPartitions()`` observes the PRE-AQE
    scan split count by running physical planning for the (narrow,
    already-projected) input on the driver — a deliberate heuristic.
    Post-shuffle AQE coalescing never applies to a bare scan, so for
    the map-only inputs this guards the count is exact; the planning
    pass costs driver milliseconds per builder call (measured ~15 ms on
    the fixture scans — bounded by the projection's plan size, not by
    data). Deriving the width from ``inputFiles()`` instead was
    considered and rejected: one production-sized file still carries
    many row-group splits, so a file-count probe would mis-classify it
    as narrow and add a real exchange at scale — the exact regression
    this conditional exists to prevent.
    """
    sc = df.sparkSession.sparkContext
    target = int(min_parts or sc.defaultParallelism)
    if target <= 1 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
