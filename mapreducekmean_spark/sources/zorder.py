"""Z-order (Morton-curve) file layout for MULTI-column data skipping.

A sorted layout gives parquet min/max pruning on ONE column: files are
narrow in the sort key and span everything else. Interleaving the bits
of two columns into a Morton code and range-partitioning + sorting by it
makes every file a small RECTANGLE in (a, b) space — narrow in BOTH
columns at once — so a selective predicate on EITHER column excludes
most files by footer stats alone (row-group pruning via Spark's parquet
filter pushdown, file pruning in any stats-aware reader). This is the
public Delta Lake ``OPTIMIZE ZORDER BY`` / Databricks data-skipping
idea re-expressed on plain parquet; the reference engine (three Java
files, one K-Means job) has no layout surface at all.

Scale shape: one 1-row min/max aggregate per column (for the linear
16-bit scaling), one narrow projection computing the integer Morton
code (pure shifts/masks — whole-stage codegen), one
``repartitionByRange`` shuffle on the code (the same single layout
shuffle any sorted write pays), in-partition sort, write. Nothing here
is driver-bound and the code column is dropped before the write.

The curve quality claim is MEASURED, not asserted: tests and the scale
probe read the written footers (pyarrow) and check that the fraction of
files whose [min, max] can serve a mid-range predicate is small on BOTH
z-ordered columns, while a linearly-sorted layout of the same data
skips on its sort column only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the Morton code (2 × 16 = 32-bit codes).
Z_BITS = 16


def _scale16(col: Column, mn: Column, mx: Column) -> Column:
    """Linear map of ``col`` into [0, 65535] as a bigint — the rank a
    value's bits get on the curve. Degenerate range (mn == mx) maps to
    0. Integer arithmetic after one division keeps it deterministic
    enough for a LAYOUT decision (the layout never changes query
    results, only which files a predicate can skip)."""
    span = mx - mn
    frac = F.when(
        span > 0, (col.cast("double") - mn) / span
    ).otherwise(F.lit(0.0))
    return F.least(
        F.floor(frac * ((1 << Z_BITS) - 1)).cast("bigint"),
        F.lit((1 << Z_BITS) - 1),
    )


def _interleave(a16: Column, b16: Column) -> Column:
    """Morton code: bit i of ``a16`` lands at position 2i, bit i of
    ``b16`` at 2i+1. Disjoint positions, so the OR is a plain sum —
    32 shift/mask terms in one whole-stage-codegen expression."""
    z = F.lit(0).cast("bigint")
    for i in range(Z_BITS):
        z = z + F.shiftleft(
            F.shiftright(a16, i).bitwiseAND(F.lit(1)), 2 * i
        ).cast("bigint")
        z = z + F.shiftleft(
            F.shiftright(b16, i).bitwiseAND(F.lit(1)), 2 * i + 1
        ).cast("bigint")
    return z


def z_value(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Attach the Morton code ``_z`` for two numeric columns, scaled to
    16 bits each over the frame's own min/max (one 1-row aggregate,
    broadcast back via crossJoin — the bounded-stats pattern every
    layout tool here uses)."""
    stats = df.agg(
        F.min(col_a).cast("double").alias("_amn"),
        F.max(col_a).cast("double").alias("_amx"),
        F.min(col_b).cast("double").alias("_bmn"),
        F.max(col_b).cast("double").alias("_bmx"),
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    a16 = _scale16(F.col(col_a), F.col("_amn"), F.col("_amx"))
    b16 = _scale16(F.col(col_b), F.col("_bmn"), F.col("_bmx"))
    return with_stats.withColumn("_z", _interleave(a16, b16)).drop(
        "_amn", "_amx", "_bmn", "_bmx"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 64,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Morton curve of (``col_a``, ``col_b``): ``repartitionByRange`` on
    the code (contiguous curve segments per file — the property that
    makes each file a small rectangle), in-partition sort so row groups
    inherit the clustering, code column dropped before the write."""
    z = z_value(df, col_a, col_b)
    (
        z.repartitionByRange(int(n_files), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skip_fraction(path: str, col: str, lo, hi) -> float:
    """MEASURE the layout: the fraction of parquet files under ``path``
    whose footer [min, max] for ``col`` proves they hold NO row in
    [lo, hi] — exactly the files a stats-aware reader never opens (and
    the row groups Spark's parquet pushdown drops). Driver-side footer
    reads only — no data pages touched."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mns, mxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mns.append(c.statistics.min)
                    mxs.append(c.statistics.max)
        if mns and (min(mns) > hi or max(mxs) < lo):
            skipped += 1
    return skipped / len(files) if files else 0.0
