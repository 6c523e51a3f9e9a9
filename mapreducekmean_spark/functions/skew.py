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
