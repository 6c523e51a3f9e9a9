"""Count-min sketch — fixed-size frequency estimation over unbounded
token streams.

The reference has no sketches (its only aggregate is the per-cluster
mean, ``/root/reference/src/MapReduceKMean/PointsReducer.java`` — see
SURVEY §2.1 R7-R9); the engine already ships HLL (distinct counts,
``operators/events.py``) and this module adds the other classic:
Cormode-Muthukrishnan count-min (2005, public algorithm) for frequency /
heavy-hitter queries where the vocabulary is too large to aggregate
exactly.

Why a sketch at 100 TB: exact ``word_count`` shuffles one row per
distinct (task, token) pair — fine for word-like vocabularies, ruinous
for URLs, n-grams, or user-agent strings with billions of distincts.
The CMS counter table is ``depth × width`` cells NO MATTER THE INPUT:
partial aggregation reduces every task's contribution to at most d×w
rows before the exchange, and the merged table is a few KB. Counters
are mergeable by cell-wise addition, so sketches from separate
partitions, days, or clusters combine losslessly — the property that
makes them the standard streaming/rollup summary.

Engine mapping: everything is codegen'd string/aggregate work — the
j-th hash row's bucket for a token is the j-th ``width_hex``-hex-char
slice of ``md5(token)`` (width = 16^width_hex buckets; one md5 per
token feeds all depth rows), so both the bucket function and the
counters are reproducible in any engine with md5 (the same
no-hex-to-int, one-permutation tricks the MinHash family uses:
fixed-width lowercase hex compares like the integer it encodes).
Estimates carry the standard guarantee: est >= true count always
(collisions only ADD), and est <= true + eps·N with probability
1 - delta for depth = ln(1/delta), width = e/eps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducekmean_spark.operators.text import tokens

#: depth 4 → error bound holds with prob ~1 - e^-4; width 16^2 = 256
#: buckets → eps = e/256 ≈ 1% of total stream length per estimate.
CMS_DEPTH = 4
CMS_WIDTH_HEX = 2


def _bucket(col, j: int, width_hex: int):
    """Hash row ``j``'s bucket id: the j-th ``width_hex``-char slice of
    ONE md5 — the same one-permutation-hashing trick the MinHash family
    uses (md5's 128 bits supply depth × width_hex ≤ 32 independent hex
    digits). Sharing one md5 across all depth rows measured ~20% off
    the 500k-doc probe vs d salted md5s; the remaining cost is the
    depth× row expansion through the aggregate, which is the sketch's
    honest price. Fixed-width lowercase hex is directly groupable/
    joinable — no hex→int conversion anywhere."""
    return F.substring(F.md5(col), 1 + j * width_hex, width_hex)


def cms_counters(
    docs: DataFrame,
    depth: int = CMS_DEPTH,
    width_hex: int = CMS_WIDTH_HEX,
) -> DataFrame:
    """Build the sketch: a ``(j, bucket, cnt)`` counter table of at most
    depth × 16^width_hex rows.

    One explode of the token stream, one projection computing all
    ``depth`` buckets (slices of a shared md5), one stack to (j, bucket)
    rows, ONE aggregation —
    and because the group key space is tiny and uniform (md5 buckets),
    partial aggregation collapses each task's output to ≤ d×w rows
    regardless of how many tokens it scanned. This is the fixed-size
    shuffle exact word_count cannot have.
    """
    if depth * width_hex > 32:
        raise ValueError("md5 supplies 32 hex chars: depth*width_hex <= 32")
    tok = docs.select(F.explode(tokens("text")).alias("w"))
    pairs = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col("w"), j, width_hex).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jb")
    )
    return (
        pairs.select("jb.j", "jb.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    queries: DataFrame,
    counters: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width_hex: int = CMS_WIDTH_HEX,
) -> DataFrame:
    """Point-query the sketch: for each row of ``queries``, the CMS
    estimate = min over hash rows of that row's bucket counter.

    Shape: explode the query tokens to (token, j, bucket), ONE equi hash
    join against the counter table (broadcast — it is d×w rows by
    construction), min per token. Tokens whose bucket row is absent
    (possible only for tokens never counted) estimate 0.
    """
    if depth * width_hex > 32:
        raise ValueError("md5 supplies 32 hex chars: depth*width_hex <= 32")
    q = queries.select(
        F.col(token_col).alias("token"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(token_col), j, width_hex).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jb"),
    ).select("token", "jb.j", "jb.bucket")
    joined = q.join(F.broadcast(counters), ["j", "bucket"], "left")
    return joined.groupBy("token").agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est")
    )


def cms_heavy_hitters(
    docs: DataFrame,
    threshold_frac: float = 0.01,
    depth: int = CMS_DEPTH,
    width_hex: int = CMS_WIDTH_HEX,
) -> DataFrame:
    """Heavy hitters with audit columns: every distinct token whose CMS
    estimate reaches ``threshold_frac`` of total token volume, with the
    exact count alongside (fixture-scale audit; at 100 TB one would
    ship only the sketch columns and skip the exact branch).

    Guarantee surfaced in the output: ``est >= n`` always (the sketch
    never undercounts), so the heavy-hitter set is a SUPERSET of the
    true one — the sketch may admit a near-threshold token, never drop
    a true heavy hitter.
    """
    counters = cms_counters(docs, depth, width_hex)
    exact = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    total = exact.agg(F.sum("n").alias("t"))
    est = cms_estimate(exact, counters, "token", depth, width_hex)
    out = (
        exact.join(est, "token")
        .crossJoin(F.broadcast(total))
        .filter(F.col("est") >= F.col("t") * threshold_frac)
    )
    return out.select(
        "token",
        F.col("n").cast("bigint").alias("n"),
        "est",
        (F.col("est") >= F.col("n")).alias("never_undercounts"),
    )


#: Bottom-k quantile sketch: per-group sample size and the md5 seed.
#: k=256 → quantile standard error ≈ sqrt(p(1-p)/k) ≤ ~3.1 percentile
#: points — the classic SRS bound, checked in tests.
QSK_K = 256
QSK_SEED = 41


def bottomk_sample(ev: DataFrame, k: int = QSK_K,
                   seed: int = QSK_SEED) -> DataFrame:
    """The third classic sketch next to HLL and count-min: a MERGEABLE
    quantile summary. The state per event type is the ``k`` rows whose
    ``md5(seed|event_id)`` is smallest — a bottom-k (KMV-style) sample,
    i.e. a uniform random sample without replacement keyed by a
    deterministic hash, so unlike KLL/t-digest every byte of the sketch
    is engine-reproducible and the DuckDB twin value-hashes exactly.

    Mergeable EXACTLY: bottom-k of a union is the bottom-k of the
    concatenated bottom-k's (min-union — pinned in tests, and what the
    streaming runner exploits per batch). Bounded: k rows per group, no
    matter the stream length.

    Scale shape: the rank rides a window ORDERED BY the computed hash
    key, so WindowGroupLimit prunes every task to k rows per group
    BEFORE the exchange — the sketch is built map-side, exactly like
    the CMS counters.

    Output: ``(event_type, skey, cents)``, the sample rows."""
    from pyspark.sql import Window

    from mapreducekmean_spark.operators.events import _finite_value

    fin = _finite_value(ev)
    key = F.md5(
        F.concat_ws(
            "|", F.lit(str(int(seed))), F.col("event_id").cast("string")
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("skey").asc(), F.col("event_id").asc()
    )
    return (
        fin.select(
            "event_type",
            key.alias("skey"),
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .select("event_type", "skey", "cents")
    )


def sketch_quantiles(
    ev: DataFrame, k: int = QSK_K, seed: int = QSK_SEED
) -> DataFrame:
    """Quantile ESTIMATES off the bottom-k sketch: type-1 positional
    picks (the ``value_quantiles`` arithmetic) over the ≤k sample rows
    per event type — integer index math over actual data values, so
    the estimates value-hash exactly; accuracy is the plain
    simple-random-sample bound (±~3 percentile points at k=256),
    checked against the exact quantiles in tests.

    Output: ``(event_type, n_sampled, p50_est, p90_est, p99_est)``
    (cents as bigint — no float anywhere)."""
    from pyspark.sql import Window

    s = bottomk_sample(ev, k=k, seed=seed)
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents", "skey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = s.withColumn("cum", F.count(F.lit(1)).over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )

    def pick(num: int, den: int):
        pos = F.expr(f"(n * {num} + {den - 1}) div {den}")
        return F.min(F.when(F.col("cum") >= pos, F.col("cents")))

    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_sampled"),
        pick(1, 2).alias("p50_est"),
        pick(9, 10).alias("p90_est"),
        pick(99, 100).alias("p99_est"),
    )


def merge_bottomk(samples: DataFrame, k: int = QSK_K) -> DataFrame:
    """Merge bottom-k sketches (cell-wise min-union): concatenate the
    sample tables, keep each group's k smallest keys again. Exact by
    construction — a row is in the union's bottom-k iff its key is
    among the k smallest overall, and any such row survived its own
    batch's bottom-k. Duplicate (event_type, skey) rows — the same event
    present in two merged sketches, e.g. an overlapping or replayed
    micro-batch — are collapsed first, so the merged sample never holds
    the same event twice (which would displace genuine k-smallest keys);
    a no-op for disjoint batches, so exactness is unconditional."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.col("skey").asc())
    return (
        samples.dropDuplicates(["event_type", "skey"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .select("event_type", "skey", "cents")
    )
