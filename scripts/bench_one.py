"""Isolate and time individual declared queries through the noop sink
(guide §1.4), with job descriptions for UI mapping (guide §1.5).

Usage:
    python scripts/bench_one.py q1 [q2 ...]        # warm (sf0.001) + 3 timed runs each
    SPARK_GRAFT_BENCH_RUNS=5 python scripts/bench_one.py q1

Prints per-run seconds and min. Same methodology as bench.py (warmup at
sf0.001, noop sink, persistent-RDD clearing between runs).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducekmean_spark import get_spark  # noqa: E402
from mapreducekmean_spark.contract import registry  # noqa: E402
from mapreducekmean_spark.functions.mat import clear_persistent_rdds  # noqa: E402


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: bench_one.py <query> [...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark("bench_one")
    reg = registry()
    for name in names:
        q = reg[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        _materialize(q.fn(spark, warm_dir))
        clear_persistent_rdds(spark)
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            _materialize(q.fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
            clear_persistent_rdds(spark)
        print(f"{name}: runs={times} min={min(times)}")


if __name__ == "__main__":
    main()
