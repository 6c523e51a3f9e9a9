"""Dump ``explain("formatted")`` for declared queries to plans/r15/.

Usage:
    python scripts/dump_plans.py before [query ...]
    python scripts/dump_plans.py after  [query ...]

With no query names, dumps every declared query. The suffix names the
file: ``plans/r15/<query>_<suffix>.txt``. Building a query's DataFrame
may execute its eager prologue (iterative loops, index landing) — this
is a measurement tool, not a bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducekmean_spark import get_spark  # noqa: E402
from mapreducekmean_spark.contract import registry  # noqa: E402
from mapreducekmean_spark.plans.inspect import formatted_plan  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    reg = registry()
    targets = names or sorted(reg)
    for name in targets:
        try:
            df = reg[name].fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001 - record, keep going
            plan = f"ERROR building plan: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
