"""Per-query job/stage profile: run declared queries through the noop
sink with the Spark event log on, then summarize per query — number of
jobs, wall per job, sum of executor task time — so optimization effort
lands where the time actually goes (guide §1, §7).

Usage:
    python scripts/profile_queries.py q1 [q2 ...]

Each query runs once warm (sf0.001) and once timed (sf0.1), with job
descriptions ``timed:<query>`` so the event-log parse can group jobs.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/mrkm_eventlog"
os.makedirs(EVDIR, exist_ok=True)
os.environ.setdefault(
    "SPARK_GRAFT_EXTRA_CONF",
    f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{EVDIR};"
    "spark.eventLog.compress=false;spark.eventLog.rolling.enabled=false",
)

from mapreducekmean_spark import get_spark  # noqa: E402
from mapreducekmean_spark.contract import registry  # noqa: E402
from mapreducekmean_spark.functions.mat import clear_persistent_rdds  # noqa: E402


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: profile_queries.py <query> [...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    spark = get_spark("profile_queries")
    app_id = spark.sparkContext.applicationId
    reg = registry()
    walls = {}
    for name in names:
        q = reg[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        _materialize(q.fn(spark, warm_dir))
        clear_persistent_rdds(spark)
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.perf_counter()
        _materialize(q.fn(spark, sf_dir))
        walls[name] = round(time.perf_counter() - t0, 3)
        clear_persistent_rdds(spark)
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    hits = glob.glob(os.path.join(EVDIR, f"*{app_id}*"))
    files: list[str] = []
    for h in hits:
        if os.path.isdir(h):
            files.extend(
                p
                for p in sorted(glob.glob(os.path.join(h, "*")))
                if os.path.isfile(p) and "appstatus" not in p
            )
        else:
            files.append(h)
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}

    def _lines():
        import io

        for path in files:
            if path.endswith(".zstd"):
                import zstandard

                with open(path, "rb") as raw:
                    reader = zstandard.ZstdDecompressor().stream_reader(raw)
                    yield from io.TextIOWrapper(reader, encoding="utf-8")
            else:
                with open(path, encoding="utf-8") as fh:
                    yield from fh

    for line in _lines():
        ev = json.loads(line)
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc = ev.get("Properties", {}).get(
                "spark.job.description", ""
            )
            jobs[jid] = {
                "desc": desc,
                "t0": ev["Submission Time"],
                "task_ms": 0,
                "n_tasks": 0,
                "stages": len(ev.get("Stage Infos", [])),
            }
            for sid in ev.get("Stage IDs", []):
                stage_to_job[sid] = jid
        elif et == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["wall_ms"] = (
                    ev["Completion Time"] - jobs[jid]["t0"]
                )
        elif et == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            jid = stage_to_job.get(sid)
            if jid is not None and jid in jobs:
                ti = ev.get("Task Info", {})
                jobs[jid]["task_ms"] += ti.get("Finish Time", 0) - ti.get(
                    "Launch Time", 0
                )
                jobs[jid]["n_tasks"] += 1

    for name in names:
        tag = f"timed:{name}"
        qjobs = [j for j in jobs.values() if j["desc"] == tag]
        total_wall = sum(j.get("wall_ms", 0) for j in qjobs)
        print(
            f"\n=== {name}: wall={walls[name]}s, {len(qjobs)} jobs, "
            f"job-wall {total_wall} ms ==="
        )
        for j in sorted(qjobs, key=lambda x: -x.get("wall_ms", 0)):
            print(
                f"  job wall={j.get('wall_ms', 0):6d} ms  "
                f"stages={j['stages']:2d} tasks={j['n_tasks']:3d} "
                f"task-time={j['task_ms']:6d} ms"
            )


if __name__ == "__main__":
    main()
