#!/usr/bin/env python
"""Per-job/stage breakdown for one registered (or bench-extra) query.

Usage: python tools/profile_query.py <query_name> [sf_dir] [reps]

Runs the query through the noop sink (bench methodology) in a session
with the UI enabled, then dumps every Spark job (description, wall,
stage count) and the heaviest stages (shuffle read/write bytes, task
count, task-time sum) from the UI REST API. This is the guide-§1
empirical loop in one command: find WHERE the seconds go before
touching anything.

Timed identically to bench.py (perf_counter around the noop write), so
the headline number here should reproduce the bench median modulo
noise. Rep 2+ shows the steady-state (JVM/code-cache warm) cost.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    import bench
    from vector_io_spark.queries import QUERIES
    from vector_io_spark.session import get_spark

    registry = dict(QUERIES)
    registry.update(bench._extra_queries())
    if name not in registry:
        raise SystemExit(f"unknown query {name!r}")

    spark = get_spark(
        app_name=f"profile_{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    sc = spark.sparkContext

    # same warmup as bench.py: tables + the pandas-UDF worker pool
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    for t in ("region", "nation", "customer", "orders", "lineitem",
              "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    warm = pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, 32).select(warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    # prime memoized *_probe builds exactly as bench.py does
    if name.endswith("_probe"):
        registry[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    base = sc.uiWebUrl
    app_id = sc.applicationId

    def jobs_json():
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded"
        ) as r:
            return json.load(r)

    def stages_json():
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    walls = []
    for rep in range(reps):
        j0 = max((j["jobId"] for j in jobs_json()), default=-1)
        s0 = max((s["stageId"] for s in stages_json()), default=-1)
        sc.setJobDescription(f"{name} rep{rep}")
        t0 = time.perf_counter()
        registry[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        walls.append(wall)
        print(f"\n=== {name} rep{rep}: wall {wall:.3f}s ===")
        jobs = [j for j in jobs_json() if j["jobId"] > j0]
        jobs.sort(key=lambda j: j["jobId"])
        tot = 0.0
        for j in jobs:
            t_sub = j.get("submissionTime", "")
            t_cmp = j.get("completionTime", "")
            dur = _dur(t_sub, t_cmp)
            tot += dur
            desc = (j.get("description") or j.get("name") or "")[:90]
            print(
                f"  job {j['jobId']:>4} {dur:7.3f}s "
                f"stages={len(j.get('stageIds', []))} {desc}"
            )
        print(f"  sum of job walls: {tot:.3f}s over {len(jobs)} jobs "
              f"(gaps = driver-side time: planning, numpy, collect use)")
        stages = [s for s in stages_json() if s["stageId"] > s0]
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print("  heaviest stages by executor task-time:")
        for s in stages[:12]:
            print(
                f"    stage {s['stageId']:>5} taskTime={s['executorRunTime']/1e3:7.2f}s "
                f"tasks={s['numCompleteTasks']:>3} "
                f"in={s.get('inputBytes', 0)>>10}K "
                f"sRead={s.get('shuffleReadBytes', 0)>>10}K "
                f"sWrite={s.get('shuffleWriteBytes', 0)>>10}K "
                f"{(s.get('description') or s.get('name') or '')[:60]}"
            )
    print(f"\nwalls: {[round(w, 3) for w in walls]}")


def _dur(a: str, b: str) -> float:
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    try:
        return (
            datetime.strptime(b.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            - datetime.strptime(a.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        ).total_seconds()
    except Exception:
        return 0.0


if __name__ == "__main__":
    main()
