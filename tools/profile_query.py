"""Per-job/stage attribution for one declared query (guide §1/§7.1).

Usage: python tools/profile_query.py <query> [query ...]

Runs the query with the Spark UI enabled (warmup first, then a timed
run), then reads the UI REST API to print every job and stage of the
timed run with wall-clock duration, task count, and the stage's
first-line description — the local-mode substitute for clicking
through the Stages tab. Measurement tool only; the bench/driver path
is untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py query [query ...]")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from geist_spark.session import get_spark

    spark = get_spark(
        "profile_query",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    materialize(spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000))
    qs = entry_mod.queries()

    def rest(path: str):
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}{path}"
        ) as r:
            return json.load(r)

    for name in names:
        if name not in qs:
            print(f"{name}: NOT DECLARED")
            continue
        # warmup run (codegen + page cache), then the timed run
        materialize(qs[name](spark, sf_dir))
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        materialize(qs[name](spark, sf_dir))
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)

        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        stages = {s["stageId"]: s for s in rest("/stages")}
        tj = 0.0
        for j in jobs:
            t_sub = time.mktime(
                time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ) + float(j["submissionTime"][20:23]) / 1000.0
            t_end = time.mktime(
                time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ) + float(j["completionTime"][20:23]) / 1000.0
            dur = t_end - t_sub
            tj += dur
            print(
                f"job {j['jobId']:4d} {dur:7.3f}s tasks={j['numCompletedTasks']:5d}"
                f" stages={len(j['stageIds'])}"
            )
            for sid in sorted(j["stageIds"]):
                s = stages.get(sid)
                if not s or s.get("status") == "SKIPPED":
                    continue
                d = s.get("executorRunTime", 0) / 1000.0
                desc = (s.get("name") or "").split("\n")[0][:90]
                print(
                    f"   stage {sid:4d} execRun {d:7.3f}s tasks={s['numCompleteTasks']:4d}"
                    f" in={s.get('inputBytes',0)>>20}MB sh_r={s.get('shuffleReadBytes',0)>>10}KB"
                    f" sh_w={s.get('shuffleWriteBytes',0)>>10}KB  {desc}"
                )
        print(f"sum(job wall) {tj:.3f}s vs query wall {wall:.3f}s "
              f"(gap = driver/planning/collect time)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
