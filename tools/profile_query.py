"""Per-query profiler for the optimization rounds (guide §1).

For each named catalog key: run the query to the noop sink (same timed
action as bench.py), and report wall seconds, Spark JOB count, total
task count, and max single-stage task count — the fixed-overhead
profile the bench's one wall number hides. Multi-job queries (iterative
loops, localCheckpoint materializations, driver counts) pay a scheduling
round-trip per job, which dominates at bench scale when the container is
starved.

Usage:
  python tools/profile_query.py key [key ...]       # profile
  python tools/profile_query.py --plan key [...]    # also dump
      plans/<round>/<key>_{before|after}.txt (formatted explain), phase
      controlled by --phase before|after, round dir by --round rNN
      (default r15)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from varda_spark.catalog import REGISTRY  # noqa: E402
from varda_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def profile(spark, name: str, runs: int = 2) -> dict:
    sc = spark.sparkContext
    best = float("inf")
    jobs = tasks = stages = 0
    for i in range(runs):
        group = f"profile-{name}-{i}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        st = sc.statusTracker()
        job_ids = st.getJobIdsForGroup(group)
        if dt < best:
            best = dt
            jobs = len(job_ids)
            tasks = stages = 0
            for j in job_ids:
                ji = st.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = st.getStageInfo(s)
                    if si is not None and si.numTasks > 0:
                        stages += 1
                        tasks += si.numTasks
        sc.setJobGroup(None, None)
    return {"wall": round(best, 3), "jobs": jobs, "stages": stages, "tasks": tasks}


def main() -> None:
    args = sys.argv[1:]
    dump_plan = "--plan" in args
    phase = "before"
    rnd = "r15"
    if "--phase" in args:
        phase = args[args.index("--phase") + 1]
        args.remove("--phase")
        args.remove(phase)
    if "--round" in args:
        rnd = args[args.index("--round") + 1]
        args.remove("--round")
        args.remove(rnd)
    keys = [a for a in args if not a.startswith("--")]
    spark = get_spark("profile")
    # warm-up: touch tables + one trivial query so JVM/codegen startup
    # is not charged to the first profiled key
    from varda_spark.sources.tables import read_table

    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        read_table(spark, SF_DIR, t).count()
    print(f"{'key':30s} {'wall':>7s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    for name in keys:
        p = profile(spark, name)
        print(
            f"{name:30s} {p['wall']:7.3f} {p['jobs']:5d} {p['stages']:7d} {p['tasks']:6d}"
        )
        if dump_plan:
            out = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", rnd, f"{name}_{phase}.txt",
            )
            os.makedirs(os.path.dirname(out), exist_ok=True)
            df = REGISTRY[name].fn(spark, SF_DIR)
            with open(out, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
    spark.stop()


if __name__ == "__main__":
    main()
