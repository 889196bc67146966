"""Per-query execution-shape profiler: wall time plus Spark job /
stage / task counts for each named query (or all of them), after the
same warm-up protocol bench.py uses.

At sf0.1 on local[32] most declared queries are dominated by FIXED
latencies — job launches, stage round-trips, broadcast builds — not by
bytes. Wall time alone cannot attribute that; this tool runs each query
under its own job group and reads the status tracker, so "this query
is 14 jobs / 63 stages" becomes a measurable optimization target
(guide §1: measure first; §7.1's UI is disabled in this sandbox, the
status tracker is the scriptable equivalent).

Usage: python tools/profile_queries.py [--all] [q1 q2 ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_all = "--all" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    import __spark_entry__ as entry_mod
    from lightcurvesclassifier_spark.session import get_spark
    from lightcurvesclassifier_spark.sources.testdata import TABLES, load_table

    spark = get_spark("lcc-spark-profile")
    sc = spark.sparkContext
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    qs = entry_mod.queries()
    if run_all:
        names = list(qs)

    def _reclaim():
        spark.catalog.clearCache()
        gc.collect()
        sc._jvm.System.gc()

    tracker = sc.statusTracker()

    def _profile(name: str) -> dict:
        fn = qs[name]
        _reclaim()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = None
        for i in range(runs):
            _reclaim()
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = 0
            n_tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is None:
                        continue
                    n_stages += 1
                    n_tasks += si.numTasks
            rec = {
                "wall": round(dt, 3),
                "jobs": len(job_ids),
                "stages": n_stages,
                "tasks": n_tasks,
            }
            if best is None or rec["wall"] < best["wall"]:
                best = rec
        return best

    out = {}
    for n in names:
        out[n] = _profile(n)
        r = out[n]
        print(
            f"{n}: wall={r['wall']:.3f} jobs={r['jobs']} "
            f"stages={r['stages']} tasks={r['tasks']}",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
