"""Isolated per-query timing: best-of-N for the named queries at
$SPARK_GRAFT_SF_DIR (default sf0.1), after the same reclaim + warm-up
protocol bench.py uses.  Usage: python tools/time_queries.py q1 q2 ...
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    import __spark_entry__ as entry_mod
    from lightcurvesclassifier_spark.session import get_spark
    from lightcurvesclassifier_spark.sources.testdata import TABLES, load_table

    spark = get_spark("lcc-spark-time")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    qs = entry_mod.queries()

    def _reclaim():
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    for name in names:
        fn = qs[name]
        _reclaim()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(runs):
            _reclaim()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        print(f"{name}: best={min(samples):.3f} all={[round(s,3) for s in samples]}")
    spark.stop()


if __name__ == "__main__":
    main()
