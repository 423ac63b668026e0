#!/usr/bin/env python
"""Count Spark jobs + measure wall per query — the optimization round's
structural probe (job count is rig-noise-free evidence that a change
removed driver round-trips / materializations).

Usage: python scripts/probe_jobs.py q1 q2 ... [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        # slice by index (not by value) so a query literally named like
        # the runs count is never stripped
        args = args[:i] + args[i + 2 :]
    names = [a for a in args if not a.startswith("--")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from databatchprotectionservice_spark.plans import get_spark

    spark = get_spark(app_name="dbps-probe-jobs")
    qs = entrymod.queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        fn(spark, sf_dir).collect()  # warmup (fixtures, codegen)
        best = None
        jobs = None
        for _ in range(runs):
            # job ids are global; count via allJobs
            ids0 = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
            n0 = len(list(ids0))
            t0 = time.time()
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
            ids1 = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
            n1 = len(list(ids1))
            jobs = n1 - n0
            best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        print(json.dumps({name: {"jobs": jobs, "min_s": round(best, 3)}}),
              flush=True)


if __name__ == "__main__":
    main()
