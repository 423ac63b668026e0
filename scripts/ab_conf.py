#!/usr/bin/env python
"""Interleaved A/B of a session-conf change over a query subset.

Runs each query alternately with conf A (current session defaults) and
conf B (the candidate overrides), several repetitions, and reports the
per-query minimum under each — interleaving cancels the rig's
multi-minute contention drift that sequential passes cannot.

Usage: SPARK_GRAFT_AB='{"spark.x":"y"}' python scripts/ab_conf.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    overrides = json.loads(os.environ.get("SPARK_GRAFT_AB", "{}"))
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from databatchprotectionservice_spark.plans import get_spark

    spark = get_spark(app_name="dbps-ab-conf")
    qs = entrymod.queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    defaults = {k: spark.conf.get(k, None) for k in overrides}

    def set_conf(on: bool) -> None:
        for k, v in overrides.items():
            if on:
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

    best = {n: {"A": 9e9, "B": 9e9} for n in names}
    for n in names:  # warmup both paths once (fixtures, codegen)
        fn = qs.get(n)
        if fn is None:
            continue
        for on in (False, True):
            set_conf(on)
            fn(spark, sf_dir).collect()
        spark.catalog.clearCache()
    for rep in range(reps):
        for n in names:
            fn = qs.get(n)
            if fn is None:
                continue
            # alternate order per rep AND clear the cache between the
            # two sides: queries with internal .cache() must not let
            # one side ride the other's populated cache
            order = (("A", False), ("B", True))
            if rep % 2:
                order = (("B", True), ("A", False))
            for label, on in order:
                set_conf(on)
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).collect()
                best[n][label] = min(best[n][label], time.time() - t0)
    set_conf(False)
    ta = tb = 0.0
    for n in names:
        a, b = best[n]["A"], best[n]["B"]
        if a > 8e9:
            continue
        ta += a
        tb += b
        print(f"{n:42s} A {a:6.3f}  B {b:6.3f}  ({b / a:5.2f}x)", flush=True)
    if ta > 0:
        print(f"{'TOTAL':42s} A {ta:6.3f}  B {tb:6.3f}  ({tb / ta:5.2f}x)")
    else:
        print("TOTAL: no requested query resolved", file=sys.stderr)


if __name__ == "__main__":
    main()
