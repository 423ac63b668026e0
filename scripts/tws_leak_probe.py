#!/usr/bin/env python
"""Phase-2 TWS forensics: WHAT accumulates per streaming run?

tws_forensics.py established the mechanism is in-session and
monotonic with the number of streaming starts (P1 reproduced the
drift; the dirty-writeback phases exonerated the disk).  This probe
runs ONE TWS query repeatedly in a fresh session and samples, per
run: wall time, JVM thread count (by name class), Python worker
process count, tracked RocksDB state-store instances, and the
streaming-listener population — the usual leak suspects for
repeated `availableNow` starts in one session.

Usage: python scripts/tws_leak_probe.py [n_runs] [query_name]
"""

from __future__ import annotations

import collections
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def jvm_threads(spark) -> collections.Counter:
    tset = spark._jvm.java.lang.Thread.getAllStackTraces().keySet()
    names = collections.Counter()
    it = tset.iterator()
    while it.hasNext():
        n = it.next().getName()
        # bucket by prefix so families group
        key = "".join(c for c in n if not c.isdigit()).strip("-_ ")
        names[key] += 1
    return names


def py_workers() -> int:
    out = subprocess.run(
        ["ps", "-eo", "comm"], capture_output=True, text=True
    ).stdout
    return sum(1 for ln in out.splitlines() if "python" in ln)


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    qname = sys.argv[2] if len(sys.argv) > 2 else "streaming_profile_tws"

    import __spark_entry__ as entrymod
    from databatchprotectionservice_spark.plans import get_spark

    spark = get_spark(app_name="tws-leak-probe")
    fn = entrymod.queries()[qname]
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    base_threads = jvm_threads(spark)
    rows = []
    for i in range(n_runs):
        t0 = time.time()
        fn(spark, SF_DIR).collect()
        dt = round(time.time() - t0, 2)
        th = jvm_threads(spark)
        grown = {
            k: v - base_threads.get(k, 0)
            for k, v in th.items()
            if v - base_threads.get(k, 0) >= max(2, i)  # monotone growers
        }
        listeners = spark._jsc.sc().listenerBus().listeners().size()
        rows.append(
            {
                "run": i,
                "sec": dt,
                "jvm_threads_total": sum(th.values()),
                "thread_growers": grown,
                "py_procs": py_workers(),
                "listeners": listeners,
            }
        )
        print(
            f"run {i}: {dt:5.2f}s threads={sum(th.values())} "
            f"pyprocs={rows[-1]['py_procs']} listeners={listeners} "
            f"growers={grown}",
            flush=True,
        )
    out = os.path.join(
        REPO, os.environ.get("TWS_PROBE_OUT", "TWS_LEAK_PROBE_r12.json")
    )
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
