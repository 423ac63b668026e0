#!/usr/bin/env python
"""TWS-trio bimodality forensics (VERDICT r11 "What's wrong" #2).

Observed: same HEAD, full bench passes 28 minutes apart —
streaming_scd2_tws / streaming_profile_tws / streaming_sessionize_tws
at 5.7/5.7/4.1 s in one pass and 9.8/9.5/6.1 s across ALL runs
(warmup included) in the other, while CPU-bound queries in the slow
pass sat at historical lows.  The TWS trio is the only query family
whose critical path includes RocksDB commits (fsync to /tmp, ext4 on
/dev/vda) and per-partition state-server sockets, so the hypothesis
ladder, in the order the r11 verdict prescribed:

  H1  in-session streaming debt — state-server scratch / RocksDB
      working dirs / memory-sink tables / listener-bus state
      accumulated over the ~60 streaming starts a full bench pass
      performs slow later streaming starts;
  H2  socket/port contention between consecutive TWS queries;
  H3  cross-process disk state — dirty-page writeback from preceding
      heavy writes (export/compaction queries, a co-located sweep)
      stalls RocksDB's fsyncs while leaving CPU-bound queries alone.

Phases (one session, mirroring the bench protocol):

  P0 baseline      fresh session, trio 3x each
  P1 stream-debt   all 12 streaming queries 2x (24 extra streaming
                   starts), then trio 1x each          -> tests H1/H2
  P2 dirty-inject  write ~8 GiB of un-synced data to /tmp (what an
                   export-heavy stretch of the pass leaves behind),
                   then trio 1x each IMMEDIATELY        -> tests H3
  P3 post-sync     os.sync() and let writeback drain, trio 1x each
                   -> recovery proves the mechanism is transient disk
                      state, not session damage

/proc/meminfo Dirty/Writeback and the /tmp spark-scratch dir count are
sampled around every phase.  Output: one JSON blob (default
TWS_FORENSICS_r12.json) — the committed evidence the verdict asked
for.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIO = [
    "streaming_scd2_tws",
    "streaming_profile_tws",
    "streaming_sessionize_tws",
]
DIRTY_BYTES = int(os.environ.get("TWS_DIRTY_BYTES", str(8 << 30)))


def meminfo() -> dict[str, int]:
    out = {}
    with open("/proc/meminfo") as fh:
        for ln in fh:
            if ln.startswith(("Dirty:", "Writeback:")):
                k, v = ln.split(":")
                out[k] = int(v.strip().split()[0])  # kB
    return out


def tmp_state() -> dict[str, int]:
    return {
        "spark_dirs": len(glob.glob("/tmp/spark-*")),
        "streaming_ckpts": len(glob.glob("/tmp/temporary-*")),
    }


def run_trio(qs, label: str, n: int, results: list) -> None:
    for name in TRIO:
        for i in range(n):
            pre = meminfo()
            t0 = time.time()
            qs[name](None, SF_DIR).collect()
            dt = round(time.time() - t0, 2)
            results.append(
                {
                    "phase": label,
                    "query": name,
                    "run": i,
                    "sec": dt,
                    "dirty_kb_pre": pre.get("Dirty", -1),
                    "writeback_kb_pre": pre.get("Writeback", -1),
                }
            )
            print(
                f"  {label:12s} {name:28s} {dt:6.2f}s "
                f"(dirty {pre.get('Dirty', -1)//1024} MiB)",
                flush=True,
            )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "TWS_FORENSICS_r12.json"
    )
    import __spark_entry__ as entrymod
    from databatchprotectionservice_spark.plans import get_spark

    spark = get_spark(app_name="tws-forensics")
    raw = entrymod.queries()
    # bind the session once (the harness passes spark explicitly; the
    # query fns take (spark, sf_dir))
    qs = {n: (lambda fn: (lambda _s, d: fn(spark, d)))(f) for n, f in raw.items()}

    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    results: list[dict] = []
    evidence = {"phases": {}, "sf_dir": SF_DIR, "dirty_bytes": DIRTY_BYTES}

    print("P0 baseline (fresh session)")
    evidence["phases"]["P0_pre"] = {**meminfo(), **tmp_state()}
    run_trio(qs, "P0_baseline", 3, results)

    print("P1 streaming debt: all streaming queries 2x")
    stream = [n for n in raw if n.startswith("streaming_")]
    t0 = time.time()
    for _ in range(2):
        for name in stream:
            qs[name](None, SF_DIR).collect()
    evidence["phases"]["P1_debt_build_sec"] = round(time.time() - t0, 1)
    evidence["phases"]["P1_pre"] = {**meminfo(), **tmp_state()}
    run_trio(qs, "P1_streamdebt", 1, results)

    print(f"P2 dirty inject: {DIRTY_BYTES >> 30} GiB un-synced to /tmp")
    blob = os.urandom(1 << 24)  # 16 MiB of incompressible bytes
    path = "/tmp/tws_forensics_dirty.bin"
    with open(path, "wb") as fh:
        for _ in range(DIRTY_BYTES // len(blob)):
            fh.write(blob)
    evidence["phases"]["P2_pre"] = {**meminfo(), **tmp_state()}
    run_trio(qs, "P2_dirty", 1, results)

    print("P3 post-sync recovery")
    os.sync()
    # let background writeback drain fully before re-measuring
    for _ in range(120):
        if meminfo().get("Dirty", 0) < 50_000:
            break
        time.sleep(1)
    os.remove(path)
    os.sync()
    evidence["phases"]["P3_pre"] = {**meminfo(), **tmp_state()}
    run_trio(qs, "P3_postsync", 1, results)

    evidence["runs"] = results
    # per-phase medians for the summary line
    summary = {}
    for phase in ("P0_baseline", "P1_streamdebt", "P2_dirty", "P3_postsync"):
        for q in TRIO:
            xs = sorted(r["sec"] for r in results if r["phase"] == phase and r["query"] == q)
            if xs:
                summary[f"{phase}.{q}"] = xs[len(xs) // 2]
    evidence["summary"] = summary
    with open(out_path, "w") as fh:
        json.dump(evidence, fh, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
