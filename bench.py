#!/usr/bin/env python
"""Benchmark harness — the driver's per-round performance gate.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock seconds over all headline queries (one
timed run each after a session-warmup query). Each query is driven to
completion with ``df.collect()`` so the measurement includes the full
scan → shuffle → Python-UDF → result path, mirroring how the reference's
``performance_test`` (src/scripts/performance_test.cpp:446-489) times
complete encrypt iterations rather than plan construction.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# The headline set: the protection core (the reference's actual workload),
# the relational suite, and the 100TB-pipeline operators. Names must exist
# in the registry; missing ones are reported rather than crashing the run.
HEADLINE = [
    "protect_roundtrip_lineitem",
    "protect_roundtrip_customer",
    "protect_roundtrip_events_aes",
    "protect_ciphertext_shape",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q12_priority_shipping",
    "q18_large_volume_customers",
    "window_top_orders_per_customer",
    "events_hourly_rollup",
    "asof_join_last_event",
    "range_join_click_attribution",
    "rollup_revenue",
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_connected_clusters",
    "similarity_bruteforce_topk",
    "similarity_lsh_topk",
    "text_token_stats",
    "text_quality_scores",
    "text_fingerprints",
    "pii_detect_documents",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod
    from databatchprotectionservice_spark.plans import get_spark

    spark = get_spark(app_name="dbps-bench")
    qs = entrymod.queries()

    # warm the JVM / Python-worker pool so the first timed query doesn't
    # pay one-time session startup costs
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # two passes, min per query: the first pass eats codegen/Python-worker
    # warmup and the min damps background-load noise on the shared rig
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            timings[name] = -1.0
            continue
        best = -1.0
        try:
            for _ in range(runs):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                dt = time.time() - t0
                best = dt if best < 0 else min(best, dt)
        except Exception as e:  # noqa: BLE001 - report, don't die mid-bench
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            best = -1.0
        timings[name] = round(best, 3)
        if best > 0:
            total += best

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
