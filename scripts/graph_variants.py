#!/usr/bin/env python
"""Interleaved A/B/C of pagerank/bfs plan shapes (r16, VERDICT item 1).

Variants build the SAME computation with different materialization
strategies; the script times each interleaved (min-of-N) and asserts
result equality across variants before printing the table.

    SPARK_GRAFT_SF_DIR=... python scripts/graph_variants.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def pr_body(spark, sf_dir, shape: str):
    from databatchprotectionservice_spark.operators.graph import (
        PR_ITERATIONS,
        PR_TOP,
        _R0,
        _TELEPORT,
        _purchase_edges,
    )
    from databatchprotectionservice_spark.plans.registry import prep

    prep(spark)
    pairs, edges = _purchase_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = edges.join(deg, "src")
    if shape in ("ed_ckpt", "ed_ckpt_rounds", "ed_part"):
        if shape == "ed_part":
            ed = ed.repartition(spark.sparkContext.defaultParallelism, "src")
        ed = ed.localCheckpoint(eager=True)
    ranks = deg.select(
        F.col("src").alias("v"), F.lit(_R0).cast("bigint").alias("r")
    )
    for _ in range(PR_ITERATIONS):
        ranks = (
            ed.join(ranks, ed.src == ranks.v)
            .select("dst", F.expr("r div d").alias("share"))
            .groupBy("dst")
            .agg(
                (F.lit(_TELEPORT) + F.expr("85 * sum(share) div 100"))
                .cast("bigint")
                .alias("r")
            )
            .select(F.col("dst").alias("v"), "r")
        )
        if shape == "ed_ckpt_rounds":
            ranks = ranks.localCheckpoint(eager=True)
    return (
        ranks.orderBy(F.desc("r"), F.asc("v"))
        .limit(PR_TOP)
        .select(
            F.when(F.col("v") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("v div 2").cast("bigint").alias("node_key"),
            F.col("r").alias("rank_e6"),
        )
    )


def bfs_body(spark, sf_dir, shape: str):
    from databatchprotectionservice_spark.operators.graph import (
        BFS_ROUNDS,
        BFS_SEEDS,
        _purchase_edges,
    )
    from databatchprotectionservice_spark.plans.registry import prep

    prep(spark)
    pairs, edges = _purchase_edges(spark, sf_dir)
    dist = (
        pairs.filter(F.col("c") < BFS_SEEDS)
        .select((2 * F.col("c")).alias("v"))
        .distinct()
        .select("v", F.lit(0).cast("bigint").alias("d"))
    )
    if shape.startswith("selfloop"):
        # weight-0 self-loops linearize the per-round min-relaxation:
        # min(d_v, min_u d_u + 1) == min over (edges + self) of d + w,
        # so dist appears ONCE per round and the plan grows linearly
        ew = edges.select("src", "dst", F.lit(1).alias("w")).unionByName(
            edges.select(
                F.col("src").alias("src"),
                F.col("src").alias("dst"),
                F.lit(0).alias("w"),
            ).distinct()
        )
        if shape == "selfloop_ckpt":
            ew = ew.localCheckpoint(eager=True)
        for _ in range(BFS_ROUNDS):
            dist = (
                ew.join(dist, ew.src == dist.v)
                .select("dst", (F.col("d") + F.col("w")).alias("d"))
                .groupBy("dst")
                .agg(F.min("d").alias("d"))
                .select(F.col("dst").alias("v"), "d")
            )
    elif shape == "lazy":  # shipped r15
        for _ in range(BFS_ROUNDS):
            expanded = edges.join(dist, edges.src == dist.v).select(
                F.col("dst").alias("v"), (F.col("d") + 1).alias("d")
            )
            dist = (
                dist.unionByName(expanded).groupBy("v").agg(
                    F.min("d").alias("d")
                )
            )
    elif shape == "persist":  # r14
        cached = []
        for _ in range(BFS_ROUNDS):
            expanded = edges.join(dist, edges.src == dist.v).select(
                F.col("dst").alias("v"), (F.col("d") + 1).alias("d")
            )
            dist = (
                dist.unionByName(expanded)
                .groupBy("v")
                .agg(F.min("d").alias("d"))
                .persist()
            )
            cached.append(dist)
        dist = dist.localCheckpoint(eager=True)
        for d in cached:
            d.unpersist()
    return dist.select(
        F.when(F.col("v") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("v div 2").cast("bigint").alias("node_key"),
        F.col("d").alias("hops"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from databatchprotectionservice_spark.plans import get_spark

    spark = get_spark(app_name="dbps-graph-variants")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    cases = {
        "pr:lazy(r15)": lambda: pr_body(spark, sf_dir, "lazy"),
        "pr:ed_ckpt": lambda: pr_body(spark, sf_dir, "ed_ckpt"),
        "pr:ed_part": lambda: pr_body(spark, sf_dir, "ed_part"),
        "pr:ed_ckpt_rounds(r14)": lambda: pr_body(
            spark, sf_dir, "ed_ckpt_rounds"
        ),
        "bfs:lazy(r15)": lambda: bfs_body(spark, sf_dir, "lazy"),
        "bfs:selfloop": lambda: bfs_body(spark, sf_dir, "selfloop"),
        "bfs:selfloop_ckpt": lambda: bfs_body(spark, sf_dir, "selfloop_ckpt"),
        "bfs:persist(r14)": lambda: bfs_body(spark, sf_dir, "persist"),
    }

    # result-identity check (sorted rows) + warmup in one pass
    ref: dict[str, list] = {}
    for name, fn in cases.items():
        fam = name.split(":")[0]
        rows = sorted(map(tuple, fn().collect()))
        if fam in ref:
            assert rows == ref[fam], f"{name} result differs!"
        else:
            ref[fam] = rows
        spark.catalog.clearCache()

    best = {n: 9e9 for n in cases}
    for rep in range(reps):
        order = list(cases) if rep % 2 == 0 else list(reversed(list(cases)))
        for name in order:
            spark.sparkContext.setJobDescription(f"gv:{name}:{rep}")
            t0 = time.time()
            cases[name]().collect()
            best[name] = min(best[name], time.time() - t0)
            spark.catalog.clearCache()
    for name, t in best.items():
        print(f"{name:28s} {t:6.3f} s")


if __name__ == "__main__":
    main()
