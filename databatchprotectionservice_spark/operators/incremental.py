"""Incremental aggregation — maintain a rollup by merging partial
aggregates instead of rescanning history.

The 100 TB pattern: a daily job aggregates only that day's partition
into (key, day) partials; monthly/total views MERGE the partials
(sums add, counts add, mins/maxes combine) without touching raw data
again. Works for any commutative-monoid aggregate; avg is carried as
(sum, count) and finalized at read. The registry query proves the
algebra: events -> daily partials -> merged monthly rollup must equal
the direct aggregation over raw events, and the DuckDB oracle IS that
direct aggregation.

One shuffle per level ((user, day) then (user, month)); the second
input is |keys x days| rows, not |events| — at scale the merge step is
orders of magnitude smaller than the scan it replaces.

The reference has no aggregation surface at all (per-column batch
protection only); this belongs to the engine's analytics spine
alongside ``operators/relational.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.registry import load_events, prep, register


def daily_partials(events: DataFrame) -> DataFrame:
    """Level-1 partial aggregates: one row per (user_id, day)."""
    return events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def merge_partials(partials: DataFrame, *keys: str) -> DataFrame:
    """Merge partial aggregates up to a coarser key set — the monoid
    combine: counts and sums add, mins/maxes re-min/max."""
    return partials.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


@register(
    "incremental_rollup_merge",
    oracle="""
        SELECT user_id,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS month,
               CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS sum_value,
               floor(min(value) * 10000.0 + 0.5) / 10000.0 AS min_value,
               floor(max(value) * 10000.0 + 0.5) / 10000.0 AS max_value
        FROM events
        GROUP BY user_id, month
        ORDER BY user_id, month
    """,
    description="two-level incremental rollup: daily partials merged to "
    "monthly via monoid combine; oracle is the direct aggregation, so "
    "equality proves partial-merge == full-scan",
)
def incremental_rollup_merge(spark, sf_dir):
    prep(spark)
    from .relational import dec_str, round_ieee

    ev = load_events(spark, sf_dir)
    partials = daily_partials(ev)
    monthly = merge_partials(
        partials.withColumn(
            "month", F.date_format("day", "yyyy-MM")
        ),
        "user_id",
        "month",
    )
    return monthly.select(
        "user_id",
        "month",
        F.col("n").cast("bigint").alias("n"),
        dec_str(F.col("sum_value")).alias("sum_value"),
        round_ieee(F.col("min_value")).alias("min_value"),
        round_ieee(F.col("max_value")).alias("max_value"),
    ).orderBy("user_id", "month")
