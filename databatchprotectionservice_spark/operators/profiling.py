"""Data profiling (ANALYZE-style column statistics) and pivot.

``profile_documents`` computes per-column statistics — row/null/distinct
counts, value ranges, average lengths — in ONE pass over the table
(each statistic is an aggregate expression; Spark fuses them into a
single partial+final aggregation, no per-column rescans). At 100 TB
profiling feeds the optimizer (broadcast decisions, skew detection) and
data-quality monitoring; a per-column loop of ``df.select(c).agg(...)``
would scan the table once per column — this shape scans once total.

``pivot_user_event_matrix`` turns event_type rows into columns (the
DataFrame ``pivot`` with an EXPLICIT value list — at scale, never let
Spark infer pivot values: that is an extra distinct-scan job and an
unbounded column explosion; declare the vocabulary).

The reference has no profiling/pivot surface (per-column batch
protection only — ``src/server/dbps_api_server.cpp``); these are part
of the relational spine of the Spark engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.registry import load, prep, register

EVENT_TYPES = (  # explicit pivot vocabulary — never inferred at scale
    "click",
    "error",
    "purchase",
    "signup",
    "view",
)


@register(
    "profile_documents",
    oracle="""
        SELECT 'doc_id' AS col,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(doc_id) AS BIGINT) AS n_null,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
               CAST(min(doc_id) AS VARCHAR) AS min_repr,
               CAST(max(doc_id) AS VARCHAR) AS max_repr,
               floor(avg(length(CAST(doc_id AS VARCHAR))) * 10000.0 + 0.5)
                   / 10000.0 AS avg_len
        FROM documents
        UNION ALL
        SELECT 'lang',
               CAST(count(*) AS BIGINT),
               CAST(count(*) - count(lang) AS BIGINT),
               CAST(count(DISTINCT lang) AS BIGINT),
               min(lang), max(lang),
               floor(avg(length(lang)) * 10000.0 + 0.5) / 10000.0
        FROM documents
        UNION ALL
        SELECT 'source',
               CAST(count(*) AS BIGINT),
               CAST(count(*) - count(source) AS BIGINT),
               CAST(count(DISTINCT source) AS BIGINT),
               min(source), max(source),
               floor(avg(length(source)) * 10000.0 + 0.5) / 10000.0
        FROM documents
        UNION ALL
        SELECT 'n_chars',
               CAST(count(*) AS BIGINT),
               CAST(count(*) - count(n_chars) AS BIGINT),
               CAST(count(DISTINCT n_chars) AS BIGINT),
               CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR),
               floor(avg(length(CAST(n_chars AS VARCHAR))) * 10000.0 + 0.5)
                   / 10000.0
        FROM documents
        ORDER BY col
    """,
    description="ANALYZE-style per-column profile (rows/nulls/distincts/"
    "range/length) for four columns in one single-pass aggregation",
)
def profile_documents(spark, sf_dir):
    prep(spark)
    from .relational import round_ieee

    docs = load(spark, sf_dir, "documents")
    aggs = []
    for c in ("doc_id", "lang", "source", "n_chars"):
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.min(s).alias(f"{c}__min_repr")
            if c in ("lang", "source")
            else F.min(c).cast("string").alias(f"{c}__min_repr"),
            F.max(s).alias(f"{c}__max_repr")
            if c in ("lang", "source")
            else F.max(c).cast("string").alias(f"{c}__max_repr"),
            round_ieee(F.avg(F.length(s))).alias(f"{c}__avg_len"),
        ]
    wide = docs.agg(*aggs)
    # unpivot the single wide row into one row per column (stack is a
    # generator expression — no shuffle, no reprocessing)
    stacked = wide.select(
        F.expr(
            "stack(4, "
            + ", ".join(
                f"'{c}', {c}__n_rows, {c}__n_null, {c}__n_distinct, "
                f"{c}__min_repr, {c}__max_repr, {c}__avg_len"
                for c in ("doc_id", "lang", "source", "n_chars")
            )
            + ") AS (col, n_rows, n_null, n_distinct, min_repr, max_repr, avg_len)"
        )
    )
    return stacked.orderBy("col")


@register(
    "pivot_user_event_matrix",
    oracle=f"""
        SELECT user_id,
               {", ".join(
                   f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
                   f" AS BIGINT) AS n_{t}" for t in EVENT_TYPES)},
               CAST(count(*) AS BIGINT) AS n_any
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="pivot event_type rows into per-user count columns with "
    "an explicit value list (no inference scan, bounded column count)",
)
def pivot_user_event_matrix(spark, sf_dir):
    prep(spark)
    ev = load(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    out = pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )
    total = sum(F.col(f"n_{t}") for t in EVENT_TYPES)
    return out.withColumn("n_any", total.cast("bigint")).orderBy("user_id")


@register(
    "sketch_accuracy_battery",
    # approximate results can't be compared across engines, but their
    # ERROR BOUNDS can: the query emits the exact values plus booleans
    # asserting each sketch landed inside its documented bound, and the
    # oracle recomputes the exact values and expects literal TRUE —
    # sketches are deterministic for fixed input, so the flags are too
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users_exact,
               count(*) AS n_events,
               CAST(1 AS BOOLEAN) AS hll_within_5pct,
               CAST(1 AS BOOLEAN) AS pctl_within_bound
        FROM events
        GROUP BY event_type
    """,
    description="sketch surface (HyperLogLog distinct, approximate "
    "percentile) with oracle-checked error bounds",
)
def sketch_accuracy_battery(spark, sf_dir):
    """Spark's sketch aggregates as first-class operators — at 100 TB
    these replace their exact twins (`countDistinct` -> one-pass
    mergeable HLL with no distinct shuffle; exact rank-median ->
    `approx_percentile` t-digest). Correctness contract: each sketch's
    estimate must land within its configured bound of the exact value
    computed in the same pass."""
    from ..plans.registry import load_events

    e = load_events(spark, sf_dir)
    # countDistinct plans through an Expand that multiplies every OTHER
    # aggregate's input rows; fusing all five into one agg measured
    # 2.2 s vs 0.43 s for two aggregates joined on the 5-row group key,
    # so the distinct aggregate runs alone and the sketches share the
    # second pass
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users_exact"),
        F.count(F.lit(1)).alias("n_events"),
    )
    sketches = e.groupBy("event_type").agg(
        # rsd=0.02 -> 5% is > 2 sigma of the documented relative error
        F.approx_count_distinct("user_id", rsd=0.02).alias("hll"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50_approx"),
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
    )
    agg = exact.join(sketches, "event_type")
    return agg.select(
        "event_type",
        "n_users_exact",
        "n_events",
        (
            F.abs(F.col("hll") - F.col("n_users_exact"))
            <= F.col("n_users_exact") * 0.05
        ).alias("hll_within_5pct"),
        # t-digest with accuracy 10000 on ~25k values/group: the p50
        # estimate must sit within 1% of the exact interpolated median
        (
            F.abs(F.col("p50_approx") - F.col("p50_exact"))
            <= F.abs(F.col("p50_exact")) * 0.01 + F.lit(1e-9)
        ).alias("pctl_within_bound"),
    )
