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
