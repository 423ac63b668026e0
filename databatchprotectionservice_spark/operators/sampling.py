"""Dataset-assembly operators for training-data pipelines: deterministic
split, per-source quotas, weighted mixing, and sequence packing.

These are the selection/layout steps that sit between cleaning (dedup,
quality filters — ``operators/dedup.py``, ``operators/textops.py``) and
tokenizer ingest in an LLM data pipeline. None exist in the reference
(it owns per-column protection, not corpus assembly; its closest notion
of selection is the per-request column config in
``src/model/json_request.h:40-50``) — they are part of the Spark-native
operational surface this engine adds.

Every operator keys its randomness off ``md5(doc_id)`` rather than
``rand()``: the assignment is a pure function of the row, so it is
reproducible across runs, engines (the DuckDB oracles recompute it),
cluster sizes, and partitionings — the property that actually matters
when a 100 TB corpus is re-split after adding a day of data. All four
are single-shuffle shapes (one hash partitioning for the window/agg;
the split assignment itself is map-only).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import load, prep, register

# deterministic 0-99 bucket from the first 16 bits of md5(doc_id).
# Spark: conv() parses the hex; DuckDB oracle: CAST('0x'||… AS INT).
# Built lazily — Column construction needs an active SparkContext, and
# this module is imported by the registry before the driver's session
# may exist.
def _bucket():
    return (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("bigint")
        % 100
    )

_BUCKET_SQL = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100"

# train/valid/test split fractions (percent buckets)
TRAIN_PCT = 80
VALID_PCT = 10  # buckets [80, 90); test = [90, 100)

# per-source quota (Common-Crawl-style domain cap)
QUOTA_PER_SOURCE = 10

# language mixing weights: P(keep | lang). Unlisted langs use DEFAULT.
MIX_WEIGHTS = {"en": 90, "de": 50, "es": 50, "fr": 25, "zh": 10}
MIX_DEFAULT = 50

# sequence packing: character budget per packed sequence (chars stand in
# for tokens; swap in a tokenizer count column at will)
PACK_BUDGET = 4000


@register(
    "sample_split_train_test",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN {_BUCKET_SQL} < {TRAIN_PCT} THEN 'train'
                    WHEN {_BUCKET_SQL} < {TRAIN_PCT + VALID_PCT} THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
        ORDER BY doc_id
    """,
    description="deterministic hash-bucket train/valid/test split "
    "(map-only, reproducible across runs/engines/partitionings)",
)
def sample_split_train_test(spark, sf_dir):
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    split = (
        F.when(_bucket() < TRAIN_PCT, F.lit("train"))
        .when(_bucket() < TRAIN_PCT + VALID_PCT, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", split.alias("split")).orderBy("doc_id")


@register(
    "sample_quota_per_source",
    oracle=f"""
        SELECT doc_id, source, rk
        FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM documents
        )
        WHERE rk <= {QUOTA_PER_SOURCE}
        ORDER BY doc_id
    """,
    description="cap documents per source by deterministic hash priority "
    "(domain-quota sampling; one shuffle on source)",
)
def sample_quota_per_source(spark, sf_dir):
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QUOTA_PER_SOURCE)
        .select("doc_id", "source", "rk")
        .orderBy("doc_id")
    )


def _mix_rate_sql() -> str:
    arms = "\n".join(
        f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in MIX_WEIGHTS.items()
    )
    return f"CASE {arms} ELSE {MIX_DEFAULT} END"


@register(
    "mix_weighted_sources",
    oracle=f"""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN {_BUCKET_SQL} < {_mix_rate_sql()}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
               CAST(sum(CASE WHEN {_BUCKET_SQL} < {_mix_rate_sql()}
                             THEN n_chars ELSE 0 END) AS BIGINT)
                   AS selected_chars
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    description="weighted corpus mixing: per-language keep rates applied "
    "via the same hash buckets (map-side select + one agg shuffle)",
)
def mix_weighted_sources(spark, sf_dir):
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    rate = F.lit(MIX_DEFAULT)
    for lang, pct in MIX_WEIGHTS.items():
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    selected = (_bucket() < rate).cast("int")
    return (
        docs.withColumn("sel", selected)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("sel").cast("bigint").alias("n_selected"),
            F.sum(F.col("sel") * F.col("n_chars"))
            .cast("bigint")
            .alias("selected_chars"),
        )
        .orderBy("lang")
    )


@register(
    "pack_sequences_greedy",
    oracle=f"""
        SELECT lang, seq_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM (
            SELECT lang,
                   CAST(COALESCE(sum(n_chars) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) // {PACK_BUDGET} AS BIGINT) AS seq_id,
                   n_chars
            FROM documents
        )
        GROUP BY lang, seq_id
        ORDER BY lang, seq_id
    """,
    description="token-budget sequence packing: contiguous fill in doc_id "
    "order per language (cumulative-sum chunking, one window shuffle)",
)
def pack_sequences_greedy(spark, sf_dir):
    """Assign documents to packed training sequences: within each
    language, walk documents in doc_id order and start a new sequence
    every ``PACK_BUDGET`` characters (exclusive running total, so the
    boundary-crossing document belongs to the sequence it overflows).
    Emits per-sequence occupancy. The window is one shuffle on ``lang``;
    at 100 TB the partition key would be (lang, shard) with per-shard
    budgets, keeping every window partition bounded."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    return (
        docs.withColumn("cum_excl", cum_excl)
        .withColumn("seq_id", F.expr(f"cum_excl div {PACK_BUDGET}"))
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang", "seq_id")
    )
