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
from .relational import round_ieee

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


# ---------------------------------------------------------------------------
# Seed-similarity domain selection (documents ⋈ embeddings)
# ---------------------------------------------------------------------------

SEED_VEC_ID = 0  # the "target domain" exemplar
SEED_COS_MIN = 0.1  # keeps ~23% of the synthetic corpus
CURATE_QUALITY_MIN = 0.5


@register(
    "curate_seed_similarity",
    oracle=f"""
        WITH seed AS (
            SELECT embedding AS qe FROM embeddings
            WHERE vec_id = {SEED_VEC_ID}
        ),
        joined AS (
            SELECT d.source,
                   CASE WHEN length(trim(d.text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(d.text), '\\s+'))
                   END AS n_tokens,
                   0.5 * least((CASE WHEN length(trim(d.text)) = 0 THEN 0
                                ELSE len(regexp_split_to_array(trim(d.text), '\\s+'))
                                END) / 50.0, 1.0)
                   + 0.5 * (length(regexp_replace(d.text, '[^a-zA-Z]', '', 'g'))
                            * 1.0 / greatest(length(d.text), 1)) AS quality,
                   list_aggregate(list_transform(range(1, 65),
                       i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), 'sum')
                   / (sqrt(list_aggregate(list_transform(range(1, 65),
                       i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum'))
                    * sqrt(list_aggregate(list_transform(range(1, 65),
                       i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), 'sum')))
                       AS seed_cos
            FROM documents d
            JOIN (SELECT vec_id, embedding AS ce FROM embeddings) e
              ON d.doc_id = e.vec_id
            CROSS JOIN seed
        )
        SELECT source,
               count(*) AS n_kept,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
               floor(avg(seed_cos) * 10000.0 + 0.5) / 10000.0 AS avg_seed_cos,
               floor(avg(quality) * 10000.0 + 0.5) / 10000.0 AS avg_quality
        FROM joined
        WHERE seed_cos >= {SEED_COS_MIN} AND quality >= {CURATE_QUALITY_MIN}
        GROUP BY source
    """,
    description="seed-similarity domain selection (DSIR-style): keep docs "
    "whose embedding is close to a target exemplar AND above a quality bar",
)
def curate_seed_similarity(spark, sf_dir):
    """Targeted-domain curation — the selection step that picks training
    docs RESEMBLING a seed domain (a hand-curated exemplar set; here its
    centroid stands in as one seed vector) and passing the quality
    model. The cross-modal shape: documents ⋈ embeddings on doc_id, the
    seed broadcast to every row, cosine + quality as codegen-side
    filters, then a per-source aggregate.

    100 TB shape: the doc↔vector equi-join is the one real shuffle —
    co-locate it for free by bucketing both tables on the id (the
    bucketed-join machinery in ``operators/bucketing.py``;
    ``tests/test_plan_shapes.py::test_curate_join_colocated_when_bucketed``
    runs THIS exact pipeline over bucketed twins and pins the
    Exchange-free sort-merge join — the only hash exchange left is the
    final per-source aggregate); the seed side is a 1-row broadcast
    however large the corpus; both filters sit before the aggregate so
    survivors, not the corpus, cross the final exchange."""
    prep(spark)
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    seed = e.filter(F.col("vec_id") == SEED_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    return curate_pipeline(
        d, e.select(F.col("vec_id").alias("doc_id"), "embedding"), seed
    )


def curate_pipeline(d, e_by_doc, seed):
    """The curate dataflow on arbitrary inputs: ``d`` (doc_id, text,
    source), ``e_by_doc`` (doc_id, embedding), ``seed`` (one row, qe).
    Shared by the registered query (plain parquet scans) and the
    bucketed-twin plan test (co-located scans)."""
    from .similarity import cosine

    n_tokens = F.when(
        F.length(F.trim("text")) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim("text"), r"\s+")))
    quality = (
        F.lit(0.5) * F.least(n_tokens / F.lit(50.0), F.lit(1.0))
        + F.lit(0.5)
        * (
            F.length(F.regexp_replace("text", "[^a-zA-Z]", "")) * F.lit(1.0)
            / F.greatest(F.length("text"), F.lit(1))
        )
    )
    joined = (
        d.join(e_by_doc, "doc_id")
        .crossJoin(F.broadcast(seed))
        .select(
            "source",
            n_tokens.alias("n_tokens"),
            quality.alias("quality"),
            cosine(F.col("qe"), F.col("embedding")).alias("seed_cos"),
        )
    )
    kept = joined.filter(
        (F.col("seed_cos") >= SEED_COS_MIN)
        & (F.col("quality") >= CURATE_QUALITY_MIN)
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        round_ieee(F.avg("seed_cos")).alias("avg_seed_cos"),
        round_ieee(F.avg("quality")).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# Temperature-balanced source mixing (integer-exact alpha = 0.5)
# ---------------------------------------------------------------------------

#: overall sampling budget as a fraction of the corpus (numerator /
#: denominator — integer arithmetic end to end)
TEMP_BUDGET_NUM, TEMP_BUDGET_DEN = 1, 2


@register(
    "mix_temperature_quota",
    # floor(sqrt(n)) is engine-exact: sqrt is IEEE-correctly-rounded in
    # both engines, and sqrt of a NON-square integer is irrational, so
    # the rounded double can never land exactly on an integer — floor
    # therefore agrees everywhere; every other step is integer math
    oracle=f"""
        WITH per_source AS (
            SELECT source, count(*) AS n_docs,
                   CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)
                       AS w
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT sum(n_docs) AS n_total, sum(w) AS w_total
            FROM per_source
        ),
        quotas AS (
            SELECT p.source, p.n_docs, p.w,
                   (t.n_total * {TEMP_BUDGET_NUM} // {TEMP_BUDGET_DEN})
                       * p.w // t.w_total AS quota
            FROM per_source p CROSS JOIN tot t
        ),
        ranked AS (
            SELECT d.source, d.n_chars,
                   row_number() OVER (
                       PARTITION BY d.source
                       ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                   ) AS rk
            FROM documents d
        )
        SELECT q.source,
               CAST(q.n_docs AS BIGINT) AS n_docs,
               CAST(q.w AS BIGINT) AS weight,
               CAST(q.quota AS BIGINT) AS quota,
               CAST(count(r.n_chars) AS BIGINT) AS n_selected,
               CAST(coalesce(sum(CASE WHEN r.rk <= q.quota
                                      THEN r.n_chars END), 0) AS BIGINT)
                   AS selected_chars
        FROM quotas q
        LEFT JOIN ranked r ON r.source = q.source AND r.rk <= q.quota
        GROUP BY q.source, q.n_docs, q.w, q.quota
    """,
    description="temperature-balanced source mixing (alpha=0.5): quotas "
    "proportional to floor(sqrt(n_docs)) flatten the source distribution "
    "— integer-exact end to end, deterministic md5-ranked selection",
)
def mix_temperature_quota(spark, sf_dir):
    """The GPT-3/Pile-style source-balancing step: instead of sampling
    sources proportionally (head sources dominate) or uniformly (tail
    sources repeat endlessly), quotas follow ``n^alpha`` with
    ``alpha = 0.5`` — formulated INTEGER-EXACT as
    ``floor(sqrt(n_docs))`` weights so the oracle can recompute every
    quota without a float-order hazard (see the oracle note on why
    floor-of-correctly-rounded-sqrt agrees across engines). Selection
    within a source is the deterministic md5 rank — the same
    hash-bucket idiom as ``sample_split_train_test``, so re-running the
    pipeline selects the same documents.

    100 TB shape: quotas come from one map-side-combined per-source
    count (broadcastable — source cardinality is tiny), the rank is one
    window per source partition, and the final aggregate is
    low-cardinality. No data-sized collect; the only full-corpus
    shuffle is the rank window's."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).withColumn(
        "w", F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("bigint")
    )
    tot = per_source.agg(
        F.sum("n_docs").alias("n_total"), F.sum("w").alias("w_total")
    )
    # integer `div` end to end — Spark's `/` is a DOUBLE divide whose
    # quotient can cross an integer boundary once budget*w exceeds
    # 2^53, silently diverging from the oracle's exact arithmetic at
    # the corpus sizes this operator targets
    quotas = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "w",
        F.expr(
            f"CAST((n_total * {TEMP_BUDGET_NUM} div {TEMP_BUDGET_DEN})"
            " * w div w_total AS BIGINT)"
        ).alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "source", "n_chars", F.row_number().over(w).alias("rk")
    )
    # a RIGHT outer join cannot build on its preserved (right) side, so
    # F.broadcast on quotas there was silently ignored and the full
    # ranked corpus shuffled.  Shape that actually broadcasts: INNER
    # broadcast join + per-source aggregate (tiny), then quotas LEFT
    # JOIN that aggregate to restore zero-selection sources — the big
    # side never shuffles beyond the rank window's own exchange.
    sel = (
        ranked.alias("r")
        .join(
            F.broadcast(quotas.select("source", "quota")).alias("q"),
            (F.col("r.source") == F.col("q.source"))
            & (F.col("r.rk") <= F.col("q.quota")),
        )
        .groupBy(F.col("r.source").alias("source"))
        .agg(
            F.count(F.col("r.n_chars")).cast("bigint").alias("n_selected"),
            F.sum("r.n_chars").cast("bigint").alias("selected_chars"),
        )
    )
    return quotas.join(F.broadcast(sel), "source", "left").select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("w").cast("bigint").alias("weight"),
        F.col("quota").cast("bigint").alias("quota"),
        F.coalesce(F.col("n_selected"), F.lit(0))
        .cast("bigint")
        .alias("n_selected"),
        F.coalesce(F.col("selected_chars"), F.lit(0))
        .cast("bigint")
        .alias("selected_chars"),
    )
