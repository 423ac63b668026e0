"""PII detection -> column protection (the analyze-then-protect loop).

SURVEY §7 phase 3: text analysis decides *which columns to protect*.
Detection is pure SQL regex counting (codegen, embarrassingly parallel,
oracle-checkable); the decision feeds the same ``protect_columns`` UDFs
as a manual config would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.registry import (
    SPREAD_MIN_BYTES_LIGHT,
    load,
    load_spread,
    prep,
    register,
)

#: detector name -> (Spark regex, DuckDB regex) — kept in lockstep so the
#: oracle counts the same matches. Patterns are deliberately simple and
#: deterministic (no catastrophic backtracking at 100 TB).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",) * 2,
    # leading + or ( keeps bare digit runs (ids, zip codes) from matching
    "phone": (r"[+(][0-9][0-9()\-\s]{7,}[0-9]",) * 2,
    "ssn_like": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",) * 2,
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",) * 2,
}


def pii_counts(df: DataFrame, column: str) -> DataFrame:
    """Per-detector match counts over one string column."""
    aggs = [
        F.sum(
            F.size(F.regexp_extract_all(F.col(column), F.lit(spark_re), 0))
        ).alias(name)
        for name, (spark_re, _) in PII_PATTERNS.items()
    ]
    return df.agg(*aggs)


def columns_to_protect(
    df: DataFrame, columns: list[str], min_hits: int = 1
) -> list[str]:
    """Which of ``columns`` contain PII (>= min_hits total matches).

    One aggregate pass over all candidate columns — a single job no
    matter how many columns are scanned."""
    aggs = []
    for col in columns:
        for name, (spark_re, _) in PII_PATTERNS.items():
            aggs.append(
                F.sum(
                    F.size(F.regexp_extract_all(F.col(col), F.lit(spark_re), 0))
                ).alias(f"{col}__{name}")
            )
    row = df.agg(*aggs).first()
    hits = {col: 0 for col in columns}
    for key, value in row.asDict().items():
        col = key.rsplit("__", 1)[0]
        hits[col] += value or 0
    return [col for col in columns if hits[col] >= min_hits]


def auto_protect(
    df: DataFrame,
    candidate_columns: list[str],
    key_prefix: str = "auto",
    min_hits: int = 1,
    encryptor: str = "keystream_xor",
) -> tuple[DataFrame, dict[str, str]]:
    """Detect PII-bearing columns and protect them; returns the protected
    DataFrame and the column->key_id map used (for the sidecar /
    unprotect config)."""
    from ..functions.protect import protect_columns

    selected = columns_to_protect(df, candidate_columns, min_hits)
    keymap = {col: f"{key_prefix}:{col}" for col in selected}
    return protect_columns(df, keymap, encryptor), keymap


def _duck_count(col: str, duck_re: str) -> str:
    # CAST: DuckDB sum(int) is HUGEINT, which .df() lowers to float64 and
    # breaks the driver's stringified hash against Spark's int64
    return (
        f"CAST(sum(len(regexp_extract_all({col}, '{duck_re}'))) AS BIGINT)"
    )


@register(
    "pii_detect_documents",
    oracle=f"""
        SELECT source,
               count(*) AS n_docs,
               {_duck_count("text", PII_PATTERNS["email"][1])} AS email,
               {_duck_count("text", PII_PATTERNS["phone"][1])} AS phone,
               {_duck_count("text", PII_PATTERNS["ssn_like"][1])} AS ssn_like,
               {_duck_count("text", PII_PATTERNS["ipv4"][1])} AS ipv4
        FROM documents
        GROUP BY source
    """,
    description="regex PII scan over documents (detection side of the "
    "analyze-then-protect loop)",
)
def pii_detect_documents(spark, sf_dir):
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    aggs = [
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(spark_re), 0)))
        .cast("bigint")
        .alias(name)
        for name, (spark_re, _) in PII_PATTERNS.items()
    ]
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), *aggs
    )


@register(
    "pii_auto_protect_roundtrip",
    oracle="""
        SELECT count(*) AS n,
               min(c_name) AS min_name,
               max(c_phone) AS max_phone,
               count(DISTINCT c_phone) AS n_phones
        FROM (
            SELECT c_name, concat('+1 (555) 000-', CAST(1000 + c_custkey % 9000 AS VARCHAR)) AS c_phone
            FROM customer
        )
    """,
    description="auto-detect PII columns (synthetic phone), protect them, "
    "verify round-trip equality",
)
def pii_auto_protect_roundtrip(spark, sf_dir):
    """End-to-end loop: synthesize a phone column, let the detector pick
    the PII columns, protect them, unprotect, and aggregate — must equal
    the raw aggregate."""
    from pyspark.sql import types as T

    from ..functions.protect import unprotect_column

    prep(spark)
    # xor crypto over a ~300 KB scan: spreading measured 2x slower at
    # bench scale, so this site only spreads past the light threshold
    c = load_spread(
        spark, sf_dir, "customer", min_bytes=SPREAD_MIN_BYTES_LIGHT
    ).select(
        "c_custkey",
        "c_name",
        F.concat(
            F.lit("+1 (555) 000-"),
            (1000 + F.col("c_custkey") % 9000).cast("string"),
        ).alias("c_phone"),
    )
    protected, keymap = auto_protect(c, ["c_name", "c_phone"], min_hits=5)
    # c_name has no PII; only the phone column must have been selected
    assert list(keymap) == ["c_phone"], keymap
    back = unprotect_column(
        protected, "c_phone", T.StringType(), keymap["c_phone"]
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_name").alias("min_name"),
        F.max("c_phone").alias("max_phone"),
        F.countDistinct("c_phone").alias("n_phones"),
    )


@register(
    "pii_redact_spans",
    oracle=f"""
        WITH seeded AS (
            SELECT source, text ||
                   CASE WHEN doc_id % 3 = 0
                        THEN ' contact u' || CAST(doc_id AS VARCHAR)
                             || '@example.com or +1 (555) 010-'
                             || CAST(1000 + doc_id % 9000 AS VARCHAR)
                        ELSE '' END AS txt
            FROM documents
        ),
        red AS (
            SELECT source, txt,
                   regexp_replace(regexp_replace(txt,
                       '{PII_PATTERNS["email"][1]}', '[EMAIL]', 'g'),
                       '{PII_PATTERNS["phone"][1]}', '[PHONE]', 'g') AS redacted
            FROM seeded
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN redacted <> txt THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_redacted,
               CAST(sum(length(txt) - length(redacted)) AS BIGINT)
                   AS chars_removed,
               min(md5(redacted)) AS min_md5,
               max(md5(redacted)) AS max_md5
        FROM red
        GROUP BY source
    """,
    description="inline PII span redaction over free text (the masking "
    "twin of column protection); md5 pins exact redacted content",
)
def pii_redact_spans(spark, sf_dir):
    """Span-level redaction — the deployment shape for FREE TEXT, where
    column protection can't apply because PII is embedded mid-sentence
    (training corpora are scrubbed exactly this way). PII is seeded
    deterministically (the synthetic corpus contains none), then every
    email/phone span is masked in place by a chained ``regexp_replace``
    — pure codegen, zero Python, and the oracle's md5 over the redacted
    text pins byte equality, proving non-PII content is untouched.

    100 TB shape: map-only scan -> per-source aggregate; the regexes
    are anchored-alternation-free (no catastrophic backtracking) and
    shared verbatim with the detection battery (PII_PATTERNS)."""
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1 (555) 010-"),
                (1000 + F.col("doc_id") % 9000).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    base = d.select("source", seeded.alias("txt"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.col("txt"), PII_PATTERNS["email"][0], "[EMAIL]"
        ),
        PII_PATTERNS["phone"][0],
        "[PHONE]",
    )
    red = base.select("source", "txt", redacted.alias("redacted"))
    return red.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("redacted") != F.col("txt"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_redacted"),
        F.sum(F.length("txt") - F.length("redacted"))
        .cast("bigint")
        .alias("chars_removed"),
        F.min(F.md5("redacted")).alias("min_md5"),
        F.max(F.md5("redacted")).alias("max_md5"),
    )
