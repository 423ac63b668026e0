"""User-defined function surface: UDTF, grouped-agg UDAF, grouped-map.

SURVEY §2.2 calls the UDF surface "the centerpiece" of the reference
(its ``DBPSEncryptor`` is a pluggable scalar-batch UDF). The scalar
Arrow UDFs live in ``functions/protect.py``; this module exercises the
remaining Spark Python-UD* shapes so the engine's extension surface is
complete:

* **UDTF** — a table function exploding word n-grams (one row -> many).
* **grouped-agg pandas UDF (UDAF)** — interquartile sum per group.
* **grouped-map applyInPandas** — per-group cumulative totals.

Every query keeps the Python math in exact integers so the DuckDB oracle
hash-matches (no float-summation-order hazards).
"""

# NB: no `from __future__ import annotations` — pandas_udf infers the
# GROUPED_AGG eval type from real (non-stringified) type hints
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import load, load_spread, local_frame, prep, register


# ---------------------------------------------------------------------------
# UDTF: n-gram exploder
# ---------------------------------------------------------------------------


def make_shingle_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="gram: string")
    class ShingleUDTF:
        """Emit every word-3-gram of the input text (one row per gram —
        the table-function shape; scalar UDFs can't change cardinality).
        Mirrors ``dedup.shingled`` EXACTLY — i.e. Spark's
        ``split(trim(text), '\\s+')`` semantics, not Python's
        ``str.split()``: trim strips SPACES only and the regex split
        keeps leading/trailing empty tokens, so a whitespace-only
        document tokenizes identically in the UDTF, the Spark
        expression twin, and the DuckDB oracle (hostile-corpus
        finding, r9: str.strip()/str.split() diverged on
        newline-only text)."""

        import re as _re

        _WS = _re.compile(r"[ \t\n\x0b\f\r]+")  # ASCII \s (Java/RE2)

        def eval(self, text: str):
            t = (text or "").strip(" ")  # Spark trim: spaces only
            words = self._WS.split(t)
            n = max(len(words) - 2, 1)
            for i in range(n):
                yield (" ".join(words[i : i + 3]),)

    return ShingleUDTF


@register(
    "udtf_shingle_counts",
    oracle="""
        SELECT source,
               count(*) AS n_grams,
               count(DISTINCT gram) AS n_distinct_grams
        FROM (
            SELECT d.source,
                   array_to_string(w[i:i+2], ' ') AS gram
            FROM (
                SELECT source,
                       regexp_split_to_array(trim(text), '\\s+') AS w
                FROM documents
            ) d, UNNEST(range(1, greatest(len(w) - 2, 1) + 1)) AS t(i)
        )
        GROUP BY source
    """,
    description="Python UDTF (table function): word-3-gram explosion",
)
def udtf_shingle_counts(spark, sf_dir):
    prep(spark)
    shingle = make_shingle_udtf()
    spark.udtf.register("shingles3", shingle)
    d = load_spread(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT source,
               count(*) AS n_grams,
               count(DISTINCT gram) AS n_distinct_grams
        FROM udtf_docs, LATERAL shingles3(text)
        GROUP BY source
        """
    )


# ---------------------------------------------------------------------------
# grouped-agg pandas UDF (UDAF): interquartile sum
# ---------------------------------------------------------------------------


def make_iqr_sum_udaf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def iqr_sum(v: pd.Series) -> int:
        # Series -> scalar signature marks this as a grouped aggregate;
        # sum of the sorted middle half [n//4, 3n//4) — exact integers
        s = v.sort_values().reset_index(drop=True)
        n = len(s)
        return int(s.iloc[n // 4 : (3 * n) // 4].sum())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing pandas and JVM aggregates in one agg,
        # so the row count is a pandas aggregate too
        return len(v)

    return iqr_sum, n_rows


@register(
    "udaf_iqr_chars",
    oracle="""
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN rk > cnt // 4 AND rk <= (3 * cnt) // 4
                        THEN n_chars ELSE 0 END) AS BIGINT) AS iqr_chars
        FROM (
            SELECT source, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id) AS rk,
                   count(*) OVER (PARTITION BY source) AS cnt
            FROM documents
        )
        GROUP BY source
    """,
    description="grouped-agg pandas UDF (UDAF): interquartile char sum",
)
def udaf_iqr_chars(spark, sf_dir):
    """Custom aggregate the built-ins can't express directly: the sum of
    the middle-half of each group's sorted values. Ties are harmless for
    the SUM (any n//4..3n//4 slice of equal values sums the same), so the
    pandas sort and the oracle's row_number pick identical totals."""
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    iqr_sum, n_rows = make_iqr_sum_udaf()
    return d.groupBy("source").agg(
        n_rows(F.col("n_chars")).alias("n_docs"),
        iqr_sum(F.col("n_chars")).alias("iqr_chars"),
    )


# ---------------------------------------------------------------------------
# grouped-map applyInPandas: per-group cumulative totals
# ---------------------------------------------------------------------------

_CUM_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("cum_chars", T.LongType()),
    ]
)


def _cumulate(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    pdf["cum_chars"] = pdf["n_chars"].cumsum()
    return pdf[["source", "doc_id", "n_chars", "cum_chars"]]


@register(
    "grouped_map_cumulative_chars",
    oracle="""
        SELECT source, doc_id, n_chars,
               CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
        FROM documents
    """,
    description="grouped-map applyInPandas: per-source cumulative totals",
)
def grouped_map_cumulative_chars(spark, sf_dir):
    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    return d.groupBy("source").applyInPandas(_cumulate, _CUM_SCHEMA)


# ---------------------------------------------------------------------------
# mapInArrow: the Arrow-native map (no pandas materialization at all)
# ---------------------------------------------------------------------------


def _arrow_byte_stats(batches):
    """RecordBatch -> RecordBatch entirely in Arrow: every statistic is
    a vectorized ``pyarrow.compute`` kernel over the column (C++ SIMD
    paths) — no pandas conversion, no per-row Python objects anywhere
    (compare the pandas-based legs of this battery — for byte-level
    work the conversion IS most of the cost)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        texts = batch.column("text")
        n_bytes = pc.binary_length(pc.cast(texts, pa.binary()))
        n_spaces = pc.count_substring(texts, " ")
        n_vowels = None
        for v in "aeiou":
            c = pc.count_substring(texts, v)
            n_vowels = c if n_vowels is None else pc.add(n_vowels, c)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(n_bytes, pa.int64()),
                pc.cast(n_spaces, pa.int64()),
                pc.cast(n_vowels, pa.int64()),
            ],
            ["doc_id", "n_bytes", "n_spaces", "n_vowels"],
        )


@register(
    "mapinarrow_byte_stats",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               octet_length(encode(text))
                   - octet_length(encode(replace(text, ' ', '')))
                   AS n_spaces,
               length(text) - length(
                   replace(replace(replace(replace(replace(
                       text, 'a', ''), 'e', ''), 'i', ''), 'o', ''),
                       'u', '')) AS n_vowels
        FROM documents
    """,
    description="mapInArrow: RecordBatch-to-RecordBatch byte statistics "
    "with zero pandas materialization (the Arrow-native UDF surface)",
)
def mapinarrow_byte_stats(spark, sf_dir):
    """The fourth Python-execution surface next to the battery's
    UDTF / pandas-UDAF / grouped-map legs: ``mapInArrow`` hands the
    worker raw ``pyarrow.RecordBatch``es and takes them back — no
    pandas round-trip on either side.  For byte-level work (codecs,
    wire formats, hashing) the pandas conversion is pure overhead,
    which is exactly why the protect pipeline's Arrow UDFs and this
    leg exist; the per-value loop here is deliberately simple (the
    codec operators are where the real Arrow-native hot paths live).

    100 TB shape: map-only, batch-at-a-time, output row-aligned with
    input — the same fusion-friendly shape as mapInPandas but with
    one less serialization layer."""
    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select("doc_id", "text")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_spaces", T.LongType()),
            T.StructField("n_vowels", T.LongType()),
        ]
    )
    return d.mapInArrow(_arrow_byte_stats, out_schema)


# ---------------------------------------------------------------------------
# df.observe: pipeline metrics verified in-query
# ---------------------------------------------------------------------------


@register(
    "observed_training_filter",
    oracle="""
        SELECT source,
               count(*) AS n_kept,
               CAST(sum(n_chars) AS BIGINT) AS chars_kept
        FROM documents
        WHERE n_chars >= 100 AND lang IN ('en', 'es', 'de', 'fr')
        GROUP BY source
    """,
    description="df.observe-instrumented quality filter: accumulator "
    "metrics cross-checked in-query against the aggregate they must "
    "equal, then the per-source result is returned",
)
def observed_training_filter(spark, sf_dir):
    """Pipeline observability done the Spark way: ``df.observe`` rides
    named aggregate metrics on the SAME pass that computes the result
    (an accumulator, not a second scan) — at 100 TB this is how a
    filter stage reports its selectivity without paying for a second
    job, the thing ad-hoc ``count()`` calls get wrong.

    The metrics are not just logged: after the one bounded action,
    the observed totals are cross-checked against the per-source
    aggregate they must equal, and a mismatch RAISES — the side
    channel is part of the query's correctness contract, so the
    driver gate covers the observe machinery too (the oracle gates
    the returned aggregate as usual)."""
    from pyspark.sql import Observation

    prep(spark)
    d = load(spark, sf_dir, "documents").select("source", "lang", "n_chars")
    kept = d.filter(
        (F.col("n_chars") >= 100)
        & F.col("lang").isin("en", "es", "de", "fr")
    )
    obs = Observation("training_filter")
    observed = kept.observe(
        obs,
        F.count(F.lit(1)).alias("rows_kept"),
        F.sum("n_chars").cast("bigint").alias("chars_kept"),
    )
    rows = (
        observed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
        .collect()
    )
    got = obs.get
    want_rows = sum(r["n_kept"] for r in rows)
    want_chars = sum(r["chars_kept"] for r in rows)
    if got["rows_kept"] != want_rows or got["chars_kept"] != want_chars:
        raise AssertionError(
            f"observe metrics diverge from the aggregate: observed "
            f"({got['rows_kept']}, {got['chars_kept']}), aggregate "
            f"({want_rows}, {want_chars})"
        )
    return local_frame(
        spark, rows, "source string, n_kept bigint, chars_kept bigint"
    )
