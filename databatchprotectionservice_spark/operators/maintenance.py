"""Dataset-maintenance operators (compaction) surfaced in the registry.

``compact_documents_roundtrip`` exercises the real maintenance path —
write the documents table through ``sources.compaction.compact`` (sized
output files, range-partitioned by ``doc_id``) and prove the rewrite
changed NOTHING: the returned per-source aggregates are computed from
the *compacted* copy, while the DuckDB oracle computes them from the
original table. Hash equality == the multiset survived the rewrite.

The final stats frame is materialized eagerly (bounded by the number of
distinct sources — single digits) so the temp output can be removed
before returning; no data-sized collect happens.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.registry import load, local_frame, prep, register, remove_path, scratch_path
from ..sources.compaction import compact

COMPACT_TARGET_BYTES = 256 * 1024  # small target => several files even at sf0.01


@register(
    "compact_documents_roundtrip",
    oracle="""
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               min(md5(text)) AS min_md5,
               max(md5(text)) AS max_md5
        FROM documents
        GROUP BY source
    """,
    description="small-file compaction (sized, range-partitioned rewrite); "
    "oracle proves the rewrite preserves the data multiset",
)
def compact_documents_roundtrip(spark, sf_dir):
    prep(spark)
    src = load(spark, sf_dir, "documents")
    in_dir = scratch_path("dbps_compact_in_")
    out_dir = scratch_path("dbps_compact_out_")
    try:
        # stage a copy (the testdata dir is read-only; a real deployment
        # compacts in place between ingest and scan)
        src.write.mode("overwrite").parquet(in_dir)
        compact(
            spark,
            in_dir,
            out_dir,
            target_file_bytes=COMPACT_TARGET_BYTES,
            sort_by=["doc_id"],
            mode="overwrite",
        )
        stats = (
            spark.read.parquet(out_dir)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.octet_length(F.encode("text", "UTF-8")))
                .cast("bigint")
                .alias("total_bytes"),
                F.min(F.md5("text")).alias("min_md5"),
                F.max(F.md5("text")).alias("max_md5"),
            )
            .collect()
        )
    finally:
        remove_path(spark, in_dir)
        remove_path(spark, out_dir)
    return local_frame(
        spark,
        stats,
        "source string, n_docs bigint, total_bytes bigint, "
        "min_md5 string, max_md5 string",
    )


_ROUNDTRIP_ORACLE = """
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_ids,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               min(md5(text)) AS min_md5,
               max(md5(text)) AS max_md5
        FROM documents
        GROUP BY source
"""


def _roundtrip_stats(spark, back):
    """Per-source aggregates computed from a RE-READ export; hash
    equality against the original-table oracle proves the format
    round-trips every row, byte, and null. Stats are bounded by the
    source cardinality; materialized eagerly so scratch can be removed.
    Shared by the JSONL / CSV / ORC delivery roundtrips — one contract,
    three formats."""
    stats = (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_ids"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.min(F.md5("text")).alias("min_md5"),
            F.max(F.md5("text")).alias("max_md5"),
        )
        .collect()
    )
    return local_frame(
        spark,
        stats,
        "source string, n_docs bigint, sum_doc_ids bigint, n_langs bigint, "
        "min_md5 string, max_md5 string",
    )


@register(
    "export_jsonl_roundtrip",
    oracle=_ROUNDTRIP_ORACLE,
    description="gzip-JSONL training-data delivery: export, schema-explicit "
    "re-ingest; oracle proves the roundtrip is lossless",
)
def export_jsonl_roundtrip(spark, sf_dir):
    """The delivery step of a training-data pipeline: the prepared corpus
    leaves the warehouse as gzip JSONL (the de-facto interchange format
    for LLM training corpora) and is re-ingested for verification. The
    returned per-source aggregates are computed from the RE-READ JSONL
    while the oracle computes them from the original parquet — hash
    equality proves the export round-trips every row, text byte, and
    null exactly.

    100 TB shape: the export is a map-only ``df.write.json`` (one gzip
    member per partition, no shuffle); the re-read passes an EXPLICIT
    schema, skipping ``spark.read.json``'s inference pass — at scale
    inference is a second full scan of the corpus. Stats are bounded by
    the source cardinality; no data-sized collect. The export target is
    ``scratch_path`` — on a cluster, ``$SPARK_GRAFT_SCRATCH`` names the
    shared filesystem all executors write to; the driver-local tempdir
    fallback is only correct in local mode (the test rig)."""
    prep(spark)
    src = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out_dir = scratch_path("dbps_jsonl_")
    try:
        src.write.mode("overwrite").option("compression", "gzip").json(out_dir)
        back = spark.read.schema(
            "doc_id bigint, text string, lang string, source string"
        ).json(out_dir)
        return _roundtrip_stats(spark, back)
    finally:
        remove_path(spark, out_dir)


@register(
    "export_csv_roundtrip",
    oracle=_ROUNDTRIP_ORACLE,
    description="gzip-CSV delivery roundtrip: RFC-4180 quoting/escaping "
    "(embedded quotes and newlines survive), explicit-schema multiLine "
    "re-ingest; oracle proves losslessness",
)
def export_csv_roundtrip(spark, sf_dir):
    """CSV delivery — still the most common interchange format at the
    edges of a training-data pipeline. The trap CSV sets (and this
    query proves handled): free text with embedded quotes, commas and
    newlines must survive the round-trip, which requires RFC-4180
    quoting with ``escape='\"'`` on write AND ``multiLine`` parsing on
    read. Re-ingest passes an EXPLICIT schema (CSV inference is a
    second full scan AND lossy on types).

    100 TB shape: the write is map-only (one gzip member per
    partition). Caveat worth knowing at scale: gzip+multiLine makes
    each FILE the unit of read parallelism — parallelism equals file
    count, set by the writer's partitioning. For a splittable delivery
    use uncompressed CSV or stick to JSONL/parquet."""
    prep(spark)
    src = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out_dir = scratch_path("dbps_csv_")
    try:
        # nullValue='\\N' on BOTH sides keeps null and empty string
        # distinct ('' serializes as "" while null serializes as \N) —
        # with the defaults they collapse to the same empty field and
        # nulls come back for both, silently breaking losslessness
        # ignore*WhiteSpace default TRUE on write: a field with
        # leading/trailing spaces (or whitespace-only text) silently
        # trims, breaking losslessness — hostile-corpus finding, r9
        (
            src.write.mode("overwrite")
            .option("header", True)
            .option("escape", '"')
            .option("nullValue", "\\N")
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .option("compression", "gzip")
            .csv(out_dir)
        )
        back = (
            spark.read.schema(
                "doc_id bigint, text string, lang string, source string"
            )
            .option("header", True)
            .option("escape", '"')
            .option("multiLine", True)
            .option("nullValue", "\\N")
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(out_dir)
        )
        return _roundtrip_stats(spark, back)
    finally:
        remove_path(spark, out_dir)


@register(
    "export_orc_roundtrip",
    oracle=_ROUNDTRIP_ORACLE,
    description="ORC columnar roundtrip (Spark's second native columnar "
    "format): write + re-read + per-source aggregates prove losslessness",
)
def export_orc_roundtrip(spark, sf_dir):
    """ORC — Spark's other first-class columnar format (Hive-ecosystem
    interchange). Same lossless-roundtrip proof as the JSONL/CSV
    deliveries; unlike the text formats ORC carries its own schema and
    supports predicate pushdown, so at 100 TB it is a real storage
    candidate, not just a delivery format (the engine's protected
    datasets stay parquet — the page wire format is parquet-specific
    by design)."""
    prep(spark)
    src = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out_dir = scratch_path("dbps_orc_")
    try:
        src.write.mode("overwrite").orc(out_dir)
        back = spark.read.orc(out_dir)
        return _roundtrip_stats(spark, back)
    finally:
        remove_path(spark, out_dir)


@register(
    "export_xml_roundtrip",
    oracle=_ROUNDTRIP_ORACLE,
    description="XML delivery roundtrip (Spark 4 native XML source): "
    "entity escaping survives, schema-explicit re-ingest; oracle proves "
    "losslessness",
)
def export_xml_roundtrip(spark, sf_dir):
    """XML — the enterprise-interchange edge of the delivery matrix,
    first-class in Spark since 4.0 (the spark-xml package was merged
    into the core distribution). Same lossless contract as the
    JSONL/CSV/ORC roundtrips: the writer must entity-escape markup
    characters in free text (``<`` ``&`` and friends) and the reader
    must undo it, which this proves over the real corpus rather than
    assuming. Re-ingest passes an EXPLICIT schema — XML inference is a
    second full scan, and (worse than CSV) it infers numeric-looking
    text fields as numbers.

    100 TB shape: map-only write, one file per partition with a
    ``rowTag`` element per record. The same caveat as gzip-CSV applies
    double: XML is not splittable at row boundaries, so read
    parallelism equals file count — a delivery format, never a storage
    format."""
    prep(spark)
    src = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out_dir = scratch_path("dbps_xml_")
    try:
        (
            src.write.mode("overwrite")
            .format("xml")
            .option("rootTag", "documents")
            .option("rowTag", "document")
            .save(out_dir)
        )
        # ignoreSurroundingSpaces default TRUE trims element text on
        # read — whitespace-only and space-terminated documents came
        # back altered (hostile-corpus finding, r9)
        back = (
            spark.read.schema(
                "doc_id bigint, text string, lang string, source string"
            )
            .format("xml")
            .option("rowTag", "document")
            .option("ignoreSurroundingSpaces", False)
            .load(out_dir)
        )
        return _roundtrip_stats(spark, back)
    finally:
        remove_path(spark, out_dir)
