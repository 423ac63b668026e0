"""MERGE-style upsert — apply a change batch to a base table in one
pass (the ``MERGE INTO`` every warehouse engine exposes; the reference
transforms request batches and never owns table state, so this is part
of the Spark-native table-maintenance surface alongside
``sources/compaction.py``).

Semantics implemented (the standard three-arm merge):

* matched + change says delete  -> drop the row
* matched + change says update  -> replace payload columns
* not matched (new key)         -> insert

Spark shape: ONE full-outer hash join on the key, then ``coalesce``
picks the surviving side per column — no per-row logic, wholly
codegen. At 100 TB the base side is the large one; if the base is
bucketed by the key (``sources/bucketing.py``) the join reads
co-located buckets and the merge is shuffle-free on the base side; the
change batch (typically <<1% of base) shuffles only itself. Rewriting
only the touched partitions (copy-on-write) composes with
``repartitionByRange`` at the write step.

The change batch here is derived deterministically from the documents
table itself (every doc_id % 10 == 0 is updated, % 10 == 1 is deleted,
and fresh keys beyond max(doc_id) are inserted), so the DuckDB oracle
can restate the merge as a set expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.registry import load, prep, register

UPD_MOD = 10  # doc_id % 10 == 0 -> update, == 1 -> delete
N_INSERTS = 7


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    payload_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Generic three-arm merge: ``changes[op_col]`` in
    {'update','insert','delete'}; update/insert carry payload columns.
    Returns the merged table with the base schema."""
    c = changes.select(
        F.col(key).alias("_ck"),
        F.col(op_col).alias("_op"),
        *[F.col(p).alias(f"_c_{p}") for p in payload_cols],
    )
    joined = base.join(c, base[key] == c["_ck"], "full_outer")
    surviving = joined.filter(
        # matched deletes drop out; everything else survives
        F.coalesce(F.col("_op") != F.lit("delete"), F.lit(True))
    )
    out_key = F.coalesce(base[key], F.col("_ck")).alias(key)
    out_cols = [out_key] + [
        F.coalesce(F.col(f"_c_{p}"), base[p]).alias(p) for p in payload_cols
    ]
    return surviving.select(*out_cols)


@register(
    "merge_upsert_documents",
    oracle=f"""
        WITH upd AS (
            SELECT doc_id, upper(text) AS text
            FROM documents WHERE doc_id % {UPD_MOD} = 0
        ),
        ins AS (
            SELECT (SELECT max(doc_id) FROM documents) + 1 + i AS doc_id,
                   'inserted-' || CAST(i AS VARCHAR) AS text
            FROM range({N_INSERTS}) t(i)
        ),
        merged AS (
            SELECT d.doc_id,
                   COALESCE(u.text, d.text) AS text
            FROM documents d LEFT JOIN upd u ON u.doc_id = d.doc_id
            WHERE d.doc_id % {UPD_MOD} <> 1
            UNION ALL
            SELECT doc_id, text FROM ins
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(length(text)) AS BIGINT) AS total_chars,
               CAST(sum(CASE WHEN text = upper(text) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_upper,
               min(md5(text)) AS min_md5,
               max(md5(text)) AS max_md5
        FROM merged
    """,
    description="three-arm MERGE (update/delete/insert) as one "
    "full-outer join + coalesce, verified by content checksums",
)
def merge_upsert_documents(spark, sf_dir):
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    max_id = F.broadcast(
        docs.agg(F.max("doc_id").alias("m"))
    )  # 1-row dimension, reused by the insert arm
    updates = docs.filter(F.col("doc_id") % UPD_MOD == 0).select(
        "doc_id", F.upper("text").alias("text"), F.lit("update").alias("op")
    )
    deletes = docs.filter(F.col("doc_id") % UPD_MOD == 1).select(
        "doc_id", F.lit(None).cast("string").alias("text"),
        F.lit("delete").alias("op"),
    )
    inserts = (
        spark.range(N_INSERTS)
        .crossJoin(max_id)
        .select(
            (F.col("m") + 1 + F.col("id")).alias("doc_id"),
            F.concat(F.lit("inserted-"), F.col("id").cast("string")).alias(
                "text"
            ),
            F.lit("insert").alias("op"),
        )
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    merged = merge_upsert(
        docs.select("doc_id", "text"), changes, "doc_id", ["text"]
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum((F.col("text") == F.upper("text")).cast("int"))
        .cast("bigint")
        .alias("n_upper"),
        F.min(F.md5("text")).alias("min_md5"),
        F.max(F.md5("text")).alias("max_md5"),
    )
