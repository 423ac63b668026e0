"""Registered query driving the ``dbps_protected`` Python data source.

The round-trip the reference's remote test app performs over HTTP
(``dbpa_remote_testapp.cpp:339-581``) — protect, persist, reopen,
verify values — expressed as Spark-native formats end-to-end:
``write_protected`` stages an AES-SIV-protected copy of ``customer``,
then ``spark.read.format("dbps_protected")`` opens it declaratively and
the aggregate must equal the raw table's (round-trip identity through
the on-disk format AND the data-source planning path).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from ..plans.registry import load, prep, register
from .relational import DEC, dec_str


def _stage_dir(tag: str, sf_dir: str) -> str:
    """Deterministic staging path per (tag, sf_dir): a content hash, not
    Python's per-process-randomized str hash, so repeated driver runs
    reuse one directory instead of accumulating stale copies."""
    digest = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"{tag}_{digest}")


@register(
    "datasource_protected_read",
    oracle="""
        SELECT
            c_mktsegment,
            count(*) AS n,
            CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_acctbal,
            min(c_name) AS min_name,
            max(c_name) AS max_name
        FROM customer
        GROUP BY c_mktsegment
    """,
    description="protected dataset opened via the dbps_protected Python "
    "data source (spark.read.format); file-per-partition fan-out, "
    "vectorized Arrow decrypt in the reader",
)
def datasource_protected_read(spark, sf_dir):
    from ..sources.dbps_datasource import register_dbps_datasource
    from ..sources.protected_parquet import write_protected

    prep(spark)
    register_dbps_datasource(spark)
    # stage an AES-SIV-protected copy once per (session tmp, sf) — the
    # staged write is part of what the query exercises
    staged = _stage_dir("dbps_ds_stage", sf_dir)
    c = load(spark, sf_dir, "customer")
    write_protected(
        c,
        staged,
        {"c_name": "key_name", "c_acctbal": "key_bal"},
        encryptor="aes_siv",
        mode="overwrite",
    )
    got = spark.read.format("dbps_protected").load(staged)
    return got.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dec_str(F.sum(F.col("c_acctbal").cast(DEC))).alias("sum_acctbal"),
        F.min("c_name").alias("min_name"),
        F.max("c_name").alias("max_name"),
    )


@register(
    "datasource_protected_partitioned",
    oracle="""
        SELECT
            CAST(c_nationkey AS BIGINT) AS c_nationkey,
            count(*) AS n,
            CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_acctbal,
            min(c_name) AS min_name
        FROM customer
        WHERE c_nationkey < 10
        GROUP BY c_nationkey
    """,
    description="hive-partitioned protected dataset via the "
    "dbps_protected data source: partition-value pruning at planning "
    "time (pruned directories never become splits), decrypt inside "
    "surviving splits only",
)
def datasource_protected_partitioned(spark, sf_dir):
    """Round-trips ``customer`` through a c_nationkey-partitioned
    protected layout (``write_protected(partition_by=...)``) and reads
    it back declaratively with a partition predicate. The ``< 10``
    filter reaches ``pushFilters`` as a partition-column predicate and
    prunes 15 of the 25 nation directories before any split exists —
    the data-source analogue of the native reader's PartitionFilters
    (pinned in tests/test_dbps_datasource.py)."""
    from ..sources.dbps_datasource import register_dbps_datasource
    from ..sources.protected_parquet import write_protected

    prep(spark)
    register_dbps_datasource(spark)
    staged = _stage_dir("dbps_ds_part", sf_dir)
    c = load(spark, sf_dir, "customer")
    write_protected(
        c,
        staged,
        {"c_name": "key_name", "c_acctbal": "key_bal"},
        encryptor="keystream_xor",
        mode="overwrite",
        partition_by=["c_nationkey"],
    )
    got = spark.read.format("dbps_protected").load(staged)
    return (
        got.filter(F.col("c_nationkey") < 10)
        .groupBy(F.col("c_nationkey").cast("bigint").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_str(F.sum(F.col("c_acctbal").cast(DEC))).alias("sum_acctbal"),
            F.min("c_name").alias("min_name"),
        )
    )
