"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-to-fact join is the shuffle. Spark
bucketing pre-partitions (and optionally pre-sorts) a saved table by the
join key, so two tables bucketed the same way join with ZERO exchanges:
each task reads matching bucket files from both sides. This module wraps
``bucketBy``/``sortBy`` saves and exposes a plan inspector the tests use
to prove the exchange disappeared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _drop_stale(spark: SparkSession, table_name: str) -> None:
    """Drop a prior table AND its orphaned warehouse directory: a fresh
    metastore does not know about directories an earlier session left
    behind, and ``saveAsTable`` refuses to reuse the location."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    jvm = spark.sparkContext._jvm
    loc = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).rstrip("/")
    hpath = jvm.org.apache.hadoop.fs.Path(f"{loc}/{table_name}")
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save as a bucketed (and optionally sorted) parquet table —
    managed, or external when ``path`` is given.

    ``num_buckets`` should be sized so one bucket of the LARGER table
    fits an executor's working memory at target scale; both sides of a
    co-located join must use the same cols + count.
    """
    if mode == "overwrite" and path is None:
        _drop_stale(df.sparkSession, table_name)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the (final) physical plan
    — the thing bucketing exists to eliminate. AQE plans echo the initial
    plan below the final one; only the final section is counted."""
    plan = physical_plan(df).split("== Initial Plan ==")[0]
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
