"""Bucketed co-located joins eliminate the shuffle — proven on the plan."""

import pytest

from pyspark.sql import functions as F

from databatchprotectionservice_spark.sources.bucketing import (
    exchange_count,
    read_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=4,
                   path=str(base / "b_orders"))
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], num_buckets=4,
                   path=str(base / "b_lineitem"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    o = read_table(spark, "b_orders")
    li = read_table(spark, "b_lineitem")
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        joined.collect()
        # the join itself is exchange-free; the only exchange allowed is
        # the final low-cardinality groupBy
        assert exchange_count(joined) <= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join on plain parquet has >= 2 exchanges."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        joined.collect()
        assert exchange_count(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_result_matches_plain(spark, sf_dir, bucketed_tables):
    o = read_table(spark, "b_orders")
    li = read_table(spark, "b_lineitem")
    got = sorted(
        tuple(r)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    po = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pl = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = sorted(
        tuple(r)
        for r in pl.join(po, pl.l_orderkey == po.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == want
