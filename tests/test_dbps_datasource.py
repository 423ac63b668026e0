"""The dbps_protected Python data source: schema from sidecar,
vectorized decrypt in the reader, file-per-partition fan-out."""

import pytest

from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from databatchprotectionservice_spark.core.errors import DBPSInvalidInputError
from databatchprotectionservice_spark.sources.dbps_datasource import (
    ProtectedParquetDataSource,
    register_dbps_datasource,
)
from databatchprotectionservice_spark.sources.protected_parquet import (
    write_protected,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        Row(pid=1, name="ada", balance=10.5, dec="12.34"),
        Row(pid=2, name=None, balance=-3.25, dec=None),
        Row(pid=3, name="grace", balance=None, dec="-0.01"),
        Row(pid=4, name="", balance=0.0, dec="9999999999.99"),
    ]
    return spark.createDataFrame(rows).withColumn(
        "dec", F.col("dec").cast(T.DecimalType(12, 2))
    )


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register_dbps_datasource(spark)


def _vals(df, column):
    return sorted(
        (r[0] for r in df.select(column).collect()),
        key=lambda v: (v is None, str(v)),
    )


@pytest.mark.parametrize("encryptor", ["keystream_xor", "aes_siv"])
def test_format_read_restores_values_and_types(
    spark, people, tmp_path, encryptor
):
    path = str(tmp_path / f"ds_{encryptor}")
    cols = {"name": "key_A", "balance": "key_B", "dec": "key_C"}
    write_protected(people.repartition(3), path, cols, encryptor=encryptor)
    got = spark.read.format("dbps_protected").load(path)
    assert dict(got.dtypes) == dict(people.dtypes)
    for c in ["pid", "name", "balance", "dec"]:
        assert _vals(got, c) == _vals(people, c)


def test_partitions_map_files(spark, people, tmp_path):
    path = str(tmp_path / "ds_parts")
    write_protected(people.repartition(3), path, {"name": "key_A"})
    got = spark.read.format("dbps_protected").load(path)
    # one input partition per parquet file => parallelism tracks layout
    assert got.rdd.getNumPartitions() == 3


def test_schema_is_footer_only_and_unprotected_cols_passthrough(
    spark, people, tmp_path
):
    path = str(tmp_path / "ds_schema")
    write_protected(people, path, {"dec": "key_C"})
    schema = spark.read.format("dbps_protected").load(path).schema
    assert schema["dec"].dataType == T.DecimalType(12, 2)
    assert schema["balance"].dataType == T.DoubleType()


def test_unprotected_dataset_rejected(spark, people, tmp_path):
    path = str(tmp_path / "plain")
    people.write.parquet(path)
    ds = ProtectedParquetDataSource({"path": path})
    with pytest.raises(DBPSInvalidInputError, match="not a protected"):
        ds.schema()


def test_partitioned_dataset_directed_to_read_protected(
    spark, people, tmp_path
):
    path = str(tmp_path / "ds_partby")
    write_protected(people, path, {"name": "key_A"}, partition_by=["pid"])
    ds = ProtectedParquetDataSource({"path": path})
    with pytest.raises(DBPSInvalidInputError, match="read_protected"):
        ds.schema()


def test_format_write_roundtrip_and_ciphertext_on_disk(
    spark, people, tmp_path
):
    from databatchprotectionservice_spark.sources.protected_parquet import (
        read_protected,
    )

    path = str(tmp_path / "dsw")
    (
        people.repartition(3)
        .write.format("dbps_protected")
        .mode("append")
        .option("columns", "name:key_A,dec:key_C")
        .option("encryptor", "aes_siv")
        .save(path)
    )
    # both readers agree with the original
    for got in (
        spark.read.format("dbps_protected").load(path),
        read_protected(spark, path),
    ):
        assert dict(got.dtypes) == dict(people.dtypes)
        for c in ["pid", "name", "balance", "dec"]:
            assert _vals(got, c) == _vals(people, c)
    # protected columns are REALLY ciphertext on disk
    raw = dict(spark.read.parquet(path).dtypes)
    assert raw["name"] == "binary" and raw["dec"] == "binary"
    assert raw["balance"] == "double"  # unprotected passthrough


def test_format_write_append_validates_config(spark, people, tmp_path):
    path = str(tmp_path / "dsw_append")
    w = lambda df, cols: (
        df.write.format("dbps_protected")
        .mode("append")
        .option("columns", cols)
        .save(path)
    )
    w(people, "name:key_A")
    w(people, "name:key_A")  # same config appends
    got = spark.read.format("dbps_protected").load(path)
    assert got.count() == 2 * people.count()
    with pytest.raises(Exception, match="append config mismatch"):
        w(people, "name:key_B")


def test_format_write_overwrite_replaces(spark, people, tmp_path):
    path = str(tmp_path / "dsw_over")
    (
        people.write.format("dbps_protected")
        .mode("append")
        .option("columns", "name:key_A")
        .save(path)
    )
    (
        people.limit(1)
        .write.format("dbps_protected")
        .mode("overwrite")
        .option("columns", "name:key_Z")
        .save(path)
    )
    got = spark.read.format("dbps_protected").load(path)
    assert got.count() == 1


def test_format_write_requires_columns_option(spark, people, tmp_path):
    with pytest.raises(Exception, match="columns"):
        people.write.format("dbps_protected").mode("append").save(
            str(tmp_path / "dsw_nocols")
        )


def test_filter_pushdown_on_unprotected_column(spark, people, tmp_path):
    """Comparison filters on unprotected columns reach the pyarrow scan
    (visible as PushedFilters in the plan); results stay correct."""
    path = str(tmp_path / "ds_pushdown")
    write_protected(people.repartition(2), path, {"name": "key_A"})
    got = (
        spark.read.format("dbps_protected")
        .load(path)
        .filter((F.col("pid") > 1) & F.col("balance").isNotNull())
    )
    # fully pushed: the plan has NO Spark-side Filter node left —
    # both predicates were accepted by pushFilters and evaluate inside
    # the pyarrow scan (the Python BatchScan prints no PushedFilters
    # label, so absence of Filter is the observable contract)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan dbps_protected" in plan
    assert "Filter " not in plan
    rows = sorted(got.collect(), key=lambda r: r.pid)
    assert [r.pid for r in rows] == [2, 4]
    assert rows[1].name == ""  # decrypt still correct post-filter


def test_filter_on_protected_column_stays_in_spark(spark, people, tmp_path):
    """Predicates on protected columns cannot push down (on-disk cells
    are ciphertext); they evaluate in Spark after decrypt, and results
    match the plain dataset."""
    path = str(tmp_path / "ds_nopush")
    write_protected(people, path, {"name": "key_A"})
    got = (
        spark.read.format("dbps_protected")
        .load(path)
        .filter(F.col("name") == "grace")
    )
    # NOT pushed: a Spark-side Filter node remains to evaluate the
    # predicate after decrypt
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Filter " in plan
    assert [r.pid for r in got.collect()] == [3]


def test_stream_sink_writes_decryptable_dataset(spark, people, tmp_path):
    """df.writeStream.format('dbps_protected') protects on the fly;
    the result opens with both readers and matches the batch input."""
    import time as _time

    from databatchprotectionservice_spark.sources.protected_parquet import (
        read_protected,
    )

    src = str(tmp_path / "stream_src")
    people.coalesce(1).write.parquet(src)
    dst = str(tmp_path / "stream_dst")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(people.schema).parquet(src)
    q = (
        stream.writeStream.format("dbps_protected")
        .option("columns", "name:key_A,dec:key_C")
        .option("encryptor", "aes_siv")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(dst)
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    for got in (
        spark.read.format("dbps_protected").load(dst),
        read_protected(spark, dst),
    ):
        for c in ["pid", "name", "balance", "dec"]:
            assert _vals(got, c) == _vals(people, c)
    raw = dict(spark.read.parquet(dst).dtypes)
    assert raw["name"] == "binary" and raw["dec"] == "binary"
