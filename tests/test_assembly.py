"""Unit tests for dataset-assembly operators: merge upsert arms,
compaction invariants, and sampling determinism.

The DuckDB oracle gate (scripts/check_oracle.py) covers end-to-end
values; these tests pin the semantic edges the gate's aggregate outputs
could mask.
"""

import pytest

from pyspark.sql import Row, functions as F

from databatchprotectionservice_spark.operators.sampling import (
    mix_weighted_sources,
    sample_quota_per_source,
    sample_split_train_test,
)
from databatchprotectionservice_spark.operators.upsert import merge_upsert
from databatchprotectionservice_spark.sources.compaction import (
    compact,
    dataset_bytes,
)


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )


def _merge(spark, base, changes):
    cdf = spark.createDataFrame(changes, "k bigint, v string, op string")
    out = merge_upsert(base, cdf, "k", ["v"])
    return {r.k: r.v for r in out.collect()}


def test_merge_update_replaces_payload(spark, base):
    got = _merge(spark, base, [Row(k=2, v="B", op="update")])
    assert got == {1: "a", 2: "B", 3: "c"}


def test_merge_delete_drops_row(spark, base):
    got = _merge(spark, base, [Row(k=1, v=None, op="delete")])
    assert got == {2: "b", 3: "c"}


def test_merge_insert_adds_new_key(spark, base):
    got = _merge(spark, base, [Row(k=9, v="z", op="insert")])
    assert got == {1: "a", 2: "b", 3: "c", 9: "z"}


def test_merge_unmatched_delete_is_noop(spark, base):
    got = _merge(spark, base, [Row(k=42, v=None, op="delete")])
    assert got == {1: "a", 2: "b", 3: "c"}


def test_merge_all_arms_together(spark, base):
    got = _merge(
        spark,
        base,
        [
            Row(k=1, v="A", op="update"),
            Row(k=2, v=None, op="delete"),
            Row(k=7, v="g", op="insert"),
        ],
    )
    assert got == {1: "A", 3: "c", 7: "g"}


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------


def test_compact_preserves_multiset_and_sizes_files(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    # stage with MANY tiny files — the pathology compaction fixes
    src.repartition(16).write.parquet(in_dir)
    in_bytes = dataset_bytes(spark, in_dir)
    stats = compact(spark, in_dir, out_dir, target_file_bytes=in_bytes // 2)
    assert stats["n_output_files"] in (2, 3)
    before = spark.read.parquet(in_dir)
    after = spark.read.parquet(out_dir)
    assert after.count() == before.count()
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0


def test_compact_sorted_rewrite_orders_within_files(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    src.repartition(8).write.parquet(in_dir)
    compact(
        spark,
        in_dir,
        out_dir,
        target_file_bytes=dataset_bytes(spark, in_dir) // 2,
        sort_by=["doc_id"],
    )
    # range-partitioned + sorted => global doc_id order file-to-file is
    # monotone within each file (what parquet min/max pruning needs)
    after = spark.read.parquet(out_dir)
    by_file = (
        after.select("doc_id", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in by_file)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint ranges -> pruning works


# ---------------------------------------------------------------------------
# sampling determinism
# ---------------------------------------------------------------------------


def test_split_is_pure_function_of_doc_id(spark, sf_dir):
    from databatchprotectionservice_spark.operators.sampling import _bucket

    a = {
        r.doc_id: r.split
        for r in sample_split_train_test(spark, sf_dir).collect()
    }
    # recompute the assignment over an adversarially repartitioned input:
    # a pure row function must not care about physical layout
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(13)
    b = {
        r.doc_id: r.b
        for r in docs.select("doc_id", _bucket().alias("b")).collect()
    }
    for doc_id, split in a.items():
        expect = "train" if b[doc_id] < 80 else "valid" if b[doc_id] < 90 else "test"
        assert split == expect
    assert set(a.values()) == {"train", "valid", "test"}


def test_quota_never_exceeded(spark, sf_dir):
    from databatchprotectionservice_spark.operators.sampling import (
        QUOTA_PER_SOURCE,
    )

    out = sample_quota_per_source(spark, sf_dir)
    per_source = out.groupBy("source").count().collect()
    assert all(r["count"] <= QUOTA_PER_SOURCE for r in per_source)


def test_mix_selected_bounded_by_total(spark, sf_dir):
    for r in mix_weighted_sources(spark, sf_dir).collect():
        assert 0 <= r.n_selected <= r.n_total


# ---------------------------------------------------------------------------
# layout & incremental
# ---------------------------------------------------------------------------


def test_zorder_buckets_are_local_in_both_dims(spark, sf_dir):
    """Each z-bucket must span a small box in (user, hour) space —
    the property that makes file pruning work on either predicate.
    Top 6 z-bits pin 3 high bits of each dimension, so a bucket covers
    at most 1/8 of either range (128 of 1024)."""
    from databatchprotectionservice_spark.operators.layout import (
        zorder_locality_events,
    )

    rows = zorder_locality_events(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        assert r.max_u - r.min_u < 128
        assert r.max_h - r.min_h < 128


def test_incremental_merge_equals_direct(spark, sf_dir):
    """Monoid merge of daily partials == direct aggregation over raw
    events (the invariant that makes incremental maintenance sound)."""
    from pyspark.sql import functions as F

    from databatchprotectionservice_spark.operators.incremental import (
        daily_partials,
        merge_partials,
    )
    from databatchprotectionservice_spark.plans.registry import load_events

    ev = load_events(spark, sf_dir)
    merged = merge_partials(daily_partials(ev), "user_id").collect()
    direct = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    )
    key = lambda rows: {
        r.user_id: (r.n, r.sum_value, r.min_value, r.max_value) for r in rows
    }
    assert key(merged) == key(direct)
