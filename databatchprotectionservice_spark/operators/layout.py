"""Z-order (Morton) layout — multi-dimensional data clustering for
file-level pruning.

Range-partitioning a 100 TB table by ONE key gives parquet min/max
pruning on that key only; queries filtering the other dimension scan
everything. Interleaving the bits of two keys (Morton code) and
range-partitioning by the interleaved value bounds EVERY file's span in
BOTH dimensions, so predicates on either key prune files. This is the
standard warehouse `ZORDER BY` — here it is pure column arithmetic
(bit shifts in whole-stage codegen) + `repartitionByRange`, no custom
writer needed.

The registry query makes the locality measurable (and oracle-checkable)
instead of just asserting it: bucket events by the top z-code bits and
report each bucket's span in user-space and time-space — tight spans ==
working pruning. The reference has no layout surface (it transforms
request batches); this extends the storage toolkit of
``sources/compaction.py`` / ``sources/bucketing.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.registry import load_events, prep, register

Z_BITS = 10  # 10 bits per dimension -> 20-bit z-space
N_BUCKET_SHIFT = 14  # report buckets of 2^14 z-codes (64 buckets)


def _z_spark(u: str, h: str, bits: int = Z_BITS) -> str:
    """Morton interleave as a Spark SQL expression (codegen bit ops)."""
    terms = [
        f"(shiftleft(shiftright({u}, {k}) & 1, {2 * k}) + "
        f"shiftleft(shiftright({h}, {k}) & 1, {2 * k + 1}))"
        for k in range(bits)
    ]
    return " + ".join(terms)


def _z_duck(u: str, h: str, bits: int = Z_BITS) -> str:
    """The same Morton interleave in DuckDB operator syntax."""
    terms = [
        f"(((({u} >> {k}) & 1) << {2 * k}) + "
        f"((({h} >> {k}) & 1) << {2 * k + 1}))"
        for k in range(bits)
    ]
    return " + ".join(terms)


def zorder_code(df, col_a: str, col_b: str, bits: int = Z_BITS):
    """Append a Morton code column ``z`` interleaving the low ``bits``
    of two integer columns. Layout use: ``df.repartitionByRange(n,
    "z").sortWithinPartitions("z").write...`` bounds every output file
    in both dimensions."""
    return df.withColumn("z", F.expr(_z_spark(col_a, col_b, bits)))


@register(
    "zorder_locality_events",
    oracle=f"""
        WITH keyed AS (
            SELECT user_id % {2**Z_BITS} AS u,
                   (CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                    // 3600) % {2**Z_BITS} AS h
            FROM events
        ),
        coded AS (
            SELECT u, h, {_z_duck("u", "h")} AS z FROM keyed
        )
        SELECT CAST(z >> {N_BUCKET_SHIFT} AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_events,
               min(u) AS min_u, max(u) AS max_u,
               min(h) AS min_h, max(h) AS max_h
        FROM coded
        GROUP BY bucket
        ORDER BY bucket
    """,
    description="Z-order (Morton) clustering: bit-interleave "
    "(user_id, hour), bucket by code prefix, report per-bucket spans "
    "in both dimensions — tight spans = file pruning on either key",
)
def zorder_locality_events(spark, sf_dir):
    prep(spark)
    ev = load_events(spark, sf_dir)
    keyed = ev.select(
        (F.col("user_id") % (2**Z_BITS)).alias("u"),
        # integer division end-to-end: no float in the bucketing path
        (F.expr("unix_timestamp(ts) div 3600") % (2**Z_BITS)).alias("h"),
    )
    coded = zorder_code(keyed, "u", "h")
    return (
        coded.groupBy(
            F.shiftright("z", N_BUCKET_SHIFT).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("u").alias("min_u"),
            F.max("u").alias("max_u"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
        .orderBy("bucket")
    )
