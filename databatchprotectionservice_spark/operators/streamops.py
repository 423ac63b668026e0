"""Streaming queries surfaced through the batch query registry.

``streaming_hourly_rollup`` runs the watermarked Structured Streaming
rollup to completion (availableNow trigger into a memory sink) and
returns the emitted rows. Append-mode emission semantics are exact and
deterministic — a window is emitted iff ``window.end <= final_watermark``
where the final watermark is ``max(event_ts) - delay`` — so the DuckDB
oracle states the same rule in SQL and the driver's hash compare applies
to a *streaming* operator.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from ..plans.registry import prep, register, table_path

WATERMARK_DELAY_HOURS = 2


@register(
    "streaming_hourly_rollup",
    oracle=f"""
        WITH wm AS (
            SELECT max(CAST(ts AS TIMESTAMP))
                   - INTERVAL {WATERMARK_DELAY_HOURS} HOUR AS final_wm
            FROM events
        )
        SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                        '%Y-%m-%d %H:00') AS hour_bucket,
               event_type,
               count(*) AS n,
               sum(CAST(value AS DECIMAL(18,2))) AS sum_value
        FROM events, wm
        WHERE date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR
              <= wm.final_wm
        GROUP BY 1, 2
    """,
    description="watermarked streaming window rollup; append-mode "
    "emission rule restated in SQL as the oracle",
)
def streaming_hourly_rollup(spark, sf_dir):
    from ..streaming import read_events_stream, windowed_event_rollup

    prep(spark)
    stream = read_events_stream(spark, table_path(sf_dir, "events"))
    rollup = windowed_event_rollup(
        stream, window_duration="1 hour", watermark=f"{WATERMARK_DELAY_HOURS} hours"
    )
    name = f"streaming_hourly_rollup_{time.time_ns()}"
    q = (
        rollup.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    # materialize before the memory sink table goes away with the query
    out = spark.table(name).select(
        "hour_bucket",
        "event_type",
        "n",
        F.col("sum_value").cast("decimal(18,2)").alias("sum_value"),
    )
    return spark.createDataFrame(out.collect(), out.schema)
