"""Batch sessionization — gap-based session assignment over event
history (the batch twin of the streaming
``applyInPandasWithState`` sessionizer in ``operators/streamops.py``,
same 30-minute gap rule).

Classic two-window shape, both over the SAME (user_id, ts) partitioning
so Spark plans ONE shuffle: ``lag`` marks session starts (gap >
``SESSION_GAP_S`` from the previous event), a running sum of the marks
numbers the sessions. All arithmetic is integer epoch-seconds — no
interval/timezone semantics to diverge between engines. At 100 TB the
window partitions by user_id, so state is bounded by one user's history
per task; a power-user hot key would shard by (user_id, day) with
boundary stitching.

The reference has no event-time surface; this belongs to the engine's
analytics spine with the as-of join (`operators/relational.py`).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import load_events, prep, register

SESSION_GAP_S = 1800  # 30 minutes


@register(
    "sessionize_events_batch",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_id,
                   CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
            FROM events
        ),
        marked AS (
            SELECT user_id, event_id, sec,
                   CASE WHEN sec - lag(sec) OVER w > {SESSION_GAP_S}
                        THEN 1
                        WHEN lag(sec) OVER w IS NULL THEN 1
                        ELSE 0 END AS is_start
            FROM seq
            WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        ),
        numbered AS (
            SELECT user_id, sec,
                   sum(is_start) OVER (PARTITION BY user_id
                                       ORDER BY sec, event_id) AS session_id
            FROM marked
        )
        SELECT user_id,
               CAST(session_id AS BIGINT) AS session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               min(sec) AS start_sec,
               max(sec) AS end_sec,
               max(sec) - min(sec) AS duration_s
        FROM numbered
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    description="gap-based batch sessionization: lag marks starts, "
    "running sum numbers sessions — two windows, one shuffle",
)
def sessionize_events_batch(spark, sf_dir):
    prep(spark)
    ev = load_events(spark, sf_dir)
    seq = ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    prev = F.lag("sec").over(w)
    is_start = (
        F.when(prev.isNull(), F.lit(1))
        .when(F.col("sec") - prev > SESSION_GAP_S, F.lit(1))
        .otherwise(F.lit(0))
    )
    numbered = seq.withColumn("is_start", is_start).withColumn(
        "session_id", F.sum("is_start").over(w)
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("sec").alias("start_sec"),
            F.max("sec").alias("end_sec"),
            (F.max("sec") - F.min("sec")).alias("duration_s"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("bigint").alias("session_id"),
            "n_events",
            "start_sec",
            "end_sec",
            "duration_s",
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# SCD2 history build: change events -> type-2 validity intervals
# ---------------------------------------------------------------------------


@register(
    "scd2_user_status_history",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ),
        marked AS (
            SELECT user_id, event_id, event_type, us,
                   CASE WHEN lag(event_type) OVER w IS NULL
                             OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS chg
            FROM seq WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        numbered AS (
            SELECT user_id, event_type, us,
                   sum(chg) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS version
            FROM marked
        ),
        islands AS (
            SELECT user_id,
                   CAST(version AS BIGINT) AS version,
                   min(event_type) AS status,
                   min(us) AS valid_from_us,
                   max(us) AS last_seen_us,
                   count(*) AS n_events
            FROM numbered GROUP BY user_id, version
        )
        SELECT user_id, version, status, valid_from_us,
               lead(valid_from_us) OVER (PARTITION BY user_id
                                         ORDER BY version) AS valid_to_us,
               last_seen_us, n_events,
               lead(valid_from_us) OVER (PARTITION BY user_id
                                         ORDER BY version) IS NULL
                   AS is_current
        FROM islands
    """,
    description="SCD2 history build: consecutive same-status runs per "
    "user collapse to type-2 validity intervals (valid_from/valid_to, "
    "version, is_current) — gaps-and-islands + lead, one shuffle",
)
def scd2_user_status_history(spark, sf_dir):
    """Type-2 slowly-changing-dimension build — the warehouse pattern
    for turning a change-event stream into queryable history: each run
    of consecutive equal ``event_type`` values per user becomes one
    dimension row with a half-open validity interval
    ``[valid_from, valid_to)``, a per-user version number, and
    ``is_current`` on the open row.  Gaps-and-islands (lag marks
    changes, running sum numbers islands) -> per-island aggregate ->
    ``lead`` closes each interval with the next island's start.

    All timestamps are integer epoch-microseconds (no interval or
    timezone semantics to diverge between engines).

    100 TB shape: everything partitions by ``user_id`` — the two
    windows AND the island aggregate hash on it (the aggregate's
    (user_id, version) grouping is satisfied by the user_id exchange:
    clustering by a key subset co-locates the superset), so the whole
    history build is ONE shuffle.  Per-task state is one user's
    history, the same bound as sessionization; the SCD2 output is
    strictly smaller than its input (one row per run, not per
    event)."""
    prep(spark)
    ev = load_events(spark, sf_dir)
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev_type = F.lag("event_type").over(w)
    chg = F.when(
        prev_type.isNull() | (prev_type != F.col("event_type")), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = seq.withColumn("chg", chg).withColumn(
        "version", F.sum("chg").over(w)
    )
    islands = numbered.groupBy("user_id", "version").agg(
        F.min("event_type").alias("status"),
        F.min("us").alias("valid_from_us"),
        F.max("us").alias("last_seen_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("valid_from_us").over(wv)
    return islands.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "status",
        "valid_from_us",
        nxt.alias("valid_to_us"),
        "last_seen_us",
        "n_events",
        nxt.isNull().alias("is_current"),
    )
