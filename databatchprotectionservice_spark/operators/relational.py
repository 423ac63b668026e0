"""Relational query suite — the declarative operator coverage.

The reference implements none of the classic relational operators (SURVEY
§2.2: joins/aggregations/windows/sorts are all "—"); in the Spark-native
engine they are first-class because the pipeline around column protection
needs them (protect-then-analyze workloads). Everything here is expressed
with built-in DataFrame operations so Catalyst gets full freedom:
predicate pushdown to the Parquet scans, column pruning, broadcast joins
for the small dimensions, AQE for runtime re-planning.

Scale notes (100 TB): every query below either aggregates after a
pushed-down filter (map-side partial aggregation, no wide rows through the
shuffle) or joins a large fact table against explicitly-broadcast
dimensions — the only full shuffles are the final groupBy exchanges on
low-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.registry import load, load_events, prep, register

DEC = "decimal(18,2)"


def dec_str(col, scale: int = 2):
    """Canonical decimal output: identical explicit scale, emitted as a
    string on BOTH engine sides.

    The driver's hasher compares ``str()`` over pandas frames, and DuckDB's
    ``.df()`` lowers DECIMAL to float64 (``100.50`` -> ``"100.5"``) while
    Spark keeps Decimal objects (``"100.50"``) — so raw decimal outputs
    hash-mismatch on any trailing zero or NULL. Strings with a pinned
    scale are engine-exact; the SQL twin is
    ``CAST(CAST(x AS DECIMAL(38,s)) AS VARCHAR)``."""
    return col.cast(f"decimal(38,{scale})").cast("string")


def round_ieee(col, digits: int = 4):
    """Float rounding that is bit-identical across engines BY
    CONSTRUCTION: ``floor(x * 10^d + 0.5) / 10^d`` in pure IEEE double
    ops. Engine-native ``round`` differs at half boundaries — Spark
    rounds the exact BigDecimal expansion of the double (HALF_UP) while
    DuckDB rounds after a float multiply, so e.g. an ``x*10^4`` that
    lands on ``….5`` only after the multiply flips the last digit
    (observed: 0.8362 vs 0.8363 at sf0.1). The floor form runs the SAME
    multiply/add/floor/divide on both sides, so identical input bits
    give identical output bits. SQL twin: :func:`round_ieee_sql`."""
    s = float(10**digits)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def round_ieee_sql(expr: str, digits: int = 4) -> str:
    s = float(10**digits)
    return f"floor(({expr}) * {s} + 0.5) / {s}"


# ---------------------------------------------------------------------------
# Q1-style pricing summary: scan -> filter -> groupBy aggregate
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
            CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_base_price,
            CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(8,2)))
                 AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
            CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(8,2))
                 * CAST(1 + l_tax AS DECIMAL(8,2)))
                 AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge,
            count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 adapted: pushed-down filter + hash aggregate",
)
def q1_pricing_summary(spark, sf_dir):
    # the 1±x factors are DECIMAL(8,2) so the triple product stays inside
    # DECIMAL(38) exact arithmetic in BOTH engines (DuckDB widens products
    # by w1+w2 and falls out of decimal past 38 — which silently becomes
    # DOUBLE and breaks hash equality)
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    dec8 = "decimal(8,2)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(dec8)
            ).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(dec8)
                * (F.lit(1) + F.col("l_tax")).cast(dec8)
            ).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            dec_str(F.col("sum_qty")).alias("sum_qty"),
            dec_str(F.col("sum_base_price")).alias("sum_base_price"),
            dec_str(F.col("sum_disc_price"), 4).alias("sum_disc_price"),
            dec_str(F.col("sum_charge"), 6).alias("sum_charge"),
            "count_order",
        )
    )


# ---------------------------------------------------------------------------
# Q3-style shipping priority: 3-way join, aggregate, top-k
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(CAST(revenue AS DECIMAL(38,4)) AS VARCHAR) AS revenue,
               orderdate
        FROM (
            SELECT
                l.l_orderkey,
                sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS revenue,
                CAST(o.o_orderdate AS DATE) AS orderdate
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
              AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
            GROUP BY l.l_orderkey, o.o_orderdate
            ORDER BY revenue DESC, orderdate, l_orderkey
            LIMIT 10
        )
    """,
    description="TPC-H Q3 adapted: shuffle fact joins (AQE broadcast at small SF) -> agg -> top-k",
)
def q3_shipping_priority(spark, sf_dir):
    prep(spark)
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        # no broadcast hints: orders (date-filtered ~97%) and customer
        # (1/5 segment) are FACT-scale at 100 TB — forcing them into a
        # broadcast would blow the 8 GB limit/driver heap; AQE picks
        # broadcast automatically at small scales
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
        # string-emit AFTER the numeric sort (dec_str output sorts
        # lexicographically, which would reorder the top-k)
        .select("l_orderkey", dec_str(F.col("revenue"), 4).alias("revenue"), "orderdate")
    )


# ---------------------------------------------------------------------------
# Q5-style: 6-way star join with region filter
# ---------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    oracle="""
        SELECT
            n.n_name AS nation,
            CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                 AS DECIMAL(38,4)) AS VARCHAR) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    description="TPC-H Q5 adapted: star join, fixed-size dims broadcast, fact joins shuffle",
)
def q5_local_supplier_volume(spark, sf_dir):
    prep(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        # broadcast hints ONLY on the fixed-cardinality dims (nation=25,
        # region=5 rows at every scale factor); customer/orders/supplier
        # all scale with SF and must stay shuffle-joinable — AQE
        # broadcasts them at small scales on its own
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dec_str(
                F.sum(
                    F.col("l_extendedprice").cast(DEC)
                    * (F.lit(1) - F.col("l_discount")).cast(DEC)
                ),
                4,
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q6-style: tight scan-filter-aggregate (pushdown showcase)
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT
            CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,2)))
                 AS DECIMAL(38,4)) AS VARCHAR) AS revenue,
            count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    description="TPC-H Q6: pure pushed-down scan + single aggregate",
)
def q6_forecast_revenue(spark, sf_dir):
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dec_str(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * F.col("l_discount").cast(DEC)
            ),
            4,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_top_orders_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(38,2)) AS VARCHAR) AS totalprice,
               rk
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rk
            FROM orders
        )
        WHERE rk <= 2
    """,
    description="windowed top-n per group (row_number)",
)
def window_top_orders_per_customer(spark, sf_dir):
    from pyspark.sql.window import Window

    prep(spark)
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            dec_str(F.col("o_totalprice")).alias("totalprice"),
            "rk",
        )
    )


@register(
    "window_running_revenue",
    oracle="""
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) AS orderdate,
               o_orderkey,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DECIMAL(38,2)) AS VARCHAR) AS running_total
        FROM orders
        WHERE o_custkey < 100
    """,
    description="running-sum window over event-time order",
)
def window_running_revenue(spark, sf_dir):
    from pyspark.sql.window import Window

    prep(spark)
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
        "o_orderkey",
        dec_str(F.sum(F.col("o_totalprice").cast(DEC)).over(w)).alias(
            "running_total"
        ),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k
# ---------------------------------------------------------------------------


@register(
    "topk_expensive_parts",
    oracle="""
        SELECT p_partkey, p_name, p_brand,
               CAST(CAST(p_retailprice AS DECIMAL(38,2)) AS VARCHAR) AS retailprice
        FROM part
        ORDER BY p_retailprice DESC, p_partkey
        LIMIT 15
    """,
    description="global top-k (TakeOrderedAndProject, no full sort)",
)
def topk_expensive_parts(spark, sf_dir):
    prep(spark)
    p = load(spark, sf_dir, "part")
    return (
        p.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(15)
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            dec_str(F.col("p_retailprice")).alias("retailprice"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "setop_active_customers",
    oracle="""
        WITH y1996 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        ), y1997 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        )
        SELECT
            (SELECT count(*) FROM (SELECT * FROM y1996 INTERSECT SELECT * FROM y1997)) AS both_years,
            (SELECT count(*) FROM (SELECT * FROM y1996 EXCEPT SELECT * FROM y1997)) AS only_1996,
            (SELECT count(*) FROM (SELECT * FROM y1996 UNION SELECT * FROM y1997)) AS either_year
    """,
    description="intersect / except / union distinct",
)
def setop_active_customers(spark, sf_dir):
    prep(spark)
    o = load(spark, sf_dir, "orders")

    def year(y):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (
                    F.col("o_orderdate")
                    < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp")
                )
            )
            .select("o_custkey")
            .distinct()
        )

    y1996, y1997 = year(1996), year(1997)
    # ONE lazy plan instead of three driver-side .count() actions: the
    # three set-op branches share their scan+filter+distinct subtrees,
    # so a single plan lets ReuseExchange compute each year's distinct
    # set once, and the driver schedules one job, not three
    both = y1996.intersect(y1997).agg(
        F.count(F.lit(1)).alias("both_years")
    )
    only = (
        y1996.exceptAll(y1997)
        .distinct()
        .agg(F.count(F.lit(1)).alias("only_1996"))
    )
    either = (
        y1996.union(y1997)
        .distinct()
        .agg(F.count(F.lit(1)).alias("either_year"))
    )
    return both.crossJoin(only).crossJoin(either)


# ---------------------------------------------------------------------------
# Scalar string/date/math functions
# ---------------------------------------------------------------------------


@register(
    "scalar_function_battery",
    oracle="""
        SELECT
            p_brand,
            count(*) AS n,
            min(upper(p_type)) AS min_type_upper,
            max(length(p_name)) AS max_name_len,
            min(substr(p_name, 1, 5)) AS min_name_prefix,
            CAST(CAST(sum(CAST(floor(p_retailprice * 10.0 + 0.5) / 10.0
                              AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_rounded,
            CAST(sum(abs(p_size - 25)) AS BIGINT) AS sum_absdev,
            min(concat(p_brand, ':', CAST(p_size AS VARCHAR))) AS min_brand_size
        FROM part
        GROUP BY p_brand
    """,
    description="string/math scalar functions inside an aggregate",
)
def scalar_function_battery(spark, sf_dir):
    prep(spark)
    p = load(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.upper("p_type")).alias("min_type_upper"),
        F.max(F.length("p_name")).alias("max_name_len"),
        F.min(F.substring("p_name", 1, 5)).alias("min_name_prefix"),
        dec_str(F.sum(round_ieee(F.col("p_retailprice"), 1).cast(DEC))).alias(
            "sum_rounded"
        ),
        F.sum(F.abs(F.col("p_size") - 25)).cast("bigint").alias("sum_absdev"),
        F.min(
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string"))
        ).alias("min_brand_size"),
    )


# ---------------------------------------------------------------------------
# JSON extraction + time-window aggregation over the events table
# ---------------------------------------------------------------------------


@register(
    "events_json_extract",
    oracle="""
        SELECT
            event_type,
            count(*) AS n_events,
            CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                 AS BIGINT) AS sum_k,
            count(DISTINCT user_id) AS n_users,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
        FROM events
        GROUP BY event_type
    """,
    description="semi-structured JSON property extraction + aggregate",
)
def events_json_extract(spark, sf_dir):
    prep(spark)
    e = load_events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.get_json_object("props", "$.k").cast("int"))
        .cast("bigint")
        .alias("sum_k"),
        F.countDistinct("user_id").alias("n_users"),
        dec_str(F.sum(F.col("value").cast(DEC))).alias("sum_value"),
    )


@register(
    "events_hourly_rollup",
    oracle="""
        SELECT
            strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
            event_type,
            count(*) AS n,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2
    """,
    description="tumbling event-time window (batch form of the streaming rollup)",
)
def events_hourly_rollup(spark, sf_dir):
    prep(spark)
    e = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
            "hour_bucket"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dec_str(F.sum(F.col("value").cast(DEC))).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Anti/semi joins (exists / not exists)
# ---------------------------------------------------------------------------


@register(
    "join_semi_anti_customers",
    oracle="""
        SELECT
            (SELECT count(*) FROM customer c
             WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
            (SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders
    """,
    description="left-semi and left-anti joins",
)
def join_semi_anti_customers(spark, sf_dir):
    prep(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    # one lazy plan (not two .count() actions): both branches share the
    # scans, and the driver schedules a single job at collect time
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("with_orders")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("without_orders")
    )
    return semi.crossJoin(anti)


@register(
    "join_outer_order_fill",
    oracle="""
        SELECT
            n.n_name AS nation,
            count(o.o_orderkey) AS n_orders,
            count(*) AS n_rows
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority = '1-URGENT'
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    description="left outer join with filtered build side",
)
def join_outer_order_fill(spark, sf_dir):
    prep(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# As-of / range joins — custom operators Spark lacks natively, expressed as
# compositions of built-in ops (SURVEY §2.2 "custom operators" plan)
# ---------------------------------------------------------------------------


@register(
    "asof_join_last_event",
    oracle="""
        WITH clicks AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS value
            FROM events WHERE event_type = 'click' GROUP BY 1, 2
        ),
        purchases AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT strftime(p.ts, '%Y-%m-%d') AS day,
               count(*) AS n_purchases,
               count(c.ts) AS n_matched,
               CAST(sum(epoch_us(c.ts)) AS BIGINT) AS sum_matched_epoch,
               CAST(CAST(sum(CAST(c.value AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS sum_click_value
        FROM purchases p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND c.ts <= p.ts
        GROUP BY 1
    """,
    description="as-of join: latest click at-or-before each purchase, "
    "via the union+window composition (one shuffle on the key)",
)
def asof_join_last_event(spark, sf_dir):
    """As-of join without a quadratic or per-key-loop plan: union both
    sides, one window sorted by (ts, side) per key, ``last(..,
    ignorenulls)`` carries the most recent click value forward onto each
    purchase row. Exactly one shuffle (the window partition on user_id) —
    the strategy that survives 100 TB, unlike a range self-join.

    Clicks are first deduplicated to one row per (user_id, ts) so the
    at-or-before pick is deterministic under timestamp ties."""
    from pyspark.sql.window import Window

    prep(spark)
    ev = load_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select(
            "user_id",
            F.col("ts").alias("t"),
            "value",
            F.lit(1).alias("is_click"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_click"),
    )
    # clicks sort before purchases at equal t, so <= matches include ties
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ts and value travel TOGETHER in one struct: separate last()
    # carries would desynchronize when the matched click's value is
    # NULL (last(value, ignorenulls) would skip to an OLDER click
    # while click_ts takes the newest — a different click than the
    # one the oracle's ASOF match contributes)
    joined = (
        clicks.unionByName(purchases)
        .withColumn(
            "click_info",
            F.last(
                F.when(
                    F.col("is_click") == 1,
                    F.struct(
                        F.col("t").alias("ct"), F.col("value").alias("cv")
                    ),
                ),
                ignorenulls=True,
            ).over(w),
        )
        .withColumn("click_value", F.col("click_info.cv"))
        .withColumn("click_ts", F.col("click_info.ct"))
        .filter(F.col("is_click") == 0)
    )
    return joined.groupBy(
        F.date_format("t", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("click_ts").alias("n_matched"),
        F.sum(F.unix_micros("click_ts")).cast("bigint").alias(
            "sum_matched_epoch"
        ),
        dec_str(F.sum(F.col("click_value").cast(DEC))).alias(
            "sum_click_value"
        ),
    )


@register(
    "range_join_click_attribution",
    oracle="""
        WITH clicks AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT strftime(p.ts, '%Y-%m-%d') AS day,
               count(*) AS n_pairs,
               count(DISTINCT p.user_id) AS n_users,
               CAST(CAST(sum(CAST(c.value AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS sum_click_value
        FROM purchases p
        JOIN clicks c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 1 HOUR
         AND c.ts < p.ts
        GROUP BY 1
    """,
    description="range join: clicks within the hour before each purchase "
    "(equi-key + range predicate, stays a hash join)",
)
def range_join_click_attribution(spark, sf_dir):
    prep(spark)
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    joined = purchases.join(
        clicks,
        (clicks.user_id == purchases.p_user)
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
    )
    return joined.groupBy(
        F.date_format("p_ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("p_user").alias("n_users"),
        dec_str(F.sum(F.col("c_value").cast(DEC))).alias("sum_click_value"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup
# ---------------------------------------------------------------------------


@register(
    "rollup_revenue",
    oracle="""
        SELECT r.r_name AS region, n.n_name AS nation,
               count(*) AS n_customers,
               CAST(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS sum_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    description="ROLLUP grouping sets over region/nation hierarchy",
)
def rollup_revenue(spark, sf_dir):
    prep(spark)
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_str(F.sum(F.col("c_acctbal").cast(DEC))).alias("sum_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Additional TPC-H-style queries (q12/q14/q18 analogues on this schema)
# ---------------------------------------------------------------------------


@register(
    "q12_priority_shipping",
    oracle="""
        SELECT l.l_returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1
    """,
    description="TPC-H q12 analogue: conditional counts after an equi-join",
)
def q12_priority_shipping(spark, sf_dir):
    prep(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_discount_share",
    oracle="""
        SELECT floor(
            CAST(sum(CASE WHEN l_discount > 0.05
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,2))) AS DOUBLE)
            * 100.0 * 10000.0 + 0.5) / 10000.0 AS discounted_share_pct
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
    """,
    description="TPC-H q14 analogue: conditional-revenue share ratio",
)
def q14_discount_share(spark, sf_dir):
    prep(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    zero = F.lit(0).cast(DEC)
    agg = li.agg(
        F.sum(F.when(F.col("l_discount") > 0.05, rev).otherwise(zero)).alias("d"),
        F.sum(rev).alias("t"),
    )
    return agg.select(
        round_ieee(
            F.col("d").cast("double") / F.col("t").cast("double") * 100.0
        ).alias("discounted_share_pct")
    )


@register(
    "q18_large_volume_customers",
    oracle="""
        SELECT c.c_name, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(CAST(o.o_totalprice AS DECIMAL(38,2)) AS VARCHAR) AS totalprice,
               CAST(CAST(t.sum_qty AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty
        FROM (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
        ) t
        JOIN orders o ON o.o_orderkey = t.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    description="TPC-H q18 analogue: HAVING subquery + join + top-k",
)
def q18_large_volume_customers(spark, sf_dir):
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    t = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        t.join(o, o.o_orderkey == t.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            dec_str(F.col("o_totalprice")).alias("totalprice"),
            dec_str(F.col("sum_qty")).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-aware aggregation + spark.sql surface
# ---------------------------------------------------------------------------


@register(
    "skew_salted_heavy_hitters",
    oracle="""
        SELECT user_id, count(*) AS n_events,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
        FROM events
        GROUP BY user_id
        ORDER BY n_events DESC, user_id
        LIMIT 10
    """,
    description="salted two-phase aggregation: skewed keys pre-combined "
    "on (key, salt) before the final per-key exchange",
)
def skew_salted_heavy_hitters(spark, sf_dir):
    """Heavy-hitter counting with explicit salt: phase 1 aggregates on
    (user_id, salt16) so one hot user's rows split across 16 reducers;
    phase 2 combines the 16 partials per user. Same result as a direct
    groupBy, but the first exchange is skew-free by construction —
    the manual form of what AQE skew handling does for joins. The final
    top-k is a TakeOrdered, not a global sort."""
    e = load_events(spark, sf_dir)
    salted = e.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
    phase1 = salted.groupBy("user_id", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast(DEC)).alias("pv"),
    )
    phase2 = phase1.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"),
        dec_str(F.sum("pv")).alias("sum_value"),
    )
    return phase2.orderBy(F.desc("n_events"), F.asc("user_id")).limit(10)


@register(
    "sql_q1_via_views",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS sum_base_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    description="the SQL-text interface: spark.sql over registered views",
)
def sql_q1_via_views(spark, sf_dir):
    """Queries are also expressible as ANSI SQL text over the catalog's
    temp views — same Catalyst plan as the DataFrame form."""
    from ..sources.catalog import load_table

    prep(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS STRING) AS sum_base_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )


@register(
    "cube_order_stats",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    description="CUBE grouping sets (all 4 combinations)",
)
def cube_order_stats(spark, sf_dir):
    prep(spark)
    # cast pre-projected below the CUBE's Expand (see sales_cube_rollup)
    o = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast(DEC).alias("price_d"),
    )
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dec_str(F.sum("price_d")).alias("sum_price"),
    )


@register(
    "median_order_value",
    oracle="""
        WITH ranked AS (
            SELECT o_orderpriority,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey) AS rk,
                   count(*) OVER (PARTITION BY o_orderpriority) AS cnt
            FROM orders
        )
        SELECT o_orderpriority,
               min(cnt) AS n_orders,
               CAST(CAST(min(price) AS DECIMAL(38,2)) AS VARCHAR) AS median_price
        FROM ranked
        WHERE rk = (cnt + 1) // 2
        GROUP BY o_orderpriority
    """,
    description="exact distributed median via rank selection (no "
    "interpolation-semantics drift between engines)",
)
def median_order_value(spark, sf_dir):
    """Exact median without relying on percentile interpolation semantics
    (which differ subtly across engines): rank within each group and pick
    the lower-middle element deterministically. One shuffle (the window
    partition); at scale the rank selection is the textbook distributed
    exact-quantile when approx_percentile's error bound isn't acceptable."""
    from pyspark.sql.window import Window

    prep(spark)
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        F.col("o_totalprice").cast(DEC).alias("price"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return (
        ranked.filter(F.col("rk") == ((F.col("cnt") + 1) / 2).cast("long"))
        .groupBy("o_orderpriority")
        .agg(
            F.min("cnt").alias("n_orders"),
            dec_str(F.min("price")).alias("median_price"),
        )
    )


@register(
    "timeseries_multi_rollup",
    oracle="""
        SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
               CASE WHEN GROUPING(hr) = 1 THEN NULL
                    ELSE strftime(hr, '%Y-%m-%d %H:00') END AS hour,
               event_type,
               count(*) AS n,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
        FROM (
            SELECT ts, event_type, value,
                   date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr
            FROM events
        )
        GROUP BY GROUPING SETS (
            (strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d'), event_type),
            (strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d'), hr, event_type)
        )
    """,
    description="hypertable-style multi-resolution rollup: day + hour "
    "aggregates in one pass via GROUPING SETS",
)
def timeseries_multi_rollup(spark, sf_dir):
    """Continuous-aggregate shape: one scan produces both the hourly and
    daily materializations (grouping sets expand map-side, so the fact
    rows are read once). At scale this is the pattern for maintaining
    multiple rollup resolutions without N passes."""
    prep(spark)
    e = load_events(spark, sf_dir).select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_trunc("hour", "ts").alias("hr"),
        "event_type",
        # cast pre-projected below the grouping-sets Expand (see
        # sales_cube_rollup): once per source row, not per expanded row
        F.col("value").cast(DEC).alias("value_d"),
    )
    grouped = e.groupingSets(
        [["day", "event_type"], ["day", "hr", "event_type"]],
        "day",
        "hr",
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dec_str(F.sum("value_d")).alias("sum_value"),
        # grouping() must be computed inside the aggregate
        F.grouping("hr").alias("g_hr"),
    )
    return grouped.select(
        "day",
        F.when(
            F.col("g_hr") == 1, F.lit(None).cast("string")
        ).otherwise(F.date_format("hr", "yyyy-MM-dd HH:00")).alias("hour"),
        "event_type",
        "n",
        "sum_value",
    )


@register(
    "window_function_battery",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(38,2)) AS VARCHAR) AS price,
               rank() OVER w AS rk,
               dense_rank() OVER w AS drk,
               ntile(4) OVER w AS quartile,
               CAST(CAST(lag(o_totalprice, 1) OVER w AS DECIMAL(38,2)) AS VARCHAR) AS prev_price,
               CAST(CAST(lead(o_totalprice, 1) OVER w AS DECIMAL(38,2)) AS VARCHAR) AS next_price,
               CAST(CAST(first_value(o_totalprice) OVER w AS DECIMAL(38,2)) AS VARCHAR) AS first_price
        FROM orders
        WHERE o_custkey < 20
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
    """,
    description="window battery: rank/dense_rank/ntile/lag/lead/first_value",
)
def window_function_battery(spark, sf_dir):
    from pyspark.sql.window import Window

    prep(spark)
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        dec_str(F.col("o_totalprice")).alias("price"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        dec_str(F.lag("o_totalprice", 1).over(w)).alias("prev_price"),
        dec_str(F.lead("o_totalprice", 1).over(w)).alias("next_price"),
        dec_str(F.first("o_totalprice").over(w)).alias("first_price"),
    )


@register(
    "string_function_battery",
    oracle="""
        SELECT p_brand,
               count(*) AS n,
               min(reverse(p_name)) AS min_rev,
               max(lpad(CAST(p_size AS VARCHAR), 4, '0')) AS max_padded,
               min(replace(p_type, ' ', '_')) AS min_replaced,
               CAST(sum(levenshtein(p_brand, substr(p_name, 1, 8)))
                    AS BIGINT) AS sum_lev,
               min(split_part(p_type, ' ', 1)) AS min_first_word,
               max(repeat(substr(p_brand, 1, 2), 2)) AS max_rep
        FROM part
        GROUP BY p_brand
    """,
    description="string battery: reverse/lpad/replace/levenshtein/"
    "split_part/repeat",
)
def string_function_battery(spark, sf_dir):
    prep(spark)
    p = load(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.reverse("p_name")).alias("min_rev"),
        F.max(F.lpad(F.col("p_size").cast("string"), 4, "0")).alias("max_padded"),
        F.min(F.replace(F.col("p_type"), F.lit(" "), F.lit("_"))).alias("min_replaced"),
        F.sum(F.levenshtein(F.col("p_brand"), F.substring("p_name", 1, 8)))
        .cast("bigint")
        .alias("sum_lev"),
        F.min(F.split_part(F.col("p_type"), F.lit(" "), F.lit(1))).alias("min_first_word"),
        F.max(F.repeat(F.substring("p_brand", 1, 2), 2)).alias("max_rep"),
    )


@register(
    "map_function_battery",
    oracle="""
        SELECT event_type,
               key,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.' || key) AS BIGINT))
                    AS BIGINT) AS sum_val,
               min(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS min_val,
               max(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS max_val
        FROM (
            SELECT event_type, props, unnest(json_keys(props)) AS key
            FROM events
        )
        GROUP BY event_type, key
    """,
    description="map functions: from_json to MAP, explode entries, "
    "aggregate per (group, key)",
)
def map_function_battery(spark, sf_dir):
    prep(spark)
    e = load_events(spark, sf_dir)
    m = F.from_json("props", "map<string,string>")
    exploded = e.select(
        "event_type", F.explode(m).alias("key", "val")
    )
    return exploded.groupBy("event_type", "key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val").cast("bigint")).cast("bigint").alias("sum_val"),
        F.min(F.col("val").cast("bigint")).alias("min_val"),
        F.max(F.col("val").cast("bigint")).alias("max_val"),
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
        SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(38,4)) AS VARCHAR) AS revenue,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 35)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 25 AND 50
               AND l.l_quantity BETWEEN 25 AND 50)
    """,
    description="TPC-H q19 analogue: OR-of-ANDs disjunctive predicate "
    "across a join (Catalyst extracts the common subexpressions)",
)
def q19_disjunctive_revenue(spark, sf_dir):
    """The disjunctive-predicate shape q19 exists to test: three
    brand/size/quantity conjuncts OR'd across a lineitem ⋈ part join.
    Catalyst factors the disjunction into join-side prefilters — each
    side's scan keeps only rows satisfying SOME arm's single-side
    conjuncts (``p_brand IN (...)``, quantity range union) BEFORE the
    join, so the join input shrinks even though no single arm is
    separable. part is dimension-sized: broadcast."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    kept = joined.filter(
        arm("Brand#1", 1, 15, 1, 20)
        | arm("Brand#2", 10, 30, 10, 35)
        | arm("Brand#3", 25, 50, 25, 50)
    )
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(DEC)
    return kept.agg(
        dec_str(F.sum(rev), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q17_BRAND = "Brand#4"


@register(
    "q17_small_quantity_revenue",
    # the TPC-H q17 threshold (l_quantity < 0.2 * avg per part) restated
    # EXACTLY: with whole-number quantities, qty < sum/(5*n) <=>
    # 5*qty*n < sum in pure integer arithmetic — no float-order hazard
    # in the correlated aggregate
    oracle=f"""
        SELECT count(*) AS n_items,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = '{Q17_BRAND}'
          AND 5 * CAST(l_quantity AS BIGINT)
              * (SELECT count(*) FROM lineitem l2
                 WHERE l2.l_partkey = part.p_partkey)
              < (SELECT CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
                 FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
    description="TPC-H q17 analogue: correlated scalar subquery over a "
    "per-part aggregate, decorrelated by Catalyst into an aggregate join "
    "(threshold restated in exact integers)",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """The CORRELATED-SCALAR-SUBQUERY shape (TPC-H q17: revenue from
    small-quantity orders of one brand, 'small' meaning below 20% of
    that part's average order quantity). Written as SQL text so
    Catalyst's decorrelation pipeline runs end-to-end: the two
    correlated aggregates over the same group are MERGED
    (MergeScalarSubqueries) and rewritten into a single per-partkey
    aggregate joined back — never a per-outer-row re-execution
    (pinned in ``tests/test_plan_shapes.py``). The 0.2*avg threshold
    is restated in exact integer arithmetic (see oracle comment), so
    the filter decides identically in Spark and DuckDB.

    100 TB shape: the per-partkey aggregate is one map-side-combined
    groupBy over (partkey, qty); the brand filter prunes the part side
    before its broadcast join; the decorrelated aggregate joins on
    partkey — the same shuffle key as the main join, so AQE can reuse
    the exchange."""
    from ..sources.catalog import load_table

    prep(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        f"""
        SELECT count(*) AS n_items,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS STRING) AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = '{Q17_BRAND}'
          AND 5 * CAST(l_quantity AS BIGINT)
              * (SELECT count(*) FROM lineitem l2
                 WHERE l2.l_partkey = part.p_partkey)
              < (SELECT CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
                 FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
        """
    )


# ---------------------------------------------------------------------------
# Behavioral analytics: funnel conversion + cohort retention
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    oracle="""
        WITH e AS (
            SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
            FROM events
        ),
        v AS (
            SELECT user_id, min(ts) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t1
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t2
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM v) AS n_viewed,
               (SELECT count(*) FROM c) AS n_clicked_after,
               (SELECT count(*) FROM p) AS n_purchased_after,
               CAST((SELECT count(*) FROM c) * 10000
                    // (SELECT count(*) FROM v) AS BIGINT)
                   AS click_rate_e4,
               CAST((SELECT count(*) FROM p) * 10000
                    // greatest((SELECT count(*) FROM c), 1) AS BIGINT)
                   AS purchase_rate_e4
    """,
    description="ORDERED funnel: users who viewed, then clicked strictly "
    "after their first view, then purchased strictly after that click — "
    "sequential min-timestamp chaining, integer-exact rates",
)
def funnel_conversion(spark, sf_dir):
    """The ORDERED-FUNNEL shape — product analytics' bread and butter,
    and not a plain count-per-type: each step requires an event
    STRICTLY AFTER the user's previous step's first occurrence, so the
    steps chain through per-user min-timestamp aggregates (aggregate ->
    join -> filtered aggregate, twice). Conversion rates are integer
    basis points (``n2 * 10000 div n1``) — no float division.

    100 TB shape: three user_id-keyed aggregates over pushed-down
    event_type filters, all on the SAME shuffle key so AQE reuses the
    exchange; each stage's output is one row per qualifying user."""
    from ..plans.registry import load_events

    prep(spark)
    e = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )
    return counts.select(
        "n_viewed",
        "n_clicked_after",
        "n_purchased_after",
        # nullif: a zero-view slice must yield NULL like the oracle's
        # DuckDB `// 0`, not an ANSI DIVIDE_BY_ZERO crash
        F.expr("n_clicked_after * 10000 div nullif(n_viewed, 0L)")
        .cast("bigint")
        .alias("click_rate_e4"),
        F.expr(
            "n_purchased_after * 10000 div greatest(n_clicked_after, 1L)"
        )
        .cast("bigint")
        .alias("purchase_rate_e4"),
    )


@register(
    "retention_cohorts",
    oracle="""
        WITH e AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        ),
        first_seen AS (
            SELECT user_id, date_trunc('week', min(ts)) AS cohort
            FROM e GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM e
        )
        SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
               CAST((epoch_us(a.w) - epoch_us(f.cohort))
                    // (CAST(7 AS BIGINT) * 86400 * 1000000) AS BIGINT)
                   AS week_offset,
               CAST(count(*) AS BIGINT) AS active_users
        FROM first_seen f
        JOIN activity a ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    description="cohort retention: users grouped by first-activity week, "
    "active-user counts per subsequent week offset (Monday-truncated "
    "weeks, integer epoch arithmetic)",
)
def retention_cohorts(spark, sf_dir):
    """The COHORT-RETENTION matrix — the second canonical behavioral
    query: users keyed by their first-activity week, then counted in
    every week they return. Both engines truncate weeks to Monday
    (``date_trunc('week')``), and the week offset is exact integer
    epoch-microsecond arithmetic — no interval/timezone drift can
    split a cohort.

    100 TB shape: one user_id aggregate (first week), one distinct on
    (user, week) — both map-side combinable — then an equi-join back
    on user_id (same key, exchange reused) into a tiny cohort x offset
    aggregate."""
    from ..plans.registry import load_events

    prep(spark)
    e = load_events(spark, sf_dir).select("user_id", "ts")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    wk_us = 7 * 86400 * 1000000
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            # integer `div`, matching the oracle's `//` exactly — float
            # division + bigint cast truncates toward zero, which only
            # coincides with floor while the operands stay exact 7-day
            # multiples (ADVICE r7: fragile under a DST-bearing tz)
            F.expr(
                f"(unix_micros(w) - unix_micros(cohort)) div {wk_us}"
            ).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# Time-RANGE rolling window: the value-based frame the battery lacks
# ---------------------------------------------------------------------------


@register(
    "window_time_range_rolling",
    oracle="""
        WITH daily AS (
            SELECT user_id,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP))
                        // 86400000000 AS BIGINT) AS day,
                   CAST(sum(CAST(value AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS day_cents
            FROM events
            GROUP BY 1, 2
        )
        SELECT user_id, day, day_cents,
               CAST(sum(day_cents) OVER w AS BIGINT) AS roll_cents,
               CAST(count(*) OVER w AS BIGINT) AS roll_days
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY day
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    description="rolling 7-day revenue via a RANGE (value-based) window "
    "frame over integer day numbers — gap-aware, unlike a ROWS frame",
)
def window_time_range_rolling(spark, sf_dir):
    """Rolling 7-day revenue per user — the VALUE-BASED window frame
    (``rangeBetween``) the ROWS-based battery cannot express: with
    activity gaps, ``ROWS 6 PRECEDING`` reaches back seven *active*
    days however far apart they are, while ``RANGE 6 PRECEDING`` spans
    seven *calendar* days exactly, holes included — the semantics every
    trailing-revenue metric actually wants.  Ordering key is the
    integer day number (epoch-days), so the frame bound is exact
    arithmetic on BIGINTs — no interval or timezone semantics to
    diverge between engines; money is exact int64 cents from a
    DECIMAL(18,2) cast before the cents scale-up.

    100 TB shape: the daily pre-aggregate shuffles once on
    (user_id, day) — map-side combinable, output bounded by
    users x active days — and the window reuses the user_id
    co-location (key-subset clustering); per-task window state is one
    user's day series."""
    from pyspark.sql.window import Window

    from ..plans.registry import load_events

    prep(spark)
    e = load_events(spark, sf_dir)
    daily = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            (F.col("value").cast(DEC) * 100).cast("long").alias("cents"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("cents").cast("bigint").alias("day_cents"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        "day_cents",
        F.sum("day_cents").over(w).cast("bigint").alias("roll_cents"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("roll_days"),
    )


@register(
    "events_variant_extract",
    # the k_schema column pins Spark's VARIANT schema inference against
    # the corpus's known structure (every props row is {"k": <int>}, so
    # schema_of_variant is the constant below); the numeric aggregates
    # are recomputed from JSON first principles
    oracle="""
        SELECT
            event_type,
            count(*) AS n_events,
            CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 AS BIGINT) AS sum_k,
            CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 AS BIGINT) AS min_k,
            CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 AS BIGINT) AS max_k,
            'OBJECT<k: BIGINT>' AS k_schema
        FROM events
        GROUP BY event_type
    """,
    description="Spark-4 VARIANT ingestion: parse_json once into a "
    "binary variant column, typed variant_get extraction, "
    "schema_of_variant pinned by the oracle",
)
def events_variant_extract(spark, sf_dir):
    """The modern semi-structured path — Spark 4's VARIANT type —
    next to ``events_json_extract``'s classic ``get_json_object``:
    ``parse_json`` converts each props string ONCE into the binary
    variant encoding, after which every ``variant_get`` is a typed
    tree walk instead of a re-parse (at 100 TB, parse-once is the
    whole game for multi-field extraction: N fields cost one parse,
    not N).  ``schema_of_variant`` rides along and the oracle pins
    its inferred shape against the corpus's known structure, so a
    regression in variant inference — not just extraction — fails
    the gate."""
    prep(spark)
    e = load_events(spark, sf_dir).select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
        F.min(F.schema_of_variant("v")).alias("k_schema"),
    )


@register(
    "timeseries_gap_fill",
    oracle="""
        WITH daily AS (
            SELECT user_id,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP))
                        // 86400000000 AS BIGINT) AS day,
                   CAST(sum(CAST(value AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS day_cents
            FROM events
            GROUP BY 1, 2
        ),
        spans AS (
            SELECT user_id, min(day) AS d0, max(day) AS d1
            FROM daily GROUP BY user_id
        ),
        grid AS (
            SELECT s.user_id, CAST(g.day AS BIGINT) AS day
            FROM spans s, LATERAL (
                SELECT unnest(range(s.d0, s.d1 + 1)) AS day
            ) g
        )
        SELECT g.user_id, g.day,
               d.day_cents,
               d.day_cents IS NULL AS filled,
               CAST(last_value(d.day_cents IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day) AS BIGINT)
                   AS ffill_cents
        FROM grid g LEFT JOIN daily d
          ON d.user_id = g.user_id AND d.day = g.day
    """,
    description="time-series gap fill: densify each user's daily series "
    "over its own span and forward-fill revenue (IGNORE NULLS "
    "last_value) — the repair step before any rolling metric",
)
def timeseries_gap_fill(spark, sf_dir):
    """Series densification + forward fill — the repair every
    time-series metric assumes has already happened: each user's daily
    revenue becomes a DENSE series over that user's own [first, last]
    active span (``sequence`` on integer epoch-days exploded per
    user — no calendar table, no cross join against a global date
    range), missing days join as nulls, and ``last_value(...,
    ignoreNulls=True)`` carries the previous observation forward.
    ``filled`` marks synthesized rows so downstream consumers can
    distinguish observation from imputation.

    100 TB shape: the grid explosion is proportional to the OUTPUT
    (sum of per-user span lengths — no users x global-calendar blowup);
    the daily aggregate, the span aggregate, the grid join and the
    fill window all hash on user_id, so the whole repair is one
    exchange family.  Integer epoch-days and int64 cents end to end."""
    from pyspark.sql.window import Window

    from ..plans.registry import load_events

    prep(spark)
    e = load_events(spark, sf_dir)
    daily = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            (F.col("value").cast(DEC) * 100).cast("long").alias("cents"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("cents").cast("bigint").alias("day_cents"))
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day")
    return joined.select(
        "user_id",
        "day",
        "day_cents",
        F.col("day_cents").isNull().alias("filled"),
        F.last("day_cents", ignorenulls=True)
        .over(w)
        .cast("bigint")
        .alias("ffill_cents"),
    )


# ---------------------------------------------------------------------------
# CUBE / grouping-sets rollup (staged for r11/r12 registration)
# ---------------------------------------------------------------------------

#: r11/r12 registration oracle — DuckDB GROUP BY CUBE with GROUPING()
#: (the bitmask convention matches Spark's grouping_id(): first cube
#: column = most significant bit, verified empirically on both).
CUBE_ROLLUP_ORACLE = """
        SELECT coalesce(l_returnflag, '(all)') AS returnflag,
               coalesce(l_linestatus, '(all)') AS linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
                   AS gid,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18, 2)))
                    AS DECIMAL(38, 2)) AS VARCHAR) AS sum_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2)))
                    AS DECIMAL(38, 2)) AS VARCHAR) AS sum_price
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY gid, returnflag, linestatus
"""


@register("sales_cube_rollup", oracle=CUBE_ROLLUP_ORACLE)
def sales_cube_rollup(spark, sf_dir):
    """Multi-level rollup via CUBE — the OLAP super-aggregate shape
    the TPC-H block doesn't cover: every (returnflag, linestatus)
    combination PLUS both one-dimension margins PLUS the grand total
    in one pass, each level tagged by ``grouping_id()``.  NULL
    grouping dimensions are coalesced to '(all)' so the gate never
    compares raw NULL sort orders; sums go through DECIMAL(18,2)
    like every monetary aggregate in the registry.

    100 TB shape: Spark plans CUBE as one Expand (4 rows per input
    row for 2 dims) feeding a single partial-aggregating hash
    aggregate — ONE shuffle total, identical to a plain groupBy, and
    the expansion factor is 2^dims, a constant.  The alternative
    (four separate aggregates unioned) would scan the fact table
    four times; CUBE is why it scans once.
    """
    prep(spark)
    # r15: the double->decimal(18,2) casts are PRE-PROJECTED below the
    # CUBE so they run once per source row; left inside the aggregate
    # they execute per EXPANDED row (2^dims copies — measured 2.3 s vs
    # 1.1 s at sf0.1, and the same 4x cast blow-up at any scale).  Sums
    # over identical decimal values — bit-identical results.
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty_d"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price_d"),
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("qty_d").alias("sum_qty_d"),
            F.sum("price_d").alias("sum_price_d"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("(all)")).alias(
                "returnflag"
            ),
            F.coalesce(F.col("l_linestatus"), F.lit("(all)")).alias(
                "linestatus"
            ),
            "gid",
            "n_rows",
            dec_str(F.col("sum_qty_d")).alias("sum_qty"),
            dec_str(F.col("sum_price_d")).alias("sum_price"),
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# Conversion-funnel analysis (staged r10)
# ---------------------------------------------------------------------------

#: ordered funnel steps over the events table
FUNNEL_STEPS = ("view", "click", "purchase")
#: chain window: every chain event must land within this many hours of
#: the chain's FIRST event (ClickHouse windowFunnel semantics)
FUNNEL_WINDOW_HOURS = 12
_FUNNEL_W_US = FUNNEL_WINDOW_HOURS * 3600 * 1_000_000

#: the oracle states the funnel level as pure first-order logic —
#: level k iff SOME strictly-time-increasing chain of the first k
#: steps fits inside the window anchored at its first event — so the
#: Spark side's vectorized prefix-max scan must agree chain-for-chain;
#: strict '<' comparisons make equal timestamps unable to chain, the
#: same in both engines (no tie-break freedom anywhere).
EVENTS_FUNNEL_ORACLE = f"""
        WITH e AS (
            SELECT user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ),
        u AS (SELECT DISTINCT user_id FROM e),
        v AS (SELECT user_id, us FROM e WHERE event_type = 'view'),
        c AS (SELECT user_id, us FROM e WHERE event_type = 'click'),
        p AS (SELECT user_id, us FROM e WHERE event_type = 'purchase'),
        l1 AS (SELECT DISTINCT user_id FROM v),
        -- equality-only join keys with the chain inequalities in
        -- WHERE: semantically identical to putting them in ON, but
        -- DuckDB's planner then picks the per-user hash join instead
        -- of a quadratic inequality-join strategy (measured 108 s ->
        -- 0.04 s at sf0.1 for the level-3 chain)
        vc AS (
            SELECT v.user_id, v.us AS vus, c.us AS cus
            FROM v JOIN c ON c.user_id = v.user_id
            WHERE v.us < c.us AND c.us <= v.us + {_FUNNEL_W_US}
        ),
        l2 AS (SELECT DISTINCT user_id FROM vc),
        l3 AS (
            SELECT DISTINCT vc.user_id
            FROM vc JOIN p ON p.user_id = vc.user_id
            WHERE vc.cus < p.us AND p.us <= vc.vus + {_FUNNEL_W_US}
        )
        SELECT user_id,
               CAST(CASE
                 WHEN user_id IN (SELECT user_id FROM l3) THEN 3
                 WHEN user_id IN (SELECT user_id FROM l2) THEN 2
                 WHEN user_id IN (SELECT user_id FROM l1) THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_level
        FROM u ORDER BY user_id
"""


@register("events_funnel_levels", oracle=EVENTS_FUNNEL_ORACLE)
def events_funnel_levels(spark, sf_dir):
    """Conversion-funnel depth per user — the ClickHouse
    ``windowFunnel`` shape: the deepest prefix of the step sequence
    (view -> click -> purchase) for which SOME strictly
    time-increasing chain fits within {FUNNEL_WINDOW_HOURS} h of the
    chain's first event.  The oracle states the semantics as pure
    EXISTS logic (triple self-join); the engine computes the same
    answer in O(n log n) per user with a vectorized two-pass
    prefix-max scan: for every click, the latest view strictly before
    it; for every purchase, the best such view over clicks strictly
    before it — a chain exists iff that view is inside the window.
    Strict '<' everywhere means equal timestamps cannot chain, so
    there is NO tie-break freedom for either engine.

    100 TB shape: ONE exchange (repartition by user into a
    partition-wide mapInPandas) and ALL-USERS-AT-ONCE vectorized
    work: the latest-view-before-each-click and
    best-anchor-before-each-purchase lookups are pandas
    ``merge_asof`` (C-level, ``by=user_id``,
    ``allow_exact_matches=False`` for the strict '<'), the running
    best anchor is a groupby ``cummax`` — no per-user Python calls
    at all.  The r11 rewrite replaced one-pandas-group-per-USER
    applyInPandas (the 15 ms/group trap SCALE.md documents) with
    this shape: sf0.1 wall 7.3 s -> well under 1 s, identical
    results.  Skewed users cost O(n_u log n_u) inside the sorts;
    the per-task memory is one events partition (the same cost
    model as every shard stage — size the exchange width to the
    cluster).  The oracle's triple join is the SPEC, not the plan."""
    import pandas as pd

    from pyspark.sql import types as T

    prep(spark)
    # all events load (not just funnel steps): every user must appear
    # in the output, level 0 when they never reached the first step
    e = (
        load_events(spark, sf_dir)
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
        )
        .repartition(
            spark.sparkContext.defaultParallelism, "user_id"
        )
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("funnel_level", T.LongType()),
        ]
    )

    w_us = _FUNNEL_W_US

    def _funnel(batches):
        # one frame per PARTITION: a user's rows can straddle Arrow
        # batches within the partition, and the asof logic needs all
        # of them together (partition-sized memory, as documented)
        parts = list(batches)
        if not parts:  # empty partition: no batches at all
            return
        pdf = pd.concat(parts, ignore_index=True)
        if pdf.empty:
            return
        sub = {
            t: pdf.loc[pdf["event_type"] == t, ["user_id", "us"]]
            .sort_values("us", kind="mergesort")
            .reset_index(drop=True)
            for t in ("view", "click", "purchase")
        }
        views, clicks, purch = sub["view"], sub["click"], sub["purchase"]
        out = (
            pdf[["user_id"]]
            .drop_duplicates()
            .reset_index(drop=True)
        )
        lvl1 = set(views["user_id"].unique())
        lvl2: set = set()
        lvl3: set = set()
        if len(views) and len(clicks):
            # av: the latest view STRICTLY before each click (per
            # user); if the latest misses the window no earlier view
            # can hit it, so one asof row decides level 2
            ac = pd.merge_asof(
                clicks,
                views.rename(columns={"us": "view_us"}),
                left_on="us",
                right_on="view_us",
                by="user_id",
                direction="backward",
                allow_exact_matches=False,
            )
            ok2 = ac["us"] - ac["view_us"] <= w_us
            lvl2 = set(ac.loc[ok2, "user_id"].unique())
            if len(purch) and lvl2:
                # best (latest) anchor view over clicks strictly
                # before each purchase: running cummax per user in
                # click-time order, then one more strict asof
                ac["run"] = ac.groupby("user_id")["view_us"].cummax()
                ap = pd.merge_asof(
                    purch,
                    ac[["user_id", "us", "run"]].rename(
                        columns={"us": "click_us"}
                    ),
                    left_on="us",
                    right_on="click_us",
                    by="user_id",
                    direction="backward",
                    allow_exact_matches=False,
                )
                # p - view <= W implies click - view <= W (click < p),
                # so ok3 needs no level-2 gate per user
                ok3 = ap["us"] - ap["run"] <= w_us
                lvl3 = set(ap.loc[ok3, "user_id"].unique())
        uid = out["user_id"]
        out["funnel_level"] = (
            uid.isin(lvl1).astype("int64")
            + uid.isin(lvl2).astype("int64")
            + uid.isin(lvl3).astype("int64")
        )
        yield out

    return e.mapInPandas(_funnel, schema).orderBy("user_id")


#: one week in microseconds — the cohort bucket
_WEEK_US = 7 * 86400 * 1_000_000

#: cohort retention restated as plain arithmetic: week index =
#: floor(event epoch-us / week), cohort = the user's first week,
#: offset = active week - cohort, cell = distinct users.  The engine
#: computes FLOOR division in exact int64 ((a - pmod(a, b)) div b),
#: matching DuckDB's ``//`` for negative epochs too — pre-1970
#: timestamps in a fixture would diverge under truncating ``div``
#: (ADVICE r10).
EVENTS_RETENTION_ORACLE = f"""
        WITH w AS (
            SELECT DISTINCT user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) // {_WEEK_US} AS wk
            FROM events
        ),
        c AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id)
        SELECT CAST(c.cw AS BIGINT) AS cohort_week,
               CAST(w.wk - c.cw AS BIGINT) AS week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM w JOIN c ON c.user_id = w.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("events_retention_cohorts", oracle=EVENTS_RETENTION_ORACLE)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix — the product-analytics staple: users
    cohorted by their FIRST active week, each cell counting how many
    of a cohort were active again `offset` weeks later.

    100 TB shape: ONE user-keyed exchange computes each user's
    distinct active-week set via a map-side-combining
    ``collect_set`` (bounded by the corpus duration in weeks, not by
    event count); the cohort week is ``array_min`` of that set
    row-locally — no join back, no second pass over events — and one
    final small exchange aggregates the (cohort, offset) matrix,
    whose cardinality is weeks², independent of corpus size.  The
    oracle restates the matrix with a join because SQL lacks the
    array fold; the engine never joins."""
    prep(spark)
    e = load_events(spark, sf_dir).select(
        "user_id",
        # floor division in exact int64 (pmod is non-negative), so
        # negative epochs agree with the oracle's `//` too
        F.expr(
            f"(unix_micros(ts) - pmod(unix_micros(ts), {_WEEK_US}))"
            f" div {_WEEK_US}"
        ).alias("wk"),
    )
    per_user = e.groupBy("user_id").agg(
        F.collect_set("wk").alias("wks")
    )
    cells = per_user.select(
        F.array_min("wks").alias("cohort_week"),
        F.explode("wks").alias("wk"),
    ).select(
        "cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset")
    )
    return (
        cells.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.col("cohort_week").cast("bigint").alias("cohort_week"),
            F.col("week_offset").cast("bigint").alias("week_offset"),
            "n_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


#: anomaly threshold: |z| > ANOM_SIGMA standard deviations
ANOM_SIGMA = 3
_HOUR_US = 3600 * 1_000_000

#: the z-score test stated WITHOUT floats: |c - mean| > k*sigma over a
#: type's hourly counts is equivalent (multiplying through by n^2) to
#:   (n*c - S)^2 > k^2 * (n*Q - S^2),   S = sum(c), Q = sum(c^2)
#: — every term an exact integer, so the flag has no float-summation
#: order hazard in either engine.  DuckDB's BIGINT sums widen to
#: HUGEINT internally; outputs cast back to BIGINT.  (At 100 TB,
#: hourly counts can push c^2 sums past int64 — widen the Spark side
#: to DECIMAL(38,0) there; the gate corpus stays far inside int64.)
EVENTS_ANOMALY_ORACLE = f"""
        WITH c AS (
            SELECT event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US} AS h,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT event_type, count(*) AS n, sum(cnt) AS sm,
                   sum(cnt * cnt) AS q, max(cnt) AS mx
            FROM c GROUP BY 1
        )
        SELECT c.event_type,
               CAST(s.n AS BIGINT) AS n_hours,
               CAST(sum(CASE WHEN (s.n * c.cnt - s.sm)
                                  * (s.n * c.cnt - s.sm)
                                  > {ANOM_SIGMA * ANOM_SIGMA}
                                    * (s.n * s.q - s.sm * s.sm)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
               CAST(s.mx AS BIGINT) AS max_count
        FROM c JOIN s ON s.event_type = c.event_type
        GROUP BY 1, s.n, s.mx ORDER BY 1
"""


@register("events_hourly_anomalies", oracle=EVENTS_ANOMALY_ORACLE)
def events_hourly_anomalies(spark, sf_dir):
    """Hourly volume anomaly detection per event type — the ops-
    monitoring staple (traffic spikes, incident bursts), made ORACLE-
    EXACT by clearing the z-score test of floats entirely: an hour is
    anomalous iff |count - mean| > {ANOM_SIGMA} sigma, which multiplied
    through by n^2 is (n*c - S)^2 > {ANOM_SIGMA}^2 (n*Q - S^2) with S,
    Q the per-type count sums — pure integer comparisons, no float
    summation order anywhere (contrast textbook z-scores, whose
    stddev is order-sensitive in both engines).

    100 TB shape: ONE real exchange builds the (type, hour) counts
    with map-side combine; everything downstream operates on that
    types x hours table (tiny at any corpus size) — the per-type
    moments BROADCAST back onto it, so no second pass over events and
    no shuffle of anything corpus-sized."""
    prep(spark)
    e = load_events(spark, sf_dir).select(
        "event_type",
        # floor division in exact int64, agreeing with `//` on
        # negative epochs (ADVICE r10 — same form as the cohort week)
        F.expr(
            f"(unix_micros(ts) - pmod(unix_micros(ts), {_HOUR_US}))"
            f" div {_HOUR_US}"
        ).alias("h"),
    )
    c = e.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sm"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("q"),
        F.max("cnt").alias("mx"),
    )
    k2 = ANOM_SIGMA * ANOM_SIGMA
    dev = F.col("n") * F.col("cnt") - F.col("sm")
    joined = c.join(F.broadcast(s), "event_type")
    return (
        joined.groupBy("event_type")
        .agg(
            F.first("n").cast("bigint").alias("n_hours"),
            F.sum(
                F.when(
                    dev * dev
                    > F.lit(k2)
                    * (F.col("n") * F.col("q") - F.col("sm") * F.col("sm")),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_anomalous"),
            F.first("mx").cast("bigint").alias("max_count"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Gorilla time-series compression (delta-of-delta + XOR doubles)
# ---------------------------------------------------------------------------

#: Gorilla's own BLOCK size: the VLDB 2015 paper (§4.1) compresses
#: streams in 2-hour blocks, each opening with an aligned header
#: timestamp — precisely so a series never has to be materialized
#: whole.  The block key is what makes the operator scale: parallelism
#: is #(series x blocks), not #series.
GORILLA_BLOCK_US = 7_200_000_000

#: per-(type, 2h-block) timestamp streams through the from-scratch
#: Gorilla codec (`core/gorillacodec.py`): the oracle recounts the
#: per-point prefix-class histogram and the exact per-block stream bit
#: total with window functions partitioned the same way — the class is
#: a pure function of the delta-of-delta, so one misclassified range,
#: dropped point, drifted ladder boundary, or mis-assigned block
#: breaks the hash.  Order inside a block is pinned to (us, event_id):
#: both engines sort the same total order, so dods are identical.
#: `us // N` floor-divides; event timestamps are epoch-2024 micros so
#: the operands are non-negative and DuckDB/Spark agree exactly.
TIMESERIES_GORILLA_ORACLE = """
        WITH o AS (
            SELECT event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   event_id
            FROM events
        ), b AS (
            SELECT event_type, us, event_id,
                   us // 7200000000 AS blk,
                   row_number() OVER (
                       PARTITION BY event_type, us // 7200000000
                       ORDER BY us, event_id
                   ) AS rn
            FROM o
        ), d AS (
            SELECT event_type, blk, rn,
                   (us - lag(us) OVER w)
                   - (lag(us) OVER w - lag(us, 2) OVER w) AS dod
            FROM b WINDOW w AS (PARTITION BY event_type, blk ORDER BY rn)
        ), cls AS (
            SELECT event_type, blk, rn,
                   CASE WHEN rn <= 2 THEN -1
                        WHEN dod = 0 THEN 0
                        WHEN dod BETWEEN -63 AND 64 THEN 1
                        WHEN dod BETWEEN -255 AND 256 THEN 2
                        WHEN dod BETWEEN -2047 AND 2048 THEN 3
                        ELSE 4 END AS c
            FROM d
        ), per_block AS (
            SELECT event_type, blk,
                   count(*) AS bn,
                   sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS b0,
                   sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS b1,
                   sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS b2,
                   sum(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS b3,
                   sum(CASE WHEN c = 4 THEN 1 ELSE 0 END) AS b4,
                   32 + 64 * least(count(*), 2)
                   + sum(CASE WHEN c = 0 THEN 1
                              WHEN c = 1 THEN 9
                              WHEN c = 2 THEN 12
                              WHEN c = 3 THEN 16
                              WHEN c = 4 THEN 69
                              ELSE 0 END) AS bbits
            FROM cls GROUP BY event_type, blk
        )
        SELECT event_type,
               CAST(sum(bn) AS BIGINT) AS n_points,
               CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(b0) AS BIGINT) AS n_dod0,
               CAST(sum(b1) AS BIGINT) AS n_dod7,
               CAST(sum(b2) AS BIGINT) AS n_dod9,
               CAST(sum(b3) AS BIGINT) AS n_dod12,
               CAST(sum(b4) AS BIGINT) AS n_dod64,
               CAST(sum(bbits) AS BIGINT) AS ts_bits
        FROM per_block GROUP BY event_type ORDER BY event_type
"""


@register("timeseries_gorilla_stats", oracle=TIMESERIES_GORILLA_ORACLE)
def timeseries_gorilla_stats(spark, sf_dir):
    """BLOCK-chunked Gorilla compression of the event streams — the
    scheme the Facebook Gorilla paper (VLDB 2015 §4.1) introduced and
    the Prometheus/M3/InfluxDB family adopted for exactly this data
    shape.  Each (event_type, 2-hour block) slice — the paper's own
    block design, `GORILLA_BLOCK_US` — is encoded with delta-of-delta
    prefix codes + XOR-compressed doubles (`core/gorillacodec.py`),
    decoded back, and asserted EXACT in-executor (timestamps
    integer-equal, values IEEE-bit-equal — NaN payloads and signed
    zeros included); per-block class histograms and stream bits then
    merge associatively per type, and the DuckDB oracle recomputes the
    same per-block decomposition with window functions, so the wire
    format itself is driver-gated.

    100 TB shape: one exchange on the BLOCK key (event_type x 2h
    bucket — 1,800 groups at sf0.1 and growing with the data, vs the
    5-type ceiling the r11 verdict flagged in the pre-reshape query),
    then per-block work is a single sorted pass over a bounded slice
    — the codec is O(n) with constant state, which is why Gorilla
    streams compress on ingest at line rate.  Python-side the blocks
    flow through ONE ``mapInPandas`` call per partition (the r11
    funnel lesson re-applied: 1,800 ``applyInPandas`` groups paid
    ~15 ms of Arrow/group scaffold each — ~4.8 s at sf0.1 for ~55-row
    groups; the partition-wide form loops blocks inside pandas), with
    a CARRY for the one block that can straddle an Arrow batch
    boundary — so memory stays one-batch+one-block bounded, not
    partition-bounded.  The follow-up per-type merge is a
    ~#blocks-row aggregate, negligible at any scale."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from ..core.gorillacodec import (
        CLASS_BITS,
        decode_timestamps,
        decode_values,
        dod_class,
        encode_timestamps,
        encode_values,
    )

    prep(spark)
    # floor division via (a - pmod(a, b)) div b — exact floor for any
    # sign (timestamps here are epoch-2024 micros, so non-negative,
    # but the shape matches the oracle's `//` semantics by definition
    # rather than by data luck)
    blk = F.expr(
        f"(us - pmod(us, {GORILLA_BLOCK_US})) div {GORILLA_BLOCK_US}"
    )
    e = (
        load_events(spark, sf_dir)
        .select(
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("us"),
            "value",
        )
        .withColumn("blk", blk)
    )

    block_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("blk", T.LongType()),
            T.StructField("n_points", T.LongType()),
            T.StructField("n_dod0", T.LongType()),
            T.StructField("n_dod7", T.LongType()),
            T.StructField("n_dod9", T.LongType()),
            T.StructField("n_dod12", T.LongType()),
            T.StructField("n_dod64", T.LongType()),
            T.StructField("ts_bits", T.LongType()),
        ]
    )

    def _block(etype, bkey, pdf):
        pdf = pdf.sort_values(["us", "event_id"], kind="mergesort")
        ts = [int(v) for v in pdf["us"]]
        vals = [float(v) for v in pdf["value"]]
        lo = bkey * GORILLA_BLOCK_US
        if ts and not (lo <= ts[0] and ts[-1] < lo + GORILLA_BLOCK_US):
            raise ValueError(f"{etype}/{bkey}: point outside its block")
        blob, hist = encode_timestamps(ts)
        if decode_timestamps(blob) != ts:
            raise ValueError(f"{etype}/{bkey}: ts roundtrip drifted")
        vblob = encode_values(vals)
        got = decode_values(vblob)
        if [np.float64(v).tobytes() for v in got] != [
            np.float64(v).tobytes() for v in vals
        ]:
            raise ValueError(f"{etype}/{bkey}: value bits drifted")
        # independent recount: the histogram must equal a plain numpy
        # pass over the dods (the oracle recounts the same thing in
        # SQL, closing the triangle)
        a = np.asarray(ts, dtype=np.int64)
        if len(a) >= 3:
            dod = np.diff(np.diff(a))
            cls = np.select(
                [
                    dod == 0,
                    (dod >= -63) & (dod <= 64),
                    (dod >= -255) & (dod <= 256),
                    (dod >= -2047) & (dod <= 2048),
                ],
                [0, 1, 2, 3],
                default=4,
            )
            want = [int((cls == c).sum()) for c in range(5)]
            # spot-check the vectorized ladder against the scalar one
            for d in dod[:64]:
                if dod_class(int(d)) != int(
                    cls[np.flatnonzero(dod == d)[0]]
                ):
                    raise ValueError("ladder recount drifted")
        else:
            want = [0, 0, 0, 0, 0]
        if hist != want:
            raise ValueError(f"{etype}/{bkey}: class histogram drifted")
        ts_bits = 32 + 64 * min(len(ts), 2) + sum(
            CLASS_BITS[c] * hist[c] for c in range(5)
        )
        if len(blob) != (ts_bits + 7) // 8:
            raise ValueError(f"{etype}/{bkey}: stream length arithmetic")
        return (etype, bkey, len(ts), *hist, ts_bits)

    def _partition(batches):
        """All blocks of one partition through ONE Python call:
        groups are contiguous (sortWithinPartitions on the block
        key), so only the trailing group of each Arrow batch can be
        incomplete — it CARRIES into the next batch, keeping memory
        one-batch+one-block bounded."""
        carry = None
        rows: list[tuple] = []
        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            last_et = pdf["event_type"].iat[-1]
            last_blk = pdf["blk"].iat[-1]
            tail_run = int(
                (
                    (pdf["event_type"] == last_et)
                    & (pdf["blk"] == last_blk)
                )
                .values[::-1]
                .cumprod()
                .sum()
            )
            head = pdf.iloc[: len(pdf) - tail_run]
            carry = pdf.iloc[len(pdf) - tail_run :].reset_index(
                drop=True
            )
            for (etype, bkey), g in head.groupby(
                ["event_type", "blk"], sort=False
            ):
                rows.append(_block(etype, int(bkey), g))
        if carry is not None and len(carry):
            for (etype, bkey), g in carry.groupby(
                ["event_type", "blk"], sort=False
            ):
                rows.append(_block(etype, int(bkey), g))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "event_type", "blk", "n_points", "n_dod0",
                    "n_dod7", "n_dod9", "n_dod12", "n_dod64",
                    "ts_bits",
                ],
            )

    per_block = (
        e.repartition(
            spark.sparkContext.defaultParallelism, "event_type", "blk"
        )
        .sortWithinPartitions("event_type", "blk", "us", "event_id")
        .mapInPandas(_partition, block_schema)
    )
    # associative per-type merge of block stats: ~#blocks input rows,
    # so this second (tiny) aggregate is free at any scale
    return (
        per_block.groupBy("event_type")
        .agg(
            F.sum("n_points").cast("bigint").alias("n_points"),
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum("n_dod0").cast("bigint").alias("n_dod0"),
            F.sum("n_dod7").cast("bigint").alias("n_dod7"),
            F.sum("n_dod9").cast("bigint").alias("n_dod9"),
            F.sum("n_dod12").cast("bigint").alias("n_dod12"),
            F.sum("n_dod64").cast("bigint").alias("n_dod64"),
            F.sum("ts_bits").cast("bigint").alias("ts_bits"),
        )
        .orderBy("event_type")
    )
