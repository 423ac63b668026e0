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


# ---------------------------------------------------------------------------
# Q1-style pricing summary: scan -> filter -> groupBy aggregate
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
            sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
            sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS sum_disc_price,
            sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))
                * CAST(1 + l_tax AS DECIMAL(18,2))) AS sum_charge,
            count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 adapted: pushed-down filter + hash aggregate",
)
def q1_pricing_summary(spark, sf_dir):
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
            ).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
                * (F.lit(1) + F.col("l_tax")).cast(DEC)
            ).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3-style shipping priority: 3-way join, aggregate, top-k
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
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
    """,
    description="TPC-H Q3 adapted: broadcast dim join -> agg -> top-k",
)
def q3_shipping_priority(spark, sf_dir):
    prep(spark)
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
    )


# ---------------------------------------------------------------------------
# Q5-style: 6-way star join with region filter
# ---------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    oracle="""
        SELECT
            n.n_name AS nation,
            sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS revenue
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
    description="TPC-H Q5 adapted: star join, all dims broadcast",
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
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
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
            sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS revenue,
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
        F.sum(
            F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_top_orders_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice, rk
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
            F.col("o_totalprice").cast(DEC).alias("totalprice"),
            "rk",
        )
    )


@register(
    "window_running_revenue",
    oracle="""
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) AS orderdate,
               o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DECIMAL(18,2)) AS running_total
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
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast(DEC).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k
# ---------------------------------------------------------------------------


@register(
    "topk_expensive_parts",
    oracle="""
        SELECT p_partkey, p_name, p_brand,
               CAST(p_retailprice AS DECIMAL(18,2)) AS retailprice
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
            F.col("p_retailprice").cast(DEC).alias("retailprice"),
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
    both = y1996.intersect(y1997).count()
    only = y1996.exceptAll(y1997).distinct().count()
    either = y1996.union(y1997).distinct().count()
    return spark.createDataFrame(
        [(both, only, either)], "both_years long, only_1996 long, either_year long"
    )


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
            sum(CAST(round(p_retailprice, 1) AS DECIMAL(18,2))) AS sum_rounded,
            sum(abs(p_size - 25)) AS sum_absdev,
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
        F.sum(F.round("p_retailprice", 1).cast(DEC)).alias("sum_rounded"),
        F.sum(F.abs(F.col("p_size") - 25)).alias("sum_absdev"),
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
            sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS sum_k,
            count(DISTINCT user_id) AS n_users,
            sum(CAST(value AS DECIMAL(18,2))) AS sum_value
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
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast(DEC)).alias("sum_value"),
    )


@register(
    "events_hourly_rollup",
    oracle="""
        SELECT
            strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
            event_type,
            count(*) AS n,
            sum(CAST(value AS DECIMAL(18,2))) AS sum_value
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
        F.sum(F.col("value").cast(DEC)).alias("sum_value"),
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
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    return spark.createDataFrame(
        [(with_orders, without)], "with_orders long, without_orders long"
    )


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
