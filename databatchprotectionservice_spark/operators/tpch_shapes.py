"""TPC-H shape completion — the 13 classic query shapes the relational
suite did not yet cover (q2, q4, q7-q11, q13, q15, q16, q20-q22 analogues).

With the nine analogues already in :mod:`relational` (q1, q3, q5, q6,
q12, q14, q17, q18, q19) this module completes coverage of all 22
canonical TPC-H plan shapes on the reduced test schema. Each query here
exists for a DISTINCT Catalyst feature, named in its docstring:
correlated EXISTS / NOT EXISTS rewrites, NOT-IN anti joins, scalar
subqueries (correlated and uncorrelated), outer joins with join-condition
filters, count-distinct after anti join, HAVING against a global total.

Schema adaptations (the test tables are reduced TPC-H — TESTDATA.md):
no ``partsupp`` table, so part<->supplier links go through ``lineitem``
(q2/q11/q16/q20); no ``l_commitdate``/``l_receiptdate``, so "late" means
shipped more than N days after ``o_orderdate`` (q4/q21); no ``c_phone``,
so q22's country code is ``c_nationkey % 5``; no ``o_comment``, so q13's
exclusion filter is on ``o_orderpriority``.

Engine-exactness rules follow :mod:`relational`: monetary sums through
DECIMAL(18,2), ratios via :func:`relational.round_ieee` on identical
expression trees, averages restated as exact integer/decimal
cross-multiplication (``x * N > S`` instead of ``x > S/N``), dates
emitted as formatted strings, BIGINT casts on all count-ish outputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.registry import load, prep, register
from ..sources.catalog import load_table
from .relational import DEC, dec_str, round_ieee, round_ieee_sql


# ---------------------------------------------------------------------------
# q2 — correlated scalar MIN subquery (min-cost supplier per part)
# ---------------------------------------------------------------------------


@register(
    "q2_min_acctbal_supplier",
    oracle="""
        SELECT DISTINCT
               CAST(CAST(s.s_acctbal AS DECIMAL(38,2)) AS VARCHAR) AS acctbal,
               s.s_name, n.n_name, p.p_partkey, p.p_brand
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
          AND s.s_acctbal = (
              SELECT min(s2.s_acctbal)
              FROM lineitem l2
              JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
              JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
              JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
              WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100
    """,
    description="TPC-H q2 analogue: correlated scalar MIN subquery "
    "(cheapest EU supplier per size-15 part, linked via lineitem)",
)
def q2_min_acctbal_supplier(spark, sf_dir):
    """The CORRELATED-MIN shape (TPC-H q2: for each part, the supplier
    whose account balance equals the per-part minimum among EU
    suppliers). Implemented in the decorrelated form Catalyst itself
    would produce — a per-partkey MIN aggregate joined back on
    (partkey, acctbal) — so the plan is one aggregate plus one join,
    never a per-row re-execution. Equality is on the RAW stored double
    (no arithmetic), so it decides identically in both engines.

    100 TB shape: part/supplier/nation/region are broadcast dims; the
    only shuffles are lineitem's distinct + the partkey aggregate, both
    on the same key so AQE reuses the exchange."""
    prep(spark)
    part15 = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    rows = (
        li.join(F.broadcast(part15), F.col("l_partkey") == part15.p_partkey)
        .join(F.broadcast(eu_sup), F.col("l_suppkey") == eu_sup.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .distinct()
    )
    minpk = rows.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        rows.join(
            F.broadcast(minpk),
            (rows.p_partkey == minpk.mk) & (rows.s_acctbal == minpk.min_bal),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
        .select(
            dec_str(F.col("s_acctbal")).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
        )
    )


# ---------------------------------------------------------------------------
# q4 — correlated EXISTS semi-join
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """,
    description="TPC-H q4 analogue: correlated EXISTS rewritten to a "
    "left-semi join (orders with a line shipped >60 days after order)",
)
def q4_order_priority(spark, sf_dir):
    """The EXISTS-SEMI-JOIN shape (TPC-H q4: priority distribution of
    orders having at least one late line). Written as SQL text so
    Catalyst's RewritePredicateSubquery runs end-to-end: the correlated
    EXISTS — whose inner predicate references the OUTER column
    ``o_orderdate`` in a non-equi comparison — becomes a left-semi join
    on ``l_orderkey = o_orderkey`` with the date condition in the join
    predicate (pinned in tests/test_plan_shapes.py). "Late" is shipped
    >60 days after order date (the schema has no commit/receipt dates).

    100 TB shape: the quarter filter pushes to the orders scan; the
    semi join shuffles both sides on orderkey and keeps only the outer
    columns — no lineitem payload crosses the exchange."""
    prep(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


@register(
    "q7_nation_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               CAST(CAST(sum(volume) AS DECIMAL(38,4)) AS VARCHAR) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l.l_discount AS DECIMAL(8,2)) AS volume
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H q7 analogue: bilateral nation-pair trade volume "
    "by ship year (disjunctive pair predicate across two nation joins)",
)
def q7_nation_volume_shipping(spark, sf_dir):
    """The NATION-PAIR shape (TPC-H q7: trade volume between two named
    nations by year). The pair predicate is an OR across COLUMNS OF TWO
    DIFFERENT JOINS — each nation dim is pre-filtered to the two-nation
    set (so the disjunction prunes both broadcast sides) and the
    cross-pair condition (``supp_nation != cust_nation``) applies after
    the joins, which is equivalent given the pre-filter.

    100 TB shape: nation is broadcast twice under different aliases;
    the fact-side shuffles are the li<->orders and orders<->customer
    equi-joins; the final aggregate has ~#years * 2 groups."""
    prep(spark)
    pair = ("NATION_1", "NATION_2")
    n1 = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(
            F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(
            F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nk")
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nk")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
            ).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dec_str(F.sum("volume"), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q8 — national market share (CASE-ratio aggregate)
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
        SELECT o_year,
               {round_ieee_sql(
                   "CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume "
                   "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) "
                   "/ CAST(sum(volume) AS DOUBLE)")} AS mkt_share
        FROM (
            SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l.l_discount AS DECIMAL(8,2)) AS volume,
                   n2.n_name AS supp_nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
        ) all_sales
        GROUP BY o_year
    """,
    description="TPC-H q8 analogue: one nation's share of a region's "
    "ECONOMY-part market by order year (CASE-sum ratio)",
)
def q8_market_share(spark, sf_dir):
    """The MARKET-SHARE shape (TPC-H q8: conditional-sum / total-sum
    ratio per year over a 7-table join). Both sums are exact decimals;
    only the final ratio is floating, via :func:`round_ieee` on the
    identical expression tree both engines evaluate.

    100 TB shape: part (type-filtered), supplier, customer, both nation
    aliases and region broadcast; lineitem<->orders is the only big
    shuffle; the aggregate is per-year (tiny)."""
    prep(spark)
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    vol = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,2)")
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(r), F.col("crk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("snk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
                    zero
                )
            ).alias("nat"),
            F.sum("volume").alias("tot"),
        )
        .select(
            "o_year",
            round_ieee(
                F.col("nat").cast("double") / F.col("tot").cast("double")
            ).alias("mkt_share"),
        )
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle="""
        SELECT nation, o_year,
               CAST(CAST(sum(amount) AS DECIMAL(38,4)) AS VARCHAR) AS sum_profit
        FROM (
            SELECT n.n_name AS nation,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l.l_discount AS DECIMAL(8,2))
                   - CAST(l.l_quantity AS DECIMAL(8,0))
                     * (CAST(p.p_retailprice AS DECIMAL(18,2))
                        * CAST(0.1 AS DECIMAL(2,1))) AS amount
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE p.p_name LIKE '%gear%'
        ) profit
        GROUP BY nation, o_year
    """,
    description="TPC-H q9 analogue: per-nation/year profit on parts "
    "matching a name pattern (cost proxied by 10% of retail price)",
)
def q9_product_profit(spark, sf_dir):
    """The PROFIT-ROLLUP shape (TPC-H q9: expression aggregate over a
    5-table join with a LIKE-filtered part side). The schema has no
    ``partsupp.ps_supplycost``, so unit cost is proxied by 10% of
    ``p_retailprice`` — same expression structure (revenue minus
    quantity*cost), restated in exact decimal arithmetic: quantities
    are whole numbers (DECIMAL(8,0)) and the 10% factor is an exact
    DECIMAL(2,1) multiply of the cents-cast price — never a double
    multiply, whose per-engine rounding differs by a cent on boundary
    values (observed on first registration).

    100 TB shape: LIKE prunes part before broadcast; supplier/nation
    broadcast; lineitem<->orders is the only fact shuffle; the final
    aggregate is (25 nations x years)."""
    prep(spark)
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,2)") - F.col("l_quantity").cast("decimal(8,0)") * (
        F.col("p_retailprice").cast(DEC) * F.lit("0.1").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_str(F.sum("amount"), 4).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q10 — returned-item reporting (top 20 customers by lost revenue)
# ---------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(8,2)))
                    AS DECIMAL(38,4)) AS VARCHAR) AS revenue,
               CAST(CAST(c.c_acctbal AS DECIMAL(38,2)) AS VARCHAR) AS acctbal,
               n.n_name, c.c_mktsegment
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
        ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l.l_discount AS DECIMAL(8,2))) DESC, c.c_custkey
        LIMIT 20
    """,
    description="TPC-H q10 analogue: top-20 customers by revenue lost "
    "to returned items in one quarter",
)
def q10_returned_items(spark, sf_dir):
    """The RETURNED-ITEMS shape (TPC-H q10: revenue grouped by a wide
    customer key, ordered + limited). The top-20 cut sorts on the EXACT
    decimal revenue (ties broken by custkey), so the boundary is
    engine-deterministic.

    100 TB shape: both filters push to their scans; customer/nation
    broadcast; the orderkey shuffle carries only (custkey columns,
    revenue terms); TakeOrdered keeps the top 20 per partition."""
    prep(spark)
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,2)")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(rev).alias("rev"))
        .orderBy(F.desc("rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            dec_str(F.col("rev"), 4).alias("revenue"),
            dec_str(F.col("c_acctbal")).alias("acctbal"),
            "n_name",
            "c_mktsegment",
        )
    )


# ---------------------------------------------------------------------------
# q11 — important parts (HAVING against a global-total scalar subquery)
# ---------------------------------------------------------------------------


@register(
    "q11_important_parts",
    oracle="""
        SELECT l_partkey,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY l_partkey
        HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 500 > (
            SELECT sum(CAST(l2.l_extendedprice AS DECIMAL(18,2)))
            FROM lineitem l2
            JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
            WHERE n2.n_name = 'NATION_3')
    """,
    description="TPC-H q11 analogue: parts whose one-nation value "
    "exceeds 1/500 of that nation's total (HAVING vs global scalar)",
)
def q11_important_parts(spark, sf_dir):
    """The HAVING-VS-TOTAL shape (TPC-H q11: per-group value compared
    against a fraction of the global total). The fraction is restated
    as exact cross-multiplication — ``part_value * 500 > total`` in
    DECIMAL arithmetic — so no float division decides the cut. The
    uncorrelated scalar subquery becomes a 1-row broadcast cross join
    (the decorrelation Catalyst applies to scalar subqueries anyway),
    and the per-part aggregate is REUSED for the total via a second
    aggregate over it — lineitem is scanned once per side, not twice.

    100 TB shape: one partkey-keyed shuffle over the nation-filtered
    fact rows; the total is a scalar; the cross join is 1-row."""
    prep(spark)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    li = load(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("val"))
    )
    total = per_part.agg(F.sum("val").alias("total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val") * 500 > F.col("total"))
        .select("l_partkey", dec_str(F.col("val")).alias("part_value"))
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (filtered outer join)
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    description="TPC-H q13 analogue: order-count histogram over a "
    "left outer join with the exclusion filter IN the join condition",
)
def q13_customer_distribution(spark, sf_dir):
    """The FILTERED-OUTER-JOIN shape (TPC-H q13: the exclusion predicate
    must live in the JOIN CONDITION, not a post-filter — a post-filter
    would drop the zero-order customers the histogram exists to count).
    ``count(o_orderkey)`` counts non-null matches only, so unmatched
    customers land in the ``c_count = 0`` bucket. Double aggregation:
    per-customer counts, then the count distribution.

    100 TB shape: both aggregations are map-side combinable; the outer
    join shuffles on custkey and the second aggregate's key space is
    tiny (max orders per customer)."""
    prep(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q15 — top supplier (aggregate view + MAX scalar subquery)
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(8,2)))
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(CAST(r.total_revenue AS DECIMAL(38,4)) AS VARCHAR)
                   AS total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    description="TPC-H q15 analogue: supplier(s) with the maximum "
    "quarterly revenue (aggregate CTE + MAX scalar subquery)",
)
def q15_top_supplier(spark, sf_dir):
    """The MAX-OF-AGGREGATE shape (TPC-H q15: an aggregate view joined
    against its own maximum). The revenue totals are EXACT decimals, so
    the ``= max`` comparison is engine-deterministic even with revenue
    ties. The scalar max becomes a 1-row broadcast cross join over the
    cached aggregate — the lineitem scan happens once, the aggregate is
    reused for both the max and the equality probe.

    100 TB shape: one suppkey shuffle after a pushed date filter; the
    supplier join is broadcast; the max is a scalar."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
            ).alias("total_revenue")
        )
        .cache()
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            dec_str(F.col("total_revenue"), 4).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q16 — supplier counts per part group (NOT-IN anti join + count distinct)
# ---------------------------------------------------------------------------


@register(
    "q16_part_supplier_counts",
    oracle="""
        SELECT p.p_brand, p.p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 14, 23, 45)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_size
    """,
    description="TPC-H q16 analogue: distinct supplier counts per "
    "(brand, size) excluding a NOT-IN supplier set",
)
def q16_part_supplier_counts(spark, sf_dir):
    """The NOT-IN + COUNT-DISTINCT shape (TPC-H q16). The exclusion set
    (suppliers in arrears) is a broadcast LEFT-ANTI join — safe here
    because ``s_suppkey`` is never null, so NOT IN and anti-join agree.
    ``count(DISTINCT l_suppkey)`` expands to the classic two-phase
    distinct aggregate.

    100 TB shape: part filters prune before the broadcast; the anti
    join is broadcast (the exclusion set is small by construction); the
    only shuffle is the distinct-aggregate exchange on (brand, size)."""
    prep(spark)
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 14, 23, 45))
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q20 — suppliers with excess shipments (IN over an aggregated subquery)
# ---------------------------------------------------------------------------


@register(
    "q20_excess_shippers",
    oracle="""
        SELECT s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_4'
          AND s.s_suppkey IN (
              SELECT l.l_suppkey
              FROM lineitem l
              JOIN part p ON p.p_partkey = l.l_partkey
              WHERE p.p_name LIKE 'small%'
                AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY l.l_suppkey
              HAVING sum(CAST(l.l_quantity AS BIGINT)) > 50)
    """,
    description="TPC-H q20 analogue: suppliers of one nation who "
    "shipped >50 units of 'small%' parts in a year (IN over HAVING)",
)
def q20_excess_shippers(spark, sf_dir):
    """The IN-OVER-AGGREGATE shape (TPC-H q20: a semi join against a
    grouped-and-HAVING-filtered subquery — the schema has no
    ``partsupp.ps_availqty``, so the threshold is on shipped quantity).
    Quantities are whole numbers, summed as BIGINT — exact.

    100 TB shape: the inner aggregate shuffles the name-filtered
    lineitem rows on suppkey only (two columns); its result is small,
    so the semi join is broadcast into the nation-filtered supplier
    scan."""
    prep(spark)
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return s.join(
        F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "n_name")


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
        SELECT s.s_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 30 DAY)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
    description="TPC-H q21 analogue: sole-late suppliers in "
    "multi-supplier finished orders (EXISTS + NOT EXISTS pair)",
)
def q21_suppliers_kept_waiting(spark, sf_dir):
    """The EXISTS/NOT-EXISTS PAIR shape (TPC-H q21: the only canonical
    query with BOTH a correlated semi and a correlated anti join, each
    with a non-equality predicate on the outer row — ``l2.l_suppkey <>
    l1.l_suppkey``). Written as SQL text so RewritePredicateSubquery
    produces the left-semi + left-anti pair. "Late" is shipped >30 days
    after order date (no receipt/commit dates in this schema); the
    inner ``l3`` re-joins orders for its own date, making the correlation
    a pure orderkey equality plus the suppkey disequality.

    100 TB shape: all three lineitem legs shuffle on orderkey — the
    same key, so AQE/exchange reuse applies; supplier is broadcast; the
    aggregate is per-supplier name."""
    prep(spark)
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s.s_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 30 DAY)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
        """
    )


# ---------------------------------------------------------------------------
# q22 — dormant high-balance customers (anti join + exact-average scalar)
# ---------------------------------------------------------------------------


@register(
    "q22_dormant_customers",
    oracle="""
        SELECT c.c_nationkey % 5 AS cntrycode,
               count(*) AS numcust,
               CAST(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS VARCHAR) AS totacctbal
        FROM customer c
        WHERE CAST(c.c_acctbal AS DECIMAL(18,2))
              * (SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0)
              > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                 FROM customer c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c.c_nationkey % 5
    """,
    description="TPC-H q22 analogue: above-average-balance customers "
    "with no recent orders, grouped by derived country code",
)
def q22_dormant_customers(spark, sf_dir):
    """The ANTI-JOIN + AVERAGE-THRESHOLD shape (TPC-H q22: customers
    above the average positive balance who placed no recent orders).
    The average is restated as exact cross-multiplication —
    ``acctbal * N > S`` with S an exact decimal sum and N a count — so
    no float summation order can flip a boundary row (a real hazard:
    double sums are order-dependent and Spark/DuckDB reduce in
    different orders). Country code is ``c_nationkey % 5`` (no phone
    column). NOT EXISTS becomes a left-anti join on custkey with the
    date filter pushed into the orders scan.

    100 TB shape: the threshold is a 1-row broadcast; the anti join
    shuffles on custkey (or broadcasts the date-pruned orders side);
    the final aggregate has 5 groups."""
    prep(spark)
    c = load(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(F.col("c_acctbal").cast(DEC)).alias("s_pos"),
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast(DEC) * F.col("n_pos") > F.col("s_pos"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_str(F.sum(F.col("c_acctbal").cast(DEC))).alias("totacctbal"),
        )
    )
