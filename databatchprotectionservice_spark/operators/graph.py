"""Graph analytics beyond connected components: fixed-iteration
PageRank over the customer<->supplier interaction graph.

Complements the Pregel-style connected components in
:mod:`dedup` with the other canonical iterative-graph shape — a
fixed-point LINEAR iteration (rank flow) rather than a label
propagation. The engine lesson it encodes: even an iterative algorithm
can be held to the full hash-equality oracle gate when the iteration
count is FIXED and the arithmetic is integer-exact — the oracle unrolls
the same five iterations as chained CTEs, generated from the same
Python constants, so both engines execute the identical computation.

Determinism: ranks are integers in micro-units. The update
``r' = 150000 + (85 * sum(r div outdeg)) div 100`` uses only integer
division (``div`` in Spark, ``//`` in DuckDB — both truncating for the
non-negative values here) and order-independent integer sums. Floor
leakage makes this a PageRank VARIANT (total mass decays slightly per
round), which is fine: both engines compute the same variant, and the
ranking structure is what downstream sampling/curation consumes.

100 TB shape: the edge list shuffles once per iteration on the join key
(src), the contribution aggregate is map-side combinable on dst, and
the FIXED iteration count keeps the whole run one lazy ~25-operator
plan — no per-round materialization jobs (the PLANS.md
iterative-lineage hazard only bites unbounded loops whose plan doubles
per round, like the CC propagation, which keeps its eager
localCheckpoints).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.registry import load, prep, register


#: shared bidirected purchase-graph CTE prefix (pairs + edges): the
#: 2*custkey / 2*suppkey+1 node encoding must stay IDENTICAL between
#: pagerank and BFS, in both the DataFrame builders and the oracles
_PURCHASE_EDGES_CTE = """
        WITH pairs AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        ),
        edges AS (
            SELECT 2 * c AS src, 2 * s + 1 AS dst FROM pairs
            UNION ALL
            SELECT 2 * s + 1 AS src, 2 * c AS dst FROM pairs
        ),"""


def _purchase_edges(spark, sf_dir):
    """(pairs, edges) of the bidirected customer-supplier purchase
    graph — the single implementation of the 2*c / 2*s+1 encoding
    shared by pagerank, BFS and triangles.

    r15: ``pairs`` (not ``edges``) is the materialization point — every
    caller re-reads the pair set several times (seeds + edges in BFS,
    degree guard + both self-join sides in triangles, degree + rank flow
    in PageRank), while ``edges`` is just a map-only double projection
    of pairs (union of two selects, no shuffle), so checkpointing pairs
    halves the stored rows and the old eager edges job disappears."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    fwd = pairs.select(
        (2 * F.col("c")).alias("src"), (2 * F.col("s") + 1).alias("dst")
    )
    rev = pairs.select(
        (2 * F.col("s") + 1).alias("src"), (2 * F.col("c")).alias("dst")
    )
    edges = fwd.unionByName(rev)
    return pairs, edges

PR_ITERATIONS = 5
PR_TOP = 20
#: damping 0.85 and teleport 0.15 in micro-unit integer arithmetic
_R0 = 1_000_000
_TELEPORT = 150_000


def _oracle_sql() -> str:
    """Unroll the five integer-exact iterations as chained CTEs."""
    parts = [
        _PURCHASE_EDGES_CTE + """
        nodes AS (SELECT DISTINCT src AS v FROM edges),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        r0 AS (SELECT v, CAST(%d AS BIGINT) AS r FROM nodes)
        """
        % _R0
    ]
    for k in range(1, PR_ITERATIONS + 1):
        parts.append(
            f""",
        r{k} AS (
            SELECT n.v,
                   CAST({_TELEPORT} + (85 * coalesce(c.s, 0)) // 100
                        AS BIGINT) AS r
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS v, sum(p.r // d.d) AS s
                FROM edges e
                JOIN r{k - 1} p ON p.v = e.src
                JOIN deg d ON d.src = e.src
                GROUP BY e.dst) c ON c.v = n.v
        )"""
        )
    parts.append(
        f"""
        SELECT CASE WHEN v % 2 = 0 THEN 'customer' ELSE 'supplier' END
                   AS node_type,
               CAST(v // 2 AS BIGINT) AS node_key,
               r AS rank_e6
        FROM r{PR_ITERATIONS}
        ORDER BY r DESC, v
        LIMIT {PR_TOP}
        """
    )
    return "".join(parts)


@register(
    "pagerank_top_nodes",
    oracle=_oracle_sql(),
    description=f"{PR_ITERATIONS}-iteration integer-exact PageRank over "
    "the bidirected customer<->supplier purchase graph; the oracle "
    "unrolls the identical iterations as chained CTEs",
)
def pagerank_top_nodes(spark, sf_dir):
    """Fixed-iteration PageRank (see module docstring). Nodes live in
    one id space — customers at ``2*custkey``, suppliers at
    ``2*suppkey + 1`` — and every purchase edge is bidirected, so no
    node is dangling by construction. Each iteration is:

      contributions = edges ⋈ ranks (on src) -> r div outdeg
      new rank      = teleport + 85% of the dst-summed contributions

    as one lazy five-round unrolled plan over a MATERIALIZED edge+degree
    leaf (r16, VERDICT r15 item 1: the driver measured the fully-lazy
    r15 shape 0.73x vs r14 — its unrolled plan references the
    edges-join-degree subtree once per round, and exchange reuse did
    not reliably deduplicate the recomputation on the driver's rig.
    One eager localCheckpoint of ``ed`` pins that subtree to a leaf:
    each round is then a small join+agg over the leaf, the per-round
    eager checkpoints of r14 stay gone — their 5 jobs were measured
    pure overhead — and the interleaved A/B on the r16 rig has
    lazy/ed-ckpt at parity, 2.99-3.42 s min-of-6, with ed-ckpt immune
    to the recompute hazard by construction)."""
    prep(spark)
    pairs, edges = _purchase_edges(spark, sf_dir)
    # deg's src set IS the node set (bidirected construction: every
    # node has outdegree > 0), so rank init folds out of deg and the
    # old separate nodes-distinct shuffle is gone
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = edges.join(deg, "src").localCheckpoint(eager=True)

    ranks = deg.select(
        F.col("src").alias("v"), F.lit(_R0).cast("bigint").alias("r")
    )
    for _ in range(PR_ITERATIONS):
        # the bidirected construction guarantees indeg = outdeg > 0 for
        # every node, so the contribution aggregate's dst set IS the
        # node set — the new rank folds directly out of the aggregate
        # (one join per round, not two; the r7 plan audit's suggestion)
        ranks = (
            ed.join(ranks, ed.src == ranks.v)
            .select("dst", F.expr("r div d").alias("share"))
            .groupBy("dst")
            .agg(
                (F.lit(_TELEPORT) + F.expr("85 * sum(share) div 100"))
                .cast("bigint")
                .alias("r")
            )
            .select(F.col("dst").alias("v"), "r")
        )
    return (
        ranks.orderBy(F.desc("r"), F.asc("v"))
        .limit(PR_TOP)
        .select(
            F.when(F.col("v") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("v div 2").cast("bigint").alias("node_key"),
            F.col("r").alias("rank_e6"),
        )
    )


# ---------------------------------------------------------------------------
# BFS: shortest hop-distance from seed customers, fixed rounds
# ---------------------------------------------------------------------------

BFS_ROUNDS = 4
BFS_SEEDS = 5  # customers with custkey < BFS_SEEDS


def _bfs_oracle_sql() -> str:
    """Unroll the fixed BFS relaxations as chained CTEs."""
    parts = [
        _PURCHASE_EDGES_CTE + """
        d0 AS (
            SELECT DISTINCT 2 * c AS v, CAST(0 AS BIGINT) AS d
            FROM pairs WHERE c < %d
        )
        """
        % BFS_SEEDS
    ]
    for k in range(1, BFS_ROUNDS + 1):
        parts.append(
            f""",
        d{k} AS (
            SELECT v, min(d) AS d FROM (
                SELECT v, d FROM d{k - 1}
                UNION ALL
                SELECT e.dst AS v, p.d + 1 AS d
                FROM edges e JOIN d{k - 1} p ON p.v = e.src
            ) GROUP BY v
        )"""
        )
    parts.append(
        f"""
        SELECT CASE WHEN v % 2 = 0 THEN 'customer' ELSE 'supplier' END
                   AS node_type,
               CAST(v // 2 AS BIGINT) AS node_key,
               d AS hops
        FROM d{BFS_ROUNDS}
        """
    )
    return "".join(parts)


@register(
    "bfs_purchase_distance",
    oracle=_bfs_oracle_sql(),
    description=f"{BFS_ROUNDS}-round BFS hop distance from the seed "
    "customers over the bidirected purchase graph; the oracle unrolls "
    "the identical relaxations as chained CTEs",
)
def bfs_purchase_distance(spark, sf_dir):
    """Multi-source BFS — the other canonical iterative-graph shape
    next to PageRank's linear fixed point and connected components'
    label propagation: a monotone FRONTIER EXPANSION.  Each round
    unions the reached set with its out-neighbors at distance +1 and
    keeps the per-node minimum; after K fixed rounds the table holds
    every node within K hops of a seed customer with its exact hop
    count (graph distance from the nearest seed — purely integer, so
    the full hash gate applies, PageRank's lesson reused).

    100 TB shape: per round, one join of the weighted edge leaf to the
    reached set on src (broadcastable while the frontier is small —
    THE BFS win over dense methods) and one map-side-combinable min
    aggregate.

    r16 (VERDICT r15 item 1 + ADVICE r15): the r15 lazy shape
    referenced each round's dist TWICE (union + join), so the logical
    plan DOUBLED per round (1844 lines at 4 rounds, exponential in
    BFS_ROUNDS) and the driver measured it 0.86x vs r14.  Weight-0
    SELF-LOOPS linearize the recurrence:

        min(d_v, min over in-neighbors u of d_u + 1)
          == min over (edges w=1  ∪  self-loops w=0) of d + w

    so each round is ONE join + ONE min-aggregate with dist referenced
    ONCE — the plan grows linearly in BFS_ROUNDS (the exponential-plan
    constraint on raising BFS_ROUNDS is gone), the whole expansion is
    still one lazy action, and the weighted edge leaf is checkpointed
    once (it is consumed every round).  Interleaved A/B on the r16
    rig: 2.48-2.58 s vs lazy 3.0-3.6 s and the r14 persist shape
    2.8-2.9 s (min-of-6, results asserted identical across shapes).
    The self-relaxation carries the full reached set each round for
    oracle identity; a production BFS would propagate only the
    improved-distance DELTA, an optimization that changes no result."""
    prep(spark)
    pairs, edges = _purchase_edges(spark, sf_dir)
    dist = (
        pairs.filter(F.col("c") < BFS_SEEDS)
        .select((2 * F.col("c")).alias("v"))
        .distinct()
        .select("v", F.lit(0).cast("bigint").alias("d"))
    )
    ew = (
        edges.select("src", "dst", F.lit(1).alias("w"))
        .unionByName(
            edges.select(
                F.col("src").alias("src"),
                F.col("src").alias("dst"),
                F.lit(0).alias("w"),
            ).distinct()
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(BFS_ROUNDS):
        dist = (
            ew.join(dist, ew.src == dist.v)
            .select("dst", (F.col("d") + F.col("w")).alias("d"))
            .groupBy("dst")
            .agg(F.min("d").alias("d"))
            .select(F.col("dst").alias("v"), "d")
        )
    return dist.select(
        F.when(F.col("v") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("v div 2").cast("bigint").alias("node_key"),
        F.col("d").alias("hops"),
    )


# ---------------------------------------------------------------------------
# triangle counting over the supplier co-purchase projection
# ---------------------------------------------------------------------------

#: two suppliers are co-purchase neighbors when >= this many distinct
#: customers bought from both
TRI_MIN_SHARED = 2
TRI_TOP = 15
#: the triangle graph keeps only the E STRONGEST edges (ordered by
#: shared-customer count desc, ties by (a, b) — a total order, so the
#: cap is deterministic on both engines).  This is the load-bearing
#: scale bound: a dense co-occurrence projection (TPC-H's uniform
#: buying makes the supplier graph essentially COMPLETE — every pair
#: shares >= 2 customers) has Theta(n^3) triangles, and no closure
#: strategy survives enumeration-bound output.  Strength-capping is
#: the production co-occurrence shape (keep the significant edges,
#: not the noise floor) and bounds closure work by E^{3/2} regardless
#: of corpus size — the global top-E itself is a partial per-partition
#: top-k merge, shuffle-light at any scale.
TRI_EDGE_CAP = 5000
#: refuse-don't-truncate guard on the quadratic per-customer pair
#: expansion (sum of degree^2): a customer with more distinct
#: suppliers than this makes the projection hub-dominated; the scale
#: mitigation is frequency-pruning hot customers BEFORE pairing (the
#: standard co-occurrence fix), which changes semantics and therefore
#: must be an explicit caller choice, never silent
TRI_MAX_CUST_DEGREE = 5000

#: r10 registration oracle — an INDEPENDENT formulation: plain
#: id-ordered closure (a<b<c three-way join), where the Spark side
#: orients edges by (degree, id).  Orientation cannot change which
#: triangles exist, so agreement is a genuine cross-check of both
#: the projection and the closure, not a shared transcription.
TRIANGLE_ORACLE = f"""
        WITH pairs AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        ),
        co_all AS (
            SELECT p1.s AS a, p2.s AS b, count(*) AS shared
            FROM pairs p1 JOIN pairs p2 ON p1.c = p2.c AND p1.s < p2.s
            GROUP BY p1.s, p2.s
            HAVING count(*) >= {TRI_MIN_SHARED}
        ),
        co AS (
            SELECT a, b FROM co_all
            ORDER BY shared DESC, a, b LIMIT {TRI_EDGE_CAP}
        ),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM co e1
            JOIN co e2 ON e2.a = e1.b
            JOIN co e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        corners AS (
            SELECT x AS s_key FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        )
        SELECT CAST(s_key AS BIGINT) AS s_key,
               CAST(count(*) AS BIGINT) AS n_triangles
        FROM corners
        GROUP BY s_key
        ORDER BY n_triangles DESC, s_key
        LIMIT {TRI_TOP}
"""


@register("triangle_suppliers", oracle=TRIANGLE_ORACLE)
def triangle_suppliers(spark, sf_dir):
    """Top suppliers by triangle participation among the TRI_EDGE_CAP
    strongest co-purchase edges (edge strength = shared distinct
    customers, floor TRI_MIN_SHARED) — the canonical clustering-
    structure primitive next to PageRank (flow), CC (labels), and BFS
    (distance).  Staged for r10 registration with ``TRIANGLE_ORACLE``.

    100 TB shape: pure DataFrame, no UDF anywhere.  (1) The
    projection pairs suppliers per customer — sum-of-degree^2 work,
    bounded by the TRI_MAX_CUST_DEGREE refuse guard; the pair count
    aggregate is map-side combinable.  (2) Triangle closure uses the
    DEGREE-ORDERED orientation (each undirected edge directed from
    its lower-(degree,id) endpoint), the standard trick that bounds
    per-vertex wedge fan-out by O(sqrt(m)) on skewed graphs instead
    of the hub degree — the difference between a feasible and an
    exploding join at web scale.  Wedges shuffle once on the pivot
    vertex, the closing lookup once on the (b, c) pair."""
    prep(spark)
    pairs, _ = _purchase_edges(spark, sf_dir)

    hot = (
        pairs.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d").alias("mx"))
        .collect()[0]["mx"]
    )
    if hot is not None and hot > TRI_MAX_CUST_DEGREE:
        raise ValueError(
            f"co-purchase projection refused: a customer has {hot} "
            f"distinct suppliers (> {TRI_MAX_CUST_DEGREE}); frequency-"
            "prune hot customers before pairing (the explicit-choice "
            "scale mitigation)"
        )

    # explicit width for the wedge stage: the pair self-join's INPUT
    # bytes are tiny but its output is sum-of-degree^2 rows, so
    # size-based AQE coalescing — NOT the shipped session default
    # (session.py kept Spark's parallelism-first rule after a neutral
    # A/B), but one conf flip away via extra_conf — would serialize
    # the join + partial-count onto one task (measured 12.0 s -> 3.5 s
    # at sf0.1 under that candidate config).  REPARTITION_BY_NUM
    # exchanges are never coalesced, and both sides sharing key+width
    # means the join adds no further exchange; under shipped defaults
    # the repartition is a cheap defensive no-op-width exchange.
    width = spark.sparkContext.defaultParallelism
    pairs_w = pairs.repartition(width, "c")
    p2 = pairs_w.select(F.col("c").alias("c2"), F.col("s").alias("s2"))
    co = (
        pairs_w.join(p2, (F.col("c") == F.col("c2")) & (F.col("s") < F.col("s2")))
        .groupBy(F.col("s").alias("a"), F.col("s2").alias("b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= TRI_MIN_SHARED)
        # strongest-E cap (see TRI_EDGE_CAP): orderBy+limit compiles to
        # TakeOrderedAndProject — per-partition partial top-k, one small
        # merge, never a full sort exchange
        .orderBy(F.col("shared").desc(), "a", "b")
        .limit(TRI_EDGE_CAP)
        .select("a", "b")
        .localCheckpoint(eager=True)  # reused three times below
    )

    # degree-ordered orientation: src = lower (degree, id) endpoint
    deg = (
        co.select(F.col("a").alias("v"))
        .unionByName(co.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    ranked = co.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    # r15: lazy — oriented is consumed three times (e1/e2/closing) but
    # it is a pair of broadcast-sized joins over the checkpointed co
    # leaf; the deg aggregate below it is deduplicated by exchange
    # reuse, so the old eager checkpoint bought nothing but a job
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a"))
        .alias("deg_dst"),
    )

    e1 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b"),
        F.col("deg_dst").alias("deg_b"),
    )
    e2 = oriented.select(
        F.col("src").alias("a2"), F.col("dst").alias("c"),
        F.col("deg_dst").alias("deg_c"),
    )
    wedges = e1.join(e2, F.col("a") == F.col("a2")).filter(
        (F.col("deg_b") < F.col("deg_c"))
        | ((F.col("deg_b") == F.col("deg_c")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")

    corners = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("s_key"))
        .groupBy("s_key")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        corners.select(
            F.col("s_key").cast("bigint").alias("s_key"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
        )
        .orderBy(F.col("n_triangles").desc(), "s_key")
        .limit(TRI_TOP)
    )
