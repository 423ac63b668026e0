"""Similarity search over the ``embeddings`` table (64-dim float vectors).

Two paths, matching how ANN is deployed at scale:

* **Brute-force cosine top-k** — correctness baseline. The query set is
  tiny and broadcast; the scan side computes dot products with built-in
  higher-order functions (``zip_with`` + ``aggregate``) entirely in the
  JVM, then a per-query window takes top-k. At 100 TB this is one pass
  over the vectors with no shuffle except the final per-query top-k
  (bounded rows via TakeOrdered).
* **LSH-bucketed (sign-random-projection) search** — the scale path: each
  vector is assigned an 8-bit bucket from the signs of 8 fixed dimensions;
  search only touches the query's bucket (a pushed-down equality filter).
  This is the IVF-style trade of recall for a ~256x candidate reduction.

All float math is double-widened and written with the same reduction shape
in Spark and DuckDB so the oracle hash-matches at round(4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .relational import round_ieee
from ..plans.registry import load, load_spread, local_frame, prep, register

N_QUERIES = 5
TOP_K = 3
BUCKET_BITS = 8

#: Input ceiling for the all-pairs / per-pair-exact correctness
#: baselines.  These operators exist to VERIFY the approximate scale
#: paths (LSH banding, IVF, quantized/PQ codes, k-means bucketing) at
#: test scale — their work grows quadratically (all-pairs within an
#: LSH bucket, or per-query exact scoring of every corpus vector), so
#: silently running them on a production-size input would be a
#: scale-killer.  One million rows is ~3 orders of magnitude above any
#: driver/bench scale factor (sf1 embeddings = 20k rows) and still far
#: below where quadratic work becomes catastrophic, so the guard can
#: never trip in testing but always trips long before a 100 TB corpus.
ALLPAIRS_GUARD_ROWS = 1_000_000


class AllPairsScaleError(RuntimeError):
    """An O(n²)-by-intent correctness baseline refused an input too
    large for quadratic work; the message names the scale twin."""


def guard_allpairs(df: DataFrame, op: str, twin: str, limit=None) -> None:
    """Raise :class:`AllPairsScaleError` when ``df`` exceeds the
    all-pairs baseline ceiling, naming the production scale twin.

    The check is ``df.limit(limit + 1).count()`` — a CollectLimit that
    stops scanning as soon as ``limit + 1`` rows are found, so on a
    100 TB input it touches ~one partition's worth of data rather than
    counting the whole corpus before refusing.  Per the suite's
    no-silent-caps convention the guard REFUSES (it never samples or
    truncates): a baseline that quietly dropped rows would no longer
    verify anything."""
    if limit is None:
        limit = ALLPAIRS_GUARD_ROWS
    n = df.limit(limit + 1).count()
    if n > limit:
        raise AllPairsScaleError(
            f"{op}: input exceeds {limit:,} rows — this operator is an "
            f"all-pairs correctness baseline whose work grows "
            f"quadratically; at this scale run its production twin "
            f"`{twin}` instead"
        )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_prenormed(a, b, norm_a, norm_b):
    """Cosine with the norms precomputed per vector (n evaluations)
    instead of per pair (n^2) — identical float ops and order to
    :func:`cosine`, so results stay bit-equal to the oracle."""
    return _dot(a, b) / (norm_a * norm_b)


#: DuckDB L2 norm of an embedding list column (64 dims)
_DUCK_NORM = (
    "sqrt(list_aggregate(list_transform(range(1, 65), "
    "i -> CAST({c}[i] AS DOUBLE) * CAST({c}[i] AS DOUBLE)), 'sum'))"
)

#: norm guards usable inside oracle f-strings (cosine is undefined
#: for a zero vector; both engines exclude them identically)
#: zero-norm guard on the embedding column (one constant: the query
#: and corpus sides guard the SAME expression — two names would only
#: invite them to drift apart)
_EMB_NORM_GUARD = _DUCK_NORM.format(c="embedding")

_DUCK_COS = """
    list_aggregate(list_transform(range(1, 65),
        i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, 65),
        i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, 65),
        i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), 'sum')))
"""


@register(
    "similarity_bruteforce_topk",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe FROM embeddings
            WHERE vec_id < {N_QUERIES}
              AND {_EMB_NORM_GUARD} > 0
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id, c.label,
                   {_DUCK_COS} AS cos
            FROM q, (SELECT vec_id, embedding AS ce, label FROM embeddings
                     WHERE {_EMB_NORM_GUARD} > 0) c
            WHERE c.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, label,
                   floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rk
            FROM scored
        )
        SELECT query_id, neighbor_id, label, cosine, rk
        FROM ranked WHERE rk <= {TOP_K}
    """,
    description="brute-force cosine top-k (broadcast queries, JVM-side math)",
)
def similarity_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-k — the correctness baseline every approximate
    index (LSH, IVF, int8, PQ) is verified against.  Per-query exact
    scoring of the whole corpus: O(N_QUERIES × n) dot products, guarded
    so it can never silently run at production scale."""
    prep(spark)
    emb = load_spread(spark, sf_dir, "embeddings")
    guard_allpairs(emb, "similarity_bruteforce_topk", "similarity_ivf_topk")
    # zero-norm vectors are excluded on BOTH sides (cosine undefined;
    # an unguarded division crashes under ANSI mode — hostile-corpus
    # sweep finding, r9)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("qnorm"),
    ).filter(F.col("qnorm") > 0)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm(F.col("embedding")).alias("cnorm"),
        "label",
    ).filter(F.col("cnorm") > 0)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "label",
            cosine_prenormed(
                F.col("qe"), F.col("ce"), F.col("qnorm"), F.col("cnorm")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "label",
            round_ieee(F.col("cos")).alias("cosine"),
            "rk",
        )
    )


def bucket_column(col):
    """Sign-random-projection bucket from the signs of the first 8 dims."""
    bits = [
        F.when(F.element_at(col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(BUCKET_BITS)
    ]
    return sum(bits[1:], start=bits[0])


_DUCK_BUCKET = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(BUCKET_BITS)
)


@register(
    "similarity_lsh_buckets",
    oracle=f"""
        SELECT ({_DUCK_BUCKET}) AS bucket,
               count(*) AS n_vectors,
               CAST(sum(label) AS BIGINT) AS sum_label
        FROM embeddings
        GROUP BY 1
    """,
    description="sign-LSH bucket histogram (the IVF-style coarse quantizer)",
)
def similarity_lsh_buckets(spark, sf_dir):
    prep(spark)
    emb = load_spread(spark, sf_dir, "embeddings")
    return (
        emb.select(bucket_column(F.col("embedding")).alias("bucket"), "label")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("label").cast("bigint").alias("sum_label"),
        )
    )


@register(
    "similarity_lsh_topk",
    oracle=f"""
        WITH tagged AS (
            SELECT vec_id, label, embedding, ({_DUCK_BUCKET}) AS bucket
            FROM embeddings
        ),
        q AS (
            SELECT vec_id AS query_id, embedding AS qe, bucket FROM tagged
            WHERE vec_id < {N_QUERIES}
              AND {_EMB_NORM_GUARD} > 0
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   {_DUCK_COS} AS cos
            FROM q JOIN (SELECT vec_id, embedding AS ce, bucket FROM tagged
                         WHERE {_EMB_NORM_GUARD} > 0) c
              ON q.bucket = c.bucket AND c.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine, rk
        FROM (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """,
    description="LSH-bucketed approximate top-k (searches 1/256 of the data)",
)
def similarity_lsh_topk(spark, sf_dir):
    prep(spark)
    emb = load_spread(spark, sf_dir, "embeddings")
    tagged = emb.select(
        "vec_id",
        "label",
        "embedding",
        bucket_column(F.col("embedding")).alias("bucket"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    # zero-norm guard on BOTH sides (same rule as the bruteforce twin
    # and both oracles): a zero vector lands in bucket 255 (all sign
    # bits set) and 0/0 cosine ranks differently across engines
    q = tagged.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("nrm") > 0)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnorm"),
        "bucket",
    )
    c = tagged.filter(F.col("nrm") > 0).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cnorm"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_prenormed(
                F.col("qe"), F.col("ce"), F.col("qnorm"), F.col("cnorm")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", round_ieee(F.col("cos")).alias("cosine"), "rk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed search
# ---------------------------------------------------------------------------

IVF_K = 16
IVF_ITERS = 2
IVF_PROBES = 2
#: Lloyd's trains on the vectors with vec_id below this cap — a bounded,
#: deterministic sample (~32 MB at dim 64) pulled to the driver once via
#: Arrow, the FAISS deployment shape: train small and local, then
#: broadcast centroids and assign/search distributed. At the test scale
#: factors the cap exceeds the table, so training sees every vector.
IVF_TRAIN_CAP = 131_072
#: At or below this corpus size nlist is EXACTLY ``IVF_K`` — the regime
#: the SQL oracle states (16 centroids, 2 unrolled Lloyd's rounds).
#: Above it, nlist doubles with every corpus doubling (the FAISS sizing
#: rule: nlist grows ~O(N) here rather than sqrt(N) because the probed
#: scan per query costs IVF_PROBES * N / nlist — keeping cluster size
#: ~constant keeps per-query search cost ~constant while index build
#: stays one linear assignment pass). Trade-off, as FAISS documents:
#: larger nlist = faster probes but lower recall at fixed nprobe; the
#: cap bounds centroid-broadcast size (1024 * 64 doubles = 512 KB).
IVF_NLIST_BASE_N = 4096
IVF_NLIST_MAX = 1024


def ivf_nlist(n_vectors: int) -> int:
    """Corpus-size-adaptive cluster count (= IVF_K at oracle scales)."""
    import math

    if n_vectors <= IVF_NLIST_BASE_N:
        return IVF_K
    return min(
        IVF_NLIST_MAX,
        IVF_K * (1 << math.ceil(math.log2(n_vectors / IVF_NLIST_BASE_N))),
    )


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, 65), i -> "
        f"CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def _duck_sqdist(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, 65), i -> "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), 'sum')"
    )


def _duck_assign(src: str, cents: str, out: str) -> str:
    """One Lloyd assignment round: nearest centroid by the same expanded
    form the engine uses (``-2 x.c + |c|^2``), ties to the lowest
    cluster id (np.argmin picks the first minimum)."""
    return f"""
        {out} AS (
            SELECT vec_id, emb, cluster FROM (
                SELECT e.vec_id, e.emb, c.cluster,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY -2 * {_duck_dot("e.emb", "c.emb")}
                                    + {_duck_dot("c.emb", "c.emb")},
                                    c.cluster) AS rn
                FROM {src} e CROSS JOIN {cents} c
            ) WHERE rn = 1
        )"""


def _duck_recenter(assigned: str, prev: str, out: str) -> str:
    """Per-dimension mean recompute; a cluster that lost all members keeps
    its previous centroid (Spark starts from ``centroids.copy()``)."""
    return f"""
        {out}_m AS (
            SELECT cluster, i.i AS dim, avg(CAST(emb[i.i] AS DOUBLE)) AS m
            FROM {assigned}, UNNEST(range(1, 65)) AS i(i)
            GROUP BY cluster, i.i
        ),
        {out} AS (
            SELECT p.cluster,
                   coalesce(
                       (SELECT list(m ORDER BY dim) FROM {out}_m
                        WHERE {out}_m.cluster = p.cluster),
                       list_transform(p.emb, x -> CAST(x AS DOUBLE))
                   ) AS emb
            FROM {prev} p
        )"""


_IVF_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, embedding AS emb FROM embeddings
    ),
    et AS (
        SELECT vec_id, emb FROM e WHERE vec_id < {IVF_TRAIN_CAP}
    ),
    c0 AS (
        SELECT vec_id AS cluster,
               list_transform(emb, x -> CAST(x AS DOUBLE)) AS emb
        FROM et WHERE vec_id < {IVF_K}
    ),
    {_duck_assign("et", "c0", "a1")},
    {_duck_recenter("a1", "c0", "c1")},
    {_duck_assign("et", "c1", "a2")},
    {_duck_recenter("a2", "c1", "c2")},
    {_duck_assign("e", "c2", "a3")},
    q AS (
        SELECT vec_id AS query_id, emb AS qe FROM e
        WHERE vec_id < {N_QUERIES}
          AND {_DUCK_NORM.format(c="emb")} > 0
    ),
    probes AS (
        SELECT query_id, qe, cluster FROM (
            SELECT q.query_id, q.qe, c.cluster,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_duck_sqdist("c.emb", "q.qe")}, c.cluster
                   ) AS pr
            FROM q CROSS JOIN c2 c
        ) WHERE pr <= {IVF_PROBES}
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               {_duck_dot("p.qe", "a.emb")}
               / (sqrt({_duck_dot("p.qe", "p.qe")})
                  * sqrt({_duck_dot("a.emb", "a.emb")})) AS cos
        FROM probes p JOIN a3 a
          ON a.cluster = p.cluster AND a.vec_id <> p.query_id
        WHERE {_DUCK_NORM.format(c="a.emb")} > 0
    )
    SELECT query_id, neighbor_id, floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine, rk
    FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
    ) WHERE rk <= {TOP_K}
"""


def _assign_udf(centroids):
    """Arrow-vectorized nearest-centroid assignment. ``centroids`` is a
    (K, dim) numpy array broadcast by closure — exactly how IVF deploys:
    train small, broadcast, assign at scan speed."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign(embs):
        # (module-level `from __future__ import annotations` would turn
        # pd.Series hints into strings pandas_udf can't resolve)
        x = np.stack(embs.to_numpy())  # (n, dim) float32
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
        d = (
            -2.0 * (x.astype(np.float64) @ centroids.T)
            + (centroids * centroids).sum(axis=1)[None, :]
        )
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign


def train_ivf_centroids(spark, emb_df, k: int = IVF_K, iters: int = IVF_ITERS):
    """Deterministic Lloyd's on a bounded driver-side sample: init = the
    k lowest vec_ids, then ``iters`` rounds of assign + per-dimension
    mean, all in numpy. Training is the one part of IVF that should NOT
    be distributed: the sample is capped (``IVF_TRAIN_CAP`` vectors,
    ~32 MB over Arrow), the math is k x iters x sample FLOPs, and doing
    it locally replaces 2 x (pandas-UDF scan + posexplode + groupBy +
    collect) Spark rounds with zero jobs beyond the sample fetch.
    Assignment of the full table and the probed search stay distributed
    (the FAISS deployment shape). The nearest-centroid expression is the
    same expanded ``-2 x.c + |c|^2`` the distributed ``_assign_udf``
    uses, so the trained centroids are bit-compatible with the old
    distributed trainer at any SF where the cap covers the table."""
    import numpy as np

    from pyspark.sql import functions as F

    pdf = (
        emb_df.filter(F.col("vec_id") < IVF_TRAIN_CAP)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    vec_ids = pdf["vec_id"].to_numpy()
    centroids = x[vec_ids < k].copy()  # the k lowest vec_ids, in order
    for _ in range(iters):
        d = -2.0 * (x @ centroids.T) + (centroids * centroids).sum(axis=1)[
            None, :
        ]
        a = np.argmin(d, axis=1)
        new_c = centroids.copy()  # empty clusters keep their centroid
        for c in range(k):
            members = x[a == c]
            if len(members):
                new_c[c] = members.mean(axis=0)
        centroids = new_c
    return centroids


@register(
    "similarity_ivf_topk",
    oracle=_IVF_ORACLE,  # the full deterministic Lloyd's (init = k lowest
    # vec_ids, 2 unrolled iterations, argmin ties to lowest cluster) stated
    # in SQL; float-summation-order differences vs numpy only matter at
    # exact assignment-boundary ties, which the synthetic data avoids
    description="IVF ANN: deterministic k-means coarse quantizer, "
    "2-probe search (the FAISS-style scale path)",
)
def similarity_ivf_topk(spark, sf_dir):
    import numpy as np

    prep(spark)
    emb = load_spread(spark, sf_dir, "embeddings")
    # adaptive nlist (FAISS sizing): parquet-metadata count, then train.
    # At oracle scales (<= IVF_NLIST_BASE_N vectors) this is exactly
    # IVF_K, so the fixed 16-centroid SQL oracle stays the contract.
    nlist = ivf_nlist(emb.count())
    centroids = train_ivf_centroids(spark, emb, k=nlist)
    # cache: this lineage (arrow-UDF assignment over the full table) is
    # consumed three times — the query-row collect, the candidate join,
    # and the final execute; without the cache each re-runs the UDF scan
    assigned = emb.select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _assign_udf(centroids)(F.col("embedding")).alias("cluster"),
    ).cache()
    # queries probe their IVF_PROBES nearest centroids (zero-norm
    # queries excluded, same rule as the bruteforce twin and the
    # oracle; stable argsort = the oracle's ORDER BY sqdist, cluster
    # tie-break, the same rule the IVFPQ twin pins)
    queries = assigned.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("nrm") > 0)
    ).collect()
    probe_rows = []
    for q in queries:
        x = np.asarray(q.embedding, dtype=np.float64)
        d = ((centroids - x) ** 2).sum(axis=1)
        for c in np.argsort(d, kind="stable")[:IVF_PROBES]:
            probe_rows.append((q.vec_id, q.embedding, q.nrm, int(c)))
    probes = local_frame(
        spark,
        probe_rows,
        "query_id long, qe array<float>, qnorm double, cluster int",
    )
    scored = (
        assigned.filter(F.col("nrm") > 0)
        .join(F.broadcast(probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_prenormed(
                F.col("qe"), F.col("embedding"), F.col("qnorm"), F.col("nrm")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", round_ieee(F.col("cos")).alias("cosine"), "rk")
    )

# ---------------------------------------------------------------------------
# Int8 scalar quantization: the memory-compression path for ANN at scale
# ---------------------------------------------------------------------------

def _quantize_udf():
    """Arrow-vectorized symmetric int8 quantization: per-vector scale =
    max |x|, codes = ``floor(x / scale * 127 + 0.5)`` in [-127, 127].

    Bit-reproducible vs the SQL oracle BY CONSTRUCTION: the scale (max
    of exact |x| values) and the per-element divide/multiply/add/floor
    are elementwise IEEE double ops — numpy applies the identical
    operation sequence per element, and no summation-order freedom
    exists anywhere in the expression."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def qi8(embs):
        x = np.stack(embs.to_numpy()).astype(np.float64)
        s = np.abs(x).max(axis=1)
        codes = np.zeros(x.shape, dtype=np.int32)
        nz = s > 0
        codes[nz] = np.floor(x[nz] / s[nz, None] * 127.0 + 0.5).astype(
            np.int32
        )
        return pd.Series(list(codes))

    return qi8


def _int_dot_udf():
    """Arrow-vectorized EXACT integer dot product of int8-code arrays
    (fits int64 with 43 bits to spare: 64 * 127^2 < 2^21). Integer
    addition is associative, so the numpy kernel is bit-identical to
    any sequential SQL fold — quantized scoring has no float-order
    hazard at all."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def idot(a, b):
        av = np.stack(a.to_numpy()).astype(np.int64)
        bv = np.stack(b.to_numpy()).astype(np.int64)
        return pd.Series((av * bv).sum(axis=1))

    return idot


_DUCK_QDOT = (
    "list_aggregate(list_transform(range(1, 65), i -> "
    "CAST({a}[i] AS BIGINT) * {b}[i]), 'sum')"
)


@register(
    "similarity_quantized_topk",
    oracle=f"""
        WITH qz AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CASE WHEN s = 0 THEN 0
                            ELSE CAST(floor((CAST(x AS DOUBLE) / s) * 127.0 + 0.5)
                                      AS INTEGER) END) AS q
            FROM (
                SELECT vec_id, embedding,
                       list_aggregate(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE))), 'max') AS s
                FROM embeddings
            )
        ),
        qn AS (
            SELECT vec_id, q,
                   {_DUCK_QDOT.format(a="q", b="q")} AS nq
            FROM qz
        ),
        probes AS (
            SELECT vec_id AS query_id, q AS qq, nq AS qnq FROM qn
            WHERE vec_id < {N_QUERIES} AND nq > 0
        ),
        scored AS (
            SELECT p.query_id, c.vec_id AS neighbor_id,
                   CAST({_DUCK_QDOT.format(a="p.qq", b="c.q")} AS DOUBLE)
                   / (sqrt(CAST(p.qnq AS DOUBLE)) * sqrt(CAST(c.nq AS DOUBLE)))
                       AS qcos
            FROM probes p, qn c
            WHERE c.vec_id <> p.query_id AND c.nq > 0
        )
        SELECT query_id, neighbor_id,
               floor(qcos * 10000.0 + 0.5) / 10000.0 AS qcosine, rk
        FROM (
            SELECT query_id, neighbor_id, qcos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY qcos DESC, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """,
    description="int8 scalar-quantized cosine top-k (4x memory compression; "
    "exact-integer dot products)",
)
def similarity_quantized_topk(spark, sf_dir):
    """ANN over int8-quantized codes — the compression trade every
    at-scale vector store makes (FAISS SQ8 / ScaNN int8): 4x less
    memory and bandwidth than float32, integer dot products, cosine
    reconstructed from the exact int sums so the approximation error
    comes ONLY from quantization, never from float summation order.

    100 TB shape: quantization is a map-only scan (codes + one int
    norm per vector shuffle nothing); the query side is a broadcast;
    scoring streams corpus codes through an integer dot kernel. The
    int8 codes are what a production deployment would hold in memory —
    the float32 originals stay in cold storage."""
    prep(spark)
    emb = load_spread(spark, sf_dir, "embeddings")
    qi8 = _quantize_udf()
    idot = _int_dot_udf()
    # the cached code table IS the deployment model: int8 codes + int
    # norms resident in memory, float32 originals in cold storage; both
    # the probe collect and the scoring scan read it
    # the nq>0 filter sits ABOVE the cache boundary on purpose: inside
    # the cached subtree Catalyst pushes it below load_spread's
    # round-robin exchange, which makes both UDFs evaluate twice per
    # row (once under the exchange for the filter, once above for the
    # output — verified in the formatted plan); filtering the cached
    # table instead costs one in-memory predicate
    qn = (
        emb.select("vec_id", qi8(F.col("embedding")).alias("q"))
        .withColumn("nq", idot(F.col("q"), F.col("q")))
        .cache()
        .filter(F.col("nq") > 0)
    )
    probes = qn.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nq").alias("qnq"),
    )
    scored = (
        qn.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                idot(F.col("qq"), F.col("q")).cast("double")
                / (
                    F.sqrt(F.col("qnq").cast("double"))
                    * F.sqrt(F.col("nq").cast("double"))
                )
            ).alias("qcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            round_ieee(F.col("qcos")).alias("qcosine"),
            "rk",
        )
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep)
# ---------------------------------------------------------------------------


@register(
    "similarity_hard_negatives",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
            FROM embeddings WHERE vec_id < {N_QUERIES}
              AND {_EMB_NORM_GUARD} > 0
        ),
        scored AS (
            SELECT q.query_id, q.qlabel, c.vec_id AS neighbor_id,
                   c.label AS neg_label,
                   {_DUCK_COS} AS cos
            FROM q, (SELECT vec_id, embedding AS ce, label FROM embeddings
                     WHERE {_EMB_NORM_GUARD} > 0) c
            WHERE c.label <> q.qlabel
        ),
        ranked AS (
            SELECT query_id, qlabel, neighbor_id, neg_label,
                   floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rk
            FROM scored
        )
        SELECT query_id, qlabel, neighbor_id, neg_label, cosine, rk
        FROM ranked WHERE rk <= {TOP_K}
    """,
    description="hard-negative mining: per query, the top-k most-similar "
    "vectors carrying a DIFFERENT label (contrastive-training negatives)",
)
def similarity_hard_negatives(spark, sf_dir):
    """Contrastive-training data prep: for each query vector, the k
    nearest neighbors whose label DIFFERS from the query's — the
    "hard negatives" that dominate InfoNCE-style losses (near the
    query in embedding space but semantically wrong). Identical
    dataflow to ``similarity_bruteforce_topk`` — broadcast query set,
    JVM-side ``zip_with``/``aggregate`` dot products, per-query window
    top-k — with the disequality moved from vec_id to LABEL, which
    also prunes the candidate side before any scoring.

    100 TB shape: one scan of the vectors, no shuffle except the final
    per-query top-k (TOP_K rows per query survive each partition); the
    label filter evaluates in the same codegen stage as the dot
    product, so mismatching candidates cost one comparison.  Exact
    per-query scoring is still O(N_QUERIES × n); the guard routes
    oversized inputs to the quantized index (mine negatives from its
    candidate set with the same label disequality)."""
    prep(spark)
    emb = load_spread(spark, sf_dir, "embeddings")
    guard_allpairs(
        emb, "similarity_hard_negatives", "similarity_quantized_topk"
    )
    # zero-norm exclusion on both sides (see similarity_bruteforce_topk)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("qnorm"),
        F.col("label").alias("qlabel"),
    ).filter(F.col("qnorm") > 0)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm(F.col("embedding")).alias("cnorm"),
        F.col("label").alias("neg_label"),
    ).filter(F.col("cnorm") > 0)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("qlabel"))
        .select(
            "query_id",
            "qlabel",
            "neighbor_id",
            "neg_label",
            cosine_prenormed(
                F.col("qe"), F.col("ce"), F.col("qnorm"), F.col("cnorm")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "qlabel",
            "neighbor_id",
            "neg_label",
            round_ieee(F.col("cos")).alias("cosine"),
            "rk",
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: sub-vector codebooks + asymmetric
# distance computation — the highest-compression production index
# ---------------------------------------------------------------------------

#: PQ geometry: 64-dim vectors split into M subspaces of SUBDIM dims,
#: K centroids per subspace -> one BYTE per subspace, 8 bytes per
#: vector vs 256 for float32 (32x compression; int8 SQ is only 4x)
PQ_M = 8
PQ_SUBDIM = 8
PQ_K = 16

_DUCK_SUBDOT = (
    "list_aggregate(list_transform(range(1, {n}), d -> "
    "CAST({a} AS BIGINT) * {b}), 'sum')"
)



def _adc_udf(luts):
    """Shared ADC scoring kernel for the flat-PQ and IVFPQ queries:
    per Arrow batch, gather-sum each row's M codes through its query's
    broadcast (M, K) lookup table.  The qid column is converted once
    per batch; exact int64 throughout."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def adc(qid, codes):
        qa = qid.to_numpy()
        C = np.stack(codes.to_numpy()).astype(np.int64)
        out = np.zeros(len(C), dtype=np.int64)
        for q in np.unique(qa):
            sel = qa == q
            lut = luts[int(q)]
            out[sel] = lut[np.arange(PQ_M)[None, :], C[sel]].sum(axis=1)
        return pd.Series(out)

    return adc


def _probe_lut(pv, cb):
    """(M, K) table of subspace dot products between one query's int8
    codes and the PQ codebook — the asymmetric half of ADC."""
    return (pv.reshape(PQ_M, 1, PQ_SUBDIM) * cb).sum(axis=2)


@register(
    "similarity_pq_topk",
    # the whole pipeline is INTEGER-EXACT: PQ runs over the int8
    # scalar-quantized codes, so subspace L2 distances (code
    # assignment), reconstruction norms and the ADC dot products are
    # all exact BIGINT arithmetic — argmin ties break on centroid
    # index identically in both engines, and the only doubles are the
    # final cosine normalization on an identical expression tree
    oracle=f"""
        WITH qz AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CASE WHEN s = 0 THEN 0
                            ELSE CAST(floor((CAST(x AS DOUBLE) / s) * 127.0 + 0.5)
                                      AS INTEGER) END) AS q
            FROM (
                SELECT vec_id, embedding,
                       list_aggregate(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE))), 'max') AS s
                FROM embeddings
            )
        ),
        ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
        cb AS (
            SELECT ms.m, s.vec_id AS k,
                   s.q[ms.m*{PQ_SUBDIM}+1 : ms.m*{PQ_SUBDIM}+{PQ_SUBDIM}] AS c
            FROM ms, (SELECT vec_id, q FROM qz WHERE vec_id < {PQ_K}) s
        ),
        subs AS (
            SELECT z.vec_id, ms.m,
                   z.q[ms.m*{PQ_SUBDIM}+1 : ms.m*{PQ_SUBDIM}+{PQ_SUBDIM}] AS sub
            FROM qz z, ms
        ),
        dists AS (
            SELECT s.vec_id, s.m, c.k,
                   list_aggregate(list_transform(range(1, {PQ_SUBDIM + 1}),
                       d -> CAST(s.sub[d] - c.c[d] AS BIGINT)
                            * (s.sub[d] - c.c[d])), 'sum') AS d2
            FROM subs s JOIN cb c ON c.m = s.m
        ),
        codes AS (
            SELECT vec_id, m, k AS code
            FROM (SELECT vec_id, m, k,
                         row_number() OVER (PARTITION BY vec_id, m
                                            ORDER BY d2, k) AS rn
                  FROM dists)
            WHERE rn = 1
        ),
        recon AS (
            SELECT cd.vec_id,
                   CAST(sum({_DUCK_SUBDOT.format(n=PQ_SUBDIM + 1, a="c.c[d]", b="c.c[d]")})
                        AS BIGINT) AS rnorm
            FROM codes cd JOIN cb c ON c.m = cd.m AND c.k = cd.code
            GROUP BY cd.vec_id
        ),
        probes AS (
            SELECT vec_id AS query_id, q AS pq,
                   {_DUCK_QDOT.format(a="q", b="q")} AS pnorm
            FROM qz
            WHERE vec_id < {N_QUERIES}
              AND {_DUCK_QDOT.format(a="q", b="q")} > 0
        ),
        adc AS (
            SELECT p.query_id, cd.vec_id AS neighbor_id, p.pnorm,
                   CAST(sum({_DUCK_SUBDOT.format(n=PQ_SUBDIM + 1, a="p.pq[cd.m*" + str(PQ_SUBDIM) + " + d]", b="c.c[d]")})
                        AS BIGINT) AS score
            FROM probes p, codes cd
            JOIN cb c ON c.m = cd.m AND c.k = cd.code
            WHERE cd.vec_id <> p.query_id
            GROUP BY 1, 2, 3
        ),
        scored AS (
            SELECT a.query_id, a.neighbor_id,
                   CAST(a.score AS DOUBLE)
                   / (sqrt(CAST(a.pnorm AS DOUBLE))
                      * sqrt(CAST(r.rnorm AS DOUBLE))) AS pqcos
            FROM adc a JOIN recon r ON r.vec_id = a.neighbor_id
            WHERE r.rnorm > 0
        )
        SELECT query_id, neighbor_id,
               floor(pqcos * 10000.0 + 0.5) / 10000.0 AS pq_cosine, rk
        FROM (
            SELECT query_id, neighbor_id, pqcos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY pqcos DESC, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """,
    description="product-quantization ANN: 16-centroid codebook per "
    "8-dim subspace (sampled training set), byte codes, asymmetric "
    "distance computation via per-probe lookup tables — all in exact "
    "integer arithmetic over the int8-quantized corpus",
)
def similarity_pq_topk(spark, sf_dir):
    """PQ — the index family behind FAISS IVFPQ / ScaNN at the largest
    scales: each vector stored as ``PQ_M`` one-byte centroid ids (32x
    compression vs float32; the int8 path is 4x), scored WITHOUT
    reconstruction via asymmetric distance computation — per probe, a
    ``(M, K)`` lookup table of subspace dot products is built once and
    every corpus vector costs ``M`` table gathers.

    The codebook is the subspace slices of the first ``PQ_K`` corpus
    vectors (sampled-codebook PQ — the k-means-free variant; a trained
    codebook drops reconstruction error but needs the iterative path
    ``kmeans_embedding_clusters`` already demonstrates).  Everything is
    integer-exact over the int8 codes, so assignment argmin, ADC sums
    and norms carry NO float-order freedom (see oracle comment).

    100 TB shape: codebook = K x DIM ints collected once (the
    FAISS-train shape, like IVF's); encoding is a map-only scan
    emitting 8 bytes + one int norm per vector; probes and their LUTs
    broadcast; scoring streams codes through an integer gather kernel.
    The shuffle surface is exactly the top-k window — identical to the
    int8 path but at 8x less memory bandwidth."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    prep(spark)
    emb = load_spread(spark, sf_dir, "embeddings")
    qi8 = _quantize_udf()
    qn = emb.select("vec_id", qi8(F.col("embedding")).alias("q")).cache()
    # codebook: subspace slices of the first K codes (driver-side K x
    # DIM ints — the bounded FAISS-train collect, like IVF's).  The
    # probe set (vec_id < N_QUERIES <= PQ_K) is a PREFIX of the same
    # rows, so ONE collect serves both (saves a job + a scan).
    seeds = qn.filter(F.col("vec_id") < PQ_K).orderBy("vec_id").collect()
    cb = (
        np.array([r["q"] for r in seeds], dtype=np.int64)
        .reshape(PQ_K, PQ_M, PQ_SUBDIM)
        .transpose(1, 0, 2)
        .copy()
    )  # (M, K, SUBDIM)
    # per-subspace centroid self-dots: recon_norm = sum over m
    cb_norm = (cb * cb).sum(axis=2)  # (M, K)

    @pandas_udf("struct<codes: array<int>, rnorm: long>")
    def encode(qcol):
        X = (
            np.stack(qcol.to_numpy())
            .astype(np.int64)
            .reshape(-1, PQ_M, PQ_SUBDIM)
        )
        # (B, M, K) exact integer L2^2; argmin takes the FIRST minimum,
        # i.e. the smallest centroid index — the oracle's tie-break
        diff = X[:, :, None, :] - cb[None, :, :, :]
        codes = (diff * diff).sum(axis=3).argmin(axis=2)
        rnorm = cb_norm[np.arange(PQ_M)[None, :], codes].sum(axis=1)
        return pd.DataFrame(
            {"codes": list(codes.astype(np.int32)), "rnorm": rnorm}
        )

    coded = qn.select(
        "vec_id", encode(F.col("q")).alias("e")
    ).select("vec_id", "e.codes", "e.rnorm")

    # probes: full int8 vectors (asymmetric side), LUTs built driver-side
    assert N_QUERIES <= PQ_K  # prefix reuse contract
    probe_rows = [r for r in seeds if r["vec_id"] < N_QUERIES]
    luts, pnorms = {}, {}
    for r in probe_rows:
        pv = np.array(r["q"], dtype=np.int64)
        pn = int((pv * pv).sum())
        if pn <= 0:
            continue
        luts[int(r["vec_id"])] = _probe_lut(pv, cb)  # (M, K)
        pnorms[int(r["vec_id"])] = pn

    adc = _adc_udf(luts)  # shared ADC kernel (same as IVFPQ)

    probes_df = local_frame(
        spark,
        [(int(q), int(n)) for q, n in sorted(pnorms.items())],
        "query_id long, pnorm long",
    )
    scored = (
        coded.filter(F.col("rnorm") > 0)
        .join(F.broadcast(probes_df), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                adc(F.col("query_id"), F.col("codes")).cast("double")
                / (
                    F.sqrt(F.col("pnorm").cast("double"))
                    * F.sqrt(F.col("rnorm").cast("double"))
                )
            ).alias("pqcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("pqcos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            round_ieee(F.col("pqcos")).alias("pq_cosine"),
            "rk",
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation recall: how much ANN quality survives dim cuts
# ---------------------------------------------------------------------------

#: leading dimensions kept by the truncated index (matryoshka-style
#: prefix truncation: 64 -> 16 dims = 4x memory/compute cut)
MRL_DIMS = 16

_DUCK_COS16 = f"""
    list_aggregate(list_transform(range(1, {MRL_DIMS + 1}),
        i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, {MRL_DIMS + 1}),
        i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, {MRL_DIMS + 1}),
        i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), 'sum')))
"""


@register(
    "similarity_matryoshka_recall",
    oracle=f"""
        WITH ok AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE {_EMB_NORM_GUARD} > 0
              AND sqrt(list_aggregate(list_transform(range(1, {MRL_DIMS + 1}),
                  i -> CAST(embedding[i] AS DOUBLE)
                       * CAST(embedding[i] AS DOUBLE)), 'sum')) > 0
        ),
        q AS (
            SELECT vec_id AS query_id, embedding AS qe FROM ok
            WHERE vec_id < {N_QUERIES}
        ),
        c AS (SELECT vec_id, embedding AS ce FROM ok),
        full_rk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY ({_DUCK_COS}) DESC, c.vec_id) AS rk
                FROM q, c WHERE c.vec_id <> q.query_id
            ) WHERE rk <= {TOP_K}
        ),
        trunc_rk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY ({_DUCK_COS16}) DESC, c.vec_id) AS rk
                FROM q, c WHERE c.vec_id <> q.query_id
            ) WHERE rk <= {TOP_K}
        )
        SELECT q.query_id,
               CAST({TOP_K} AS BIGINT) AS k,
               CAST(COALESCE(o.n, 0) AS BIGINT) AS n_overlap,
               floor(COALESCE(o.n, 0) * 1.0 / {TOP_K} * 10000.0 + 0.5)
                   / 10000.0 AS recall
        FROM q LEFT JOIN (
            SELECT f.query_id, count(*) AS n
            FROM full_rk f JOIN trunc_rk t
              ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
            GROUP BY f.query_id
        ) o ON q.query_id = o.query_id
    """,
    description=f"matryoshka evaluation: recall@{TOP_K} of a "
    f"{MRL_DIMS}-dim prefix-truncated index against the full "
    f"64-dim exact top-k",
)
def similarity_matryoshka_recall(spark, sf_dir):
    """Matryoshka-representation evaluation — the decision query run
    before cutting an embedding index's dimensionality: rank the same
    probe set against the corpus twice (full 64 dims, and the leading
    ``MRL_DIMS`` prefix — MRL-trained embeddings front-load
    information precisely so this works) and report per-query overlap
    of the two top-k sets.  Recall here is a measured quantity, not a
    promise: whether a 4x memory/compute cut is acceptable is read off
    this table.

    Plan shape: ONE corpus scan feeds both rankings (the truncated
    vector is a ``slice`` of the full one — no second materialization);
    both per-query top-k's are window row_numbers over the broadcast
    probe set, joined on (query, neighbor) and counted.  Exact scoring
    of the corpus per probe is the evaluation's point, so the all-pairs
    guard applies: at production scale run it over a bounded sample."""
    prep(spark)
    emb = load_spread(spark, sf_dir, "embeddings")
    guard_allpairs(
        emb,
        "similarity_matryoshka_recall",
        "similarity_matryoshka_recall over a bounded corpus sample",
    )
    # both rankings divide by a norm, so zero-norm vectors (full OR
    # prefix) are excluded on both sides — cosine is undefined there
    # and an unguarded division crashes under ANSI mode (hostile-
    # corpus sweep finding, r9)
    ok = (_norm(F.col("embedding")) > 0) & (
        _norm(F.slice(F.col("embedding"), 1, MRL_DIMS)) > 0
    )
    # norms precomputed per VECTOR (cosine_prenormed is bit-identical
    # to cosine), not per pair: the n^2 scoring stage then does one dot
    # product per ranking instead of re-aggregating both 64-dim norms
    # for every pair
    q = emb.filter(F.col("vec_id") < N_QUERIES).filter(ok).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("qnorm"),
        _norm(F.slice(F.col("embedding"), 1, MRL_DIMS)).alias("qnorm16"),
    )
    c = emb.filter(ok).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm(F.col("embedding")).alias("cnorm"),
        _norm(F.slice(F.col("embedding"), 1, MRL_DIMS)).alias("cnorm16"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    qe16 = F.slice(F.col("qe"), 1, MRL_DIMS)
    ce16 = F.slice(F.col("ce"), 1, MRL_DIMS)
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_prenormed(
            F.col("qe"), F.col("ce"), F.col("qnorm"), F.col("cnorm")
        ).alias("cos_full"),
        cosine_prenormed(
            qe16, ce16, F.col("qnorm16"), F.col("cnorm16")
        ).alias("cos_trunc"),
    )
    w_full = Window.partitionBy("query_id").orderBy(
        F.desc("cos_full"), F.asc("neighbor_id")
    )
    w_trunc = Window.partitionBy("query_id").orderBy(
        F.desc("cos_trunc"), F.asc("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w_full).alias("rk_full"),
        F.row_number().over(w_trunc).alias("rk_trunc"),
    )
    overlap = (
        ranked.filter(
            (F.col("rk_full") <= TOP_K) & (F.col("rk_trunc") <= TOP_K)
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        q.select("query_id")
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.lit(TOP_K).cast("bigint").alias("k"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_overlap"),
            round_ieee(
                F.coalesce(F.col("n"), F.lit(0)) * F.lit(1.0) / F.lit(TOP_K)
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# IVFPQ: coarse-quantizer pruning composed with PQ ADC scoring
# ---------------------------------------------------------------------------

#: integer L2^2 between two int8-code lists (64 dims) in DuckDB
_DUCK_QL2 = (
    "list_aggregate(list_transform(range(1, 65), d -> "
    "CAST({a}[d] - {b}[d] AS BIGINT) * ({a}[d] - {b}[d])), 'sum')"
)


@register(
    "similarity_ivfpq_topk",
    # same integer-exact discipline as similarity_pq_topk: coarse
    # assignment, probe selection, code assignment, recon norms and ADC
    # sums are all exact BIGINT arithmetic over the int8 codes; argmin
    # ties break on the lower centroid/cluster index in both engines,
    # and the only doubles are the final cosine normalization on an
    # identical expression tree
    oracle=f"""
        WITH qz AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CASE WHEN s = 0 THEN 0
                            ELSE CAST(floor((CAST(x AS DOUBLE) / s) * 127.0 + 0.5)
                                      AS INTEGER) END) AS q
            FROM (
                SELECT vec_id, embedding,
                       list_aggregate(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE))), 'max') AS s
                FROM embeddings
            )
        ),
        ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
        cb AS (
            SELECT ms.m, s.vec_id AS k,
                   s.q[ms.m*{PQ_SUBDIM}+1 : ms.m*{PQ_SUBDIM}+{PQ_SUBDIM}] AS c
            FROM ms, (SELECT vec_id, q FROM qz WHERE vec_id < {PQ_K}) s
        ),
        coarse AS (
            SELECT vec_id AS ck, q AS cq FROM qz WHERE vec_id < {IVF_K}
        ),
        assigned AS (
            SELECT vec_id, ck AS cluster FROM (
                SELECT z.vec_id, c.ck,
                       row_number() OVER (PARTITION BY z.vec_id
                           ORDER BY {_DUCK_QL2.format(a="z.q", b="c.cq")}, c.ck)
                           AS rn
                FROM qz z, coarse c
            ) WHERE rn = 1
        ),
        subs AS (
            SELECT z.vec_id, ms.m,
                   z.q[ms.m*{PQ_SUBDIM}+1 : ms.m*{PQ_SUBDIM}+{PQ_SUBDIM}] AS sub
            FROM qz z, ms
        ),
        dists AS (
            SELECT s.vec_id, s.m, c.k,
                   list_aggregate(list_transform(range(1, {PQ_SUBDIM + 1}),
                       d -> CAST(s.sub[d] - c.c[d] AS BIGINT)
                            * (s.sub[d] - c.c[d])), 'sum') AS d2
            FROM subs s JOIN cb c ON c.m = s.m
        ),
        codes AS (
            SELECT vec_id, m, k AS code
            FROM (SELECT vec_id, m, k,
                         row_number() OVER (PARTITION BY vec_id, m
                                            ORDER BY d2, k) AS rn
                  FROM dists)
            WHERE rn = 1
        ),
        recon AS (
            SELECT cd.vec_id,
                   CAST(sum({_DUCK_SUBDOT.format(n=PQ_SUBDIM + 1, a="c.c[d]", b="c.c[d]")})
                        AS BIGINT) AS rnorm
            FROM codes cd JOIN cb c ON c.m = cd.m AND c.k = cd.code
            GROUP BY cd.vec_id
        ),
        probes AS (
            SELECT vec_id AS query_id, q AS pq,
                   {_DUCK_QDOT.format(a="q", b="q")} AS pnorm
            FROM qz
            WHERE vec_id < {N_QUERIES}
              AND {_DUCK_QDOT.format(a="q", b="q")} > 0
        ),
        probe_clusters AS (
            SELECT query_id, cluster FROM (
                SELECT p.query_id, c.ck AS cluster,
                       row_number() OVER (PARTITION BY p.query_id
                           ORDER BY {_DUCK_QL2.format(a="p.pq", b="c.cq")}, c.ck)
                           AS rn
                FROM probes p, coarse c
            ) WHERE rn <= {IVF_PROBES}
        ),
        adc AS (
            SELECT p.query_id, cd.vec_id AS neighbor_id, p.pnorm,
                   CAST(sum({_DUCK_SUBDOT.format(n=PQ_SUBDIM + 1, a="p.pq[cd.m*" + str(PQ_SUBDIM) + " + d]", b="c.c[d]")})
                        AS BIGINT) AS score
            FROM probes p
            JOIN probe_clusters pc ON pc.query_id = p.query_id
            JOIN assigned a ON a.cluster = pc.cluster
            JOIN codes cd ON cd.vec_id = a.vec_id
            JOIN cb c ON c.m = cd.m AND c.k = cd.code
            WHERE cd.vec_id <> p.query_id
            GROUP BY 1, 2, 3
        ),
        scored AS (
            SELECT a.query_id, a.neighbor_id,
                   CAST(a.score AS DOUBLE)
                   / (sqrt(CAST(a.pnorm AS DOUBLE))
                      * sqrt(CAST(r.rnorm AS DOUBLE))) AS pqcos
            FROM adc a JOIN recon r ON r.vec_id = a.neighbor_id
            WHERE r.rnorm > 0
        )
        SELECT query_id, neighbor_id,
               floor(pqcos * 10000.0 + 0.5) / 10000.0 AS pq_cosine, rk
        FROM (
            SELECT query_id, neighbor_id, pqcos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY pqcos DESC, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """,
    description=f"IVFPQ ANN: {IVF_K}-list coarse quantizer prunes the "
    f"corpus to {IVF_PROBES} probed lists per query, then PQ codes are "
    "scored by integer-exact asymmetric distance computation — the "
    "FAISS composition for billion-vector indexes",
)
def similarity_ivfpq_topk(spark, sf_dir):
    """IVFPQ — the genuine FAISS shape for the largest corpora: an
    inverted-file coarse quantizer partitions the corpus into lists, a
    query probes only its ``IVF_PROBES`` nearest lists, and ONLY those
    lists' PQ codes are scored by asymmetric distance computation.
    ``similarity_ivf_topk`` and ``similarity_pq_topk`` each demonstrate
    one half; this composes them so per-probe work drops from
    O(corpus) (flat PQ) to O(corpus x probes / nlist).

    Both quantizers are the sampled (k-means-free) variants so the
    whole pipeline stays integer-exact over the int8 codes: coarse
    centroids = the first ``IVF_K`` corpus codes, PQ codebook = the
    subspace slices of the first ``PQ_K`` codes (the trained-centroid
    path is demonstrated by ``similarity_ivf_topk`` /
    ``kmeans_embedding_clusters``).  Codes are stored as-is rather
    than as residuals (FAISS ``by_residual=False``): residual encoding
    would reintroduce float centroids into the code path and break the
    exact-integer oracle discipline.

    100 TB shape: ONE map-only scan assigns cluster + PQ code + recon
    norm per vector (coarse 16x64 ints and codebook 16x64 ints live in
    the UDF closure — the broadcast FAISS-train shape); the probe table
    (queries x probed lists) broadcasts into a join keyed on the
    cluster id, so each query scores only its probed lists; the only
    shuffle is the final per-query top-k window, over candidates
    already pruned ~nlist/probes-fold.  With ``ivf_nlist`` sizing at
    production scale the pruning fraction holds as the corpus grows."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    prep(spark)
    emb = load_spread(spark, sf_dir, "embeddings")
    qi8 = _quantize_udf()
    qn = emb.select("vec_id", qi8(F.col("embedding")).alias("q")).cache()
    # one bounded driver collect seeds BOTH quantizers (K x DIM ints)
    seeds = (
        qn.filter(F.col("vec_id") < max(PQ_K, IVF_K))
        .orderBy("vec_id")
        .collect()
    )
    seed_arr = np.array([r["q"] for r in seeds], dtype=np.int64)
    coarse = seed_arr[:IVF_K].copy()  # (K, DIM)
    cb = (
        seed_arr[:PQ_K]
        .reshape(PQ_K, PQ_M, PQ_SUBDIM)
        .transpose(1, 0, 2)
        .copy()
    )  # (M, K, SUBDIM)
    cb_norm = (cb * cb).sum(axis=2)  # (M, K)

    @pandas_udf("struct<cluster: int, codes: array<int>, rnorm: long>")
    def encode(qcol):
        Xf = np.stack(qcol.to_numpy()).astype(np.int64)  # (B, DIM)
        # coarse assignment: exact integer L2^2, first-min = lowest ck
        dc = ((Xf[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
        cluster = dc.argmin(axis=1)
        X = Xf.reshape(-1, PQ_M, PQ_SUBDIM)
        diff = X[:, :, None, :] - cb[None, :, :, :]
        codes = (diff * diff).sum(axis=3).argmin(axis=2)
        rnorm = cb_norm[np.arange(PQ_M)[None, :], codes].sum(axis=1)
        return pd.DataFrame(
            {
                "cluster": pd.Series(cluster.astype(np.int32)),
                "codes": list(codes.astype(np.int32)),
                "rnorm": rnorm,
            }
        )

    coded = qn.select("vec_id", encode(F.col("q")).alias("e")).select(
        "vec_id", "e.cluster", "e.codes", "e.rnorm"
    )

    # probes: LUTs driver-side (N_QUERIES x M x K ints), probed lists
    # by exact integer L2 to the coarse centroids (stable sort = the
    # oracle's ORDER BY l2, ck tie-break).  The probe rows are a prefix
    # of the seed collect — no second job.
    assert N_QUERIES <= max(PQ_K, IVF_K)  # prefix reuse contract
    probe_rows = [r for r in seeds if r["vec_id"] < N_QUERIES]
    luts, probe_pairs = {}, []
    for r in probe_rows:
        pv = np.array(r["q"], dtype=np.int64)
        pn = int((pv * pv).sum())
        if pn <= 0:
            continue
        qid = int(r["vec_id"])
        luts[qid] = _probe_lut(pv, cb)
        dc = ((coarse - pv[None, :]) ** 2).sum(axis=1)
        for c in np.argsort(dc, kind="stable")[:IVF_PROBES]:
            probe_pairs.append((qid, int(c), pn))

    probes_df = local_frame(
        spark, probe_pairs, "query_id long, cluster int, pnorm long"
    )
    adc = _adc_udf(luts)
    scored = (
        coded.filter(F.col("rnorm") > 0)
        .join(F.broadcast(probes_df), "cluster")  # the IVF pruning join
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                adc(F.col("query_id"), F.col("codes")).cast("double")
                / (
                    F.sqrt(F.col("pnorm").cast("double"))
                    * F.sqrt(F.col("rnorm").cast("double"))
                )
            ).alias("pqcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("pqcos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            round_ieee(F.col("pqcos")).alias("pq_cosine"),
            "rk",
        )
    )


# ---------------------------------------------------------------------------
# IVFPQ with RESIDUAL encoding (FAISS by_residual=True) — staged r10
# ---------------------------------------------------------------------------

#: integer L2^2 over one SUBDIM-slice pair in DuckDB (1-indexed lists)
_DUCK_RL2 = (
    f"list_aggregate(list_transform(range(1, {PQ_SUBDIM + 1}), d -> "
    "CAST({a}[d] - {b}[d] AS BIGINT) * ({a}[d] - {b}[d])), 'sum')"
)

#: the residual-IVFPQ oracle: the ivfpq oracle with the PQ stage moved
#: onto RESIDUALS — codebook entries are (seed - its coarse centroid)
#: slices, every vector encodes its own residual, reconstruction is
#: centroid + decoded residual, and ADC scores the probe against that
#: reconstruction.  Still exact BIGINT end to end: residual components
#: are differences of int8 codes (|r| <= 254), so every sum fits int64
#: with the same headroom argument as the flat-PQ oracle.
IVFPQ_RESIDUAL_ORACLE = f"""
        WITH qz AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CASE WHEN s = 0 THEN 0
                            ELSE CAST(floor((CAST(x AS DOUBLE) / s) * 127.0 + 0.5)
                                      AS INTEGER) END) AS q
            FROM (
                SELECT vec_id, embedding,
                       list_aggregate(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE))), 'max') AS s
                FROM embeddings
            )
        ),
        ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
        coarse AS (
            SELECT vec_id AS ck, q AS cq FROM qz WHERE vec_id < {IVF_K}
        ),
        assigned AS (
            SELECT vec_id, ck AS cluster FROM (
                SELECT z.vec_id, c.ck,
                       row_number() OVER (PARTITION BY z.vec_id
                           ORDER BY {_DUCK_QL2.format(a="z.q", b="c.cq")}, c.ck)
                           AS rn
                FROM qz z, coarse c
            ) WHERE rn = 1
        ),
        rcb AS (
            SELECT ms.m, s.vec_id AS k,
                   list_transform(range(1, {PQ_SUBDIM + 1}), d ->
                       s.q[ms.m*{PQ_SUBDIM}+d] - co.cq[ms.m*{PQ_SUBDIM}+d])
                       AS c
            FROM ms,
                 (SELECT z.vec_id, z.q, a.cluster
                  FROM qz z JOIN assigned a ON a.vec_id = z.vec_id
                  WHERE z.vec_id < {PQ_K}) s
                 JOIN coarse co ON co.ck = s.cluster
        ),
        resid AS (
            SELECT z.vec_id, ms.m,
                   list_transform(range(1, {PQ_SUBDIM + 1}), d ->
                       z.q[ms.m*{PQ_SUBDIM}+d] - co.cq[ms.m*{PQ_SUBDIM}+d])
                       AS sub
            FROM qz z
            JOIN assigned a ON a.vec_id = z.vec_id
            JOIN coarse co ON co.ck = a.cluster, ms
        ),
        dists AS (
            SELECT r.vec_id, r.m, c.k,
                   {_DUCK_RL2.format(a="r.sub", b="c.c")} AS d2
            FROM resid r JOIN rcb c ON c.m = r.m
        ),
        codes AS (
            SELECT vec_id, m, k AS code
            FROM (SELECT vec_id, m, k,
                         row_number() OVER (PARTITION BY vec_id, m
                                            ORDER BY d2, k) AS rn
                  FROM dists)
            WHERE rn = 1
        ),
        recon AS (
            SELECT cd.vec_id,
                   CAST(sum({_DUCK_SUBDOT.format(
                       n=PQ_SUBDIM + 1,
                       a="(co.cq[cd.m*" + str(PQ_SUBDIM) + "+d] + rc.c[d])",
                       b="(co.cq[cd.m*" + str(PQ_SUBDIM) + "+d] + rc.c[d])",
                   )}) AS BIGINT) AS rnorm
            FROM codes cd
            JOIN rcb rc ON rc.m = cd.m AND rc.k = cd.code
            JOIN assigned a ON a.vec_id = cd.vec_id
            JOIN coarse co ON co.ck = a.cluster
            GROUP BY cd.vec_id
        ),
        probes AS (
            SELECT vec_id AS query_id, q AS pq,
                   {_DUCK_QDOT.format(a="q", b="q")} AS pnorm
            FROM qz
            WHERE vec_id < {N_QUERIES}
              AND {_DUCK_QDOT.format(a="q", b="q")} > 0
        ),
        probe_clusters AS (
            SELECT query_id, cluster FROM (
                SELECT p.query_id, c.ck AS cluster,
                       row_number() OVER (PARTITION BY p.query_id
                           ORDER BY {_DUCK_QL2.format(a="p.pq", b="c.cq")}, c.ck)
                           AS rn
                FROM probes p, coarse c
            ) WHERE rn <= {IVF_PROBES}
        ),
        adc AS (
            SELECT p.query_id, cd.vec_id AS neighbor_id, p.pnorm,
                   CAST(sum({_DUCK_SUBDOT.format(
                       n=PQ_SUBDIM + 1,
                       a="p.pq[cd.m*" + str(PQ_SUBDIM) + " + d]",
                       b="(co.cq[cd.m*" + str(PQ_SUBDIM) + "+d] + rc.c[d])",
                   )}) AS BIGINT) AS score
            FROM probes p
            JOIN probe_clusters pc ON pc.query_id = p.query_id
            JOIN assigned a ON a.cluster = pc.cluster
            JOIN codes cd ON cd.vec_id = a.vec_id
            JOIN rcb rc ON rc.m = cd.m AND rc.k = cd.code
            JOIN coarse co ON co.ck = a.cluster
            WHERE cd.vec_id <> p.query_id
            GROUP BY 1, 2, 3
        ),
        scored AS (
            SELECT a.query_id, a.neighbor_id,
                   CAST(a.score AS DOUBLE)
                   / (sqrt(CAST(a.pnorm AS DOUBLE))
                      * sqrt(CAST(r.rnorm AS DOUBLE))) AS pqcos
            FROM adc a JOIN recon r ON r.vec_id = a.neighbor_id
            WHERE r.rnorm > 0
        )
        SELECT query_id, neighbor_id,
               floor(pqcos * 10000.0 + 0.5) / 10000.0 AS pq_cosine, rk
        FROM (
            SELECT query_id, neighbor_id, pqcos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY pqcos DESC, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
"""


@register("similarity_ivfpq_residual_topk", oracle=IVFPQ_RESIDUAL_ORACLE)
def similarity_ivfpq_residual_topk(spark, sf_dir):
    """IVFPQ with RESIDUAL encoding — FAISS ``by_residual=True``, the
    default production composition ``similarity_ivfpq_topk`` deferred
    (its docstring documents why): each vector PQ-encodes ``x - c`` —
    its offset from its coarse centroid — instead of ``x`` itself.
    Centering each list's vectors around its centroid shrinks the
    value range the codebook must cover, so the same code budget
    spends its resolution on the within-list structure (FAISS IVFADC,
    Jégou et al. 2011 §III).

    The integer-exact discipline HOLDS through residuals — this is the
    insight that unblocks the variant: coarse centroids are int8-code
    vectors, so residuals are integer vectors (|r| <= 254), the
    residual codebook (sampled from the first PQ_K seed residuals) is
    integer, reconstruction ``c + r_hat`` is integer, and both rnorm
    and the ADC sum stay exact BIGINT; the only doubles remain the
    final cosine normalization, identical in both engines.

    100 TB shape: identical to similarity_ivfpq_topk — ONE map-only
    encode scan (coarse + residual codebook in the UDF closure =
    broadcast), probe table broadcast into the cluster-keyed pruning
    join carrying the precomputed query-centroid dot (so ADC needs
    only the residual LUT gather), one final top-k window over the
    pruned candidates.  Residual encoding adds zero extra exchanges:
    the centroid add folds into the same encode pass.

    Reference anchor: composes the scan/score staging the reference
    pipelines via its sequencer (``encryption_sequencer.cpp`` staging
    discipline) — cited for parity bookkeeping, architecture is
    Spark-native."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    prep(spark)
    emb = load_spread(spark, sf_dir, "embeddings")
    qi8 = _quantize_udf()
    qn = emb.select("vec_id", qi8(F.col("embedding")).alias("q")).cache()
    # one bounded driver collect seeds coarse + residual codebooks
    seeds = (
        qn.filter(F.col("vec_id") < max(PQ_K, IVF_K))
        .orderBy("vec_id")
        .collect()
    )
    seed_arr = np.array([r["q"] for r in seeds], dtype=np.int64)
    coarse = seed_arr[:IVF_K].copy()  # (K, DIM)
    # assign the PQ seeds to coarse lists, build the RESIDUAL codebook
    dseed = ((seed_arr[:PQ_K, None, :] - coarse[None, :, :]) ** 2).sum(
        axis=2
    )
    seed_cl = dseed.argmin(axis=1)  # first-min = lowest ck, ties match SQL
    rseed = seed_arr[:PQ_K] - coarse[seed_cl]  # (PQ_K, DIM) residuals
    rcb = (
        rseed.reshape(PQ_K, PQ_M, PQ_SUBDIM).transpose(1, 0, 2).copy()
    )  # (M, K, SUBDIM)

    @pandas_udf("struct<cluster: int, codes: array<int>, rnorm: long>")
    def encode(qcol):
        Xf = np.stack(qcol.to_numpy()).astype(np.int64)  # (B, DIM)
        dc = ((Xf[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
        cluster = dc.argmin(axis=1)
        resid = (Xf - coarse[cluster]).reshape(-1, PQ_M, PQ_SUBDIM)
        diff = resid[:, :, None, :] - rcb[None, :, :, :]
        codes = (diff * diff).sum(axis=3).argmin(axis=2)
        # reconstruction = centroid + decoded residual, exact int64
        rhat = rcb[np.arange(PQ_M)[None, :], codes].reshape(
            len(Xf), PQ_M * PQ_SUBDIM
        )
        recon = coarse[cluster] + rhat
        rnorm = (recon * recon).sum(axis=1)
        return pd.DataFrame(
            {
                "cluster": pd.Series(cluster.astype(np.int32)),
                "codes": list(codes.astype(np.int32)),
                "rnorm": rnorm,
            }
        )

    coded = qn.select("vec_id", encode(F.col("q")).alias("e")).select(
        "vec_id", "e.cluster", "e.codes", "e.rnorm"
    )

    # probes: residual LUTs driver-side; each probe pair additionally
    # carries dot(query, centroid) so the executor-side ADC gather
    # completes the reconstruction dot without touching the centroid
    assert N_QUERIES <= max(PQ_K, IVF_K)  # prefix reuse contract
    probe_rows = [r for r in seeds if r["vec_id"] < N_QUERIES]
    luts, probe_pairs = {}, []
    for r in probe_rows:
        pv = np.array(r["q"], dtype=np.int64)
        pn = int((pv * pv).sum())
        if pn <= 0:
            continue
        qid = int(r["vec_id"])
        luts[qid] = _probe_lut(pv, rcb)  # residual half of the ADC dot
        dc = ((coarse - pv[None, :]) ** 2).sum(axis=1)
        for c in np.argsort(dc, kind="stable")[:IVF_PROBES]:
            qcdot = int(coarse[int(c)] @ pv)  # centroid half
            probe_pairs.append((qid, int(c), pn, qcdot))

    probes_df = local_frame(
        spark, probe_pairs, "query_id long, cluster int, pnorm long, qcdot long"
    )
    adc = _adc_udf(luts)
    scored = (
        coded.filter(F.col("rnorm") > 0)
        .join(F.broadcast(probes_df), "cluster")  # the IVF pruning join
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                (
                    F.col("qcdot")
                    + adc(F.col("query_id"), F.col("codes"))
                ).cast("double")
                / (
                    F.sqrt(F.col("pnorm").cast("double"))
                    * F.sqrt(F.col("rnorm").cast("double"))
                )
            ).alias("pqcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("pqcos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            round_ieee(F.col("pqcos")).alias("pq_cosine"),
            "rk",
        )
    )
