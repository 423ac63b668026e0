"""Similarity-search operators vs independent pure-Python twins.

Crafted integer-valued embeddings make every dot product and norm-square
exact in IEEE double regardless of summation order, so the Spark
results must match the twin bit-for-bit (after the shared round-4),
not just approximately. Covers the brute-force ranking with its
neighbor_id tie-break, the sign-LSH bucket assignment, and the
bucketed top-k's candidate restriction.
"""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.similarity import (
    BUCKET_BITS,
    N_QUERIES,
    TOP_K,
    similarity_bruteforce_topk,
    similarity_lsh_buckets,
    similarity_lsh_topk,
)

DIM = 64
N_VECS = 20


def _make_vectors() -> list[list[float]]:
    """Deterministic integer-valued vectors with controlled bucket bits."""
    vecs = []
    for i in range(N_VECS):
        v = []
        for j in range(DIM):
            # first 8 dims control the LSH bucket: cluster i % 4 fixes the
            # sign pattern so buckets repeat; remaining dims vary by (i, j)
            if j < BUCKET_BITS:
                sign = 1 if ((i % 4) >> (j % 4)) & 1 else -1
                v.append(float(sign * (1 + (i + j) % 3)))
            else:
                v.append(float(((i * 7 + j * 3) % 5) - 2))
        vecs.append(v)
    return vecs


VECS = _make_vectors()
LABELS = [i % 3 for i in range(N_VECS)]


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sim_corpus")
    table = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(VECS, pa.list_(pa.float32())),
            "label": pa.array(LABELS, pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def _bucket(v: list[float]) -> int:
    return sum(1 << i for i in range(BUCKET_BITS) if v[i] >= 0)


def _cos(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def _round4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def test_lsh_buckets_match_python_twin(spark, emb_dir):
    got = {
        r.bucket: (r.n_vectors, r.sum_label)
        for r in similarity_lsh_buckets(spark, emb_dir).collect()
    }
    expect = {}
    for v, lbl in zip(VECS, LABELS):
        b = _bucket(v)
        n, s = expect.get(b, (0, 0))
        expect[b] = (n + 1, s + lbl)
    assert got == expect
    assert len(expect) == 4  # the 4 sign clusters land in 4 buckets


def _rank(scored: list[tuple[int, float]]) -> list[tuple[int, float, int]]:
    """(neighbor_id, cos) -> top-k with cos DESC, neighbor_id ASC order."""
    s = sorted(scored, key=lambda x: (-x[1], x[0]))
    return [(nid, c, rk + 1) for rk, (nid, c) in enumerate(s[:TOP_K])]


def test_bruteforce_topk_matches_python_twin(spark, emb_dir):
    got = [
        (r.query_id, r.neighbor_id, r.label, r.cosine, r.rk)
        for r in similarity_bruteforce_topk(spark, emb_dir)
        .orderBy("query_id", "rk")
        .collect()
    ]
    expect = []
    for q in range(N_QUERIES):
        scored = [
            (n, _cos(VECS[q], VECS[n])) for n in range(N_VECS) if n != q
        ]
        for nid, c, rk in _rank(scored):
            expect.append((q, nid, LABELS[nid], _round4(c), rk))
    assert got == expect


def test_lsh_topk_matches_python_twin_and_stays_in_bucket(spark, emb_dir):
    got = [
        (r.query_id, r.neighbor_id, r.cosine, r.rk)
        for r in similarity_lsh_topk(spark, emb_dir)
        .orderBy("query_id", "rk")
        .collect()
    ]
    expect = []
    for q in range(N_QUERIES):
        qb = _bucket(VECS[q])
        scored = [
            (n, _cos(VECS[q], VECS[n]))
            for n in range(N_VECS)
            if n != q and _bucket(VECS[n]) == qb
        ]
        for nid, c, rk in _rank(scored):
            expect.append((q, nid, _round4(c), rk))
    assert got == expect
    # the approximation really restricts candidates: every emitted
    # neighbor shares its query's bucket
    for q, nid, _, _ in got:
        assert _bucket(VECS[nid]) == _bucket(VECS[q])


def _quantize(v: list[float]) -> list[int]:
    s = max(abs(x) for x in v)
    if s == 0:
        return [0] * len(v)
    return [int(math.floor(x / s * 127.0 + 0.5)) for x in v]


def test_quantized_topk_matches_python_twin(spark, emb_dir):
    from databatchprotectionservice_spark.operators.similarity import (
        similarity_quantized_topk,
    )

    got = {
        (r.query_id, r.rk): (r.neighbor_id, r.qcosine)
        for r in similarity_quantized_topk(spark, emb_dir).collect()
    }
    codes = [_quantize(v) for v in VECS]
    norms = [sum(c * c for c in q) for q in codes]
    expect = {}
    for qid in range(N_QUERIES):
        scored = []
        for nid in range(N_VECS):
            if nid == qid or norms[nid] == 0:
                continue
            dot = sum(a * b for a, b in zip(codes[qid], codes[nid]))
            scored.append(
                (nid, dot / (math.sqrt(norms[qid]) * math.sqrt(norms[nid])))
            )
        for nid, c, rk in _rank(scored):
            expect[(qid, rk)] = (nid, _round4(c))
    assert got == expect
    # codes actually live in int8 range and the max element hits ±127
    for q, v in zip(codes, VECS):
        assert all(-127 <= c <= 127 for c in q)
        if any(x != 0 for x in v):
            assert max(abs(c) for c in q) == 127
    # quantized ranking stays close to full precision: the true nearest
    # neighbor of each query appears in the quantized top-k
    for qid in range(N_QUERIES):
        true_best = max(
            (nid for nid in range(N_VECS) if nid != qid),
            key=lambda nid: (_cos(VECS[qid], VECS[nid]), -nid),
        )
        assert true_best in {nid for (q, _), (nid, _) in got.items() if q == qid}


def test_curate_seed_similarity_matches_python_twin(spark, tmp_path_factory):
    """documents ⋈ embeddings seed-selection vs a pure-Python twin:
    docs survive iff cos(embedding, seed) >= 0.1 AND quality >= 0.5;
    integer-valued vectors keep every float op exact."""
    import re as _re

    from databatchprotectionservice_spark.operators.sampling import (
        CURATE_QUALITY_MIN,
        SEED_COS_MIN,
        SEED_VEC_ID,
        curate_seed_similarity,
    )

    d = tmp_path_factory.mktemp("curate_corpus")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(VECS, pa.list_(pa.float32())),
                "label": pa.array(LABELS, pa.int32()),
            }
        ),
        os.path.join(str(d), "embeddings.parquet"),
    )
    # quality varies: short docs fail the length half of the score
    texts = [
        ("substantial " * 30 + f"doc {i}").strip() if i % 2 == 0 else f"tiny {i}"
        for i in range(N_VECS)
    ]
    sources = ["web" if i % 3 == 0 else "books" for i in range(N_VECS)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_VECS), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * N_VECS),
                "source": pa.array(sources),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    got = {
        r.source: (r.n_kept, r.sum_tokens, r.avg_seed_cos, r.avg_quality)
        for r in curate_seed_similarity(spark, str(d)).collect()
    }

    def quality(t):
        s = t.strip()
        n = 0 if not s else len(_re.split(r"\s+", s))
        alpha = len(_re.sub("[^a-zA-Z]", "", t)) / max(len(t), 1)
        return n, 0.5 * min(n / 50.0, 1.0) + 0.5 * alpha

    expect = {}
    for i in range(N_VECS):
        c = _cos(VECS[SEED_VEC_ID], VECS[i])
        n, q = quality(texts[i])
        if c >= SEED_COS_MIN and q >= CURATE_QUALITY_MIN:
            k, st, cs, qs = expect.get(sources[i], (0, 0, [], []))
            expect[sources[i]] = (k + 1, st + n, cs + [c], qs + [q])
    expect = {
        s: (
            k,
            st,
            _round4(sum(cs) / len(cs)),
            _round4(sum(qs) / len(qs)),
        )
        for s, (k, st, cs, qs) in expect.items()
    }
    assert got == expect
    assert got  # threshold keeps a non-empty subset on this corpus
    total_kept = sum(v[0] for v in got.values())
    assert 0 < total_kept < N_VECS  # ...and rejects some docs too


def test_pq_topk_matches_pure_python_twin(spark):
    """Independent PQ twin: plain-Python loops (no numpy, no SQL)
    recompute int8 quantization, sampled codebook, exact-integer code
    assignment and ADC scoring over the sf0.001 embeddings, and the
    registered query must reproduce them row for row."""
    import math

    import pyarrow.parquet as pq

    from databatchprotectionservice_spark.operators.similarity import (
        N_QUERIES,
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        TOP_K,
        similarity_pq_topk,
    )

    sf_dir = "/root/testdata/sf0.001"
    t = pq.read_table(sf_dir + "/embeddings.parquet")
    vecs = {
        int(i): list(map(float, e))
        for i, e in zip(
            t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()
        )
    }

    def quant(x):
        s = max(abs(v) for v in x)
        if s == 0:
            return [0] * len(x)
        return [int(math.floor(v / s * 127.0 + 0.5)) for v in x]

    q = {i: quant(x) for i, x in vecs.items()}
    cb = {}  # (m, k) -> subvector
    for k in range(PQ_K):
        for m in range(PQ_M):
            cb[(m, k)] = q[k][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
    codes, rnorm = {}, {}
    for i, qi in q.items():
        cs, rn = [], 0
        for m in range(PQ_M):
            sub = qi[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
            best, best_d = 0, None
            for k in range(PQ_K):
                d = sum((a - b) ** 2 for a, b in zip(sub, cb[(m, k)]))
                if best_d is None or d < best_d:
                    best, best_d = k, d
            cs.append(best)
            rn += sum(c * c for c in cb[(m, best)])
        codes[i], rnorm[i] = cs, rn
    expected = {}
    for p in range(N_QUERIES):
        pv = q[p]
        pn = sum(v * v for v in pv)
        if pn == 0:
            continue
        rows = []
        for i in q:
            if i == p or rnorm[i] == 0:
                continue
            score = 0
            for m in range(PQ_M):
                sub = pv[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
                score += sum(
                    a * b for a, b in zip(sub, cb[(m, codes[i][m])])
                )
            rows.append((score / (math.sqrt(pn) * math.sqrt(rnorm[i])), i))
        rows.sort(key=lambda t: (-t[0], t[1]))
        for rk, (cos, i) in enumerate(rows[:TOP_K], start=1):
            expected[(p, i)] = (
                math.floor(cos * 10000.0 + 0.5) / 10000.0,
                rk,
            )

    got = {
        (r["query_id"], r["neighbor_id"]): (r["pq_cosine"], r["rk"])
        for r in similarity_pq_topk(spark, sf_dir).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# All-pairs baseline scale guard
# ---------------------------------------------------------------------------


def test_guard_allpairs_refuses_and_names_twin(spark):
    from databatchprotectionservice_spark.operators.similarity import (
        AllPairsScaleError,
        guard_allpairs,
    )

    df = spark.range(10)
    # under the ceiling: silently passes
    guard_allpairs(df, "op", "twin", limit=10)
    # over the ceiling: refuses and points at the production twin
    with pytest.raises(AllPairsScaleError, match="similarity_ivf_topk"):
        guard_allpairs(df, "my_baseline", "similarity_ivf_topk", limit=9)


@pytest.mark.parametrize(
    "query_name, twin",
    [
        ("similarity_bruteforce_topk", "similarity_ivf_topk"),
        ("similarity_hard_negatives", "similarity_quantized_topk"),
        ("dedup_embedding_cosine", "semdedup_embeddings"),
    ],
)
def test_quadratic_baselines_are_guarded(
    spark, emb_dir, monkeypatch, query_name, twin
):
    """Each O(n²)-by-intent baseline refuses an input over the ceiling
    and its error names the approximate twin to run instead; the guard
    reads the module constant at call time so lowering it here trips
    the real registered query on the real load path."""
    from databatchprotectionservice_spark.operators import (  # noqa: F401
        dedup,
        similarity,
    )
    from databatchprotectionservice_spark.plans.registry import REGISTRY

    monkeypatch.setattr(similarity, "ALLPAIRS_GUARD_ROWS", 3)
    with pytest.raises(similarity.AllPairsScaleError, match=twin):
        REGISTRY[query_name].spark_fn(spark, emb_dir)
