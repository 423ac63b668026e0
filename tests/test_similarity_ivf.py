"""IVF ANN verified against a numpy reference implementation."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from databatchprotectionservice_spark.operators.similarity import (
    IVF_ITERS,
    IVF_K,
    IVF_PROBES,
    N_QUERIES,
    TOP_K,
    _assign_udf,
    similarity_ivf_topk,
    train_ivf_centroids,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, x


def _reference_centroids(ids, x, k=IVF_K, iters=IVF_ITERS):
    c = x[ids < k][np.argsort(ids[ids < k])].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        for j in range(k):
            if np.any(a == j):
                c[j] = x[a == j].mean(axis=0)
    return c


def test_training_matches_numpy_reference(spark, emb, emb_np):
    ids, x = emb_np
    got = train_ivf_centroids(spark, emb)
    want = _reference_centroids(ids, x)
    assert np.allclose(got, want, atol=1e-9)


def test_assignment_is_argmin_distance(spark, emb, emb_np):
    ids, x = emb_np
    c = _reference_centroids(ids, x)
    assigned = {
        r.vec_id: r.cluster
        for r in emb.select(
            "vec_id", _assign_udf(c)(F.col("embedding")).alias("cluster")
        ).collect()
    }
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    want = np.argmin(d, axis=1)
    for i, vec_id in enumerate(ids):
        assert assigned[vec_id] == want[i]


def test_ivf_topk_matches_reference_probed_search(spark, sf_dir, emb_np):
    ids, x = emb_np
    c = _reference_centroids(ids, x)
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    assign = np.argmin(d, axis=1)
    norms = np.sqrt((x.astype(np.float64) ** 2).sum(axis=1))

    got = {}
    for r in similarity_ivf_topk(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append((r.rk, r.neighbor_id))

    for qi in range(N_QUERIES):
        qx = x[ids == qi][0]
        qd = ((c - qx) ** 2).sum(axis=1)
        probes = set(np.argsort(qd)[:IVF_PROBES])
        cand = [
            int(ids[j])
            for j in range(len(ids))
            if assign[j] in probes and ids[j] != qi
        ]
        cos = {
            cj: float(
                x[ids == cj][0] @ qx / (norms[ids == cj][0] * norms[ids == qi][0])
            )
            for cj in cand
        }
        want = sorted(cand, key=lambda cj: (-cos[cj], cj))[:TOP_K]
        got_order = [n for _, n in sorted(got.get(qi, []))]
        assert got_order == want, f"query {qi}"
