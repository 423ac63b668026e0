"""dedup_lines_ccnet + similarity_hard_negatives vs pure-Python twins.

Same rationale as test_dedup_units.py: the DuckDB oracles share an
author with the Spark code, so these tests recompute expected results
with `hashlib` / float math on crafted corpora covering the edge cases:
keep-first semantics, intra-doc repeats inside the keeper, tail
segments shorter than the window, a doc whose every segment is removed,
and — for hard negatives — a same-label vector that is closer than any
valid negative and must be skipped.
"""

import hashlib
import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.textops import (
    CCNET_SEG_WORDS,
    dedup_lines_ccnet,
)
from databatchprotectionservice_spark.operators.similarity import (
    TOP_K,
    similarity_hard_negatives,
)

SEG_A = "alpha beta gamma delta epsilon"  # one exact 5-word segment
SEG_B = "zeta eta theta iota kappa"
DOCS = [
    # doc 0: owns SEG_A and SEG_B, plus a unique tail (3 words)
    (0, SEG_A + " " + SEG_B + " tail words here", "src0"),
    # doc 1: repeats SEG_A (removed; keeper is doc 0) + unique segment
    (1, SEG_A + " unique one two three four", "src0"),
    # doc 2: EVERY segment duplicated from doc 0 -> fully emptied
    (2, SEG_B + " " + SEG_A, "src1"),
    # doc 3: repeats SEG_A twice INSIDE itself; doc 0 is still keeper,
    # so both occurrences are removed
    (3, SEG_A + " " + SEG_A, "src1"),
    # doc 4: no shared segments -> not in the output at all
    (4, "totally fresh words that appear nowhere else at all", "src1"),
]


@pytest.fixture(scope="module")
def ccnet_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ccnet_corpus")
    table = pa.table(
        {
            "doc_id": pa.array([i for i, _, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t, _ in DOCS]),
            "lang": pa.array(["en"] * len(DOCS)),
            "source": pa.array([s for _, _, s in DOCS]),
            "n_chars": pa.array([len(t) for _, t, _ in DOCS], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _segments(text: str) -> list[str]:
    w = text.strip().split()
    return [
        " ".join(w[i : i + CCNET_SEG_WORDS])
        for i in range(0, len(w), CCNET_SEG_WORDS)
    ]


def _twin(docs):
    keeper: dict[str, int] = {}
    for doc_id, text, _ in docs:
        for seg in _segments(text):
            keeper[seg] = min(keeper.get(seg, doc_id), doc_id)
    out = {}
    for doc_id, text, source in docs:
        segs = _segments(text)
        kept = [s for s in segs if keeper[s] == doc_id]
        removed = len(segs) - len(kept)
        if removed > 0:
            out[doc_id] = (
                source,
                len(segs),
                removed,
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
    return out


def test_ccnet_matches_twin_and_edge_cases(spark, ccnet_dir):
    rows = {
        r["doc_id"]: (r["source"], r["n_segments"], r["n_removed"], r["kept_md5"])
        for r in dedup_lines_ccnet(spark, ccnet_dir).collect()
    }
    assert rows == _twin(DOCS)
    # keep-first: doc 0 owns every segment it contains -> absent
    assert 0 not in rows
    # unaffected doc absent
    assert 4 not in rows
    # doc 2 fully emptied: md5 of the empty string
    assert rows[2][3] == hashlib.md5(b"").hexdigest()
    # doc 3's intra-doc repeat: BOTH occurrences removed (keeper is doc 0)
    assert rows[3][2] == 2


# ---------------------------------------------------------------------------
# hard negatives
# ---------------------------------------------------------------------------

DIM = 64


def _vec(seed: float) -> list[float]:
    # deterministic, non-degenerate 64-dim vector
    return [math.sin(seed + 0.1 * i) for i in range(DIM)]


VECS = [
    # vec 0 is the only query (vec_id < N_QUERIES needs vec_id 0..4 —
    # keep all ids < 5 present so the query set is exactly these)
    (0, _vec(1.0), 7),
    (1, _vec(1.0001), 7),  # nearly identical to the query but SAME label
    (2, _vec(1.01), 3),  # close, different label -> best negative
    (3, _vec(2.0), 3),
    (4, _vec(3.0), 5),
    (5, _vec(4.0), 5),
    (6, _vec(5.0), 7),  # same label again -> never a negative for vec 0
]


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hardneg_corpus")
    table = pa.table(
        {
            "vec_id": pa.array([v[0] for v in VECS], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in VECS], pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in VECS], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )


def test_hard_negatives_skip_same_label(spark, emb_dir):
    rows = similarity_hard_negatives(spark, emb_dir).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
    # every query vector got TOP_K negatives (enough other-label vectors)
    for qid, rs in by_query.items():
        assert len(rs) == TOP_K
        qlabel = rs[0]["qlabel"]
        for r in rs:
            assert r["neg_label"] != qlabel
    # for query 0 (label 7): vec 1 is nearly identical but same-label ->
    # excluded; the nearest negative must be vec 2
    q0 = sorted(by_query[0], key=lambda r: r["rk"])
    assert [r["neighbor_id"] for r in q0][0] == 2
    assert all(r["neighbor_id"] not in (1, 6) for r in q0)
    # twin check of the full ranking for query 0: float32 storage, so
    # compare against the float32-rounded vectors
    import numpy as np

    q = np.array(VECS[0][1], dtype=np.float32).astype(float)
    cands = sorted(
        (
            (-_cos(q, np.array(v, dtype=np.float32).astype(float)), vid)
            for vid, v, lab in VECS
            if lab != 7
        ),
    )
    assert [r["neighbor_id"] for r in q0] == [vid for _, vid in cands[:TOP_K]]
