"""UDX surface (UDTF / grouped-agg UDAF / grouped-map) vs Python twins.

Group sizes 1..5 pin the interquartile slice semantics (`[n//4, 3n//4)`
on the sorted values) at every small-n edge, and the crafted texts pin
the UDTF's short-document fallback.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.udx import (
    grouped_map_cumulative_chars,
    udaf_iqr_chars,
    udtf_shingle_counts,
)

DOCS = [
    # (doc_id, text, source, n_chars) — n_chars deliberately decoupled
    # from len(text) to prove the ops read the column, not the text
    (0, "alpha beta gamma delta", "a", 10),
    (1, "alpha beta gamma", "a", 40),
    (2, "beta gamma", "a", 20),  # short doc: 1-gram fallback
    (3, "gamma", "a", 30),
    (4, "alpha beta gamma delta epsilon", "a", 50),
    (5, "one two three four", "b", 7),  # singleton group
    (6, "x y z", "c", 5),
    (7, "x y z w", "c", 1),
    (8, "p q r s t", "d", 4),
    (9, "p q r", "d", 2),
    (10, "q r s", "d", 8),
    (11, "r s t u", "d", 6),
    (12, "m n o", "e", 9),
    (13, "n o p", "e", 3),
    (14, "o p q", "e", 11),
]


@pytest.fixture(scope="module")
def udx_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("udx_corpus")
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in DOCS], pa.int64()),
            "text": pa.array([r[1] for r in DOCS]),
            "lang": pa.array(["en"] * len(DOCS)),
            "source": pa.array([r[2] for r in DOCS]),
            "n_chars": pa.array([r[3] for r in DOCS], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_udtf_shingle_counts_match_python_twin(spark, udx_dir):
    got = {
        r.source: (r.n_grams, r.n_distinct_grams)
        for r in udtf_shingle_counts(spark, udx_dir).collect()
    }
    grams_by_source: dict[str, list[str]] = {}
    for _, text, source, _ in DOCS:
        words = text.strip().split()
        n = max(len(words) - 2, 1)
        grams_by_source.setdefault(source, []).extend(
            " ".join(words[i : i + 3]) for i in range(n)
        )
    expect = {
        s: (len(g), len(set(g))) for s, g in grams_by_source.items()
    }
    assert got == expect
    # short docs (< 3 words) emit exactly one (whole-text) gram
    assert ("beta gamma" in grams_by_source["a"]) and (
        "gamma" in grams_by_source["a"]
    )


def test_udaf_iqr_matches_python_twin_at_every_small_n(spark, udx_dir):
    got = {
        r.source: (r.n_docs, r.iqr_chars)
        for r in udaf_iqr_chars(spark, udx_dir).collect()
    }
    by_source: dict[str, list[int]] = {}
    for _, _, source, n_chars in DOCS:
        by_source.setdefault(source, []).append(n_chars)
    expect = {}
    for s, vals in by_source.items():
        v = sorted(vals)
        n = len(v)
        expect[s] = (n, sum(v[n // 4 : (3 * n) // 4]))
    assert got == expect
    # group sizes 1..5 are all present, pinning the slice edges
    assert sorted(n for n, _ in got.values()) == [1, 2, 3, 4, 5]


def test_grouped_map_cumsum_matches_python_twin(spark, udx_dir):
    got = sorted(
        (r.source, r.doc_id, r.n_chars, r.cum_chars)
        for r in grouped_map_cumulative_chars(spark, udx_dir).collect()
    )
    expect = []
    by_source: dict[str, list[tuple[int, int]]] = {}
    for doc_id, _, source, n_chars in DOCS:
        by_source.setdefault(source, []).append((doc_id, n_chars))
    for s, rows in by_source.items():
        cum = 0
        for doc_id, n_chars in sorted(rows):
            cum += n_chars
            expect.append((s, doc_id, n_chars, cum))
    assert got == sorted(expect)
