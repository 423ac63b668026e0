"""dedup_jaccard_prefix vs the all-pairs oracle.

The point under test is LOSSLESSNESS of prefix filtering: the Spark
side only joins each document's rarest-gram prefix, and the DuckDB
oracle brute-forces every pair — so any candidate the filter wrongly
pruned shows up as a missing row.  A randomized corpus (seeded) with
deliberately heavy near-duplication plus crafted exact/near/far trios
exercises prefixes at many lengths, and the sf0.001 real corpus is
swept too.
"""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.dedup import (
    JACCARD_PREFIX_ORACLE,
    dedup_jaccard_prefix,
)

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
    "nu xi omicron pi rho sigma tau upsilon phi chi psi omega".split()
)


def _corpus():
    rng = np.random.default_rng(59)
    docs = []
    # crafted trio: identical, one-word edit (near), disjoint (far)
    base = " ".join(_WORDS[:12])
    docs.append(base)
    docs.append(base)  # jaccard 1.0 with doc 0
    docs.append(base.replace("delta", "DELTA"))  # high but < 1
    docs.append(" ".join(_WORDS[12:24]))  # disjoint
    # randomized: perturbations of a few templates -> many pairs near
    # the 0.8 threshold from both sides
    for t in range(6):
        tmpl = [
            _WORDS[int(i)] for i in rng.integers(0, len(_WORDS), 30)
        ]
        for _ in range(5):
            doc = list(tmpl)
            for _ in range(int(rng.integers(0, 4))):
                doc[int(rng.integers(0, len(doc)))] = _WORDS[
                    int(rng.integers(0, len(_WORDS)))
                ]
            docs.append(" ".join(doc))
    return docs


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("jp_tables"))
    docs = _corpus()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "source": pa.array(["t"] * len(docs), pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def _oracle(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return [
        (int(a), int(b), int(j))
        for a, b, j in con.execute(JACCARD_PREFIX_ORACLE).fetchall()
    ]


def test_prefix_filter_is_lossless_on_crafted_corpus(spark, corpus_dir):
    got = [
        (r["doc_a"], r["doc_b"], r["jaccard_e4"])
        for r in dedup_jaccard_prefix(spark, corpus_dir).collect()
    ]
    want = _oracle(corpus_dir)
    assert want, "fixture produced no near-duplicate pairs"
    assert (0, 1, 10000) in want  # the identical pair at e4 scale
    assert got == want
    # and the randomized templates really exercised both sides of t
    assert any(j < 10000 for _, _, j in want)


def test_prefix_filter_matches_oracle_on_real_corpus(spark):
    sf_dir = "/root/testdata/sf0.001"
    got = [
        (r["doc_a"], r["doc_b"], r["jaccard_e4"])
        for r in dedup_jaccard_prefix(spark, sf_dir).collect()
    ]
    assert got == _oracle(sf_dir)
