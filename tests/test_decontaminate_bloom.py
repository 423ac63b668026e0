"""decontaminate_bloom_prefilter vs the exact oracle AND the exact query.

The Bloom stage must be invisible in the result: no false negatives
(Bloom property) and no surviving false positives (the verify join).
A crafted corpus plants exact 8-gram contamination, near-misses
(7-gram overlap only), and clean documents; the real sf0.001 corpus
is swept too.  Equality with BOTH the DuckDB all-SQL oracle and the
broadcast-exact Spark query pins the prefilter's losslessness from
two independent directions.
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.textops import (
    DECON_BLOOM_ORACLE,
    decontaminate_bloom_prefilter,
    decontaminate_ngram_overlap,
)

_W = [f"w{i}" for i in range(40)]


def _corpus():
    eval_doc = " ".join(_W[:20])          # doc_id 0 -> eval split
    docs = [eval_doc]
    # contaminated: shares a verbatim 8-gram window with the eval doc
    docs.append(" ".join(["x"] + _W[4:12] + ["y", "z"]))
    # near miss: only 7 consecutive shared words
    docs.append(" ".join(["x"] + _W[4:11] + ["q"] * 5))
    # clean
    docs.append(" ".join(_W[20:40]))
    # fully duplicated eval text (contamination ratio 1.0)
    docs.append(eval_doc)
    # padding to spread ids away from the eval modulus
    for i in range(5, 19):
        docs.append(" ".join(_W[(i % 7) + 20 : (i % 7) + 33]))
    return docs


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bloom_tables"))
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
    return con.execute(DECON_BLOOM_ORACLE).fetchall()


def _rows(df):
    return [tuple(r) for r in df.orderBy("doc_id").collect()]


def test_bloom_equals_oracle_and_exact_on_crafted(spark, corpus_dir):
    got = _rows(decontaminate_bloom_prefilter(spark, corpus_dir))
    want = _oracle(corpus_dir)
    assert got == want
    assert _rows(decontaminate_ngram_overlap(spark, corpus_dir)) == want
    by_id = {r[0]: r for r in got}
    assert 1 in by_id and by_id[1][1] == 1   # planted single 8-gram hit
    assert 2 not in by_id                    # 7-gram near miss excluded
    assert 3 not in by_id                    # clean doc excluded
    assert by_id[4][3] == 1.0                # verbatim dup fully flagged


def test_bloom_equals_oracle_on_real_corpus(spark):
    sf_dir = "/root/testdata/sf0.001"
    got = _rows(decontaminate_bloom_prefilter(spark, sf_dir))
    assert got == _oracle(sf_dir)
