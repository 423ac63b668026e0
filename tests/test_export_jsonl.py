"""JSONL delivery roundtrip on content that stresses JSON escaping.

The registry oracle proves losslessness on the synthetic corpus; this
test proves it on the hard cases — embedded quotes, backslashes,
newlines/tabs inside text, non-ASCII/unicode, empty strings, and NULL
text/lang — by comparing the operator's per-source aggregates against
a hashlib twin computed straight from the in-memory rows.
"""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.maintenance import (
    export_jsonl_roundtrip,
)

ROWS = [
    # (doc_id, text, lang, source)
    (0, 'she said "hello" and left', "en", "web"),
    (1, "backslash \\ and \\n literal", "en", "web"),
    (2, "real\nnewline and\ttab", "en", "books"),
    (3, "unicode: café über 中文 \U0001f600", "zh", "books"),
    (4, "", "en", "code"),  # empty string is not null
    (5, None, "en", "code"),  # null text survives as null
    (6, "plain", None, "code"),  # null lang
    (7, "{\"json\": [1, 2]}", "en", "web"),  # JSON-in-JSON
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl_corpus")
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "text": pa.array([r[1] for r in ROWS]),
            "lang": pa.array([r[2] for r in ROWS]),
            "source": pa.array([r[3] for r in ROWS]),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else 0 for r in ROWS],
                pa.int64(),
            ),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_jsonl_roundtrip_survives_escaping_and_nulls(spark, corpus_dir):
    got = {
        r.source: (r.n_docs, r.sum_doc_ids, r.n_langs, r.min_md5, r.max_md5)
        for r in export_jsonl_roundtrip(spark, corpus_dir).collect()
    }
    expect = {}
    for source in {r[3] for r in ROWS}:
        rows = [r for r in ROWS if r[3] == source]
        md5s = sorted(
            hashlib.md5(r[1].encode()).hexdigest()
            for r in rows
            if r[1] is not None
        )
        expect[source] = (
            len(rows),
            sum(r[0] for r in rows),
            len({r[2] for r in rows if r[2] is not None}),
            md5s[0] if md5s else None,
            md5s[-1] if md5s else None,
        )
    assert got == expect
