"""Decontamination + repetition scoring vs independent pure-Python twins.

Same rationale as test_textops_units.py: the DuckDB oracles share an
author with the Spark code, so expected results are recomputed here with
`re` + `collections` on a crafted corpus covering the edge cases —
verbatim 8-gram contamination, an exact-copy doc, a 7-word near-miss
that must NOT flag, a short (<8-word) eval doc whose truncated gram is
the whole text, spam-repetition docs, and 0/1-word degenerate docs.
"""

import math
import os
import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.textops import (
    DECON_EVAL_MOD,
    DECON_NGRAM,
    REP_DUP_WORD_FRAC,
    REP_TOP_BIGRAM_FRAC,
    decontaminate_ngram_overlap,
    text_repetition_scores,
)

EVAL_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
SHORT_EVAL = "nu xi omicron pi"  # < 8 words: one truncated gram
DOCS = {
    0: EVAL_TEXT,  # eval (0 % 20 == 0)
    1: "prefix words here alpha beta gamma delta epsilon zeta eta theta trailer",
    #    ^ shares the 8-run "alpha..theta" -> contaminated
    2: EVAL_TEXT,  # exact copy -> contamination 1.0
    3: "totally unrelated content about completely different things entirely now",
    4: "x1 alpha beta gamma delta epsilon zeta eta y1 y2",  # only a 7-run: clean
    20: SHORT_EVAL,  # eval; truncated gram = whole text
    5: SHORT_EVAL,  # exact copy of the short eval doc -> contaminated
    6: "spam spam spam spam spam",  # repetition: dup words + top bigram
    7: "",  # degenerate: one empty word
    8: "single",  # one word, no real bigram
}


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("decon_corpus")
    ids = sorted(DOCS)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([DOCS[i] for i in ids]),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["src0"] * len(ids)),
            "n_chars": pa.array([len(DOCS[i]) for i in ids], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _round4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _grams(text: str, n: int) -> set[str]:
    words = re.split(r"\s+", text.strip())
    hi = max(len(words) - (n - 1), 1)
    return {" ".join(words[i : i + n]) for i in range(hi)}


def test_decontaminate_matches_python_twin(spark, corpus_dir):
    got = {
        r.doc_id: (r.n_hit, r.n_grams, r.contamination)
        for r in decontaminate_ngram_overlap(spark, corpus_dir).collect()
    }
    eval_grams = set()
    for doc_id, text in DOCS.items():
        if doc_id % DECON_EVAL_MOD == 0:
            eval_grams |= _grams(text, DECON_NGRAM)
    expect = {}
    for doc_id, text in DOCS.items():
        if doc_id % DECON_EVAL_MOD == 0:
            continue
        gs = _grams(text, DECON_NGRAM)
        hit = len(gs & eval_grams)
        if hit:
            expect[doc_id] = (hit, len(gs), _round4(hit / len(gs)))
    assert got == expect
    # the crafted corpus exercises the cases that matter
    assert 1 in got and 2 in got and 5 in got  # 8-run, exact, short-exact
    assert 3 not in got and 4 not in got  # unrelated + 7-run near-miss
    assert got[2][2] == 1.0  # exact copy fully contaminated


def test_repetition_matches_python_twin(spark, corpus_dir):
    got = {
        r.doc_id: (r.n_words, r.dup_word_frac, r.top_bigram_frac, r.repetitive)
        for r in text_repetition_scores(spark, corpus_dir).collect()
    }
    expect = {}
    for doc_id, text in DOCS.items():
        words = re.split(r"\s+", text.strip())
        dup = _round4(1.0 - len(set(words)) / len(words))
        if len(words) < 2:
            top = 0.0
        else:
            bigrams = [
                " ".join(words[i : i + 2])
                for i in range(max(len(words) - 1, 1))
            ]
            c = Counter(bigrams)
            top = _round4(max(c.values()) / len(bigrams))
        flag = int(top > REP_TOP_BIGRAM_FRAC or dup > REP_DUP_WORD_FRAC)
        expect[doc_id] = (len(words), dup, top, flag)
    assert got == expect
    assert got[6] == (5, 0.8, 1.0, 1)  # spam doc: fully repetitive
    assert got[7][3] == 0 and got[8][3] == 0  # degenerate docs not flagged


def test_decontaminate_empty_eval_split_yields_empty(spark, tmp_path):
    """A corpus with no eval docs (no doc_id % 20 == 0) has an empty
    probe set: the operator must return zero rows, not error."""
    docs = {1: "some training text here", 3: "other text entirely"}
    d = str(tmp_path / "noeval")
    os.makedirs(d)
    ids = sorted(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([docs[i] for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["s"] * len(ids)),
                "n_chars": pa.array([len(docs[i]) for i in ids], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    assert decontaminate_ngram_overlap(spark, d).count() == 0
