"""text_gopher_rules and dedup_substring_coverage vs hand-enumerated
twins AND their staged oracles on crafted corpora.

Gopher corpus (one doc per rule-failure mode, one passing):
  doc 0: 50 in-range words incl. 2x 'the'       -> passes all
  doc 1: 10 words                               -> fails R1 (word count)
  doc 2: 50 mostly-1-char words ('a' x 25 ...)  -> fails R2 low (the
         'a's are stopwords, so R3 passes)
  doc 3: 49x 'documents' + 1 long word          -> fails R2 high + R3
  doc 4: 50 words, no stopwords                 -> fails R3 only
  doc 5: 50 words, 15 of them '#'               -> fails R5 + R4 ('#'
         is non-alphabetic) + R2 low (len 1 drags the mean)

Substring corpus: docs 10/11 share an identical 9-word prefix (two
8-token window positions each), doc 12 is 9 unique words (2 windows,
none shared), doc 13 has 4 words (0 windows)."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.dedup import (
    SUBSTRING_COVERAGE_ORACLE,
    dedup_substring_coverage,
)
from databatchprotectionservice_spark.operators.textops import (
    GOPHER_RULES_ORACLE,
    text_gopher_rules,
)

_PASS = ("the " + "scan table value batch " * 12).strip()  # 49 words
_PASS = _PASS + " the"  # 50 words, 2 stopword occurrences


def _gopher_docs():
    return [
        (0, _PASS),
        (1, "the quick brown fox the alpha beta gamma delta word"),
        (2, "a " * 25 + "b " * 24 + "the"),
        (3, ("documents " * 49).strip() + " longwordhere"),
        (4, ("scan table value batch " * 12).strip() + " scan " + "x"),
        (5, ("# " * 15 + "scan table the batch the " * 7).strip()),
    ]


def _substr_docs():
    shared = "one two three four five six seven eight nine"
    return [
        (10, shared),
        (11, shared),
        (12, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (13, "tiny doc right here"),
    ]


@pytest.fixture(scope="module")
def filt_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("filt_tables"))
    rows = _gopher_docs() + _substr_docs()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(
                    ["g" if r[0] < 10 else "s" for r in rows], pa.string()
                ),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def _duck(oracle, d):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    return con.execute(oracle).fetchall()


def test_gopher_rules_hand_enumeration(spark, filt_dir):
    got = {
        r["source"]: (
            r["n_docs"], r["fail_words"], r["fail_mwl"], r["fail_stops"],
            r["fail_alpha"], r["fail_symbols"], r["n_pass_all"],
        )
        for r in text_gopher_rules(spark, filt_dir).collect()
    }
    # source 'g': docs 0-5 (see module docstring)
    assert got["g"] == (
        6,  # n_docs
        1,  # fail_words: doc 1
        3,  # fail_mwl: docs 2 (low), 3 (high), 5 (low)
        2,  # fail_stops: docs 3, 4
        1,  # fail_alpha: doc 5 ('#' words are non-alphabetic)
        1,  # fail_symbols: doc 5 (15 '#' in 50 words)
        1,  # n_pass_all: only doc 0
    )


def test_gopher_rules_match_oracle(spark, filt_dir):
    got = [
        tuple(r) for r in text_gopher_rules(spark, filt_dir).collect()
    ]
    oracle = [tuple(r) for r in _duck(GOPHER_RULES_ORACLE, filt_dir)]
    assert got == oracle


def test_substring_coverage_hand_enumeration(spark, filt_dir):
    got = {
        r["source"]: (
            r["n_docs"], r["n_windows"], r["n_dup_windows"],
            r["coverage_e4"], r["n_docs_majority_dup"],
        )
        for r in dedup_substring_coverage(spark, filt_dir).collect()
    }
    # source 's': docs 10/11 (9 words -> 2 windows each, all shared),
    # doc 12 (2 windows, unique), doc 13 (4 words -> 0 windows)
    assert got["s"] == (4, 6, 4, round(4 / 6 * 10000), 2)


def test_substring_coverage_matches_oracle(spark, filt_dir):
    got = [
        tuple(r)
        for r in dedup_substring_coverage(spark, filt_dir).collect()
    ]
    oracle = [
        tuple(r) for r in _duck(SUBSTRING_COVERAGE_ORACLE, filt_dir)
    ]
    assert got == oracle


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    """NULL text, empty text, whitespace-only, single word, exactly
    SUBSTR_WINDOW words — the rows that diverge engines on split/len
    NULL semantics if either side forgets a coalesce."""
    from databatchprotectionservice_spark.operators.dedup import (
        SUBSTR_WINDOW,
    )

    d = str(tmp_path_factory.mktemp("hostile_tables"))
    texts = [
        None,
        "",
        "   ",
        "word",
        " ".join(f"w{i}" for i in range(SUBSTR_WINDOW)),
        "the a " + " ".join(["scan"] * 48),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["h"] * len(texts), pa.string()),
                "n_chars": pa.array(
                    [len(t or "") for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_gopher_rules_hostile_corpus(spark, hostile_dir):
    got = [
        tuple(r) for r in text_gopher_rules(spark, hostile_dir).collect()
    ]
    oracle = [tuple(r) for r in _duck(GOPHER_RULES_ORACLE, hostile_dir)]
    assert got == oracle
    assert got[0][1] == 6  # n_docs: every hostile row survives


def test_substring_coverage_hostile_corpus(spark, hostile_dir):
    got = [
        tuple(r)
        for r in dedup_substring_coverage(spark, hostile_dir).collect()
    ]
    oracle = [
        tuple(r) for r in _duck(SUBSTRING_COVERAGE_ORACLE, hostile_dir)
    ]
    assert got == oracle
    # exactly-K-words doc contributes its single window; nothing dups
    src, n_docs, n_win, n_dup, cov, maj = got[0]
    assert (n_docs, n_dup, cov, maj) == (6, 0, 0, 0)


# ---------------------------------------------------------------------------
# C4 battery + C4 span dedup (staged r11)
# ---------------------------------------------------------------------------

from databatchprotectionservice_spark.operators.dedup import (  # noqa: E402
    C4_SPANS_ORACLE,
    dedup_c4_spans,
)
from databatchprotectionservice_spark.operators.textops import (  # noqa: E402
    C4_RULES_ORACLE,
    text_c4_rules,
)


def _c4_docs():
    """One doc per C4 rule path (8-word lines; punct rule is
    (doc_id + j) % 3 != 0):
      doc 20: 16 words -> 2 lines; j=1 fails punct (21%3==0) ->
              kept=1 < 3 -> page dropped by the kept-lines floor
      doc 21: 40 words -> 5 lines; j=0 and j=3 fail punct (21%3==0,
              24%3==0) -> kept=3 -> page KEPT
      doc 22: 24 words incl 'vector' -> policy drop (code marker)
      doc 23: 16 words incl 'slow fast' -> policy drop (phrase);
              its first line also fails the badword rule
      doc 24: 12 words -> line0 fails punct (24%3==0), line1 short
              (4 words) -> kept=0
      doc 25: 40 words with 'slow' in line j=1 (badword, not the
              phrase: 'slow' followed by 'scan') -> kept lines are
              the non-(25+j)%3==0, non-bad lines
    """
    def words(n, inject=None, at=None):
        ws = (["scan", "table", "value", "batch"] * 12)[:n]
        if inject is not None:
            for k, word in enumerate(inject):
                ws[at + k] = word
        return " ".join(ws)

    return [
        (20, words(16)),
        (21, words(40)),
        (22, words(24, inject=["vector"], at=3)),
        (23, words(16, inject=["slow", "fast"], at=2)),
        (24, words(12)),
        (25, words(40, inject=["slow", "scan"], at=10)),
    ]


@pytest.fixture(scope="module")
def c4_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("c4_tables"))
    rows = _c4_docs()
    # span corpus: cross-doc dup (30/31, keeper=30 in 'd1'),
    # within-doc dup (32), span-free doc (33)
    span_rows = [
        (30, "p q r s", "d1"),
        (31, "p q r", "d2"),
        (32, "a a a a", "d2"),
        (33, "x y", "d1"),
    ]
    all_rows = [(i, t, "c") for i, t in rows] + span_rows
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in all_rows], pa.int64()),
                "text": pa.array([r[1] for r in all_rows], pa.string()),
                "lang": pa.array(["en"] * len(all_rows), pa.string()),
                "source": pa.array([r[2] for r in all_rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in all_rows], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_c4_rules_hand_enumeration(spark, c4_dir):
    got = {
        r["source"]: (
            r["n_docs"], r["n_lines"], r["fail_punct"], r["fail_short"],
            r["fail_badword"], r["kept_lines"],
            r["docs_policy_dropped"], r["docs_kept"],
        )
        for r in text_c4_rules(spark, c4_dir).collect()
    }
    # source 'c' (docs 20-25; see _c4_docs docstring):
    #   doc 20: nl=2  fail_punct=1 (j=1)           kept=1
    #   doc 21: nl=5  fail_punct=2 (j=0,3)         kept=3
    #   doc 22: nl=3  fail_punct=1 (j=2: 24%3==0)  kept=2  policy
    #   doc 23: nl=2  fail_punct=1 (j=1: 24%3==0)  bad line j=0
    #           kept=0 (j=0 bad, j=1 unpunctuated)         policy
    #   doc 24: nl=2  fail_punct=1 (j=0) fail_short=1 (j=1, 4w) kept=0
    #   doc 25: nl=5  fail_punct=1 (j=2: 27%3==0)
    #           fail_badword=1 (j=1 holds 'slow' at word index 10)
    #           kept=3 (j=0, 3, 4)
    assert got["c"] == (
        6,              # n_docs
        2 + 5 + 3 + 2 + 2 + 5,   # n_lines = 19
        1 + 2 + 1 + 1 + 1 + 1,   # fail_punct = 7
        1,              # fail_short: doc 24 tail line only
        1 + 1,          # fail_badword: doc 23 j=0, doc 25 j=1
        1 + 3 + 2 + 0 + 0 + 3,   # kept_lines = 9
        2,              # docs_policy_dropped: 22, 23
        1 + 1,          # docs_kept: 21 (kept=3), 25 (kept=3)
    )


def test_c4_rules_match_oracle(spark, c4_dir):
    got = [tuple(r) for r in text_c4_rules(spark, c4_dir).collect()]
    oracle = [tuple(r) for r in _duck(C4_RULES_ORACLE, c4_dir)]
    assert got == oracle


def test_c4_spans_hand_enumeration(spark, c4_dir):
    got = {
        r["source"]: (r["n_spans"], r["n_kept_spans"], r["n_removed_spans"])
        for r in dedup_c4_spans(spark, c4_dir).collect()
    }
    # d1: doc 30 'p q r s' -> 2 spans, both keepers; doc 33 span-free
    assert got["d1"] == (2, 2, 0)
    # d2: doc 31 'p q r' removed (keeper doc 30); doc 32 'a a a a'
    #     -> t0 keeper, t1 within-doc removed
    assert got["d2"] == (3, 1, 2)


def test_c4_spans_match_oracle(spark, c4_dir):
    got = [tuple(r) for r in dedup_c4_spans(spark, c4_dir).collect()]
    oracle = [tuple(r) for r in _duck(C4_SPANS_ORACLE, c4_dir)]
    assert got == oracle


def test_c4_rules_hostile_corpus(spark, hostile_dir):
    got = [tuple(r) for r in text_c4_rules(spark, hostile_dir).collect()]
    oracle = [tuple(r) for r in _duck(C4_RULES_ORACLE, hostile_dir)]
    assert got == oracle
    assert got[0][1] == 6  # n_docs: every hostile row survives


def test_c4_spans_hostile_corpus(spark, hostile_dir):
    got = [tuple(r) for r in dedup_c4_spans(spark, hostile_dir).collect()]
    oracle = [tuple(r) for r in _duck(C4_SPANS_ORACLE, hostile_dir)]
    assert got == oracle


# ---------------------------------------------------------------------------
# URL-canonicalization dedup (staged r11/r12)
# ---------------------------------------------------------------------------

from databatchprotectionservice_spark.operators.dedup import (  # noqa: E402
    URL_CANONICAL_ORACLE,
    dedup_url_canonical,
)


def test_url_canonical_hand_enumeration(spark, c4_dir):
    got = {
        r["source"]: (
            r["n_docs"], r["n_variants"], r["n_canonical"],
            r["n_kept_docs"], r["n_removed_docs"],
        )
        for r in dedup_url_canonical(spark, c4_dir).collect()
    }
    # gids (doc_id // 3): c: 20->6 21->7 22->7 23->7 24->8 25->8;
    # d1: 30->10 33->11; d2: 31->10 32->10.  Keeper of gid 10 is
    # doc 30 (in d1), so BOTH d2 docs are removed cross-source.
    assert got["c"] == (6, 24, 3, 3, 3)
    assert got["d1"] == (2, 8, 2, 2, 0)
    assert got["d2"] == (2, 8, 1, 0, 2)


def test_url_canonical_matches_oracle(spark, c4_dir):
    got = [tuple(r) for r in dedup_url_canonical(spark, c4_dir).collect()]
    oracle = [tuple(r) for r in _duck(URL_CANONICAL_ORACLE, c4_dir)]
    assert got == oracle


def test_url_canonical_hostile_corpus(spark, hostile_dir):
    got = [
        tuple(r)
        for r in dedup_url_canonical(spark, hostile_dir).collect()
    ]
    oracle = [tuple(r) for r in _duck(URL_CANONICAL_ORACLE, hostile_dir)]
    assert got == oracle


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (staged r11/r12)
# ---------------------------------------------------------------------------

from databatchprotectionservice_spark.operators.profiling import (  # noqa: E402
    HLL_DISTINCT_ORACLE,
    HLL_M,
    profiling_hll_distinct,
)


@pytest.fixture(scope="module")
def hll_dir(tmp_path_factory):
    """A corpus with enough (doc_id, token) cardinality to sit beyond
    the linear-counting zone (> 2.5 * HLL_M raw estimate)."""
    d = str(tmp_path_factory.mktemp("hll_tables"))
    n = 200
    texts = [
        " ".join(f"tok{i}_{j}" for j in range(40)) for i in range(n)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["h"] * n, pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_hll_sketch_state_matches_oracle_exactly(spark, hll_dir):
    got = [
        tuple(r) for r in profiling_hll_distinct(spark, hll_dir).collect()
    ]
    oracle = [tuple(r) for r in _duck(HLL_DISTINCT_ORACLE, hll_dir)]
    assert got == oracle
    (n_exact, v_zero, s_total, est), = got
    assert n_exact == 200 * 40
    assert est is not None
    # the estimate must land within 5 sigma of the 1.04/sqrt(m) bound
    sigma = 1.04 / (HLL_M ** 0.5)
    assert abs(est - n_exact) / n_exact < 5 * sigma


def test_hll_linear_zone_gated_null_in_both_engines(spark, hostile_dir):
    """Tiny cardinality -> raw estimate below 2.5m -> the estimate is
    NULL in BOTH engines (the ln() branch is never evaluated)."""
    got = [
        tuple(r)
        for r in profiling_hll_distinct(spark, hostile_dir).collect()
    ]
    oracle = [tuple(r) for r in _duck(HLL_DISTINCT_ORACLE, hostile_dir)]
    assert got == oracle
    assert got[0][3] is None or got[0][3] != got[0][3]  # NULL estimate
