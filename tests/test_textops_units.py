"""Text-analysis operators vs independent pure-Python twins.

Same rationale as test_dedup_units.py: the DuckDB oracles share an
author with the Spark code, so these tests recompute expected results
with `re` + `hashlib` on a crafted corpus that covers the edge cases —
empty text, single-token text, digits/symbols for the BPE lexer, every
language branch of the guesser including the CJK short-circuit and the
tie-break order, and the short-document 5-gram fallback.
"""

import hashlib
import math
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.textops import (
    text_fingerprints,
    text_language_id,
    text_quality_scores,
    text_tfidf_top_terms,
    text_token_stats,
)

DOCS = [
    # (text, lang label, source)
    ("the cat sat on the mat and purred", "en", "web"),
    ("le chat et la souris dans les jardins", "fr", "web"),
    ("el perro y los gatos en las casas", "es", "books"),
    ("der hund und die katze das haus ein tag", "de", "books"),
    ("数据 data lake", "zh", "web"),  # CJK chars short-circuit to zh
    ("", "en", "code"),  # empty text: 0 tokens, ratio 0
    ("x", "en", "code"),  # single token, no whitespace
    ("a1b2 c3!? #tag 42", "en", "code"),  # BPE lexer: letters/digits/symbols
    ("the the the of of and a le la", "en", "web"),  # en wins tie-break vs fr
]
TEXTS = [t for t, _, _ in DOCS]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("textops_corpus")
    table = pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array([t for t, _, _ in DOCS]),
            "lang": pa.array([lang for _, lang, _ in DOCS]),
            "source": pa.array([s for _, _, s in DOCS]),
            "n_chars": pa.array([len(t) for t, _, _ in DOCS], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _ntokens(text: str) -> int:
    t = text.strip()
    return 0 if not t else len(re.split(r"\s+", t))


def _round4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def test_token_stats_match_python_twin(spark, corpus_dir):
    got = {
        r.source: (r.n_docs, r.sum_tokens, r.sum_chars, r.sum_bpe_tokens, r.max_tokens)
        for r in text_token_stats(spark, corpus_dir).collect()
    }
    expect = {}
    for text, _, source in DOCS:
        bpe = len(re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", text.lower()))
        n, st, sc, sb, mx = expect.get(source, (0, 0, 0, 0, 0))
        expect[source] = (
            n + 1,
            st + _ntokens(text),
            sc + len(text),
            sb + bpe,
            max(mx, _ntokens(text)),
        )
    assert got == expect


def test_quality_scores_match_python_twin(spark, corpus_dir):
    got = {
        r.doc_id: (r.n_tokens, r.alpha_ratio, r.quality)
        for r in text_quality_scores(spark, corpus_dir).collect()
    }
    expect = {}
    for i, text in enumerate(TEXTS):
        n = _ntokens(text)
        alpha = len(re.sub("[^a-zA-Z]", "", text)) / max(len(text), 1)
        q = 0.5 * min(n / 50.0, 1.0) + 0.5 * alpha
        expect[i] = (n, _round4(alpha), _round4(q))
    assert got == expect
    assert expect[5] == (0, 0.0, 0.0)  # empty doc fully zeroed


def test_language_id_matches_python_twin(spark, corpus_dir):
    got = {
        r.lang_guess: (r.n_docs, r.n_match_label)
        for r in text_language_id(spark, corpus_dir).collect()
    }
    markers = {
        "en": r"\b(the|of|and|a)\b",
        "fr": r"\b(le|la|les|et|une)\b",
        "es": r"\b(el|los|las|una|y)\b",
        "de": r"\b(der|die|das|und|ein)\b",
    }

    def guess(text: str) -> str:
        if re.search("[一-鿿]", text):
            return "zh"
        s = {k: len(re.findall(p, text.lower())) for k, p in markers.items()}
        if s["en"] >= s["fr"] and s["en"] >= s["es"] and s["en"] >= s["de"]:
            return "en"
        if s["fr"] >= s["es"] and s["fr"] >= s["de"]:
            return "fr"
        if s["es"] >= s["de"]:
            return "es"
        return "de"

    expect = {}
    for text, lang, _ in DOCS:
        g = guess(text)
        n, m = expect.get(g, (0, 0))
        expect[g] = (n + 1, m + (1 if g == lang else 0))
    assert got == expect
    # the crafted docs exercise every branch
    assert guess(DOCS[4][0]) == "zh" and guess(DOCS[1][0]) == "fr"
    assert guess(DOCS[2][0]) == "es" and guess(DOCS[3][0]) == "de"
    assert guess(DOCS[8][0]) == "en"  # tie-break order favors en


def test_fingerprints_match_python_twin(spark, corpus_dir):
    got = {
        r.doc_id: (r.exact_fp, r.winnow_fp)
        for r in text_fingerprints(spark, corpus_dir).collect()
    }

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    expect = {}
    for i, text in enumerate(TEXTS):
        # mirror Spark: split('', '\\s+') yields [''], not []
        words = re.split(r"\s+", text.strip())
        n = max(len(words) - 4, 1)
        grams = [" ".join(words[j : j + 5]) for j in range(n)]
        expect[i] = (md5(text.strip().lower()), min(md5(g) for g in grams))
    assert got == expect


def test_tfidf_matches_python_twin(spark, corpus_dir):
    got = [
        (r.doc_id, r.term, r.tf, r.df, r.score)
        for r in text_tfidf_top_terms(spark, corpus_dir).collect()
    ]
    tok = {
        i: re.findall("[a-z]+", t.lower()) for i, t in enumerate(TEXTS)
    }
    n_docs = len(TEXTS)
    df: dict[str, int] = {}
    for terms in tok.values():
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    expect = []
    for i in sorted(tok):
        tf: dict[str, int] = {}
        for t in tok[i]:
            tf[t] = tf.get(t, 0) + 1
        scored = [
            (t, c, df[t], c * float(n_docs) / df[t]) for t, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[3], x[0]))
        for t, c, d, s in scored[:3]:
            expect.append((i, t, c, d, _round4(s)))
    assert got == expect


def test_chunk_windows_match_python_twin(spark, corpus_dir):
    from databatchprotectionservice_spark.operators.textops import (
        CHUNK_STRIDE,
        CHUNK_WORDS,
        text_chunk_windows,
    )

    got = {
        (r.doc_id, r.chunk_idx): (r.n_words, r.chunk_md5)
        for r in text_chunk_windows(spark, corpus_dir).collect()
    }
    import hashlib
    import math

    expect = {}
    import re

    for doc_id, text in enumerate(TEXTS):
        # re.split matches Spark/DuckDB split semantics: empty text
        # yields one empty word, not zero words
        words = re.split(r"\s+", text.strip())
        n = max(math.ceil((len(words) - CHUNK_WORDS) / CHUNK_STRIDE) + 1, 1)
        for k in range(n):
            chunk = words[k * CHUNK_STRIDE : k * CHUNK_STRIDE + CHUNK_WORDS]
            expect[(doc_id, k)] = (
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )
    assert got == expect
    # every word of every doc is covered by at least one chunk
    for doc_id, text in enumerate(TEXTS):
        n_words = len(re.split(r"\s+", text.strip()))
        covered = max(
            k * CHUNK_STRIDE + CHUNK_WORDS
            for (d, k) in expect
            if d == doc_id
        )
        assert covered >= n_words


def test_bpe_train_matches_pure_python_twin(spark):
    """Independent BPE twin: plain-Python dict counting + str.replace
    over the sf0.001 corpus must reproduce the distributed trainer's
    learned merges, counts and corpus lengths round for round.
    (str.replace and Spark/DuckDB replace share left-to-right
    non-overlapping semantics, which the twin therefore also pins.)"""
    import pyarrow.parquet as pq

    from databatchprotectionservice_spark.operators.textops import (
        BPE_MERGES,
        BPE_PLACEHOLDERS,
        text_bpe_train,
    )

    sf_dir = "/root/testdata/sf0.001"
    texts = (
        pq.read_table(sf_dir + "/documents.parquet")
        .column("text")
        .to_pylist()
    )
    expected = []
    for r in range(BPE_MERGES):
        counts: dict[str, int] = {}
        for t in texts:
            for i in range(len(t) - 1):
                p = t[i : i + 2]
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        texts = [t.replace(best[0], BPE_PLACEHOLDERS[r]) for t in texts]
        expected.append(
            (r + 1, best[0], best[1], sum(len(t) for t in texts))
        )

    got = [
        (r["merge_round"], r["pair"], r["n_occurrences"], r["corpus_len_after"])
        for r in text_bpe_train(spark, sf_dir)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == expected
    # merges actually shrink the corpus and later merges may build on
    # earlier placeholders (hierarchical growth is at least possible)
    lens = [e[3] for e in expected]
    assert all(a > b for a, b in zip(lens, lens[1:]))


def test_bpe_train_survives_quote_and_backslash_pairs(spark, tmp_path):
    """A corpus whose winning bigrams contain a single quote and a
    backslash must train cleanly: the merge apply goes through
    F.replace with literal columns, not SQL-string interpolation
    (ADVICE r8 — an interpolated apostrophe raised a parse error)."""
    from databatchprotectionservice_spark.operators.textops import (
        BPE_MERGES,
        BPE_PLACEHOLDERS,
        text_bpe_train,
    )

    texts = ["don't won't can't " * 6, "a\\b c\\d e\\f " * 5, "plain"]
    docs = tmp_path / "quotes"
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(docs / "documents.parquet"))

    expected = []
    for r in range(BPE_MERGES):
        counts: dict[str, int] = {}
        for t in texts:
            for i in range(len(t) - 1):
                p = t[i : i + 2]
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        texts = [t.replace(best[0], BPE_PLACEHOLDERS[r]) for t in texts]
        expected.append(
            (r + 1, best[0], best[1], sum(len(t) for t in texts))
        )
    # the scenario is real only if a learned pair carries ' or \\
    assert any("'" in e[1] or "\\" in e[1] for e in expected)

    got = [
        (r["merge_round"], r["pair"], r["n_occurrences"], r["corpus_len_after"])
        for r in text_bpe_train(spark, str(docs))
        .orderBy("merge_round")
        .collect()
    ]
    assert got == expected
