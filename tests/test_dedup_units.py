"""Dedup operators vs independent pure-Python twins on crafted corpora.

The registry's DuckDB oracles are strong but share an author with the
Spark implementations — a shared misunderstanding would pass the
oracle gate. These tests recompute expected results with hand-rolled
Python (hashlib + sets) on tiny corpora written as real parquet
`documents` tables, mirroring the reference's unit-matrix discipline
(`/root/reference/src/processing/encryption_sequencer_test.cpp`-style
known-answer tests, applied to the LLM-pipeline operator family).
"""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.dedup import (
    dedup_exact_stats,
    dedup_keep_one,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
    dedup_simhash_hamming_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    HAMMING_MAX,
    N_BANDS,
    N_HASHES,
    SIMHASH_BITS,
)

TEXTS = [
    # doc 0/1: exact duplicates
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",
    # doc 2: canonical dup of 0 (case + padding)
    "  The Quick Brown Fox Jumps Over The Lazy Dog ",
    # doc 3: near-dup of 0 (one word changed)
    "the quick brown fox leaps over the lazy dog",
    # doc 4: unrelated
    "colorless green ideas sleep furiously in the data lake tonight",
    # doc 5: short doc (< 3 words exercises the 1-gram fallback)
    "hello world",
    # doc 6: another unrelated
    "parquet pages carry definition levels before the value stream",
]
SOURCES = ["web", "web", "web", "books", "books", "code", "code"]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dedup_corpus")
    table = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS),
            "lang": pa.array(["en"] * len(TEXTS)),
            "source": pa.array(SOURCES),
            "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _grams(text: str) -> set[str]:
    """Python twin of operators.dedup.shingled (distinct word 3-grams)."""
    words = text.strip().split()
    n = max(len(words) - 2, 1)
    return {" ".join(words[i : i + 3]) for i in range(n)}


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_exact_stats_match_python_twin(spark, corpus_dir):
    row = dedup_exact_stats(spark, corpus_dir).collect()[0]
    fps = [_md5(t.strip().lower()) for t in TEXTS]
    assert row.n_docs == len(TEXTS)
    assert row.n_distinct_text == len(set(TEXTS))
    assert row.n_distinct_fp == len(set(fps))
    assert row.n_exact_dups == len(TEXTS) - len(set(fps))


def test_keep_one_keeps_min_doc_id_per_fingerprint(spark, corpus_dir):
    got = {
        r.source: (r.n_kept, r.kept_bytes)
        for r in dedup_keep_one(spark, corpus_dir).collect()
    }
    first_by_fp: dict[str, int] = {}
    for i, t in enumerate(TEXTS):
        fp = _md5(t.strip().lower())
        if fp not in first_by_fp or i < first_by_fp[fp]:
            first_by_fp[fp] = i
    kept = sorted(first_by_fp.values())
    expect: dict[str, tuple[int, int]] = {}
    for i in kept:
        n, b = expect.get(SOURCES[i], (0, 0))
        expect[SOURCES[i]] = (n + 1, b + len(TEXTS[i].encode()))
    assert got == expect
    # docs 0,1,2 share a canonical fingerprint: only doc 0 survives
    assert 0 in kept and 1 not in kept and 2 not in kept


def test_simhash_matches_python_twin(spark, corpus_dir):
    got = {r.doc_id: r.simhash for r in dedup_simhash(spark, corpus_dir).collect()}

    def simhash(text: str) -> int:
        counters = [0] * 16
        for w in text.strip().split():
            h16 = int(_md5(w)[:4], 16)
            for b in range(16):
                counters[b] += 1 if (h16 >> b) & 1 else -1
        return sum(1 << b for b in range(16) if counters[b] > 0)

    expect = {i: simhash(t) for i, t in enumerate(TEXTS)}
    assert got == expect
    # identical docs hash identically; near-dups differ in few bits
    assert got[0] == got[1]
    assert bin(got[0] ^ got[3]).count("1") <= 6


def test_ngram_jaccard_matches_set_arithmetic(spark, corpus_dir):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_jaccard(spark, corpus_dir).collect()
    }
    expect = {}
    gsets = [_grams(t) for t in TEXTS]
    import math

    for a in range(len(TEXTS)):
        for b in range(a + 1, len(TEXTS)):
            inter = len(gsets[a] & gsets[b])
            union = len(gsets[a] | gsets[b])
            j = inter / union if union else 0.0
            if j >= 0.5:
                expect[(a, b)] = math.floor(j * 10000.0 + 0.5) / 10000.0
    assert got == expect
    assert (0, 1) in got and got[(0, 1)] == 1.0  # exact dup pair
    # the one-word near-dup shares 4 of 10 grams -> j=0.4, below 0.5
    assert (0, 3) not in got
    assert all((0, 4) != k for k in got)  # unrelated never pairs


def test_minhash_signatures_match_python_twin(spark, corpus_dir):
    from databatchprotectionservice_spark.plans.registry import load

    docs = load(spark, corpus_dir, "documents")
    got = {
        r.doc_id: tuple(r[f"h{h}"] for h in range(N_HASHES))
        for r in minhash_signatures(docs).collect()
    }

    def sig(text: str) -> tuple:
        words = text.strip().split()
        n = max(len(words) - 2, 1)
        grams = [" ".join(words[i : i + 3]) for i in range(n)]
        return tuple(
            min(_md5(f"{h}|{g}") for g in grams) for h in range(N_HASHES)
        )

    expect = {i: sig(t) for i, t in enumerate(TEXTS)}
    assert got == expect


def test_lsh_candidates_match_python_twin(spark, corpus_dir):
    from databatchprotectionservice_spark.plans.registry import load

    docs = load(spark, corpus_dir, "documents")
    got = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }

    def sig(text: str) -> list[str]:
        words = text.strip().split()
        n = max(len(words) - 2, 1)
        grams = [" ".join(words[i : i + 3]) for i in range(n)]
        return [min(_md5(f"{h}|{g}") for g in grams) for h in range(N_HASHES)]

    sigs = [sig(t) for t in TEXTS]
    bands = [
        [_md5(s[2 * b] + s[2 * b + 1]) for b in range(N_BANDS)] for s in sigs
    ]
    expect = {
        (a, b)
        for a in range(len(TEXTS))
        for b in range(a + 1, len(TEXTS))
        if any(bands[a][k] == bands[b][k] for k in range(N_BANDS))
    }
    assert got == expect
    assert (0, 1) in got  # exact dups always collide


def test_minhash_lsh_query_end_to_end(spark, corpus_dir):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh(spark, corpus_dir).collect()
    }
    # exact duplicates pass the 0.8 verification threshold with j=1.0;
    # the one-word near-dup (jaccard 4/11 on these grams) must NOT
    gsets = [_grams(t) for t in TEXTS]
    j03 = len(gsets[0] & gsets[3]) / len(gsets[0] | gsets[3])
    assert j03 < 0.8
    assert got.get((0, 1)) == 1.0
    assert (0, 3) not in got
    for (a, b), j in got.items():
        assert j >= 0.8 and a < b


def _simhash60_py(text: str) -> int:
    """Independent pure-Python 60-bit SimHash twin."""
    counters = [0] * SIMHASH_BITS
    for word in text.strip().split():
        h = int(hashlib.md5(word.encode()).hexdigest()[:15], 16)
        for b in range(SIMHASH_BITS):
            counters[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(SIMHASH_BITS) if counters[b] > 0)


def test_simhash_hamming_pairs_vs_python_twin(spark, corpus_dir):
    """The banded plan must return EXACTLY the all-pairs hamming<=K set
    (pigeonhole: K=3 differing bits leave >= 1 of 4 bands equal)."""
    sigs = [_simhash60_py(t) for t in TEXTS]
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a in range(len(TEXTS))
        for b in range(a + 1, len(TEXTS))
        if bin(sigs[a] ^ sigs[b]).count("1") <= HAMMING_MAX
    }
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup_simhash_hamming_pairs(spark, corpus_dir).collect()
    }
    assert got == want
    # the corpus guarantees at least the exact-duplicate pair at 0
    assert got[(0, 1)] == 0


def test_lsh_hot_bucket_guard_bounds_fanout(spark):
    """A degenerate band (every doc sharing one signature) is excluded
    from the self-join when it exceeds bucket_cap; discriminating
    buckets are untouched."""
    n = 12
    # identical text -> identical signatures -> every band bucket holds
    # all n docs: with cap < n every bucket is dropped -> zero candidates
    hot = spark.createDataFrame(
        [(i, *(["x"] * N_HASHES)) for i in range(n)],
        ["doc_id"] + [f"h{h}" for h in range(N_HASHES)],
    )
    assert lsh_candidate_pairs(hot, bucket_cap=n - 1).count() == 0
    # at the default cap the same input produces all n*(n-1)/2 pairs
    assert lsh_candidate_pairs(hot).count() == n * (n - 1) // 2
    # mixed: one hot signature group (size n) + one small group (size 2)
    # with cap below n, only the small group survives
    mixed = spark.createDataFrame(
        [(i, *(["x"] * N_HASHES)) for i in range(n)]
        + [(100 + i, *(["y"] * N_HASHES)) for i in range(2)],
        ["doc_id"] + [f"h{h}" for h in range(N_HASHES)],
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(mixed, bucket_cap=n - 1).collect()
    }
    assert got == {(100, 101)}


def test_incremental_minhash_matches_python_twin(spark, tmp_path_factory):
    """Incremental probe on a corpus whose doc_ids straddle the delta
    predicate: delta docs (id % 10 == 7) must pair with base matches
    AND earlier delta matches (b < a), never with themselves, later
    deltas, or base-base pairs."""
    import math

    from databatchprotectionservice_spark.operators.dedup import (
        DELTA_MOD,
        DELTA_REMAINDER,
        dedup_incremental_minhash,
    )

    dup = "the quick brown fox jumps over the lazy dog"
    texts = {
        0: dup,  # base copy
        7: dup,  # delta: matches base 0 (and is matched by 17)
        17: dup,  # later delta: matches 0 and 7
        3: "parquet pages carry definition levels before the value stream",
        27: "colorless green ideas sleep furiously tonight",  # delta, unique
        5: "totally different base content with no twin at all",
    }
    d = tmp_path_factory.mktemp("inc_corpus")
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["s"] * len(ids)),
                "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    got = {
        (r.doc_new, r.doc_matched): (r.n_shared_bands, r.est_jaccard)
        for r in dedup_incremental_minhash(spark, str(d)).collect()
    }

    def sig(text):
        words = text.strip().split()
        n = max(len(words) - 2, 1)
        grams = [" ".join(words[i : i + 3]) for i in range(n)]
        return [min(_md5(f"{h}|{g}") for g in grams) for h in range(N_HASHES)]

    sigs = {i: sig(t) for i, t in texts.items()}
    bands = {
        i: [_md5(s[2 * b] + s[2 * b + 1]) for b in range(N_BANDS)]
        for i, s in sigs.items()
    }
    expect = {}
    for a in ids:
        if a % DELTA_MOD != DELTA_REMAINDER:
            continue
        for b in ids:
            if b == a:
                continue
            if b % DELTA_MOD == DELTA_REMAINDER and b >= a:
                continue
            shared = sum(
                1 for k in range(N_BANDS) if bands[a][k] == bands[b][k]
            )
            if shared:
                m = sum(
                    1
                    for i in range(N_HASHES)
                    if sigs[a][i] == sigs[b][i]
                )
                est = math.floor(m * 1.0 / N_HASHES * 10000.0 + 0.5) / 10000.0
                expect[(a, b)] = (shared, est)
    assert got == expect
    # the structure the operator exists for, explicitly:
    assert (7, 0) in got and (17, 0) in got and (17, 7) in got
    assert got[(7, 0)] == (N_BANDS, 1.0)  # exact dup: all bands, est 1.0
    assert (0, 7) not in got and (7, 17) not in got  # direction rules
    assert not any(a == 27 for a, _ in got)  # unique delta matches nothing


def test_keep_best_quality_matches_python_twin(spark, corpus_dir):
    """Quality-priority survivorship: among canonical dups 0/1/2, the
    padded mixed-case doc 2 scores lower alpha-ratio than 0/1, and the
    0-vs-1 exact tie falls to min doc_id."""
    import math
    import re as _re

    from databatchprotectionservice_spark.operators.dedup import (
        dedup_keep_best_quality,
    )

    got = {
        r.source: (r.n_kept, r.kept_bytes, r.avg_quality)
        for r in dedup_keep_best_quality(spark, corpus_dir).collect()
    }

    def quality(t):
        s = t.strip()
        n = 0 if not s else len(_re.split(r"\s+", s))
        alpha = len(_re.sub("[^a-zA-Z]", "", t)) / max(len(t), 1)
        return 0.5 * min(n / 50.0, 1.0) + 0.5 * alpha

    groups = {}
    for i, t in enumerate(TEXTS):
        groups.setdefault(_md5(t.strip().lower()), []).append(i)
    survivors = [
        min(ids, key=lambda i: (-quality(TEXTS[i]), i))
        for ids in groups.values()
    ]
    expect = {}
    for i in survivors:
        n, b, qs = expect.get(SOURCES[i], (0, 0, []))
        expect[SOURCES[i]] = (
            n + 1,
            b + len(TEXTS[i].encode()),
            qs + [quality(TEXTS[i])],
        )
    expect = {
        s: (n, b, math.floor(sum(qs) / len(qs) * 10000.0 + 0.5) / 10000.0)
        for s, (n, b, qs) in expect.items()
    }
    assert got == expect
    # doc 0 survives its group (exact tie with 1 -> min id; 2 scores
    # lower than 0/1 because padding dilutes its alpha ratio)
    assert quality(TEXTS[2]) < quality(TEXTS[0])
    assert 0 in survivors and 1 not in survivors and 2 not in survivors
