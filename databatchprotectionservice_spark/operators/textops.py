"""Text analysis operators over the ``documents`` table.

LLM-training-data pipeline primitives: token counting (whitespace + a
BPE-ish regex lexer), quality scoring, n-gram language identification, and
document fingerprinting (exact hash + min-of-shingle-hash winnowing).

All of it is **built-in Spark SQL functions only** — ``split`` /
``regexp_extract_all`` / ``transform`` / ``aggregate`` / ``md5`` — so the
whole stage runs inside whole-stage codegen with zero Python; at 100 TB
these are embarrassingly parallel scans with a final low-cardinality
aggregate. Every expression is written to evaluate identically in DuckDB
(the oracle): integer arithmetic and string hashing where possible,
``round(x, 4)`` where a float ratio is unavoidable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .relational import round_ieee, round_ieee_sql
from ..plans.registry import load_spread, local_frame, prep, register

# language marker words (scored by whole-word regex match count). The
# synthetic corpus is vocabulary-uniform, so the interesting property is
# determinism, not linguistic accuracy; markers are standard stopwords.
LANG_MARKERS = {
    "en": r"\b(the|of|and|a)\b",
    "fr": r"\b(le|la|les|et|une)\b",
    "es": r"\b(el|los|las|una|y)\b",
    "de": r"\b(der|die|das|und|ein)\b",
}
CJK_PATTERN = "[一-鿿]"

#: BPE-ish lexer: runs of letters | runs of digits | single non-space symbol
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _tokens(col):
    """Whitespace token count, empty-safe (identical CASE in the oracle)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def _alpha_ratio(col):
    """Alphabetic-character ratio, zero-length-safe (identical
    expression in the oracles that use it)."""
    return (
        F.length(F.regexp_replace(col, "[^a-zA-Z]", "")) * F.lit(1.0)
        / F.greatest(F.length(col), F.lit(1))
    )


def quality_score(col):
    """THE pipeline quality model — ``0.5 * least(n_tokens/50, 1) +
    0.5 * alpha_ratio`` — as one shared expression.  Used by
    ``text_quality_scores``, ``pipeline_training_prep`` and
    ``dedup_keep_best_quality`` (each mirrors it in its oracle); a
    tuning change here reaches every consumer, where three inlined
    copies once could drift apart silently."""
    return F.lit(0.5) * F.least(
        _tokens(col) / F.lit(50.0), F.lit(1.0)
    ) + F.lit(0.5) * _alpha_ratio(col)


@register(
    "text_token_stats",
    oracle="""
        SELECT
            source,
            count(*) AS n_docs,
            CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS sum_tokens,
            CAST(sum(length(text)) AS BIGINT) AS sum_chars,
            CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS sum_bpe_tokens,
            max(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS max_tokens
        FROM documents
        GROUP BY source
    """,
    description="token counting (whitespace + BPE-ish lexer) per source",
)
def text_token_stats(spark, sf_dir):
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_PATTERN), 0))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_tokens(F.col("text"))).alias("sum_tokens"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.sum(bpe).alias("sum_bpe_tokens"),
        F.max(_tokens(F.col("text"))).alias("max_tokens"),
    )


@register(
    "text_quality_scores",
    oracle="""
        SELECT
            doc_id,
            n_tokens,
            floor(alpha_ratio * 10000.0 + 0.5) / 10000.0 AS alpha_ratio,
            floor((0.5 * least(n_tokens / 50.0, 1.0) + 0.5 * alpha_ratio) * 10000.0 + 0.5) / 10000.0 AS quality
        FROM (
            SELECT
                doc_id,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                    / greatest(length(text), 1) AS alpha_ratio
            FROM documents
        )
    """,
    description="per-document quality score (length + alphabetic ratio)",
)
def text_quality_scores(spark, sf_dir):
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        _tokens(F.col("text")).alias("n_tokens"),
        round_ieee(_alpha_ratio(F.col("text"))).alias("alpha_ratio"),
        round_ieee(quality_score(F.col("text"))).alias("quality"),
    )


def _marker_count(col, pattern: str):
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), 0))


def language_guess_column(col):
    """Deterministic n-gram/stopword language guess with a fixed tie-break
    order (zh > en > fr > es > de)."""
    s = {lang: _marker_count(col, pat) for lang, pat in LANG_MARKERS.items()}
    cjk = F.size(F.regexp_extract_all(col, F.lit(CJK_PATTERN), 0))
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(
            (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] >= s["de"]),
            F.lit("en"),
        )
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["de"]), F.lit("fr"))
        .when(s["es"] >= s["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )


_LANG_ORACLE_SCORES = """
            SELECT
                doc_id,
                lang,
                len(regexp_extract_all(lower(text), '\\b(the|of|and|a)\\b')) AS s_en,
                len(regexp_extract_all(lower(text), '\\b(le|la|les|et|une)\\b')) AS s_fr,
                len(regexp_extract_all(lower(text), '\\b(el|los|las|una|y)\\b')) AS s_es,
                len(regexp_extract_all(lower(text), '\\b(der|die|das|und|ein)\\b')) AS s_de,
                len(regexp_extract_all(text, '[一-鿿]')) AS s_zh
            FROM documents
"""


@register(
    "text_language_id",
    oracle=f"""
        SELECT lang_guess, count(*) AS n_docs,
               CAST(sum(CASE WHEN lang_guess = lang THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_match_label
        FROM (
            SELECT doc_id, lang,
                   CASE WHEN s_zh > 0 THEN 'zh'
                        WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
                        WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
                        WHEN s_es >= s_de THEN 'es'
                        ELSE 'de' END AS lang_guess
            FROM ({_LANG_ORACLE_SCORES})
        )
        GROUP BY lang_guess
    """,
    description="n-gram heuristic language ID, grouped by guess",
)
def text_language_id(spark, sf_dir):
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    guessed = d.select(
        "doc_id", "lang", language_guess_column(F.col("text")).alias("lang_guess")
    )
    return guessed.groupBy("lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("lang_guess") == F.col("lang"), 1).otherwise(0)
        ).alias("n_match_label"),
    )


@register(
    "text_fingerprints",
    oracle="""
        SELECT
            doc_id,
            md5(lower(trim(text))) AS exact_fp,
            list_aggregate(
                list_transform(
                    [array_to_string(w[i:i+4], ' ')
                     for i in range(1, greatest(len(w) - 4, 1) + 1)],
                    g -> md5(g)
                ), 'min') AS winnow_fp
        FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
            , text FROM documents
        )
    """,
    description="exact md5 fingerprint + min-of-5-gram-hash winnowing fingerprint",
)
def text_fingerprints(spark, sf_dir):
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    # multiplicity kept (array_min is insensitive), shared n-gram shape
    grams = _word_ngrams(F.col("text"), 5, distinct=False)
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim("text"))).alias("exact_fp"),
        F.array_min(F.transform(grams, F.md5)).alias("winnow_fp"),
    )


TFIDF_TOP_K = 3
TFIDF_DOC_LIMIT = 100  # bound the emitted rows; df is corpus-wide


@register(
    "text_tfidf_top_terms",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
                       AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tok GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   CAST(tf.tf AS BIGINT) AS tf,
                   CAST(df.df AS BIGINT) AS df,
                   CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
                       / CAST(df.df AS DOUBLE) AS score
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df,
               floor(score * 10000.0 + 0.5) / 10000.0 AS score
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, term) AS rk
            FROM scored
        )
        WHERE rk <= {TFIDF_TOP_K} AND doc_id < {TFIDF_DOC_LIMIT}
        ORDER BY doc_id, score DESC, term
    """,
    description="per-document top TF-IDF terms (rational idf N/df — no "
    "transcendental fn, so scores are bit-equal across engines); "
    "corpus-wide document frequencies via explode + two aggregations",
)
def text_tfidf_top_terms(spark, sf_dir):
    """TF-IDF with the rational idf variant (N/df instead of log(N/df)
    — order-equivalent per fixed tf, and exactly reproducible across
    engines since it stays in IEEE +,*,/). Shape: explode to (doc, term)
    rows once; tf = count per (doc, term); df = distinct-doc count per
    term (corpus-wide, computed BEFORE the output limit); broadcast-join
    the tiny df/N sides back. At 100 TB the tok explode is the big
    intermediate — it shuffles once to the (doc_id, term) grouping and
    the df aggregate reuses the same exploded pass."""
    from pyspark.sql.window import Window

    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # r16 (guide §2.3): tf holds exactly one row per DISTINCT
    # (doc, term), so the document frequency is a plain count over tf —
    # the old countDistinct(doc_id) over the raw token explode re-ran
    # the corpus-wide expand+dedup a second time for the same answer.
    # tf (distinct pairs, far smaller than the token stream) is the
    # frame both consumers share, so IT is what gets cached.
    tf.cache()
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size rides the plan as a broadcast 1-row aggregate (the
    # `tot` convention): a driver-side d.count() would schedule an
    # extra full scan before the main job
    n_docs = d.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    scored = (
        # the doc_id output bound applies BEFORE the join and the
        # window sort (df/n_docs stay corpus-wide above, so values are
        # unchanged) — the window ranks only the emitted docs' terms
        tf.filter(F.col("doc_id") < TFIDF_DOC_LIMIT)
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * F.col("n_docs")
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            round_ieee(F.col("score")).alias("score"),
        )
        .orderBy("doc_id", F.desc("score"), "term")
    )


# ---------------------------------------------------------------------------
# RAG-style document chunking: overlapping word windows
# ---------------------------------------------------------------------------

CHUNK_WORDS = 32  # window size
CHUNK_STRIDE = 24  # 8-word overlap between consecutive chunks


@register(
    "text_chunk_windows",
    # chunk k covers words [k*S+1, k*S+W]; a doc of n words yields
    # ceil((n-W)/S)+1 chunks (min 1) so every word is covered and the
    # final chunk may run short — the standard RAG chunking contract
    oracle=f"""
        WITH w AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS words
            FROM documents
        ),
        n AS (
            SELECT doc_id, words,
                   greatest(CAST(ceil((len(words) - {CHUNK_WORDS}) * 1.0
                                      / {CHUNK_STRIDE}) AS INT) + 1,
                            1) AS n_chunks
            FROM w
        )
        SELECT doc_id,
               i - 1 AS chunk_idx,
               len(words[(i - 1) * {CHUNK_STRIDE} + 1 :
                         (i - 1) * {CHUNK_STRIDE} + {CHUNK_WORDS}])
                   AS n_words,
               md5(array_to_string(
                   words[(i - 1) * {CHUNK_STRIDE} + 1 :
                         (i - 1) * {CHUNK_STRIDE} + {CHUNK_WORDS}], ' '))
                   AS chunk_md5
        FROM n, UNNEST(range(1, n_chunks + 1)) AS t(i)
    """,
    description="RAG document chunking: overlapping word windows "
    "(size 32, stride 24), pure codegen explode — no Python",
)
def text_chunk_windows(spark, sf_dir):
    """Chunk every document into overlapping word windows — the
    retrieval/training preprocessing shape. Pure built-in expressions:
    split -> sequence -> posexplode -> slice/concat_ws/md5, all inside
    whole-stage codegen; the only data movement is the explode's
    row-count change (no shuffle until a consumer aggregates). At
    100 TB this is a map-only stage that chunks each partition
    independently."""
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    n_chunks = F.greatest(
        F.ceil(
            (F.size(words) - F.lit(CHUNK_WORDS))
            * F.lit(1.0)
            / F.lit(CHUNK_STRIDE)
        ).cast("int")
        + F.lit(1),
        F.lit(1),
    )
    chunked = d.select(
        "doc_id",
        words.alias("words"),
        F.posexplode(F.sequence(F.lit(1), n_chunks)).alias("pos", "i"),
    )
    chunk = F.slice(
        F.col("words"),
        (F.col("i") - 1) * CHUNK_STRIDE + 1,
        CHUNK_WORDS,
    )
    return chunked.select(
        "doc_id",
        (F.col("i") - 1).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_words"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


@register(
    "pipeline_training_prep",
    # the full prep pipeline restated in SQL: quality gate -> language
    # gate -> keep-one dedup (min doc_id per canonical fingerprint) ->
    # per-source stats
    oracle="""
        WITH scored AS (
            SELECT doc_id, source, text,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tokens,
                   length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                       / greatest(length(text), 1) AS alpha_ratio,
                   lang
            FROM documents
        ),
        gated AS (
            SELECT *,
                   0.5 * least(n_tokens / 50.0, 1.0) + 0.5 * alpha_ratio
                       AS quality
            FROM scored
            WHERE lang = 'en'
        ),
        kept AS (
            SELECT * FROM (
                SELECT *,
                       row_number() OVER (
                           PARTITION BY md5(lower(trim(text)))
                           ORDER BY doc_id) AS rn
                FROM gated WHERE quality >= 0.5
            ) WHERE rn = 1
        )
        SELECT source,
               count(*) AS n_kept,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               floor(avg(quality) * 10000.0 + 0.5) / 10000.0 AS avg_quality
        FROM kept
        GROUP BY source
    """,
    description="end-to-end training-data prep: quality gate -> language "
    "gate -> keep-one dedup -> per-source stats, one composed plan",
)
def pipeline_training_prep(spark, sf_dir):
    """The composed shape everything else in this package exists for:
    score -> filter -> dedup -> aggregate as ONE declarative plan, so
    Catalyst pushes the language/quality gates into the scan and the
    only shuffles are the dedup fingerprint exchange and the final
    per-source aggregate. At 100 TB each stage is the operator already
    audited individually (quality scoring: codegen expressions; dedup:
    16-byte digest shuffle, not text)."""
    from pyspark.sql.window import Window

    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    scored = d.filter(F.col("lang") == "en").select(
        "doc_id",
        "source",
        "text",
        _tokens(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )
    gated = scored.filter(F.col("quality") >= 0.5)
    w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    kept = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        round_ieee(F.avg("quality")).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# Train/eval decontamination: n-gram overlap against a held-out eval set
# ---------------------------------------------------------------------------

#: word-n-gram width for contamination detection. Classic pipelines use
#: 8-13 word grams; 8 keeps short synthetic docs representable while
#: still requiring a verbatim 8-word run to count as contamination.
DECON_NGRAM = 8
#: eval split: every 20th doc_id is the held-out benchmark set (5%).
DECON_EVAL_MOD = 20


def _word_ngrams(col, n: int, distinct: bool = True):
    """Word n-grams of ``col`` — THE shared split/trim/sequence/slice
    shape (``dedup.shingled`` and ``dedup.minhash_signatures`` build on
    it too, so the short-document rule ``greatest(size - (n-1), 1)``
    lives in exactly one place). Documents shorter than ``n`` words
    contribute one truncated gram (the whole document).
    ``distinct=False`` keeps multiplicity (min-hash is insensitive to
    it and skips the dedup pass)."""
    words = F.split(F.trim(col), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(grams) if distinct else grams


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id,
                   list_distinct([array_to_string(w[i:i+{DECON_NGRAM - 1}], ' ')
                                  for i in range(1, greatest(len(w) - {DECON_NGRAM - 1}, 1) + 1)]) AS gs
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
                  FROM documents)
        ),
        ex AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
        eval_g AS (
            SELECT DISTINCT gram FROM ex WHERE doc_id % {DECON_EVAL_MOD} = 0
        ),
        hits AS (
            SELECT e.doc_id, count(*) AS n_hit
            FROM ex e JOIN eval_g USING (gram)
            WHERE e.doc_id % {DECON_EVAL_MOD} <> 0
            GROUP BY e.doc_id
        )
        SELECT h.doc_id,
               CAST(h.n_hit AS BIGINT) AS n_hit,
               CAST(len(g.gs) AS BIGINT) AS n_grams,
               {round_ieee_sql("h.n_hit * 1.0 / len(g.gs)")} AS contamination
        FROM hits h JOIN grams g USING (doc_id)
    """,
    description="train/eval decontamination: flag training docs sharing a "
    f"verbatim {DECON_NGRAM}-word run with the held-out eval split",
)
def decontaminate_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination, the step between raw dedup and training:
    the eval split's distinct n-grams form a (small) probe set and every
    training document sharing at least one verbatim n-gram is reported
    with its overlap ratio.

    100 TB shape: eval suites are tiny relative to the corpus (here 5%,
    in production a fixed benchmark list), so the probe set is a
    **broadcast** hash join — the corpus-side explode streams through it
    map-side with NO shuffle of training grams; the only exchange is the
    per-doc hit aggregate, map-side combined to at most one row per
    contaminated doc. The gram explode is computed once per side off a
    shared scan (Catalyst reuses the parquet scan; grams are distinct
    per doc so ``count(*)`` counts distinct hit grams with no extra
    dedup pass)."""
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    gs = _word_ngrams(F.col("text"), DECON_NGRAM)
    # eval side: the doc_id filter pushes into the scan, so the gram HOF
    # runs over the 5% eval slice only
    eval_g = (
        d.filter(is_eval)
        .select(F.explode(gs).alias("gram"))
        .distinct()
    )
    # train side: ONE gram pass feeding the broadcast probe join (the
    # r6-draft shape recomputed the gram HOF over the full corpus three
    # times — measured 3x this plan's cost)
    train_ex = d.filter(~is_eval).select("doc_id", F.explode(gs).alias("gram"))
    hits = (
        train_ex.join(F.broadcast(eval_g), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    # per-doc gram totals only for the (few) contaminated docs: broadcast
    # the hit set back onto the scan so the second gram HOF evaluates
    # after the join filter, i.e. on contaminated rows only
    return d.join(F.broadcast(hits), "doc_id").select(
        "doc_id",
        "n_hit",
        F.size(gs).cast("long").alias("n_grams"),
        round_ieee(
            F.col("n_hit") * F.lit(1.0) / F.size(gs).cast("long")
        ).alias("contamination"),
    )


# ---------------------------------------------------------------------------
# Repetition scoring (Gopher-style repetitive-document detection)
# ---------------------------------------------------------------------------

#: a document whose single most frequent word-bigram accounts for more
#: than this fraction of all its bigrams is flagged repetitive
REP_TOP_BIGRAM_FRAC = 0.18
#: ... or whose words are this fraction duplicates (1 - distinct/total)
REP_DUP_WORD_FRAC = 0.60


@register(
    "text_repetition_scores",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents
        ),
        bg AS (
            SELECT doc_id,
                   unnest([array_to_string(w[i:i+1], ' ')
                           for i in range(1, greatest(len(w) - 1, 1) + 1)]) AS gram
            FROM toks
        ),
        bgc AS (
            SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY doc_id, gram
        ),
        bstats AS (
            SELECT doc_id, max(c) AS top_cnt, CAST(sum(c) AS BIGINT) AS n_bigrams
            FROM bgc GROUP BY doc_id
        ),
        wstats AS (
            SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct
            FROM toks
        )
        SELECT w.doc_id,
               CAST(w.n_words AS BIGINT) AS n_words,
               {round_ieee_sql("1.0 - w.n_distinct * 1.0 / w.n_words")} AS dup_word_frac,
               CASE WHEN w.n_words < 2 THEN 0.0
                    ELSE {round_ieee_sql("b.top_cnt * 1.0 / b.n_bigrams")}
               END AS top_bigram_frac,
               CAST(CASE WHEN (CASE WHEN w.n_words < 2 THEN 0.0
                               ELSE {round_ieee_sql("b.top_cnt * 1.0 / b.n_bigrams")}
                               END) > {REP_TOP_BIGRAM_FRAC}
                          OR {round_ieee_sql("1.0 - w.n_distinct * 1.0 / w.n_words")} > {REP_DUP_WORD_FRAC}
                         THEN 1 ELSE 0 END AS BIGINT) AS repetitive
        FROM wstats w JOIN bstats b USING (doc_id)
    """,
    description="Gopher-style repetition scores: duplicate-word fraction "
    "and top-bigram share, with a repetitive flag",
)
def text_repetition_scores(spark, sf_dir):
    """Repetitive-document detection (the Gopher quality rules' repetition
    family): per document, the duplicate-word fraction and the share of
    bigrams taken by the single most frequent bigram; docs past either
    threshold are flagged.

    100 TB shape: duplicate-word fraction is pure codegen on the row
    (``array_distinct``/``size``). The top-bigram share needs a per-doc
    mode, computed by exploding bigrams and double-aggregating — both
    aggregates are map-side combined and keyed by doc_id, so the shuffle
    carries one row per (doc, distinct bigram), never the text."""
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    # multiplicity kept (the aggregate counts it), shared n-gram shape
    bigrams = _word_ngrams(F.col("text"), 2, distinct=False)
    wstats = d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )
    bstats = (
        d.select("doc_id", F.explode(bigrams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_cnt"),
            F.sum("c").cast("bigint").alias("n_bigrams"),
        )
    )
    dup_word = round_ieee(
        F.lit(1.0) - F.col("n_distinct") * F.lit(1.0) / F.col("n_words")
    )
    # a 0/1-word doc has one degenerate "bigram" (the whole text); score 0
    top_bigram = F.when(F.col("n_words") < 2, F.lit(0.0)).otherwise(
        round_ieee(F.col("top_cnt") * F.lit(1.0) / F.col("n_bigrams"))
    )
    return wstats.join(bstats, "doc_id").select(
        "doc_id",
        "n_words",
        dup_word.alias("dup_word_frac"),
        top_bigram.alias("top_bigram_frac"),
        F.when(
            (top_bigram > F.lit(REP_TOP_BIGRAM_FRAC))
            | (dup_word > F.lit(REP_DUP_WORD_FRAC)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("repetitive"),
    )


# ---------------------------------------------------------------------------
# Passage-level exact-substring duplication (cross-doc boilerplate)
# ---------------------------------------------------------------------------

#: words per passage shingle — long enough that a match is verbatim
#: boilerplate (license headers, navigation chrome, templated intros),
#: the signal the "deduplicating training data" line of work removes at
#: the passage level rather than the whole-document level
PASSAGE_N = 8


@register(
    "dedup_repeated_passages",
    oracle=f"""
        WITH g AS (
            SELECT doc_id, source,
                   unnest(list_distinct(
                       [array_to_string(w[i:i+{PASSAGE_N - 1}], ' ')
                        for i in range(1,
                            greatest(len(w) - {PASSAGE_N - 1}, 1) + 1)]))
                       AS gram
            FROM (SELECT doc_id, source,
                         regexp_split_to_array(trim(text), '\\s+') AS w
                  FROM documents)
        ),
        d AS (
            SELECT gram, count(*) AS df FROM g
            GROUP BY gram HAVING count(*) >= 2
        ),
        hit AS (
            SELECT g.doc_id, g.source, d.df
            FROM g JOIN d USING (gram)
        ),
        per_doc AS (
            SELECT doc_id, source, count(*) AS n_rep, max(df) AS mx
            FROM hit GROUP BY 1, 2
        )
        SELECT source,
               count(*) AS n_docs_affected,
               CAST(sum(n_rep) AS BIGINT) AS n_repeated_passages,
               CAST(max(mx) AS BIGINT) AS max_passage_df
        FROM per_doc
        GROUP BY source
    """,
    description=f"passage-level exact-substring dup detection: verbatim "
    f"{PASSAGE_N}-word runs recurring across documents (cross-doc "
    "boilerplate), per-source impact",
)
def dedup_repeated_passages(spark, sf_dir):
    """Exact SUBSTRING-level duplication — the dimension whole-document
    dedup misses: two distinct documents sharing a verbatim 8-word run
    (license boilerplate, scraped navigation chrome, templated intros).
    Inverted-index shape, not pairwise: per-doc distinct passage
    shingles hash to 16-byte digests, and the corpus-wide document
    frequency per digest is a WINDOW count over the digest partition —
    one shuffle tags every row with its passage's df, so the exploded
    gram stream is scanned exactly ONCE (the groupBy-then-join-back
    formulation evaluated the explode on both join sides: Spark's
    ReuseExchange can't fire because the two sides project different
    columns). Intra-doc repeats are excluded up front
    (``array_distinct``) — ``text_repetition_scores`` owns that signal.

    100 TB shape: text never shuffles — both exchanges carry md5
    digests; no self-join exists anywhere, so there is no quadratic
    bucket to guard (unlike the pair-forming LSH ops — df fan-out is
    linear in corpus size)."""
    from pyspark.sql.window import Window

    prep(spark)
    docs = load_spread(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id",
        "source",
        F.explode(_word_ngrams(F.col("text"), PASSAGE_N)).alias("gram"),
    ).select("doc_id", "source", F.md5("gram").alias("gid"))
    hit = ex.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("gid"))
    ).filter(F.col("df") >= 2)
    per_doc = hit.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_rep"), F.max("df").alias("mx")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_affected"),
        F.sum("n_rep").cast("bigint").alias("n_repeated_passages"),
        F.max("mx").cast("bigint").alias("max_passage_df"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM surprisal scoring (float-free perplexity proxy)
# ---------------------------------------------------------------------------


@register(
    "text_unigram_surprisal",
    oracle="""
        WITH tok AS (
            SELECT doc_id, source, unnest(
                regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
        ),
        cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        tot AS (SELECT count(*) AS n FROM tok),
        scored AS (
            SELECT t.doc_id, t.source,
                   length(format('{:b}', tot.n // cnt.c)) - 1 AS surp
            FROM tok t JOIN cnt ON t.w = cnt.w CROSS JOIN tot
        ),
        per_doc AS (
            SELECT doc_id, source,
                   count(*) AS n_tok,
                   sum(surp) AS s
            FROM scored GROUP BY 1, 2
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
               CAST(sum(s) AS BIGINT) AS sum_surprisal,
               CAST(sum(s) * 10000 // sum(n_tok) AS BIGINT)
                   AS avg_surprisal_e4
        FROM per_doc
        GROUP BY source
    """,
    description="corpus-unigram LM surprisal scoring: integer "
    "floor(log2(N/count)) per token — the float-free formulation of "
    "perplexity-based quality filtering",
)
def text_unigram_surprisal(spark, sf_dir):
    """Unigram language-model scoring — the classic perplexity-style
    quality filter (rank documents by how surprising their tokens are
    under a corpus-trained LM), formulated FLOAT-FREE so the oracle is
    exact: each token's surprisal is the integer
    ``floor(log2(N / count(w)))`` (0 for the most common words, large
    for rare ones — exactly the quantized ``-log2 p(w)`` up to the
    constant ``log2 N``), integers sum without order hazards, and the
    per-source average ships as a 1e4-scaled integer division.

    100 TB shape: one groupBy over tokens (map-side combined to the
    vocabulary size), the corpus total N as a 1-row broadcast, one join
    of tokens to vocab counts (broadcastable: vocabularies are tiny
    next to corpora), one final low-cardinality aggregate. The token
    explosion itself never materializes text beyond each token."""
    prep(spark)
    docs = load_spread(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.groupBy().agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tok.join(F.broadcast(cnt), "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            (
                F.length(F.expr("bin(n div c)")) - F.lit(1)
            ).cast("bigint").alias("surp"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_tok"), F.sum("surp").alias("s")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        F.sum("s").cast("bigint").alias("sum_surprisal"),
        F.expr("CAST(sum(s) * 10000 div sum(n_tok) AS BIGINT)").alias(
            "avg_surprisal_e4"
        ),
    )


# ---------------------------------------------------------------------------
# CCNet-style cross-document segment dedup WITH text reconstruction
# ---------------------------------------------------------------------------

#: words per non-overlapping segment ("paragraph" unit). CCNet dedups
#: web text at the paragraph level; the synthetic corpus has no line
#: breaks, so fixed 5-word windows stand in for paragraphs — short
#: enough that cross-doc repeats actually occur, long enough that a
#: match is a verbatim shared phrase.
CCNET_SEG_WORDS = 5


@register(
    "dedup_lines_ccnet",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, source,
                   regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents
        ),
        -- segment count derived FROM the data (ceil(len(w)/seg)), not a
        -- fixed constant: a doc of any length segments fully, exactly
        -- like the Spark side's sequence() bound (ADVICE r7: the old
        -- range(0, 8192) cross join silently truncated docs > 40,960
        -- words)
        numbered AS (
            SELECT doc_id, source, w,
                   unnest(range(0, (len(w) + {CCNET_SEG_WORDS} - 1)
                                   // {CCNET_SEG_WORDS})) AS sn
            FROM words
        ),
        segs AS (
            SELECT doc_id, source, sn AS seg_no,
                   array_to_string(
                       w[sn*{CCNET_SEG_WORDS}+1 : sn*{CCNET_SEG_WORDS}+{CCNET_SEG_WORDS}],
                       ' ') AS seg
            FROM numbered
        ),
        marked AS (
            SELECT doc_id, source, seg_no, seg,
                   min(doc_id) OVER (PARTITION BY seg) AS keeper
            FROM segs
        ),
        per_doc AS (
            SELECT doc_id, source,
                   count(*) AS n_segments,
                   CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_removed,
                   md5(coalesce(string_agg(
                       CASE WHEN doc_id = keeper THEN seg END,
                       ' ' ORDER BY seg_no), '')) AS kept_md5
            FROM marked GROUP BY 1, 2
        )
        SELECT doc_id, source, n_segments, n_removed, kept_md5
        FROM per_doc WHERE n_removed > 0
    """,
    description=f"CCNet-style cross-doc segment dedup: non-overlapping "
    f"{CCNET_SEG_WORDS}-word segments removed wherever an earlier doc "
    "already contains them, filtered text REBUILT and fingerprinted",
)
def dedup_lines_ccnet(spark, sf_dir):
    """Cross-document SEGMENT REMOVAL with reconstruction — the CCNet /
    C4 preprocessing step that ``dedup_repeated_passages`` only
    DETECTS: every non-overlapping 5-word segment that already occurs
    in an earlier document (min doc_id keeps all its occurrences) is
    dropped, and the surviving segments are reassembled in order into
    the cleaned text, proven byte-exact by an md5 the oracle recomputes
    from first principles. Output: the affected documents with segment
    counts and the cleaned-text fingerprint.

    Dataflow: one pass segments each doc JVM-side (``sequence`` +
    ``slice`` over the split word array — no per-word explode); the
    keep decision is a single window MIN over the segment digest (the
    same one-shuffle-tags-all-rows shape as ``dedup_repeated_passages``
    — no groupBy-plus-join-back double scan); reassembly is
    ``collect_list`` of (seg_no, seg) per doc, sorted and joined.

    100 TB shape: the only exchanges carry (digest, doc_id, seg_no,
    seg) — the segment text must cross the wire because reassembly
    needs it back, but never the full document; the window partition is
    the 16-byte digest (uniform), and the per-doc reassembly shuffle is
    keyed by doc_id. A degenerate corpus (one segment repeated
    everywhere) makes a hot digest partition: the window computes only
    MIN over it (no pair formation), so cost stays linear in
    occurrences — no Σ bucket² term exists in this operator."""
    from pyspark.sql.window import Window

    prep(spark)
    docs = load_spread(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n_segs = F.ceil(F.size(w) / CCNET_SEG_WORDS).cast("int")
    segs_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(
            F.slice(w, i * CCNET_SEG_WORDS + 1, CCNET_SEG_WORDS), " "
        ),
    )
    segs = docs.select(
        "doc_id", "source", F.posexplode(segs_arr).alias("seg_no", "seg")
    ).withColumn("gid", F.md5("seg"))
    marked = segs.withColumn(
        "keeper", F.min("doc_id").over(Window.partitionBy("gid"))
    )
    kept_struct = F.when(
        F.col("doc_id") == F.col("keeper"),
        F.struct(F.col("seg_no"), F.col("seg")),
    )
    per_doc = marked.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.seg,
                ),
                " ",
            )
        ).alias("kept_md5"),
    )
    return per_doc.filter(F.col("n_removed") > 0).select(
        "doc_id", "source", "n_segments", "n_removed", "kept_md5"
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training: iterative global pair merging, fully gated
# ---------------------------------------------------------------------------

#: fixed merge-round count — like PageRank's fixed iterations, what
#: keeps an inherently sequential training loop oracle-gateable (the
#: oracle unrolls the same rounds as chained CTEs)
BPE_MERGES = 5

#: merge placeholders: Private Use Area code points, guaranteed absent
#: from any real corpus text, one per round (NOT Spark's char(): that
#: builtin wraps code points at 256)
BPE_PLACEHOLDERS = [chr(0xE000 + i) for i in range(BPE_MERGES)]


@register(
    "text_bpe_train",
    # both engines: pairs are CHARACTER-adjacent substrings; the best
    # pair per round is (max count, lexicographically smallest) —
    # fully deterministic; replace() is left-to-right non-overlapping
    # in Spark and DuckDB alike, so self-overlapping pairs ('aa' in
    # 'aaa') rewrite identically.  The lateral-free
    # unnest(range(1, length(t))) keeps the bound derived from the
    # data (the ccnet lesson).
    oracle="""
        WITH t0 AS (SELECT doc_id, text AS t FROM documents),
        p1 AS (
            SELECT substr(t, CAST(i AS INT), 2) AS pair, count(*) AS c
            FROM (SELECT t, unnest(range(1, length(t))) AS i FROM t0)
            GROUP BY 1
        ),
        b1 AS (SELECT pair, c FROM p1 ORDER BY c DESC, pair LIMIT 1),
        t1 AS (
            SELECT doc_id,
                   replace(t, (SELECT pair FROM b1), '') AS t
            FROM t0
        ),
        p2 AS (
            SELECT substr(t, CAST(i AS INT), 2) AS pair, count(*) AS c
            FROM (SELECT t, unnest(range(1, length(t))) AS i FROM t1)
            GROUP BY 1
        ),
        b2 AS (SELECT pair, c FROM p2 ORDER BY c DESC, pair LIMIT 1),
        t2 AS (
            SELECT doc_id,
                   replace(t, (SELECT pair FROM b2), '') AS t
            FROM t1
        ),
        p3 AS (
            SELECT substr(t, CAST(i AS INT), 2) AS pair, count(*) AS c
            FROM (SELECT t, unnest(range(1, length(t))) AS i FROM t2)
            GROUP BY 1
        ),
        b3 AS (SELECT pair, c FROM p3 ORDER BY c DESC, pair LIMIT 1),
        t3 AS (
            SELECT doc_id,
                   replace(t, (SELECT pair FROM b3), '') AS t
            FROM t2
        ),
        p4 AS (
            SELECT substr(t, CAST(i AS INT), 2) AS pair, count(*) AS c
            FROM (SELECT t, unnest(range(1, length(t))) AS i FROM t3)
            GROUP BY 1
        ),
        b4 AS (SELECT pair, c FROM p4 ORDER BY c DESC, pair LIMIT 1),
        t4 AS (
            SELECT doc_id,
                   replace(t, (SELECT pair FROM b4), '') AS t
            FROM t3
        ),
        p5 AS (
            SELECT substr(t, CAST(i AS INT), 2) AS pair, count(*) AS c
            FROM (SELECT t, unnest(range(1, length(t))) AS i FROM t4)
            GROUP BY 1
        ),
        b5 AS (SELECT pair, c FROM p5 ORDER BY c DESC, pair LIMIT 1),
        t5 AS (
            SELECT doc_id,
                   replace(t, (SELECT pair FROM b5), '') AS t
            FROM t4
        )
        SELECT 1 AS merge_round,
               (SELECT pair FROM b1) AS pair,
               CAST((SELECT c FROM b1) AS BIGINT) AS n_occurrences,
               (SELECT CAST(sum(length(t)) AS BIGINT) FROM t1)
                   AS corpus_len_after
        UNION ALL
        SELECT 2 AS merge_round,
               (SELECT pair FROM b2) AS pair,
               CAST((SELECT c FROM b2) AS BIGINT) AS n_occurrences,
               (SELECT CAST(sum(length(t)) AS BIGINT) FROM t2)
                   AS corpus_len_after
        UNION ALL
        SELECT 3 AS merge_round,
               (SELECT pair FROM b3) AS pair,
               CAST((SELECT c FROM b3) AS BIGINT) AS n_occurrences,
               (SELECT CAST(sum(length(t)) AS BIGINT) FROM t3)
                   AS corpus_len_after
        UNION ALL
        SELECT 4 AS merge_round,
               (SELECT pair FROM b4) AS pair,
               CAST((SELECT c FROM b4) AS BIGINT) AS n_occurrences,
               (SELECT CAST(sum(length(t)) AS BIGINT) FROM t4)
                   AS corpus_len_after
        UNION ALL
        SELECT 5 AS merge_round,
               (SELECT pair FROM b5) AS pair,
               CAST((SELECT c FROM b5) AS BIGINT) AS n_occurrences,
               (SELECT CAST(sum(length(t)) AS BIGINT) FROM t5)
                   AS corpus_len_after
    """,
    description="byte-pair-encoding tokenizer TRAINING on the corpus: "
    "5 merge rounds of global pair counting -> argmax -> rewrite, "
    "emitting each learned merge and the shrinking corpus length",
)
def text_bpe_train(spark, sf_dir):
    """Train a BPE tokenizer ON the corpus — the canonical
    LLM-pipeline job that is genuinely iterative-global: each merge
    round needs a FULL-corpus pair histogram (map-side combinable
    groupBy), a global argmax (1-row driver action, like the k-means
    centroid collect), and a corpus rewrite that the next round
    depends on.  Learned merges become single Private-Use-Area
    characters so later rounds can merge merged tokens (hierarchical
    vocabulary growth, exactly real BPE).

    100 TB shape: per round, the only exchange is the pair-count
    aggregate (combiner-friendly: pairs per partition collapse before
    the shuffle); the rewrite is a map-only scan; the driver sees ONE
    row per round.  r15: round r's corpus length is an ``observe()``
    metric on the rewritten frame, resolved for free by round r+1's
    pair-count action (which must scan every rewritten row anyway to
    aggregate), so a round costs ONE job — the old separate
    cache-materializing length aggregate is gone and only the final
    round pays a dedicated length job (nothing scans its rewrite
    otherwise).  The rewrite stays persisted so each round's single
    scan starts from the previous round's cached text.

    Deployment caveat (ADVICE r15): ``observe()`` metrics ride Spark
    accumulators, whose transformation-side semantics are AT LEAST
    ONCE — task retries, stage resubmission after fetch failures, or
    speculative duplicates can double-count rows on a multi-executor
    cluster.  On such deployments (or whenever ``spark.speculation``
    is enabled) prefer the pre-r15 dedicated length aggregate
    (``df.agg(sum(length(t)))`` per round — exactly-once, one extra
    job per round); the observe() shortcut is exact on this
    single-process bench rig, where no fetch failure or speculation
    path exists.

    The oracle unrolls the identical five rounds as chained CTEs, so
    training — not just tokenization — holds to the full hash gate."""
    from pyspark.sql import Observation

    prep(spark)
    df = load_spread(spark, sf_dir, "documents").select(
        F.col("text").alias("t")
    )
    rows = []
    cached = []  # rounds' rewrites, unpersisted on exit
    pending = None  # previous round's corpus-length Observation
    for r in range(BPE_MERGES):
        ph = BPE_PLACEHOLDERS[r]
        pairs = (
            df.select(
                F.explode(
                    F.expr(
                        "CASE WHEN length(t) > 1 THEN "
                        "transform(sequence(1, length(t) - 1), "
                        "i -> substring(t, i, 2)) "
                        "ELSE array() END"
                    )
                ).alias("pair")
            )
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = pairs.orderBy(F.desc("c"), F.asc("pair")).limit(1).collect()
        if pending is not None:
            # this collect scanned every row of the previous round's
            # rewrite, so its observed length metric is now final.
            # INVARIANT: the pair-count action above must FULLY scan
            # the observed frame (it aggregates over every rewritten
            # row) — a future limit/filter short-circuit would make
            # Observation.get block forever.  The observed sum is NULL
            # on an empty rewritten corpus -> NULL corpus_len, the
            # same shape as the degenerate-round rows below.
            n = pending.get["n"]
            rows[-1] = rows[-1][:3] + (None if n is None else int(n),)
            pending = None
        if not best:
            # degenerate corpus (every text below 2 chars): the oracle
            # still emits one row per remaining round — its bN scalar
            # subqueries go empty (NULL pair), which NULLs the rewritten
            # text and the corpus length; mirror those NULL rows instead
            # of returning fewer rows than the gate expects
            for rr in range(r, BPE_MERGES):
                rows.append((rr + 1, None, None, None))
            break
        pair, c = best[0]["pair"], int(best[0]["c"])
        # literal-safe: the corpus-derived pair goes through F.lit, not
        # SQL-string interpolation (a quote/backslash in the winning
        # bigram would break or rewrite an interpolated expression)
        obs = Observation()
        df = (
            df.select(
                F.replace(F.col("t"), F.lit(pair), F.lit(ph)).alias("t")
            )
            .observe(obs, F.sum(F.length("t")).cast("bigint").alias("n"))
            .persist()
        )
        cached.append(df)
        rows.append((r + 1, pair, c, None))
        pending = obs
    if pending is not None:
        # the last round's rewrite has no later scan to piggyback on:
        # one dedicated length aggregate materializes it and fires the
        # observation (read the aggregate, not the metric — same value,
        # no wait-for-listener race)
        corpus_len = df.agg(
            F.sum(F.length("t")).cast("bigint").alias("n")
        ).collect()[0]["n"]
        rows[-1] = rows[-1][:3] + (int(corpus_len),)
    for d in cached:
        d.unpersist()
    return local_frame(
        spark,
        rows,
        "merge_round int, pair string, n_occurrences long, "
        "corpus_len_after long",
    )


# ---------------------------------------------------------------------------
# BPE tokenizer ENCODE: apply a shipped merge table in one map-only pass
# ---------------------------------------------------------------------------

#: The shipped tokenizer artifact: an ordered merge table, applied
#: sequentially (real BPE semantics — later merges may reference the
#: placeholder a previous merge produced, here merge #3 building "er "
#: out of merge #2's "er").  Placeholders live in a different PUA range
#: than the training query's so the two can never collide.
BPE_ENCODE_MERGES: list[tuple[str, str]] = [
    (" s", ""),
    ("er", ""),
    (" ", ""),  # hierarchical: ("er", " ") -> "er "
    ("in", ""),
    ("ow", ""),
]


@register(
    "text_bpe_encode",
    # literal PUA characters are embedded in the SQL below (invisible
    # in most terminals, same convention as the training oracle)
    oracle="""
        WITH t1 AS (
            SELECT doc_id, source, length(text) AS n_chars,
                   replace(text, ' s', '') AS t
            FROM documents
        ),
        t2 AS (SELECT doc_id, source, n_chars,
                      replace(t, 'er', '') AS t FROM t1),
        t3 AS (SELECT doc_id, source, n_chars,
                      replace(t, ' ', '') AS t FROM t2),
        t4 AS (SELECT doc_id, source, n_chars,
                      replace(t, 'in', '') AS t FROM t3),
        t5 AS (SELECT doc_id, source, n_chars,
                      replace(t, 'ow', '') AS t FROM t4)
        SELECT doc_id, source,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(length(t) AS BIGINT) AS n_tokens,
               CAST(n_chars - length(t) AS BIGINT) AS n_merges_applied,
               CASE WHEN length(t) = 0 THEN NULL
                    ELSE floor(n_chars * 1.0 / length(t) * 10000.0 + 0.5)
                         / 10000.0 END AS compression,
               md5(t) AS tok_md5
        FROM t5
    """,
    description="BPE tokenizer ENCODE: the shipped 5-entry merge table "
    "applied sequentially in one map-only scan; per-doc token counts, "
    "compression ratio and an md5 of the exact token stream",
)
def text_bpe_encode(spark, sf_dir):
    """The other half of the tokenizer lifecycle: training
    (``text_bpe_train``) happens once, ENCODING runs on every corpus
    refresh — so its shape matters more at 100 TB.  The merge table is
    a constant artifact (here a module literal; in production a
    broadcast file) folded into the plan as nested ``replace`` calls:
    ONE map-only scan, zero shuffles, zero driver actions, whole-stage
    codegen end to end.  Sequential application order is load-bearing
    (merge 3 consumes merge 2's placeholder — hierarchical vocabulary,
    real BPE), which nesting preserves by construction.

    Per-document outputs: token count (= chars after merging,
    char-level BPE), how many merges fired (each application shrinks
    the string by exactly 1), the compression ratio, and an md5 of the
    exact token stream — so the gate proves the full tokenization, not
    just its statistics."""
    prep(spark)
    docs = load_spread(spark, sf_dir, "documents")
    t = F.col("text")
    for pair, ph in BPE_ENCODE_MERGES:
        t = F.replace(t, F.lit(pair), F.lit(ph))
    n_chars = F.length("text").cast("bigint")
    n_tokens = F.length(t).cast("bigint")
    return docs.select(
        "doc_id",
        "source",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars - n_tokens).alias("n_merges_applied"),
        # NULL for the empty document: a ratio over zero tokens is
        # undefined, and an unguarded division crashes under ANSI mode
        # (hostile-corpus sweep finding, r9)
        F.when(
            n_tokens > 0,
            round_ieee(n_chars.cast("double") / n_tokens.cast("double")),
        ).alias("compression"),
        F.md5(t).alias("tok_md5"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weighting: target-vs-corpus log-likelihood ratio
# ---------------------------------------------------------------------------


@register(
    "dsir_importance_weights",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang, source, unnest(
                regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
        ),
        cnt_all AS (SELECT w, count(*) AS c_all FROM tok GROUP BY w),
        cnt_t AS (
            SELECT w, count(*) AS c_t FROM tok WHERE lang = 'en' GROUP BY w
        ),
        tot AS (
            SELECT count(*) AS n_all,
                   count(*) FILTER (WHERE lang = 'en') AS n_t,
                   count(DISTINCT w) AS v
            FROM tok
        ),
        scored AS (
            SELECT t.doc_id, t.lang, t.source,
                   (length(format('{:b}', tot.n_all // cnt_all.c_all)) - 1)
                 - (length(format('{:b}',
                        (tot.n_t + tot.v) // (COALESCE(cnt_t.c_t, 0) + 1)))
                    - 1) AS lr
            FROM tok t
            JOIN cnt_all ON t.w = cnt_all.w
            LEFT JOIN cnt_t ON t.w = cnt_t.w
            CROSS JOIN tot
        )
        SELECT doc_id, lang, source,
               count(*) AS n_tok,
               CAST(sum(lr) AS BIGINT) AS dsir_weight,
               CAST(sum(lr) * 10000 // count(*) AS BIGINT)
                   AS avg_weight_e4,
               sum(lr) > 0 AS selected
        FROM scored
        GROUP BY doc_id, lang, source
    """,
    description="DSIR-style importance weighting: per-token quantized "
    "log-ratio of target-slice (lang='en') vs whole-corpus unigram LMs, "
    "summed integer-exact per document; threshold selection flag",
)
def dsir_importance_weights(spark, sf_dir):
    """Data Selection via Importance Resampling (Xie et al., 2023),
    reformulated float-free: a document's importance weight under
    ``log p_target(x) - p_raw(x)`` is the sum over its tokens of the
    log-ratio between a TARGET language model (here: the ``lang='en'``
    slice, standing in for a high-quality reference corpus) and the
    raw-corpus model.  Each token's ratio is quantized as the
    difference of two integer surprisals — ``floor(log2(N/c))`` per
    the ``text_unigram_surprisal`` convention, with add-one smoothing
    (``(N_t + V) / (c_t + 1)``) so words absent from the target stay
    finite — making the per-document sum an exact BIGINT with no
    float-order freedom, which is what lets an importance *score*
    hold to the full hash gate.

    Selection is a broadcastable threshold (``weight > 0``: the doc
    looks more target-like than corpus-average), NOT a global rank — a
    corpus-wide row_number would be a single-partition sort at 100 TB;
    a threshold keeps selection map-side.  The two language models are
    vocabulary-sized aggregates (map-side combined) broadcast to the
    token stream; n-gram hashing (the paper's fixed-bucket variant)
    drops in by replacing ``w`` with a hash-bucket expression if the
    vocabulary ever outgrows broadcast range."""
    prep(spark)
    docs = load_spread(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
    )
    cnt_all = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c_all"))
    cnt_t = (
        tok.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    tot = tok.groupBy().agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_t"),
        F.countDistinct("w").alias("v"),
    )
    surp_all = F.length(F.expr("bin(n_all div c_all)")) - F.lit(1)
    surp_t = F.length(
        F.expr("bin((n_t + v) div (coalesce(c_t, 0) + 1))")
    ) - F.lit(1)
    scored = (
        tok.join(F.broadcast(cnt_all), "w")
        .join(F.broadcast(cnt_t), "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            "source",
            (surp_all - surp_t).cast("bigint").alias("lr"),
        )
    )
    return scored.groupBy("doc_id", "lang", "source").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum("lr").cast("bigint").alias("dsir_weight"),
        F.expr("CAST(sum(lr) * 10000 div count(1) AS BIGINT)").alias(
            "avg_weight_e4"
        ),
        (F.sum("lr") > 0).alias("selected"),
    )


# ---------------------------------------------------------------------------
# Bigram LM surprisal with backoff: the KenLM-shaped quality filter
# ---------------------------------------------------------------------------

#: backoff penalty in (integer) bits added when a bigram is absent from
#: the training slice and scoring falls back to the unigram model
BIGRAM_BACKOFF_BITS = 2


@register(
    "text_bigram_surprisal",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, lang, source,
                   regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents
        ),
        tok AS (
            SELECT doc_id, lang, source,
                   w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
            FROM (SELECT doc_id, lang, source, w,
                         unnest(range(1, len(w))) AS i
                  FROM words)
        ),
        uni AS (
            SELECT wd, count(*) AS c1
            FROM (SELECT unnest(w) AS wd FROM words WHERE lang = 'en')
            GROUP BY 1
        ),
        bi AS (
            SELECT w1, w2, count(*) AS c12 FROM tok WHERE lang = 'en'
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT CAST(sum(len(w)) AS BIGINT) AS n
            FROM words WHERE lang = 'en'
        ),
        scored AS (
            SELECT t.doc_id, t.lang, t.source,
                   CASE
                     WHEN b.c12 IS NOT NULL THEN
                       length(format('{{:b}}', u1.c1 // b.c12)) - 1
                     WHEN u2.c1 IS NOT NULL THEN
                       length(format('{{:b}}', tot.n // u2.c1)) - 1
                           + {BIGRAM_BACKOFF_BITS}
                     ELSE
                       length(format('{{:b}}', tot.n)) - 1
                           + {BIGRAM_BACKOFF_BITS}
                   END AS surp
            FROM tok t
            LEFT JOIN bi b ON t.w1 = b.w1 AND t.w2 = b.w2
            LEFT JOIN uni u1 ON t.w1 = u1.wd
            LEFT JOIN uni u2 ON t.w2 = u2.wd
            CROSS JOIN tot
        )
        SELECT doc_id, lang, source,
               count(*) AS n_bigrams,
               CAST(sum(surp) AS BIGINT) AS sum_surprisal,
               CAST(sum(surp) * 10000 // count(*) AS BIGINT)
                   AS avg_surprisal_e4
        FROM scored
        GROUP BY doc_id, lang, source
    """,
    description="bigram LM surprisal with unigram backoff: the "
    "KenLM-shaped perplexity filter, trained on the lang='en' slice "
    "and scored over every document, integer-exact",
)
def text_bigram_surprisal(spark, sf_dir):
    """Conditional-bigram language-model scoring with backoff — the
    shape of every KenLM-based quality filter (CCNet, RefinedWeb):
    train on a reference slice (``lang='en'``), score EVERYTHING, and
    documents whose word transitions the reference never saw pay a
    backoff penalty.  Per bigram occurrence, surprisal is the integer
    ``floor(log2(c(w1)/c(w1,w2)))`` — the quantized ``-log2
    p(w2|w1)`` — falling back to the unigram surprisal of ``w2`` plus
    ``BIGRAM_BACKOFF_BITS`` when the bigram is unseen, and to the
    worst-case ``log2 N`` when even ``w2`` is unknown.  Integer
    everywhere, so per-document sums carry no float-order freedom
    (the ``text_unigram_surprisal`` convention, one conditioning
    order up).

    100 TB shape: bigrams come from each document's word ARRAY
    (adjacent pairs formed in the projection — no self-join, no
    window shuffle); the bigram and unigram LMs are vocabulary-sized
    aggregates broadcast to the token stream (bigram vocab is the
    big one — if it outgrows broadcast, the join flips to a shuffle
    join on w1,w2 and nothing else changes); one final per-doc
    aggregate."""
    prep(spark)
    docs = load_spread(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "lang", "source",
        F.split(F.trim("text"), r"\s+").alias("w"),
    )
    tok = words.select(
        "doc_id", "lang", "source",
        F.explode(
            F.expr(
                "CASE WHEN size(w) > 1 THEN transform(sequence(1, size(w) - 1), "
                "i -> struct(w[i-1] AS w1, w[i] AS w2)) "
                "ELSE array() END"
            )
        ).alias("bg"),
    ).select("doc_id", "lang", "source", "bg.w1", "bg.w2")
    en_words = words.filter(F.col("lang") == "en")
    uni = en_words.select(F.explode("w").alias("wd")).groupBy("wd").agg(
        F.count(F.lit(1)).alias("c1")
    )
    bi = (
        tok.filter(F.col("lang") == "en")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    tot = en_words.groupBy().agg(
        F.sum(F.size("w")).cast("bigint").alias("n")
    )
    surp = F.when(
        F.col("c12").isNotNull(),
        F.length(F.expr("bin(c1_prefix div c12)")) - F.lit(1),
    ).when(
        F.col("c1_next").isNotNull(),
        F.length(F.expr("bin(n div c1_next)")) - F.lit(1)
        + F.lit(BIGRAM_BACKOFF_BITS),
    ).otherwise(
        F.length(F.expr("bin(n)")) - F.lit(1) + F.lit(BIGRAM_BACKOFF_BITS)
    )
    scored = (
        tok.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(
            F.broadcast(uni.select(F.col("wd").alias("w1"),
                                   F.col("c1").alias("c1_prefix"))),
            "w1",
            "left",
        )
        .join(
            F.broadcast(uni.select(F.col("wd").alias("w2"),
                                   F.col("c1").alias("c1_next"))),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "lang", "source", surp.cast("bigint").alias("surp"))
    )
    return scored.groupBy("doc_id", "lang", "source").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("surp").cast("bigint").alias("sum_surprisal"),
        F.expr("CAST(sum(surp) * 10000 div count(1) AS BIGINT)").alias(
            "avg_surprisal_e4"
        ),
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination — the compact-probe scale twin
# ---------------------------------------------------------------------------

#: filter geometry: 2^20 bits = 16384 longs = 128 KiB broadcast —
#: three orders of magnitude smaller than a raw gram set at eval-suite
#: scale.  Two independent hash positions per gram (xxhash64 salted by
#: a literal second column).
BLOOM_BITS = 1 << 20
BLOOM_SEEDS = (0x5BD1E995, 0x9E3779B9)

#: the oracle is the EXACT overlap (same formulation as
#: decontaminate_ngram_overlap): the Bloom stage is a prefilter with
#: false positives but NO false negatives, and every candidate is
#: exactly verified afterwards — so agreement with the exact oracle
#: proves both the soundness of the filter and the verify stage.
DECON_BLOOM_ORACLE = f"""
        WITH grams AS (
            SELECT doc_id,
                   list_distinct([array_to_string(w[i:i+{DECON_NGRAM - 1}], ' ')
                                  for i in range(1, greatest(len(w) - {DECON_NGRAM - 1}, 1) + 1)]) AS gs
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
                  FROM documents)
        ),
        ex AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
        eval_g AS (
            SELECT DISTINCT gram FROM ex WHERE doc_id % {DECON_EVAL_MOD} = 0
        ),
        hits AS (
            SELECT e.doc_id, count(*) AS n_hit
            FROM ex e JOIN eval_g USING (gram)
            WHERE e.doc_id % {DECON_EVAL_MOD} <> 0
            GROUP BY e.doc_id
        )
        SELECT h.doc_id,
               CAST(h.n_hit AS BIGINT) AS n_hit,
               CAST(len(g.gs) AS BIGINT) AS n_grams,
               {round_ieee_sql("h.n_hit * 1.0 / len(g.gs)")} AS contamination
        FROM hits h JOIN grams g USING (doc_id)
        ORDER BY doc_id
"""


@register("decontaminate_bloom_prefilter", oracle=DECON_BLOOM_ORACLE)
def decontaminate_bloom_prefilter(spark, sf_dir):
    """Decontamination when the probe set itself is too big to ship.

    ``decontaminate_ngram_overlap`` broadcasts the eval grams raw —
    right up to the point where an eval suite's distinct grams stop
    fitting in a broadcast.  The production answer is the one Bloom
    filters were built for: fold the probe set into a fixed 128 KiB
    bitset (here 2^20 bits as 16 K longs via ``bit_or`` — an exact
    integer aggregate), broadcast THAT, prefilter the corpus grams
    map-side (two salted xxhash64 probes per gram, both bits must be
    set), and exactly verify only the surviving sliver against the
    real gram set.  No false negatives by construction; false
    positives die in the verify join — the final result is
    bit-identical to the exact query, which is what the oracle
    checks.

    100 TB shape: everything is JVM-side DataFrame code (zero Python
    in the data plane).  The corpus-side gram explode streams through
    two broadcast hash joins (bitset words, then the verify set
    reduced to candidates) with map-side combine on the final per-doc
    aggregate; the only full shuffle is that tiny hit aggregate.  The
    bitset build is one explode + one 16 K-row ``bit_or`` groupBy
    over the (small) eval side.
    """
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    gs = _word_ngrams(F.col("text"), DECON_NGRAM)
    eval_g = (
        d.filter(is_eval).select(F.explode(gs).alias("gram")).distinct()
    ).cache()

    def positions(col):
        return [
            F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(BLOOM_BITS))
            for seed in BLOOM_SEEDS
        ]

    # build: 16 K-long bitset via integer bit_or — exact, associative,
    # map-side combinable
    bloom = (
        eval_g.select(
            F.explode(F.array(*positions(F.col("gram")))).alias("pos")
        )
        .select(
            F.shiftright("pos", 6).alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )

    # probe: each train gram must find BOTH its bits set
    train_ex = d.filter(~is_eval).select(
        "doc_id", F.explode(gs).alias("gram")
    )
    posed = train_ex.select(
        "doc_id",
        "gram",
        F.explode(F.array(*positions(F.col("gram")))).alias("pos"),
    ).select(
        "doc_id",
        "gram",
        F.shiftright("pos", 6).alias("word"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
        ).alias("mask"),
    )
    cand = (
        posed.join(F.broadcast(bloom), "word")
        .filter(F.col("bits").bitwiseAND(F.col("mask")) != 0)
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("k_hits"))
        .filter(F.col("k_hits") == len(BLOOM_SEEDS))
        .select("doc_id", "gram")
    )
    # exact verify on the sliver of survivors
    hits = (
        cand.join(F.broadcast(eval_g), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        d.join(F.broadcast(hits), "doc_id")
        .select(
            "doc_id",
            F.col("n_hit").cast("long").alias("n_hit"),
            F.size(gs).cast("long").alias("n_grams"),
            round_ieee(
                F.col("n_hit") * F.lit(1.0) / F.size(gs).cast("long")
            ).alias("contamination"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Gopher-style quality-rule battery (staged for r11 registration)
# ---------------------------------------------------------------------------

#: fixed stopword set for rule R3 (a document with no common function
#: words is boilerplate/gibberish — the Gopher heuristic); frozen so
#: both engines test the identical membership
GOPHER_STOPS = ("the", "a", "of", "to", "and", "in", "is", "that")
#: rule thresholds, exact-integer form (see the query docstring):
#: R1 word count floor/ceiling, R2 mean word length in [LO, HI) as
#: LO*n <= sum_len < HI*n, R4 alphabetic-word ratio >= 4/5 as
#: 5*alpha >= 4*n, R5 symbol-to-word ratio < 1/10 as 10*sym < n
GOPHER_MIN_WORDS = 40
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO = 4
GOPHER_MWL_HI = 5

#: r11 registration oracle — restates the rule battery in DuckDB's
#: list/regexp dialect; every rule decision is integer arithmetic so
#: the two engines cannot drift on rounding.
GOPHER_RULES_ORACLE = f"""
        WITH w AS (
            SELECT source,
                   regexp_split_to_array(trim(coalesce(text, '')),
                                         '\\s+') AS ws
            FROM documents
        ),
        m AS (
            SELECT source,
                   len(ws) AS n,
                   list_sum(list_transform(ws, x -> length(x))) AS sl,
                   len(list_filter(ws, x -> regexp_matches(x, '^[a-z]+$')))
                       AS alpha,
                   len(list_filter(ws, x -> list_contains(
                       {list(GOPHER_STOPS)!r}, x))) AS stops,
                   len(list_filter(ws, x -> x = '#' OR x = '...'))
                       AS sym
            FROM w
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n < {GOPHER_MIN_WORDS}
                               OR n > {GOPHER_MAX_WORDS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
               CAST(sum(CASE WHEN {GOPHER_MWL_LO} * n > sl
                               OR sl >= {GOPHER_MWL_HI} * n
                        THEN 1 ELSE 0 END) AS BIGINT) AS fail_mwl,
               CAST(sum(CASE WHEN stops < 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fail_stops,
               CAST(sum(CASE WHEN 5 * alpha < 4 * n THEN 1 ELSE 0 END)
                    AS BIGINT) AS fail_alpha,
               CAST(sum(CASE WHEN 10 * sym >= n THEN 1 ELSE 0 END)
                    AS BIGINT) AS fail_symbols,
               CAST(sum(CASE WHEN n >= {GOPHER_MIN_WORDS}
                              AND n <= {GOPHER_MAX_WORDS}
                              AND {GOPHER_MWL_LO} * n <= sl
                              AND sl < {GOPHER_MWL_HI} * n
                              AND stops >= 2
                              AND 5 * alpha >= 4 * n
                              AND 10 * sym < n
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
        FROM m GROUP BY source ORDER BY source
"""


@register("text_gopher_rules", oracle=GOPHER_RULES_ORACLE)
def text_gopher_rules(spark, sf_dir):
    """Gopher-style document-quality rule battery (Rae et al. 2021,
    'Scaling Language Models: ... Gopher', Appendix A — public
    rule shapes, thresholds adapted to this corpus): per source,
    how many documents fail each rule and how many pass all.

    Rules, all exact integers (no float thresholds to drift on):
      R1 word count within [{GOPHER_MIN_WORDS}, {GOPHER_MAX_WORDS}]
      R2 mean word length in [{GOPHER_MWL_LO}, {GOPHER_MWL_HI}) —
         as LO*n <= sum_word_len < HI*n
      R3 at least 2 stopword occurrences (GOPHER_STOPS)
      R4 alphabetic-word ratio >= 4/5 — as 5*alpha >= 4*n
      R5 symbol-to-word ratio < 1/10 ('#' / '...') — as 10*sym < n

    100 TB shape: every rule is a row-local codegen expression over
    the split word array (aggregate/filter lambdas run JVM-side,
    zero Python, zero UDF); the only shuffle is the final per-source
    aggregate of five counters.  Filters like this run at scan
    throughput on any cluster size — the canonical map-side-only
    quality gate in front of a training-data pipeline.
    """
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    # NULL text folds to '' on BOTH sides (split('') is [''] in both)
    ws = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    n = F.size(ws)
    sl = F.expr(
        "aggregate(transform(split(trim(coalesce(text, '')),"
        " '\\\\s+'), x -> length(x)), 0, (acc, x) -> acc + x)"
    )
    # rule counts stopword OCCURRENCES (array_intersect would dedup)
    stops_arr = F.array(*[F.lit(s) for s in GOPHER_STOPS])
    stops = F.size(
        F.filter(ws, lambda x: F.array_contains(stops_arr, x))
    )
    alpha = F.size(F.filter(ws, lambda x: x.rlike("^[a-z]+$")))
    sym = F.size(
        F.filter(ws, lambda x: (x == F.lit("#")) | (x == F.lit("...")))
    )
    m = d.select(
        "source",
        n.alias("n"),
        sl.alias("sl"),
        stops.alias("stops"),
        alpha.alias("alpha"),
        sym.alias("sym"),
    )
    lo, hi = GOPHER_MIN_WORDS, GOPHER_MAX_WORDS
    mlo, mhi = GOPHER_MWL_LO, GOPHER_MWL_HI
    pass_all = (
        (F.col("n") >= lo)
        & (F.col("n") <= hi)
        & (mlo * F.col("n") <= F.col("sl"))
        & (F.col("sl") < mhi * F.col("n"))
        & (F.col("stops") >= 2)
        & (5 * F.col("alpha") >= 4 * F.col("n"))
        & (10 * F.col("sym") < F.col("n"))
    )
    ind = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            ind((F.col("n") < lo) | (F.col("n") > hi)).alias("fail_words"),
            ind(
                (mlo * F.col("n") > F.col("sl"))
                | (F.col("sl") >= mhi * F.col("n"))
            ).alias("fail_mwl"),
            ind(F.col("stops") < 2).alias("fail_stops"),
            ind(5 * F.col("alpha") < 4 * F.col("n")).alias("fail_alpha"),
            ind(10 * F.col("sym") >= F.col("n")).alias("fail_symbols"),
            ind(pass_all).alias("n_pass_all"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# C4-style line/page cleaning battery (staged for r11 registration)
# ---------------------------------------------------------------------------

#: words per manufactured "line" — the corpus has no newlines, so the
#: C4 line unit is modeled as consecutive K-word groups (the same
#: corpus-adaptation the Gopher battery documents for its thresholds)
C4_LINE_WORDS = 8
#: C4 line rule: at least this many words per retained line
C4_MIN_LINE_WORDS = 5
#: C4 badword-list stand-in (the corpus vocabulary is fixed word soup;
#: membership against a frozen blocklist is the rule SHAPE being tested)
C4_BADWORD = "slow"
#: C4 "page contains '{'" stand-in — a whole-page policy drop on one
#: marker word
C4_POLICY_WORD = "vector"
#: C4 "lorem ipsum" stand-in — a whole-page policy drop on one phrase
C4_POLICY_PHRASE = "slow fast"
#: C4 page rule: at least this many retained lines, else drop the page
C4_MIN_KEPT_LINES = 3
#: terminal-punctuation model: the crawler fixture ends line j of doc d
#: with terminal punctuation iff (d + j) % 3 != 0 — closed-form so both
#: engines restate it arithmetically (the corpus itself carries none)

K4 = C4_LINE_WORDS

C4_RULES_ORACLE = f"""
        WITH w AS (
            SELECT doc_id, source,
                   regexp_split_to_array(trim(coalesce(text, '')),
                                         '\\s+') AS ws,
                   coalesce(text, '') LIKE '%{C4_POLICY_PHRASE}%'
                       AS phrase
            FROM documents
        ),
        m AS (
            SELECT source,
                   (len(ws) + {K4 - 1}) // {K4} AS nl,
                   len(list_filter(range(0, (len(ws) + {K4 - 1}) // {K4}),
                       j -> (doc_id + j) % 3 = 0)) AS fail_punct,
                   len(list_filter(range(0, (len(ws) + {K4 - 1}) // {K4}),
                       j -> len(list_slice(ws, j*{K4}+1, j*{K4}+{K4}))
                            < {C4_MIN_LINE_WORDS})) AS fail_short,
                   len(list_filter(range(0, (len(ws) + {K4 - 1}) // {K4}),
                       j -> list_contains(
                           list_slice(ws, j*{K4}+1, j*{K4}+{K4}),
                           '{C4_BADWORD}'))) AS fail_badword,
                   len(list_filter(range(0, (len(ws) + {K4 - 1}) // {K4}),
                       j -> (doc_id + j) % 3 != 0
                            AND len(list_slice(ws, j*{K4}+1, j*{K4}+{K4}))
                                >= {C4_MIN_LINE_WORDS}
                            AND NOT list_contains(
                                list_slice(ws, j*{K4}+1, j*{K4}+{K4}),
                                '{C4_BADWORD}'))) AS kept_lines,
                   (list_contains(ws, '{C4_POLICY_WORD}') OR phrase)
                       AS policy
            FROM w
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nl) AS BIGINT) AS n_lines,
               CAST(sum(fail_punct) AS BIGINT) AS fail_punct,
               CAST(sum(fail_short) AS BIGINT) AS fail_short,
               CAST(sum(fail_badword) AS BIGINT) AS fail_badword,
               CAST(sum(kept_lines) AS BIGINT) AS kept_lines,
               CAST(sum(CASE WHEN policy THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_policy_dropped,
               CAST(sum(CASE WHEN NOT policy
                              AND kept_lines >= {C4_MIN_KEPT_LINES}
                        THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept
        FROM m GROUP BY source ORDER BY source
"""


@register("text_c4_rules", oracle=C4_RULES_ORACLE)
def text_c4_rules(spark, sf_dir):
    """C4-style cleaning battery (Raffel et al. 2020, 'Exploring the
    Limits of Transfer Learning with T5', §2.2 — the public C4 rules;
    Dodge et al. 2021 documents the corpus effects): per source, how
    many manufactured lines fail each line rule, how many pages are
    policy-dropped, and how many pages survive the full filter.

    Rule mapping onto this corpus (documented stand-ins, same shapes):
      L1 line ends in terminal punctuation — the crawler fixture
         punctuates line j of doc d iff (d + j) % 3 != 0 (closed-form
         arithmetic restated by the oracle; the corpus carries none)
      L2 line has >= {C4_MIN_LINE_WORDS} words (only tail lines can
         fail at {C4_LINE_WORDS}-word grouping)
      L3 line contains no blocklisted word ('{C4_BADWORD}')
      P1 page contains the code marker ('{C4_POLICY_WORD}' standing in
         for C4's '{{') -> whole page dropped
      P2 page contains the boilerplate phrase ('{C4_POLICY_PHRASE}'
         standing in for 'lorem ipsum') -> whole page dropped
      P3 page keeps >= {C4_MIN_KEPT_LINES} lines after L1-L3, else
         dropped (C4's >=3-sentence floor)

    100 TB shape: every rule is a row-local codegen expression over
    the split word array (sequence/filter/slice lambdas run JVM-side,
    zero Python, zero UDF); the only shuffle is the final per-source
    aggregate of seven counters — the canonical map-side-only cleaning
    gate in front of a training-data pipeline, same plan class as
    ``text_gopher_rules``.
    """
    prep(spark)
    d = load_spread(spark, sf_dir, "documents")
    k, mw = C4_LINE_WORDS, C4_MIN_LINE_WORDS
    d2 = d.select(
        "doc_id",
        "source",
        F.split(
            F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"
        ).alias("ws"),
        F.coalesce(F.col("text"), F.lit(""))
        .contains(C4_POLICY_PHRASE)
        .alias("phrase"),
    )
    seq = f"sequence(0, (size(ws) + {k - 1}) div {k} - 1)"
    line = f"slice(ws, j*{k}+1, {k})"
    m = d2.select(
        "source",
        F.expr(f"(size(ws) + {k - 1}) div {k}").alias("nl"),
        F.expr(
            f"size(filter({seq}, j -> (doc_id + j) % 3 = 0))"
        ).alias("fail_punct"),
        F.expr(
            f"size(filter({seq}, j -> size({line}) < {mw}))"
        ).alias("fail_short"),
        F.expr(
            f"size(filter({seq}, j -> array_contains({line},"
            f" '{C4_BADWORD}')))"
        ).alias("fail_badword"),
        F.expr(
            f"size(filter({seq}, j -> (doc_id + j) % 3 != 0"
            f" and size({line}) >= {mw}"
            f" and not array_contains({line}, '{C4_BADWORD}')))"
        ).alias("kept_lines"),
        (
            F.array_contains(F.col("ws"), C4_POLICY_WORD)
            | F.col("phrase")
        ).alias("policy"),
    )
    ind = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nl").cast("bigint").alias("n_lines"),
            F.sum("fail_punct").cast("bigint").alias("fail_punct"),
            F.sum("fail_short").cast("bigint").alias("fail_short"),
            F.sum("fail_badword").cast("bigint").alias("fail_badword"),
            F.sum("kept_lines").cast("bigint").alias("kept_lines"),
            ind(F.col("policy")).alias("docs_policy_dropped"),
            ind(
                (~F.col("policy"))
                & (F.col("kept_lines") >= C4_MIN_KEPT_LINES)
            ).alias("docs_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# HTML text extraction at query level (staged r10)
# ---------------------------------------------------------------------------

#: links rendered per document (anchor text 'l{i}', closed-form hrefs)
HTML_LINKS_MOD = 3

#: oracle restates the whole extraction in closed form via the
#: REVERSIBLE-TEMPLATE property (tests/test_htmlcodec.py
#: test_fixture_template_inverts_exactly): normalized text -> escaped
#: HTML -> extract_text inverts byte-exactly, so the extracted page
#: text is 'boiler plate' + the doc's normalized lines + one line per
#: anchor + the footer, and every statistic is arithmetic over the
#: documents table.  The Spark side ASSERTS its codec chain lands on
#: exactly this closed form (title, links, full text) — drift raises.
HTML_EXTRACT_ORACLE = f"""
        WITH d AS (
            SELECT doc_id, source,
                   list_filter(list_transform(
                       string_split(coalesce(text, ''), chr(10)),
                       ln -> trim(regexp_replace(ln, '[ \t\r\f]+', ' ',
                                                 'g'))),
                       x -> x <> '') AS lines,
                   doc_id % {HTML_LINKS_MOD} + 1 AS k
            FROM documents
        ),
        e AS (
            SELECT source,
                   len(lines) + k + 2 AS n_lines,
                   k AS n_links,
                   12 + 6 + 2 * k
                     + coalesce(list_aggregate(list_transform(lines,
                           x -> length(x)), 'sum'), 0)
                     + (len(lines) + k + 2 - 1) AS n_chars
            FROM d
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_lines) AS BIGINT) AS total_lines,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(n_links) AS BIGINT) AS total_links
        FROM e GROUP BY source ORDER BY source
"""


@register("text_html_extract", oracle=HTML_EXTRACT_ORACLE)
def text_html_extract(spark, sf_dir):
    """HTML -> text extraction as a QUERY — the first operation a web
    corpus runs on every crawled page (the WARC chain exercises the
    same codec on whole messages; this isolates the HTML layer and
    gates it per document).  Each document renders its text into a
    realistic page (head/title dropped by extraction, nav + footer
    boilerplate, one anchor per link), executors run the from-scratch
    WHATWG-subset extractor (``core/htmlcodec.py``: tokenizer, entity
    decoding, display-semantics text assembly, title + link
    extraction), and ASSERT the reversible-template property: the
    extracted text equals the closed form the oracle restates, the
    title round-trips, and every link is recovered in order.

    100 TB shape: extraction is a narrow Arrow-batched pure-string
    pass (no state, no join); the rollup is one combinable per-source
    aggregate.  Identical economics to the other text scans — the
    Python cost is the extractor itself, which a production deployment
    amortizes by running extraction exactly once per crawl snapshot.
    """
    import re as _re

    from pyspark.sql import types as T

    from ..core.htmlcodec import (
        escape_html,
        extract_links,
        extract_text,
        extract_title,
    )

    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("n_lines", T.LongType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("n_links", T.LongType()),
        ]
    )

    def _extract(batches):
        import pandas as pd_

        for pdf in batches:
            srcs, nlines, nchars, nlinks = [], [], [], []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                doc_id = int(doc_id)
                text = "" if text is None else str(text)
                norm = [
                    _re.sub(r"[ \t\r\f]+", " ", ln).strip(" ")
                    for ln in text.split("\n")
                ]
                norm = [ln for ln in norm if ln]
                k = doc_id % HTML_LINKS_MOD + 1
                title = f"doc {doc_id}"
                html = (
                    f"<html><head><title>{title}</title></head>"
                    "<body><nav>boiler plate</nav>"
                    + "".join(f"<p>{escape_html(ln)}</p>" for ln in norm)
                    + "".join(
                        f'<p><a href="https://example{doc_id}.com/p{i}">'
                        f"l{i}</a></p>"
                        for i in range(k)
                    )
                    + "<footer>© 2026</footer></body></html>"
                )
                got = extract_text(html)
                want = "\n".join(
                    ["boiler plate"]
                    + norm
                    + [f"l{i}" for i in range(k)]
                    + ["© 2026"]
                )
                links = extract_links(html)
                want_links = [
                    (f"https://example{doc_id}.com/p{i}", f"l{i}")
                    for i in range(k)
                ]
                if (
                    got != want
                    or extract_title(html) != title
                    or links != want_links
                ):
                    raise ValueError(
                        f"doc {doc_id}: HTML extraction drifted"
                    )
                srcs.append(source)
                nlines.append(got.count("\n") + 1)
                nchars.append(len(got))
                nlinks.append(len(links))
            yield pd_.DataFrame(
                {
                    "source": pd_.Series(srcs, dtype="object"),
                    "n_lines": pd_.Series(nlines, dtype="int64"),
                    "n_chars": pd_.Series(nchars, dtype="int64"),
                    "n_links": pd_.Series(nlinks, dtype="int64"),
                }
            )

    per_doc = d.mapInPandas(_extract, schema)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_lines").cast("bigint").alias("total_lines"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_links").cast("bigint").alias("total_links"),
        )
        .orderBy("source")
    )
