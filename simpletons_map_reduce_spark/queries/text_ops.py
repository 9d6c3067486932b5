"""Text-analysis operators over ``documents`` — LLM-pipeline tier C.

Generalizes the reference's text surface (tokenizer mrapps/wc.go:19-32,
per-file length stats mrapps/crash.go:34-43) into the analysis battery a
training-data pipeline needs: per-doc stats, n-grams, TF-IDF, BPE-ish token
counting, heuristic language ID, quality scoring, and shingle fingerprints.

Everything is built-in column expressions (split/filter/transform/aggregate
over arrays) — no Python UDFs — so the per-document work is embarrassingly
parallel, shuffle-free until the final aggregate, and survives 100 TB by
construction: a document never leaves its input partition until it has been
reduced to a handful of scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..functions.rounding import rn, sql_rn
from ..functions.text import sql_tokens, tokens, tokens_lower
from ..sources.tables import load_table
from .registry import register

TEXT_STATS_ORACLE = f"""
WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks, length(text) AS n_chars
           FROM documents)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT) AS n_words,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       CASE WHEN len(toks) = 0 THEN NULL
            ELSE {sql_rn("CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)"
                         " / len(toks)", 4)}
       END AS avg_word_len
FROM t
"""


@register("text_stats", TEXT_STATS_ORACLE, tags=("text",))
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document counts (chars/words/distinct words/mean word length)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        tokens(F.col("text")).alias("toks"),
    )
    total_len = F.aggregate(
        F.col("toks"), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_words = F.size("toks")
    return t.select(
        "doc_id",
        "n_chars",
        n_words.cast("long").alias("n_words"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.when(
            n_words > 0, rn(total_len.cast("double") / n_words, 4)
        ).alias("avg_word_len"),
    )


NGRAM_COUNTS_ORACLE = f"""
WITH t AS (SELECT lang, {sql_tokens('text')} AS toks FROM documents),
grams AS (
    SELECT lang,
           unnest(list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS ngram
    FROM t
)
SELECT lang, ngram, CAST(count(*) AS BIGINT) AS cnt
FROM grams
GROUP BY lang, ngram
HAVING count(*) >= 3
"""


@register("ngram_counts", NGRAM_COUNTS_ORACLE, tags=("text",))
def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram frequencies per language (count >= 3)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", tokens(F.col("text")).alias("toks"))
    bigrams = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1),"
            " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    return (
        t.select("lang", F.explode(bigrams).alias("ngram"))
        .groupBy("lang", "ngram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 3)
    )


TFIDF_ORACLE = f"""
WITH terms AS (SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term,
           {sql_rn('tf.tf * ln((n.n_docs * 1.0) / dfreq.df)', 6)} AS score
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
    SELECT doc_id, term, score,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, term) AS rk
    FROM scored
)
SELECT doc_id, term, score, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 5
"""


@register("tfidf_topterms", TFIDF_ORACLE, tags=("text",))
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document.

    Document frequency is a second aggregate over the tf table (already one
    row per doc×term); the one-row corpus count joins in via broadcast, so
    the only large shuffles are the two hash aggregations on (doc_id, term)
    and (term) — both map-side combined.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # tf feeds BOTH the document-frequency aggregate and the score join —
    # persist so tokenize/explode/agg runs once (same pattern as dedup_ops).
    tf = tracked_persist(
        terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            rn(
                F.col("tf") * F.log((F.col("n_docs") * F.lit(1.0)) / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "term", "score", "rk")
    )


#: BPE-ish pre-tokenizer: letter runs | digit runs | single other non-space.
BPE_TOKEN_RE = r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"

TOKEN_COUNT_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_tokens
    FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       {sql_rn('n_chars * 1.0 / greatest(n_tokens, 1)', 4)} AS chars_per_token
FROM t
"""


def token_count_expr():
    """BPE-regex token count of the ``text`` column — shared by
    token_count and pipeline_funnel_fused so the fused gate can never
    drift from the registered operator."""
    return F.size(F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), F.lit(0)))


@register("token_count", TOKEN_COUNT_ORACLE, tags=("text",))
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-style pre-tokenizer regex."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = token_count_expr()
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        rn(
            F.length("text") * F.lit(1.0) / F.greatest(n_tokens, F.lit(1)), 4
        ).alias("chars_per_token"),
    )


#: Tiny per-language stopword lists for the heuristic language detector.
#: The *same* constants are compiled into the Spark plan and the oracle SQL;
#: CASE order is fixed, ties broken by (hits DESC, lang ASC).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that"),
    "de": ("der", "die", "und", "das", "nicht", "ein", "ist"),
    "es": ("el", "los", "las", "una", "y", "en", "que"),
    "fr": ("le", "la", "les", "et", "des", "un", "est"),
    "zh": ("的", "是", "了", "在", "我", "有", "和"),
}


def _sql_lang_case() -> str:
    whens = []
    for lang, words in LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        whens.append(f"WHEN tok IN ({lst}) THEN '{lang}'")
    return "CASE " + " ".join(whens) + " END"


LANG_ID_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest({sql_tokens('text', lower=True)}) AS tok FROM documents
),
hits AS (
    SELECT doc_id, lang_guess, count(*) AS hits
    FROM (SELECT doc_id, {_sql_lang_case()} AS lang_guess FROM toks)
    WHERE lang_guess IS NOT NULL
    GROUP BY doc_id, lang_guess
),
best AS (
    SELECT doc_id, lang_guess,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY hits DESC, lang_guess) AS rk
    FROM hits
)
SELECT d.doc_id, coalesce(b.lang_guess, 'und') AS pred_lang
FROM documents d
LEFT JOIN (SELECT doc_id, lang_guess FROM best WHERE rk = 1) b USING (doc_id)
"""


@register("lang_id", LANG_ID_ORACLE, tags=("text",))
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID ('und' when no stopword hits)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_lower(F.col("text"))).alias("tok")
    )
    guess = None
    for lang, words in LANG_STOPWORDS.items():
        cond = F.col("tok").isin(*words)
        guess = F.when(cond, lang) if guess is None else guess.when(cond, lang)
    hits = (
        toks.select("doc_id", guess.alias("lang_guess"))
        .filter(F.col("lang_guess").isNotNull())
        .groupBy("doc_id", "lang_guess")
        .agg(F.count("*").alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("lang_guess"))
    best = (
        hits.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang_guess")
    )
    return docs.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id", F.coalesce("lang_guess", F.lit("und")).alias("pred_lang")
    )


_ALL_STOPWORDS = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})


def lang_hit_expr():
    """True iff the doc has ANY stopword hit over the ``text`` column —
    exactly lang_id's ``pred_lang <> 'und'`` predicate (a doc is 'und'
    iff no token matches any language's list).  Shared with
    pipeline_funnel_fused so the fused gate can never drift from the
    registered operator."""
    toks = tokens_lower(F.col("text"))
    return F.size(F.filter(toks, lambda x: x.isin(_ALL_STOPWORDS))) > 0

QUALITY_SCORE_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           length(text) AS n_chars,
           length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) AS n_alpha,
           length(regexp_replace(text, '[^\\s]', '', 'g')) AS n_space,
           {sql_tokens('text', lower=True)} AS toks
    FROM documents
),
m AS (
    SELECT doc_id, n_chars,
           CASE WHEN n_chars = 0 THEN 0.0 ELSE n_alpha * 1.0 / n_chars END AS alpha_ratio,
           CASE WHEN n_chars = 0 THEN 0.0
                ELSE (n_chars - n_alpha - n_space) * 1.0 / n_chars END AS punct_ratio,
           len(toks) AS n_words,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE len(list_filter(toks, x -> list_contains(
                         [{", ".join(f"'{w}'" for w in _ALL_STOPWORDS)}], x)))
                     * 1.0 / len(toks) END AS stop_ratio
    FROM t
)
SELECT doc_id,
       {sql_rn('alpha_ratio', 4)} AS alpha_ratio,
       {sql_rn('punct_ratio', 4)} AS punct_ratio,
       {sql_rn('stop_ratio', 4)} AS stop_ratio,
       {sql_rn('0.35 * alpha_ratio + 0.15 * (1.0 - punct_ratio)'
               ' + 0.2 * least(n_words / 100.0, 1.0) + 0.3 * stop_ratio', 4)} AS quality
FROM m
"""


def quality_exprs():
    """(alpha_ratio, punct_ratio, stop_ratio, quality) expressions over the
    ``text`` column — shared by quality_score and pipeline_funnel_fused so
    the fused gate can never drift from the registered operator."""
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", r"[^\p{L}]", ""))
    n_space = F.length(F.regexp_replace("text", r"[^\s]", ""))
    toks = tokens_lower(F.col("text"))
    n_words = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(_ALL_STOPWORDS)))
    alpha_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        n_alpha * F.lit(1.0) / n_chars
    )
    punct_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        (n_chars - n_alpha - n_space) * F.lit(1.0) / n_chars
    )
    stop_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        stop_hits * F.lit(1.0) / n_words
    )
    quality = (
        F.lit(0.35) * alpha_ratio
        + F.lit(0.15) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * F.least(n_words / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * stop_ratio
    )
    return alpha_ratio, punct_ratio, stop_ratio, quality


@register("quality_score", QUALITY_SCORE_ORACLE, tags=("text",))
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: letter/punctuation/stopword ratios plus a
    length prior, combined into one score in [0, 1]."""
    docs = load_table(spark, sf_dir, "documents")
    alpha_ratio, punct_ratio, stop_ratio, quality = quality_exprs()
    return docs.select(
        "doc_id",
        rn(alpha_ratio, 4).alias("alpha_ratio"),
        rn(punct_ratio, 4).alias("punct_ratio"),
        rn(stop_ratio, 4).alias("stop_ratio"),
        rn(quality, 4).alias("quality"),
    )


_SHINGLE_CASE = """
CASE WHEN size(toks) >= 5
     THEN transform(sequence(1, size(toks) - 4),
                    i -> array_join(slice(toks, i, 5), ' '))
     WHEN size(toks) > 0 THEN array(array_join(toks, ' '))
     ELSE array('') END
"""

_SQL_SHINGLE_CASE = """
CASE WHEN len(toks) >= 5
     THEN list_transform(range(1, len(toks) - 3),
                         i -> array_to_string(toks[i:i+4], ' '))
     WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
     ELSE [''] END
"""

DOC_FINGERPRINT_ORACLE = f"""
WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_SQL_SHINGLE_CASE}) AS shingle FROM t)
SELECT doc_id, min(md5(shingle)) AS fingerprint
FROM sh GROUP BY doc_id
"""


@register("doc_fingerprint", DOC_FINGERPRINT_ORACLE, tags=("text",))
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-token-shingle fingerprint: min(md5(shingle)) per document —
    the single-hash MinHash special case, stable across engines."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    return (
        t.select("doc_id", F.explode(F.expr(_SHINGLE_CASE)).alias("shingle"))
        .groupBy("doc_id")
        .agg(F.min(F.md5("shingle")).alias("fingerprint"))
    )


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------

REPETITION_ORACLE = f"""
WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
m AS (
    SELECT doc_id,
           len(toks) AS n_words,
           len(list_distinct(toks)) AS n_dist,
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
               AS tri
    FROM t
),
bg AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS gram
    FROM t
),
top AS (
    SELECT doc_id, max(c) AS top_cnt
    FROM (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY doc_id, gram)
    GROUP BY doc_id
)
SELECT m.doc_id,
       CAST(m.n_words AS BIGINT) AS n_words,
       {sql_rn("CASE WHEN m.n_words = 0 THEN 0.0"
               " ELSE (m.n_words - m.n_dist) * 1.0 / m.n_words END", 4)}
           AS dup_word_frac,
       {sql_rn("CASE WHEN len(m.tri) = 0 THEN 0.0"
               " ELSE (len(m.tri) - len(list_distinct(m.tri))) * 1.0"
               "      / len(m.tri) END", 4)} AS dup_trigram_frac,
       {sql_rn("coalesce(top.top_cnt * 2.0 / m.n_words, 0.0)", 4)}
           AS top_bigram_frac
FROM m LEFT JOIN top USING (doc_id)
"""


@register("repetition_stats", REPETITION_ORACLE, tags=("text", "quality"))
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word fraction,
    duplicate-trigram fraction, and the token share of the most frequent
    bigram (Rae et al. 2021 §A1.1 use these to drop boilerplate/spam docs).

    dup_word_frac and dup_trigram_frac are pure array expressions (size vs
    array_distinct size) — zero shuffle, computed in the scan stage.  Only
    the bigram-mode signal needs an aggregation, and it reduces each doc to
    a single (doc_id, max_count) row before the join, so shuffle volume is
    O(distinct bigrams) then O(docs) — never the corpus text.  At 100 TB the
    explode feeds a partial (map-side combined) HashAggregate keyed on
    (doc_id, gram), which is as small as this signal can be made.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = tracked_persist(
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    )
    n_words = F.size("toks")
    trigrams = F.when(
        n_words >= 3,
        F.expr(
            "transform(sequence(1, size(toks) - 2),"
            " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1),"
            "             ' ', element_at(toks, i + 2)))"
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    bigrams = F.when(
        n_words >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1),"
            " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    top = (
        t.select("doc_id", F.explode(bigrams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"))
    )
    n_tri = F.size(F.col("tri"))
    m = t.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.size(F.array_distinct("toks")).alias("n_dist"),
        trigrams.alias("tri"),
    )
    return (
        m.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            rn(
                F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
                    (F.col("n_words") - F.col("n_dist")) * F.lit(1.0)
                    / F.col("n_words")
                ),
                4,
            ).alias("dup_word_frac"),
            rn(
                F.when(n_tri == 0, F.lit(0.0)).otherwise(
                    (n_tri - F.size(F.array_distinct("tri"))) * F.lit(1.0) / n_tri
                ),
                4,
            ).alias("dup_trigram_frac"),
            rn(
                F.coalesce(
                    F.col("top_cnt") * F.lit(2.0) / F.col("n_words"), F.lit(0.0)
                ),
                4,
            ).alias("top_bigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: Patterns chosen to behave identically under Java regex (Spark) and RE2
#: (DuckDB): ASCII classes only, no backreferences, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d{3}[- .]?\d{3}[- .]?\d{4}"

PII_REDACT_ORACLE = f"""
WITH r1 AS (
    SELECT doc_id, text,
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
    FROM documents
),
r2 AS (SELECT *, regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2 FROM r1)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t2, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM r2
"""


@register("pii_redact", PII_REDACT_ORACLE, tags=("text", "quality"))
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails, IPv4 addresses, and phone numbers, with per-kind counts.

    Patterns apply in a fixed order (email -> IP -> phone), each counting on
    the output of the previous replacement so a digit run inside an email is
    never double-counted as a phone.  Everything is native ``regexp_replace``
    / ``regexp_extract_all`` — per-row, shuffle-free, stays in whole-stage
    codegen, and scales linearly with corpus bytes.  (The synthetic fixture
    contains no PII, so the registry run proves the no-op path end-to-end;
    positive matches are pinned by tests/test_text_quality.py.)
    """
    docs = load_table(spark, sf_dir, "documents")
    t1 = F.regexp_replace("text", EMAIL_RE, "<EMAIL>")
    r1 = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        t1.alias("t1"),
    )
    r2 = r1.select(
        "doc_id",
        "n_emails",
        F.size(F.regexp_extract_all("t1", F.lit(IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.regexp_replace("t1", IPV4_RE, "<IP>").alias("t2"),
    )
    return r2.select(
        "doc_id",
        "n_emails",
        "n_ips",
        F.size(F.regexp_extract_all("t2", F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace("t2", PHONE_RE, "<PHONE>").alias("redacted"),
    )


#: entropy runs on a bounded prefix: per-codepoint iteration is O(prefix²)
#: in the worst case, so the bound keeps the per-doc cost constant at any
#: document length (the standard quality-classifier trick).
ENTROPY_PREFIX = 512

CHAR_ENTROPY_ORACLE = f"""
WITH t AS (SELECT doc_id, substr(text, 1, {ENTROPY_PREFIX}) AS p
           FROM documents),
c AS (SELECT doc_id, length(p) AS n,
             list_sort(list_transform(range(1, length(p) + 1),
                                      i -> substr(p, i, 1))) AS cs
      FROM t),
b AS (SELECT doc_id, n,
             list_filter(range(1, n + 1),
                         i -> i = n OR cs[i] <> cs[i + 1]) AS bs
      FROM c),
k AS (SELECT doc_id, n,
             list_transform(range(1, len(bs) + 1),
                            j -> bs[j] - CASE WHEN j = 1 THEN 0
                                              ELSE bs[j - 1] END) AS cnts
      FROM b)
SELECT doc_id,
       CAST(len(cnts) AS BIGINT) AS n_distinct_chars,
       CASE WHEN n = 0 THEN NULL ELSE
         {sql_rn('-list_sum(list_transform(cnts,'
                 ' cnt -> (cnt / CAST(n AS DOUBLE))'
                 ' * log2(cnt / CAST(n AS DOUBLE))))', 4)}
       END AS char_entropy
FROM k
"""


@register("char_entropy", CHAR_ENTROPY_ORACLE, tags=("text",))
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the character distribution over a 512-char
    prefix — a cheap quality/garbage signal (binary blobs and repeated
    boilerplate sit at the entropy extremes).

    Pure higher-order column functions, in the sort-then-count-runs shape:
    codepoints enumerated with sequence+substring, SORTED, run lengths
    derived from the boundary positions (i where cs[i] ≠ cs[i+1]), entropy
    via one aggregate fold.  Interpreted HOF lambdas (not codegen'd), but
    shuffle-free, bounded by the 512-char prefix, and O(p log p) per doc —
    the previous filter-per-distinct-char form was O(p × distinct) and
    ~1.6× slower at sf0.1 (3.8 s → 2.5 s).  Both engines count runs over
    the SAME sorted order (binary collation in each), so the float sum is
    term-for-term identical and the 4-dp floor-round absorbs libm's log2
    ulp differences.

    Empty-doc guard: Spark's ``sequence(1, 0)`` is [1, 0] (default step -1
    when start > stop) while DuckDB's ``range(1, 1)`` is empty — without
    the CASE an empty text would yield cs = ['', ''] and a phantom
    n_distinct_chars = 1 only on the Spark side.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.substring("text", 1, ENTROPY_PREFIX).alias("p")
    )
    c = t.select(
        "doc_id",
        F.length("p").alias("n"),
        F.expr(
            "CASE WHEN length(p) > 0"
            " THEN array_sort(transform(sequence(1, length(p)),"
            "                           i -> substring(p, i, 1)))"
            " ELSE CAST(array() AS array<string>) END"
        ).alias("cs"),
    )
    # every sequence(1, size(...)) needs the size>0 guard (sequence(1, 0)
    # is [1, 0], and element_at would then index out of bounds).
    b = c.select(
        "doc_id",
        "n",
        F.expr(
            "CASE WHEN size(cs) = 0 THEN CAST(array() AS array<int>)"
            " ELSE filter(sequence(1, size(cs)),"
            " i -> i = size(cs) OR element_at(cs, i) <> element_at(cs, i + 1))"
            " END"
        ).alias("bs"),
    )
    k = b.select(
        "doc_id",
        "n",
        F.expr(
            "CASE WHEN size(bs) = 0 THEN CAST(array() AS array<int>)"
            " ELSE transform(sequence(1, size(bs)),"
            " j -> element_at(bs, j) - CASE WHEN j = 1 THEN 0"
            "                               ELSE element_at(bs, j - 1) END)"
            " END"
        ).alias("cnts"),
    )
    ent = F.expr(
        "-aggregate(cnts, 0D, (acc, cnt) ->"
        " acc + (CAST(cnt AS DOUBLE) / n) * log2(CAST(cnt AS DOUBLE) / n))"
    )
    return k.select(
        "doc_id",
        F.size("cnts").cast("long").alias("n_distinct_chars"),
        F.when(F.col("n") > 0, rn(ent, 4)).alias("char_entropy"),
    )


QUALITY_CALIBRATE_ORACLE = f"""
WITH q AS ({QUALITY_SCORE_ORACLE}),
s AS (SELECT doc_id, source FROM documents)
SELECT q.doc_id, s.source, q.quality,
       {sql_rn("percent_rank() OVER (PARTITION BY s.source"
               " ORDER BY q.quality, q.doc_id)", 6)} AS quality_pct
FROM q JOIN s ON s.doc_id = q.doc_id
"""


@register("quality_calibrate", QUALITY_CALIBRATE_ORACLE, tags=("text", "quality"))
def quality_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source percentile normalization of the quality score.

    Raw heuristic scores are not comparable across sources (a news
    domain's median beats a forum's p95), so threshold-based filtering
    per-source over-prunes some domains and under-prunes others; the
    standard fix is calibrating each doc to its percentile WITHIN its
    source and filtering on the percentile.  One ranking window per
    source partition over the registered quality relation (composes
    quality_score, so calibration can't drift from the score it
    calibrates); (quality, doc_id) ordering totalizes ties so
    percent_rank is engine-identical.  At 100 TB the window runs per
    source partition — the same keyed shuffle any per-source statistic
    needs — and emits one O(1) column.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    return (
        q.join(docs, "doc_id")
        .select(
            "doc_id",
            "source",
            "quality",
            rn(F.percent_rank().over(w), 6).alias("quality_pct"),
        )
    )


# ---------------------------------------------------------------------------
# repetition_signals: the Gopher/MassiveText within-document repetition rules
# ---------------------------------------------------------------------------

REP_TOP_N = 2   # "fraction of tokens in the most common n-gram" grain
REP_DUP_N = 5   # "fraction of tokens in duplicated n-grams" grain


def _build_repetition_oracle() -> str:
    from ..functions.hashing import SQL_MD5_INT60

    g2 = SQL_MD5_INT60.format(
        e=f"array_to_string(toks[i + 1 : i + {REP_TOP_N}], ' ')"
    )
    g5 = SQL_MD5_INT60.format(
        e=f"array_to_string(toks[p + 1 : p + {REP_DUP_N}], ' ')"
    )
    return f"""
WITH t AS (SELECT doc_id, {sql_tokens('text', lower=True)} AS toks,
                  list_filter(string_split(text, chr(10)), x -> x <> '')
                    AS lines
           FROM documents),
g2 AS (SELECT doc_id, {g2} AS h
       FROM (SELECT doc_id, toks,
                    unnest(range(0, len(toks) - {REP_TOP_N} + 1)) AS i
             FROM t WHERE len(toks) >= {REP_TOP_N})),
cnt2 AS (SELECT doc_id, h, count(*) AS c FROM g2 GROUP BY doc_id, h),
top2 AS (SELECT doc_id, c FROM (
           SELECT doc_id, c,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, h) AS rk
           FROM cnt2) WHERE rk = 1),
w5 AS (SELECT doc_id, CAST(p AS BIGINT) AS pos, {g5} AS h
       FROM (SELECT doc_id, toks,
                    unnest(range(0, len(toks) - {REP_DUP_N} + 1)) AS p
             FROM t WHERE len(toks) >= {REP_DUP_N})),
dup5 AS (SELECT doc_id, pos FROM w5
         JOIN (SELECT doc_id, h FROM w5 GROUP BY doc_id, h
               HAVING count(*) >= 2) d USING (doc_id, h)),
cov5 AS (SELECT doc_id, count(DISTINCT q) AS covered
         FROM (SELECT doc_id, unnest(range(pos, pos + {REP_DUP_N})) AS q
               FROM dup5)
         GROUP BY doc_id),
ln AS (SELECT doc_id, CAST(len(lines) AS DOUBLE) AS n_lines,
              CAST(len(list_distinct(lines)) AS DOUBLE) AS n_distinct
       FROM t)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       {sql_rn(f"coalesce(top2.c, 0) * {REP_TOP_N}.0"
               " / greatest(len(t.toks), 1)", 4)} AS top2gram_frac,
       {sql_rn("coalesce(cov5.covered, 0) * 1.0"
               " / greatest(len(t.toks), 1)", 4)} AS dup5gram_frac,
       {sql_rn("CASE WHEN ln.n_lines <= 1 THEN 0.0"
               " ELSE 1.0 - ln.n_distinct / ln.n_lines END", 4)}
         AS dup_line_frac
FROM t
LEFT JOIN top2 USING (doc_id)
LEFT JOIN cov5 USING (doc_id)
JOIN ln ON ln.doc_id = t.doc_id
"""


REPETITION_SIGNALS_ORACLE = _build_repetition_oracle()


@register(
    "repetition_signals", REPETITION_SIGNALS_ORACLE, tags=("text", "quality")
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition quality signals — the Gopher /
    MassiveText repetition rules (Rae et al. 2021, App. A), the filter
    family that removes degenerate boilerplate/spam BEFORE corpus-level
    dedup ever runs:

    - ``top2gram_frac``  — tokens claimed by the single most common
      2-token gram over doc tokens (ties to the smallest gram hash; can
      exceed 1.0 on degenerate overlap like "a a a a", exactly as the
      published char-fraction can — thresholds sit well below 1);
    - ``dup5gram_frac``  — fraction of token POSITIONS covered by a
      5-gram occurring >= 2x within the doc (coverage grain, so
      overlapping duplicate windows are not double-counted);
    - ``dup_line_frac``  — 1 − distinct/total over non-empty newline
      lines (0 when the doc has <= 1 line).

    The published rules measure character fractions; these are the
    token/position-grain equivalents (the corpus tokenizer is the
    engine's declared unit — same substitution every op here makes).
    Gram identity is the shared md5-int60 hash space, as in
    ngram_jaccard/contamination_13gram.

    Scale shape: one corpus scan persists the tokenized relation
    (DISK_ONLY — token arrays never to heap); each signal is a
    (doc_id, gram)-keyed aggregate — WITHIN-doc grain, so every shuffle
    key embeds doc_id and skew is bounded by the longest single
    document, not by corpus-wide gram frequency (unlike the cross-doc
    dedup family, no hot-gram problem exists here by construction).
    All fractions are exact-integer ratios rounded at 4 dp on both
    engines.
    """
    from pyspark.storagelevel import StorageLevel

    from ..functions.hashing import SPARK_MD5_INT60

    docs = load_table(spark, sf_dir, "documents")
    t = tracked_persist(
        docs.select(
            "doc_id",
            tokens_lower(F.col("text")).alias("toks"),
            F.filter(
                F.split(F.col("text"), "\n"), lambda x: x != ""
            ).alias("lines"),
        ),
        level=StorageLevel.DISK_ONLY,
    )

    def gram_expr(n: int) -> str:
        h = SPARK_MD5_INT60.format(
            e=f"concat_ws(' ', slice(toks, i + 1, {n}))"
        )
        return (
            f"transform(sequence(0, size(toks) - {n}), "
            f"i -> struct(CAST(i AS BIGINT) AS pos, {h} AS h))"
        )

    g2 = (
        t.filter(F.size("toks") >= REP_TOP_N)
        .select("doc_id", F.explode(F.expr(gram_expr(REP_TOP_N))).alias("s"))
        .select("doc_id", F.col("s.h").alias("h"))
    )
    top2 = (
        g2.groupBy("doc_id", "h")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(F.col("c").alias("c"), (-F.col("h")).alias("nh"))
            ).alias("m")
        )
        .select("doc_id", F.col("m.c").alias("top_c"))
    )

    w5 = (
        t.filter(F.size("toks") >= REP_DUP_N)
        .select("doc_id", F.explode(F.expr(gram_expr(REP_DUP_N))).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    )
    dup_h = (
        w5.groupBy("doc_id", "h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("doc_id", "h")
    )
    cov5 = (
        w5.join(dup_h, ["doc_id", "h"])
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + REP_DUP_N - 1)
            ).alias("q"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("covered"))
    )

    n_toks = F.greatest(F.size("toks"), F.lit(1)).cast("double")
    n_lines = F.size("lines").cast("double")
    n_dlines = F.size(F.array_distinct("lines")).cast("double")
    return (
        t.join(top2, "doc_id", "left")
        .join(cov5, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            rn(
                F.coalesce(F.col("top_c"), F.lit(0)) * float(REP_TOP_N)
                / n_toks,
                4,
            ).alias("top2gram_frac"),
            rn(
                F.coalesce(F.col("covered"), F.lit(0)).cast("double")
                / n_toks,
                4,
            ).alias("dup5gram_frac"),
            rn(
                F.when(n_lines <= 1, F.lit(0.0)).otherwise(
                    F.lit(1.0) - n_dlines / n_lines
                ),
                4,
            ).alias("dup_line_frac"),
        )
    )


# ---------------------------------------------------------------------------
# winnow_fingerprint: winnowing fingerprint selection (Schleimer et al. 2003)
# ---------------------------------------------------------------------------

#: k-gram size (tokens) for winnowing — the noise threshold: matches
#: shorter than WINNOW_K tokens are never detected.
WINNOW_K = 4
#: window size (gram hashes) — the guarantee threshold: any shared run of
#: >= WINNOW_W + WINNOW_K - 1 tokens shares at least one fingerprint.
WINNOW_W = 5

def _winnow_oracle() -> str:
    from ..functions.hashing import SQL_MD5_INT60

    g = SQL_MD5_INT60.format(
        e=f"list_aggregate(toks[i:i + {WINNOW_K - 1}], 'string_agg', ' ')"
    )
    return f"""
WITH t AS (SELECT doc_id, {sql_tokens('text', lower=True)} AS toks
           FROM documents),
g AS (SELECT doc_id,
             list_transform(range(1, len(toks) - {WINNOW_K - 2}),
                            i -> {g}) AS gh
      FROM t WHERE len(toks) >= {WINNOW_K}),
f AS (SELECT doc_id,
             unnest(list_distinct(list_transform(
                 range(1, greatest(1, len(gh) - {WINNOW_W - 1}) + 1),
                 j -> list_min(gh[j : j + {WINNOW_W - 1}])))) AS fp
      FROM g)
SELECT doc_id, fp FROM f
"""


@register("winnow_fingerprint", _winnow_oracle(), tags=("text",))
def winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints per document — the MOSS selection rule
    (Schleimer, Wilkerson, Aiken, SIGMOD 2003).

    Every document reduces to the DISTINCT minima of a sliding window of
    WINNOW_W consecutive k-gram hashes: expected density 2/(w+1) of the
    gram count, with the GUARANTEE that two documents sharing any token
    run of >= w + k - 1 tokens share at least one fingerprint (the local
    property ``doc_fingerprint``'s single global min lacks, at a fraction
    of ``span_dedup``'s fixed-stride emission).  Short docs (>= k tokens
    but fewer than w grams) emit the min of all their grams — one window.

    Scale shape: pure scan-local array expressions (gram hash, window
    min, distinct) inside whole-stage codegen; the output relation is the
    only thing that leaves the scan, at ~2/(w+1) rows per gram.  Zero
    shuffles, zero Python.  Downstream consumers (clone detection, index
    build) group this relation by fp — bounded by fingerprint frequency
    exactly as the published index construction.
    """
    from ..functions.hashing import SPARK_MD5_INT60

    gram_hash = SPARK_MD5_INT60.format(
        e=f"concat_ws(' ', slice(toks, i, {WINNOW_K}))"
    )
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id", tokens_lower(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= WINNOW_K).select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, size(toks) - {WINNOW_K - 1}),"
            f" i -> {gram_hash})"
        ).alias("gh"),
    )
    fps = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(1, size(gh) - {WINNOW_W - 1})),"
            f" j -> array_min(slice(gh, j, {WINNOW_W})))"
        )
    )
    return g.select("doc_id", F.explode(fps).alias("fp"))
