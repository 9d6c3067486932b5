"""Corpus language-model statistics over ``documents`` — LLM-pipeline tier C.

The reference's text processing is one grouped count per word (mrapps/wc.go
— SURVEY §2.C); this module composes that same unigram relation into the
model-based quality signals a training-data pipeline runs at scale:

- unigram_logprob: per-doc mean log2 unigram probability under the CORPUS
  unigram LM — the classic "perplexity-proxy" quality filter (documents far
  below the corpus distribution are boilerplate/garbage; far above are
  degenerate repetition).  Self-trained: the LM table is the corpus's own
  token counts, so no external model rides along.
- vocab_coverage:  fraction of each doc's tokens inside the top-K corpus
  vocabulary — the "out-of-vocab rate" signal used to drop encoding
  garbage and wrong-language strays.
- zipf_fit:        corpus-level least-squares slope of log2(freq) vs
  log2(rank) — a healthy natural corpus sits near slope -1 (Zipf's law);
  synthetic/templated corpora flatten.  One output row.
- span_dedup:      repeated token-span (boilerplate) detection — sliding
  8-token windows (stride 4) hashed and grouped; spans occurring in >= 2
  docs are the shared-boilerplate report (the fixed-granularity analog of
  paragraph dedup for corpora without layout structure).

Scale shape (100 TB): every op reduces the corpus to the exploded-token /
exploded-span relation and immediately aggregates — one token-keyed or
span-keyed shuffle each; the LM / vocab tables are |vocab| rows (natural
language: ~10⁶-10⁷ — broadcastable) so re-scoring joins broadcast, never
shuffling the corpus twice.  zipf_fit's window runs over the |vocab|-row
aggregate, not the corpus.  Float parity: log2 on both engines, summed per
group and floor-rounded at 4 dp (same contract as char_entropy/user_trend).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..caching import tracked_persist
from ..functions.hashing import SPARK_MD5_INT60, SQL_MD5_INT60
from ..functions.rounding import rn, sql_rn
from ..functions.text import sql_tokens, tokens_lower
from ..sources.tables import load_table
from .registry import register

#: top-K corpus vocabulary for coverage (by count desc, token asc —
#: deterministic across engines).
VOCAB_K = 20
#: terms entering the Zipf regression (rank <= ZIPF_TOP).
ZIPF_TOP = 100
#: span window / stride (tokens) for boilerplate detection.
SPAN_W = 8
SPAN_S = 4
#: minimum duplicated-substring length (tokens) for substring_dedup —
#: every exact duplicate of >= SUBSTR_W tokens is recovered at full,
#: variable length (the stride-1 window granularity is exact, not a
#: fixed-window approximation like span_dedup's).
SUBSTR_W = 8


def _exploded_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(tokens_lower(F.col("text"))).alias("tok")
    )


UNIGRAM_LOGPROB_ORACLE = f"""
WITH e AS (SELECT doc_id, unnest({sql_tokens('text', lower=True)}) AS tok
           FROM documents),
lm AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok),
tot AS (SELECT sum(cnt) AS n FROM lm)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       {sql_rn('avg(log2(cnt / CAST(n AS DOUBLE)))', 4)} AS mean_logprob
FROM e JOIN lm USING (tok) CROSS JOIN tot
GROUP BY doc_id
"""


@register("unigram_logprob", UNIGRAM_LOGPROB_ORACLE, tags=("lm",))
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean log2 unigram probability under the corpus LM.

    Two aggregations over ONE exploded-token relation: (1) the LM table
    tok → count (|vocab| rows), (2) per-doc mean of log2(cnt/N).  The
    corpus total N is a 1-row aggregate broadcast by the cross join.
    The LM join carries NO broadcast hint: vocabulary grows with the
    corpus (Heaps' law — same argument as the ngram dfreq relation), so
    the strategy is AQE's runtime call — broadcast whenever the LM is
    actually small (every tested SF; scoring then reuses the exploded
    relation map-side), skew-aware SMJ when a 100 TB vocabulary isn't.
    """
    e = _exploded_tokens(spark, sf_dir)
    lm = e.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = lm.agg(F.sum("cnt").cast("double").alias("n"))
    return (
        e.join(lm, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            rn(F.avg(F.log2(F.col("cnt") / F.col("n"))), 4).alias(
                "mean_logprob"
            ),
        )
    )


VOCAB_COVERAGE_ORACLE = f"""
WITH e AS (SELECT doc_id, unnest({sql_tokens('text', lower=True)}) AS tok
           FROM documents),
lm AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok),
vocab AS (SELECT tok FROM lm
          ORDER BY cnt DESC, tok LIMIT {VOCAB_K})
SELECT e.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(v.tok) AS BIGINT) AS n_in_vocab,
       {sql_rn('count(v.tok) * 1.0 / count(*)', 4)} AS coverage
FROM e LEFT JOIN vocab v USING (tok)
GROUP BY e.doc_id
"""


@register("vocab_coverage", VOCAB_COVERAGE_ORACLE, tags=("lm",))
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each doc's tokens inside the top-K corpus vocabulary.

    The vocab is the |vocab|-row LM aggregate ranked by (count desc, tok)
    — deterministic in both engines — truncated to VOCAB_K and broadcast;
    coverage is a map-side left-join flag aggregated per doc.  The global
    rank window runs over vocab rows only (bounded), never the corpus.
    """
    e = _exploded_tokens(spark, sf_dir)
    lm = e.groupBy("tok").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), "tok")
    vocab = (
        lm.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        e.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.count("in_vocab").cast("long").alias("n_in_vocab"),
            rn(F.count("in_vocab") * F.lit(1.0) / F.count("*"), 4).alias(
                "coverage"
            ),
        )
    )


ZIPF_FIT_ORACLE = f"""
WITH e AS (SELECT unnest({sql_tokens('text', lower=True)}) AS tok
           FROM documents),
lm AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok),
ranked AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rk
           FROM lm),
xy AS (SELECT log2(CAST(rk AS DOUBLE)) AS x, log2(CAST(cnt AS DOUBLE)) AS y
       FROM ranked WHERE rk <= {ZIPF_TOP}),
s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM xy)
SELECT CAST(n AS BIGINT) AS n_terms,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE {sql_rn('(n * sxy - sx * sy) / (n * sxx - sx * sx)', 4)}
       END AS slope,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE {sql_rn('(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)'
                         ' / n', 4)}
       END AS intercept
FROM s
"""


@register("zipf_fit", ZIPF_FIT_ORACLE, tags=("lm",))
def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law regression: log2(freq) on log2(rank) over the top terms.

    Same explicit-sum normal equations as user_trend (engine-agnostic
    cancellation behavior); the global rank window and the regression both
    run over the |vocab|-row aggregate, so the single-partition window is
    bounded regardless of corpus size.  One output row.
    """
    e = _exploded_tokens(spark, sf_dir).select("tok")
    lm = e.groupBy("tok").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), "tok")
    xy = (
        lm.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= ZIPF_TOP)
        .select(
            F.log2(F.col("rk").cast("double")).alias("x"),
            F.log2(F.col("cnt").cast("double")).alias("y"),
        )
    )
    s = xy.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.when(denom != 0, rn(slope, 4)).alias("slope"),
        F.when(
            denom != 0,
            rn((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4),
        ).alias("intercept"),
    )


_SPAN_CASE = f"""
CASE WHEN size(toks) >= {SPAN_W}
     THEN transform(sequence(0, (size(toks) - {SPAN_W}) div {SPAN_S}),
                    k -> concat_ws(' ', slice(toks, k * {SPAN_S} + 1, {SPAN_W})))
     ELSE CAST(array() AS array<string>) END
"""

_SQL_SPAN_CASE = f"""
CASE WHEN len(toks) >= {SPAN_W}
     THEN list_transform(range(0, (len(toks) - {SPAN_W}) // {SPAN_S} + 1),
                         k -> array_to_string(
                             toks[k * {SPAN_S} + 1 : k * {SPAN_S} + {SPAN_W}],
                             ' '))
     ELSE []::VARCHAR[] END
"""

SPAN_DEDUP_ORACLE = f"""
WITH t AS (SELECT doc_id, {sql_tokens('text', lower=True)} AS toks
           FROM documents),
sp AS (SELECT doc_id,
              unnest(list_distinct(list_transform({_SQL_SPAN_CASE},
                  s -> {SQL_MD5_INT60.format(e='s')}))) AS span_hash
       FROM t)
SELECT span_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS first_doc
FROM sp
GROUP BY span_hash
HAVING count(*) >= 2
"""


@register("span_dedup", SPAN_DEDUP_ORACLE, tags=("lm", "dedup"))
def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated token-span report — boilerplate shared across documents.

    Sliding SPAN_W-token windows at stride SPAN_S, md5-hashed to int64
    per doc (distinct within doc), grouped by span hash; spans present in
    >= 2 docs survive.  The fixed granularity makes this the
    paragraph-dedup analog for corpora without layout structure: stride <
    window guarantees every aligned SPAN_W-token run is covered by some
    emitted span.  One shuffle, keyed by span hash, carrying int64s only;
    at 100 TB the explode factor is n_tokens/SPAN_S rows per doc and the
    HAVING prunes the (dominant) unique-span mass at the first aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_lower(F.col("text")).alias("toks"))
    sp = t.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform("
                    + _SPAN_CASE
                    + ", s -> "
                    + SPARK_MD5_INT60.format(e="s")
                    + ")"
                )
            )
        ).alias("span_hash"),
    )
    return (
        sp.groupBy("span_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


TOKEN_FERTILITY_ORACLE = f"""
WITH d AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len({sql_tokens('text', lower=True)}) AS BIGINT) AS n_toks
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       {sql_rn('sum(n_chars) * 1.0 / sum(n_toks)', 4)} AS chars_per_token
FROM d
GROUP BY lang
"""


@register("token_fertility", TOKEN_FERTILITY_ORACLE, tags=("lm", "text"))
def token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: characters per token.

    The standard tokenizer-efficiency signal (how many bytes one token
    "buys") that drives per-language sampling budgets — languages whose
    fertility balloons under a tokenizer get silently under-represented
    in a token-budgeted mixture unless this is measured.  Per-doc
    char/token counts are scan-stage projections; the per-lang aggregate
    sums exact integers (one O(langs) exchange), so the ratio is
    engine-identical without any float-sum machinery.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.size(tokens_lower(F.col("text"))).cast("long").alias("n_toks"),
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_toks").alias("total_tokens"),
        rn(F.sum("n_chars") / F.sum("n_toks"), 4).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# perplexity_buckets: CCNet-style head/middle/tail LM filtering
# ---------------------------------------------------------------------------

PPL_BUCKETS = 3

PERPLEXITY_BUCKETS_ORACLE = f"""
WITH lp AS ({UNIGRAM_LOGPROB_ORACLE}),
j AS (
  SELECT d.doc_id, d.lang, lp.mean_logprob
  FROM lp JOIN documents d USING (doc_id)
),
b AS (
  SELECT doc_id, lang, mean_logprob,
         ntile({PPL_BUCKETS}) OVER (PARTITION BY lang
                                    ORDER BY mean_logprob DESC, doc_id) AS t
  FROM j
)
SELECT doc_id, lang, mean_logprob,
       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS bucket
FROM b
"""


@register("perplexity_buckets", PERPLEXITY_BUCKETS_ORACLE, tags=("lm",))
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language head/middle/tail terciles by LM score (CCNet's split).

    The public CCNet recipe buckets each language's documents into
    perplexity terciles under a reference LM and trains preferentially on
    the "head"; here the reference LM is the corpus unigram model the
    engine already maintains (``unigram_logprob``), and the tercile is an
    ``ntile`` over (lang) ordered by the ROUNDED per-doc score plus
    doc_id — a deterministic total order, so both engines cut the
    terciles identically.

    Plan shape: the unigram relation (one exploded-scan + two aggregates,
    see unigram_logprob) joined back to the O(docs) (doc_id, lang)
    projection, then ONE window exchange on lang.  Nothing here touches
    more than O(docs) rows after the LM scoring, and the per-language
    ranking is the same sort a 100 TB run pays for any per-group
    quantile cut.
    """
    lp = unigram_logprob(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = lp.join(docs, "doc_id").select("doc_id", "lang", "mean_logprob")
    w = Window.partitionBy("lang").orderBy(
        F.col("mean_logprob").desc(), "doc_id"
    )
    t = F.ntile(PPL_BUCKETS).over(w)
    return j.select(
        "doc_id",
        "lang",
        "mean_logprob",
        F.when(t == 1, "head")
        .when(t == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# substring_dedup: variable-length exact duplicated spans (Lee et al. style)
# ---------------------------------------------------------------------------

def _win_expr(w: int) -> str:
    """Spark window-list expression: stride-1 ``w``-token windows as
    (pos, hash) structs, built inside one transform() so the token array is
    sliced in-place and the explode emits only (doc_id, pos, h) int64
    triplets — the array itself never rides through the shuffle.  Shared
    builder (single source of truth) used by :func:`duplicated_spans`."""
    return (
        f"transform(sequence(0, size(toks) - {w}), "
        "k -> struct(CAST(k AS BIGINT) AS pos, "
        + SPARK_MD5_INT60.format(e=f"concat_ws(' ', slice(toks, k + 1, {w}))")
        + " AS h))"
    )

#: Shared DuckDB CTE chains for the substring-dedup family, composed so the
#: report, the apply, and the keep-one apply can never disagree on the span
#: machinery (same rule as dedup_ops._build_apply_oracle reusing the
#: clusters CTEs).  Base: tokenize → stride-1 windows → window hashes.
_SUBSTR_BASE_CTES = f"""t AS (SELECT doc_id, {sql_tokens('text', lower=True)} AS toks
           FROM documents),
win AS (SELECT doc_id, toks,
               unnest(range(0, len(toks) - {SUBSTR_W} + 1)) AS pos
        FROM t WHERE len(toks) >= {SUBSTR_W}),
hh AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
              {SQL_MD5_INT60.format(
                  e=f"array_to_string(toks[pos + 1 : pos + {SUBSTR_W}], ' ')"
              )} AS h
       FROM win)"""

#: remove-all duplicated positions: every occurrence of a window seen >= 2×.
_SUBSTR_DUP_ALL_CTES = """cnt AS (SELECT h FROM hh GROUP BY h HAVING count(*) >= 2),
dup AS (SELECT doc_id, pos FROM hh JOIN cnt USING (h))"""

#: keep-one duplicated positions: every occurrence EXCEPT the globally
#: first (min (doc_id, pos)) of each window seen >= 2× — the Lee et al.
#: keep-first-occurrence policy at window grain.  Oracle-side a window
#: rank is fine (sf0.01); the Spark side uses the skew-safe groupBy-min.
_SUBSTR_DUP_KEEP1_CTES = """rk AS (SELECT doc_id, pos,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk,
             count(*) OVER (PARTITION BY h) AS c
      FROM hh),
dup AS (SELECT doc_id, pos FROM rk WHERE c >= 2 AND rk > 1)"""

#: merge consecutive duplicated positions into maximal runs (per doc).
_SUBSTR_RUNS_CTES = """runs AS (SELECT doc_id, pos,
                CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                               ORDER BY pos) = 1
                     THEN 0 ELSE 1 END AS brk
         FROM dup),
grp AS (SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM runs)"""

_SUBSTR_CTES = (
    f"{_SUBSTR_BASE_CTES},\n{_SUBSTR_DUP_ALL_CTES},\n{_SUBSTR_RUNS_CTES}"
)
_SUBSTR_KEEP1_CTES = (
    f"{_SUBSTR_BASE_CTES},\n{_SUBSTR_DUP_KEEP1_CTES},\n{_SUBSTR_RUNS_CTES}"
)

#: redaction tail shared by the apply variants: cut covered positions,
#: re-join survivors in order, account per document.
_SUBSTR_APPLY_TAIL = f""",
spans AS (SELECT doc_id, min(pos) AS s,
                 max(pos) - min(pos) + {SUBSTR_W} AS l
          FROM grp GROUP BY doc_id, run_id),
tok_pos AS (SELECT doc_id, toks, unnest(range(0, len(toks))) AS p
            FROM t),
kept AS (SELECT doc_id, p, toks[p + 1] AS tok
         FROM tok_pos tp
         WHERE NOT EXISTS (SELECT 1 FROM spans sp
                           WHERE sp.doc_id = tp.doc_id
                             AND tp.p >= sp.s AND tp.p < sp.s + sp.l))
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - count(k.p) AS BIGINT) AS n_removed,
       coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '') AS text_kept
FROM t LEFT JOIN kept k USING (doc_id)
GROUP BY t.doc_id, t.toks
"""

SUBSTRING_DEDUP_ORACLE = f"""
WITH {_SUBSTR_CTES}
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) - min(pos) + {SUBSTR_W} AS BIGINT) AS span_len,
       CAST(count(*) AS BIGINT) AS n_windows
FROM grp
GROUP BY doc_id, run_id
"""

SUBSTRING_DEDUP_APPLY_ORACLE = f"""
WITH {_SUBSTR_CTES}{_SUBSTR_APPLY_TAIL}"""

SUBSTRING_DEDUP_KEEP_ONE_ORACLE = f"""
WITH {_SUBSTR_KEEP1_CTES}{_SUBSTR_APPLY_TAIL}"""


def _window_hashes(t: DataFrame, w: int) -> DataFrame:
    """Persisted (doc_id, pos, h) stride-1 window-hash relation.

    O(corpus-tokens) exploded relation: DISK_ONLY so the token-scale
    cache never evicts executor memory (same rule as the exploded gram
    relations in dedup_ops._shingle_sets / ngram_containment).
    """
    return tracked_persist(
        t.filter(F.size("toks") >= w)
        .select("doc_id", F.explode(F.expr(_win_expr(w))).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h")),
        level=StorageLevel.DISK_ONLY,
    )


def _merge_runs(dup: DataFrame, w: int) -> DataFrame:
    """Merge consecutive duplicated positions into maximal spans: one
    doc_id-keyed window pass, then a groupBy that reuses the same
    partitioning (doc_id is a prefix of the grouping key)."""
    ordered = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(ordered) == 1, F.lit(0)).otherwise(
        F.lit(1)
    )
    run_id = F.sum("brk").over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dup.withColumn("brk", brk)
        .withColumn("run_id", run_id)
        .groupBy("doc_id", "run_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + w).alias("span_len"),
            F.count("*").cast("long").alias("n_windows"),
        )
        .drop("run_id")
    )


def duplicated_spans(t: DataFrame, w: int = SUBSTR_W) -> DataFrame:
    """Maximal duplicated token spans over a ``(doc_id, toks)`` relation.

    Exposed separately from the registered query so tests can run the
    planted-duplicate differential on synthetic corpora.
    """
    hh = _window_hashes(t, w)
    dup_h = (
        hh.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("h")
    )
    dup = hh.join(dup_h, "h").select("doc_id", "pos")
    return _merge_runs(dup, w)


def duplicated_spans_keep_first(t: DataFrame, w: int = SUBSTR_W) -> DataFrame:
    """Maximal duplicated spans EXCLUDING each window's first occurrence —
    the removal set of the keep-one policy (``substring_dedup_keep_one``).

    A position is marked iff its window hash occurs >= 2× in the corpus
    AND the position is not the window's globally-first occurrence in
    (doc_id, pos) order.  Marked positions then merge into maximal runs
    exactly as in :func:`duplicated_spans`.

    Scale shape: the duplicated-hash set comes from the SAME 8-byte-buffer
    count aggregate the remove-all variant runs (proven at sf100 — 700M
    windows, 24g heap), and only then does the ``min(struct(doc_id,
    pos))`` first-occurrence aggregate run, confined to the DUPLICATED
    occurrences.  The first formulation ran the struct-min over every
    distinct window hash in the corpus — a ~3× aggregation-buffer
    inflation across ~600M keys that OOM'd the round-9 sf100 sweep where
    the count aggregate survives; on natural corpora the duplicated mass
    is a small fraction of the corpus, so the struct-min now aggregates
    orders of magnitude fewer keys.  Both aggregates are map-side
    combinable — never a row_number window, so a boilerplate window
    occurring 10^6 times costs one partial min per input partition, not
    a 10^6-row sorted partition (the skew the oracle-side window
    formulation would hit).  All three joins key on ``h``, so one
    exchange of the window relation serves the whole chain.
    """
    hh = _window_hashes(t, w)
    dup_h = (
        hh.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("h")
    )
    dup_occ = hh.join(dup_h, "h")
    firsts = dup_occ.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    dup = (
        dup_occ.join(firsts, "h")
        .filter(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select("doc_id", "pos")
    )
    return _merge_runs(dup, w)


@register("substring_dedup", SUBSTRING_DEDUP_ORACLE, tags=("lm", "dedup"))
def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length exact duplicated substrings, suffix-array style.

    The standard LLM-pipeline dedup op (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): report, per document,
    the maximal COVERAGE REGIONS of duplicated SUBSTR_W-token windows —
    every token span of length >= SUBSTR_W that occurs at least twice
    anywhere in the corpus (across documents or repeated within one) is
    covered at its TRUE variable length, and adjacent/overlapping
    duplicated runs merge into one reported span (the merged span itself
    need not occur twice verbatim — these are the removal regions of the
    Lee et al. dedup, exactly what ``substring_dedup_apply`` cuts out),
    unlike ``span_dedup``'s fixed 8-token report.

    Distributed shape (the gram-chain equivalent of a suffix array): a
    duplicated substring of length L >= W appears as exactly L - W + 1
    consecutive duplicated stride-1 windows, so

      1. hash every stride-1 W-token window to int64 (scan-local
         transform; only (doc_id, pos, h) triplets leave the scan),
      2. one int64-keyed shuffle counts window occurrences; count >= 2
         marks a window duplicated (map-side partial aggregation prunes
         the dominant unique mass),
      3. join the duplicated-hash set back (AQE picks broadcast when the
         dup set is small, as it is on natural corpora),
      4. one doc_id-keyed window pass merges consecutive positions into
         maximal runs; the closing groupBy reuses the same partitioning
         (doc_id is a prefix of the grouping key — no extra exchange).

    At 100 TB the stride-1 explode is n_tokens rows/doc of 24-byte
    triplets — the same volume every suffix-array construction shuffles —
    and nothing downstream of step 2 exceeds the duplicated mass.  The
    reference has no dedup surface (SURVEY §2.C gap category); this op is
    part of the mandated LLM-pipeline tier.

    Output: (doc_id, span_start, span_len, n_windows) per maximal span,
    token-indexed from 0; n_windows == span_len - W + 1 by construction
    (pinned in tests/test_substring_dedup.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_lower(F.col("text")).alias("toks"))
    return duplicated_spans(t, SUBSTR_W)


@register(
    "substring_dedup_apply", SUBSTRING_DEDUP_APPLY_ORACLE, tags=("lm", "dedup")
)
def substring_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The span-REDACTED corpus — what Lee et al.'s dedup actually writes.

    ``substring_dedup`` reports the duplicated coverage regions; this
    companion materializes the deliverable (mirroring how ``dedup_apply``
    materializes ``near_dedup``'s survivor corpus at the document level):
    every token inside a reported span is cut, the survivors are re-joined
    in order, and each document row carries its removal accounting.  Both
    occurrences of a duplicate are removed (the pure Lee-et-al "dedup every
    repeated span" policy — deterministic and engine-order-independent,
    unlike keep-first-occurrence which depends on a global document order).

    Distributed shape on top of substring_dedup's (see its docstring): the
    per-doc span list is collected into an array column (bounded by that
    doc's duplicated mass) and joined back to the O(docs) token relation on
    doc_id — AQE broadcasts the span side when the dup mass is small, as on
    natural corpora.  The cut itself is a scan-local higher-order
    ``filter(toks, (x, i) -> ...)`` over each doc's own span list — no
    second token-level shuffle; at 100 TB the only new cost over the report
    is the doc_id join.

    Output: (doc_id, n_tokens, n_removed, text_kept) for EVERY document
    (n_removed = 0 and text_kept = the full tokenized text when the doc has
    no duplicated spans).  The reference has no dedup surface (SURVEY
    §2.C); this is the mandated LLM-pipeline tier's removal step.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_lower(F.col("text")).alias("toks"))
    return redact_duplicated_spans(t, SUBSTR_W)


def _redact_spans(t: DataFrame, span_df: DataFrame) -> DataFrame:
    """Cut a span relation's covered positions out of ``(doc_id, toks)``
    — the shared redaction tail of both apply variants (per-doc span
    lists join back on doc_id; the cut is a scan-local higher-order
    filter — no second token-level shuffle)."""
    spans = span_df.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"),
                F.col("span_len").alias("l"),
            )
        ).alias("spans")
    )
    j = t.join(spans, "doc_id", "left")
    kept = F.expr(
        "filter(toks, (x, i) -> spans IS NULL OR "
        "NOT exists(spans, sp -> i >= sp.s AND i < sp.s + sp.l))"
    )
    return j.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("text_kept"),
    )


def redact_duplicated_spans(t: DataFrame, w: int = SUBSTR_W) -> DataFrame:
    """Cut every duplicated span out of a ``(doc_id, toks)`` relation.

    Exposed separately from the registered query (like
    :func:`duplicated_spans`) so tests can run the planted-duplicate
    redaction differential on synthetic corpora.
    """
    return _redact_spans(t, duplicated_spans(t, w))


def redact_keep_first(t: DataFrame, w: int = SUBSTR_W) -> DataFrame:
    """Keep-one redaction over a ``(doc_id, toks)`` relation (exposed for
    the synthetic-corpus differential, like :func:`redact_duplicated_spans`)."""
    return _redact_spans(t, duplicated_spans_keep_first(t, w))


@register(
    "substring_dedup_keep_one",
    SUBSTRING_DEDUP_KEEP_ONE_ORACLE,
    tags=("lm", "dedup"),
)
def substring_dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PAPER-FAITHFUL span redaction: keep each duplicated span's
    first occurrence, remove the rest (VERDICT r8 item 6).

    ``substring_dedup_apply`` removes BOTH occurrences of every duplicated
    span — deterministic and order-free, but stricter than Lee et al.'s
    production dedup, which keeps one copy of each duplicate (their
    released corpora retain the first occurrence in corpus order); on
    mirror-heavy corpora remove-all deletes roughly twice the mass.  This
    variant implements keep-first at window grain: a stride-1 window
    position is redacted iff its hash occurs >= 2× AND it is not the
    window's globally-first occurrence in (doc_id, pos) order — so the
    first copy of a duplicated span survives verbatim and every later
    copy is cut.  "First" is a total order over (doc_id, pos), making the
    kept set independent of partitioning/visit order (a 1000-way parallel
    run keeps the same answer — same determinism rule as semantic_prune).

    Distributed shape on top of substring_dedup's (see its docstring):
    the only change is the dup-position rule — a map-side-combinable
    ``min(struct(doc_id, pos))`` per window hash replaces the count
    filter; redaction reuses the shared span-list join + scan-local
    higher-order filter.  The oracle composes the SAME base/runs/apply
    CTEs as the other two substring queries, so the three variants cannot
    disagree on the span machinery.

    Output: (doc_id, n_tokens, n_removed, text_kept) for EVERY document —
    the schema of ``substring_dedup_apply``; n_removed here is <= the
    remove-all variant's, doc by doc (pinned in
    tests/test_substring_dedup.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_lower(F.col("text")).alias("toks"))
    return redact_keep_first(t, SUBSTR_W)
