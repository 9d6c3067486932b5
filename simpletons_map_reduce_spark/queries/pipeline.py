"""End-to-end training-corpus materialization — what the pipeline is FOR.

A real LLM-data pipeline doesn't stop at per-document metrics: it writes
out the corpus that survives language ID, quality scoring, token-length
bounds and deduplication.  ``corpus_filter`` composes the registered
per-doc operators (lang_id, quality_score, token_count, exact_dedup)
into exactly that materializer, and its oracle nests the SAME per-op SQL
the driver already validates, so the composition can never drift from
its parts.

Plan shape: quality/token metrics are per-row projections, lang and
dedup-winner are aggregates; everything re-joins on doc_id (the natural
partition key at 100 TB — AQE picks broadcast vs shuffle per side).  No
Python UDFs anywhere.

Reference analog: none — the reference stops at wordcount-style apps
(mrapps/), which is precisely the gap SURVEY §2.D mandates closing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import SPARK_MD5_INT60, SQL_MD5_INT60
from ..functions.text import sql_tokens, tokens_lower
from ..sources.tables import load_table
from .dedup_ops import EXACT_DEDUP_ORACLE, exact_dedup
from .registry import register
from .text_ops import (
    LANG_ID_ORACLE,
    QUALITY_SCORE_ORACLE,
    TOKEN_COUNT_ORACLE,
    lang_id,
    quality_score,
    token_count,
)

#: Survival thresholds.  quality compares on the 4-dp-rounded score both
#: engines emit, so the boundary is cross-engine exact.
MIN_QUALITY = 0.5
MIN_TOKENS = 10
MAX_TOKENS = 100_000

CORPUS_FILTER_ORACLE = f"""
WITH q AS ({QUALITY_SCORE_ORACLE}),
l AS ({LANG_ID_ORACLE}),
tc AS ({TOKEN_COUNT_ORACLE}),
w AS (SELECT keep_doc_id FROM ({EXACT_DEDUP_ORACLE}))
SELECT d.doc_id, d.source, l.pred_lang, tc.n_tokens, q.quality
FROM documents d
JOIN w ON w.keep_doc_id = d.doc_id
JOIN q ON q.doc_id = d.doc_id
JOIN l ON l.doc_id = d.doc_id
JOIN tc ON tc.doc_id = d.doc_id
WHERE q.quality >= {MIN_QUALITY}
  AND l.pred_lang <> 'und'
  AND tc.n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
"""


@register("corpus_filter", CORPUS_FILTER_ORACLE, tags=("pipeline",))
def corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the training-ready corpus: exact-dedup winners that
    pass language, quality, and token-length gates."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    winners = exact_dedup(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    lang = lang_id(spark, sf_dir)
    tok = token_count(spark, sf_dir).select("doc_id", "n_tokens")
    return (
        docs.join(winners, "doc_id")
        .join(q, "doc_id")
        .join(lang, "doc_id")
        .join(tok, "doc_id")
        .filter(
            (F.col("quality") >= MIN_QUALITY)
            & (F.col("pred_lang") != "und")
            & F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS)
        )
        .select("doc_id", "source", "pred_lang", "n_tokens", "quality")
    )


#: Contamination scan parameters: word n-gram size, the BOUNDED benchmark
#: suite (the CONTAM_SUITE_DOCS lowest doc_ids stand in for an external
#: MMLU/GSM8K-style eval set — CONSTANT size at any corpus scale, unlike
#: the id-stripe stand-in rounds 1-10 used, which grew as corpus/97 and
#: made the trigram screen flag 99.998% of 5M-doc survivors; VERDICT r10
#: item 4 / SCALE.md:1230-1236), and the minimum shared-distinct-gram
#: count that flags a (train doc, suite doc) pair.  The threshold is
#: calibrated on the fixtures: ≥8 distinct shared trigrams with a single
#: suite doc keeps replica/heavy-overlap pairs and rejects common-English
#: coincidence (threshold 2 flagged ~50% of docs at every SF — a screen
#: that screens nothing).
CONTAM_N = 3
CONTAM_SUITE_DOCS = 100
CONTAM_MIN_SHARED = 8

_TOKS = sql_tokens("text", lower=True)

CONTAMINATION_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             range(1, len(toks) - {CONTAM_N - 2}),
             i -> list_aggregate(toks[i:i + {CONTAM_N - 1}], 'string_agg', ' ')
         ))) AS gram
  FROM t
),
bench AS (SELECT doc_id AS bench_id, gram FROM g
          WHERE doc_id < {CONTAM_SUITE_DOCS})
SELECT g.doc_id, bench_id, CAST(count(*) AS BIGINT) AS n_shared
FROM g JOIN bench USING (gram)
WHERE g.doc_id >= {CONTAM_SUITE_DOCS}
GROUP BY g.doc_id, bench_id
HAVING count(*) >= {CONTAM_MIN_SHARED}
"""


@register("contamination_check", CONTAMINATION_ORACLE, tags=("pipeline",))
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥K distinct word
    n-grams with a held-out benchmark doc.

    Scaling contract (round 11, VERDICT r10 item 4): the build side is a
    genuinely BOUNDED eval suite — the CONTAM_SUITE_DOCS lowest doc_ids,
    CONSTANT size at any corpus scale, exactly the shape
    tools/capstone_sf100.py validated after the id-stripe stand-in
    degenerated at 5M docs (the stripe grew as corpus/97 and its gram
    set was de-facto "all common English": 99.998% of survivors flagged,
    a semantically vacuous row).  A real MMLU/GSM8K-style suite is
    thousands of docs / millions of grams — comfortably broadcastable —
    so the suite-gram side carries an EXPLICIT broadcast hint and the
    100 TB corpus never shuffles raw text: each doc is tokenized and
    reduced to distinct grams map-side, probed against the broadcast,
    and only the surviving (doc, bench, gram-hit) counts enter the
    aggregate exchange.  The trigram grain + ≥CONTAM_MIN_SHARED
    threshold is the cheap high-overlap SCREEN (replica-grade overlap
    with a specific suite doc); the published one-shared-13-gram rule is
    ``contamination_13gram``.
    """
    docs = load_table(spark, sf_dir, "documents")
    return contaminated_pairs(docs)


def _warn_if_empty_suite(members: DataFrame, desc: str) -> None:
    """Loud observability for the silent-degenerate case (ADVICE r11): a
    corpus whose doc_ids miss the fixed suite window makes every
    contamination op return zero rows, and the oracle AGREES — the hash
    gate cannot catch a mis-parameterized suite, so warn.  Cost: one
    take(1) existence probe; the window predicate pushes into the parquet
    scan, so row-group min/max stats prune it to ~zero IO."""
    import warnings

    if members.isEmpty():
        warnings.warn(
            f"contamination suite {desc} matched ZERO documents — the "
            f"fixed doc_id window misses this corpus's id range; every "
            f"contamination row will be empty (re-parameterize the "
            f"suite windows for this corpus)",
            stacklevel=3,
        )


def contaminated_pairs(docs: DataFrame) -> DataFrame:
    """The contamination pair relation over any (doc_id, text) relation —
    exposed so pipeline_funnel_fused can run it on an already-persisted
    corpus frame.  The suite is derived from the SAME relation (its
    CONTAM_SUITE_DOCS lowest doc_ids), so a filtered corpus keeps a
    consistent suite definition."""
    _warn_if_empty_suite(
        docs.filter(F.col("doc_id") < CONTAM_SUITE_DOCS).select("doc_id"),
        f"doc_id < {CONTAM_SUITE_DOCS}",
    )
    t = docs.select("doc_id", tokens_lower(F.col("text")).alias("toks"))
    grams_expr = F.when(
        F.size("toks") >= CONTAM_N,
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, size(toks) - {CONTAM_N - 1}),"
                f" i -> concat_ws(' ', slice(toks, i, {CONTAM_N})))"
            )
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    grams = t.select("doc_id", F.explode(grams_expr).alias("gram"))
    bench = grams.filter(F.col("doc_id") < CONTAM_SUITE_DOCS).select(
        F.col("doc_id").alias("bench_id"), "gram"
    )
    return (
        grams.filter(F.col("doc_id") >= CONTAM_SUITE_DOCS)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= CONTAM_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# contamination_13gram: the standard decontamination grain, multi-benchmark
# ---------------------------------------------------------------------------

#: the published decontamination n (GPT-3 appendix C / PaLM / Llama use
#: 13-token collision as the contamination trigger; one shared 13-gram
#: flags the pair — no minimum-count threshold).
CONTAM13_N = 13
#: BOUNDED benchmark suites — (suite_id, lo, hi) doc_id windows standing
#: in for SEPARATE external eval sets (MMLU-style, GSM8K-style, ...) so
#: the report is per-benchmark, the way production decontamination sweeps
#: multiple suites in one corpus pass.  Round 11 (VERDICT r10 item 4):
#: windows of CONSTANT size replace the %97/%89 id stripes, whose member
#: count grew with the corpus and made the sf100 rows vacuous — a real
#: eval suite does not grow when the crawl does.
CONTAM13_SUITES = ((1, 0, 100), (2, 100, 200))

_G13 = SQL_MD5_INT60.format(
    e=f"list_aggregate(toks[i:i + {CONTAM13_N - 1}], 'string_agg', ' ')"
)

CONTAMINATION_13GRAM_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             range(1, len(toks) - {CONTAM13_N - 2}),
             i -> {_G13}
         ))) AS gh
  FROM t
),
bench AS (
  SELECT DISTINCT suite, lo, hi, gh FROM (
{" UNION ALL ".join(
    f'''    SELECT {sid} AS suite, {lo} AS lo, {hi} AS hi, gh FROM g
           WHERE doc_id >= {lo} AND doc_id < {hi}'''
    for sid, lo, hi in CONTAM13_SUITES
)}
  )
)
SELECT g.doc_id, CAST(suite AS BIGINT) AS suite,
       CAST(count(*) AS BIGINT) AS n_shared
FROM g JOIN bench USING (gh)
WHERE g.doc_id < lo OR g.doc_id >= hi
GROUP BY g.doc_id, suite
"""


@register("contamination_13gram", CONTAMINATION_13GRAM_ORACLE, tags=("pipeline",))
def contamination_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination at the PUBLISHED grain: 13-token-gram collision
    against multiple benchmark suites (VERDICT r6 item 7 / r7 item 7;
    re-parameterized on BOUNDED suites in round 11 — VERDICT r10 item 4).

    ``contamination_check``'s trigram screen is the cheap high-overlap
    filter; the standard practice (GPT-3 appendix C, and PaLM/Llama
    after it) flags a training doc when it shares even ONE 13-token
    n-gram with an eval SUITE.  This op runs that exact rule against
    every benchmark suite in one corpus pass and reports (doc_id, suite,
    n_shared): per-suite, so a doc hitting two suites yields two rows
    and the drop list can be per-suite.  Suite members themselves are
    exempt for their OWN suite only (eval examples are not training
    docs; a suite-1 example CAN be flagged as contaminated training
    data w.r.t. suite 2), matching what production decontamination
    drops.  The suites are CONSTANT-size doc_id windows
    (CONTAM13_SUITES), so the suite gram set is bounded at any corpus
    scale and broadcasts — the id-stripe stand-in this replaces grew
    with the corpus and made the sf100 rows semantically vacuous.

    Scale shape, reusing the repo's gram-hash machinery: each 13-gram is
    reduced MAP-SIDE to a distinct int64 MD5 hash (SPARK/SQL_MD5_INT60 —
    the same cross-engine macro substring_dedup joins on), so ~75-byte
    gram strings never ride the shuffle; 24-byte (doc, hash) pairs do.
    The corpus joins the suite's DISTINCT (suite, gh) gram SET — not
    per-example postings — so join output is <= corpus-grams × suites,
    linear in the corpus.  The round-8 sf100 sweep killed the earlier
    per-example grain on ENOSPC: with a mirror-heavy corpus (1000
    replicas/doc) every suite example collides with every replica, ~10^10
    pre-aggregation join rows — pair-grain contamination is quadratic
    under exactly the duplication real crawls have, and GPT-3-style
    decontamination never needed it (the flag is per train doc × suite).
    The hashed gram space IS the declared semantics, as in ngram_jaccard
    (a 2^-60 collision flags one extra gram identically on both engines).

    .. versionchanged:: round 8
       Output grain changed from per-example pairs to (doc_id, suite,
       n_shared): ``n_shared`` counts the doc's distinct grams shared
       with the SUITE's distinct gram set, not per-example postings (the
       per-example grain is quadratic on mirror-heavy corpora — see the
       ENOSPC note above).  Consumers that need per-example attribution
       should join the flagged (doc, suite) rows back to the suite's
       examples as a second, flagged-docs-only pass — never corpus-wide.
    .. versionchanged:: round 11
       Benchmark selector changed from id STRIPES (doc_id % 97/89 —
       membership grew with the corpus) to constant-size doc_id WINDOWS;
       the report column is now ``suite`` (window id), and the suite
       gram relation carries an explicit broadcast hint because it is
       bounded by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    lo_min = min(lo for _, lo, _ in CONTAM13_SUITES)
    hi_max = max(hi for _, _, hi in CONTAM13_SUITES)
    _warn_if_empty_suite(
        docs.filter(
            (F.col("doc_id") >= lo_min) & (F.col("doc_id") < hi_max)
        ).select("doc_id"),
        f"13-gram windows [{lo_min}, {hi_max})",
    )
    t = docs.select("doc_id", tokens_lower(F.col("text")).alias("toks"))
    gram_hash = SPARK_MD5_INT60.format(
        e=f"concat_ws(' ', slice(toks, i, {CONTAM13_N}))"
    )
    grams_expr = F.when(
        F.size("toks") >= CONTAM13_N,
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, size(toks) - {CONTAM13_N - 1}),"
                f" i -> {gram_hash})"
            )
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
    grams = t.select("doc_id", F.explode(grams_expr).alias("gh"))
    bench = None
    for sid, lo, hi in CONTAM13_SUITES:
        s = grams.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).select(
            F.lit(sid).cast("long").alias("suite"),
            F.lit(lo).cast("long").alias("lo"),
            F.lit(hi).cast("long").alias("hi"),
            "gh",
        )
        bench = s if bench is None else bench.unionAll(s)
    return (
        grams.join(F.broadcast(bench.distinct()), "gh")
        .filter((F.col("doc_id") < F.col("lo")) | (F.col("doc_id") >= F.col("hi")))
        .groupBy("doc_id", "suite")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


CONTAMINATION_APPLY_ORACLE = f"""
WITH flagged AS ({CONTAMINATION_13GRAM_ORACLE})
SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM flagged)
"""


@register("contamination_apply", CONTAMINATION_APPLY_ORACLE, tags=("pipeline",))
def contamination_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of 13-gram decontamination: materialize the corpus
    with every flagged document removed (GPT-3 App. C removes training
    docs that share a 13-gram with any eval suite; ``contamination_13gram``
    is the report, this is the surviving corpus a pipeline actually
    trains on).

    Shared-subquery construction (the substring_dedup_apply trick): the
    drop list IS the registered report query on both engines, so report
    and apply can never disagree on the flagged set.  Plan shape: the
    corpus anti-joins a (doc_id)-distinct drop list that is bounded by
    contamination mass, not corpus size — tiny in any sane pipeline, so
    AQE broadcasts it and the apply is one scan; a fully-contaminated
    corpus degrades to a shuffled anti-join, never a product.
    """
    docs = load_table(spark, sf_dir, "documents")
    drop = contamination_13gram(spark, sf_dir).select("doc_id").distinct()
    return docs.join(drop, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


# ---------------------------------------------------------------------------
# pipeline_funnel: per-stage survivor counts for the whole pipeline
# ---------------------------------------------------------------------------

#: ordered gates; stage 0 is the raw corpus.
FUNNEL_STAGES = (
    "raw", "lang", "quality", "tokens", "exact_dedup", "near_dedup",
    "decontaminated",
)


def _build_funnel_oracle() -> str:
    from .dedup_ops import _build_clusters_oracle

    stage_values = ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(FUNNEL_STAGES)
    )
    return f"""
WITH q AS ({QUALITY_SCORE_ORACLE}),
l AS ({LANG_ID_ORACLE}),
tc AS ({TOKEN_COUNT_ORACLE}),
cl AS ({_build_clusters_oracle()}),
ct AS ({CONTAMINATION_ORACLE}),
flags AS (
  SELECT d.doc_id,
         (l.pred_lang <> 'und') AS ok_lang,
         (q.quality >= {MIN_QUALITY}) AS ok_q,
         (tc.n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}) AS ok_tok,
         (d.doc_id = min(d.doc_id) OVER (PARTITION BY sha256(d.text)))
           AS ok_exact,
         (nl.doc_id IS NULL) AS ok_near,
         (cd.doc_id IS NULL) AS ok_ct
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id
  JOIN l ON l.doc_id = d.doc_id
  JOIN tc ON tc.doc_id = d.doc_id
  LEFT JOIN (SELECT doc_id FROM cl WHERE cluster_id <> doc_id) nl
         ON nl.doc_id = d.doc_id
  LEFT JOIN (SELECT DISTINCT doc_id FROM ct) cd ON cd.doc_id = d.doc_id
),
dropped AS (
  SELECT CASE WHEN NOT ok_lang THEN 1 WHEN NOT ok_q THEN 2
              WHEN NOT ok_tok THEN 3 WHEN NOT ok_exact THEN 4
              WHEN NOT ok_near THEN 5 WHEN NOT ok_ct THEN 6
              ELSE {len(FUNNEL_STAGES)} END AS drop_stage
  FROM flags
),
hist AS (SELECT drop_stage, count(*) AS n FROM dropped GROUP BY 1),
stages(stage_no, stage) AS (VALUES {stage_values})
SELECT CAST(s.stage_no AS BIGINT) AS stage_no, s.stage,
       CAST(coalesce(sum(h.n), 0) AS BIGINT) AS docs
FROM stages s LEFT JOIN hist h ON h.drop_stage > s.stage_no
GROUP BY s.stage_no, s.stage
"""


@register("pipeline_funnel", _build_funnel_oracle(), tags=("pipeline",))
def pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor counts after each pipeline gate — the observability report
    every corpus build ships with (raw → lang → quality → tokens →
    exact-dedup → near-dedup → decontaminated).

    Composes the REGISTERED operators (lang_id, quality_score,
    token_count, exact winners, dedup_clusters' losers,
    contamination_check), so the funnel can never disagree with the
    stages it reports on; the oracle nests the same per-op SQL.

    Shape: all gate relations join on doc_id into one per-doc flag row;
    each doc reduces to its FIRST failing stage, and the funnel comes
    from the ≤7-row drop-stage histogram joined to a literal stage table
    — the corpus is never re-scanned per stage (a 7-way UNION of counts
    would re-run the pipeline seven times at 100 TB; the histogram pass
    runs it once).

    Declared trade-off: because the gates are the REGISTERED operator
    functions (each loading documents itself), the text column is
    scanned once per independent gate (~5 pruned scans + the persisted
    dedup relations' builds) rather than once total.  That is the price
    of by-construction agreement with the operators the funnel reports
    on; a production pipeline that cannot afford the extra scans fuses
    the cheap projections (lang/quality/tokens are one pass over the
    same tokens) into a single stage — the per-op oracles then no longer
    pin the fused stage, which is exactly the drift this query refuses.
    The expensive work (near-dup pair generation, CC iterations) is
    shared through the same persisted relations the standalone ops use.
    """
    from .dedup_ops import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    l = lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    tc = token_count(spark, sf_dir).select("doc_id", "n_tokens")
    w = Window.partitionBy(F.sha2("text", 256))
    ex = docs.select(
        "doc_id", (F.col("doc_id") == F.min("doc_id").over(w)).alias("ok_exact")
    )
    near_losers = (
        dedup_clusters(spark, sf_dir)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id", F.lit(True).alias("is_near_loser"))
    )
    contam = (
        contamination_check(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )
    flags = (
        docs.select("doc_id")
        .join(l, "doc_id")
        .join(q, "doc_id")
        .join(tc, "doc_id")
        .join(ex, "doc_id")
        .join(near_losers, "doc_id", "left")
        .join(contam, "doc_id", "left")
    )
    n_stages = len(FUNNEL_STAGES)
    drop_stage = (
        F.when(F.col("pred_lang") == "und", 1)
        .when(F.col("quality") < MIN_QUALITY, 2)
        .when(~F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS), 3)
        .when(~F.col("ok_exact"), 4)
        .when(F.col("is_near_loser").isNotNull(), 5)
        .when(F.col("is_contam").isNotNull(), 6)
        .otherwise(n_stages)
    )
    hist = (
        flags.select(drop_stage.alias("drop_stage"))
        .groupBy("drop_stage")
        .agg(F.count("*").alias("n"))
    )
    stages = spark.createDataFrame(
        list(enumerate(FUNNEL_STAGES)), "stage_no int, stage string"
    )
    return (
        stages.join(
            F.broadcast(hist), F.col("drop_stage") > F.col("stage_no"), "left"
        )
        .groupBy(F.col("stage_no").cast("long").alias("stage_no"), "stage")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("docs"))
    )


@register("pipeline_funnel_fused", _build_funnel_oracle(), tags=("pipeline",))
def pipeline_funnel_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape of pipeline_funnel: the same ≤7-row histogram
    with the per-doc gates FUSED into one projection over ONE persisted
    corpus scan (VERDICT r4 item 8).

    pipeline_funnel composes the registered operator FUNCTIONS (each
    loading documents itself — ~5 pruned text scans, lang_id's explode +
    two shuffles, plus per-gate joins back on doc_id).  Here the cheap
    gates evaluate as expressions on the scan itself:

    - lang:    ``lang_hit_expr`` (any-stopword hit ≡ pred_lang <> 'und')
    - quality: ``quality_exprs`` (the identical arithmetic, 4-dp rounded)
    - tokens:  ``token_count_expr`` (the identical BPE regex count)
    - exact:   min(doc_id) over the sha256 window (one exchange)

    so no per-gate join exists at all — the flag row is born in the scan
    projection.  Drift safety: the expressions are the SAME functions the
    registered operators evaluate (imported from text_ops), and the
    oracle is the SAME nested-SQL funnel oracle, so fused vs composed is
    oracle-checked equal (plus pinned directly in tests/test_pipeline.py).
    The expensive relations keep their pipelines — contamination runs
    off the SAME persisted (doc_id, text) frame, and the near-dup losers
    come from the persisted MinHash artifact's pair relation
    (``near_dedup_pairs_indexed`` → clusters_from_pairs, round 13 —
    identical pairs by construction, signatures computed once at ingest
    instead of re-derived from the cached frame; same routing as the
    composed funnel's dedup_clusters).

    Scale bound (round-10 sf100 sweep): as ONE query, every stage's
    shuffle files coexist until the job ends (Spark reclaims a shuffle
    only when its dependency is GC-unreachable — never inside the job),
    and at 5M docs the summed footprint exceeded a single box's disk
    twice (ENOSPC at 45 GB and 70 GB free).  The composed pipeline's
    production shape is STAGED with materialized intermediates —
    `tools/capstone_sf100.py` runs exactly that and carries the
    per-stage cost table in SCALE.md; this fused entry remains the
    single-pass reporting shape for corpus slices that fit a node's
    scratch (it is hash-gated at sf0.01/sf0.1/sf1 and ran sf0.1 in
    7.1 s in the round-9 bench).
    """
    from ..caching import tracked_persist
    from ..sources.tables import spread
    from .dedup_ops import clusters_from_pairs, near_dedup_pairs_indexed
    from .text_ops import lang_hit_expr, quality_exprs, token_count_expr
    from ..functions.rounding import rn

    docs = tracked_persist(
        spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    )
    _, _, _, quality = quality_exprs()
    w = Window.partitionBy(F.sha2("text", 256))
    flags = docs.select(
        "doc_id",
        lang_hit_expr().alias("ok_lang"),
        # the registered gate compares the 4-dp ROUNDED score
        (rn(quality, 4) >= MIN_QUALITY).alias("ok_q"),
        token_count_expr()
        .cast("long")
        .between(MIN_TOKENS, MAX_TOKENS)
        .alias("ok_tok"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("ok_exact"),
    )
    near_losers = (
        clusters_from_pairs(
            near_dedup_pairs_indexed(spark, sf_dir).select("doc_a", "doc_b")
        )
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id", F.lit(True).alias("is_near_loser"))
    )
    contam = (
        contaminated_pairs(docs)
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )
    flags = flags.join(near_losers, "doc_id", "left").join(
        contam, "doc_id", "left"
    )
    n_stages = len(FUNNEL_STAGES)
    drop_stage = (
        F.when(~F.col("ok_lang"), 1)
        .when(~F.col("ok_q"), 2)
        .when(~F.col("ok_tok"), 3)
        .when(~F.col("ok_exact"), 4)
        .when(F.col("is_near_loser").isNotNull(), 5)
        .when(F.col("is_contam").isNotNull(), 6)
        .otherwise(n_stages)
    )
    hist = (
        flags.select(drop_stage.alias("drop_stage"))
        .groupBy("drop_stage")
        .agg(F.count("*").alias("n"))
    )
    stages = spark.createDataFrame(
        list(enumerate(FUNNEL_STAGES)), "stage_no int, stage string"
    )
    return (
        stages.join(
            F.broadcast(hist), F.col("drop_stage") > F.col("stage_no"), "left"
        )
        .groupBy(F.col("stage_no").cast("long").alias("stage_no"), "stage")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("docs"))
    )
