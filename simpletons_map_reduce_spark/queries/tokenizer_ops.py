"""Tokenizer induction — distributed BPE merge learning over the corpus.

A training-data pipeline does not just *apply* a tokenizer; it has to
*learn* one from the corpus (byte-pair encoding, Sennrich et al. 2016 —
public algorithm).  The classic implementation is a single-machine loop
over a word-frequency dict; the distributed shape used here is the standard
two-level decomposition:

1. ONE corpus scan reduces 100 TB of text to the word-frequency relation
   (|vocab| rows — Heaps-law bounded, many orders of magnitude smaller than
   the corpus).  This is the only pass that touches document text.
2. Each BPE iteration runs entirely over that vocab relation: count
   adjacent symbol pairs (explode + one hash aggregate, weighted by word
   frequency), pick the argmax pair (deterministic tie-break: count desc,
   then (left, right) lexicographic), and apply the merge with a
   whole-stage-codegen `aggregate()` state machine over each word's symbol
   array — greedy left-to-right, non-overlapping, exactly the reference
   algorithm's semantics.  No Python touches a row; the driver sees only
   the 1-row argmax per iteration (the merge table IS the algorithm's
   output, so collecting it is not a driver-side loop over data).

The per-iteration vocab state is localCheckpoint-materialized (the
`nation_pagerank` idiom) so iteration k+1 re-plans O(|vocab|) work, not the
whole lineage.

BPE's merge choice depends on a global argmax each round, which is not
expressible as one ANSI-SQL query over the inputs — registered
``oracle=None`` (rows-only driver check); full value correctness is pinned
in tests/test_tokenizer_ops.py by a differential against an independent
pure-Python BPE reference on the same word frequencies, plus an
engine-vs-engine check of the pair-count relation for the first iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import free_checkpoint
from ..functions.rounding import rn
from ..functions.text import tokens_lower
from ..sources.tables import load_table
from .registry import register

#: number of merges to learn — enough to show multi-char symbols merging
#: with earlier merges' outputs (the part a one-shot pair count gets wrong).
N_MERGES = 8


#: Symbol split: one array element per Unicode CODE POINT.  Java >= 8
#: regex never places a zero-width split inside a surrogate pair, so
#: ``split(word, '')`` yields supplementary-plane characters (e.g. U+1D56C)
#: as single symbols — matching the pure-Python references in
#: tests/test_tokenizer_ops.py, which iterate code points.  Pinned by
#: test_bpe_supplementary_plane_symbols (ADVICE r6).
_CODEPOINT_SPLIT = "filter(split(word, ''), s -> s <> '')"


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def _apply_merge_expr(left: str, right: str) -> str:
    """`aggregate()` state machine merging adjacent (left, right) symbol
    occurrences greedily left-to-right (non-overlapping), as BPE requires.

    Accumulator: (out ARRAY<STRING>, prev STRING); prev is NULL right after
    a merge so the merged symbol cannot chain into a second merge in the
    same pass (BPE applies one merge per iteration, re-counting between).
    """
    l, r = _sql_quote(left), _sql_quote(right)
    return f"""
      CASE WHEN size(sym) < 2 THEN sym ELSE
        aggregate(
          slice(sym, 2, size(sym) - 1),
          named_struct('out', CAST(array() AS ARRAY<STRING>),
                       'prev', element_at(sym, 1)),
          (acc, x) -> CASE
            WHEN acc.prev = '{l}' AND x = '{r}'
              THEN named_struct('out', concat(acc.out, array('{l}{r}')),
                                'prev', CAST(NULL AS STRING))
            WHEN acc.prev IS NULL THEN named_struct('out', acc.out, 'prev', x)
            ELSE named_struct('out', concat(acc.out, array(acc.prev)),
                              'prev', x)
          END,
          acc -> CASE WHEN acc.prev IS NULL THEN acc.out
                      ELSE concat(acc.out, array(acc.prev)) END)
      END
    """


def word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one corpus pass: (word, freq) over lowercased tokens."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_lower(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def learn_bpe(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """Run the BPE loop over the sf corpus; returns
    [(rank, left, right, pair_count), ...]."""
    return learn_bpe_from_words(word_frequencies(spark, sf_dir), n_merges)


def learn_bpe_from_words(
    word_freq: DataFrame, n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """BPE loop over any (word, freq) relation (exposed for the fuzz
    differential, which generates random vocabularies).

    One Spark job per iteration: the vocab checkpoint is LAZY
    (``localCheckpoint(eager=False)`` — a LogicalRDD that persists its
    blocks the first time an action computes it), so the top-pair
    ``collect`` both materializes the merged vocab and reads the argmax
    in a single job.  The eager-checkpoint form paid two jobs per merge
    (materialize, then count pairs) — measured ~1.7× the whole loop at
    sf0.1.  Lineage stays one hop (the checkpointed PREVIOUS vocab), so
    plans do not grow with iteration count; a superseded vocab's blocks
    are freed only AFTER the collect that materialized its successor.
    """
    vocab = word_freq.select(
        F.expr(_CODEPOINT_SPLIT).alias("sym"), "freq"
    ).localCheckpoint(eager=False)
    superseded: DataFrame | None = None
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            top = (
                vocab.filter(F.size("sym") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(sym) - 1),"
                            " i -> struct(element_at(sym, i) AS l,"
                            "             element_at(sym, i + 1) AS r))"
                        )
                    ).alias("p"),
                    "freq",
                )
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "l", "r")
                .limit(1)
                .collect()
            )
            # the collect computed every partition of `vocab`, so the
            # previous generation's blocks are no longer reachable
            if superseded is not None:
                free_checkpoint(superseded)
                superseded = None
            if not top:
                break
            l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
            merges.append((rank, l, r, cnt))
            superseded = vocab
            vocab = vocab.select(
                F.expr(_apply_merge_expr(l, r)).alias("sym"), "freq"
            ).localCheckpoint(eager=False)
    finally:
        if superseded is not None:
            free_checkpoint(superseded)
        free_checkpoint(vocab)
    return merges


@register("bpe_merges", None, tags=("text", "tokenizer"))
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table: (rank, left, right, merged, pair_count)."""
    merges = learn_bpe(spark, sf_dir)
    rows = [
        (rank, l, r, l + r, cnt) for rank, l, r, cnt in merges
    ]
    return spark.createDataFrame(
        rows, "rank BIGINT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


@register("bpe_encode", None, tags=("text", "tokenizer"))
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merges corpus-wide: per-doc segment counts.

    Completes the tokenizer loop: ``bpe_merges`` learns the merge table,
    this op applies it and reports what a training pipeline budgets on —
    per-document BPE token count and chars-per-token fertility after
    merging, vs the raw character segmentation.

    Distributed shape: the merges are applied to the VOCAB relation (the
    same Heaps-bounded (word, freq) table the learner iterates on), as a
    chain of N whole-stage-codegen ``aggregate()`` state machines — one
    per learned merge, the exact apply order BPE prescribes.  The corpus
    is then scored by joining each document's exploded tokens to the
    segmented vocab (join strategy left to AQE — the vocab is
    corpus-growing), so no document text is reprocessed per merge and no
    Python touches a row.

    Output depends on the learned merge table (data-dependent argmax
    chain) → ``oracle=None``; value parity is pinned in
    tests/test_tokenizer_ops.py by an independent pure-Python
    encode-with-merges reference over the same corpus.
    """
    from ..caching import tracked_persist

    merges = learn_bpe(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    e = docs.select(
        "doc_id", F.explode(tokens_lower(F.col("text"))).alias("word")
    )
    vocab = tracked_persist(e.select("word").distinct()).select(
        "word", F.expr(_CODEPOINT_SPLIT).alias("sym")
    )
    for _, l, r, _cnt in merges:
        vocab = vocab.select("word", F.expr(_apply_merge_expr(l, r)).alias("sym"))
    seg = vocab.select(
        "word",
        F.size("sym").cast("long").alias("n_sym"),
        F.length("word").cast("long").alias("n_chars"),
    )
    return (
        e.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
            F.sum("n_chars").cast("long").alias("n_word_chars"),
        )
        .select(
            "doc_id",
            "n_bpe_tokens",
            "n_word_chars",
            rn(
                F.col("n_word_chars") * 1.0 / F.col("n_bpe_tokens"), 4
            ).alias("chars_per_bpe_token"),
        )
    )
