"""Tier-B application library — the reference's own queries on DataFrames.

The reference corpus (whole Gutenberg text files) is mirrored by the driver's
``documents`` table: (doc_id, text) ≙ (filename, contents) per FIXTURES.md.

- wordcount        ≙ mrapps/wc.go:19-40 (tokenize + count per word)
- inverted_index   ≙ mrapps/indexer.go:20-39 (distinct word→doc, sorted list)
- per_file_count   ≙ mrapps/early_exit.go:19-36 (records per input file)
- file_stats       ≙ mrapps/crash.go:34-55 / nocrash.go (tagged metadata
                     under fixed keys a/b/c/d + the sorted-join reduce idiom)

All four are pure built-in expressions — tokenization, explode, hash
aggregation, and sort all stay inside whole-stage codegen, and Spark's
partial+final HashAggregate supplies the map-side combine the reference never
implemented (SURVEY §2.C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_tokens, tokens
from ..sources.tables import load_table
from .registry import register

_WORDS_SQL = f"""
    SELECT doc_id, unnest({sql_tokens('text')}) AS word FROM documents
"""

WORDCOUNT_ORACLE = f"""
SELECT word, CAST(count(*) AS BIGINT) AS cnt
FROM ({_WORDS_SQL})
GROUP BY word
"""


@register("wordcount", WORDCOUNT_ORACLE, tags=("tier-b",))
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word frequency over the corpus (mrapps/wc.go:19-40)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


INVERTED_INDEX_ORACLE = f"""
WITH words AS (
    SELECT DISTINCT doc_id, word FROM ({_WORDS_SQL})
)
SELECT word,
       CAST(count(*) AS BIGINT) AS n_docs,
       string_agg(CAST(doc_id AS VARCHAR), ','
                  ORDER BY CAST(doc_id AS VARCHAR)) AS doc_list
FROM words
GROUP BY word
"""


@register("inverted_index", INVERTED_INDEX_ORACLE, tags=("tier-b",))
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word → (doc count, lexicographically sorted doc list).

    Reduce-side format per mrapps/indexer.go:36-39: count then sorted
    comma-joined docs; map-side distinct per mrapps/indexer.go:21-25.
    ``sort_array`` before the join is the reference's determinism idiom
    (SURVEY §2.B B7) — output is stable under task retries.

    One shuffle total: ``collect_set`` both deduplicates (the map-side
    distinct of mrapps/indexer.go:21-25) and gathers the doc list in a
    single partial+final ObjectHashAggregate, so the raw (word, doc) pairs
    never shuffle twice (a separate ``distinct()`` would add an exchange).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.col("doc_id").cast("string").alias("doc"),
        F.explode(tokens(F.col("text"))).alias("word"),
    )
    sets = words.groupBy("word").agg(
        F.sort_array(F.collect_set("doc")).alias("docs")
    )
    return sets.select(
        "word",
        F.size("docs").cast("long").alias("n_docs"),
        F.concat_ws(",", "docs").alias("doc_list"),
    )


PER_FILE_COUNT_ORACLE = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY source
"""


@register("per_file_count", PER_FILE_COUNT_ORACLE, tags=("tier-b",))
def per_file_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Records per input source (mrapps/early_exit.go:19-36 generalized:
    the reference counts per filename; `source` is the file-like grouping of
    the documents table)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(F.count("*").alias("n_docs"))


FILE_STATS_ORACLE = """
WITH tagged AS (
    SELECT 'a' AS k, source AS v FROM documents
    UNION ALL SELECT 'b', CAST(length(source) AS VARCHAR) FROM documents
    UNION ALL SELECT 'c', CAST(n_chars AS VARCHAR) FROM documents
    UNION ALL SELECT 'd', 'xyzzy' FROM documents
)
SELECT k,
       CAST(count(*) AS BIGINT) AS n,
       string_agg(v, ' ' ORDER BY v) AS joined
FROM tagged
GROUP BY k
"""


@register("file_stats", FILE_STATS_ORACLE, tags=("tier-b",))
def file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file metadata under fixed tag keys (mrapps/crash.go:34-43:
    'a'→filename, 'b'→len(filename), 'c'→len(contents), 'd'→'xyzzy'),
    reduced with the canonical sort+space-join (mrapps/crash.go:45-55).

    Single scan: ``inline(array(struct...))`` expands each document row into
    its four tagged rows in one projection — a 4-way union would re-scan
    the table four times (4 FileScans, 4× the I/O at 100 TB)."""
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        F.inline(
            F.array(
                F.struct(
                    F.lit("a").alias("k"), F.col("source").alias("v")
                ),
                F.struct(
                    F.lit("b").alias("k"),
                    F.length("source").cast("string").alias("v"),
                ),
                F.struct(
                    F.lit("c").alias("k"),
                    F.col("n_chars").cast("string").alias("v"),
                ),
                F.struct(F.lit("d").alias("k"), F.lit("xyzzy").alias("v")),
            )
        )
    )
    return tagged.groupBy("k").agg(
        F.count("*").alias("n"),
        F.concat_ws(" ", F.sort_array(F.collect_list("v"))).alias("joined"),
    )


MR_WORDCOUNT_ORACLE = f"""
SELECT word AS key, CAST(count(*) AS VARCHAR) AS value
FROM ({_WORDS_SQL})
GROUP BY word
"""


@register("mr_wordcount", MR_WORDCOUNT_ORACLE, tags=("tier-b", "framework"))
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the FRAMEWORK API itself — run_job's
    map → hash-shuffle → sort-group → reduce pipeline (mapreduce.py ≙
    mr/worker.go), not the native-expression shortcut.

    This puts the reference's actual programming model (arbitrary Python
    map/reduce functions: A3/A5/A8/A9, app = mrapps/wc.go) under the
    driver's strictest gate: the Arrow-batched Python stages must
    hash-match the ANSI-SQL oracle exactly — values-as-strings and all
    (§1.2: the KV model carries numbers as strings, so `value` is the
    stringified count on both sides).  The native `wordcount` entry
    remains the performance path; this one proves API fidelity.
    """
    from ..mapreduce import run_job, wc_map, wc_reduce

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string"), F.col("text")
    )
    return run_job(spark, wc_map, wc_reduce, docs)
