"""simpletons_map_reduce_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of ButterHost69/Simpletons-Map-Reduce (an MIT
6.5840 Lab-1 MapReduce framework in Go: generic map → hash-shuffle → sort →
group → reduce over string key/value pairs, plus a word-count / inverted-index
application library) as an idiomatic Spark DataFrame engine, and extends it
with a relational battery and LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB scale.

Layout:
  session    — SparkSession factory + runtime-conf hygiene
  sources    — parquet/wholetext readers for the driver test tables
  functions  — reusable column expressions (tokenizer, hashing, vectors,
               oracle-stable rounding)
  mapreduce  — the reference's framework API (run_job / run_sequential)
  queries    — registered queries, each paired with a DuckDB oracle SQL
  operators  — LLM-pipeline operators (dedup, similarity, text, multimodal)
  plans      — physical-plan assertions (pushdown / broadcast / codegen)
  streaming  — Structured Streaming variants of the event queries
"""

__version__ = "0.1.0"
