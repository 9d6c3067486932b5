"""Sink round-trips: the reference's output formats written and read back
distributed, with the sorted-union assembly reproduced exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.queries.registry import REGISTRY
from simpletons_map_reduce_spark.sources import (
    read_jsonl,
    read_kv_text,
    write_jsonl,
    write_kv_text,
    write_kv_text_sorted,
    write_parquet,
)
from tests.conftest import SF0001


def _wordcount_kv(spark):
    return REGISTRY["wordcount"].fn(spark, SF0001)


def test_kv_text_roundtrip(spark, tmp_path):
    df = _wordcount_kv(spark)
    path = str(tmp_path / "out")
    write_kv_text(df, path, num_files=4)
    back = read_kv_text(spark, path)
    want = sorted((r[0], str(r[1])) for r in df.collect())
    got = sorted((r.key, r.value) for r in back.collect())
    assert got == want


def test_kv_text_sorted_is_global_sorted_union(spark, tmp_path):
    """mr-out assembly contract (main/test-mr.sh:103): the concatenated
    output must equal `sort` over all "<key> <value>" lines."""
    df = _wordcount_kv(spark)
    path = str(tmp_path / "sorted")
    write_kv_text_sorted(df, path)
    lines = [r.value for r in spark.read.text(path).collect()]
    want = sorted(f"{r[0]} {r[1]}" for r in df.collect())
    assert lines == want


def test_kv_value_with_spaces_survives(spark, tmp_path):
    """Indexer-style values ("<count> <doc,list>") must round-trip: only the
    first space separates key from value (mrapps/indexer.go:36-39)."""
    df = spark.createDataFrame(
        [("word", "3 doc1,doc2,doc3"), ("zeta", "1 doc9")], "key string, value string"
    )
    path = str(tmp_path / "idx")
    write_kv_text(df, path)
    got = sorted((r.key, r.value) for r in read_kv_text(spark, path).collect())
    assert got == [("word", "3 doc1,doc2,doc3"), ("zeta", "1 doc9")]


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    df = _wordcount_kv(spark)
    cols = df.columns
    path = str(tmp_path / "jl")
    write_jsonl(df, path, num_files=2)
    back = read_jsonl(spark, path, schema=f"{cols[0]} string, {cols[1]} bigint")
    assert sorted(map(tuple, back.select(*cols).collect())) == sorted(
        map(tuple, df.collect())
    )


def test_parquet_partitioned_sink_prunes(spark, tmp_path):
    """partitionBy must produce hive dirs a reader can prune on."""
    docs = REGISTRY["lang_id"].fn(spark, SF0001)
    path = str(tmp_path / "pq")
    write_parquet(docs, path, partition_by=["pred_lang"], num_files=2)
    back = spark.read.parquet(path)
    one = back.filter(F.col("pred_lang") == back.select("pred_lang").first().pred_lang)
    # partition pruning: the pushed plan reads only the chosen directory
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(pred_lang" in plan
    assert one.count() > 0


def test_sql_surface_matches_dataframe_query(spark):
    """spark.sql over the registered views ≡ the DataFrame query library."""
    from simpletons_map_reduce_spark.sources.tables import sql

    got = sql(
        spark,
        SF0001,
        """
        SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1, 2
        """,
    ).collect()
    li = REGISTRY["pricing_summary"].fn(spark, SF0001).collect()
    by_key_sql = {(r.l_returnflag, r.l_linestatus): r.n for r in got}
    by_key_df = {(r.l_returnflag, r.l_linestatus): r.count_order for r in li}
    assert by_key_sql == by_key_df


def test_csv_roundtrip_with_schema(spark, tmp_path):
    from simpletons_map_reduce_spark.sources import read_csv, write_csv

    df = _wordcount_kv(spark)
    path = str(tmp_path / "csv_out")
    write_csv(df, path, num_files=3)
    back = read_csv(spark, path, schema="word string, cnt bigint")
    want = sorted((r[0], int(r[1])) for r in df.collect())
    got = sorted((r.word, r.cnt) for r in back.collect())
    assert got == want


def test_clustered_parquet_files_are_disjoint_key_ranges(spark, tmp_path):
    """write_parquet_clustered must produce non-overlapping per-file key
    ranges with sorted row groups — the property parquet min/max pruning
    needs to skip data on key predicates."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from simpletons_map_reduce_spark.sources import load_table
    from simpletons_map_reduce_spark.sources.sinks import write_parquet_clustered

    li = load_table(spark, SF0001, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    out = str(tmp_path / "clustered")
    write_parquet_clustered(li, out, ["l_orderkey"], num_files=4)

    ranges = []
    for f in sorted(Path(out).glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # l_orderkey
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2, "expected multiple data files"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file key ranges: {ranges}"


def test_orc_roundtrip_and_partition_pruning(spark, tmp_path):
    """ORC round-trip preserves values/schema, and a partitioned ORC sink
    produces hive dirs the vectorized ORC reader prunes on."""
    from simpletons_map_reduce_spark.sources import read_orc, write_orc

    df = _wordcount_kv(spark)
    path = str(tmp_path / "orc_out")
    write_orc(df, path, num_files=2)
    back = read_orc(spark, path)
    # ORC (like parquet) reads everything back nullable — compare names+types
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    docs = REGISTRY["lang_id"].fn(spark, SF0001)
    ppath = str(tmp_path / "orc_part")
    write_orc(docs, ppath, partition_by=["pred_lang"], num_files=2)
    pback = read_orc(spark, ppath)
    one = pback.filter(
        F.col("pred_lang") == pback.select("pred_lang").first().pred_lang
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(pred_lang" in plan
    assert one.count() > 0


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across write generations: a later batch adds a
    column; mergeSchema reads both generations with nulls backfilled —
    the contract a 100 TB lake relies on when operators gain fields."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "alpha")], "doc_id long, text string"
    ).write.parquet(p + "/gen=1")
    spark.createDataFrame(
        [(2, "beta", 0.9)], "doc_id long, text string, quality double"
    ).write.parquet(p + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r.doc_id: r for r in merged.collect()}
    assert set(merged.columns) >= {"doc_id", "text", "quality"}
    assert rows[1].quality is None  # old generation backfills null
    assert rows[2].quality == 0.9
    # predicate on the NEW column still prunes correctly over old files
    assert merged.filter(F.col("quality") > 0.5).count() == 1
