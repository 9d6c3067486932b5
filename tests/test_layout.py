"""Zone-map quality pins for the z-order layout operator.

The registry hash-check proves the arithmetic matches the oracle; the pin
that matters for 100 TB is the GEOMETRY claim: a z-ordered layout keeps the
per-zone min/max span small on BOTH interleaved dimensions, while a
single-key sort leaves the secondary dimension's zone maps useless (span ≈
the whole key range, so no scan pruning on that predicate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.queries.layout_ops import Z_BITS
from simpletons_map_reduce_spark.sources.tables import load_table
from tests.conftest import SF001


def _mean_norm_span(rows, lo_attr, hi_attr, lo, hi):
    rng = (hi - lo) or 1
    spans = [
        (getattr(r, hi_attr) - getattr(r, lo_attr)) / rng for r in rows
    ]
    return sum(spans) / len(spans)


def test_zorder_zone_maps_tight_on_both_dimensions(spark):
    rows = REGISTRY["zorder_layout"].fn(spark, SF001).collect()
    assert rows
    li = load_table(spark, SF001, "lineitem")
    b = li.agg(
        F.min("l_orderkey").alias("lo_ok"),
        F.max("l_orderkey").alias("hi_ok"),
        F.min("l_partkey").alias("lo_pk"),
        F.max("l_partkey").alias("hi_pk"),
        F.count("*").alias("n"),
    ).collect()[0]

    ok_span = _mean_norm_span(rows, "min_ok", "max_ok", b.lo_ok, b.hi_ok)
    pk_span = _mean_norm_span(rows, "min_pk", "max_pk", b.lo_pk, b.hi_pk)
    # each zone covers a 2^(Z_BITS/2)-bucket tile per dimension = 1/32 of
    # the bucket space; allow 4x slack for bucket-edge effects.
    bound = 4 * (1 / (1 << (Z_BITS // 2)))
    assert ok_span < bound, ok_span
    assert pk_span < bound, pk_span

    # row counts must cover the table exactly (no row lost to bucketing)
    assert sum(r.n_rows for r in rows) == b.n


def test_single_key_sort_fails_secondary_dimension(spark):
    """Control experiment: zone by l_orderkey range alone (what a plain
    ORDER BY layout gives) — partkey spans collapse to ~the full range,
    while the z-layout above kept them ~1/32.  This is the measured
    justification for interleaving."""
    li = load_table(spark, SF001, "lineitem")
    b = li.agg(
        F.max("l_orderkey").alias("hi_ok"),
        F.min("l_partkey").alias("lo_pk"),
        F.max("l_partkey").alias("hi_pk"),
    ).collect()[0]
    zones = (
        li.select(
            F.expr(
                f"CAST((l_orderkey * {1 << Z_BITS}) div ({b.hi_ok} + 1) AS BIGINT)"
            ).alias("zone"),
            "l_partkey",
        )
        .groupBy("zone")
        .agg(F.min("l_partkey").alias("min_pk"), F.max("l_partkey").alias("max_pk"))
        .collect()
    )
    pk_span = _mean_norm_span(zones, "min_pk", "max_pk", b.lo_pk, b.hi_pk)
    assert pk_span > 0.5, pk_span  # secondary dim essentially unpruned


def test_zorder_pruning_factor(spark):
    """A planner pruning zones on a 10%-of-range predicate over EITHER key
    must be able to skip most zones: count zones whose [min,max] intersects
    the band and pin the scanned fraction."""
    rows = REGISTRY["zorder_layout"].fn(spark, SF001).collect()
    li = load_table(spark, SF001, "lineitem")
    b = li.agg(
        F.min("l_orderkey").alias("lo_ok"),
        F.max("l_orderkey").alias("hi_ok"),
        F.min("l_partkey").alias("lo_pk"),
        F.max("l_partkey").alias("hi_pk"),
    ).collect()[0]
    for lo, hi, lo_attr, hi_attr in (
        (b.lo_ok, b.hi_ok, "min_ok", "max_ok"),
        (b.lo_pk, b.hi_pk, "min_pk", "max_pk"),
    ):
        band_lo = lo + (hi - lo) * 45 // 100
        band_hi = lo + (hi - lo) * 55 // 100
        hit = [
            r
            for r in rows
            if getattr(r, lo_attr) <= band_hi and getattr(r, hi_attr) >= band_lo
        ]
        frac = len(hit) / len(rows)
        # 10% band -> ideally ~10-15% of zones; generous 35% envelope
        assert frac < 0.35, (lo_attr, frac)


def test_zordered_sink_prunes_both_dimensions(spark, tmp_path):
    """End-to-end layout: write lineitem z-ordered on (orderkey, partkey)
    and verify the PER-FILE min/max (what parquet zone maps expose) stay
    tight on BOTH keys, against a single-key clustered control whose
    secondary dimension is unprunable."""
    import os

    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.sources.sinks import (
        write_parquet_clustered,
        write_parquet_zordered,
    )

    li = load_table(spark, SF001, "lineitem").select("l_orderkey", "l_partkey")
    b = li.agg(
        F.min("l_orderkey").alias("lo_ok"),
        F.max("l_orderkey").alias("hi_ok"),
        F.min("l_partkey").alias("lo_pk"),
        F.max("l_partkey").alias("hi_pk"),
    ).collect()[0]

    def file_spans(path):
        spans_ok, spans_pk = [], []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            st = (
                spark.read.parquet(os.path.join(path, f))
                .agg(
                    F.min("l_orderkey"), F.max("l_orderkey"),
                    F.min("l_partkey"), F.max("l_partkey"),
                )
                .collect()[0]
            )
            spans_ok.append((st[1] - st[0]) / ((b.hi_ok - b.lo_ok) or 1))
            spans_pk.append((st[3] - st[2]) / ((b.hi_pk - b.lo_pk) or 1))
        return (
            sum(spans_ok) / len(spans_ok),
            sum(spans_pk) / len(spans_pk),
        )

    zpath = str(tmp_path / "z")
    cpath = str(tmp_path / "c")
    write_parquet_zordered(li, zpath, ("l_orderkey", "l_partkey"), num_files=16)
    write_parquet_clustered(li, cpath, ["l_orderkey"], num_files=16)

    z_ok, z_pk = file_spans(zpath)
    c_ok, c_pk = file_spans(cpath)
    # single-key control: leading key perfectly clustered, secondary ~full
    assert c_ok < 0.15, c_ok
    assert c_pk > 0.5, c_pk
    # z-layout: BOTH dimensions' file spans stay well under the control's
    # secondary span (16 files over a 1024x1024 bucket grid -> each file
    # covers ~1/4 of each axis at worst; require < 0.45)
    assert z_ok < 0.45, z_ok
    assert z_pk < 0.45, z_pk


def test_zordered_sink_rejects_negative_keys(spark, tmp_path):
    """Contract pin (ADVICE r6/r7): the range-bucket arithmetic is only
    engine-identical (and in-range) for non-negative keys, so the sink
    must refuse negative cluster keys BEFORE touching the target path —
    mode('overwrite') must not get the chance to delete pre-existing
    output on a contract violation."""
    import pytest

    from simpletons_map_reduce_spark.sources.sinks import (
        write_parquet_zordered,
    )

    ok = spark.createDataFrame([(1, 5), (2, 6)], "a BIGINT, b BIGINT")
    path = str(tmp_path / "z")
    write_parquet_zordered(ok, path, ("a", "b"))
    bad = spark.createDataFrame(
        [(-1, 5), (2, 6), (3, 7)], "a BIGINT, b BIGINT"
    )
    with pytest.raises(ValueError, match="non-negative"):
        write_parquet_zordered(bad, path, ("a", "b"))
    # prior data at the target survives the rejected overwrite
    assert spark.read.parquet(path).count() == 2
