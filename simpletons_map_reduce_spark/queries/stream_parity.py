"""stream_parity_report: the streaming surface under the OFFICIAL hash gate.

The 15 streaming twins (streaming/*.py) are pytest-pinned equivalent to
their oracle-checked batch queries, but until round 8 none of that evidence
reached the driver's CORRECTNESS artifact (VERDICT r6 item 4 / r7 item 3).
This module closes the gap with the same 1-row-relation trick as
``ann_recall_report``: actually EXECUTE three cheap Structured Streaming
twins in-process (parquet file source → watermark → stateful operator →
memory sink, driven to completion with ``processAllAvailable``), compare
each twin's output against its independently-computed batch query in-plan,
and emit one row of cardinalities + mismatch counts whose expected values
the DuckDB oracle pins exactly.  If a twin ever drifts from its batch
semantics, a mismatch count goes nonzero (or a cardinality moves) and the
driver's value hash goes red.

Twins under the gate (chosen as the three cheapest state-machine shapes —
tumbling window, hopping window, watermark-bounded streaming dedup — so the
report stays an observability query, not a second bench):

- ``tumbling_stream``  ≡ batch ``events_tumbling``   (5-min windows)
- ``hopping_stream``   ≡ batch ``events_hopping``    (10-min / 5-min slide)
- ``dedup_stream``     ≡ batch distinct content_hash (one emission each)

Window twins compare (w_start, event_type) keys and exact n_events counts
(sum_value is floor-rounded in the batch report and order-summed in the
stream, so floats stay out of the hash — the count equality already proves
the window assignment and watermark bookkeeping).  The dedup twin must
emit EXACTLY one row per distinct corpus hash: missing, extra, and
re-emitted hashes all count as mismatches.

The reference has no streaming surface at all (SURVEY §2.C); this gate
covers the tier-C extension.  At 100 TB the report is an observability
query run per deploy: each twin's state is watermark-bounded (windows:
live windows per key; dedup: in-watermark hash set), and the comparison
joins are on aggregate relations orders of magnitude smaller than the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rn
from ..sources.tables import load_table
from .events import EVENTS_HOPPING_ORACLE, EVENTS_TUMBLING_ORACLE
from .events import events_hopping, events_tumbling
from .registry import register

STREAM_PARITY_ORACLE = f"""
WITH tb AS ({EVENTS_TUMBLING_ORACLE}),
hp AS ({EVENTS_HOPPING_ORACLE})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM tb) AS n_tumbling_windows,
       CAST(0 AS BIGINT) AS tumbling_mismatch,
       (SELECT CAST(count(*) AS BIGINT) FROM hp) AS n_hopping_windows,
       CAST(0 AS BIGINT) AS hopping_mismatch,
       (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) FROM documents)
         AS n_dedup_emits,
       CAST(0 AS BIGINT) AS dedup_mismatch
"""


def _window_mismatch(stream_df: DataFrame, batch_df: DataFrame) -> DataFrame:
    """1-row count of (w_start, event_type) groups where the streaming twin
    and the batch query disagree on existence or on the exact event count."""
    s = stream_df.select(
        "w_start", "event_type", F.col("n_events").alias("s_n")
    )
    b = batch_df.select(
        "w_start", "event_type", F.col("n_events").alias("b_n")
    )
    return (
        s.join(b, ["w_start", "event_type"], "full_outer")
        .filter(
            F.col("s_n").isNull()
            | F.col("b_n").isNull()
            | (F.col("s_n") != F.col("b_n"))
        )
        .agg(F.count("*").cast("long").alias("m"))
    )


def _fresh(spark: SparkSession, name: str) -> str:
    spark.catalog.dropTempView(name)  # re-runs in one session
    return name


@register("stream_parity_report", STREAM_PARITY_ORACLE, tags=("streaming",))
def stream_parity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run three streaming twins to completion and grade them against
    their batch semantics in one hash-checked row (see module docstring)."""
    # Imported lazily: the streaming package needs no registry and the
    # registry needs no streaming machinery until this query actually runs.
    from ..streaming.dedup_stream import dedup_stream
    from ..streaming.events_stream import (
        hopping_stream,
        run_all_to_memory,
        scaled_state_partitions,
        tumbling_stream,
    )

    def fresh(name: str) -> str:
        return _fresh(spark, name)

    # The three twins are independent pipelines — drive them concurrently
    # (guide §2.6) so micro-batch planning/commit tails overlap.
    tw, hw, dw = run_all_to_memory(
        [
            (tumbling_stream(spark, sf_dir), fresh("spr_tumbling"), None),
            (hopping_stream(spark, sf_dir), fresh("spr_hopping"), None),
            (dedup_stream(spark, sf_dir), fresh("spr_dedup"), None),
        ],
        state_partitions=scaled_state_partitions(
            spark, sf_dir, "events", "documents"
        ),
    )

    n_tumb = tw.agg(F.count("*").cast("long").alias("n_tumbling_windows"))
    m_tumb = _window_mismatch(tw, events_tumbling(spark, sf_dir)).select(
        F.col("m").alias("tumbling_mismatch")
    )
    n_hop = hw.agg(F.count("*").cast("long").alias("n_hopping_windows"))
    m_hop = _window_mismatch(hw, events_hopping(spark, sf_dir)).select(
        F.col("m").alias("hopping_mismatch")
    )

    n_dedup = dw.agg(F.count("*").cast("long").alias("n_dedup_emits"))
    emits = dw.groupBy("content_hash").agg(F.count("*").alias("s_n"))
    corpus = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5("text").alias("content_hash"))
        .distinct()
        .withColumn("b", F.lit(1))
    )
    m_dedup = (
        emits.join(corpus, "content_hash", "full_outer")
        .filter(
            F.col("s_n").isNull() | F.col("b").isNull() | (F.col("s_n") != 1)
        )
        .agg(F.count("*").cast("long").alias("dedup_mismatch"))
    )

    return (
        n_tumb.crossJoin(F.broadcast(m_tumb))
        .crossJoin(F.broadcast(n_hop))
        .crossJoin(F.broadcast(m_hop))
        .crossJoin(F.broadcast(n_dedup))
        .crossJoin(F.broadcast(m_dedup))
    )


# ---------------------------------------------------------------------------
# stream_parity_stateful: the applyInPandasWithState family under the gate
# ---------------------------------------------------------------------------

def _build_stateful_oracle() -> str:
    """Oracle for stream_parity_stateful, composing near_dedup's own CTE
    chain for the expected pair count (same shared-oracle rule as the
    substring family — the gate and the batch op cannot disagree)."""
    from .dedup_ops import NEAR_DEDUP_ORACLE

    return f"""
WITH nd AS ({NEAR_DEDUP_ORACLE})
SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
         AS n_funnel_users,
       CAST(0 AS BIGINT) AS funnel_mismatch,
       (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
         AS n_totals_users,
       CAST(0 AS BIGINT) AS totals_mismatch,
       (SELECT CAST(count(*) AS BIGINT) FROM nd) AS n_neardup_pairs,
       CAST(0 AS BIGINT) AS neardup_mismatch
"""


STREAM_PARITY_STATEFUL_ORACLE = _build_stateful_oracle()


@register(
    "stream_parity_stateful", STREAM_PARITY_STATEFUL_ORACLE, tags=("streaming",)
)
def stream_parity_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hand-rolled ``applyInPandasWithState`` state machines under the
    OFFICIAL hash gate (VERDICT r8 item 3).

    ``stream_parity_report`` gates the three cheapest built-in-operator
    twins; the likeliest silent-drift surface is the CUSTOM-state family,
    where the per-key update logic is ours, not Spark's.  This report
    executes three of those twins to completion (parquet source →
    ``applyInPandasWithState`` → memory sink) and grades each against its
    independently-computed batch query, emitting one row whose expected
    values the DuckDB oracle pins exactly:

    - ``funnel_stream``       ≡ batch per-user funnel anchors
      (``behavior.funnel_user_anchors``): final streamed (mv, mc, mp)
      must null-safe-equal the batch window mins for every user;
    - ``running_user_totals`` ≡ batch per-user (count, sum(value)):
      exact count equality; the float sum within 1e-6 relative (order of
      summation differs by construction — counts prove the bookkeeping);
    - ``near_dedup_stream``   ≡ batch ``near_dedup`` pairs: the distinct
      streamed (doc_a, doc_b, jaccard) set must equal the batch LSH +
      exact-verify output exactly (both round 4-dp half-up; the oracle's
      expected pair count composes near_dedup's own CTE chain).

    Final streamed state per key is recovered from the update-mode
    emission log with null-ignoring ``max`` (funnel anchors only ever
    move forward; totals counts strictly increase per emission), so the
    comparison is micro-batch-count-independent.  At 100 TB this is the
    per-deploy observability query for the stateful family: every
    comparison joins per-key aggregate relations (users, pairs), orders
    of magnitude smaller than the event/token streams, and each twin's
    state is bounded (fixed tuple per user; capped members per bucket).
    """
    from ..sources.tables import load_table as _lt
    from ..streaming.events_stream import (
        run_all_to_memory,
        scaled_state_partitions,
    )
    from ..streaming.funnel_stream import funnel_stream
    from ..streaming.near_dedup_stream import near_dedup_stream
    from ..streaming.stateful import running_user_totals
    from .behavior import funnel_user_anchors
    from .dedup_ops import near_dedup

    # Unlike the other three parity reports, these twins do NOT overlap:
    # all three are applyInPandasWithState pipelines whose Python worker
    # demand is a full task-width each, and driving them concurrently
    # oversubscribes the host (measured 12 s → 20-25 s with heavy
    # hypervisor steal).  The two light per-user state machines instead
    # start NARROW (input-scaled state partitioning — each micro-batch
    # then runs 4 state tasks, not 32); the near-dedup twin keeps the
    # session width on purpose, its state machine is COMPUTE-bound
    # (MinHash verify — measured 12 s → 55 s when starved to 2).
    _nparts = scaled_state_partitions(spark, sf_dir, "events")
    fw = run_all_to_memory(
        [(funnel_stream(spark, sf_dir), _fresh(spark, "sps_funnel"),
          "update", _nparts)]
    )[0]
    tw = run_all_to_memory(
        [(running_user_totals(spark, sf_dir), _fresh(spark, "sps_totals"),
          "update", _nparts)]
    )[0]
    nw = run_all_to_memory(
        [(near_dedup_stream(spark, sf_dir), _fresh(spark, "sps_neardup"),
          None, None)]
    )[0]
    f_final = fw.groupBy("user_id").agg(
        F.max("mv").alias("s_mv"),
        F.max("mc").alias("s_mc"),
        F.max("mp").alias("s_mp"),
    )
    f_batch = funnel_user_anchors(spark, sf_dir)
    n_funnel = f_final.agg(
        F.count("*").cast("long").alias("n_funnel_users")
    )
    m_funnel = (
        f_final.join(f_batch, "user_id", "full_outer")
        .filter(
            ~(
                F.col("s_mv").eqNullSafe(F.col("mv"))
                & F.col("s_mc").eqNullSafe(F.col("mc"))
                & F.col("s_mp").eqNullSafe(F.col("mp"))
            )
        )
        .agg(F.count("*").cast("long").alias("funnel_mismatch"))
    )

    # --- totals: final streamed (count, sum) vs the batch groupBy ------
    t_final = tw.groupBy("user_id").agg(
        F.max("n_events").alias("s_n"),
        F.max_by("sum_value", "n_events").alias("s_sum"),
    )
    t_batch = (
        _lt(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("b_n"),
            F.sum("value").alias("b_sum"),
        )
    )
    n_totals = t_final.agg(
        F.count("*").cast("long").alias("n_totals_users")
    )
    m_totals = (
        t_final.join(t_batch, "user_id", "full_outer")
        .filter(
            F.col("s_n").isNull()
            | F.col("b_n").isNull()
            | (F.col("s_n") != F.col("b_n"))
            | (
                F.abs(F.col("s_sum") - F.col("b_sum"))
                > F.greatest(F.lit(1.0), F.abs(F.col("b_sum"))) * 1e-6
            )
        )
        .agg(F.count("*").cast("long").alias("totals_mismatch"))
    )

    # --- near-dup: distinct streamed pairs vs the batch LSH output -----
    n_pairs = nw.select("doc_a", "doc_b", "jaccard").distinct()
    b_pairs = near_dedup(spark, sf_dir).select(
        "doc_a", "doc_b", F.col("jaccard").alias("b_jaccard")
    )
    n_neardup = n_pairs.agg(
        F.count("*").cast("long").alias("n_neardup_pairs")
    )
    m_neardup = (
        n_pairs.join(b_pairs, ["doc_a", "doc_b"], "full_outer")
        .filter(
            F.col("jaccard").isNull()
            | F.col("b_jaccard").isNull()
            | (F.col("jaccard") != F.col("b_jaccard"))
        )
        .agg(F.count("*").cast("long").alias("neardup_mismatch"))
    )

    return (
        n_funnel.crossJoin(F.broadcast(m_funnel))
        .crossJoin(F.broadcast(n_totals))
        .crossJoin(F.broadcast(m_totals))
        .crossJoin(F.broadcast(n_neardup))
        .crossJoin(F.broadcast(m_neardup))
    )


# ---------------------------------------------------------------------------
# stream_parity_chained: multi-stateful pipelines, stream-stream join, sketch
# ---------------------------------------------------------------------------

def _build_chained_oracle() -> str:
    """Oracle for stream_parity_chained, composing click_attribution's own
    CTE for the expected pair count and mirroring the CMS cell hash
    (same shared-oracle rule as the other parity reports)."""
    from ..functions.hashing import SQL_MD5_INT60
    from ..functions.text import sql_tokens
    from .sketch_ops import CMS_D, CMS_W
    from .temporal import CLICK_ATTRIBUTION_ORACLE

    cell_hash = SQL_MD5_INT60.format(
        e="CAST(d.depth AS VARCHAR) || ':' || tok"
    )
    return f"""
WITH attr AS ({CLICK_ATTRIBUTION_ORACLE}),
days AS (SELECT epoch_us(ts) // 86400000000 AS d FROM events GROUP BY d),
toks AS (SELECT DISTINCT unnest({sql_tokens('text', lower=True)}) AS tok
         FROM documents),
cells AS (SELECT DISTINCT d.depth, {cell_hash} % {CMS_W} AS bucket
          FROM toks CROSS JOIN
               (SELECT unnest(range({CMS_D})) AS depth) d)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM days) AS n_dau_days,
       CAST(0 AS BIGINT) AS dau_mismatch,
       (SELECT CAST(count(*) AS BIGINT) FROM attr) AS n_attr_pairs,
       CAST(0 AS BIGINT) AS attr_mismatch,
       (SELECT CAST(count(*) AS BIGINT) FROM cells) AS n_cms_cells,
       CAST(0 AS BIGINT) AS cms_mismatch
"""


STREAM_PARITY_CHAINED_ORACLE = _build_chained_oracle()


@register(
    "stream_parity_chained", STREAM_PARITY_CHAINED_ORACLE, tags=("streaming",)
)
def stream_parity_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third parity report: the remaining high-risk streaming shapes under
    the OFFICIAL hash gate — a MULTI-stateful-operator pipeline, a
    stream-STREAM interval join, and the streaming sketch.

    - ``dau_stream``          (dropDuplicatesWithinWatermark → windowed
      count, two chained state stores) ≡ batch distinct-(user, day)
      count per day: exact per-day active_users equality;
    - ``attribution_stream``  (watermarked stream-stream interval join,
      both sides' state evicted by the event-time constraint) ≡ batch
      ``click_attribution``: exact (user, click, purchase, lag) set
      equality — the oracle composes click_attribution's own CTE for the
      expected pair count;
    - ``cms_stream``          (running Count-Min relation, state capped
      at d×w rows by construction) ≡ the SAME sketch expression run in
      batch: bit-for-bit (depth, bucket, c) equality, the oracle pinning
      the populated-cell count via the shared md5-int60 cell hash.

    With ``stream_parity_report`` (windows + dedup),
    ``stream_parity_stateful`` (custom state machines), and
    ``stream_parity_extended`` (sessions/enrichment/media), 12 of 15
    streaming twins report under the driver's value-hash gate; the
    remaining 3 are behavioral TTL/arrival-order contracts pinned by
    their dedicated pytest differentials.  At 100 TB each comparison
    joins bounded relations: days, attribution pairs, a ≤ d×w-row
    sketch.
    """
    from ..streaming.events_stream import (
        dau_stream,
        run_all_to_memory,
        scaled_state_partitions,
    )
    from ..streaming.join_stream import attribution_stream
    from ..streaming.sketch_stream import cms_stream, cms_stream_from
    from .temporal import click_attribution

    # Three independent twins, driven concurrently (guide §2.6).
    dw, aw, cw = run_all_to_memory(
        [
            (dau_stream(spark, sf_dir), _fresh(spark, "spc_dau"), None),
            (
                attribution_stream(spark, sf_dir),
                _fresh(spark, "spc_attr"),
                None,
            ),
            (cms_stream(spark, sf_dir), _fresh(spark, "spc_cms"), None),
        ],
        state_partitions=scaled_state_partitions(
            spark, sf_dir, "events", "documents"
        ),
    )
    ev = load_table(spark, sf_dir, "events")
    b_dau = (
        ev.select("user_id", F.window("ts", "1 day").alias("w"))
        .distinct()
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("b_active"))
        .select(F.unix_micros(F.col("w.start")).alias("w_start"), "b_active")
    )
    n_dau = dw.agg(F.count("*").cast("long").alias("n_dau_days"))
    m_dau = (
        dw.join(b_dau, "w_start", "full_outer")
        .filter(
            F.col("active_users").isNull()
            | F.col("b_active").isNull()
            | (F.col("active_users") != F.col("b_active"))
        )
        .agg(F.count("*").cast("long").alias("dau_mismatch"))
    )

    # --- stream-stream interval join ------------------------------------
    b_attr = click_attribution(spark, sf_dir).select(
        "user_id", "click_id", "purchase_id",
        F.col("lag_us").alias("b_lag_us"),
    )
    n_attr = aw.agg(F.count("*").cast("long").alias("n_attr_pairs"))
    m_attr = (
        aw.join(
            b_attr, ["user_id", "click_id", "purchase_id"], "full_outer"
        )
        .filter(
            F.col("lag_us").isNull()
            | F.col("b_lag_us").isNull()
            | (F.col("lag_us") != F.col("b_lag_us"))
        )
        .agg(F.count("*").cast("long").alias("attr_mismatch"))
    )

    # --- streaming Count-Min sketch --------------------------------------
    b_cms = cms_stream_from(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("depth", "bucket", F.col("c").alias("b_c"))
    n_cms = cw.agg(F.count("*").cast("long").alias("n_cms_cells"))
    m_cms = (
        cw.join(b_cms, ["depth", "bucket"], "full_outer")
        .filter(
            F.col("c").isNull()
            | F.col("b_c").isNull()
            | (F.col("c") != F.col("b_c"))
        )
        .agg(F.count("*").cast("long").alias("cms_mismatch"))
    )

    return (
        n_dau.crossJoin(F.broadcast(m_dau))
        .crossJoin(F.broadcast(n_attr))
        .crossJoin(F.broadcast(m_attr))
        .crossJoin(F.broadcast(n_cms))
        .crossJoin(F.broadcast(m_cms))
    )


# ---------------------------------------------------------------------------
# stream_parity_extended: session windows, stream-static join, media decode
# ---------------------------------------------------------------------------

def _build_extended_oracle() -> str:
    """Oracle for stream_parity_extended, composing events_sessionize's
    own CTE chain for the expected session count."""
    from .events import EVENTS_SESSIONIZE_ORACLE

    return f"""
WITH sess AS ({EVENTS_SESSIONIZE_ORACLE})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions,
       CAST(0 AS BIGINT) AS session_mismatch,
       (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_enriched,
       CAST(0 AS BIGINT) AS enrich_mismatch,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_media,
       CAST(0 AS BIGINT) AS media_mismatch
"""


STREAM_PARITY_EXTENDED_ORACLE = _build_extended_oracle()


@register(
    "stream_parity_extended", STREAM_PARITY_EXTENDED_ORACLE, tags=("streaming",)
)
def stream_parity_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth parity report: session windows, the stream-STATIC join, and
    the Arrow media-decode twin under the OFFICIAL hash gate.

    - ``sessionize_stream``  (Spark's stateful merging ``session_window``
      operator — a DIFFERENT algorithm from the batch lag/cumsum
      sessionizer, which is exactly why it needs its own gate) ≡ batch
      ``events_sessionize``: per (user, session_start) existence + exact
      n_events equality;
    - ``enrich_stream``      (stream-static broadcast enrichment, zero
      state) ≡ the identical batch join: per-event segment equality;
    - ``media_stream``       (readStream → Arrow decode kernel) ≡ batch
      ``media_features``: per-media (width, height, rounded f0..f7)
      null-safe struct equality — the kernel is shared verbatim, so any
      drift is a harness bug, which is what a parity gate is for.

    With the other three reports, 12 of 15 streaming twins sit under the
    driver's value-hash gate; the remaining 3 are behavioral TTL/
    arrival-order contracts with no batch-equal output by design, pinned
    by dedicated pytest differentials.
    """
    from ..streaming.events_stream import (
        run_all_to_memory,
        scaled_state_partitions,
        sessionize_stream,
    )
    from ..streaming.join_stream import enrich_stream
    from ..streaming.media_stream import media_stream
    from .events import events_sessionize
    from .multimodal_ops import N_FEATS, media_features

    # Three independent twins, driven concurrently (guide §2.6).
    sw, ew, mw = run_all_to_memory(
        [
            (
                sessionize_stream(spark, sf_dir),
                _fresh(spark, "spe_session"),
                None,
            ),
            (enrich_stream(spark, sf_dir), _fresh(spark, "spe_enrich"), None),
            (media_stream(spark, sf_dir), _fresh(spark, "spe_media"), None),
        ],
        state_partitions=scaled_state_partitions(
            spark, sf_dir, "events", "documents"
        ),
    )

    # --- session windows -------------------------------------------------
    s_final = sw.select(
        "user_id", "session_start", F.col("n_events").alias("s_n")
    )
    b_sess = events_sessionize(spark, sf_dir).select(
        "user_id", "session_start", F.col("n_events").alias("b_n")
    )
    n_sess = s_final.agg(F.count("*").cast("long").alias("n_sessions"))
    m_sess = (
        s_final.join(b_sess, ["user_id", "session_start"], "full_outer")
        .filter(
            F.col("s_n").isNull()
            | F.col("b_n").isNull()
            | (F.col("s_n") != F.col("b_n"))
        )
        .agg(F.count("*").cast("long").alias("session_mismatch"))
    )

    # --- stream-static enrichment ----------------------------------------
    b_enrich = (
        load_table(spark, sf_dir, "events")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    F.col("c_custkey").alias("user_id"), "c_mktsegment"
                )
            ),
            "user_id",
            "left",
        )
        .select(
            "event_id",
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("b_segment"),
        )
    )
    n_enrich = ew.agg(F.count("*").cast("long").alias("n_enriched"))
    m_enrich = (
        ew.select("event_id", "segment")
        .join(b_enrich, "event_id", "full_outer")
        .filter(
            F.col("segment").isNull()
            | F.col("b_segment").isNull()
            | (F.col("segment") != F.col("b_segment"))
        )
        .agg(F.count("*").cast("long").alias("enrich_mismatch"))
    )

    # --- media decode -----------------------------------------------------
    s_media = mw.select(
        "media_id",
        F.struct(
            F.col("width"),
            F.col("height"),
            *[
                rn(F.element_at("feature", k + 1).cast("double"), 4).alias(
                    f"f{k}"
                )
                for k in range(N_FEATS)
            ],
        ).alias("s_row"),
    )
    b_media = media_features(spark, sf_dir).select(
        "media_id",
        F.struct(
            F.col("width"),
            F.col("height"),
            *[F.col(f"f{k}") for k in range(N_FEATS)],
        ).alias("b_row"),
    )
    n_media = s_media.agg(F.count("*").cast("long").alias("n_media"))
    m_media = (
        s_media.join(b_media, "media_id", "full_outer")
        .filter(~F.col("s_row").eqNullSafe(F.col("b_row")))
        .agg(F.count("*").cast("long").alias("media_mismatch"))
    )

    return (
        n_sess.crossJoin(F.broadcast(m_sess))
        .crossJoin(F.broadcast(n_enrich))
        .crossJoin(F.broadcast(m_enrich))
        .crossJoin(F.broadcast(n_media))
        .crossJoin(F.broadcast(m_media))
    )
