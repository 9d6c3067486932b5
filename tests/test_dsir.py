"""Property pins for the DSIR importance-resampling pair (dsir_ops.py).

The exact-oracle gate (tools/check_oracle.py + the driver) proves both ops
agree with DuckDB; these tests pin the *statistical* contract — the
published method's behavior — which SQL parity alone cannot check:
importance weights must separate the target slice from the rest, and
Gumbel top-k must enrich the selection toward the target distribution.
"""

from __future__ import annotations

from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.queries.dsir_ops import DSIR_K, DSIR_TARGET_LANG
from simpletons_map_reduce_spark.sources.tables import load_table
from tests.conftest import SF001


def _lang_by_doc(spark):
    docs = load_table(spark, SF001, "documents").select("doc_id", "lang")
    return {r.doc_id: r.lang for r in docs.collect()}


def test_dsir_weights_separate_target_language(spark):
    """Mean log-weight of target-language docs must exceed the mean of
    every other language — the defining property of the importance
    estimator (target-like text scores high under log p_t/p_r)."""
    lang = _lang_by_doc(spark)
    rows = REGISTRY["dsir_weights"].fn(spark, SF001).collect()
    assert len(rows) > 0
    by_lang: dict[str, list[float]] = {}
    for r in rows:
        assert r.n_grams > 0
        by_lang.setdefault(lang[r.doc_id], []).append(r.logw)
    means = {lg: sum(v) / len(v) for lg, v in by_lang.items()}
    tgt = means.pop(DSIR_TARGET_LANG)
    assert means, "fixture must contain non-target languages"
    for lg, m in means.items():
        assert tgt > m, (lg, tgt, m)


def test_dsir_select_enriches_target(spark):
    """The resample must hold exactly DSIR_K distinct docs and be enriched
    in the target language relative to the corpus base rate (Gumbel noise
    perturbs but cannot erase a multi-nat log-weight gap)."""
    lang = _lang_by_doc(spark)
    sel = REGISTRY["dsir_select"].fn(spark, SF001).collect()
    assert len(sel) == DSIR_K
    assert len({r.doc_id for r in sel}) == DSIR_K
    base = sum(1 for v in lang.values() if v == DSIR_TARGET_LANG) / len(lang)
    got = sum(1 for r in sel if r.lang == DSIR_TARGET_LANG) / len(sel)
    assert got > base, (got, base)
    # row attributes must agree with the source table
    for r in sel:
        assert r.lang == lang[r.doc_id]


def test_dsir_select_keys_descend_from_weights(spark):
    """Every selected key must be >= the best key among UNSELECTED docs —
    i.e. the LIMIT really took the global top-k of the Gumbel-perturbed
    weights (guards against a per-partition cut shipping as global)."""
    sel = REGISTRY["dsir_select"].fn(spark, SF001)
    keys = sorted((r.key_scaled for r in sel.collect()), reverse=True)
    # recompute the full keyed relation via the module internals
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.functions.hashing import (
        MINHASH_PRIME,
        md5_mod_prime,
    )
    from simpletons_map_reduce_spark.queries.dsir_ops import (
        DSIR_KEY_SCALE,
        _doc_weights,
    )

    u = (md5_mod_prime(F.expr("CAST(doc_id AS STRING)")) + 0.5) / float(
        MINHASH_PRIME
    )
    gumbel_units = F.floor(
        -F.log(-F.log(u)) * DSIR_KEY_SCALE + F.lit(0.5)
    ).cast("long")
    all_keys = sorted(
        (
            r.k
            for r in _doc_weights(spark, SF001)
            .select((F.col("lw_units") + gumbel_units).alias("k"))
            .collect()
        ),
        reverse=True,
    )
    assert keys == all_keys[:DSIR_K]


def test_dsir_matches_oracle_on_random_corpora(spark, tmp_path):
    """Cross-engine differential on RANDOM corpora (the oracle sweep only
    covers the fixture shapes): random token soup across 3 'languages'
    with varying doc lengths — including sub-bigram docs — must produce
    identical weights and an identical selection on both engines."""
    import random

    import duckdb

    from simpletons_map_reduce_spark.queries import REGISTRY

    rng = random.Random(29)
    vocab = {
        lang: ["".join(rng.choice("abcdefghij") for _ in range(4))
               for _ in range(30)]
        for lang in ("en", "de", "zh")
    }
    docs = []
    for d in range(60):
        lang = rng.choice(("en", "de", "zh"))
        n = rng.randrange(0, 40)  # includes 0- and 1-token docs
        docs.append(
            (d, " ".join(rng.choice(vocab[lang]) for _ in range(n)),
             lang, f"src{d % 3}", n * 5)
        )
    sdf = spark.createDataFrame(
        docs,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    path = str(tmp_path / "documents.parquet")
    sdf.coalesce(1).write.parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    for name in ("dsir_weights", "dsir_select"):
        q = REGISTRY[name]
        got_rows = [tuple(r) for r in q.fn(spark, str(tmp_path)).collect()]
        want_rows = [tuple(r) for r in con.sql(q.oracle).fetchall()]
        # row counts too: set-compare alone would hide duplicate-row
        # fan-out bugs and pass vacuously on empty-vs-empty
        assert len(got_rows) == len(want_rows) > 0, (
            name, len(got_rows), len(want_rows)
        )
        got, want = set(got_rows), set(want_rows)
        assert len(got) == len(got_rows), f"{name}: duplicate Spark rows"
        # column order differs between engines only if the SQL reorders;
        # both emit the same order here — compare full row tuples.
        assert got == want, (
            name,
            sorted(got - want)[:3],
            sorted(want - got)[:3],
        )
    con.close()
