"""Positive-case pins for the repetition / PII quality operators.

The synthetic fixture contains no PII and little pathological repetition, so
the registry+oracle run only proves the no-op path; these tests feed crafted
documents through the same column expressions and assert the signals fire.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.queries.text_ops import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
)


def _redact(spark, text: str):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    t1 = F.regexp_replace("text", EMAIL_RE, "<EMAIL>")
    r1 = df.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        t1.alias("t1"),
    )
    r2 = r1.select(
        "doc_id",
        "n_emails",
        F.size(F.regexp_extract_all("t1", F.lit(IPV4_RE), F.lit(0))).alias("n_ips"),
        F.regexp_replace("t1", IPV4_RE, "<IP>").alias("t2"),
    )
    row = r2.select(
        "n_emails",
        "n_ips",
        F.size(F.regexp_extract_all("t2", F.lit(PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.regexp_replace("t2", PHONE_RE, "<PHONE>").alias("redacted"),
    ).head()
    return row


def test_pii_redact_positive(spark):
    row = _redact(
        spark,
        "mail a@b.co or admin@example.org, host 10.0.0.1, call 555-123-4567.",
    )
    assert row.n_emails == 2
    assert row.n_ips == 1
    assert row.n_phones == 1
    assert row.redacted == "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>."


def test_pii_email_digits_not_double_counted_as_phone(spark):
    # the local part is 10 digits shaped like a phone number — the email
    # replacement runs first so the phone counter must see none.
    row = _redact(spark, "contact 5551234567@textmail.example now")
    assert row.n_emails == 1
    assert row.n_phones == 0
    assert row.redacted == "contact <EMAIL> now"


def test_pii_ip_not_counted_as_phone(spark):
    row = _redact(spark, "ping 192.168.100.200 then dial +1 555 123 4567")
    assert row.n_ips == 1
    # "+1 555 123 4567" — the pattern anchors on 3-3-4 digit groups
    assert row.n_phones == 1
    assert "<IP>" in row.redacted and "<PHONE>" in row.redacted


def test_repetition_signals_fire_on_boilerplate(spark):
    """A heavily repeated document scores high on every signal; a
    no-repeat document scores 0 — run through the registered query against
    a temp-dir documents table."""
    from simpletons_map_reduce_spark.queries import REGISTRY

    docs = [
        (0, "spam alert " * 50, "en", "srcX", 550),  # one bigram dominates
        (1, "a b c d e f g h i j", "en", "srcY", 19),  # all distinct
    ]
    sdf = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "documents.parquet")
        sdf.coalesce(1).write.mode("overwrite").parquet(path)
        out = {
            r.doc_id: r
            for r in REGISTRY["repetition_stats"].fn(spark, td).collect()
        }
    spammy, clean = out[0], out[1]
    assert spammy.dup_word_frac > 0.9
    assert spammy.dup_trigram_frac > 0.9
    assert spammy.top_bigram_frac > 0.9
    assert clean.dup_word_frac == 0.0
    assert clean.dup_trigram_frac == 0.0
    # 10 tokens, every bigram unique: top bigram covers 2/10 tokens
    assert abs(clean.top_bigram_frac - 0.2) < 1e-9


def test_char_entropy_empty_and_uniform_docs(spark, duck):
    """Empty text must yield 0 distinct chars and NULL entropy on BOTH
    engines — Spark's sequence(1, 0) is [1, 0] (step -1), which without the
    guard fabricates a phantom '' character only Spark sees.  Also pin the
    closed-form cases: single repeated char → entropy 0; two equiprobable
    chars → entropy 1."""
    from simpletons_map_reduce_spark.queries import REGISTRY

    docs = [
        (0, "", "en", "srcX", 0),
        (1, "aaaa", "en", "srcX", 4),
        (2, "abab", "en", "srcX", 4),
    ]
    sdf = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import os
    import tempfile

    import duckdb

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "documents.parquet")
        sdf.coalesce(1).write.mode("overwrite").parquet(path)
        q = REGISTRY["char_entropy"]
        out = {r.doc_id: r for r in q.fn(spark, td).collect()}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'"
        )
        oracle = {r[0]: r for r in con.sql(q.oracle).fetchall()}
        ocols = [c.lower() for c in con.sql(q.oracle).columns]
        con.close()
    assert out[0].n_distinct_chars == 0
    assert out[0].char_entropy is None
    assert out[1].n_distinct_chars == 1 and out[1].char_entropy == 0.0
    assert out[2].n_distinct_chars == 2 and out[2].char_entropy == 1.0
    i_n, i_e = ocols.index("n_distinct_chars"), ocols.index("char_entropy")
    for did in (0, 1, 2):
        assert oracle[did][i_n] == out[did].n_distinct_chars
        assert oracle[did][i_e] == out[did].char_entropy


def test_split_assign_is_stable_under_corpus_growth(spark):
    """A document's split never changes when other docs are added/removed —
    the md5 assignment is a pure per-row function (incremental re-crawls
    keep their holdout sets)."""
    from simpletons_map_reduce_spark.functions.hashing import MINHASH_PRIME
    from simpletons_map_reduce_spark.queries.sampling_ops import (
        TRAIN_CUT,
        VALID_CUT,
    )
    from pyspark.sql import functions as F
    from simpletons_map_reduce_spark.functions.hashing import md5_mod_prime

    def splits(ids):
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        h = md5_mod_prime(F.expr("CAST(doc_id AS STRING)"))
        s = (
            F.when(h < TRAIN_CUT, "train")
            .when(h < VALID_CUT, "valid")
            .otherwise("test")
        )
        return dict(df.select("doc_id", s.alias("s")).collect())

    small = splits(range(100))
    big = splits(range(1000))
    assert all(big[k] == v for k, v in small.items())
    # and the 80/10/10 proportions are roughly honored on 1000 ids
    from collections import Counter

    c = Counter(big.values())
    assert 700 < c["train"] < 880
    assert MINHASH_PRIME > 0  # import used


def test_sample_hash_rate_close_to_nominal(spark):
    """The deterministic Bernoulli sample hits ~20% on the fixture."""
    from simpletons_map_reduce_spark.queries import REGISTRY
    from tests.conftest import SF001

    n_all = 500
    n_sample = REGISTRY["sample_hash"].fn(spark, SF001).count()
    assert 0.12 * n_all < n_sample < 0.28 * n_all


def test_weighted_sample_favors_heavy_docs(spark):
    """Selection probability must rise with weight: the sampled docs'
    mean n_chars exceeds the corpus mean (u^(1/w) keys grow with w), and
    the sample is exactly K and deterministic across runs."""
    from simpletons_map_reduce_spark.queries import REGISTRY
    from simpletons_map_reduce_spark.queries.sampling_ops import WEIGHTED_K
    from tests.conftest import SF0001

    out1 = REGISTRY["weighted_sample"].fn(spark, SF0001).collect()
    out2 = REGISTRY["weighted_sample"].fn(spark, SF0001).collect()
    assert len(out1) == WEIGHTED_K
    assert sorted(r.doc_id for r in out1) == sorted(r.doc_id for r in out2)
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r.w for r in out1) / len(out1)
    assert sample_mean > corpus_mean


def test_bm25_matches_independent_python_implementation(spark):
    """Differential: the Spark BM25 pipeline vs a from-scratch in-memory
    scorer over the same corpus (reference-style oracle, B7 idiom)."""
    import math
    import re
    from collections import Counter

    from simpletons_map_reduce_spark.queries.search_ops import (
        BM25_B,
        BM25_K1,
        QUERY_TERMS,
        SEARCH_K,
    )
    from simpletons_map_reduce_spark.queries import REGISTRY
    from simpletons_map_reduce_spark.sources.tables import load_table
    from tests.conftest import SF0001

    rows = load_table(spark, SF0001, "documents").select("doc_id", "text").collect()
    tok = lambda s: [t for t in re.split(r"[^a-zA-Z]+", s.lower()) if t]
    corpus = {r.doc_id: tok(r.text) for r in rows}
    dl = {d: len(ts) for d, ts in corpus.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    dfreq = Counter()
    for ts in corpus.values():
        dfreq.update(set(ts) & set(QUERY_TERMS))
    expected = {}
    for d, ts in corpus.items():
        tf = Counter(t for t in ts if t in QUERY_TERMS)
        if not tf:
            continue
        s = 0
        for t, f in tf.items():
            idf = math.log2(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            w = idf * f * (BM25_K1 + 1) / (
                f + BM25_K1 * (1 - BM25_B + BM25_B * dl[d] / avgdl)
            )
            s += math.floor(w * 1e6 + 0.5)
        expected[d] = (len(tf), math.floor(s / 1e6 * 1e4 + 0.5) / 1e4)
    top = sorted(expected.items(), key=lambda kv: (-kv[1][1], kv[0]))[:SEARCH_K]

    got = REGISTRY["bm25_search"].fn(spark, SF0001).collect()
    assert len(got) == len(top)
    for row, (d, (nt, sc)) in zip(got, top):
        assert row.doc_id == d
        assert row.n_terms == nt
        assert abs(row.score - sc) < 1e-9, (d, row.score, sc)


def test_repetition_signals_planted(spark):
    """Gopher repetition rules on planted degenerates: a doc that is one
    5-gram repeated is fully covered (dup5gram_frac == 1.0) with an
    over-unity top-2-gram fraction; a doc of repeated lines reports the
    surplus-line fraction; a clean doc reports zeros."""
    docs = spark.createDataFrame(
        [
            # 12 tokens, all "a": every 5-window duplicated; "a a" occurs
            # 11x -> top2 = 22/12
            (1, " ".join(["a"] * 12)),
            # 3 lines, two identical -> dup_line_frac = 1 - 2/3
            (2, "x y z\nx y z\nq r s"),
            # all-distinct tokens, single line -> zeros
            (3, "one two three four five six seven eight nine ten"),
        ],
        "doc_id BIGINT, text STRING",
    )
    from simpletons_map_reduce_spark.queries.text_ops import (
        repetition_signals,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        rows = {
            r.doc_id: r for r in repetition_signals(spark, d).collect()
        }
    assert rows[1].dup5gram_frac == 1.0
    assert rows[1].top2gram_frac == round(22 / 12, 4)
    assert rows[2].dup_line_frac == round(1 - 2 / 3, 4)
    assert rows[2].dup5gram_frac == 0.0
    assert rows[3].top2gram_frac == round(2 / 10, 4)  # every 2-gram once
    assert rows[3].dup5gram_frac == 0.0
    assert rows[3].dup_line_frac == 0.0


def test_winnow_fingerprint_guarantee_and_density(spark, tmp_path):
    """Winnowing pins (Schleimer et al. 2003): two docs sharing a token
    run of >= w+k-1 share at least one fingerprint (the guarantee); docs
    with no shared k-gram share none; a doc with >= k tokens but fewer
    than w grams still emits (one whole-list window); selection density
    on random text sits near the published 2/(w+1) expectation."""
    import random

    from simpletons_map_reduce_spark.queries import REGISTRY
    from simpletons_map_reduce_spark.queries.text_ops import WINNOW_K, WINNOW_W

    rng = random.Random(3)

    def words(prefix, n):
        # letters only: the tokenizer treats digits as separators
        return [
            prefix + "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                             for _ in range(8))
            for _ in range(n)
        ]

    shared = ["shared" + "x" * (i + 1) for i in range(WINNOW_W + WINNOW_K - 1)]
    docs = {
        1: words("a", 30) + shared + words("a", 30),
        2: words("b", 30) + shared + words("b", 30),
        3: words("c", 60),                      # disjoint from everything
        4: words("d", WINNOW_K),                # exactly one k-gram
        5: words("e", 400),                     # density measurement
    }
    t = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs.items()],
        "doc_id BIGINT, text STRING",
    )
    t.write.parquet(str(tmp_path / "documents.parquet"))
    rows = REGISTRY["winnow_fingerprint"].fn(spark, str(tmp_path)).collect()
    by_doc: dict[int, set[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    assert len(by_doc[4]) == 1
    n_grams = 400 - WINNOW_K + 1
    density = len(by_doc[5]) / n_grams
    expect = 2.0 / (WINNOW_W + 1)
    assert 0.5 * expect <= density <= 1.5 * expect, density


def test_winnow_fingerprint_matches_independent_python(spark, tmp_path):
    """Differential vs a from-scratch pure-Python winnower on random
    corpora — pins the whole chain (tokenize, k-gram hash, window min,
    distinct) beyond the fixture shapes the oracle sweep covers."""
    import hashlib
    import random

    from simpletons_map_reduce_spark.queries import REGISTRY
    from simpletons_map_reduce_spark.queries.text_ops import WINNOW_K, WINNOW_W

    def py_winnow(text: str) -> set[int]:
        # replicate the engine tokenizer: maximal unicode-letter runs,
        # lowercased
        import re

        toks = [t.lower() for t in re.findall(r"[^\W\d_]+", text, re.UNICODE)]
        if len(toks) < WINNOW_K:
            return set()
        ghs = []
        for i in range(len(toks) - WINNOW_K + 1):
            g = " ".join(toks[i : i + WINNOW_K])
            ghs.append(int(hashlib.md5(g.encode()).hexdigest()[:15], 16))
        m = max(1, len(ghs) - WINNOW_W + 1)
        return {min(ghs[j : j + WINNOW_W]) for j in range(m)}

    rng = random.Random(11)
    vocab = ["".join(rng.choice("abcdefgh") for _ in range(3)) for _ in range(40)]
    docs = []
    for d in range(30):
        n = rng.randrange(0, 60)
        docs.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    t = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    t.write.parquet(str(tmp_path / "documents.parquet"))
    got: dict[int, set[int]] = {}
    for r in REGISTRY["winnow_fingerprint"].fn(spark, str(tmp_path)).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    want = {d: py_winnow(text) for d, text in docs}
    want = {d: s for d, s in want.items() if s}
    assert got == want
