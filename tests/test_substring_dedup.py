"""substring_dedup: variable-length exact duplicated spans.

Pins (VERDICT r6 item 2):
- planted long duplicates are recovered at their TRUE variable length
  (start + length exact), across docs and as within-doc self-repeats;
- a pure-Python brute-force reference (independent window-set + run-merge
  implementation) agrees exactly on randomized corpora;
- the n_windows == span_len - W + 1 invariant holds on real data.
"""

from __future__ import annotations

import random

from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.queries.lm_ops import (
    SUBSTR_W,
    duplicated_spans,
    redact_duplicated_spans,
)

from tests.conftest import SF0001


def _ref_spans(docs: dict[int, list[str]], w: int) -> set[tuple[int, int, int, int]]:
    """Independent brute-force reference: hash-free window multiset over
    actual token tuples, then per-doc run merge."""
    from collections import Counter

    occ: Counter[tuple[str, ...]] = Counter()
    for toks in docs.values():
        for k in range(len(toks) - w + 1):
            occ[tuple(toks[k : k + w])] += 1
    out: set[tuple[int, int, int, int]] = set()
    for doc_id, toks in docs.items():
        dup = [
            k
            for k in range(len(toks) - w + 1)
            if occ[tuple(toks[k : k + w])] >= 2
        ]
        if not dup:
            continue
        start = prev = dup[0]
        n = 1
        for p in dup[1:]:
            if p == prev + 1:
                prev = p
                n += 1
            else:
                out.add((doc_id, start, prev - start + w, n))
                start = prev = p
                n = 1
        out.add((doc_id, start, prev - start + w, n))
    return out


def _spark_spans(spark, docs: dict[int, list[str]]) -> set[tuple[int, int, int, int]]:
    t = spark.createDataFrame(
        [(d, toks) for d, toks in docs.items()],
        "doc_id BIGINT, toks ARRAY<STRING>",
    )
    rows = duplicated_spans(t, SUBSTR_W).collect()
    return {
        (r.doc_id, r.span_start, r.span_len, r.n_windows) for r in rows
    }


def test_planted_cross_doc_duplicate(spark):
    """Two docs share one exact 23-token run at different offsets; the op
    must report it in both docs at its full variable length."""
    rng = random.Random(7)
    shared = [f"dup{i}" for i in range(23)]
    a = [f"a{rng.randrange(10**9)}" for _ in range(11)] + shared + [
        f"a{rng.randrange(10**9)}" for _ in range(5)
    ]
    b = [f"b{rng.randrange(10**9)}" for _ in range(3)] + shared + [
        f"b{rng.randrange(10**9)}" for _ in range(17)
    ]
    noise = {
        i: [f"n{i}_{rng.randrange(10**9)}" for _ in range(30)]
        for i in range(10, 15)
    }
    docs = {1: a, 2: b, **noise}
    got = _spark_spans(spark, docs)
    want = {
        (1, 11, 23, 23 - SUBSTR_W + 1),
        (2, 3, 23, 23 - SUBSTR_W + 1),
    }
    assert got == want


def test_planted_within_doc_self_repeat(spark):
    """Lee et al. count self-repeats: a doc containing the same 12-token
    phrase twice reports both occurrences, with no other doc involved."""
    rng = random.Random(11)
    phrase = [f"p{i}" for i in range(12)]
    toks = (
        phrase
        + [f"x{rng.randrange(10**9)}" for _ in range(9)]
        + phrase
        + [f"y{rng.randrange(10**9)}" for _ in range(4)]
    )
    docs = {1: toks, 2: [f"z{rng.randrange(10**9)}" for _ in range(25)]}
    got = _spark_spans(spark, docs)
    want = {
        (1, 0, 12, 12 - SUBSTR_W + 1),
        (1, 21, 12, 12 - SUBSTR_W + 1),
    }
    assert got == want


def test_randomized_differential_vs_bruteforce(spark):
    """Randomized corpora with planted shared runs of varied lengths:
    Spark output must equal the independent pure-Python reference —
    including adjacent/overlapping duplicate runs that merge."""
    rng = random.Random(42)
    for trial in range(3):
        vocab = [f"w{i}" for i in range(rng.randrange(15, 40))]
        docs: dict[int, list[str]] = {}
        for d in range(8):
            docs[d] = [rng.choice(vocab) for _ in range(rng.randrange(0, 60))]
        # plant a few shared runs to guarantee duplicate mass
        for _ in range(3):
            run = [rng.choice(vocab) for _ in range(rng.randrange(8, 20))]
            for d in rng.sample(sorted(docs), 2):
                at = rng.randrange(0, len(docs[d]) + 1)
                docs[d] = docs[d][:at] + run + docs[d][at:]
        assert _spark_spans(spark, docs) == _ref_spans(docs, SUBSTR_W), trial


def _ref_redact(
    docs: dict[int, list[str]], w: int
) -> dict[int, tuple[int, int, str]]:
    """Independent redaction reference: cut the covered positions of
    :func:`_ref_spans` out of each doc, keep the rest in order."""
    covered: dict[int, set[int]] = {d: set() for d in docs}
    for doc_id, start, length, _n in _ref_spans(docs, w):
        covered[doc_id].update(range(start, start + length))
    out = {}
    for doc_id, toks in docs.items():
        kept = [t for i, t in enumerate(toks) if i not in covered[doc_id]]
        return_row = (len(toks), len(toks) - len(kept), " ".join(kept))
        out[doc_id] = return_row
    return out


def test_redact_differential_vs_bruteforce(spark):
    """Randomized corpora: redact_duplicated_spans must equal the
    independent cut-the-covered-positions reference on every doc —
    including docs with zero spans (full text kept, n_removed == 0) and
    docs redacted to nothing (text_kept == '')."""
    rng = random.Random(1337)
    for trial in range(3):
        vocab = [f"w{i}" for i in range(rng.randrange(12, 30))]
        docs: dict[int, list[str]] = {}
        for d in range(8):
            docs[d] = [rng.choice(vocab) for _ in range(rng.randrange(0, 50))]
        run = [rng.choice(vocab) for _ in range(rng.randrange(8, 16))]
        for d in rng.sample(sorted(docs), 2):
            at = rng.randrange(0, len(docs[d]) + 1)
            docs[d] = docs[d][:at] + run + docs[d][at:]
        docs[99] = run + run  # redacts to nothing (self-repeat covers all)
        t = spark.createDataFrame(
            [(d, toks) for d, toks in docs.items()],
            "doc_id BIGINT, toks ARRAY<STRING>",
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.text_kept)
            for r in redact_duplicated_spans(t, SUBSTR_W).collect()
        }
        assert got == _ref_redact(docs, SUBSTR_W), trial
        assert got[99][2] == ""  # fully-duplicated doc redacts to empty


def test_apply_accounting_on_real_data(spark):
    """On sf0.001: substring_dedup_apply covers EVERY document; per doc,
    n_removed equals the sum of that doc's reported span lengths (the two
    registered queries share one span set) and the kept text word count
    equals n_tokens - n_removed."""
    spans = REGISTRY["substring_dedup"].fn(spark, SF0001).collect()
    removed = {}
    for r in spans:
        removed[r.doc_id] = removed.get(r.doc_id, 0) + r.span_len
    rows = REGISTRY["substring_dedup_apply"].fn(spark, SF0001).collect()
    import pyarrow.parquet as pq

    n_docs = pq.read_table(f"{SF0001}/documents.parquet").num_rows
    assert len(rows) == n_docs
    assert any(r.n_removed > 0 for r in rows)
    assert any(r.n_removed == 0 for r in rows)
    for r in rows:
        assert r.n_removed == removed.get(r.doc_id, 0), r.doc_id
        n_kept = len(r.text_kept.split()) if r.text_kept else 0
        assert n_kept == r.n_tokens - r.n_removed, r.doc_id


def _ref_keep1_redact(
    docs: dict[int, list[str]], w: int
) -> dict[int, tuple[int, int, str]]:
    """Independent keep-one reference: collect each window's occurrences
    in (doc_id, pos) order; cover every occurrence but the first of any
    window seen >= 2×; cut covered positions."""
    occ: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    for doc_id in sorted(docs):
        toks = docs[doc_id]
        for k in range(len(toks) - w + 1):
            occ.setdefault(tuple(toks[k : k + w]), []).append((doc_id, k))
    covered: dict[int, set[int]] = {d: set() for d in docs}
    for occs in occ.values():
        if len(occs) >= 2:
            for doc_id, k in occs[1:]:
                covered[doc_id].update(range(k, k + w))
    out = {}
    for doc_id, toks in docs.items():
        kept = [t for i, t in enumerate(toks) if i not in covered[doc_id]]
        out[doc_id] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


def test_keep_one_planted_first_copy_survives(spark):
    """A 20-token run duplicated across docs 1 (earlier) and 2: keep-one
    must leave doc 1 verbatim and cut exactly the run from doc 2, while
    remove-all cuts it from both."""
    rng = random.Random(23)
    shared = [f"dup{i}" for i in range(20)]
    docs = {
        1: [f"a{rng.randrange(10**9)}" for _ in range(7)] + shared,
        2: shared + [f"b{rng.randrange(10**9)}" for _ in range(9)],
        3: [f"c{rng.randrange(10**9)}" for _ in range(30)],
    }
    t = spark.createDataFrame(
        [(d, toks) for d, toks in docs.items()],
        "doc_id BIGINT, toks ARRAY<STRING>",
    )
    from simpletons_map_reduce_spark.queries.lm_ops import redact_keep_first

    keep1 = {r.doc_id: r for r in redact_keep_first(t, SUBSTR_W).collect()}
    assert keep1[1].n_removed == 0
    assert keep1[1].text_kept == " ".join(docs[1])
    assert keep1[2].n_removed == 20
    assert keep1[2].text_kept == " ".join(docs[2][20:])
    both = {
        r.doc_id: r for r in redact_duplicated_spans(t, SUBSTR_W).collect()
    }
    assert both[1].n_removed == 20 and both[2].n_removed == 20


def test_keep_one_differential_and_dominance(spark):
    """Randomized corpora: redact_keep_first must equal the independent
    keep-first-occurrence reference on every doc, and its per-doc
    n_removed can never exceed remove-all's (keep-one is pointwise
    gentler by construction)."""
    from simpletons_map_reduce_spark.queries.lm_ops import redact_keep_first

    rng = random.Random(2024)
    for trial in range(3):
        vocab = [f"w{i}" for i in range(rng.randrange(12, 30))]
        docs: dict[int, list[str]] = {}
        for d in range(8):
            docs[d] = [rng.choice(vocab) for _ in range(rng.randrange(0, 50))]
        for _ in range(3):
            run = [rng.choice(vocab) for _ in range(rng.randrange(8, 16))]
            for d in rng.sample(sorted(docs), 2):
                at = rng.randrange(0, len(docs[d]) + 1)
                docs[d] = docs[d][:at] + run + docs[d][at:]
        t = spark.createDataFrame(
            [(d, toks) for d, toks in docs.items()],
            "doc_id BIGINT, toks ARRAY<STRING>",
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.text_kept)
            for r in redact_keep_first(t, SUBSTR_W).collect()
        }
        assert got == _ref_keep1_redact(docs, SUBSTR_W), trial
        both = {
            r.doc_id: r.n_removed
            for r in redact_duplicated_spans(t, SUBSTR_W).collect()
        }
        assert all(got[d][1] <= both[d] for d in docs), trial


def test_keep_one_on_real_data(spark):
    """On sf0.001: keep-one covers every document, removes strictly less
    than remove-all in aggregate (the corpus has duplicates), and never
    more per doc."""
    keep1 = {
        r.doc_id: r
        for r in REGISTRY["substring_dedup_keep_one"].fn(spark, SF0001).collect()
    }
    both = {
        r.doc_id: r
        for r in REGISTRY["substring_dedup_apply"].fn(spark, SF0001).collect()
    }
    assert set(keep1) == set(both)
    assert all(keep1[d].n_removed <= both[d].n_removed for d in keep1)
    assert sum(r.n_removed for r in keep1.values()) < sum(
        r.n_removed for r in both.values()
    )


def test_invariants_on_real_data(spark):
    """On sf0.001: every span satisfies n_windows == span_len - W + 1,
    span_len >= W, and spans within a doc never overlap (maximality)."""
    rows = REGISTRY["substring_dedup"].fn(spark, SF0001).collect()
    assert rows, "sf0.001 corpus should contain duplicated spans"
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r.span_len >= SUBSTR_W
        assert r.n_windows == r.span_len - SUBSTR_W + 1, r
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, spans in by_doc.items():
        spans.sort(key=lambda r: r.span_start)
        for a, b in zip(spans, spans[1:]):
            # maximal runs are separated by at least one non-dup window
            assert a.span_start + a.n_windows < b.span_start, doc_id
