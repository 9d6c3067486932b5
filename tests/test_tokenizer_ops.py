"""Differential pins for the distributed BPE learner (rows-only registry op).

``bpe_merges`` has no SQL oracle (the per-iteration global argmax is not one
ANSI query), so full value correctness is pinned here instead: the Spark loop
must produce EXACTLY the merge table an independent single-machine BPE
reference computes from the same word frequencies — same pairs, same order,
same counts.  The reference implementation below is the textbook algorithm
(count adjacent pairs over the word-freq dict, merge greedily left-to-right),
written against plain Python dicts so it shares no code with the Spark path.
"""

from __future__ import annotations

from collections import Counter

from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.queries.tokenizer_ops import (
    N_MERGES,
    learn_bpe,
    word_frequencies,
)
from tests.conftest import SF0001, SF001


def _ref_bpe(word_freq: dict[str, int], n_merges: int):
    """Independent reference: classic BPE over a word-frequency dict."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic argmax: count desc, then (l, r) lexicographic
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        new_vocab: dict[tuple, int] = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_reference(spark):
    wf = {
        r.word: r.freq for r in word_frequencies(spark, SF0001).collect()
    }
    got = learn_bpe(spark, SF0001)
    want = _ref_bpe(wf, N_MERGES)
    assert got == want


def test_bpe_matches_reference_sf001(spark):
    wf = {r.word: r.freq for r in word_frequencies(spark, SF001).collect()}
    got = learn_bpe(spark, SF001)
    want = _ref_bpe(wf, N_MERGES)
    assert got == want


def test_bpe_merges_chain(spark):
    """At least one later merge must consume an earlier merge's output —
    the property a one-shot pair count cannot reproduce."""
    rows = REGISTRY["bpe_merges"].fn(spark, SF0001).collect()
    assert len(rows) == N_MERGES
    produced = {r.merged for r in rows}
    assert any(
        (r.left in produced and len(r.left) > 1)
        or (r.right in produced and len(r.right) > 1)
        for r in rows
    ), rows


def test_bpe_schema_and_ranks(spark):
    rows = REGISTRY["bpe_merges"].fn(spark, SF0001).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.merged == r.left + r.right
        assert r.pair_count > 0


def _ref_encode(word: str, merges) -> list[str]:
    """Apply the learned merges to one word, in merge order (the apply
    order BPE prescribes), greedy left-to-right per pass."""
    sym = list(word)
    for _, l, r, _cnt in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_encode_matches_reference(spark):
    """bpe_encode's per-doc counts must equal an independent Python
    tokenize→encode over the same corpus and the same learned merges."""
    import re

    from simpletons_map_reduce_spark.queries.tokenizer_ops import bpe_encode
    from simpletons_map_reduce_spark.sources.tables import load_table

    merges = learn_bpe(spark, SF0001)
    got = {
        r.doc_id: (r.n_bpe_tokens, r.n_word_chars)
        for r in bpe_encode(spark, SF0001).collect()
    }
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text").collect()
    # mirror tokens_lower: letter runs, lowercased (the shared tokenizer
    # contract pinned in tests/test_tokenizer.py)
    enc_cache: dict[str, int] = {}
    for r in docs:
        toks = re.findall(r"[^\W\d_]+", r.text.lower(), flags=re.UNICODE)
        if not toks:
            assert r.doc_id not in got
            continue
        n_sym = 0
        for w in toks:
            if w not in enc_cache:
                enc_cache[w] = len(_ref_encode(w, merges))
            n_sym += enc_cache[w]
        n_chars = sum(len(w) for w in toks)
        assert got[r.doc_id] == (n_sym, n_chars), r.doc_id
    # merging must strictly compress: fewer symbols than characters
    assert sum(g[0] for g in got.values()) < sum(g[1] for g in got.values())


def test_bpe_supplementary_plane_symbols(spark):
    """Code-point symbol contract (ADVICE r6): supplementary-plane letters
    (surrogate pairs in UTF-16) must enter the learner as WHOLE symbols,
    never as surrogate halves.  Java >= 8 regex never places a zero-width
    split inside a surrogate pair, so ``split(word, '')`` is code-point
    safe; this pins it with a differential on a vocabulary of Gothic and
    mathematical-alphanumeric letters (all outside the BMP)."""
    from simpletons_map_reduce_spark.queries.tokenizer_ops import (
        learn_bpe_from_words,
    )

    # Gothic AHSA/BAIRKAN (U+10330/U+10331), math bold fraktur A/B
    # (U+1D56C/U+1D56D) — every character is a surrogate pair in UTF-16.
    words = {
        "\U00010330\U00010331\U00010330\U00010331": 9,
        "\U0001D56C\U0001D56D": 7,
        "\U00010330\U0001D56C\U0001D56D": 5,
        "\U0001D56C\U0001D56D\U00010331": 3,
    }
    wf = spark.createDataFrame(
        list(words.items()), "word STRING, freq BIGINT"
    )
    got = learn_bpe_from_words(wf, 4)
    want = _ref_bpe(words, 4)
    assert got == want
    # every learned symbol is a sequence of whole code points, no lone
    # surrogates anywhere
    for _, l, r, _cnt in got:
        for s in (l, r):
            assert not any(0xD800 <= ord(ch) <= 0xDFFF for ch in s), s
