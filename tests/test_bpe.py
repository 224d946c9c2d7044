"""BPE merge learning (r14): fixed-round tokenizer induction over the
word histogram, with a pure-Python differential replay (no Spark
expressions in the oracle) and economics-consistency checks."""

from __future__ import annotations

from collections import Counter

import pytest

from project_samanvay_a_true_hybrid_htap_database_spark.operators.text import (
    bpe_learn_merges,
    bpe_segment_stats,
)
from project_samanvay_a_true_hybrid_htap_database_spark.sources import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _python_bpe(texts: list[str], rounds: int, vocab: int):
    """Independent sequential replay of the learning rule."""
    hist = Counter()
    for t in texts:
        for w in t.lower().strip(" ").split(" "):
            if w:
                hist[w] += 1
    top = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab]
    words = [(list(w), c) for w, c in top]
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for sy, c in words:
            for i in range(len(sy) - 1):
                pc[(sy[i], sy[i + 1])] += c
        if not pc:
            break
        (a, b), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((r, a, b, c))
        nxt = []
        for sy, cnt in words:
            out = []
            for x in sy:  # leftmost-greedy fold
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            nxt.append((out, cnt))
        words = nxt
    return merges, words


def test_merge_fold_anchors_at_symbol_boundaries(spark):
    """The r15 ADVICE fix: a merge (a, b) must only fire on ADJACENT
    WHOLE symbols — never inside a longer symbol whose suffix is `a`
    (['with','e'] under (th,e)) or whose prefix is `b` (['a','bc']
    under (a,b)) — and runs fold leftmost-greedy ('aaaaa' under (a,a)
    -> [aa, aa, a], not [aa, a, aa])."""
    import pyspark.sql.functions as F

    from project_samanvay_a_true_hybrid_htap_database_spark.operators.text import (  # noqa: E501
        _BPE_SEP,
        _bpe_merge_symbols,
    )

    cases = [
        (["with", "e"], "th", "e", ["with", "e"]),
        (["a", "bc"], "a", "b", ["a", "bc"]),
        (["th", "e", "th", "e"], "th", "e", ["the", "the"]),
        (["a", "a", "a", "a", "a"], "a", "a", ["aa", "aa", "a"]),
        (["a", "b", "a", "b", "a"], "a", "b", ["ab", "ab", "a"]),
        (["x"], "a", "b", ["x"]),
    ]
    df = spark.createDataFrame(
        [(i, syms, a, b) for i, (syms, a, b, _) in enumerate(cases)],
        "i int, syms array<string>, a string, b string",
    )
    got = {}
    for i, (syms, a, b, want) in enumerate(cases):
        out = (
            df.filter(F.col("i") == i)
            .select(_bpe_merge_symbols(F.col("syms"), a, b).alias("s"))
            .collect()
        )
        got[i] = out[0]["s"].split(_BPE_SEP)
    for i, (_, _, _, want) in enumerate(cases):
        assert got[i] == want, (cases[i], got[i])


def test_learned_merges_match_python_replay(spark):
    texts = [
        r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("text")
        .collect()
    ]
    want, _ = _python_bpe(texts, rounds=6, vocab=1000)
    got = [
        (r["merge_rank"], r["sym_a"], r["sym_b"], r["pair_count"])
        for r in bpe_learn_merges(spark, SF_DIR).collect()
    ]
    assert got == want
    assert len(got) == 6


def test_segment_stats_are_consistent(spark):
    rows = {r["doc_id"]: r for r in bpe_segment_stats(spark, SF_DIR).collect()}
    assert rows
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    compressed = 0
    for doc_id, r in rows.items():
        words = [w for w in texts[doc_id].lower().strip(" ").split(" ") if w]
        n_chars = sum(len(w) for w in words)
        assert r["n_words"] == len(words)
        # merges only ever shrink the symbol count, never below one
        # symbol per word
        assert r["n_words"] <= r["n_bpe_symbols"] <= n_chars
        if r["n_bpe_symbols"] < n_chars:
            compressed += 1
        # rounding-mode-agnostic (Spark HALF_UP vs Python HALF_EVEN)
        assert r["symbols_per_word"] == pytest.approx(
            r["n_bpe_symbols"] / r["n_words"], abs=1e-4
        )
    assert compressed > 0, "no doc compressed — merges vacuous on corpus"
