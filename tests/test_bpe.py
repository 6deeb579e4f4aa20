"""BPE tokenizer training/encoding — hand-worked goldens + Spark parity.

The merge/encode kernels are SHARED between the Spark operator and the
pure-Python literal oracle (same pattern as functions/kernels.py), so
these hand-computed goldens are what pins the algorithm itself: the
classic Sennrich et al. (2016) worked example
(low/lower/newest/widest) traced by hand, including every tie-break.
"""

from __future__ import annotations

import re

import pytest

from ai_textbook_processor_spark.operators.bpe import (
    END,
    WORD_RE,
    bpe_encode,
    bpe_train,
    encode_text,
    encode_word,
    learn_merges,
    merge_word,
    word_count_table,
)

FREQS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


class TestKernelGoldens:
    def test_learn_merges_sennrich_example(self):
        # hand-traced: iteration-1 pair counts put (e,s)/(s,t)/(t,</w>)
        # tied at 9 -> lexicographic tie-break picks (e,s); then the
        # chain est, est</w>; then (l,o)/(o,w) tied at 7 -> (l,o), (lo,w).
        merges = learn_merges(FREQS, 5)
        assert merges == [
            (0, "e", "s", "es", 9),
            (1, "es", "t", "est", 9),
            (2, "est", END, "est" + END, 9),
            (3, "l", "o", "lo", 7),
            (4, "lo", "w", "low", 7),
        ]

    def test_learn_merges_stops_when_dry(self):
        # single 1-char word: "a</w>" has one pair, then nothing left
        merges = learn_merges({"a": 3}, 10)
        assert merges == [(0, "a", END, "a" + END, 3)]

    def test_merge_word_is_greedy_left_to_right(self):
        assert merge_word(("a", "a", "a"), "a", "a") == ("aa", "a")
        assert merge_word(("x", "a", "a", "a", "a"), "a", "a") == (
            "x", "aa", "aa",
        )

    def test_encode_word_golden(self):
        ranks = {(m[1], m[2]): m[0] for m in learn_merges(FREQS, 5)}
        # unseen word built from learned merges: low + est</w>
        assert encode_word("lowest", ranks) == ("low", "est" + END)
        # word sharing no merges falls back to characters
        assert encode_word("hi", ranks) == ("h", "i", END)

    def test_encode_applies_lowest_rank_first(self):
        # rank order (not left-to-right position) decides: with merges
        # (0: b+c) and (1: a+b), "abc" must become a bc</w> -> no (a,bc)
        # rule, NOT ab c</w>.
        ranks = {("b", "c"): 0, ("a", "b"): 1}
        assert encode_word("abc", ranks) == ("a", "bc", END)


class TestSparkParity:
    def test_word_counts_match_counter(self, spark):
        texts = [
            "The cat sat, the cat ran!",
            "Don't stop the CAT",
            "",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = {
            r["word"]: r["cnt"]
            for r in word_count_table(df, "text", min_count=1).collect()
        }
        from collections import Counter

        wre = re.compile(WORD_RE)
        want = Counter()
        for t in texts:
            want.update(wre.findall(t.lower()))
        assert got == dict(want)

    def test_train_and_encode_end_to_end(self, spark):
        rows = [
            (i, " ".join(w for w, f in FREQS.items() for _ in range(f)))
            for i in range(4)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges, dropped = bpe_train(df, "text", num_merges=5, min_count=1)
        assert dropped == 0
        # every doc holds the full corpus, so frequencies are 4x the
        # classic example's — same merges, 4x the pair counts
        assert [(r, a, b, m) for r, a, b, m, _ in merges] == [
            (0, "e", "s", "es"),
            (1, "es", "t", "est"),
            (2, "est", END, "est" + END),
            (3, "l", "o", "lo"),
            (4, "lo", "w", "low"),
        ]
        assert [c for *_, c in merges] == [36, 36, 36, 28, 28]

        enc = {
            r["doc_id"]: (r["n_tokens"], r["tok_hash"])
            for r in bpe_encode(df, merges, "doc_id", "text").collect()
        }
        ranks = {(m[1], m[2]): m[0] for m in merges}
        wre = re.compile(WORD_RE)
        import hashlib

        for i, text in rows:
            toks = encode_text(text, ranks, {}, wre)
            assert enc[i] == (
                len(toks),
                hashlib.md5(" ".join(toks).encode()).hexdigest(),
            )

    def test_word_cap_reports_dropped_mass(self, spark):
        df = spark.createDataFrame(
            [("aa aa aa bb bb cc",)], "text string"
        )
        merges, dropped = bpe_train(
            df, "text", num_merges=2, min_count=1, max_words=2
        )
        # cap keeps aa(3), bb(2); cc's single count is reported dropped
        assert dropped == 1
        # pairs (a,a) and (a,</w>) tie at 3; "</w>" sorts before "a"
        assert merges[0] == (0, "a", END, "a" + END, 3)
