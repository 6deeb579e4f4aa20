"""functions.text builders: self-consistency with the dedup shingle logic
and basic behavior (oracle parity is covered by tools/check_oracle.py)."""

from pyspark.sql import functions as F

from ai_textbook_processor_spark.functions import text as TX


def test_rolling_fingerprints_match_lead_window_shingles(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "one two"), (3, ""), (4, "alpha beta gamma")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: list(r["sh"])
        for r in df.select("doc_id", TX.rolling_fingerprints("text", 3).alias("sh")).collect()
    }
    assert got[1][:2] == ["the quick brown", "quick brown fox"]
    assert got[1][-1] == "the lazy dog"
    assert got[2] == [] and got[3] == []
    assert got[4] == ["alpha beta gamma"]


def test_quality_and_langid_behavior(spark):
    rows = [
        (1, "The cat sat. The dog ran. The sun is up. The day is long and the air is warm."),
        (2, "foo bar baz qux " * 10),
        (3, "数学 是 研究 数量 结构 变化 的 学科"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (r["q"], r["g"])
        for r in df.select(
            "doc_id",
            TX.quality_score("text").alias("q"),
            TX.lang_guess("text").alias("g"),
        ).collect()
    }
    assert out[1][0] > out[2][0]  # punctuated English beats word salad
    assert out[1][1] == "en"
    assert out[3][1] == "zh"


def test_word_hash_matches_duckdb(spark):
    import duckdb

    words = ["plant", "energy", "水", "the"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["h"] for r in df.select("w", TX.word_hash("w").alias("h")).collect()}
    con = duckdb.connect()
    for w in words:
        (exp,) = con.execute(
            "SELECT CAST(CONCAT('0x', substr(md5(?), 1, 12)) AS BIGINT) % 2147483647", [w]
        ).fetchone()
        assert got[w] == exp, w


def test_unigram_entropy_matches_pure(spark):
    """Spark closed-form entropy == the direct -sum(p log2 p) definition
    (within float tolerance; aggregation order differs)."""
    import math
    import re
    from collections import Counter

    texts = [
        "the the the the",                     # H = 0
        "a b c d",                             # H = 2 exactly
        "The quick brown fox jumps over the lazy dog the end.",
        "aaa bbb aaa ccc bbb aaa",
        "",                                    # no words -> no row
        "x" * 50,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in TX.unigram_entropy(df).collect()}

    for i, t in enumerate(texts):
        words = re.findall(r"[a-z]+", t.lower())
        if not words:
            assert i not in got
            continue
        n = len(words)
        c = Counter(words)
        h = -sum((v / n) * math.log2(v / n) for v in c.values())
        assert got[i]["n_words"] == n
        assert abs(got[i]["entropy"] - h) < 1e-4, (t, got[i]["entropy"], h)
    assert got[0]["entropy"] == 0.0 and got[1]["entropy"] == 2.0


def test_shingle_expr_differential_fuzz(spark):
    """Differential fuzz of the r3 zip-of-slices shingle builder against a
    pure-Python twin over adversarial texts (unicode, punctuation runs,
    empty/short, repeated words) for n in {2, 3, 5} — the same construction
    backs rolling_fingerprints AND dedup._shingle_expr, so one gate pins
    both."""
    import re

    from pyspark.sql import functions as F

    from ai_textbook_processor_spark.functions.text import rolling_fingerprints

    texts = [
        "", "a", "a b", "a b c", "one two three four five",
        "x " * 200, "UPPER lower MiXeD 123 split99here",
        "日本語テキスト with ascii islands here and there",
        "punct,punct.punct!?;:-- gaps   and\t\ttabs\nnewlines",
        "'quoted' words aren't split the same way maybe",
        "repeat repeat repeat repeat repeat repeat",
        "a1b2c3 d4e5 f6g7h8 i9 j0",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, t string")
    for n in (2, 3, 5):
        got = {
            r["i"]: r["s"]
            for r in df.select(
                "i", rolling_fingerprints("t", n).alias("s")
            ).collect()
        }
        for i, t in enumerate(texts):
            toks = re.findall("[a-z]+", t.lower())
            want = [
                " ".join(toks[j : j + n])
                for j in range(max(len(toks) - n + 1, 0))
            ]
            assert got[i] == want, (n, i, t, got[i], want)


def test_corpus_logprob_rare_words_score_higher(spark):
    """The perplexity-proxy signal orders documents correctly: a doc of
    corpus-rare words scores strictly above a doc of corpus-common words;
    the common-only doc's score is exactly -log2(p) of its words."""
    import math

    from ai_textbook_processor_spark.functions.text import corpus_logprob

    # 'the' appears 18x, rare words once each; corpus total = 24 tokens
    rows = [
        (1, "the the the the the the the the the"),
        (2, "the the the the the the the the the"),
        (3, "zyx wvu tsr qpo nml kji"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in corpus_logprob(df).collect()}
    assert got[3]["neg_logprob"] > got[1]["neg_logprob"]
    assert got[1]["neg_logprob"] == got[2]["neg_logprob"]
    # doc1: every word has c=18, C=24 -> -log2(18/24)
    want = round(-math.log2(18 / 24), 5)
    assert abs(got[1]["neg_logprob"] - want) < 1e-9
    # doc3: every word c=1 -> -log2(1/24) = log2(24)
    assert abs(got[3]["neg_logprob"] - round(math.log2(24), 5)) < 1e-9
    assert got[3]["n_words"] == 6


def test_hot_ngrams_finds_planted_boilerplate(spark):
    """A phrase planted in most docs dominates the corpus-wide 5-gram
    counts (doc frequency first, then total occurrences)."""
    from ai_textbook_processor_spark.harness import QUERIES
    import pyspark.sql.functions as F
    from ai_textbook_processor_spark.operators.dedup import _shingle_expr

    boiler = "all rights reserved click to subscribe"
    rows = [
        (i, f"unique words alpha{i} beta{i} gamma{i} {boiler} tail{i}")
        for i in range(30)
    ] + [(100 + i, f"clean document body {i} with no template") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
    grams = df.select("doc_id", F.explode(_shingle_expr(toks, 5)).alias("g"))
    top = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("g"))
        .limit(3)
        .collect()
    )
    assert top[0]["n_docs"] == 30
    assert "rights reserved click to subscribe" in {r["g"] for r in top} or any(
        "reserved" in r["g"] for r in top
    )


def test_bm25_plan_is_take_ordered(spark):
    from ai_textbook_processor_spark.harness import QUERIES

    for name in ("txt_bm25", "txt_hot_ngrams"):
        p = (
            QUERIES[name](spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in p, name
        assert "CartesianProduct" not in p, name


def test_bm25_single_tokenize_and_bounded_exchanges(spark):
    """r4 plan guard: the BM25 rewrite packs dl + per-term counts into one
    array fold behind a checkpoint barrier — Catalyst must NOT re-inline
    the tokenizer (CollapseProject duplicates multiply-referenced aliases:
    the naive multi-column form carried 6 copies), and the whole query
    needs at most 2 exchanges (stats aggregate + its broadcast)."""
    from ai_textbook_processor_spark.harness import QUERIES

    df = QUERIES["txt_bm25"](spark, "/root/testdata/sf0.001")
    qe = df._jdf.queryExecution()
    opt = qe.optimizedPlan().toString()
    assert opt.count("regexp_extract_all") == 0, (
        "tokenizer leaked past the checkpoint barrier:\n" + opt[:2000]
    )
    p = qe.executedPlan().toString()
    assert p.count("Exchange") <= 2, p


def test_bigram_logprob_flags_incoherence(spark):
    """Word salad shares the corpus vocabulary (keeps unigram mass) but
    loses context mass -> higher neg_logprob2 than coherent text built
    from the corpus's own frequent bigrams."""
    from ai_textbook_processor_spark.functions.text import bigram_logprob

    coherent = "the model reads the data and the model writes the data"
    rows = [(i, coherent) for i in range(8)]
    # salad: same words, shuffled determinally so bigrams are rare
    rows.append((100, "data the writes model and reads the data model the"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["neg_logprob2"] for r in bigram_logprob(df).collect()}
    assert out[100] > out[0], out
    # short docs (<2 tokens) contribute no bigrams and are excluded
    df2 = spark.createDataFrame([(1, "word"), (2, "")], "doc_id long, text string")
    assert bigram_logprob(df2).count() == 0
