"""Text-analysis column builders (training-data pipeline ops).

All JVM-side Column expressions (regexp counting, hashing) — no Python in
the hot path, so they compose into any plan with full codegen. The harness
queries (txt_*, dd_*) are built from these; DuckDB oracles verify the
semantics value-for-value at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z0-9']+"
PUNCT_RE = "[.,;:!?]"
STOPWORD_RE = "\\b(the|a|and|of|to|in|is)\\b"
CJK_RE = "[\\u4e00-\\u9fff]"

_MH_P = (1 << 31) - 1


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: str | Column) -> Column:
    """Whitespace/word-regex token count (BPE-ish boundary regex).

    regexp_count, not size(regexp_extract_all) (r6): same non-overlapping
    match count (verified value-for-value on the documents table), but the
    codegen counts matches in place instead of materializing every match
    into an array first."""
    return F.regexp_count(_c(col), F.lit(WORD_RE)).cast("long")


def punct_ratio(col: str | Column) -> Column:
    c = _c(col)
    return F.regexp_count(c, F.lit(PUNCT_RE)) / F.greatest(
        F.length(c), F.lit(1)
    )


def stopword_ratio(col: str | Column) -> Column:
    c = _c(col)
    stops = F.regexp_count(F.lower(c), F.lit(STOPWORD_RE))
    return stops / F.greatest(token_count(c), F.lit(1))


def quality_score(col: str | Column) -> Column:
    """Composite quality heuristic in [0, 1]: long enough, punctuated,
    stopword-bearing (language-like) text scores high; word salad and
    boilerplate score low."""
    c = _c(col)
    len_term = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    punct_term = F.least(punct_ratio(c) * 20.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    return F.round((len_term + punct_term + stop_term) / 3.0, 6)


def lang_guess(col: str | Column) -> Column:
    """n-gram/stopword language-ID heuristic (CJK chars -> zh; English
    stopword density -> en; else other)."""
    c = _c(col)
    the_count = F.regexp_count(F.lower(c), F.lit("\\bthe\\b"))
    return (
        F.when(c.rlike(CJK_RE), "zh")
        .when(the_count >= 3, "en")
        .otherwise("other")
    )


def fingerprint(col: str | Column, prefix: int = 200) -> Column:
    """Whitespace-normalized prefix hash — the cheap pre-filter before
    shingle-level dedup."""
    c = _c(col)
    return F.md5(F.lower(F.regexp_replace(F.substring(c, 1, prefix), "\\s+", " ")))


def word_hash(col: str | Column) -> Column:
    """Cross-engine-stable 48-bit word hash mod a Mersenne prime (matches
    DuckDB's CAST('0x'||substr(md5(w),1,12) AS BIGINT) % p)."""
    return (
        F.conv(F.substring(F.md5(_c(col)), 1, 12), 16, 10).cast("bigint") % _MH_P
    )


def unigram_entropy(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document unigram word entropy (bits) — the repetition /
    word-salad signal a quality filter thresholds on (boilerplate and
    keyword-stuffed docs have low entropy for their length).

    Closed form avoids a second pass: H = log2(N) - (1/N) * sum(c*log2(c))
    over per-word counts c, so the plan is exactly two map-side-combined
    shuffles: (id, word) -> counts, then id -> (N, sum c*log2 c).
    """
    words = df.select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("w"),
    )
    counts = words.groupBy(id_col, "w").agg(F.count("*").alias("c"))
    agg = counts.groupBy(id_col).agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log2("c")).alias("s"),
    )
    return agg.select(
        id_col,
        F.col("n").cast("long").alias("n_words"),
        F.round(F.log2("n") - F.col("s") / F.col("n"), 5).alias("entropy"),
    )


def corpus_logprob(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document mean negative log2-probability under the CORPUS's own
    unigram language model — the classic perplexity-proxy quality signal
    (docs full of rare/garbage tokens score high, formulaic boilerplate
    scores low; both tails get filtered).

    score(d) = -(1/|d|) * sum_{w in d} log2(c_w / C)
             = log2(C) - (1/|d|) * sum_{w in d} log2(c_w)

    with c_w the corpus-wide count of word w and C the corpus token total
    — so no per-token division and only integer-count log2s ride the agg.

    Plan shape: (1) corpus vocab = one map-side-combined groupBy(word);
    (2) per-doc distinct-word counts = groupBy(id, word); (3) the two
    count tables join ON WORD — doc text itself never rides that join,
    only (id, word, count) triples; (4) one final groupBy(id). At 100 TB
    the [a-z]+ unigram vocabulary is millions of rows, not corpus-sized —
    the natural persisted artifact between passes; cap-to-top-V +
    OOV-floor turns step 3 into a broadcast join when executor memory
    prefers it (semantics then change with the cap, so the uncapped form
    stays the oracle-checked one)."""
    words = df.select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("w"),
    )
    doc_counts = words.groupBy(id_col, "w").agg(F.count("*").alias("dc"))
    vocab = doc_counts.groupBy("w").agg(F.sum("dc").alias("c"))
    total = vocab.agg(F.sum("c").alias("corpus_total"))
    scored = (
        doc_counts.join(vocab, "w")
        .groupBy(id_col)
        .agg(
            F.sum("dc").alias("n"),
            F.sum(F.col("dc") * F.log2("c")).alias("s"),
        )
        .crossJoin(F.broadcast(total))
    )
    return scored.select(
        id_col,
        F.col("n").cast("long").alias("n_words"),
        F.round(F.log2("corpus_total") - F.col("s") / F.col("n"), 5).alias(
            "neg_logprob"
        ),
    )


def bigram_logprob(
    df, id_col: str = "doc_id", text_col: str = "text", lam: float = 0.7
):
    """Per-document mean negative log2-probability under an interpolated
    BIGRAM corpus LM — the KenLM-shaped upgrade of :func:`corpus_logprob`
    (a real CCNet filter scores with an n-gram model, not unigrams):

        score(d) = -(1/(n_d-1)) * sum_{(v,w) in d}
                     log2( lam * c(v,w)/c(v,*) + (1-lam) * c(w)/C )

    summed over the document's bigram positions (documents with <2 tokens
    contribute no bigrams and are excluded).  The interpolation backstop
    means an unseen-in-context word still gets its unigram mass, so the
    log never sees zero: every bigram in any doc exists in the corpus
    model by construction (the model IS the corpus), but its context
    probability can be tiny for incoherent text — which is the signal.

    Plan shape mirrors corpus_logprob: (1) doc-bigram counts — ONE
    tokenize pass, bigrams via the lambda-safe shifted-slice zip; (2) the
    corpus bigram model = one groupBy(v,w), prefix totals = one
    groupBy(v), unigram model reused from the same explode; (3) scoring
    joins carry (id, v, w, count) tuples only — raw text never rides a
    join; (4) one final groupBy(id).  The models are vocabulary-sized
    (bigram types), not corpus-sized — the natural persisted artifact
    between runs at 100 TB."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
    )
    from ..operators.dedup import _shingle_expr

    pairs = df.select(
        id_col, F.explode(_shingle_expr(toks, 2)).alias("vw")
    ).select(
        id_col,
        F.split("vw", " ")[0].alias("v"),
        F.split("vw", " ")[1].alias("w"),
    )
    doc_counts = pairs.groupBy(id_col, "v", "w").agg(
        F.count("*").alias("dc")
    )
    big = doc_counts.groupBy("v", "w").agg(F.sum("dc").alias("cvw"))
    prefix = big.groupBy("v").agg(F.sum("cvw").alias("cv"))
    uni = doc_counts.groupBy("w").agg(F.sum("dc").alias("cw"))
    total = uni.agg(F.sum("cw").alias("corpus_total"))
    # 1.0 - 0.7 is NOT the double the SQL literal 0.3 parses to (it is
    # 0.30000000000000004) — re-parse the decimal complement so both
    # engines interpolate with bit-identical coefficients
    lam2 = float(f"{1.0 - lam:.10g}")
    p = (
        F.lit(lam) * (F.col("cvw") / F.col("cv"))
        + F.lit(lam2) * (F.col("cw") / F.col("corpus_total"))
    )
    return (
        doc_counts.join(big, ["v", "w"])
        .join(prefix, "v")
        .join(uni, "w")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("dc").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("dc") * F.log2(p)) / F.sum("dc"), 5
            ).alias("neg_logprob2"),
        )
    )


EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\b[0-9]{3}-[0-9]{4}\\b"


def pii_scrub(col: str | Column) -> Column:
    """Redact emails and phone-shaped numbers with typed placeholders —
    the standard pre-training PII pass. Pure JVM regexp_replace chain
    (full codegen, no UDF); both patterns are conservative constructs that
    Java regex and RE2 (the DuckDB oracle engine) interpret identically."""
    c = _c(col)
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def pii_counts(col: str | Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the column — the audit side of the
    scrub (pipelines track redaction rates per source)."""
    c = _c(col)
    return (
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("long"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("long"),
    )


def repetition_metrics(df, id_col: str = "doc_id", text_col: str = "text", n: int = 2):
    """Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", §A1.1 repetition filters — public): per
    document, the fraction of duplicate word n-grams and the mass of the
    single most frequent n-gram. Boilerplate, keyword-stuffing, and
    degenerate-generation text score high on both; a quality gate
    thresholds them (the reference's validation stage is the same idea
    applied via an LLM judge, /root/reference/utils/models.py criteria).

    Scale shape: shingling is a JVM array expression on the scan, then
    exactly two map-side-combined shuffles — (id, gram) -> counts, id ->
    (total, distinct, max). No window, no second pass over text. Docs with
    fewer than n words carry no signal and are absent from the output
    (gate them on length instead).
    """
    grams = df.select(
        id_col,
        F.explode(rolling_fingerprints(F.col(text_col), n)).alias("g"),
    )
    counts = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    agg = counts.groupBy(id_col).agg(
        F.sum("c").alias("total"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    return agg.select(
        id_col,
        F.col("total").cast("long").alias("n_grams"),
        F.round((F.col("total") - F.col("n_distinct")) / F.col("total"), 5).alias(
            "dup_gram_frac"
        ),
        F.round(F.col("top_c") / F.col("total"), 5).alias("top_gram_frac"),
    )


def rolling_fingerprints(col: str | Column, n: int = 3) -> Column:
    """Array of word n-gram shingles — the MinHash / decontamination input.

    Built as arrays_zip of n shifted slices so the higher-order transform's
    lambda references ONLY its own variable: an outer expression inside a
    lambda body is re-evaluated per element, and the original
    `transform(sequence, i -> element_at(words, i+j))` re-ran the regexp
    tokenizer n times per shingle — quadratic in document length, hours on
    a mega doc (same bug as operators/dedup._shingle_expr, found via the
    96k-corpus pipeline hang)."""
    c = _c(col)
    words = F.regexp_extract_all(F.lower(c), F.lit("[a-z]+"), 0)
    cnt = F.greatest(F.size(words) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(words, j + 1, cnt) for j in range(n)])
    shingles = F.transform(
        zipped, lambda x: F.concat_ws(" ", *[x[str(j)] for j in range(n)])
    )
    # null text -> empty shingle set (matches the pre-r3 when/otherwise)
    return F.coalesce(shingles, F.array().cast("array<string>"))
