"""Trained quality classifier (operators/classifier.py).

Pins the two properties the design sells: (1) the fixed-point gradient
aggregation makes fitted weights BIT-IDENTICAL across partitionings (the
cluster-size-independence claim), and (2) the Spark fit equals the pure
Python twin in golden_oracle to the last bit, so the DuckDB literal oracle
is an independent check, not a mirror of the same code path.
"""

import pytest
from pyspark.sql import functions as F

from ai_textbook_processor_spark.operators.classifier import (
    DIM,
    featurize_docs,
    logreg_fit,
    score_expr,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # planted separable-ish corpus: "english" docs heavy on stopwords,
    # "other" docs on distinct tokens; a few mixed to keep it non-trivial
    en = "the quick brown fox and the lazy dog walk over the hill with some"
    fr = "le chat noir et le chien blanc sont dans le jardin avec une pomme"
    for i in range(40):
        lang = "en" if i % 2 == 0 else "fr"
        base = en if lang == "en" else fr
        rows.append((i, f"{base} token{i} extra{i % 7}", lang))
    rows.append((100, "12345 !!! ???", "en"))  # zero Latin tokens -> dropped
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _fit(df):
    feats = featurize_docs(df, label=F.col("lang") == "en")
    return feats, logreg_fit(feats)


def test_zero_token_docs_dropped(docs):
    feats = featurize_docs(docs, label=F.col("lang") == "en")
    assert feats.count() == 40
    assert feats.where(F.col("id") == 100).count() == 0


def test_fit_partition_invariant(docs):
    _, (w1, b1, h1) = _fit(docs.repartition(1))
    _, (w8, b8, h8) = _fit(docs.repartition(8, "doc_id"))
    assert w1 == w8  # exact float equality — int64 gradient sums
    assert b1 == b8
    assert h1 == h8


def test_fit_matches_pure_twin(docs):
    feats, (w, b, hist) = _fit(docs)
    # pure twin: same tokenization, fold order, quantization
    from ai_textbook_processor_spark.golden_oracle import _word_hash as py_word_hash
    import re

    pdocs = [
        (r["doc_id"], r["text"], r["lang"])
        for r in docs.orderBy("doc_id").collect()
    ]
    rows = []
    for doc_id, text, lang in pdocs:
        toks = re.findall(r"[a-z]+", text.lower())
        if not toks:
            continue
        c = [0] * DIM
        for t in toks:
            c[py_word_hash(t) % DIM] += 1
        rows.append((doc_id, 1.0 if lang == "en" else 0.0, len(toks), c))

    def sig(t):
        return 0.5 + (0.5 * t) / (1.0 + abs(t))

    def prob(n, c, w_, b_):
        acc = 0.0
        for wj, cj in zip(w_, c):
            acc = acc + wj * cj
        return sig(b_ + acc / n)

    from ai_textbook_processor_spark.operators.classifier import (
        GRAD_SCALE,
        round_half_up,
    )

    pw, pb = [0.0] * DIM, 0.0
    phist = []
    for _ in range(4):
        g, gb, ok = [0] * DIM, 0, 0
        for _i, y, n, c in rows:
            p = prob(n, c, pw, pb)
            err = p - y
            for j in range(DIM):
                g[j] += int(round_half_up((err * (c[j] / n)) * float(GRAD_SCALE), 0))
            gb += int(round_half_up(err * float(GRAD_SCALE), 0))
            ok += 1 if (p >= 0.5) == (y >= 0.5) else 0
        phist.append(ok)
        pw = [pw[j] - 2.0 * ((g[j] / GRAD_SCALE) / len(rows)) for j in range(DIM)]
        pb = pb - 2.0 * ((gb / GRAD_SCALE) / len(rows))

    assert hist == phist
    assert b == pb
    assert w == pw  # bit-exact


def test_training_improves_and_scores_separate(docs):
    feats, (w, b, hist) = _fit(docs)
    assert hist[-1] >= hist[0]
    assert hist[-1] >= 36  # >=90% train accuracy on the planted corpus
    p = score_expr(w, b)
    agg = feats.agg(
        F.avg(F.when(F.col("y") >= 0.5, p)).alias("p_en"),
        F.avg(F.when(F.col("y") < 0.5, p)).alias("p_fr"),
    ).collect()[0]
    assert agg["p_en"] > agg["p_fr"]
