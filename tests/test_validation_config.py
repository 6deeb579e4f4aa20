"""Criteria-config behavior: strict vs relaxed gate (P6/P7), keyword
relevance, grade banding — mirrors the reference's env-overridable criteria
(config/settings.py:55-59) and the streaming route's relaxed gate
(routes/route.py:239)."""

import pandas as pd

from ai_textbook_processor_spark.functions.readability import (
    CriteriaConfig,
    score_texts,
)

MEDIUM = (
    "The green plant uses sunlight and water to produce its food. "
    "Energy moves between living systems in a constant natural cycle."
)


def one(cfg, text=MEDIUM):
    return score_texts(pd.Series([text]), cfg).iloc[0]


def test_grade_banding():
    assert one(CriteriaConfig(grade_lo=1, grade_hi=12))["grade_check"] == "APPROPRIATE"
    assert one(CriteriaConfig(grade_lo=50, grade_hi=60))["grade_check"] == "TOO_LOW"
    assert one(CriteriaConfig(grade_lo=-10, grade_hi=-5))["grade_check"] == "TOO_HIGH"


def test_keyword_relevance_and_relaxed_gate():
    kw = frozenset({"plant", "sunlight", "water", "energy"})
    strict = CriteriaConfig(keywords=kw)
    assert one(strict)["relevance_check"] == "MATCH"

    partial_kw = frozenset({"plant", "mitochondria", "osmosis", "xylem"})
    r = one(CriteriaConfig(keywords=partial_kw))
    assert r["relevance_check"] == "PARTIAL_MATCH"
    assert not r["is_valid"]  # strict: PARTIAL fails (P6)
    r2 = one(CriteriaConfig(keywords=partial_kw, relaxed_relevance=True))
    assert r2["relevance_check"] == "PARTIAL_MATCH"
    assert r2["is_valid"]  # relaxed: PARTIAL passes (P7)

    none_kw = frozenset({"quantum", "tensor", "manifold"})
    assert one(CriteriaConfig(keywords=none_kw))["relevance_check"] == "MISMATCH"


def test_safety_lexicon():
    r = one(CriteriaConfig(), text="That was a damn shame for everyone involved.")
    assert r["safety_check"] == "INAPPROPRIATE"
    assert not r["is_valid"]
    assert "safety=INAPPROPRIATE" in r["reason"]


def test_truncation_is_applied():
    long = MEDIUM + " complicated " * 500
    short_cfg = CriteriaConfig(truncate_chars=len(MEDIUM))
    assert one(short_cfg, long)["n_words"] == one(short_cfg, MEDIUM)["n_words"]
