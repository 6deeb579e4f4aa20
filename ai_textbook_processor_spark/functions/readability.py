"""Deterministic readability validation (SURVEY.md §2.6 V1, E4).

Replaces the reference's LLM content validator (``agents/nodes.py:229-270``,
prompt ``config/settings.py:67-81``) with a pure, vectorized scorer:
Flesch-Kincaid grade, type-token ratio, a lexicon safety check, and a
keyword-overlap relevance check — emitting the same check-string surface
(``grade_check``, ``safety_check``, ``relevance_check``, ``reason``) as the
reference's ``ValidationResult`` pydantic model (``agents/nodes.py:26-31``).

``readability_features`` is written over ``pd.Series`` so the Spark pandas
UDF and the pure-Python golden producer share one implementation — all
regex counting is vectorized via pandas ``str.count`` (Arrow batches,
no per-row Python in the hot path).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

# Regexes shared by both paths. FK constants are the published formula:
# 0.39 * (words/sentences) + 11.8 * (syllables/words) - 15.59.
WORD_RE = r"[A-Za-z0-9']+"
SENT_RE = r"[.!?]+"
VOWEL_GROUP_RE = r"(?i)[aeiouy]+"
SILENT_E_RE = r"(?i)[a-z][bcdfghjklmnpqrstvwxz]e\b"

# Deliberately mild fixed lexicon — the check surface matters, not the list.
SAFETY_LEXICON = frozenset(
    {"damn", "hell", "crap", "stupid", "idiot", "hate", "kill", "violence"}
)

# Criteria strings mirror the reference's enum-ish values
# (config/settings.py:55-59, agents/nodes.py:260-270).
GRADE_OK = "APPROPRIATE"
SAFETY_OK = "APPROPRIATE"
REL_MATCH = "MATCH"
REL_PARTIAL = "PARTIAL_MATCH"
REL_MISMATCH = "MISMATCH"


@dataclass(frozen=True)
class CriteriaConfig:
    """Env-overridable validation criteria, mirroring the reference's
    settings-driven criteria dict (``config/settings.py:55-59``) and the
    streaming route's relaxed relevance gate (``routes/route.py:239``)."""

    grade_lo: float = 1.0
    grade_hi: float = 12.0
    relaxed_relevance: bool = False
    keywords: frozenset = field(default_factory=frozenset)
    truncate_chars: int = 1000  # validation reads a prefix (agents/nodes.py:136)


def readability_features(texts: pd.Series) -> pd.DataFrame:
    """Vectorized FK-grade + TTR features for a Series of document texts."""
    t = texts.fillna("")
    # One tokenization pass serves both the word count and the TTR/lexicon
    # token lists (r6): len(findall(WORD_RE)) == count(WORD_RE), and
    # lowercasing cannot change [A-Za-z0-9'] word boundaries.
    lowered = t.str.lower().str.findall(WORD_RE)
    n_words = lowered.str.len()
    n_sents = t.str.count(SENT_RE).clip(lower=1)
    vowel_groups = t.str.count(VOWEL_GROUP_RE)
    silent_e = t.str.count(SILENT_E_RE)
    n_syll = np.maximum(n_words, vowel_groups - silent_e)
    w = n_words.to_numpy(dtype="float64")
    s = n_sents.to_numpy(dtype="float64")
    syl = np.asarray(n_syll, dtype="float64")
    with np.errstate(divide="ignore", invalid="ignore"):
        fk = np.where(
            w > 0, 0.39 * (w / s) + 11.8 * (syl / np.maximum(w, 1)) - 15.59, 0.0
        )
    fk = np.round(fk, 6)  # stable across accumulation orders

    # TTR + lexicon hit reuse the token lists from the single findall pass.
    ttr = np.zeros(len(t))
    unsafe = np.zeros(len(t), dtype=bool)
    kw_hits = np.zeros(len(t))
    for i, words in enumerate(lowered):
        if words:
            uniq = set(words)
            ttr[i] = round(len(uniq) / len(words), 6)
            unsafe[i] = not SAFETY_LEXICON.isdisjoint(uniq)
            kw_hits[i] = len(uniq)  # placeholder; relevance fills below
    return pd.DataFrame(
        {
            "fk_grade": fk,
            "ttr": ttr,
            "n_words": n_words.astype("int32"),
            "n_sentences": n_sents.astype("int32"),
            "_unsafe": unsafe,
            "_tokens": lowered,
        }
    )


def validate_features(
    feats: pd.DataFrame, cfg: CriteriaConfig
) -> pd.DataFrame:
    """Turn features into the ValidationResult-shaped check columns and
    ``is_valid`` (strict conjunction P6 / relaxed gate P7)."""
    fk = feats["fk_grade"].to_numpy()
    grade_check = np.where(
        fk < cfg.grade_lo, "TOO_LOW", np.where(fk > cfg.grade_hi, "TOO_HIGH", GRADE_OK)
    )
    safety_check = np.where(feats["_unsafe"].to_numpy(), "INAPPROPRIATE", SAFETY_OK)

    if cfg.keywords:
        kw = cfg.keywords
        ratios = np.array(
            [
                (len(kw.intersection(words)) / len(kw)) if words is not None else 0.0
                for words in feats["_tokens"]
            ]
        )
        relevance = np.where(
            ratios >= 0.5, REL_MATCH, np.where(ratios > 0, REL_PARTIAL, REL_MISMATCH)
        )
    else:
        relevance = np.full(len(feats), REL_MATCH, dtype=object)

    rel_ok = (
        np.isin(relevance, [REL_MATCH, REL_PARTIAL])
        if cfg.relaxed_relevance
        else (relevance == REL_MATCH)
    )
    is_valid = (grade_check == GRADE_OK) & (safety_check == SAFETY_OK) & rel_ok
    detail = (
        "grade="
        + grade_check.astype(object)
        + ";safety="
        + safety_check.astype(object)
        + ";relevance="
        + np.asarray(relevance, dtype=object)
    )
    reason = np.where(is_valid, "ok", detail)
    out = feats[["fk_grade", "ttr", "n_words", "n_sentences"]].copy()
    out["grade_check"] = grade_check
    out["safety_check"] = safety_check
    out["relevance_check"] = relevance
    out["reason"] = reason
    out["is_valid"] = is_valid
    return out


def score_texts(texts: pd.Series, cfg: CriteriaConfig | None = None) -> pd.DataFrame:
    """Full pipeline: truncate (P3) -> features -> checks."""
    cfg = cfg or CriteriaConfig()
    truncated = texts.fillna("").str.slice(0, cfg.truncate_chars)
    return validate_features(readability_features(truncated), cfg)
