"""Deterministic generation stage: reference-shaped nested output
(GenerationResult analog), Spark == pure-Python, valid-split gating."""

from pyspark.sql import functions as F

from ai_textbook_processor_spark.corpus import corpus_df, gen_doc
from ai_textbook_processor_spark.functions.kernels import extract_document
from ai_textbook_processor_spark.operators.extract import extracted_text
from ai_textbook_processor_spark.operators.generate import (
    generate_content,
    with_generation,
)
from ai_textbook_processor_spark.operators.validate import split_valid
from ai_textbook_processor_spark.plans.pipeline import extract_documents

TEXT = (
    "The green plant uses sunlight and water to produce its food. "
    "Energy moves between living systems in a constant natural cycle. "
    "Students observe simple patterns during their science lessons. "
    "Minerals travel upward through narrow channels inside the stem. "
    "Roots anchor the plant while absorbing moisture from the soil. "
    "Leaves spread widely to capture the available light each day. "
    "Flowers attract insects that carry pollen between plants."
)


def test_pure_generator_shape_and_determinism():
    g = generate_content(TEXT)
    assert g == generate_content(TEXT)  # deterministic
    assert g["importantNotes"].startswith("The green plant")
    assert 1 <= len(g["flashcards"]) <= 5
    for card in g["flashcards"].values():
        assert card["front"] and card["back"]
    assert 1 <= len(g["mcq"]) <= 5
    for m in g["mcq"]:
        assert "_____" in m["question"]
        assert m["answer"] in m["options"] and len(m["options"]) == 4
    assert all("_____" in b for b in g["fillInTheBlanks"])
    assert len(g["questionAnswer"]) == 3
    assert all(p["left"] < p["right"] or True for p in g["matchTheFollowing"])


def test_empty_text():
    g = generate_content("")
    assert g["importantNotes"] == "" and g["flashcards"] == {} and g["mcq"] == []


def test_spark_generation_matches_pure(spark):
    docs = corpus_df(spark, 24, seed=42)
    out = extract_documents(docs)
    valid, _q = split_valid(out)  # P11: only validated docs reach generation
    gen = with_generation(valid, extracted_text("spans"))
    rows = {r["doc_id"]: r["generated"] for r in gen.select("doc_id", "generated").collect()}
    assert len(rows) > 0
    for doc_id, g in rows.items():
        idx = int(doc_id.split("-")[1])
        golden_spans = extract_document(gen_doc(idx, 42)["spans"])
        text = " ".join(
            s["text"] for s in golden_spans if s["kind"] in ("heading", "body", "caption")
        )
        exp = generate_content(text)
        assert g["importantNotes"] == exp["importantNotes"]
        assert dict(g["flashcards"]) .keys() == exp["flashcards"].keys()
        assert [m["answer"] for m in g["mcq"]] == [m["answer"] for m in exp["mcq"]]
        assert list(g["fillInTheBlanks"]) == exp["fillInTheBlanks"]
        assert len(g["questionAnswer"]) == len(exp["questionAnswer"])
