"""Planted-boilerplate test for paragraph-level dedup (CCNet/RefinedWeb
line scrub): a 4-word paragraph repeated across >= min_docs documents must
vanish from every document, unique paragraphs must survive byte-exactly in
original order, and the plan must broadcast the hot set (never shuffle the
corpus against it) and contain no WindowExec."""

import hashlib

from ai_textbook_processor_spark.operators.dedup import paragraph_dedup

BOILER = "subscribe to our newsletter"  # 4 words, planted in docs 0-3


def _rows():
    rows = []
    for i in range(6):
        body = " ".join(f"u{i}w{j}" for j in range(8))  # 2 unique paras
        if i < 4:
            text = f"{BOILER} {body}"
        else:
            text = f"head{i} only three words {body}"
        rows.append((i, text))
    return rows


def test_planted_boilerplate_scrubbed(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(df, min_docs=3, para_words=4).collect()
    }
    assert len(out) == 6
    for i in range(4):  # boiler dropped, body kept in order
        body = " ".join(f"u{i}w{j}" for j in range(8))
        assert out[i]["n_paras"] == 3
        assert out[i]["kept_paras"] == 2
        assert out[i]["cleaned_len"] == len(body)
        assert out[i]["cleaned_md5"] == hashlib.md5(body.encode()).hexdigest()
    for i in (4, 5):  # nothing hot: full text survives byte-exact
        full = _rows()[i][1]
        assert out[i]["kept_paras"] == out[i]["n_paras"] == 3
        assert out[i]["cleaned_md5"] == hashlib.md5(full.encode()).hexdigest()


def test_plan_broadcasts_hot_set_no_window(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, text string")
    plan = (
        paragraph_dedup(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowExec" not in plan and "Window\n" not in plan
