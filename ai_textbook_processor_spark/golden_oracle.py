"""Literal-table DuckDB oracles for the non-SQL-expressible queries
(x1_extract_pipeline, x2_extract_span_stats, g1_generate_content,
tp1_clean_corpus_funnel — VERDICT r1 #7).

The extraction/generation kernels can't be expressed in ANSI SQL, but
their expected outputs CAN: this module recomputes each query's result
with the pure-Python producers (the shared kernels in
``functions/kernels.py``, the pandas scorer, the pure generator) directly
over the parquet tables — no Spark anywhere — and emits
``SELECT * FROM (VALUES ...)`` oracle SQL. DuckDB then compares Spark's
distributed answer against an independently computed golden table, closing
the driver's correctness gate at 100% instead of rows-only.

Determinism notes:
* doc ordering never matters (the driver compares order-insensitively).
* float rounding uses Decimal(repr(x)) + ROUND_HALF_UP — the same
  Double.toString -> BigDecimal.setScale(HALF_UP) path Spark's round() takes.
* Java-regex parity: ``\\s`` is replicated as the ASCII class
  ``[ \\t\\n\\x0b\\f\\r]`` (Python's \\s is unicode-wide).
"""

from __future__ import annotations

import functools
import hashlib
import re
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pyarrow.parquet as pq

from .functions.kernels import extract_document
from .functions.readability import CriteriaConfig, score_texts
from .operators.dedup import MH_COEFS, MH_PRIME
from .operators.extract import TEXT_KINDS
from .operators.generate import GEN_TRUNCATE_CHARS, generate_content

_WIDE = CriteriaConfig(grade_lo=-100.0, grade_hi=100.0)

_PUNCT_RE = re.compile(r"[.,;:!?]")
_TOKEN_RE = re.compile(r"[A-Za-z0-9']+")
_STOP_RE = re.compile(r"\b(the|a|and|of|to|in|is)\b")
_JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")
_AZ_RE = re.compile(r"[a-z]+")


def _round_half_up(x: float, scale: int) -> float:
    """Spark round(): BigDecimal(Double.toString(x)).setScale(scale, HALF_UP)."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
    ))


def _derived_docs(sf_dir: str) -> list[tuple[str, list[dict]]]:
    """Pure-Python twin of harness._interleaved_from_documents."""
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    docs = []
    for doc_id, text in zip(t["doc_id"], t["text"]):
        html = (
            "<html><body><nav><a href='/x'>home</a><a href='/y'>about</a></nav>"
            f"<article><h1>Document {doc_id}</h1><p>{text}</p></article>"
            "<footer><p>footer text</p></footer></body></html>"
        )
        docs.append(
            (
                str(doc_id),
                [
                    {"kind": "html", "text": html, "media_ref": "", "offset": 0},
                    {
                        "kind": "figure",
                        "text": "a figure caption",
                        "media_ref": f"img-{doc_id}",
                        "offset": 1,
                    },
                ],
            )
        )
    return docs


@functools.lru_cache(maxsize=4)
def _extracted(sf_dir: str):
    """(doc_id, extracted spans, joined text) + the scored frame, once.

    Forces the STDLIB HTML parser: the golden producer must stay
    independent of the engine's fast-tokenizer path, so if the fast path
    ever diverged, the driver's oracle comparison would catch it.
    """
    from .functions import kernels as K

    docs = _derived_docs(sf_dir)
    rows = []
    old_mode = K._HTML_PARSER_MODE
    K._HTML_PARSER_MODE = "stdlib"
    try:
        for doc_id, spans in docs:
            ext = extract_document(spans)
            text = " ".join(sp["text"] for sp in ext if sp["kind"] in TEXT_KINDS)
            rows.append((doc_id, ext, text))
    finally:
        K._HTML_PARSER_MODE = old_mode
    scored = score_texts(pd.Series([r[2] for r in rows]), _WIDE)
    return rows, scored


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values_sql(rows: list[tuple], cols: list[str]) -> str:
    body = ",\n".join("(" + ", ".join(r) + ")" for r in rows)
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({', '.join(cols)})"


def x1_oracle(sf_dir: str) -> str:
    rows, scored = _extracted(sf_dir)
    lits = []
    for (doc_id, ext, text), fk, valid in zip(
        rows, scored["fk_grade"], scored["is_valid"]
    ):
        lits.append(
            (
                _sql_str(doc_id),
                f"CAST({len(ext)} AS INTEGER)",
                f"CAST({len(text)} AS INTEGER)",
                _sql_str("true" if valid else "false"),
                # CAST: bare float literals unify to DECIMAL in VALUES
                f"CAST({_round_half_up(fk, 4)!r} AS DOUBLE)",
            )
        )
    return _values_sql(lits, ["doc_id", "n_spans", "n_chars", "route", "fk_grade"])


def x2_oracle(sf_dir: str) -> str:
    rows, _ = _extracted(sf_dir)
    counts: dict[str, int] = {}
    for _doc, ext, _text in rows:
        for sp in ext:
            counts[sp["kind"]] = counts.get(sp["kind"], 0) + 1
    lits = [
        (_sql_str(k), f"CAST({n} AS BIGINT)") for k, n in sorted(counts.items())
    ]
    return _values_sql(lits, ["kind", "n"])


def g1_oracle(sf_dir: str) -> str:
    rows, scored = _extracted(sf_dir)
    lits = []
    for (doc_id, _ext, text), valid in zip(rows, scored["is_valid"]):
        if not valid:
            continue
        g = generate_content(text[:GEN_TRUNCATE_CHARS])
        lits.append(
            (
                _sql_str(doc_id),
                f"CAST({len(g['flashcards'])} AS BIGINT)",
                f"CAST({len(g['mcq'])} AS BIGINT)",
                f"CAST({len(g['fillInTheBlanks'])} AS BIGINT)",
                f"CAST({len(g['questionAnswer'])} AS BIGINT)",
                f"CAST({len(g['importantNotes'])} AS BIGINT)",
            )
        )
    return _values_sql(
        lits,
        ["doc_id", "n_flashcards", "n_mcq", "n_blanks", "n_qa", "notes_len"],
    )


def _quality(text: str) -> float:
    """Pure twin of functions.text.quality_score (Spark round -> HALF_UP)."""
    n = len(text)
    tokens = len(_TOKEN_RE.findall(text))
    len_term = min(n / 500.0, 1.0)
    punct_term = min(len(_PUNCT_RE.findall(text)) / max(n, 1) * 20.0, 1.0)
    stop_term = min(
        len(_STOP_RE.findall(text.lower())) / max(tokens, 1) * 4.0, 1.0
    )
    return _round_half_up((len_term + punct_term + stop_term) / 3.0, 6)


def _fingerprint(text: str, prefix: int = 200) -> str:
    norm = _JAVA_WS_RE.sub(" ", text[:prefix]).lower()
    return hashlib.md5(norm.encode("utf-8")).hexdigest()


def _word_hash(w: str) -> int:
    return int(hashlib.md5(w.encode("utf-8")).hexdigest()[:12], 16) % MH_PRIME


def _minhash_sig(
    text: str, coefs=tuple(MH_COEFS), shingle_n: int = 1
) -> tuple | None:
    toks = _AZ_RE.findall(text.lower())
    if shingle_n == 1:
        terms = set(toks)
    else:
        terms = {
            " ".join(toks[i : i + shingle_n])
            for i in range(len(toks) - shingle_n + 1)
        }
    if not terms:
        return None
    hs = [_word_hash(w) for w in terms]
    return tuple(min((a * h + b) % MH_PRIME for h in hs) for a, b in coefs)


def _tp_survivors(sf_dir: str):
    """Shared pure twin of clean_corpus's core stages at min_quality=0.1
    with the wide grade band: gate -> exact dedup -> production MinHash-16
    (3-word shingles banded 4x4, hot_bucket_cap=1000 star routing,
    min_matches=12) -> cluster-canonical keep. Returns (n_input, gated,
    winners, survivors) where survivors are (doc_id, text) kept after
    near-dedup."""
    from .operators.dedup import MH_COEFS_16

    rows, scored = _extracted(sf_dir)
    n_input = len(rows)

    gated = [
        (doc_id, text)
        for (doc_id, _ext, text), valid in zip(rows, scored["is_valid"])
        if valid and _quality(text) >= 0.1
    ]

    # exact dedup: smallest doc_id (string order, like the Spark window) per
    # whitespace-normalized 200-char-prefix fingerprint
    best: dict[str, tuple[str, str]] = {}
    for doc_id, text in gated:
        fp = _fingerprint(text)
        if fp not in best or doc_id < best[fp][0]:
            best[fp] = (doc_id, text)
    winners = sorted(best.values())

    # near-dup, mirroring minhash_lsh_pairs(coefs=MH_COEFS_16, band_rows=4,
    # hot_bucket_cap=1000) + duplicate_clusters canonical keep
    k, band_rows, cap, min_matches = 16, 4, 1000, 12
    sigs: dict[str, tuple] = {}
    for doc_id, text in winners:
        sig = _minhash_sig(text, tuple(MH_COEFS_16), shingle_n=3)
        if sig is not None:
            sigs[doc_id] = sig
    buckets: dict[tuple, list[str]] = {}
    for doc_id, sig in sigs.items():
        for j in range(k // band_rows):
            key = (j, "-".join(str(sig[j * band_rows + t]) for t in range(band_rows)))
            buckets.setdefault(key, []).append(doc_id)
    cand: set[tuple[str, str]] = set()
    for members in buckets.values():
        members.sort()
        if len(members) > cap:
            rep = members[0]
            cand.update((rep, m) for m in members[1:])
        else:
            for i in range(len(members)):
                for j2 in range(i + 1, len(members)):
                    cand.add((members[i], members[j2]))
    pairs = [
        (a, b)
        for a, b in cand
        if sum(x == y for x, y in zip(sigs[a], sigs[b])) >= min_matches
    ]
    # connected components; canonical = minimum doc_id per component
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    survivors = [(d, t) for d, t in winners if find(d) == d]
    return n_input, gated, winners, survivors


def tp1_oracle(sf_dir: str) -> str:
    """Pure twin of plans.training_pipeline.clean_corpus at min_quality=0.1
    with the wide grade band (exactly what tp1_clean_corpus_funnel runs) —
    see :func:`_tp_survivors` for the stage semantics."""
    n_input, gated, winners, survivors = _tp_survivors(sf_dir)
    counts = [
        ("input", n_input),
        ("extracted_valid", len(gated)),
        ("after_exact_dedup", len(winners)),
        ("after_near_dedup", len(survivors)),
    ]
    lits = [(_sql_str(k), f"CAST({v} AS BIGINT)") for k, v in counts]
    return _values_sql(lits, ["stage", "n"])


def tp3_oracle(sf_dir: str) -> str:
    """Pure twin of harness.tp3_stream_ingest: the tp1 funnel (the drained
    deduplicated stream ingest must be byte-equivalent to batch extraction
    of the unique corpus) prefixed by a stream_arrivals row counting
    uniques + the planted doc_id % 7 == 3 re-deliveries."""
    n_input, gated, winners, survivors = _tp_survivors(sf_dir)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n_re = sum(1 for i in t.column("doc_id").to_pylist() if int(i) % 7 == 3)
    counts = [
        ("stream_arrivals", n_input + n_re),
        ("input", n_input),
        ("extracted_valid", len(gated)),
        ("after_exact_dedup", len(winners)),
        ("after_near_dedup", len(survivors)),
    ]
    lits = [(_sql_str(k), f"CAST({v} AS BIGINT)") for k, v in counts]
    return _values_sql(lits, ["stage", "n"])


_CJK_SEARCH_RE = re.compile("[\\u4e00-\\u9fff]")
_THE_RE = re.compile(r"\bthe\b")


def _lang_guess_pure(text: str) -> str:
    """Pure twin of functions.text.lang_guess."""
    if _CJK_SEARCH_RE.search(text):
        return "zh"
    if len(_THE_RE.findall(text.lower())) >= 3:
        return "en"
    return "other"


def _shingles3(text: str) -> set:
    toks = _AZ_RE.findall(text.lower())
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _sample_bucket(doc_id: str) -> int:
    """Pure twin of operators.sampling.sample_hash."""
    return int(hashlib.md5(doc_id.encode("utf-8")).hexdigest()[:12], 16) % 10_000


def tp2_oracle(sf_dir: str) -> str:
    """Pure twin of harness.tp2_full_pipeline: the tp1 stages plus
    benchmark decontamination (raw texts of doc_id % 29 == 11, >= 2 shared
    distinct word-3-gram shingles with any single benchmark doc) and
    deterministic stratified mixing by guessed language (en 50%, zh 100%,
    other 25%; md5-bucket of the doc's own id)."""
    n_input, gated, winners, survivors = _tp_survivors(sf_dir)

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    bench = [
        _shingles3(text)
        for doc_id, text in zip(t["doc_id"], t["text"])
        if doc_id % 29 == 11
    ]
    kept = [
        (d, txt)
        for d, txt in survivors
        if not any(len(_shingles3(txt) & b) >= 2 for b in bench)
    ]

    rates = {"en": 5_000, "zh": 10_000}
    mixed = sum(
        1
        for d, txt in kept
        if _sample_bucket(d) < rates.get(_lang_guess_pure(txt), 2_500)
    )

    counts = [
        ("input", n_input),
        ("extracted_valid", len(gated)),
        ("after_exact_dedup", len(winners)),
        ("after_near_dedup", len(survivors)),
        ("after_decontam", len(kept)),
        ("after_mix", mixed),
    ]
    lits = [(_sql_str(k), f"CAST({v} AS BIGINT)") for k, v in counts]
    return _values_sql(lits, ["stage", "n"])


def s6_oracle(sf_dir: str) -> str:
    """Pure twin of harness.s6_image_features (same pack/decode kernels
    driven without Spark). The Spark side stores the feature vector as
    float32 (FEATURE_SCHEMA) before folding to double, so the twin
    round-trips each element through float32 first."""
    import numpy as np

    from .operators.multimodal import image_features_payload, pack_asset

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pydict()
    lits = []
    for doc_id, n_chars in zip(t["doc_id"], t["n_chars"]):
        if doc_id >= 50:
            continue
        aid = str(doc_id)
        content = pack_asset(
            aid, 200 + int(n_chars) % 900, 150 + (int(n_chars) * 7) % 900
        )
        d = image_features_payload(content)
        feat_sum = 0.0
        for v in d["feature"]:
            feat_sum += float(np.float32(v))
        lits.append(
            (
                _sql_str(aid),
                f"CAST({d['width']} AS INTEGER)",
                f"CAST({d['height']} AS INTEGER)",
                f"CAST({d['out_width']} AS INTEGER)",
                f"CAST({d['out_height']} AS INTEGER)",
                f"CAST({len(content)} AS INTEGER)",
                _sql_str(d["sample_b64"]),
                f"CAST({_round_half_up(feat_sum, 4)!r} AS DOUBLE)",
            )
        )
    return _values_sql(
        lits,
        [
            "asset_id", "width", "height", "out_width", "out_height",
            "byte_len", "sample_b64", "feat_sum",
        ],
    )


def _pq_pure(sf_dir: str, m: int = 4, k_sub: int = 8, iters: int = 3,
             qid: int = 7, k: int = 10):
    """Pure-Python twin of the PQ pipeline (train + encode + ADC search +
    brute-force recall), replicating the Spark operators' exact float
    discipline: sequential left-fold double sums (dist2/aggregate order),
    HALF_UP rounding of Lloyd means to 5 decimals each iteration (the
    quantization barrier that makes cross-engine equality robust),
    (-dist, -cid) max tiebreaks, and empty-cell carry-forward."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pydict()
    vecs = {
        int(i): [float(x) for x in e]
        for i, e in zip(t["vec_id"], t["embedding"])
    }
    ids = sorted(vecs)
    dim = len(vecs[ids[0]])
    d = dim // m

    def dist2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    books = {}
    for j in range(m):
        sub = {i: vecs[i][j * d : (j + 1) * d] for i in ids}
        cents = {c: list(sub[ids[c]]) for c in range(k_sub)}
        for _ in range(iters):
            groups: dict = {}
            for i in ids:
                best = max(
                    range(k_sub),
                    key=lambda c: (-dist2(sub[i], cents[c]), -c),
                )
                groups.setdefault(best, []).append(i)
            nxt = {}
            for c, members in groups.items():
                means = []
                for p in range(d):
                    s = 0.0
                    for i in members:
                        s += sub[i][p]
                    means.append(_round_half_up(s / len(members), 5))
                nxt[c] = means
            for c, ce in cents.items():
                nxt.setdefault(c, ce)
            cents = nxt
        books[j] = cents

    codes = {
        i: [
            max(
                range(k_sub),
                key=lambda c: (
                    -dist2(vecs[i][j * d : (j + 1) * d], books[j][c]),
                    -c,
                ),
            )
            for j in range(m)
        ]
        for i in ids
    }
    qv = vecs[qid]
    lut = {
        (j, c): dist2(qv[j * d : (j + 1) * d], books[j][c])
        for j in range(m)
        for c in range(k_sub)
    }

    def adc(i):
        acc = 0.0
        for j in range(m):
            acc += lut[(j, codes[i][j])]
        return acc

    ranked = sorted(ids, key=lambda i: (adc(i), i))
    topk = [(i, _round_half_up(adc(i), 5)) for i in ranked[:k]]
    pq_ids = [i for i in ranked if i != qid][:k]
    brute = sorted(
        (i for i in ids if i != qid), key=lambda i: (dist2(vecs[i], qv), i)
    )[:k]
    hits = len(set(pq_ids) & set(brute))
    return topk, hits


@functools.lru_cache(maxsize=16)
def _ivfpq_pure(sf_dir: str, m: int = 4, k_sub: int = 8, iters: int = 2,
                qid: int = 7, k: int = 10, n_probe: int = 2):
    """Pure twin of sim_ivfpq_topk: L2 coarse Lloyd (seeds vec_id 1-4,
    cid = vec_id - 1), residual PQ train/encode, 2-cell probe, residual
    ADC — same float discipline as :func:`_pq_pure`."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pydict()
    vecs = {
        int(i): [float(x) for x in e]
        for i, e in zip(t["vec_id"], t["embedding"])
    }
    ids = sorted(vecs)
    dim = len(vecs[ids[0]])
    d = dim // m

    def dist2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    def lloyd_l2(points, cents, iters):
        for _ in range(iters):
            groups: dict = {}
            for i in sorted(points):
                best = max(
                    sorted(cents),
                    key=lambda c: (-dist2(points[i], cents[c]), -c),
                )
                groups.setdefault(best, []).append(i)
            nxt = {}
            for c, members in groups.items():
                means = []
                for p in range(len(points[members[0]])):
                    s = 0.0
                    for i in members:
                        s += points[i][p]
                    means.append(_round_half_up(s / len(members), 5))
                nxt[c] = means
            for c, ce in cents.items():
                nxt.setdefault(c, ce)
            cents = nxt
        return cents

    coarse = lloyd_l2(vecs, {v - 1: list(vecs[v]) for v in (1, 2, 3, 4)}, iters)
    cell = {
        i: max(
            sorted(coarse),
            key=lambda c: (-dist2(vecs[i], coarse[c]), -c),
        )
        for i in ids
    }
    resid = {
        i: [x - c for x, c in zip(vecs[i], coarse[cell[i]])] for i in ids
    }

    books = {}
    for j in range(m):
        sub = {i: resid[i][j * d : (j + 1) * d] for i in ids}
        seeds = {c: list(sub[ids[c]]) for c in range(k_sub)}
        books[j] = lloyd_l2(sub, seeds, iters)
    codes = {
        i: [
            max(
                sorted(books[j]),
                key=lambda c: (
                    -dist2(resid[i][j * d : (j + 1) * d], books[j][c]),
                    -c,
                ),
            )
            for j in range(m)
        ]
        for i in ids
    }

    qv = vecs[qid]
    probed = sorted(coarse, key=lambda c: (dist2(qv, coarse[c]), c))[:n_probe]
    qres = {c: [x - y for x, y in zip(qv, coarse[c])] for c in probed}
    lut = {
        (c, j, cc): dist2(qres[c][j * d : (j + 1) * d], books[j][cc])
        for c in probed
        for j in range(m)
        for cc in books[j]
    }
    cand = [i for i in ids if cell[i] in probed]

    def adc(i):
        acc = 0.0
        for j in range(m):
            acc += lut[(cell[i], j, codes[i][j])]
        return acc

    ranked = sorted(cand, key=lambda i: (adc(i), i))[:k]
    return [(i, _round_half_up(adc(i), 5)) for i in ranked]


def ivfpq_topk_oracle(sf_dir: str) -> str:
    lits = [
        (f"CAST({i} AS BIGINT)", f"CAST({a!r} AS DOUBLE)")
        for i, a in _ivfpq_pure(sf_dir)
    ]
    return _values_sql(lits, ["vec_id", "adc"])


def ivfpq_sweep_oracle(sf_dir: str) -> str:
    """Pure twin of harness.sim_ivfpq_sweep: exact L2 top-10 ground truth
    plus the IVF-PQ ADC top-10 at each n_probe in {1, 2, 4}, overlap
    counted — same fold/round/tiebreak discipline as :func:`_ivfpq_pure`."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pydict()
    vecs = {
        int(i): [float(x) for x in e]
        for i, e in zip(t["vec_id"], t["embedding"])
    }
    qv = vecs[7]

    def dist2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    brute = set(sorted(vecs, key=lambda i: (dist2(qv, vecs[i]), i))[:10])
    lits = []
    for p in (1, 2, 4):
        approx = {i for i, _ in _ivfpq_pure(sf_dir, n_probe=p)}
        hits = len(approx & brute)
        lits.append(
            (
                f"CAST({p} AS INTEGER)",
                f"CAST({hits} AS BIGINT)",
                f"CAST({round(hits / 10.0, 2)!r} AS DOUBLE)",
            )
        )
    return _values_sql(lits, ["n_probe", "n_hit", "recall_at_10"])


def pq_topk_oracle(sf_dir: str) -> str:
    topk, _ = _pq_pure(sf_dir)
    lits = [
        (f"CAST({i} AS BIGINT)", f"CAST({a!r} AS DOUBLE)") for i, a in topk
    ]
    return _values_sql(lits, ["vec_id", "adc"])


def pq_recall_oracle(sf_dir: str) -> str:
    _, hits = _pq_pure(sf_dir)
    return _values_sql(
        [
            (
                "CAST(10 AS BIGINT)",
                f"CAST({hits} AS BIGINT)",
                f"CAST({round(hits / 10.0, 2)!r} AS DOUBLE)",
            )
        ],
        ["k", "hits", "recall"],
    )


def s6png_oracle(sf_dir: str) -> str:
    """Pure twin of harness.s6_png_features: drives the same PNG
    pack/decode kernels without Spark (the codec itself is pinned
    independently by the hand-computed goldens in tests/test_png.py).
    float32 round-trip per element matches FEATURE_SCHEMA storage."""
    import numpy as np

    from .operators.multimodal import image_features_payload, pack_png_asset

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pydict()
    lits = []
    for doc_id, n_chars in zip(t["doc_id"], t["n_chars"]):
        if doc_id >= 30:
            continue
        aid = str(doc_id)
        content = pack_png_asset(aid, int(n_chars))
        d = image_features_payload(content)
        feat_sum = 0.0
        for v in d["feature"]:
            feat_sum += float(np.float32(v))
        lits.append(
            (
                _sql_str(aid),
                f"CAST({d['width']} AS INTEGER)",
                f"CAST({d['height']} AS INTEGER)",
                f"CAST({d['out_width']} AS INTEGER)",
                f"CAST({d['out_height']} AS INTEGER)",
                f"CAST({len(content)} AS INTEGER)",
                _sql_str(d["sample_b64"]),
                f"CAST({_round_half_up(feat_sum, 4)!r} AS DOUBLE)",
            )
        )
    return _values_sql(
        lits,
        [
            "asset_id", "width", "height", "out_width", "out_height",
            "byte_len", "sample_b64", "feat_sum",
        ],
    )


def s4wav_oracle(sf_dir: str) -> str:
    """Pure twin of harness.s4_wav_transcribe (the WAV parser itself is
    pinned by roundtrip + downmix tests in test_audio.py)."""
    from .operators.multimodal import pack_wav_asset, transcribe_payload

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pydict()
    lits = []
    for doc_id, n_chars in zip(t["doc_id"], t["n_chars"]):
        if doc_id >= 30:
            continue
        aid = str(doc_id)
        rate, dur, segs = transcribe_payload(pack_wav_asset(aid, int(n_chars)))
        lits.append(
            (
                _sql_str(aid),
                f"CAST({rate} AS BIGINT)",
                f"CAST({dur} AS BIGINT)",
                f"CAST({len(segs)} AS BIGINT)",
                _sql_str(" ".join(s["token"] for s in segs)),
            )
        )
    return _values_sql(
        lits,
        ["asset_id", "sample_rate", "duration_ms", "n_segments", "transcript"],
    )


def mm_mjpeg_oracle(sf_dir: str) -> str:
    """Pure twin of harness.mm_video_mjpeg (container + JPEG codec are
    pinned by their own conformance tests)."""
    from .operators.multimodal import pack_mjpeg_asset, video_frames_payload

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pydict()
    lits = []
    for doc_id, n_chars in zip(t["doc_id"], t["n_chars"]):
        if doc_id >= 25:
            continue
        aid = str(doc_id)
        d = video_frames_payload(pack_mjpeg_asset(aid, int(n_chars)))
        for f in d["frames"]:
            lits.append(
                (
                    _sql_str(aid),
                    f"CAST({d['width']} AS BIGINT)",
                    f"CAST({d['fps']} AS BIGINT)",
                    f"CAST({d['n_frames']} AS BIGINT)",
                    f"CAST({d['duration_ms']} AS BIGINT)",
                    f"CAST({f['frame_idx']} AS BIGINT)",
                    f"CAST({f['t_ms']} AS BIGINT)",
                    f"CAST({_round_half_up(float(__import__('numpy').float64(f['feat_mean'])), 5)!r} AS DOUBLE)",
                )
            )
    return _values_sql(
        lits,
        ["asset_id", "width", "fps", "n_frames", "duration_ms",
         "frame_idx", "t_ms", "feat_mean"],
    )


def s6jpeg_oracle(sf_dir: str) -> str:
    """Pure twin of harness.s6_jpeg_features (codec itself pinned by the
    hand-assembled T.81 goldens in tests/test_jpeg.py)."""
    import numpy as np

    from .operators.multimodal import image_features_payload, pack_jpeg_asset

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pydict()
    lits = []
    for doc_id, n_chars in zip(t["doc_id"], t["n_chars"]):
        if doc_id >= 30:
            continue
        aid = str(doc_id)
        content = pack_jpeg_asset(aid, int(n_chars))
        d = image_features_payload(content)
        feat_sum = 0.0
        for v in d["feature"]:
            feat_sum += float(np.float32(v))
        lits.append(
            (
                _sql_str(aid),
                f"CAST({d['width']} AS INTEGER)",
                f"CAST({d['height']} AS INTEGER)",
                f"CAST({d['out_width']} AS INTEGER)",
                f"CAST({d['out_height']} AS INTEGER)",
                f"CAST({len(content)} AS INTEGER)",
                _sql_str(d["sample_b64"]),
                f"CAST({_round_half_up(feat_sum, 4)!r} AS DOUBLE)",
            )
        )
    return _values_sql(
        lits,
        [
            "asset_id", "width", "height", "out_width", "out_height",
            "byte_len", "sample_b64", "feat_sum",
        ],
    )


def s6prog_oracle(sf_dir: str) -> str:
    """Pure twin of harness.s6_progressive_jpeg (progressive codec pinned
    by the hand-assembled SOF2 goldens in tests/test_jpeg_progressive.py).
    Recomputes the features AND the progressive==baseline decode-equality
    flag in pure Python."""
    import numpy as np

    from .operators.multimodal import (
        baseline_twin_of_progressive,
        image_features_payload,
        pack_progressive_jpeg_asset,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pydict()
    lits = []
    for doc_id, n_chars in zip(t["doc_id"], t["n_chars"]):
        if doc_id >= 30:
            continue
        aid = str(doc_id)
        prog = pack_progressive_jpeg_asset(aid, int(n_chars))
        base = baseline_twin_of_progressive(aid, int(n_chars))
        dp = image_features_payload(prog)
        db = image_features_payload(base)
        feat_sum = 0.0
        for v in dp["feature"]:
            feat_sum += float(np.float32(v))
        match = (
            dp["feature"] == db["feature"]
            and dp["sample_b64"] == db["sample_b64"]
        )
        lits.append(
            (
                _sql_str(aid),
                f"CAST({dp['width']} AS BIGINT)",
                f"CAST({dp['height']} AS BIGINT)",
                f"CAST({dp['out_width']} AS BIGINT)",
                f"CAST({dp['out_height']} AS BIGINT)",
                f"CAST({len(prog)} AS BIGINT)",
                f"CAST({_round_half_up(feat_sum, 4)!r} AS DOUBLE)",
                "TRUE" if match else "FALSE",
            )
        )
    return _values_sql(
        lits,
        [
            "asset_id", "width", "height", "out_width", "out_height",
            "prog_bytes", "feat_sum", "feat_match",
        ],
    )


def s6reenc_oracle(sf_dir: str) -> str:
    """Pure twin of harness.s6_reencode_chain."""
    from .operators.multimodal import (
        image_reencode_payload,
        pack_jpeg_asset,
        pack_png_asset,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pydict()
    lits = []
    for doc_id, n_chars in zip(t["doc_id"], t["n_chars"]):
        if doc_id >= 20:
            continue
        aid = str(doc_id)
        content = (
            pack_png_asset(aid, int(n_chars))
            if doc_id % 2 == 0
            else pack_jpeg_asset(aid, int(n_chars))
        )
        d = image_reencode_payload(content)
        lits.append(
            (
                _sql_str(aid),
                f"CAST({d['out_width']} AS BIGINT)",
                f"CAST({d['out_height']} AS BIGINT)",
                f"CAST({d['jpeg_bytes']} AS BIGINT)",
                _sql_str(d["jpeg_md5"]),
                f"CAST({d['b64_len']} AS BIGINT)",
            )
        )
    return _values_sql(
        lits,
        ["asset_id", "out_width", "out_height", "jpeg_bytes", "jpeg_md5",
         "b64_len"],
    )


def mm_video_oracle(sf_dir: str) -> str:
    """Pure twin of harness.mm_video_frames (shared pack/sample kernels
    driven without Spark)."""
    from .operators.multimodal import pack_video, video_frames_payload

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pydict()
    lits = []
    for doc_id, n_chars in zip(t["doc_id"], t["n_chars"]):
        if doc_id >= 40:
            continue
        aid, n = str(doc_id), int(n_chars)
        d = video_frames_payload(
            pack_video(aid, 640 + n % 1280, 360 + n % 720,
                       24 + (n % 2) * 6, 120 + (n * 3) % 480)
        )
        for fr in d["frames"]:
            lits.append(
                (
                    _sql_str(aid),
                    f"CAST({d['width']} AS INTEGER)",
                    f"CAST({d['fps']} AS INTEGER)",
                    f"CAST({d['n_frames']} AS INTEGER)",
                    f"CAST({d['duration_ms']} AS INTEGER)",
                    f"CAST({fr['frame_idx']} AS INTEGER)",
                    f"CAST({fr['t_ms']} AS INTEGER)",
                    f"CAST({_round_half_up(fr['feat_mean'], 5)!r} AS DOUBLE)",
                )
            )
    return _values_sql(
        lits,
        ["asset_id", "width", "fps", "n_frames", "duration_ms",
         "frame_idx", "t_ms", "feat_mean"],
    )


def s4_oracle(sf_dir: str) -> str:
    """Pure twin of harness.s4_audio_transcribe (same pack/transcribe
    kernels driven without Spark)."""
    from .operators.multimodal import pack_audio, transcribe_payload

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pydict()
    lits = []
    for doc_id, n_chars in zip(t["doc_id"], t["n_chars"]):
        if doc_id >= 50:
            continue
        aid = str(doc_id)
        _rate, dur, segs = transcribe_payload(
            pack_audio(aid, 16000, int(16000 * (int(n_chars) % 5 + 1)))
        )
        lits.append(
            (
                _sql_str(aid),
                f"CAST({dur} AS INTEGER)",
                f"CAST({len(segs)} AS BIGINT)",
                _sql_str(" ".join(s["token"] for s in segs)),
            )
        )
    return _values_sql(lits, ["asset_id", "duration_ms", "n_segments", "transcript"])


def _bpe_freqs(sf_dir: str) -> dict[str, int]:
    """Word-frequency dict computed WITHOUT Spark: pyarrow scan + Python
    Counter over the same regex/lowercase pipeline as
    operators.bpe.word_count_table — this independently checks the
    distributed explode+groupBy stage, while the shared merge/encode
    kernels are pinned by hand-worked goldens in tests/test_bpe.py."""
    import re
    from collections import Counter

    from .operators.bpe import WORD_RE

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"]).to_pydict()
    wre = re.compile(WORD_RE)
    c: Counter = Counter()
    for text in t["text"]:
        c.update(wre.findall((text or "").lower()))
    from .harness import BPE_MIN_COUNT

    return {w: n for w, n in c.items() if n >= BPE_MIN_COUNT}


@functools.lru_cache(maxsize=4)
def _bpe_merges_pure(sf_dir: str):
    from .harness import BPE_MERGES
    from .operators.bpe import learn_merges

    return learn_merges(_bpe_freqs(sf_dir), BPE_MERGES)


def bpe_train_oracle(sf_dir: str) -> str:
    lits = [
        (
            f"CAST({r} AS BIGINT)",
            _sql_str(a),
            _sql_str(b),
            _sql_str(m),
            f"CAST({c} AS BIGINT)",
        )
        for r, a, b, m, c in _bpe_merges_pure(sf_dir)
    ]
    return _values_sql(
        lits, ["merge_rank", "lhs", "rhs", "merged", "pair_count"]
    )


def bpe_encode_oracle(sf_dir: str) -> str:
    import hashlib
    import re

    from .operators.bpe import WORD_RE, encode_text

    merges = _bpe_merges_pure(sf_dir)
    ranks = {(m[1], m[2]): m[0] for m in merges}
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    wre = re.compile(WORD_RE)
    cache: dict = {}
    lits = []
    for doc_id, text in zip(t["doc_id"], t["text"]):
        if doc_id >= 60:
            continue
        toks = encode_text(text or "", ranks, cache, wre)
        lits.append(
            (
                f"CAST({int(doc_id)} AS BIGINT)",
                f"CAST({len(toks)} AS BIGINT)",
                _sql_str(
                    hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest()
                ),
            )
        )
    return _values_sql(lits, ["doc_id", "n_tokens", "tok_hash"])


@functools.lru_cache(maxsize=4)
def _logreg_pure(sf_dir: str):
    """Pure twin of operators.classifier (featurize_docs + logreg_fit +
    score_expr) over the documents table, label y = (lang == 'en').

    Replicates the Spark float discipline exactly: integer hashed counts,
    left-fold dot product in feature order, algebraic sigmoid
    0.5 + (0.5*t)/(1+|t|), HALF_UP fixed-point gradient quantization
    (int64 sums are order-free, so a per-doc Python loop and a distributed
    aggregate land on the same integers), and the pinned update
    parenthesization w - lr*((G/Q)/n_docs).

    Returns (weights, bias, per-iter correct counts, scores) where scores
    is [(doc_id, y, p)] for every doc with >= 1 Latin token."""
    from .operators.classifier import DIM, GRAD_SCALE

    dim, iters, lr, q = DIM, 4, 2.0, GRAD_SCALE
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pydict()
    rows = []
    for doc_id, text, lang in zip(t["doc_id"], t["text"], t["lang"]):
        toks = _AZ_RE.findall((text or "").lower())
        if not toks:
            continue
        c = [0] * dim
        for w_ in toks:
            c[_word_hash(w_) % dim] += 1
        rows.append((int(doc_id), 1.0 if lang == "en" else 0.0, len(toks), c))

    def sig(tv: float) -> float:
        return 0.5 + (0.5 * tv) / (1.0 + abs(tv))

    def prob(n: int, c: list, w: list, b: float) -> float:
        acc = 0.0
        for wj, cj in zip(w, c):
            acc = acc + wj * cj
        return sig(b + acc / n)

    w, b = [0.0] * dim, 0.0
    history = []
    nd = len(rows)
    for _ in range(iters):
        g, gb, ok = [0] * dim, 0, 0
        for _id, y, n, c in rows:
            p = prob(n, c, w, b)
            err = p - y
            for j in range(dim):
                g[j] += int(_round_half_up((err * (c[j] / n)) * float(q), 0))
            gb += int(_round_half_up(err * float(q), 0))
            ok += 1 if (p >= 0.5) == (y >= 0.5) else 0
        history.append(ok)
        w = [w[j] - lr * ((g[j] / q) / nd) for j in range(dim)]
        b = b - lr * ((gb / q) / nd)
    scores = [(_id, y, prob(n, c, w, b)) for _id, y, n, c in rows]
    return w, b, history, scores


def qc_fit_oracle(sf_dir: str) -> str:
    w, b, _hist, _scores = _logreg_pure(sf_dir)
    lits = [
        (
            f"CAST({j} AS BIGINT)",
            f"CAST({_round_half_up(wj, 8)!r} AS DOUBLE)",
        )
        for j, wj in enumerate(w)
    ] + [(f"CAST(-1 AS BIGINT)", f"CAST({_round_half_up(b, 8)!r} AS DOUBLE)")]
    return _values_sql(lits, ["feature", "weight"])


def qc_score_oracle(sf_dir: str) -> str:
    _w, _b, _hist, scores = _logreg_pure(sf_dir)
    top = sorted(scores, key=lambda r: (-r[2], r[0]))[:15]
    lits = [
        (
            f"CAST({doc_id} AS BIGINT)",
            f"CAST({int(y)} AS BIGINT)",
            f"CAST({_round_half_up(p, 6)!r} AS DOUBLE)",
        )
        for doc_id, y, p in top
    ]
    return _values_sql(lits, ["doc_id", "y_true", "score"])


def qc_eval_oracle(sf_dir: str) -> str:
    _w, _b, hist, scores = _logreg_pure(sf_dir)
    tp = sum(1 for _i, y, p in scores if y >= 0.5 and p >= 0.5)
    fp = sum(1 for _i, y, p in scores if y < 0.5 and p >= 0.5)
    fn = sum(1 for _i, y, p in scores if y >= 0.5 and p < 0.5)
    tn = sum(1 for _i, y, p in scores if y < 0.5 and p < 0.5)
    vals = [tp, fp, fn, tn, len(scores)] + hist
    cols = ["tp", "fp", "fn", "tn", "n_docs"] + [
        f"ok_it{i}" for i in range(1, len(hist) + 1)
    ]
    return _values_sql(
        [tuple(f"CAST({v} AS BIGINT)" for v in vals)], cols
    )


_LITERAL_BUILDERS = {
    "x1_extract_pipeline": x1_oracle,
    "x2_extract_span_stats": x2_oracle,
    "g1_generate_content": g1_oracle,
    "tp1_clean_corpus_funnel": tp1_oracle,
    "tp2_full_pipeline": tp2_oracle,
    "tp3_stream_ingest": tp3_oracle,
    "s4_audio_transcribe": s4_oracle,
    "s4_wav_transcribe": s4wav_oracle,
    "s6_image_features": s6_oracle,
    "s6_png_features": s6png_oracle,
    "s6_jpeg_features": s6jpeg_oracle,
    "s6_progressive_jpeg": s6prog_oracle,
    "s6_reencode_chain": s6reenc_oracle,
    "sim_pq_topk": pq_topk_oracle,
    "sim_ivfpq_topk": ivfpq_topk_oracle,
    "sim_ivfpq_sweep": ivfpq_sweep_oracle,
    "sim_pq_recall": pq_recall_oracle,
    "mm_video_frames": mm_video_oracle,
    "mm_video_mjpeg": mm_mjpeg_oracle,
    "txt_bpe_train": bpe_train_oracle,
    "txt_bpe_encode": bpe_encode_oracle,
    "qc_logreg_fit": qc_fit_oracle,
    "qc_logreg_score": qc_score_oracle,
    "qc_logreg_eval": qc_eval_oracle,
}


def literal_oracle_names() -> list[str]:
    """Names with a pure-Python literal-table oracle — cheap (no oracle
    computation), used by tools/gen_registry.py for mechanical counts."""
    return list(_LITERAL_BUILDERS)


@functools.lru_cache(maxsize=4)
def literal_oracles(sf_dir: str) -> dict[str, str]:
    return {k: fn(sf_dir) for k, fn in _LITERAL_BUILDERS.items()}
