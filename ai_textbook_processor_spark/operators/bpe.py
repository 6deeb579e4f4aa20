"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The reference counts tokens with a fixed external tokenizer
(``/root/reference/utils/utility.py`` delegates to the LLM API's
tokenizer); a training-data pipeline that OWNS its corpus also needs to
LEARN the tokenizer from it — byte-pair-encoding merge learning is the
standard public algorithm (Sennrich, Haddow, Birch, ACL 2016; the same
shape GPT-2/SentencePiece BPE uses).

Scale contract (the 100 TB shape):
* Stage 1 — the ONLY pass over raw text — is one distributed
  explode+groupBy producing the distinct-word frequency table, with
  ``min_count`` and a deterministic top-``max_words`` cap
  (TakeOrderedAndProject, never a global sort materialized). BPE merge
  learning consumes word FREQUENCIES, not the corpus: at 100 TB the
  corpus never leaves the executors, and the driver sees at most
  ``max_words`` rows (the dropped tail's mass is returned so the cap is
  never silent — "no silent caps").
* Stage 2 — the greedy merge loop — runs on that model-sized frequency
  dict driver-side, exactly like the k-means fit keeps centroids
  driver-side (``operators/similarity.py``): per-iteration state is
  O(vocab), not O(corpus). If the capped vocab ever outgrew the driver,
  each iteration is expressible as one Spark pair-count aggregation over
  the (word, count, symbols) table plus an ``F.aggregate`` fold to apply
  the merge — K extra vocab-table shuffles, zero corpus shuffles — but at
  ``max_words`` ≤ a few hundred thousand the driver loop is strictly
  faster and bit-reproducible.
* Encoding broadcasts the learned ranks (model-sized) and applies them in
  an Arrow-batched pandas iterator with a per-word memo — the classic
  deployment shape (tokenizer table broadcast, corpus streamed).

Determinism: merge ties break on (count DESC, pair lexicographic ASC);
word-cap ties on (count DESC, word ASC). Both engines (the Spark path
and the pure-Python literal oracle in ``golden_oracle.py``) use the same
rules, so trained merge tables match exactly.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

WORD_RE = "[A-Za-z0-9']+"
END = "</w>"


# ---------------------------------------------------------------------------
# pure kernels — shared verbatim by the Spark path and the literal oracle
# ---------------------------------------------------------------------------


def merge_word(syms: tuple, a: str, b: str) -> tuple:
    """Greedy left-to-right merge of every adjacent (a, b) in one pass."""
    out: list = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_merges(
    freqs: dict[str, int], num_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Greedy BPE merge learning over a word-frequency dict.

    Returns [(rank, left, right, merged, pair_count)]; stops early when
    no adjacent pair remains. Ties: count DESC, then lexicographically
    smallest (left, right)."""
    vocab = {w: tuple(w) + (END,) for w in freqs}
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        vocab = {w: merge_word(s, a, b) for w, s in vocab.items()}
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple:
    """Apply learned merges to one word, lowest rank first (the classic
    BPE inference order — NOT corpus frequency at encode time)."""
    syms = tuple(word) + (END,)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = merge_word(syms, *best_pair)
    return syms


def encode_text(
    text: str, ranks: dict, cache: dict, word_re: re.Pattern
) -> list[str]:
    toks: list[str] = []
    for w in word_re.findall(text.lower()):
        enc = cache.get(w)
        if enc is None:
            enc = encode_word(w, ranks)
            cache[w] = enc
        toks.extend(enc)
    return toks


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def word_count_table(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Distinct-word frequency table — the single corpus pass. Map-side
    partial aggregation collapses each task's repeats before the one
    hash exchange on word."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(min_count))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 40,
    min_count: int = 1,
    max_words: int = 50_000,
) -> tuple[list[tuple[int, str, str, str, int]], int]:
    """Learn BPE merges from a corpus DataFrame.

    Returns (merges, dropped_word_mass): merges as
    [(rank, left, right, merged, pair_count)], and the total count mass
    of words beyond the ``max_words`` cap (0 = the cap did not bite) so
    callers can surface the truncation instead of silently training on a
    subset."""
    wc = word_count_table(df, text_col, min_count)
    # top-N by (cnt DESC, word ASC): orderBy+limit lowers to
    # TakeOrderedAndProject — each task keeps N rows, no global sort.
    top = wc.orderBy(F.col("cnt").desc(), F.col("word")).limit(max_words)
    rows = top.collect()
    freqs = {r["word"]: r["cnt"] for r in rows}
    dropped = 0
    if len(freqs) == max_words:
        total = wc.agg(F.sum("cnt").alias("s")).first()["s"] or 0
        dropped = int(total) - sum(freqs.values())
    return learn_merges(freqs, num_merges), dropped


def bpe_encode(
    df: DataFrame,
    merges: list[tuple],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode each document with the learned merges.

    Output: (id_col, n_tokens long, tok_hash string) where tok_hash is
    the md5 of the space-joined token stream — pins the exact tokens,
    not just their count. The ranks table rides into the workers inside
    the closure (model-sized, the broadcast-small side); texts stream
    through in Arrow batches with a per-batch word memo."""
    ranks = {(m[1], m[2]): m[0] for m in merges}
    # derive the id field's type from the input (r5 ADVICE: corpus doc
    # ids are strings; hardcoding long broke encoding at the Arrow
    # boundary for anything but the bigint testdata)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, n_tokens long, tok_hash string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        word_re = re.compile(WORD_RE)
        cache: dict = {}
        for pdf in batches:
            ids = []
            counts = []
            hashes = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = encode_text(text or "", ranks, cache, word_re)
                ids.append(did)
                counts.append(len(toks))
                hashes.append(
                    hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": counts, "tok_hash": hashes}
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)
