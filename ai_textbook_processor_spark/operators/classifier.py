"""Hashed-bag-of-words logistic-regression quality classifier.

The standard web-corpus filtering move (the GPT-3 / LLaMA "quality
classifier": score every crawled page with a cheap linear model trained on
a high-quality reference class, keep high scorers) re-expressed as pure
Spark aggregates.  The reference service has no trained filter — its
quality gate is the heuristic scorer (``functions/readability.py``, cf.
``/root/reference/utils/validation.py``) — so this is part of the
training-data operator family the engine adds on top.

Scale design (the part that must survive 100 TB):

- **Featurize once, iterate cheap.** The hashed count vectors are built by
  a two-level integer aggregate (per (doc, bucket) counts, then a dense
  ``dim``-array packed via literal map lookups — each token row is
  touched once, fully map-side combined) and localCheckpointed; every
  gradient iteration is
  then a scan + single global aggregate whose result is one row of
  ``dim + 3`` longs — the classic model-sized collect. Raw text never
  rides a shuffle; the model (64 doubles) is re-broadcast as plan
  literals each pass, exactly like :func:`..operators.similarity.kmeans_fit`.
- **Bit-exact distributed determinism via fixed-point gradients.** Float
  summation order across tasks is nondeterministic, so per-doc gradient
  contributions are quantized to int64 (``round_half_up(g * 2**24)``)
  and summed as integers — exact and commutative, so the fitted weights
  are IDENTICAL regardless of partitioning, task order, or cluster size,
  and a pure-Python twin (``golden_oracle._logreg_pure``) reproduces
  them bit-for-bit. 2**24 quantization keeps the summed magnitude under
  2**63 up to ~5e11 docs; halve the scale beyond that.
- **No transcendentals.** The link is the algebraic sigmoid
  ``0.5 + (0.5*t)/(1+|t|)`` — add/mul/div/abs only, so Spark's codegen'd
  doubles and CPython agree to the last bit (exp() implementations
  differ across libm builds; this one cannot).

Per-doc float work (tf division, dot product, sigmoid) is deterministic
because it happens row-locally in a FIXED fold order: the dot product is
``aggregate(zip_with(w, c, *), 0.0, +)`` — a left fold over feature index,
mirrored verbatim by the Python twin.  Lambdas touch only their own
variables (plans/lint.py HOF rule).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_hash

#: fixed-point scale for gradient quantization (see module docstring)
GRAD_SCALE = 1 << 24

#: default hashed-feature dimensionality — small enough that the weight
#: vector is a plan literal, large enough that English stopwords and
#: romance-language function words land in mostly distinct buckets
DIM = 64


def round_half_up(x: float, scale: int) -> float:
    """Spark's ROUND (BigDecimal HALF_UP) for driver-side parity — Python's
    built-in round() is banker's and would diverge on exact .5 ties."""
    return float(Decimal(x).quantize(Decimal(1).scaleb(-scale), ROUND_HALF_UP))


def _sigmoid(t: Column) -> Column:
    """Algebraic sigmoid 0.5 + (0.5*t)/(1+|t|) — same range/monotonicity as
    the logistic link, zero transcendentals (expression shape mirrored
    exactly by golden_oracle._sig_pure; keep the parenthesization)."""
    return F.lit(0.5) + (F.lit(0.5) * t) / (F.lit(1.0) + F.abs(t))


def featurize_docs(
    df: DataFrame,
    label: Column,
    dim: int = DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, y, n, feats[dim]) — hashed bag-of-words counts.

    Tokens are the corpus-wide ``[a-z]+`` convention (same as the MinHash
    shingle builders); each token hashes to ``word_hash % dim``. Counts
    aggregate per (id, y, bucket) first (each token row touched once,
    full map-side combine), then pack into the dense dim-array via
    literal map lookups. Counts are EXACT (integer) — all downstream
    float work derives deterministically from them. Docs with zero Latin
    tokens are dropped (no tf exists)."""
    bucket = (word_hash("w") % dim).alias("b")
    words = df.select(
        F.col(id_col).alias("id"),
        label.cast("double").alias("y"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("w"),
    )
    # r6: two-level aggregate. The one-shuffle shape evaluated dim
    # conditional sums on EVERY exploded token row (tokens x dim
    # conditionals); counting per (id, y, bucket) first touches each token
    # once, and the dense array is then dim literal map lookups over the
    # <=dim-entry per-doc map — no lambda touches a non-lambda attribute
    # (plans/lint.py HOF rule). Counts are the same exact integers, so the
    # fitted weights stay bit-identical (verified against the one-shuffle
    # shape and the pure-Python twin). ~2x on the featurize job at sf0.1.
    g = (
        words.select("id", "y", bucket)
        .groupBy("id", "y", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("id", "y")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("b", "c")))
            ).alias("m")
        )
    )
    feats = F.array(
        *[
            F.coalesce(F.element_at(F.col("m"), F.lit(j)), F.lit(0))
            .cast("long")
            for j in range(dim)
        ]
    )
    return (
        g.select(
            "id",
            "y",
            F.aggregate(feats, F.lit(0).cast("long"), lambda a, c: a + c).alias("n"),
            feats.alias("feats"),
        )
        .where(F.col("n") > 0)
    )


def _sdot_expr(weights: list[float]) -> Column:
    """The deterministic left-fold dot product w·feats (feature order)."""
    wlit = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(wlit, F.col("feats"), lambda w, c: w * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def score_expr(weights: list[float], bias: float) -> Column:
    """P(y=1 | feats, n) for the given model, as a pure Column over the
    featurize_docs schema.  Dot product is a left fold in feature order
    (deterministic); tf normalization divides the fold result once."""
    logit = F.lit(float(bias)) + _sdot_expr(weights) / F.col("n")
    return _sigmoid(logit)


def logreg_fit(
    feats: DataFrame,
    dim: int = DIM,
    iters: int = 4,
    lr: float = 2.0,
) -> tuple[list[float], float, list[int]]:
    """Full-batch gradient descent on the featurized table.

    Each iteration is ONE aggregate job: per row the error
    ``err = sigmoid(logit) - y`` (float64, row-local, deterministic), then
    ``dim + 1`` fixed-point gradient sums plus an exact correct-count —
    one result row total.  Weight updates happen driver-side in float64
    with a pinned parenthesization (mirrored by the oracle twin).

    Returns (weights, bias, per-iteration correct-counts) — the counts are
    integers, so the training curve itself is engine-exact evidence."""
    # Spread the feature table to the session's shuffle width before the
    # checkpoint (r6): AQE's partition coalescing collapses the small
    # post-aggregation table to ONE partition locally, which serializes
    # every iteration's per-row work; integer counts and fixed-point
    # gradient sums are commutative, so the fitted weights are identical
    # at any partitioning. Width follows spark.sql.shuffle.partitions
    # (scale-adaptive); at real scale this is a rebalance-sized exchange
    # of the dim+3-column table, paid once for ``iters`` scans.
    spark = feats.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    feats = feats.repartition(n_parts).localCheckpoint(eager=False)

    # De-literalized, build-once iteration plan (r6 third pass). Two
    # measured per-iteration costs vanish together when the model rides a
    # broadcast 1-row frame (``_w`` array + ``_bias``) instead of plan
    # literals: (a) constructing the 67 aggregate Column trees cost
    # 0.6-0.8 s of driver-side py4j per iteration — more than the job's
    # own execution — and is now paid once; (b) the physical plan and
    # generated code are identical across iterations, so codegen compiles
    # once. The fold runs over the SAME doubles in the SAME order
    # (zip_with over the weight array column vs. a literal array), the
    # sigmoid/error arithmetic keeps its exact shape, and the gradient
    # sums stay fixed-point int64 — the fitted weights are bit-identical
    # (pure-Python twin + literal oracles re-verified).
    #
    # Project the dot-product fold ONCE per row below the aggregate (r6):
    # Spark has no cross-expression CSE, so referencing the sigmoid/error
    # expression inside all dim+1 gradient sums re-evaluated the
    # interpreted 64-element fold dim+2 times per row. Only ``sdot`` is
    # projected (a Project child of an Aggregate survives the optimizer).
    q = F.lit(float(GRAD_SCALE))
    sdot = F.aggregate(
        F.zip_with(F.col("_w"), F.col("feats"), lambda w_, c: w_ * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    p = _sigmoid(F.col("_bias") + F.col("sdot") / F.col("n"))
    err = p - F.col("y")
    aggs = [
        F.sum(
            F.round(
                (err * (F.element_at("feats", j + 1) / F.col("n"))) * q, 0
            ).cast("long")
        ).alias(f"g{j}")
        for j in range(dim)
    ]
    aggs.append(F.sum(F.round(err * q, 0).cast("long")).alias("gb"))
    aggs.append(F.count(F.lit(1)).alias("nd"))
    aggs.append(
        F.sum(((p >= 0.5) == (F.col("y") >= 0.5)).cast("long")).alias("ok")
    )

    w = [0.0] * dim
    b = 0.0
    history: list[int] = []
    n_docs = None
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [([float(x) for x in w], float(b))],
            "_w array<double>, _bias double",
        )
        rowed = feats.crossJoin(F.broadcast(wdf)).select(
            "y", "n", "feats", "_bias", sdot.alias("sdot")
        )
        row = rowed.agg(*aggs).collect()[0]
        n_docs = int(row["nd"])
        history.append(int(row["ok"]))
        w = [
            w[j] - lr * ((int(row[f"g{j}"]) / GRAD_SCALE) / n_docs)
            for j in range(dim)
        ]
        b = b - lr * ((int(row["gb"]) / GRAD_SCALE) / n_docs)
    return w, b, history
