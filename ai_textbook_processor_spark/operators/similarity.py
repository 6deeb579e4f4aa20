"""Similarity-search operators over embedding DataFrames.

ANN family (task brief): brute-force cosine top-k as the exact baseline,
sign-LSH bucketing and IVF coarse quantization as the scale paths (probe
1/K of the data, then exact rerank). All JVM-side folds over
zip_with-multiplied double arrays — no Python in the scoring loop; the
query vector / centroid table are broadcast. Oracle-verified value-for-
value by the sim_* harness queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential fold — accumulation order matches DuckDB's list_sum over
    an index comprehension, so rounded values agree cross-engine."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk(
    df: DataFrame, query: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding", extra_cols=("label",),
) -> DataFrame:
    """Exact brute-force top-k by cosine; ``query`` is a 1-row DataFrame
    with column ``qv`` (broadcast). Deterministic tiebreak on id."""
    emb = F.col(vec_col).cast("array<double>")
    q = F.col("qv").cast("array<double>")
    cos = dot(emb, q) / (norm(emb) * norm(q))
    scored = df.crossJoin(F.broadcast(query)).select(
        id_col, *extra_cols, cos.alias("cos_raw")
    )
    # TakeOrderedAndProject (per-partition heap + driver merge), not a
    # global row_number() window that funnels every row to one partition.
    return (
        scored.orderBy(F.col("cos_raw").desc(), id_col)
        .limit(k)
        .select(id_col, *extra_cols, F.round("cos_raw", 5).alias("cosine"))
    )


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id from fixed hyperplanes (broadcast-free: the
    planes are plan literals)."""
    emb = vec_col.cast("array<double>")
    return sum(
        F.when(
            dot(emb, F.array(*[F.lit(float(x)) for x in plane])) > 0, 1 << p
        ).otherwise(0)
        for p, plane in enumerate(planes)
    )


def ivf_assign(
    df: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantization: each vector joins its best (max-cosine)
    centroid; centroids is a small DataFrame (cid, cemb) — broadcast.
    The returned ``cid`` is the IVF cell / partition key at scale.

    argmin is groupBy + max_by (NOT a per-id window): the broadcast
    crossJoin keeps all K centroid rows of a vector inside its input
    partition, so map-side partial aggregation collapses them before the
    shuffle — the exchange carries 1 row per vector instead of K.
    Tiebreak matches ORDER BY sim DESC, cid ASC via max_by(struct(sim, -cid)).
    """
    emb = F.col(vec_col).cast("array<double>")
    cemb = F.col("cemb").cast("array<double>")
    sim = dot(emb, cemb) / (norm(emb) * norm(cemb))
    others = [c for c in df.columns if c != id_col]
    key = F.struct(F.col("simc").alias("s"), (-F.col("cid")).alias("c"))
    return (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("simc", sim)
        .groupBy(id_col)
        .agg(F.max_by(F.struct(*others, "cid"), key).alias("_b"))
        .select(id_col, *[F.col(f"_b.{c}").alias(c) for c in others + ["cid"]])
    )


def kmeans_step(
    df: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration for IVF centroid training: assign every vector
    to its max-cosine centroid (``ivf_assign`` — broadcast centroids,
    partial max_by), then recompute per-cell element-wise means. Returns
    LONG form ``(cid, pos, n, c_mean)``: after the map-side combine each
    task contributes at most K*dim partial (sum, count) rows to the
    exchange — the raw vectors never ride a shuffle, so one iteration
    costs one broadcast pass + one tiny aggregate regardless of corpus
    size. A single step is SQL-expressible and oracle-matched
    (sim_kmeans_step); iteration is :func:`kmeans_fit`.
    """
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    elems = assigned.select(
        "cid",
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos0", "v"),
    )
    return (
        elems.groupBy("cid", (F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("v"), 5).alias("c_mean"),
        )
        .select("cid", "pos", "n", "c_mean")
    )


def kmeans_fit(
    df: DataFrame, centroids: DataFrame, iters: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Iterated Lloyd: run ``kmeans_step`` ``iters`` times, rebuilding the
    centroid table from the step output each round. The per-round
    ``collect()`` is K*dim scalars (the centroids themselves — the natural
    driver-side artifact of k-means, bounded by the model size, never by
    the data), re-broadcast as plan literals for the next assignment pass.
    Returns the final centroid DataFrame (cid, cemb).

    Empty cells: a centroid that receives zero assignments is absent from
    the step's grouped output; it is CARRIED FORWARD unchanged (standard
    Lloyd dying-cluster handling) rather than silently dropped, so K is
    stable across rounds and a cell can win vectors again later (r3
    ADVICE)."""
    spark = df.sparkSession
    cents = centroids
    prev = {
        int(r["cid"]): [float(v) for v in r["cemb"]] for r in centroids.collect()
    }
    for _ in range(iters):
        rows = kmeans_step(df, cents, id_col, vec_col).collect()
        by_cid: dict = {}
        for r in rows:
            by_cid.setdefault(int(r["cid"]), {})[r["pos"]] = r["c_mean"]
        nxt = {
            cid: [float(means[p]) for p in sorted(means)]
            for cid, means in by_cid.items()
        }
        # carry forward the previous centroid for any cell with no assignments
        for cid, cemb in prev.items():
            nxt.setdefault(cid, cemb)
        prev = nxt
        lit = sorted(nxt.items())
        cents = spark.createDataFrame(lit, "cid long, cemb array<double>")
    return cents
