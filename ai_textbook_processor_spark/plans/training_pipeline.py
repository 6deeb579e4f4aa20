"""End-to-end training-data pipeline: the composition a 100 TB corpus
actually runs nightly.

    extract (fused UDF)             -> spans + validation
    quality gate (JVM expressions)  -> quality_score / lang filter
    exact dedup (fingerprint)       -> keep one doc per fingerprint
    near-dup dedup (MinHash+LSH)    -> cluster-canonical keep per component
    -> cleaned corpus + per-stage funnel counts

Shuffle budget: extraction none; exact dedup one hash shuffle on the
fingerprint; LSH the (band, sig) shuffle; clustering one join + one
combined shuffle per propagation window — all on (id, small columns),
never on raw spans. The funnel DataFrame is the pipeline's observability
(the reference's SSE progress analog at dataset granularity).

Single-extraction guarantee: the expensive fused extract UDF runs exactly
once per pipeline invocation. The FULL extracted frame (spans +
validation + text + quality + lang) is materialized with a lazy
``localCheckpoint`` right after extraction; every downstream branch — the
dedup window, the LSH candidate join, the funnel aggregate, AND the
returned ``cleaned`` frame — is a projection/filter of that one
checkpoint, so materializing ``cleaned`` later still never re-runs the
UDF (r2 ADVICE: a slim side-cache could not be substituted into the
uncached parent plan, silently re-extracting). Verified by an accumulator
test in test_training_pipeline.py that materializes BOTH the funnel and
``cleaned``. Checkpoint over ``persist`` (r3): blocks are freed by
ContextCleaner when the frames are garbage collected, so repeated
pipeline invocations in one session don't accumulate pinned
cache-manager entries; MEMORY_AND_DISK backing spills instead of
recomputing under pressure. On a real 100 TB run this is the in-session
analog of writing the extracted table to durable storage and reading it
back — the extraction output is the artifact, recomputing it is always
worse than spilling it (and a cluster that must survive executor loss
writes the real table; docstring note in operators/dedup.py applies
here too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.readability import CriteriaConfig
from ..functions.text import fingerprint, lang_guess, quality_score
from ..operators.decontam import benchmark_overlap
from ..operators.dedup import MH_COEFS_16, duplicate_clusters, minhash_lsh_pairs
from ..operators.extract import extracted_text
from ..operators.sampling import sample_keep_expr
from .pipeline import extract_documents


def clean_corpus(
    docs: DataFrame,
    cfg: CriteriaConfig | None = None,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = (),
    near_dup_min_matches: int = 12,
    coefs=tuple(MH_COEFS_16),
    band_rows: int = 4,
    hot_bucket_cap: int | None = 1000,
    shingle_n: int = 3,
    benchmark: DataFrame | None = None,
    decontam_min_shared: int = 2,
    decontam_shingle_n: int = 3,
    mix_rates: dict[str, float] | None = None,
    mix_default_rate: float = 1.0,
    domain_cap: int | None = None,
    domain_col: str = "content_type",
    dsir_target_types: tuple[str, ...] = (),
    dsir_top_k: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (cleaned DataFrame, funnel DataFrame of per-stage counts).

    Optional r3 stages, each off by default (funnel rows appear only when
    active, so existing oracles are untouched):

    * ``benchmark`` — a (doc_id, text) frame of eval-set texts: surviving
      docs sharing >= ``decontam_min_shared`` distinct word
      ``decontam_shingle_n``-gram shingles with any benchmark doc are
      dropped (operators.decontam; the eval side is broadcast, the corpus
      side never shuffles for it). Funnel stage ``after_decontam``.
    * ``mix_rates`` — per-language keep rates (operators.sampling): the
      decision is a hash of each doc's own id, so it is a pure Column
      expression folded into the existing funnel aggregate and the final
      semi-join — no extra pass, no shuffle, reproducible across retries.
      Funnel stage ``after_mix``.

    Near-dup config (r2 VERDICT #4): the PRODUCTION curve is the default —
    16 permutations banded 4x4 (candidate knee near j~0.7) over 3-word
    SHINGLE sets (unigram sets saturate on a same-domain corpus — every
    doc shares most of the vocabulary — and over-merge; shingles measure
    phrase overlap), verified at ``near_dup_min_matches``/16 components,
    with ``hot_bucket_cap`` star-routing oversized LSH buckets so one
    boilerplate cluster can't emit k^2 candidate rows. Winners are kept CLUSTER-canonically: LSH
    pairs feed ``duplicate_clusters`` (connected components) and only the
    component's minimum doc_id survives — a chain a~b~c keeps exactly one
    doc, where the r1 pair-loser heuristic over-deleted (kept none beyond
    a) or under-deleted depending on pair orientation.

    The funnel is computed in two driver actions total (a count that
    materializes the extraction cache, then one aggregate over per-doc
    flags; duplicate_clusters adds one checkpoint job per propagation
    window) — never one action per stage.

    The near-dup loser set is anti-joined WITHOUT a broadcast hint: on a
    crawl-scale corpus losers are O(duplicate docs) — easily 20-50% of all
    doc_ids, far beyond broadcast limits. A shuffle anti-join on a slim key
    column is cheap, and AQE still broadcasts when the set actually fits.
    """
    extracted = (
        extract_documents(docs, cfg)
        .withColumn("text", extracted_text("spans"))
        .withColumn("quality", quality_score("text"))
        .withColumn("lang_guess", lang_guess("text"))
        .localCheckpoint(eager=False)
    )
    n_input = extracted.count()  # action 1: materializes the checkpoint => extraction runs here, once
    return _stages_from_extracted(
        extracted, n_input,
        min_quality=min_quality, langs=langs,
        near_dup_min_matches=near_dup_min_matches, coefs=coefs,
        band_rows=band_rows, hot_bucket_cap=hot_bucket_cap,
        shingle_n=shingle_n, benchmark=benchmark,
        decontam_min_shared=decontam_min_shared,
        decontam_shingle_n=decontam_shingle_n,
        mix_rates=mix_rates, mix_default_rate=mix_default_rate,
        domain_cap=domain_cap, domain_col=domain_col,
        dsir_target_types=dsir_target_types, dsir_top_k=dsir_top_k,
    )


def _stages_from_extracted(
    extracted: DataFrame,
    n_input: int,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = (),
    near_dup_min_matches: int = 12,
    coefs=tuple(MH_COEFS_16),
    band_rows: int = 4,
    hot_bucket_cap: int | None = 1000,
    shingle_n: int = 3,
    benchmark: DataFrame | None = None,
    decontam_min_shared: int = 2,
    decontam_shingle_n: int = 3,
    mix_rates: dict[str, float] | None = None,
    mix_default_rate: float = 1.0,
    domain_cap: int | None = None,
    domain_col: str = "content_type",
    dsir_target_types: tuple[str, ...] = (),
    dsir_top_k: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Gate -> dedup -> (decontam) -> (domain cap) -> (DSIR select) ->
    (mix) over an already-materialized extracted frame (columns: doc_id,
    spans, is_valid, text, quality, lang_guess, ...). Shared by
    clean_corpus (in-session checkpoint) and run_clean_corpus (durable
    staged table).

    DSIR stage (both knobs required): documents whose ``domain_col`` is
    in ``dsir_target_types`` form the curated target sample and pass
    through; the rest of the surviving pool is ranked by the hashed-ngram
    log importance ratio against that target (operators/dsir, Xie et al.
    2023) and only the top ``dsir_top_k`` survive — "keep the k most
    target-like documents" as a pipeline stage. Funnel stage
    ``after_dsir``."""
    spark = extracted.sparkSession
    gate = F.col("is_valid") & (F.col("quality") >= min_quality)
    if langs:
        gate = gate & F.col("lang_guess").isin(*langs)

    # slim doc-level projection OF THE CACHE (InMemoryTableScan prunes to
    # these columns; the span arrays never ride a shuffle)
    slim_cols = ["doc_id", "text", "lang_guess"]
    if domain_cap is not None or (dsir_target_types and dsir_top_k):
        slim_cols.append(domain_col)
    if domain_cap is not None:
        slim_cols.append("quality")
    slim = extracted.select(*slim_cols, gate.alias("gate_ok"))
    gated = slim.where("gate_ok")

    # exact dedup: keep the smallest doc_id per content fingerprint
    w = W.partitionBy(fingerprint("text", 200)).orderBy("doc_id")
    winners = (
        gated.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "text")
    )
    # r6 third pass, measured: AQE coalesces the window's exchange to ONE
    # partition at local scale, so the MinHash signature map work
    # (shingle explode + K mins — the expensive per-doc stage downstream)
    # ran serialized (tp2's sigs-checkpoint stage: 1 task, ~1.4 s warm).
    # Round-robin to the session's shuffle width: every consumer of
    # ``winners`` is integer/hash-domain (signature mins, band joins,
    # funnel count sums — all commutative) or a key join, so the layout
    # is value-invisible; width follows spark.sql.shuffle.partitions.
    # Env toggle exists for the same-session A/B harness only.
    import os as _os

    _mode = _os.environ.get("SPARK_GRAFT_SPREAD_WINNERS", "ckpt")
    if _mode in ("1", "ckpt"):
        n_spread = int(spark.conf.get("spark.sql.shuffle.partitions"))
        winners = winners.repartition(n_spread)
        if _mode == "ckpt":
            winners = winners.localCheckpoint(eager=False)

    # near-dup dedup: LSH candidates -> connected components -> keep the
    # component's canonical (minimum) doc_id
    pairs = minhash_lsh_pairs(
        winners, "doc_id", "text",
        min_matches=near_dup_min_matches, coefs=coefs, band_rows=band_rows,
        hot_bucket_cap=hot_bucket_cap, shingle_n=shingle_n,
    )
    clusters = duplicate_clusters(pairs)  # checkpoint-backed flat scan
    losers = clusters.where(F.col("cluster_id") != F.col("doc_id")).select("doc_id")

    # optional decontamination: contaminated ids are bounded by benchmark
    # similarity, a tiny set — broadcast is safe here (unlike the loser
    # set, which can be a large fraction of the corpus)
    contam = None
    if benchmark is not None:
        survivors = winners.join(losers, "doc_id", "left_anti")
        contam = (
            benchmark_overlap(
                survivors,
                benchmark,
                n=decontam_shingle_n,
                min_shared=decontam_min_shared,
            )
            .select(F.col("train_id").alias("doc_id"))
            .distinct()
            # tiny (bounded by benchmark similarity, not corpus size) and
            # consumed twice (funnel flags + final keep): materialize once
            # so the shingle join doesn't run twice
            .localCheckpoint()
        )

    # optional per-domain cap (crawl "at most k docs per domain", here k
    # best-by-quality per content_type): grouped_topk keeps each task's
    # best k per domain map-side, so no WindowExec ever sorts a
    # mega-domain and the exchange carries tasks*k rows per domain. The
    # kept-id table is domains*k rows — bounded by the cap, not the
    # corpus — and joins back as one more per-doc flag.
    cap_kept = None
    if domain_cap is not None:
        from ..operators.topk import grouped_topk

        cap_src = slim.where("gate_ok").select(
            "doc_id", domain_col, (-F.col("quality")).alias("_negq")
        )
        cap_src = cap_src.join(winners.select("doc_id"), "doc_id", "left_semi")
        cap_src = cap_src.join(losers, "doc_id", "left_anti")
        if contam is not None:
            cap_src = cap_src.join(F.broadcast(contam), "doc_id", "left_anti")
        cap_kept = grouped_topk(
            cap_src, domain_col, ["_negq", "doc_id"], domain_cap
        ).select("doc_id")

    # optional DSIR selection: target-type docs pass through, the rest of
    # the surviving pool keeps only the top-k by importance ratio. The
    # kept-id table is (n_target + k) ids — the models are <=2*B rows and
    # broadcast inside dsir_logweights; raw text rides only the one
    # tokenize pass.
    dsir_kept = None
    if dsir_target_types and dsir_top_k:
        from ..operators.dsir import dsir_logweights

        pool = slim.where("gate_ok").select("doc_id", "text", domain_col)
        pool = pool.join(winners.select("doc_id"), "doc_id", "left_semi")
        pool = pool.join(losers, "doc_id", "left_anti")
        if contam is not None:
            pool = pool.join(F.broadcast(contam), "doc_id", "left_anti")
        if cap_kept is not None:
            pool = pool.join(cap_kept, "doc_id", "left_semi")
        tgt = F.col(domain_col).isin(*dsir_target_types)
        topk = (
            dsir_logweights(pool, tgt, "doc_id", "text")
            .orderBy(F.col("logw").desc(), "doc_id")
            .limit(dsir_top_k)
            .select("doc_id")
        )
        dsir_kept = topk.union(pool.where(tgt).select("doc_id"))

    # optional stratified mixing — a pure Column flag, no extra pass
    sampled = (
        sample_keep_expr("lang_guess", mix_rates, "doc_id", mix_default_rate)
        if mix_rates is not None
        else F.lit(True)
    )

    # action 2: remaining funnel stages in ONE aggregate over per-doc flags
    flags = (
        slim.join(
            winners.select("doc_id", F.lit(True).alias("is_winner")),
            "doc_id",
            "left",
        ).join(
            losers.select("doc_id", F.lit(True).alias("is_loser")), "doc_id", "left"
        )
    )
    if contam is not None:
        flags = flags.join(
            F.broadcast(contam.select("doc_id", F.lit(True).alias("is_contam"))),
            "doc_id",
            "left",
        )
    else:
        flags = flags.withColumn("is_contam", F.lit(False))
    if cap_kept is not None:
        flags = flags.join(
            cap_kept.select("doc_id", F.lit(True).alias("is_cap_kept")),
            "doc_id",
            "left",
        )
    else:
        flags = flags.withColumn("is_cap_kept", F.lit(True))
    if dsir_kept is not None:
        flags = flags.join(
            dsir_kept.select("doc_id", F.lit(True).alias("is_dsir_kept")),
            "doc_id",
            "left",
        )
    else:
        flags = flags.withColumn("is_dsir_kept", F.lit(True))
    is_winner = F.coalesce("is_winner", F.lit(False))
    is_loser = F.coalesce("is_loser", F.lit(False))
    is_kept = is_winner & ~is_loser & ~F.coalesce("is_contam", F.lit(False))
    is_capped = is_kept & F.coalesce("is_cap_kept", F.lit(False))
    is_selected = is_capped & F.coalesce("is_dsir_kept", F.lit(False))
    agg = flags.agg(
        F.sum(F.col("gate_ok").cast("long")).alias("extracted_valid"),
        F.sum(is_winner.cast("long")).alias("after_exact_dedup"),
        F.sum((is_winner & ~is_loser).cast("long")).alias("after_near_dedup"),
        F.sum(is_kept.cast("long")).alias("after_decontam"),
        F.sum(is_capped.cast("long")).alias("after_domain_cap"),
        F.sum(is_selected.cast("long")).alias("after_dsir"),
        F.sum((is_selected & sampled).cast("long")).alias("after_mix"),
    ).collect()[0]
    counts = {
        "input": n_input,
        "extracted_valid": agg["extracted_valid"],
        "after_exact_dedup": agg["after_exact_dedup"],
        "after_near_dedup": agg["after_near_dedup"],
    }
    if benchmark is not None:
        counts["after_decontam"] = agg["after_decontam"]
    if domain_cap is not None:
        counts["after_domain_cap"] = agg["after_domain_cap"]
    if dsir_kept is not None:
        counts["after_dsir"] = agg["after_dsir"]
    if mix_rates is not None:
        counts["after_mix"] = agg["after_mix"]
    funnel = spark.createDataFrame(
        [(k, v) for k, v in counts.items()], "stage string, n long"
    )

    keep = winners.join(losers, "doc_id", "left_anti")
    if contam is not None:
        keep = keep.join(F.broadcast(contam), "doc_id", "left_anti")
    if cap_kept is not None:
        keep = keep.join(cap_kept, "doc_id", "left_semi")
    if dsir_kept is not None:
        keep = keep.join(dsir_kept, "doc_id", "left_semi")
    if mix_rates is not None:
        keep = keep.join(slim.select("doc_id", "lang_guess"), "doc_id").where(sampled)
    cleaned = extracted.join(keep.select("doc_id"), "doc_id", "left_semi")
    return cleaned, funnel


def run_clean_corpus(
    spark,
    docs: DataFrame,
    out_root: str,
    run_id: str,
    cfg: CriteriaConfig | None = None,
    n_buckets: int = 32,
    buckets_per_commit: int = 8,
    fail_after_commits: int | None = None,
    split_fractions: tuple[tuple[str, float], ...] | None = None,
    export_shards_n: int | None = None,
    **stage_kw,
) -> dict:
    """Durable, resumable form of the nightly pipeline — the actual 100 TB
    shape: extraction is staged to the catalog's ``extracted`` table with
    per-bucket-group idempotent commits (plans.lineage.run_extraction, so
    a crash resumes at bucket granularity and never re-extracts committed
    work), then the dedup/gate/decontam/mix stages read the STAGED table
    back — the durable analog of clean_corpus's in-session checkpoint —
    and land ``cleaned`` + ``funnel`` tables under run-scoped idempotent
    commit ids (a rerun of a completed run no-ops every commit: same
    funnel, no duplicate rows). ``stage_kw`` forwards to
    :func:`_stages_from_extracted` (min_quality, langs, benchmark,
    mix_rates, ...).
    """
    from ..sources.io_catalog import Catalog
    from .lineage import run_extraction

    summary = run_extraction(
        spark, docs, out_root, run_id,
        n_buckets=n_buckets, buckets_per_commit=buckets_per_commit,
        cfg=cfg, fail_after_commits=fail_after_commits,
    )
    catalog = Catalog(out_root)
    staged = catalog.table("extracted").read(spark)
    extracted = (
        staged.withColumn("text", extracted_text("spans"))
        .withColumn("quality", quality_score("text"))
        .withColumn("lang_guess", lang_guess("text"))
        .localCheckpoint(eager=False)
    )
    n_input = extracted.count()
    cleaned, funnel = _stages_from_extracted(extracted, n_input, **stage_kw)

    catalog.table("cleaned").append(
        cleaned.drop("text"), commit_id=f"{run_id}-cleaned"
    )
    catalog.table("funnel").append(
        funnel.withColumn("run_id", F.lit(run_id)).coalesce(1),
        commit_id=f"{run_id}-funnel",
    )
    summary["funnel"] = {
        r["stage"]: int(r["n"]) for r in funnel.collect()
    }

    # optional durable tail: deterministic split + shard export.  The
    # shard contents are a pure function of the cleaned ids, so a re-run
    # would rewrite identical shards; the _MANIFEST.json marker turns
    # that into an explicit no-op (resume semantics matching the commit
    # tables), and Spark readers ignore underscore-prefixed files.
    if split_fractions or export_shards_n:
        import json as _json
        import os as _os

        from ..operators.export import export_shards
        from ..operators.sampling import hash_split

        fr = split_fractions or (("train", 1.0),)
        final = cleaned.drop("text").select("*", hash_split("doc_id", fr))
        summary["splits"] = {}
        for name, _frac in fr:
            sdir = _os.path.join(out_root, "shards", name)
            marker = _os.path.join(sdir, "_MANIFEST.json")
            if _os.path.exists(marker):
                with open(marker) as fh:
                    man = _json.load(fh)
                resumed = True
            else:
                man = export_shards(
                    final.where(F.col("split") == name).drop("split"),
                    sdir,
                    n_shards=export_shards_n or 16,
                )
                with open(marker, "w") as fh:
                    _json.dump(man, fh)
                resumed = False
            summary["splits"][name] = {
                "n_docs": sum(m["n_docs"] for m in man),
                "n_shards": len(man),
                "resumed": resumed,
            }
    return summary
