"""Deduplication queries over ``documents`` (SURVEY.md §2.7 [EXT]).

Five dedup families from :mod:`unimib_simpss_spark.operators.dedup`:
exact hash-groupBy, token-set fingerprint, inverted-index n-gram
Jaccard, MinHash+LSH band join, and SimHash pigeonhole band join. The
LSH/band variants are the 100 TB scale paths — candidate generation is
a bucket equi-join, never an all-pairs product. Oracles are generated
from the same constants, so thresholds/coefficients can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unimib_simpss_spark.catalog import load_table
from unimib_simpss_spark.operators import dedup as D
from unimib_simpss_spark.plans.registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _dedup_groups_oracle() -> str:
    return f"""
    SELECT 'exact' AS family, group_key, keep_id, n_copies
    FROM ({D.exact_dedup_sql()} ) e(group_key, keep_id, n_copies)
    UNION ALL
    SELECT 'fingerprint' AS family, group_key, keep_id, n_copies
    FROM ({D.fingerprint_dedup_sql()} ) f(group_key, keep_id, n_copies)
    """


@query("q31_dedup_groups", oracle=_dedup_groups_oracle())
def q31_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups (md5 of normalized text → keeper id + copy
    count) unioned with token-set fingerprint dedup groups (catches
    word-order shuffles), tagged by family — both are one-shuffle
    hash-groupBy plans over the same scan (merged from the former
    q31/q32 to free a slot in the driver's 50-query window)."""
    docs = _docs(spark, sf_dir)
    exact = D.exact_dedup_groups(docs).select(
        F.lit("exact").alias("family"),
        F.col("text_hash").alias("group_key"),
        "keep_id",
        "n_copies",
    )
    fp = D.fingerprint_dedup_groups(docs).select(
        F.lit("fingerprint").alias("family"),
        F.col("fingerprint").alias("group_key"),
        "keep_id",
        "n_copies",
    )
    return exact.unionAll(fp)


@query("q33_jaccard_pairs", oracle=D.jaccard_pairs_sql(threshold=0.8))
def q33_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard ≥ 0.8 pairs via inverted-index self-join."""
    return D.jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


def _hash_band_pairs_oracle() -> str:
    return f"""
    SELECT 'minhash' AS family, doc1, doc2, jaccard AS score
    FROM ({D.minhash_dedup_sql(threshold=0.8)})
    UNION ALL
    SELECT 'simhash' AS family, doc1, doc2, CAST(hamming AS DOUBLE) AS score
    FROM ({D.simhash_sql(max_hamming=3)})
    """


@query("q34_hash_band_pairs", oracle=_hash_band_pairs_oracle())
def q34_hash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two hash-band near-dup miners, tagged by family (merged from
    the former q34/q35 to fit the driver's 50-query window): ``minhash``
    = MinHash+LSH candidates (4 bands × 4 rows) verified by exact
    Jaccard (score = jaccard), ``simhash`` = SimHash pigeonhole band
    join, exact for hamming ≤ 3 (score = hamming). Both generate
    candidates via band-bucket equi-joins — the sub-quadratic 100 TB
    dedup paths, never an all-pairs product."""
    docs = _docs(spark, sf_dir)
    mh = D.minhash_dedup_pairs(docs, threshold=0.8).select(
        F.lit("minhash").alias("family"),
        "doc1",
        "doc2",
        F.col("jaccard").alias("score"),
    )
    sh = D.simhash_pairs(docs, max_hamming=3).select(
        F.lit("simhash").alias("family"),
        "doc1",
        "doc2",
        F.col("hamming").cast("double").alias("score"),
    )
    return mh.unionAll(sh)


@query(
    "q38_decontamination",
    oracle=D.decontaminate_sql(bench_pred_sql="doc_id % 97 = 0"),
)
def q38_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: treat every 97th doc as held-out eval
    data and flag training docs sharing ≥1 distinct 4-gram with any of
    them (inverted-index equi-join on the gram, AQE-broadcast bench
    side) — the eval-leakage gate an LLM pipeline runs before training.
    """
    return D.decontaminate(
        _docs(spark, sf_dir), is_benchmark=(F.col("doc_id") % 97 == 0)
    )


@query("q59_dedup_clusters", oracle=D.dedup_clusters_sql(threshold=0.8))
def q59_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → clusters: connected components over the exact Jaccard
    ≥ 0.8 pair graph (iterative min-label propagation, lineage
    checkpointed per round), every doc tagged with component id +
    cluster size. The missing last step of dedup: q33-q35 mine pairs,
    this picks the survivors (keep = doc_id == component)."""
    from unimib_simpss_spark.operators.caching import release_result

    docs = _docs(spark, sf_dir)
    pairs = D.jaccard_pairs(docs, threshold=0.8)
    clusters = D.dedup_clusters(docs, pairs)
    release_result(pairs)  # clusters is materialized; the pair graph is spent
    return clusters


@query("q61_incremental_dedup", oracle=D.incremental_dedup_sql(threshold=0.8))
def q61_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: treat every 5th doc as the incoming
    batch and report which of them near-duplicate (Jaccard >= 0.8) the
    existing corpus — the per-batch dedup gate of an append-only
    training-data pipeline, composed from the same verified pair miner
    as q33."""
    docs = _docs(spark, sf_dir)
    return D.incremental_dedup_pairs(
        docs, is_new=(F.col("doc_id") % 5 == 0), threshold=0.8
    )


def _corpus_pipeline_oracle() -> str:
    from unimib_simpss_spark.functions.analysis import (
        quality_score_sql,
        token_count_ws_sql,
    )
    from unimib_simpss_spark.operators.sampling import split_assignment_sql

    qs = quality_score_sql("text")
    clusters = D.dedup_clusters_sql(threshold=0.8, where_sql=f"{qs} >= 0.5")
    case = split_assignment_sql("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    ws = token_count_ws_sql("text")
    return f"""
    WITH surv AS (
        SELECT d.doc_id, d.text
        FROM ({clusters}) c JOIN documents d ON c.doc_id = d.doc_id
        WHERE c.doc_id = c.component
    )
    SELECT {case}            AS split,
           count(*)          AS n_docs,
           CAST(sum({ws}) AS BIGINT) AS sum_ws_tokens,
           round(avg({qs.replace('text', 'surv.text')}), 4) AS avg_quality
    FROM surv
    GROUP BY split
    """


@query("q62_corpus_pipeline", oracle=_corpus_pipeline_oracle())
def q62_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone documents-in → training-corpus-out pipeline, composed
    entirely from verified operators: quality filter (>= 0.5) → exact
    near-dup clustering → canonical-survivor selection → deterministic
    train/val/test split → per-split corpus stats. Every stage is
    collect-free and keyed. Note: the pair-mining + clustering stages
    execute EAGERLY at construction time (they checkpoint so their
    O(corpus) caches can be released deterministically); the stages
    after the cluster relation stay lazy."""
    from unimib_simpss_spark.functions import analysis as A
    from unimib_simpss_spark.operators.sampling import split_assignment

    from unimib_simpss_spark.operators.caching import release_result

    docs = _docs(spark, sf_dir)
    docs_q = docs.where(A.quality_score("text") >= 0.5)
    pairs = D.jaccard_pairs(docs_q, threshold=0.8)
    clusters = D.dedup_clusters(docs_q, pairs)
    release_result(pairs)  # clusters is materialized; the pair graph is spent
    surv = docs_q.join(
        clusters.where(F.col("doc_id") == F.col("component")).select("doc_id"),
        "doc_id",
    )
    return (
        surv.select(
            split_assignment("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}),
            A.token_count_ws("text").alias("ws"),
            A.quality_score("text").alias("q"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("sum_ws_tokens"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
        )
    )
