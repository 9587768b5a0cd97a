"""Hybrid sparse retrieval: per-query n-gram overlap ranking and
Reciprocal Rank Fusion (RRF, Cormack/Clarke/Buettcher SIGIR 2009) —
the standard way an LLM data pipeline combines lexically different
rankers (BM25, n-gram overlap, embedding ANN) into one candidate list
without score calibration: each ranker contributes ``1 / (k + rank)``
and the fused list orders by the sum. Rank positions are comparable
across rankers when raw scores are not.

Scale shapes:

- :func:`ngram_overlap_topk` rides the same inverted-index equi-join
  as ``operators.dedup.decontaminate`` (share the shingle relation via
  ``_sg`` when both run): candidates ∝ gram collisions, never
  |train| × |bench|; the per-pair aggregate and the per-query top-k
  window both key on the (tiny) pair relation.
- :func:`rrf_fuse` touches only the rankers' TOP-K LISTS (a few rows
  per query), never the corpus: one union → one (query, doc) groupBy →
  one per-query window. At 100 TB the fused relation is
  queries × Σk rows — driver- and executor-trivial.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ngram_overlap_topk",
    "rrf_fuse",
    "ngram_overlap_sql",
    "rrf_fuse_sql",
    "ranking_metrics",
    "ranking_metrics_sql",
]

RRF_K = 60  # the SIGIR-2009 constant; dampens the head so one ranker's
#             #1 cannot dominate another's consistent top-5


def gram_collisions(sg: DataFrame) -> DataFrame:
    """The (doc_id, bench_id, g) gram-collision relation off a
    ``decon_shingles`` frame — the ONE inverted-index equi-join every
    decontamination-family ranker aggregates over. Build it once and
    cache it when several legs share it (q38 feeds both the doc-level
    'ngram' audit and the pair-level 'overlap' ranker from one join)."""
    bench = sg.where(F.col("is_bench")).select(
        F.explode("sg").alias("g"), F.col("doc_id").alias("bench_id")
    )
    train = sg.where(~F.col("is_bench")).select(
        "doc_id", F.explode("sg").alias("g")
    )
    return train.join(bench, "g").select("doc_id", "bench_id", "g")


def ngram_overlap_topk(
    docs: DataFrame,
    is_benchmark: Column,
    n: int | None = None,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    _sg: DataFrame | None = None,
    _collisions: DataFrame | None = None,
) -> DataFrame:
    """Per-BENCHMARK-doc top-``k`` TRAINING docs by distinct shared
    word ``n``-grams — the PAIR-granular form of
    ``operators.dedup.decontaminate`` (which aggregates over all bench
    docs): lexical-overlap retrieval, rank 1..k per bench doc by
    (shared grams DESC, doc_id ASC). Returns ``(bench_id, doc_id,
    n_shared, rank)``.

    Pass ``_sg`` (a cached ``decon_shingles`` relation) to share the
    one shingle pass — or ``_collisions`` (a cached
    :func:`gram_collisions` relation) to also share the inverted-index
    JOIN — with the other decontamination legs; the caller owns those
    caches. DuckDB twin: :func:`ngram_overlap_sql`."""
    from unimib_simpss_spark.operators.caching import (
        cache_intermediate,
        materialize_release,
    )
    from unimib_simpss_spark.operators.dedup import (
        DECON_NGRAM,
        decon_shingles,
    )

    # n defaults to DECON_NGRAM (review r13): the 'ngram' audit leg and
    # this ranker must retune TOGETHER — a hardcoded 4 here would
    # silently diverge from a retuned decontamination gram size
    if n is None:
        n = DECON_NGRAM
    own_sg = _sg is None and _collisions is None
    if _collisions is None:
        sg = (
            cache_intermediate(
                decon_shingles(docs, is_benchmark, n, text_col, id_col)
            )
            if own_sg
            else _sg
        )
        _collisions = gram_collisions(sg)
    pairs = _collisions.groupBy("bench_id", "doc_id").agg(
        F.count_distinct("g").alias("n_shared")
    )
    w = Window.partitionBy("bench_id").orderBy(
        F.desc("n_shared"), F.asc("doc_id")
    )
    out = (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("bench_id", "doc_id", "n_shared", "rank")
    )
    return materialize_release(out, *([sg] if own_sg else []))


def rrf_fuse(
    rankings: dict[str, DataFrame],
    topk: int = 5,
    k_const: int = RRF_K,
    query_col: str = "bench_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse named per-query ranked lists (each ``(query, doc, rank)``
    with rank 1-based) into RRF top-``topk`` per query:
    ``rrf_score = Σ_r 1 / (k_const + rank_r)`` over the rankers that
    listed the (query, doc) pair. Returns ``(query, doc, rrf_score,
    n_rankers, rank)`` ordered by (score DESC, doc ASC).

    The score is rounded to 6 dp BEFORE ranking so ordering (and the
    oracle hash) is engine-stable: each term is the same IEEE double on
    both engines and two-term sums commute exactly; the rounding
    absorbs the last-ulp association differences that three-plus-way
    sums can produce. DuckDB twin: :func:`rrf_fuse_sql`."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    legs = [
        df.select(
            F.col(query_col).alias("_q"),
            F.col(doc_col).alias("_d"),
            (F.lit(1.0) / (F.lit(float(k_const)) + F.col(rank_col))).alias(
                "_c"
            ),
        )
        for df in rankings.values()
    ]
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionAll(leg)
    w = Window.partitionBy("_q").orderBy(F.desc("rrf_score"), F.asc("_d"))
    return (
        u.groupBy("_q", "_d")
        .agg(
            F.round(F.sum("_c"), 6).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_rankers"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= topk)
        .select(
            F.col("_q").alias(query_col),
            F.col("_d").alias(doc_col),
            "rrf_score",
            "n_rankers",
            "rank",
        )
    )


# ------------------------------------------------------------ SQL twins
def ngram_overlap_sql(
    bench_pred_sql: str = "doc_id % 97 = 0", n: int | None = None,
    k: int = 20
) -> str:
    """DuckDB twin of :func:`ngram_overlap_topk` (``n`` defaults to
    ``DECON_NGRAM`` like the Spark form — both legs retune together)."""
    from unimib_simpss_spark.operators.dedup import DECON_NGRAM, shingles_sql

    if n is None:
        n = DECON_NGRAM
    sg = shingles_sql("text", n)
    return f"""
    WITH t AS (
        SELECT doc_id, ({bench_pred_sql}) AS is_bench, {sg} AS sg
        FROM documents
    ), tn AS (SELECT doc_id, is_bench, sg FROM t WHERE len(sg) > 0),
    bench AS (
        SELECT unnest(sg) AS g, doc_id AS bench_id FROM tn WHERE is_bench
    ), train AS (
        SELECT doc_id, unnest(sg) AS g FROM tn WHERE NOT is_bench
    ), pairs AS (
        SELECT bench_id, train.doc_id, count(DISTINCT train.g) AS n_shared
        FROM train JOIN bench ON train.g = bench.g
        GROUP BY bench_id, train.doc_id
    )
    SELECT bench_id, doc_id, n_shared, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY bench_id ORDER BY n_shared DESC, doc_id) AS BIGINT)
            AS rank
        FROM pairs
    ) WHERE rank <= {k}
    """


def rrf_fuse_sql(
    ranking_sqls: dict[str, str],
    topk: int = 5,
    k_const: int = RRF_K,
    query_col: str = "bench_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> str:
    """DuckDB twin of :func:`rrf_fuse`: each value of ``ranking_sqls``
    is a SELECT producing (query, doc, rank)."""
    assert ranking_sqls
    union = " UNION ALL ".join(
        f"SELECT {query_col} AS _q, {doc_col} AS _d, "
        f"1.0 / ({k_const} + {rank_col}) AS _c FROM ({sql})"
        for sql in ranking_sqls.values()
    )
    return f"""
    SELECT _q AS {query_col}, _d AS {doc_col}, rrf_score, n_rankers, rank
    FROM (
        SELECT _q, _d, rrf_score, n_rankers,
               CAST(row_number() OVER (
                   PARTITION BY _q ORDER BY rrf_score DESC, _d) AS BIGINT)
                   AS rank
        FROM (
            SELECT _q, _d, round(SUM(_c), 6) AS rrf_score,
                   COUNT(*) AS n_rankers
            FROM ({union})
            GROUP BY _q, _d
        )
    ) WHERE rank <= {topk}
    """


def ranking_metrics(
    run: DataFrame,
    qrels: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str = "rank",
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Retrieval evaluation — recall@k, MRR, and binary nDCG@k per
    query (the trec_eval triple): the gate that tells a pipeline
    whether its retriever (BM25, ANN, fused) is actually finding the
    judged-relevant documents before anyone trusts its candidates.

    ``run`` is a ranked list (query, doc, rank — 1-based); ``qrels``
    the judged-relevant (query, doc) pairs (binary relevance; rows
    with NULL keys drop, duplicates collapse). Conventions, stated
    because every one is an implementation choice a SQL twin must
    mirror:

    - only queries present in ``qrels`` are evaluated (trec_eval's
      rule); queries with judgments but no retrieved hits score 0;
    - duplicate (query, doc) rows in ``run`` collapse to their best
      rank before scoring (a ranker emitting dupes must not
      double-count DCG);
    - recall@k = hits_in_top_k / n_rel (uncapped denominator);
    - MRR = 1/rank of the first relevant hit in the top k, else 0;
    - nDCG@k with binary gains: DCG = Σ_hits ln(2)/ln(rank+1), IDCG =
      Σ_{i=1..min(k, n_rel)} ln(2)/ln(i+1) — the ln(2)/ln(x) form (≡
      1/log2(x)) is used VERBATIM on both engines because their
      native log2 implementations are not guaranteed the same ulp.

    Scale shape: everything operates on the top-k lists and the
    judgment relation — queries × k rows, never a corpus; the ideal-
    DCG table is a generated k×k triangle joined on min(k, n_rel).
    Output: ``(query_col, n_rel, n_hits, recall, mrr, ndcg)``.
    DuckDB twin: :func:`ranking_metrics_sql`."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = run.sparkSession
    rel = (
        qrels.where(
            F.col(query_col).isNotNull() & F.col(doc_col).isNotNull()
        )
        .select(F.col(query_col).alias("_q"), F.col(doc_col).alias("_d"))
        .distinct()
    )
    nrel = rel.groupBy("_q").agg(F.count(F.lit(1)).alias("n_rel"))
    # enforce the 1-based convention at execution (the house
    # _guarded_stats discipline): a 0-based ranker (row_number-1, an
    # array index) would otherwise count the hit in recall while its
    # DCG term ln(2)/ln(1) silently NULLs out and MRR reads 1/0-ish —
    # internally inconsistent metrics with no error anywhere
    rk = F.col(rank_col).cast("long")
    guarded = F.when(
        rk < 1,
        F.raise_error(
            F.lit(
                "ranking_metrics: rank must be 1-based (found a rank "
                "< 1 in the top-k window)"
            )
        ).cast("long"),
    ).otherwise(rk)
    topk = (
        run.where(F.col(rank_col).isNotNull() & (F.col(rank_col) <= k))
        .groupBy(
            F.col(query_col).alias("_q"), F.col(doc_col).alias("_d")
        )
        .agg(F.min(guarded).cast("long").alias("_r"))
    )
    term = F.log(F.lit(2.0)) / F.log((F.col("_r") + 1).cast("double"))
    per = (
        topk.join(rel, ["_q", "_d"])
        .groupBy("_q")
        .agg(
            F.count(F.lit(1)).alias("_hits"),
            F.min("_r").alias("_best"),
            F.sum(term).alias("_dcg"),
        )
    )
    # ideal DCG per possible n_rel (k rows): a sequence fold, not a
    # triangle join — a BNL over two range relations would trip the
    # interior plan lint even though it is k²-bounded
    ideal = spark.range(1, k + 1).select(
        F.col("id").alias("_n"),
        F.aggregate(
            F.sequence(F.lit(1).cast("long"), F.col("id")),
            F.lit(0.0),
            lambda acc, i: acc
            + F.log(F.lit(2.0)) / F.log((i + 1).cast("double")),
        ).alias("_idcg"),
    )
    return (
        nrel.join(per, "_q", "left")
        .join(
            F.broadcast(ideal),
            F.least(F.lit(k).cast("long"), F.col("n_rel")) == F.col("_n"),
        )
        .select(
            F.col("_q").alias(query_col),
            "n_rel",
            F.coalesce("_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("_hits", F.lit(0)).cast("double")
                / F.col("n_rel"),
                ndigits,
            ).alias("recall"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("_best"), F.lit(0.0)
                ),
                ndigits,
            ).alias("mrr"),
            F.round(
                F.coalesce("_dcg", F.lit(0.0)) / F.col("_idcg"), ndigits
            ).alias("ndcg"),
        )
    )


def ranking_metrics_sql(
    run_sql: str,
    qrels_sql: str,
    query_expr: str = "query",
    doc_expr: str = "doc",
    rank_expr: str = "rank",
    k: int = 10,
    ndigits: int = 6,
) -> str:
    """DuckDB twin of :func:`ranking_metrics` — identical conventions
    and the identical ln(2)/ln(x) DCG term; the query column is
    emitted as ``query``. (The twin has no loud 1-based-rank guard —
    the batch operator raises on rank < 1 at execution; the oracle
    contract covers valid input only, the quantile_drift_sql
    precedent.)"""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return f"""
    WITH rel AS (
        SELECT DISTINCT ({query_expr}) AS q, ({doc_expr}) AS d
        FROM ({qrels_sql})
        WHERE ({query_expr}) IS NOT NULL AND ({doc_expr}) IS NOT NULL
    ),
    nrel AS (SELECT q, count(*) AS n_rel FROM rel GROUP BY q),
    topk AS (
        SELECT ({query_expr}) AS q, ({doc_expr}) AS d,
               CAST(min({rank_expr}) AS BIGINT) AS r
        FROM ({run_sql})
        WHERE ({rank_expr}) IS NOT NULL AND ({rank_expr}) <= {k}
        GROUP BY 1, 2
    ),
    per AS (
        SELECT topk.q, count(*) AS hits, min(r) AS best,
               sum(ln(2.0) / ln(CAST(r + 1 AS DOUBLE))) AS dcg
        FROM topk JOIN rel ON topk.q = rel.q AND topk.d = rel.d
        GROUP BY topk.q
    ),
    ideal AS (
        SELECT n.n, sum(ln(2.0) / ln(CAST(i.i + 1 AS DOUBLE))) AS idcg
        FROM range(1, {k + 1}) n(n), range(1, {k + 1}) i(i)
        WHERE i.i <= n.n GROUP BY n.n
    )
    SELECT nrel.q AS query, n_rel,
           CAST(coalesce(hits, 0) AS BIGINT) AS n_hits,
           round(CAST(coalesce(hits, 0) AS DOUBLE) / n_rel, {ndigits})
               AS recall,
           round(coalesce(1.0 / best, 0.0), {ndigits}) AS mrr,
           round(coalesce(dcg, 0.0) / idcg, {ndigits}) AS ndcg
    FROM nrel
    LEFT JOIN per ON nrel.q = per.q
    JOIN ideal ON LEAST({k}, n_rel) = ideal.n
    """
