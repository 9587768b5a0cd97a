"""Corpus-curation operators: n-gram LM scoring and per-source capping
(SURVEY.md §2.7 [EXT]).

Two standard knobs from large-scale training-data pipelines that the
quality/dedup operators don't cover:

- **Bigram LM scoring** (perplexity-proxy quality filter): score each
  document by the mean log-probability of its word bigrams under the
  corpus's own unigram-of-bigrams model. The cheap stand-in for a
  KenLM-style LM filter — documents whose n-grams are globally rare
  score low and get culled.
- **Per-source cap** (domain capping): bound any single source's
  contribution to the corpus by keeping a deterministic, hash-ordered
  top-``quota`` per source. Prevents one crawl domain from dominating
  the training mix; stable under reruns and appends of other sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Explode whitespace-token bigrams: (id, w1, w2), one row per
    adjacent token pair.

    Pairs are built INSIDE the token array (``transform`` over index +
    ``element_at``) before the explode, so adjacency never needs a
    per-document window — the naive posexplode + ``lead()`` formulation
    costs a full shuffle + sort just to see each token's neighbor that
    the source row already held. This version is narrow-only (scan →
    project → generate), which also lets Spark recompute it cheaply
    wherever the plan references it twice.

    ``greatest(size-1, 1)`` keeps ``sequence`` ascending for 1-token
    docs; the phantom pair it creates has a NULL w2 (``element_at`` past
    the end) and is filtered inside the array — split() can never emit
    a NULL token, so NULL w2 exactly identifies the phantom.
    """
    l = F.split(F.col(text_col), " ")
    pairs = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(l) - 1, F.lit(1))),
            lambda i: F.struct(
                F.element_at(l, i).alias("w1"),
                F.element_at(l, i + F.lit(1)).alias("w2"),
            ),
        ),
        lambda p: p["w2"].isNotNull(),
    )
    return (
        docs.select(F.col(id_col), F.explode(pairs).alias("pair"))
        .select(F.col(id_col), F.col("pair.w1").alias("w1"), F.col("pair.w2").alias("w2"))
    )


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", ndigits: int = 3
) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus model.

    Plan: mine bigrams (narrow-only, see :func:`doc_bigrams`) → count
    per distinct bigram (one shuffle, map-side combinable) → join
    scores back on the bigram key (AQE broadcasts the count table when
    it fits, skew-splits when one bigram dominates) → per-document
    average (second combinable shuffle). The corpus total is
    ``sum(cnt)`` over the already-aggregated count relation — NOT a
    third pass over the raw bigrams — and rides along as a broadcast
    1-row cross join; no driver-side collect anywhere.

    At 100 TB the count table is the corpus's distinct-bigram relation;
    if even that is too hot, swap the exact counts for a count-min
    sketch or a top-K LM — the scoring join is unchanged.
    """
    bi = doc_bigrams(docs, id_col=id_col, text_col=text_col)
    counts = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total_bigrams"))
    return (
        bi.join(counts, ["w1", "w2"])
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("cnt") / F.col("total_bigrams"))), ndigits
            ).alias("avg_logp"),
        )
    )


def source_cap(
    docs: DataFrame,
    quota: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-source cap: keep the hash-ordered first
    ``quota`` documents of each source.

    Ordering by ``md5(id)`` (id tiebreak) makes the kept set a uniform,
    rerun-stable sample — appending documents to OTHER sources never
    changes a source's picks, and appending to the same source only
    swaps picks where the new hashes sort earlier. One shuffle on the
    group key; per-group state is a row_number counter. Skewed sources
    are exactly the ones the cap truncates, so the window never ranks
    more than it must at scale (pair with AQE skew handling if one
    source is pathological).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= quota)
        .select(group_col, id_col, "rk")
    )
