"""Hashed-feature logistic-regression quality classifier, trained
in-engine (SURVEY.md §2.7 [EXT]).

The learned counterpart of the heuristic quality filters: large-scale
pipelines train a lightweight linear classifier (CCNet/fastText shape —
hashed n-gram bag, logistic loss) on "good vs raw" labels and filter by
its score. This module trains one with NOTHING but DataFrame ops:

- the hashed-feature relation ``(doc_id, bucket, x)`` is built ONCE
  (one combinable shuffle) and persisted across iterations — features
  are token frequencies hashed into ``n_features`` buckets (+ a bias
  bucket), so the relation is corpus-tokens-sized pre-agg and
  (docs × distinct-buckets)-sized after;
- each full-batch gradient-descent step is pure relational algebra:
  broadcast-join the D-row weight relation onto the feature relation,
  per-doc margin via one combinable groupBy, logistic gradient back
  onto buckets via a second combinable groupBy, and a D-row collect —
  the driver holds only the weight vector (D+1 floats), never a row
  of data;
- the collected gradient is rounded to 1e-9 per step, so float
  sum-order noise (last-ulp, partition-arrival-dependent) cannot
  accumulate across iterations: training is deterministic in practice
  at any partitioning.

At 100 TB: the feature mine is one shuffle; per step the weight
relation (D rows) broadcasts and both aggregates are map-side
combinable. Steps × 2 shuffles total, bounded driver. The reference
(PCampi/unimib-simpss) has no ML surface; this extends its per-message
validity gate (kafka_consumer/consumer.py:60-75) to a learned
admission score, the way production corpus pipelines do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIAS = -1  # bucket id reserved for the intercept


def hashed_features(
    docs: DataFrame,
    n_features: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(id, bucket, x): token-frequency bag hashed into ``n_features``
    buckets plus a constant bias feature (bucket −1, x=1). Frequencies
    (counts / doc token count) keep every feature in [0, 1], bounding
    the logistic gradient so a fixed step size is safe.

    ``portable=True`` buckets with the engine-agnostic md5 hash
    (functions/hashing.py) instead of xxhash64 — slower, but the
    trained weights then score identically in any engine exposing md5
    (the shared-hash-space recipe the dedup miners use), which is what
    lets :func:`logistic_score_expr` carry a DuckDB oracle."""
    from unimib_simpss_spark.functions.hashing import hash64

    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "")
    bucket = F.pmod(
        hash64(F.col("token")) if portable else F.xxhash64("token"),
        F.lit(n_features),
    )
    counts = (
        tok.select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = counts.groupBy(id_col).agg(F.sum("cnt").alias("tot"))
    feat = counts.join(tot, id_col).select(
        id_col, "bucket", (F.col("cnt") / F.col("tot")).alias("x")
    )
    bias = docs.select(
        F.col(id_col), F.lit(_BIAS).cast("long").alias("bucket"), F.lit(1.0).alias("x")
    )
    return feat.unionAll(bias)


def logistic_train(
    docs: DataFrame,
    label: Column,
    n_features: int = 1024,
    iters: int = 8,
    lr: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
):
    """Full-batch logistic regression on hashed token features.

    Returns ``(weights, losses)``: ``weights`` maps bucket → weight
    (bias under bucket −1), ``losses`` is the per-iteration mean log
    loss (strictly decreasing for convex full-batch GD at a safe step
    — property-tested). Driver memory: D+1 floats + iters losses.

    ONE action per iteration: the mean log loss rides the gradient
    aggregate as the bias bucket's ``avg(ll)`` — the bias feature
    (bucket −1, x=1) appears exactly once per labeled doc in the
    feats⋈resid join, so its group averages the per-doc log loss with
    no second job over the residuals (and no resid persist at all).

    Rows whose label expression is NULL are dropped BEFORE the feature
    mine AND before counting: the tokenize-explode shuffle, the
    persisted feature relation, and every iteration's join only ever
    carry rows that contribute to the aggregates (a NULL-heavy label
    would otherwise pay the mine for dead rows and silently shrink the
    effective step / skew the loss denominator).
    """
    spark = docs.sparkSession
    train_docs = docs.where(label.cast("double").isNotNull())
    labeled = train_docs.select(
        F.col(id_col), label.cast("double").alias("y")
    )
    feats = hashed_features(
        train_docs, n_features=n_features, id_col=id_col, text_col=text_col,
        portable=portable,
    ).persist()
    n_docs = labeled.count()
    if n_docs == 0:
        feats.unpersist()
        raise ValueError("logistic_train: no rows with a non-NULL label")
    w: dict[int, float] = {}
    losses: list[float] = []
    try:
        for _ in range(iters):
            if w:
                wdf = F.broadcast(
                    spark.createDataFrame(
                        [(int(k), float(v)) for k, v in sorted(w.items())],
                        "bucket long, w double",
                    )
                )
                scored = feats.join(wdf, "bucket", "left").select(
                    id_col, "bucket", "x",
                    (F.coalesce(F.col("w"), F.lit(0.0)) * F.col("x")).alias("wx"),
                )
            else:
                scored = feats.select(
                    id_col, "bucket", "x", F.lit(0.0).alias("wx")
                )
            z = scored.groupBy(id_col).agg(F.sum("wx").alias("z"))
            p = z.join(labeled, id_col).select(
                id_col,
                "y",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))).alias("p"),
            )
            # one pass: mean log loss + the per-doc residual for the grad
            ll = -(
                F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                + (1.0 - F.col("y"))
                * F.log(F.greatest(1.0 - F.col("p"), F.lit(1e-12)))
            )
            resid = p.select(
                id_col,
                (F.col("p") - F.col("y")).alias("r"),
                ll.alias("ll"),
            )
            # single action: gradient per bucket + mean log loss (read
            # off the bias bucket, which joins exactly once per doc)
            agg_rows = (
                feats.join(resid, id_col)
                .groupBy("bucket")
                .agg(
                    (F.sum(F.col("r") * F.col("x")) / n_docs).alias("g"),
                    F.avg("ll").alias("mll"),
                )
                .collect()
            )
            losses.append(
                next(row.mll for row in agg_rows if row.bucket == _BIAS)
            )
            for row in agg_rows:
                # round: sum-order noise must not compound across iters
                w[row.bucket] = round(
                    w.get(row.bucket, 0.0) - lr * row.g, 9
                )
    finally:
        feats.unpersist()
    return w, losses


def logistic_score(
    docs: DataFrame,
    weights: dict[int, float],
    n_features: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
    portable: bool = False,
) -> DataFrame:
    """Score documents under a trained model: ``(id, score)`` with
    score = σ(w·x) rounded. Map + one combinable groupBy; the weight
    relation broadcasts (D rows). ``portable`` must match how the
    model was trained (see :func:`hashed_features`)."""
    spark = docs.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(int(k), float(v)) for k, v in sorted(weights.items())],
            "bucket long, w double",
        )
    )
    z = (
        hashed_features(
            docs, n_features=n_features, id_col=id_col, text_col=text_col,
            portable=portable,
        )
        .join(wdf, "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("x")).alias("z"))
    )
    return z.select(
        id_col,
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), ndigits).alias(
            "score"
        ),
    )


def logistic_score_expr(
    tokens_col: Column,
    weights,
    bias: float,
    ndigits: int = 6,
) -> Column:
    """Score under a FIXED pre-trained model as ONE pure Column
    expression over an already-bound token-array column:
    ``σ(bias + Σ_t w[h(t) mod D] / n_tokens)`` with the portable md5
    bucket hash and ``weights`` a dense D-float list.

    This is the inference fast path — no explode, no join, no shuffle:
    scoring rides whatever projection already tokenized the doc (q29's
    one-scan profile), so a 100 TB scoring pass is map-only. The D
    weights travel as an array literal in the plan; the left-to-right
    ``F.aggregate`` fold matches DuckDB's ``list_reduce`` in
    :func:`logistic_score_sql` exactly, so scores are oracle-checkable.
    Empty docs fall back to ``σ(bias)``.
    """
    from unimib_simpss_spark.functions.hashing import hash64

    n_features = len(weights)
    warr = F.array(*[F.lit(float(v)) for v in weights])
    tsum = F.aggregate(
        tokens_col,
        F.lit(0.0),
        lambda acc, t: acc
        + F.element_at(
            warr, (F.pmod(hash64(t), F.lit(n_features)) + 1).cast("int")
        ),
    )
    n = F.size(tokens_col)
    z = F.lit(float(bias)) + F.when(n > 0, tsum / n).otherwise(F.lit(0.0))
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), ndigits)


def logistic_score_sql(
    tokens_expr: str,
    weights,
    bias: float,
    ndigits: int = 6,
) -> str:
    """DuckDB twin of :func:`logistic_score_expr` — same bucket hash,
    same dense weight list (1-based list literal), same sequential
    left-to-right fold (``list_reduce`` with a prepended 0.0 seed, so
    float addition order is bit-identical to Spark's ``F.aggregate``)."""
    from unimib_simpss_spark.functions.hashing import hash64_sql

    n_features = len(weights)
    wlist = "[" + ", ".join(repr(float(v)) for v in weights) + "]"
    tsum = (
        f"list_reduce(list_prepend(0.0, list_transform({tokens_expr}, "
        f"t -> ({wlist})[({hash64_sql('t')} % {n_features}) + 1])), "
        "(a, x) -> a + x)"
    )
    n = f"len({tokens_expr})"
    z = f"({bias!r} + CASE WHEN {n} > 0 THEN {tsum} / {n} ELSE 0.0 END)"
    return f"round(1.0 / (1.0 + exp(-{z})), {ndigits})"
