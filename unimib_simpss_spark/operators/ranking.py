"""Window-free top-k ranking: the shared micro-pattern behind the skew
profiler's hot keys, the CMS heavy hitters, and the vocabulary coverage
curve.

Ranking a GLOBAL top-k with ``row_number()`` needs a partition-less
window — all rows to one task and a scary ``WindowExec`` warning even
when the input is already limited. This helper ranks the other way:
``orderBy().limit(k)`` fuses into ``TakeOrderedAndProject`` (never a
full sort), then rank = the count of rows sorting before-or-equal via a
broadcast self-join over the ≤ k surviving rows (≤ k² joined rows —.
trivial by construction). The running sum rides the same aggregate.

Requires a TOTAL order: ``val_col`` descending with ``key_col`` as a
unique ascending tie-break — with ties-with-equal-keys impossible, the
before-or-equal count is exactly the 1-based rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_topk_rank(
    df: DataFrame,
    k: int,
    val_col: str,
    key_col: str,
    cum: bool = False,
) -> DataFrame:
    """Top-``k`` rows of ``df`` by (``val_col`` desc, ``key_col`` asc)
    with a 1-based ``rank`` column — and, with ``cum=True``, a
    ``cum_val`` column holding the running sum of ``val_col`` in rank
    order. All original columns are preserved; no window operator
    appears in the plan."""
    top = df.orderBy(F.desc(val_col), F.asc(key_col)).limit(k)
    prior = top.select(
        F.col(val_col).alias("_pv"), F.col(key_col).alias("_pk")
    )
    before_eq = (F.col("_pv") > F.col(val_col)) | (
        (F.col("_pv") == F.col(val_col)) & (F.col("_pk") <= F.col(key_col))
    )
    aggs = [F.count("_pk").cast("long").alias("rank")]
    if cum:
        aggs.append(F.sum("_pv").alias("cum_val"))
    return (
        top.join(F.broadcast(prior), before_eq)
        .groupBy(*top.columns)
        .agg(*aggs)
    )
