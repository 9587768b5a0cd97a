"""Count-min sketch over a token column (SURVEY.md §2.7 [EXT]).

The mergeable-sketch pattern for frequency estimation under fixed
memory: a depth×width integer grid where cell (j, c) holds the count of
every token whose j-th hash lands on column c. Estimates read the MIN
over a token's depth cells — always an overestimate, bounded by
``true + εN`` with ``ε = e/width`` at confidence ``1 - e^-depth``
(Cormode & Muthukrishnan, J. Algorithms 2005).

Why this matters at 100 TB when exact ``groupBy(token).count()`` is
itself scalable: the sketch is FIXED-SIZE (depth×width cells, here 4 KiB
of longs) no matter how many distinct tokens exist, and cell-wise
ADDITIVE — sketches of shards/batches/days merge by summing cells, so
it drops into streaming state, cross-corpus transfer, or a
``foreachBatch`` accumulator where the exact count relation (one row
per distinct token) cannot.

Everything is relational: build is explode → one map-side-combinable
groupBy on (row, col) — output bounded by depth×width; estimate is a
keyed join against the cells. Hashing is ``xxhash64(token, seed_j)``,
deterministic across runs and partitionings.

The reference (PCampi/unimib-simpss) exposes only exact counters
(messages_read/messages_sent, mqtt_kafka_producer.py:37-38); the
sketches are the [EXT] fixed-memory form those counters need once the
key space is unbounded. Streaming-state twin:
streaming/stateful.py:streaming_token_cms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 512


def _cell(col, j: int, width: int):
    return F.pmod(F.xxhash64(col, F.lit(j)), F.lit(width))


def cms_build(
    df: DataFrame, col: str, depth: int = DEFAULT_DEPTH, width: int = DEFAULT_WIDTH
) -> DataFrame:
    """Sketch a token column: returns (j, c, cnt) cells, ≤ depth×width rows.

    One explode (depth rows per input row, all narrow) and one
    combinable shuffle whose output cardinality is the GRID size, not
    the token count.
    """
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cell(F.col(col), j, width).alias("c")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jc")
    )
    return rows.groupBy(F.col("jc.j").alias("j"), F.col("jc.c").alias("c")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): cell-wise
    sum. Exactly equals the sketch of the concatenated inputs (additive
    counters), which the property test asserts."""
    return (
        a.unionAll(b)
        .groupBy("j", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    tokens: DataFrame,
    col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-estimate counts for a relation of tokens: (token, est).

    Each token probes its depth cells (explode) and takes the MIN —
    one keyed join against the bounded cells relation (AQE broadcasts
    the sketch side: it is at most depth×width rows).
    """
    probes = tokens.select(
        F.col(col).alias("token"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cell(F.col(col), j, width).alias("c")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jc"),
    ).select("token", F.col("jc.j").alias("j"), F.col("jc.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["j", "c"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("token")
        .agg(F.min("cnt").alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Top-k tokens by CMS estimate: (token, est, rank).

    Batch-mode demo of the sketch path: build once, probe the distinct
    tokens, rank by estimate (ties: token asc). Estimates are
    overestimates, so every TRUE heavy hitter survives the cut —
    CMS trades false positives, never false negatives.
    """
    from pyspark.sql import Window

    sketch = cms_build(df, col, depth, width)
    distinct = df.select(F.col(col)).distinct()
    est = cms_estimate(sketch, distinct, col, depth, width)
    w = Window.orderBy(F.desc("est"), "token")
    return (
        est.orderBy(F.desc("est"), "token")
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )
