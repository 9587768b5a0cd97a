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


# --------------------------------------------------------------- HLL
# Portable HyperLogLog (Flajolet et al. 2007): unlike
# F.approx_count_distinct (whose HLL++ sketch is engine-private, so no
# value-level oracle can exist — x45's caveat), this one is built from
# the shared md5 hash space and INTEGER-EXACT register arithmetic, so
# Spark and DuckDB produce bit-identical estimates:
#
# - bucket = top ``p`` bits of the 60-bit md5 hash; rank = leading-zero
#   count of the remaining 51 bits + 1 (via length(bin(x)) — string
#   ops, no float log2 at the boundary);
# - the harmonic sum Σ 2^-M_j is computed as the LONG Σ 2^(52-M_j)
#   (each term exact, integer addition order-independent — no
#   float-sum-order nondeterminism across partitionings/engines) and
#   descaled by 2^52 once, at the end;
# - registers are MERGEABLE by max: union shard/day register relations
#   and re-max before estimating (the re-aggregatable sketch property
#   CMS has by cell addition).
#
# At 100 TB: one map-side-combinable shuffle to (groups × 2^p) register
# rows — no distinct shuffle, fixed memory per group. Standard error
# ~1.04/sqrt(2^p) (~4.6% at p=9).

HLL_P = 9
_HLL_REST_BITS = 60 - HLL_P                 # md5 hash60 is 60 bits
_HLL_MASK = (1 << _HLL_REST_BITS) - 1
_HLL_SCALE = 1 << 52                        # rank ∈ [1, 52]


def _hll_alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, group_cols: list, col, p: int = HLL_P) -> DataFrame:
    """(group..., b, M): max-rank register relation — the mergeable
    sketch state (union + re-max merges shards)."""
    from unimib_simpss_spark.functions.hashing import hash64

    c = F.col(col) if isinstance(col, str) else col
    h = hash64(c.cast("string"))
    rest = h.bitwiseAND(F.lit(_HLL_MASK))
    rank = F.when(rest == 0, F.lit(52)).otherwise(
        F.lit(52) - F.length(F.bin(rest))
    )
    return (
        df.select(
            *group_cols,
            F.shiftright(h, 60 - p).alias("b"),
            rank.alias("r"),
        )
        .groupBy(*group_cols, "b")
        .agg(F.max("r").alias("M"))
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list,
    col,
    p: int = HLL_P,
    ndigits: int = 4,
) -> DataFrame:
    """(group..., hll_est): deterministic HLL cardinality estimate with
    the standard small-range (linear-counting) correction."""
    m = 1 << p
    regs = hll_registers(df, group_cols, col, p)
    gs = regs.groupBy(*group_cols).agg(
        F.sum(F.expr("CAST(pow(2.0, 52 - M) AS BIGINT)")).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    zeros = F.lit(m) - F.col("n_present")
    inv = (F.col("s_present") + zeros * F.lit(_HLL_SCALE)).cast("double") / F.lit(
        float(_HLL_SCALE)
    )
    e_raw = F.lit(_hll_alpha(m) * m * m) / inv
    est = F.when(
        (e_raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return gs.select(*group_cols, F.round(est, ndigits).alias("hll_est"))


def hll_distinct_sql(
    table: str,
    group_col: str,
    col_expr: str,
    p: int = HLL_P,
    ndigits: int = 4,
) -> str:
    """DuckDB twin of :func:`hll_distinct` — same hash, same integer
    register arithmetic, same correction constants."""
    from unimib_simpss_spark.functions.hashing import hash64_sql

    m = 1 << p
    rest_bits = 60 - p
    mask = (1 << rest_bits) - 1
    hsql = hash64_sql(f"CAST({col_expr} AS VARCHAR)")
    e_raw = (
        f"({_hll_alpha(m) * m * m!r} / "
        f"(CAST(s_present + ({m} - n_present) * {_HLL_SCALE} AS DOUBLE)"
        f" / {float(_HLL_SCALE)!r}))"
    )
    return f"""
    WITH hll_h AS (
        SELECT {group_col} AS g, {hsql} AS h FROM {table}
    ), hll_reg AS (
        SELECT g, h // {1 << rest_bits} AS b,
               max(CASE WHEN (h & {mask}) = 0 THEN 52
                        ELSE 52 - length(bin(h & {mask})) END) AS M
        FROM hll_h GROUP BY g, b
    ), hll_g AS (
        SELECT g, sum(CAST(pow(2.0, 52 - M) AS BIGINT)) AS s_present,
               count(*) AS n_present
        FROM hll_reg GROUP BY g
    )
    SELECT g AS {group_col},
           round(CASE WHEN {e_raw} <= {2.5 * m} AND ({m} - n_present) > 0
                 THEN {float(m)!r} * ln({float(m)!r}
                                        / CAST({m} - n_present AS DOUBLE))
                 ELSE {e_raw} END, {ndigits}) AS hll_est
    FROM hll_g
    """


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
