"""Per-key EWMA smoothing — the classic sensor-telemetry filter the
reference's monitoring stack gestures at (its Graphite/Grafana compose
services, docker-compose.yml:74-100, would apply exactly this to the
temperature/pressure series the pipeline persists).

``y_t = α·x_t + (1-α)·y_{t-1}`` is inherently SEQUENTIAL — no Spark
built-in window expresses the recursion, and the closed-form rewrite
(two cumulative sums of x·(1-α)^{-i}) overflows for long series. The
scalable shape is the per-key fold:

- **batch** (:func:`ewma`): ``applyInPandas`` per key — one key's
  series sorts and folds inside one task (state = that series; keys
  are the parallel unit, the same contract as the packer/profiler).
  The fold is an explicit float loop in ts order, so the result is a
  deterministic IEEE-754 sequence — bit-identical across engines,
  reruns, and the streaming twin.
- **streaming** (:mod:`..streaming.stateful` ``streaming_ewma``):
  ``applyInPandasWithState`` carrying ``(last_ewma, n_seen)`` — O(1)
  state per key forever, and because the fold order and arithmetic are
  IDENTICAL to the batch form, the snapshot after any prefix of the
  stream EQUALS the batch EWMA of that prefix bit for bit (the same
  parity contract as the weighted reservoir and KLL trackers).

Out-of-order rows: batch sorts per key before folding; the streaming
fold consumes arrival order within the watermark discipline the caller
configures — the documented difference, same as every stateful op here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EWMA_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("last_ts", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("mean", DoubleType()),
    ]
)


def ewma_fold(values: list, alpha: float) -> float:
    """The reference fold both engines/forms share: explicit
    left-to-right ``y = α·x + (1-α)·y`` over floats. First value seeds
    ``y`` (the ``adjust=False`` convention)."""
    it = iter(values)
    y = float(next(it))
    for x in it:
        y = alpha * float(x) + (1.0 - alpha) * y
    return y


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    alpha: float = 0.3,
    ndigits: int = 6,
) -> DataFrame:
    """Per-key EWMA of ``val_col`` in ``ts_col`` order → one row per
    key: ``(key, n, last_ts, ewma, mean)`` (the plain mean rides along
    as the smoothing diagnostic). NULL values are dropped; ties in ts
    break by value then arrival to stay deterministic."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    src = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(val_col).cast("double").alias("v"),
    ).where(F.col("v").isNotNull() & F.col("ts").isNotNull())

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["ts", "v"], kind="mergesort")
        vals = pdf["v"].tolist()
        return pd.DataFrame(
            [
                [
                    pdf["key"].iloc[0],
                    len(vals),
                    float(pdf["ts"].iloc[-1]),
                    round(ewma_fold(vals, alpha), ndigits),
                    round(sum(vals) / len(vals), ndigits),
                ]
            ],
            columns=["key", "n", "last_ts", "ewma", "mean"],
        )

    return src.groupBy("key").applyInPandas(fold, EWMA_SCHEMA)


def ewma_sql(
    key_expr: str,
    ts_expr: str,
    val_expr: str,
    alpha: float = 0.3,
    ndigits: int = 6,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`ewma` — the identical sequential fold via
    ``list_reduce`` over the (ts, value)-ordered list, so the IEEE
    float sequence matches the batch operator bit for bit (the mean is
    also a list_reduce, mirroring Python's strictly left-to-right
    ``sum``). Pass a NUMERIC ``ts_expr`` — for timestamp columns use
    ``epoch(ts)``, which matches Spark's timestamp→double cast
    (microseconds / 1e6) on the operator side. Value-level parity is
    asserted through the standard compare harness in
    tests/test_llm_ops.py."""
    return f"""
    WITH s AS (
        SELECT CAST({key_expr} AS VARCHAR) AS key,
               CAST({ts_expr} AS DOUBLE)   AS ts,
               CAST({val_expr} AS DOUBLE)  AS v
        FROM {table}
        WHERE {val_expr} IS NOT NULL AND {ts_expr} IS NOT NULL
    ),
    g AS (
        SELECT key,
               count(*)       AS n,
               max(ts)        AS last_ts,
               list(v ORDER BY ts, v) AS vs
        FROM s GROUP BY key
    )
    SELECT key, CAST(n AS BIGINT) AS n, last_ts,
           round(list_reduce(vs,
               (acc, x) -> {alpha!r} * x + {1.0 - alpha!r} * acc),
               {ndigits}) AS ewma,
           round(list_reduce(vs, (acc, x) -> acc + x) / n, {ndigits})
               AS mean
    FROM g
    """
