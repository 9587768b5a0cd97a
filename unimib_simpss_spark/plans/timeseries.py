"""Time-series rollup with gap-fill + LOCF (hypertable-rollup shape).

The reference's storage is a per-group time-clustered telemetry table
(`link_kafka_cassandra.py:45` — PRIMARY KEY (sensor_group, sensor_id,
time_received)); the natural downstream query on such a table is a
time-bucket rollup with gaps filled. The reference has no query engine to
express it — this module is the [EXT] Spark-first formulation:

  1. bucket aggregate: groupBy(key, date_trunc(bucket, ts)) — one shuffle,
     map-side combined, output bounded by |keys| x |buckets| regardless of
     input scale;
  2. dense spine: explode(sequence(start, stop, interval)) cross-joined
     with the distinct key set — generated, never scanned; broadcast
     because |spine| is O(keys x buckets), not O(rows);
  3. left join agg onto spine + last(ignorenulls) window for
     last-observation-carried-forward.

At 100 TB only step 1 touches the raw data; steps 2-3 operate on the
bounded rollup, so the whole gap-fill costs one extra tiny shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unimib_simpss_spark.catalog import load_table
from unimib_simpss_spark.plans.registry import query


def gapfill_rollup(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    start: str,
    stop: str,
    bucket: str = "hour",
) -> DataFrame:
    """Bucketed avg/count rollup on a dense time spine with LOCF and
    linear interpolation.

    Returns one row per (key, bucket) between ``start`` and ``stop``
    inclusive: ``n_events`` (0 on gaps), ``avg_value`` (NULL on gaps),
    ``locf_value`` (last non-null avg carried forward per key), and
    ``interp_value`` (the straight line between the surrounding
    non-null buckets — the other standard gap-fill; NULL outside the
    observed span, i.e. before the first / after the last non-null
    point, where LOCF's step convention would extrapolate but a line
    has nothing to anchor to).

    Plan note: LOCF and both interpolation anchors ride the SAME
    (key, bucket) sort — the backward frame reuses ``w`` and the
    forward frame only flips the bounds, so Spark plans ONE exchange
    + ONE sort with two adjacent Window nodes; interpolation adds
    zero shuffles. Anchor timestamps are integer µs
    (``unix_micros``/``epoch_us``, the house idiom) and the ratio is
    a single double division mirrored verbatim in the oracle."""
    spark = df.sparkSession
    from unimib_simpss_spark.functions.analysis import exact_avg

    agg = df.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
    ).agg(
        # order-independent cross-engine average (see exact_avg: plain
        # avg(double) diverged from the oracle in the 4th digit at sf0.1)
        exact_avg(value_col).alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    buckets = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(stop).cast("timestamp"),
                F.expr(f"INTERVAL 1 {bucket.upper()}"),
            )
        ).alias("bucket")
    )
    spine = df.select(F.col(key_col).alias("key")).distinct().crossJoin(
        F.broadcast(buckets)
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t_us = F.unix_micros(F.col("bucket"))
    obs_t = F.when(F.col("avg_value").isNotNull(), t_us)
    prev_v = F.last("avg_value", ignorenulls=True).over(w)
    prev_t = F.last(obs_t, ignorenulls=True).over(w)
    next_v = F.first("avg_value", ignorenulls=True).over(wf)
    next_t = F.first(obs_t, ignorenulls=True).over(wf)
    frac = (t_us - prev_t).cast("double") / (next_t - prev_t).cast(
        "double"
    )
    return spine.join(agg, ["key", "bucket"], "left").select(
        F.col("key").alias(key_col),
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        "avg_value",
        prev_v.alias("locf_value"),
        # observed buckets pass through exactly (no 0/0 from
        # prev_t == next_t == t); gaps outside the span stay NULL
        # because a missing anchor NULLs the whole expression
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .otherwise(prev_v + (next_v - prev_v) * frac)
        .alias("interp_value"),
    )


def _q55_oracle() -> str:
    from unimib_simpss_spark.functions.analysis import exact_avg_sql

    return f"""
    WITH spine AS (
        SELECT t.event_type AS key, b.bucket
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                          TIMESTAMP '2024-01-30 23:00:00',
                                          INTERVAL 1 HOUR)) AS bucket
        ) b
    ), agg AS (
        SELECT event_type AS key, date_trunc('hour', ts) AS bucket,
               {exact_avg_sql('value')} AS avg_value, count(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, bucket, n_events, avg_value, locf_value,
           -- locf_value IS the backward anchor value (one window
           -- expression serves both outputs, like the Spark side)
           CASE WHEN avg_value IS NOT NULL THEN avg_value
                ELSE locf_value + (next_v - locf_value)
                     * (CAST(t_us - prev_t AS DOUBLE)
                        / CAST(next_t - prev_t AS DOUBLE))
           END AS interp_value
    FROM (
        SELECT s.key AS event_type, s.bucket,
               coalesce(a.n_events, 0)  AS n_events,
               a.avg_value              AS avg_value,
               epoch_us(s.bucket)       AS t_us,
               last_value(a.avg_value IGNORE NULLS) OVER back AS locf_value,
               last_value(CASE WHEN a.avg_value IS NOT NULL
                               THEN epoch_us(s.bucket) END IGNORE NULLS)
                   OVER back AS prev_t,
               first_value(a.avg_value IGNORE NULLS) OVER fwd AS next_v,
               first_value(CASE WHEN a.avg_value IS NOT NULL
                                THEN epoch_us(s.bucket) END IGNORE NULLS)
                   OVER fwd AS next_t
        FROM spine s LEFT JOIN agg a ON a.key = s.key AND a.bucket = s.bucket
        WINDOW back AS (PARTITION BY s.key ORDER BY s.bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fwd AS (PARTITION BY s.key ORDER BY s.bucket
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    """


@query("q55_gapfill_rollup", oracle=_q55_oracle())
def q55_gapfill_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-event-type rollup over the full events month, dense
    spine, zero-filled counts, LOCF values."""
    ev = load_table(spark, sf_dir, "events")
    return gapfill_rollup(
        ev,
        key_col="event_type",
        ts_col="ts",
        value_col="value",
        start="2024-01-01 00:00:00",
        stop="2024-01-30 23:00:00",
        bucket="hour",
    )


@query("x72_ewma")  # sequential float fold → rows-only (bit-parity tested)
def x72_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA smoothing of the event value series (α=0.3, ts
    order) — the sensor-telemetry filter the reference's monitoring
    stack implies, as a per-key applyInPandas fold (keys are the
    parallel unit; O(series) memory within one task). The streaming
    twin (streaming_ewma) carries O(1) state and is bit-identical on
    stream prefixes — parity + determinism tests in
    tests/test_streaming.py / test_llm_ops.py."""
    from unimib_simpss_spark.operators.timeseries import ewma

    events = load_table(spark, sf_dir, "events")
    return ewma(events, "user_id", "ts", "value", alpha=0.3)


@query("x73_pattern_topk")  # engine-local float folds → rows-only
def x73_pattern_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 sliding windows most similar to a fixed query shape
    across every user's event-value series — UCR-style z-normalized
    Euclidean subsequence search (operators/timeseries.py pattern_topk;
    scale/offset invariant, O(n·m)-per-key codegen folds, window-free
    global rank). Bit-level value parity vs the DuckDB list_reduce twin
    is asserted through the compare harness in tests/test_llm_ops.py;
    the streaming CEP twin shares the identical closed-form
    arithmetic."""
    from unimib_simpss_spark.operators.timeseries import pattern_topk

    events = load_table(spark, sf_dir, "events")
    return pattern_topk(
        events, [1.0, 3.0, 2.0, 5.0, 4.0], "user_id", "ts", "value", k=10
    )
