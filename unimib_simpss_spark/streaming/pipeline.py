"""Structured Streaming wiring for the SIMPSS live path.

Reference topology (SURVEY.md §0): MQTT → EMQX → bridge → per-group
Kafka topics → consumer → Cassandra. The engine's streaming contract
starts at Kafka (S3) — MQTT→Kafka bridging is a broker/deployment
concern (EMQX bridge or Kafka Connect), exactly as the reference keeps
it in a separate process (SURVEY.md §7 risk register).

Every transformation is shared with the batch path
(``operators.sensor_pipeline``): readStream → decode → enrich → join →
rename → ``foreachBatch`` keyed upsert. The Kafka builders are
config-only here (no broker or kafka connector jar in the test
container); the file-source replay below exercises the identical plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from unimib_simpss_spark.operators.sensor_pipeline import (
    PRIMARY_KEY,
    RAW_SENSOR_SCHEMA,
    sensor_pipeline,
)
from unimib_simpss_spark.streaming.sinks import foreach_batch_upsert


# --------------------------------------------------------------------- Kafka
def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S3: Kafka consumer as a streaming source.

    Reference parity: ``KafkaConsumer`` (consumer.py:16-48) — multi-topic
    subscribe, offset reset "smallest" ↔ ``startingOffsets=earliest``,
    batch bound ``consume(10, 1.0)`` ↔ ``maxOffsetsPerTrigger``,
    auto-commit ↔ checkpointing (strictly stronger).

    Requires the spark-sql-kafka connector on the classpath (deployment).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_topic_routed_sink(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    topic_col: str = "sensor_group",
) -> DataStreamWriter:
    """S2/ST4: Kafka producer with per-row topic routing.

    Reference parity: the bridge publishes each message to the topic
    named by its group (mqtt_kafka_producer.py:117,202-206). The Kafka
    sink routes on a ``topic`` column; payload is the full row as JSON
    (``to_json(struct(*))``, the reference's utf-8 JSON wire form).
    """
    out = df.select(
        F.col(topic_col).alias("topic"),
        F.to_json(F.struct(*[c for c in df.columns])).alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
    )


# ------------------------------------------------------------- file replay
def file_replay_source(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """S6/ST6: line-delimited JSON replay as a streaming source.

    Reference parity: the mock sensor replays a log file line-by-line
    (mocks/sensor.py:104-106, cass.py:117-125); ``maxFilesPerTrigger``
    is the paced-replay knob.
    """
    return (
        spark.readStream.schema(RAW_SENSOR_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


# ------------------------------------------------------------ end-to-end
def start_sensor_ingest(
    raw_stream: DataFrame,
    dim: DataFrame,
    sink_path: str,
    checkpoint_dir: str,
    ts_col: Column | None = None,
    on_unknown: str = "deadletter",
    trigger_seconds: float | None = 1.0,
    available_now: bool = False,
) -> StreamingQuery:
    """EP1+EP2 as one streaming query: source → pipeline → keyed upsert.

    Micro-batch trigger ↔ the reference's 1.0 s poll loop (ST1,
    consumer.py:50-77); the upsert sink + checkpointing reproduce the
    at-least-once + idempotent-write delivery contract (ST5).
    """
    persisted, _dead = sensor_pipeline(
        raw_stream, dim, ts_col=ts_col, on_unknown=on_unknown
    )
    # A2: the reference's messages_read/messages_sent counters
    # (mqtt_kafka_producer.py:37-38) as streaming observed metrics —
    # surfaced per micro-batch in query.lastProgress["observedMetrics"].
    persisted = persisted.observe(
        "ingest", F.count(F.lit(1)).alias("rows_persisted")
    )
    writer = persisted.writeStream.outputMode("append").option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.foreachBatch(
        foreach_batch_upsert(sink_path, PRIMARY_KEY, partition_col="sensor_group")
    ).start()


# ------------------------------------------------- event-time aggregations
def windowed_stats(
    df: DataFrame,
    ts_col: str = "time_received",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    keys: tuple[str, ...] = ("sensor_group",),
) -> DataFrame:
    """ST7/ST8: tumbling event-time window with watermarked late data.

    The reference has no windowing (ingest-time only; late rows land in
    their clustering slot — ST8); this is the [EXT] event-time layer.
    Works on batch frames too (window() is a plain grouping expression).
    """
    is_streaming = df.isStreaming
    src = df.withWatermark(ts_col, watermark) if is_streaming else df
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            F.round(F.avg("temperature"), 4).alias("avg_temperature"),
            F.max("humidity").alias("max_humidity"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_readings",
            "avg_temperature",
            "max_humidity",
        )
    )


def streaming_dedup(
    df: DataFrame, ts_col: str = "time_received", watermark: str = "10 minutes"
) -> DataFrame:
    """ST9: stateful streaming dedup on the PK within a watermark.

    Batch equivalent is ``dedup_by_primary_key``; on a stream, state is
    bounded by the watermark — the scalable form of Cassandra's
    absorb-any-duplicate upsert for the in-flight window.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(PRIMARY_KEY)
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream interval join (J5's streaming form): match right
    rows whose event time falls in [left_ts - lower, left_ts + upper]
    for the same key.

    Both sides carry watermarks, so Spark can bound the join state to
    the interval width — the requirement for an unbounded run. Columns
    must be disjoint apart from ``key`` (alias upstream).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= F.expr(f"{left_ts} - interval {lower}"))
        & (rw[right_ts] <= F.expr(f"{left_ts} + interval {upper}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def session_stats_stream(
    df: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "sensor_id",
    ts_col: str = "time_received",
    watermark: str = "10 minutes",
) -> DataFrame:
    """ST7's SESSION-window form: per-key gap-based sessions on an
    unbounded stream via Spark's merging ``session_window`` state
    (SPARK-10816) — events landing in different micro-batches MERGE
    into one session as long as each arrives within the gap
    (state-tested across maxFilesPerTrigger=1 batches); the watermark
    both admits late data and lets closed sessions EVICT, so state is
    bounded by the live-session count, not the stream length.

    Same output contract as the batch operator
    (operators/sessions.py session_stats, minus the per-user ordinal —
    a global per-key rank has no meaning mid-stream): ``(key,
    session_start, session_end, n_events, duration_sec)`` with
    session_start/end = min/max EVENT time (session_window.end is
    last-event + gap, an eviction bound, not data). Batch parity is
    pinned in tests/test_streaming.py: the streamed sessions equal
    ``session_stats`` over the same rows folded as one batch.

    Append output mode: a session emits exactly once, when the
    watermark passes its close — the delivery-semantics-friendly mode
    (ST5's sinks see each session once).
    """
    is_streaming = df.isStreaming
    src = df.withWatermark(ts_col, watermark) if is_streaming else df
    return (
        src.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias(
                "_sw"
            ),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            key_col,
            "session_start",
            "session_end",
            "n_events",
            F.round(
                (
                    F.unix_micros(F.col("session_end"))
                    - F.unix_micros(F.col("session_start"))
                )
                / F.lit(1_000_000.0),
                6,
            ).alias("duration_sec"),
        )
    )
