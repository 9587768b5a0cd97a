"""Sensor/streaming-analog queries, oracle-checked in batch.

Structured Streaming's design point is that event-time operators are
plain relational expressions — so the engine's streaming surface (ST7
windows, ST9 keyed dedup, J1 lookup join of the ingest path) is verified
here on the batch `events` table against DuckDB, while
`tests/test_streaming.py` exercises the same operators on live streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unimib_simpss_spark.catalog import load_table
from unimib_simpss_spark.operators.rename import convert
from unimib_simpss_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# ST7: tumbling event-time window (batch-checkable form)
# --------------------------------------------------------------------------
def _q23_oracle() -> str:
    from unimib_simpss_spark.functions.analysis import exact_avg_sql

    return f"""
    SELECT date_trunc('hour', ts)       AS window_start,
           event_type,
           count(*)                     AS n_events,
           {exact_avg_sql('value')}     AS avg_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """


@query("q23_tumbling_window", oracle=_q23_oracle())
def q23_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window via F.window (epoch-aligned, so
    window.start ≡ date_trunc('hour')). The same expression runs on a
    watermarked stream (streaming/pipeline.py: windowed_stats)."""
    from unimib_simpss_spark.functions.analysis import exact_avg

    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_avg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


# --------------------------------------------------------------------------
# ST7: session window (gap-based), oracle = gaps-and-islands
# --------------------------------------------------------------------------
@query(
    "q24_session_windows",
    oracle="""
    WITH x AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), y AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM x
    )
    SELECT user_id,
           min(ts)                          AS session_start,
           max(ts) + INTERVAL 30 MINUTE     AS session_end,
           count(*)                         AS n_events
    FROM y
    GROUP BY user_id, sess
    """,
)
def q24_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap via F.session_window — the
    stateful streaming operator, verified in batch against a
    gaps-and-islands SQL oracle (session end = last event + gap)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# ST9/S4: keyed last-writer-wins dedup — the Cassandra upsert read surface
# --------------------------------------------------------------------------
_Q25_ASOF = "2024-01-15 00:00:00"  # mid-corpus time-travel snapshot


def _q25_oracle() -> str:
    from unimib_simpss_spark.sources.lakehouse import (
        scd2_asof_sql,
        scd2_history_sql,
    )

    return f"""
    WITH hist AS ({scd2_history_sql()})
    SELECT 'current' AS section, user_id, event_type, event_id,
           ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to, value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    UNION ALL
    SELECT 'history' AS section, user_id, event_type,
           version_id AS event_id, valid_from, valid_to, value
    FROM hist
    UNION ALL
    SELECT 'asof' AS section, user_id, event_type,
           version_id AS event_id, valid_from, valid_to, value
    FROM ({scd2_asof_sql("SELECT * FROM hist", _Q25_ASOF)})
    """


@query("q25_upsert_read", oracle=_q25_oracle())
def q25_upsert_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keyed-table read surfaces over one upsert stream, tagged by
    section:

    - 'current': last-writer-wins per (user_id, event_type) — what a
      reader of the reference's upsert-by-PK table observes
      (link_kafka_cassandra.py:45). One shuffle on the key — same
      layout the storage partitioning uses.
    - 'history': the SCD2 TYPE-2 version history of the same stream
      (sources/lakehouse.py scd2_history — Kimball dimension
      evolution): one row per value CHANGE per key with
      valid_from/valid_to validity, consecutive same-value writes
      collapsed; the lag change-flag and post-filter lead windows
      share one key exchange.
    - 'asof': the time-travel snapshot of that history at a fixed
      mid-corpus timestamp (valid_from <= T < valid_to; open versions
      unbounded) — at most one row per key by construction.
    """
    from unimib_simpss_spark.operators.caching import (
        cache_intermediate,
        materialize_release,
    )
    from unimib_simpss_spark.sources.lakehouse import (
        scd2_asof,
        scd2_history,
    )

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    current = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.lit("current").alias("section"),
            "user_id",
            "event_type",
            "event_id",
            F.col("ts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            "value",
        )
    )
    # the history feeds TWO legs — cache it so the events scan and the
    # change-flag/lead window pass run once, not per leg (review r13
    # pass 2; q38's shared gram_collisions recipe)
    hist = cache_intermediate(scd2_history(
        e, keys=("user_id", "event_type"), ts_col="ts",
        id_col="event_id", value_col="value",
    ))

    def _tag(df: DataFrame, section: str) -> DataFrame:
        return df.select(
            F.lit(section).alias("section"),
            "user_id",
            "event_type",
            F.col("version_id").alias("event_id"),
            "valid_from",
            "valid_to",
            "value",
        )

    return materialize_release(
        current.unionAll(_tag(hist, "history")).unionAll(
            _tag(scd2_asof(hist, _Q25_ASOF), "asof")
        ),
        hist,
    )


# --------------------------------------------------------------------------
# J1+P1: the ingest path as a relational query (broadcast lookup + rename)
# --------------------------------------------------------------------------
@query(
    "q26_ingest_replay",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT user_id AS dim_sensor_id,
               'g' || CAST(user_id % 4 AS VARCHAR) AS group_id
        FROM events
    )
    SELECT 'replay'   AS stage,
           e.ts       AS time_received,
           d.group_id AS sensor_group,
           e.user_id  AS sensor_id,
           e.event_id AS reading_id,
           e.value    AS reading_value,
           CAST(NULL AS VARCHAR) AS kind,
           CAST(NULL AS VARCHAR) AS props_json
    FROM events e JOIN dim d ON e.user_id = d.dim_sensor_id
    UNION ALL
    SELECT 'convert'  AS stage,
           ts         AS time_received,
           CAST(NULL AS VARCHAR) AS sensor_group,
           user_id    AS sensor_id,
           event_id   AS reading_id,
           value      AS reading_value,
           event_type AS kind,
           props      AS props_json
    FROM events
    """,
)
def q26_ingest_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 replay shape plus the bare convert stage, tagged by leg
    (merged from the former q21 to fit the driver's 50-query window).

    'replay' leg: enrich → broadcast dim lookup (J1) → strict rename
    (P1) to the persisted schema. The dim is derived here (the testdata
    has no sensor_group.csv); in the real pipeline it comes from
    sources/csv_dim.py with the reference's validation rules.

    'convert' leg: the strict rename-projection on its own
    (data_mapper.convert parity, P1 — reference
    data_mapping/data_mapper.py:4-32; arity check is a plan-time schema
    assertion), exposing the full renamed event row including the
    columns the replay leg drops (kind, props_json).
    """
    e = _t(spark, sf_dir, "events")
    dim = (
        e.select(F.col("user_id").alias("dim_sensor_id"))
        .distinct()
        .withColumn(
            "group_id",
            F.concat(F.lit("g"), (F.col("dim_sensor_id") % 4).cast("string")),
        )
    )
    joined = e.join(F.broadcast(dim), e.user_id == dim.dim_sensor_id).select(
        "ts", "group_id", "user_id", "event_id", "value"
    )
    replay = convert(
        joined,
        {
            "ts": "time_received",
            "group_id": "sensor_group",
            "user_id": "sensor_id",
            "event_id": "reading_id",
            "value": "reading_value",
        },
        strict=True,
    ).select(
        F.lit("replay").alias("stage"),
        "time_received",
        "sensor_group",
        "sensor_id",
        "reading_id",
        "reading_value",
        F.lit(None).cast("string").alias("kind"),
        F.lit(None).cast("string").alias("props_json"),
    )
    converted = convert(
        e,
        {
            "event_id": "reading_id",
            "user_id": "sensor_id",
            "ts": "time_received",
            "event_type": "kind",
            "value": "reading_value",
            "props": "props_json",
        },
        strict=True,
    ).select(
        F.lit("convert").alias("stage"),
        "time_received",
        F.lit(None).cast("string").alias("sensor_group"),
        "sensor_id",
        "reading_id",
        "reading_value",
        "kind",
        "props_json",
    )
    return replay.unionAll(converted)
