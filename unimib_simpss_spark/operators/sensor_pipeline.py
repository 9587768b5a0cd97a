"""The SIMPSS ingest pipeline as composable DataFrame transforms.

The reference splits this across two processes — the MQTT→Kafka bridge
(``/root/reference/simpss/producers/mqtt_kafka_producer.py``) and the
Kafka→Cassandra link (``/root/reference/link_kafka_cassandra.py`` +
``simpss_persistence/``). Dataflow (SURVEY.md §3):

    decode JSON (P4) → enrich ingest timestamp (P5) → broadcast lookup
    join to sensor_group (J1, unknown id → failure) → strict rename to
    the persisted schema (P1) → keyed upsert sink (S4, PK dedup)

Here each stage is a pure ``DataFrame → DataFrame`` function, so the SAME
code runs in batch (file replay, EP3 ``cass.py:75-130``) and Structured
Streaming (Kafka live path) — the Structured Streaming design point the
reference can't express.

Scale notes: the dim join is an explicit broadcast (one row per physical
sensor — kilobytes even at planetary sensor counts); parsing/enrichment
are stateless row-local column expressions (whole-stage codegen, no
Python); the only shuffle in the whole pipeline is the sink-side PK
dedup, which partitions by the same key the storage layout uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from unimib_simpss_spark.operators.rename import convert

# Raw sensor wire schema — short keys, declared never inferred.
# Reference: mapping keys link_kafka_cassandra.py:93-105, Readme.md:104-117.
RAW_SENSOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("uptime", T.LongType()),
        T.StructField("T", T.LongType()),
        T.StructField("P", T.LongType()),
        T.StructField("H", T.LongType()),
        T.StructField("Ix", T.LongType()),
        T.StructField("Iy", T.LongType()),
        T.StructField("Iz", T.LongType()),
        T.StructField("M", T.LongType()),
    ]
)

# Raw→persisted rename map. Reference: link_kafka_cassandra.py:93-105.
RAW_TO_PERSISTED: dict[str, str] = {
    "id": "sensor_id",
    "uptime": "uptime",
    "T": "temperature",
    "P": "pressure",
    "H": "humidity",
    "Ix": "ix",
    "Iy": "iy",
    "Iz": "iz",
    "M": "mask",
}

# Persisted table column order + primary key.
# Reference DDL: link_kafka_cassandra.py:33-46.
PERSISTED_COLUMNS: tuple[str, ...] = (
    "time_received",
    "sensor_group",
    "sensor_id",
    "uptime",
    "temperature",
    "pressure",
    "humidity",
    "ix",
    "iy",
    "iz",
    "mask",
)
PRIMARY_KEY: tuple[str, ...] = ("sensor_group", "sensor_id", "time_received")


def decode_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """P4: JSON bytes/text → typed columns with declared schema.

    Reference: json.loads at consumer.py:128-138 / cass.py:122. Corrupt
    payloads yield a NULL struct (from_json) instead of killing the
    pipeline; pair with :func:`split_invalid` for the error branch.
    """
    parsed = F.from_json(F.col(value_col).cast("string"), RAW_SENSOR_SCHEMA)
    return df.withColumn("_parsed", parsed).select("*", "_parsed.*").drop("_parsed")


def split_invalid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P7/P8: route empty/corrupt messages to an error branch.

    Reference: consumer.py:60-75 drops Kafka error messages and counts
    valid ones; consumer.py:124,133-138 skips empty payloads.
    """
    ok = df.filter(F.col("id").isNotNull())
    bad = df.filter(F.col("id").isNull())
    return ok, bad


def enrich_ingest_time(df: DataFrame, ts_col: Column | None = None) -> DataFrame:
    """P5: stamp arrival time at the first pipeline element.

    Reference: mqtt_kafka_producer.py:202 (`datetime.now().isoformat()`).
    Pass ``ts_col`` (e.g. the Kafka record timestamp) for deterministic
    replay; default is live wall-clock like the reference.
    """
    return df.withColumn(
        "time_received", ts_col if ts_col is not None else F.current_timestamp()
    )


def join_sensor_group(
    df: DataFrame, dim: DataFrame, on_unknown: str = "fail"
) -> tuple[DataFrame, DataFrame | None]:
    """J1: broadcast lookup join id → sensor_group.

    Reference: ``self.__sensor_map[sensor_id]`` in the bridge
    (mqtt_kafka_producer.py:52,203-209) — a KeyError on unknown id kills
    the pipeline ("no duplicate/unknown sensor ids", Readme.md:275-281).

    ``on_unknown``:
      - ``"fail"`` (reference-faithful): unknown id raises at execution
        via ``raise_error`` — no extra pass over the data.
      - ``"deadletter"``: returns ``(matched, dead)`` where ``dead`` is
        the left-anti branch (production-sane, SURVEY.md §7).
    """
    joined = df.join(F.broadcast(dim), df["id"] == dim["sensor_id"], "left").drop(
        "sensor_id"
    )
    if on_unknown == "fail":
        grp = F.when(
            F.col("group_id").isNull(),
            F.raise_error(
                F.concat(F.lit("unknown sensor id: "), F.col("id").cast("string"))
            ),
        ).otherwise(F.col("group_id"))
        return joined.withColumn("sensor_group", grp).drop("group_id"), None
    if on_unknown == "deadletter":
        ok = joined.filter(F.col("group_id").isNotNull()).withColumn(
            "sensor_group", F.col("group_id")
        ).drop("group_id")
        dead = joined.filter(F.col("group_id").isNull()).drop("group_id")
        return ok, dead
    raise ValueError(f"on_unknown must be 'fail' or 'deadletter', got {on_unknown!r}")


def to_persisted_schema(df: DataFrame) -> DataFrame:
    """P1/P2: strict rename to the Cassandra column names, then project
    into DDL column order (link_kafka_cassandra.py:33-46).

    The strict-arity contract (data_mapper.convert) applies to the raw
    payload columns; the two enrichment columns ride alongside.
    """
    # plan-time arity assertion on the raw part, reference ValueError text
    convert(df.select(*RAW_TO_PERSISTED), RAW_TO_PERSISTED, strict=True)
    cols = [F.col(src).alias(dst) for src, dst in RAW_TO_PERSISTED.items()]
    out = df.select(F.col("time_received"), F.col("sensor_group"), *cols)
    return out.select(*PERSISTED_COLUMNS)


def dedup_by_primary_key(df: DataFrame) -> DataFrame:
    """ST9/S4: last-writer-wins dedup on the PK.

    Cassandra INSERT is an upsert by ``(sensor_group, sensor_id,
    time_received)`` (link_kafka_cassandra.py:45); re-delivered messages
    (at-least-once Kafka) collapse to one row. A plain groupBy-max is
    wrong for full rows; row_number over the PK keeps the whole record.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*PRIMARY_KEY).orderBy(F.monotonically_increasing_id().desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def sensor_pipeline(
    raw: DataFrame,
    dim: DataFrame,
    ts_col: Column | None = None,
    on_unknown: str = "fail",
) -> tuple[DataFrame, DataFrame | None]:
    """Full decode→enrich→join→rename pipeline (without the sink).

    ``raw`` must carry a ``value`` column of JSON text/bytes — the Kafka
    wire shape — or already-typed raw columns (then decode is skipped).
    Works identically on batch and streaming DataFrames.
    """
    df = raw
    if "value" in df.columns and "id" not in df.columns:
        df = decode_json(df)
    df, _bad = split_invalid(df)
    df = enrich_ingest_time(df, ts_col)
    df, dead = join_sensor_group(df, dim, on_unknown=on_unknown)
    return to_persisted_schema(df), dead
