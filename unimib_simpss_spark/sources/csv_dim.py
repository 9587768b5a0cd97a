"""Sensor→group dimension table loader (S5) with reference validation.

Reference parity: ``utils.read_sensor_group_mapping``
(``/root/reference/utils.py:21-40``) loads ``sensor_group.csv`` via pandas
and raises ``ValueError`` on (a) any missing value and (b) duplicated
``sensor_id``; group names are whitespace-stripped (``utils.py:36``;
rules ``Readme.md:275-281``).

Spark restatement: declared schema (never inferred), the two validation
rules as aggregate checks, and the result kept as a DataFrame ready to
broadcast — the reference's in-process dict replica becomes an explicit
``F.broadcast`` at join time (the dim is small by construction: one row
per physical sensor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SENSOR_GROUP_SCHEMA = "sensor_id INT, group_id STRING"


def read_sensor_group_mapping(spark: SparkSession, path: str) -> DataFrame:
    """Load + validate the sensor→group dim table.

    Raises ``ValueError`` exactly where the reference does: missing
    values (utils.py:28-30) or duplicate sensor ids (utils.py:32-33).
    """
    df = (
        spark.read.csv(path, header=True, schema=SENSOR_GROUP_SCHEMA)
        .withColumn("group_id", F.trim("group_id"))
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("sensor_id").alias("n_id"),
        F.count(F.when(F.col("group_id").isNotNull() & (F.col("group_id") != ""), 1)).alias(
            "n_grp"
        ),
        F.countDistinct("sensor_id").alias("n_distinct"),
    ).collect()[0]
    if stats.n_id < stats.n or stats.n_grp < stats.n:
        raise ValueError(
            "sensor_group mapping has missing values "
            f"(rows={stats.n}, non-null ids={stats.n_id}, non-null groups={stats.n_grp})"
        )
    if stats.n_distinct < stats.n:
        raise ValueError(
            f"sensor_group mapping has duplicated sensor ids "
            f"(rows={stats.n}, distinct ids={stats.n_distinct})"
        )
    return df


def distinct_groups(dim: DataFrame) -> list[str]:
    """Distinct group labels — the Kafka topic subscription list.

    Reference parity: ``link_kafka_cassandra.py:58-59`` derives the
    topic set from the mapping values (A1 distinct).
    """
    return [r.group_id for r in dim.select("group_id").distinct().collect()]
