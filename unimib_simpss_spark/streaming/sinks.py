"""Keyed upsert sink — the Cassandra-table semantics on any storage.

Reference parity: ``CassandraStorage`` (``/root/reference/
simpss_persistence/storage/cassandra_storage.py:17-129``) issues one
prepared ``INSERT`` per row; Cassandra INSERT is an upsert by
``PRIMARY KEY (sensor_group, sensor_id, time_received)``
(``link_kafka_cassandra.py:33-46``), so at-least-once delivery collapses
to exactly-once-effect storage.

Spark restatement: a lakehouse table partitioned by the same partition
key, written through ``foreachBatch`` with PK dedup — idempotent, so
checkpoint replays are absorbed exactly like Cassandra absorbs them. On
a deployment with the Spark Cassandra Connector the same ``foreachBatch``
body becomes ``df.write.format("org.apache.spark.sql.cassandra")`` and
the dedup is free (server-side upsert); the connector isn't in this
container, so the portable parquet path is the tested one.

Scale notes: writes shuffle once on the partition key (matching the
storage layout — no second shuffle at read time for per-group scans);
the read-merge-write upsert below is for the portable parquet fallback
only — at 100 TB the sink is Cassandra/Delta/Iceberg where upsert is a
storage-native MERGE, not a rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_keyed_parquet(
    batch: DataFrame,
    path: str,
    keys: tuple[str, ...],
    partition_col: str | None = None,
) -> None:
    """Last-writer-wins upsert of ``batch`` into a keyed parquet table.

    New rows win over stored rows on PK collision (Cassandra INSERT
    semantics); within the batch, later rows win (the reference applies
    messages in consumption order, consumer.py:74-75).
    """
    spark = batch.sparkSession
    new = batch.withColumn("_src", F.lit(1)).withColumn(
        "_seq", F.monotonically_increasing_id()
    )
    if os.path.exists(path):
        old = (
            spark.read.parquet(path)
            .select(*batch.columns)
            .withColumn("_src", F.lit(0))
            .withColumn("_seq", F.lit(0).cast("long"))
        )
        merged = old.unionByName(new)
    else:
        merged = new
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.desc("_src"), F.desc("_seq")
    )
    result = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src", "_seq")
    )

    def _write(df: DataFrame, target: str) -> None:
        writer = df.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target)

    # Stage first: `result` reads from `path`, so write-through would
    # clobber its own input mid-job.
    tmp = path.rstrip("/") + ".__staging__"
    _write(result, tmp)
    _write(spark.read.parquet(tmp), path)


def foreach_batch_upsert(
    path: str, keys: tuple[str, ...], partition_col: str | None = None
):
    """``foreachBatch`` body for Structured Streaming (ST1/ST5).

    Idempotent per the PK, so checkpoint-replayed batches are harmless —
    the exactly-once-effect contract the reference gets from Cassandra.
    """

    def _write(batch: DataFrame, batch_id: int) -> None:
        upsert_keyed_parquet(batch, path, keys, partition_col)

    return _write


def read_keyed_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# ------------------------------------------------- additive agg sink
def additive_merge_parquet(
    batch: DataFrame,
    path: str,
    keys: tuple[str, ...],
    sums: dict,
) -> None:
    """Merge a RAW micro-batch into a storage-resident rollup: per key,
    stored sums grow by the batch's partial sums (plus an ``n_rows``
    count). The batch collapses to one partial row per key BEFORE the
    merge touches storage, so the rewrite is proportional to the key
    space, never the stream volume.

    This is the additive complement to :func:`upsert_keyed_parquet`
    (replace-by-PK): Spark's own streaming aggregation keeps per-key
    state in the STATE STORE, which is the wrong home when the key
    space is unbounded and the job must survive re-provisioning — here
    the rollup LIVES IN THE TABLE and the streaming job is stateless.
    At 100 TB the body becomes a Delta/Iceberg MERGE; this portable
    parquet form is the tested analog (same staging discipline as the
    upsert sink).
    """
    spark = batch.sparkSession
    partial = batch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(src).alias(out) for out, src in sums.items()],
    )
    if os.path.exists(path):
        old = spark.read.parquet(path).select(*partial.columns)
        merged = (
            old.unionByName(partial)
            .groupBy(*keys)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(out).alias(out) for out in sums],
            )
        )
    else:
        merged = partial
    tmp = path.rstrip("/") + ".__staging__"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)


def foreach_batch_additive(path: str, keys: tuple[str, ...], sums: dict):
    """``foreachBatch`` body for the additive rollup, with REPLAY
    PROTECTION: additive merges are not idempotent (a checkpoint-
    replayed batch would double-count), so the applied batch id is
    recorded next to the table and already-applied ids are skipped —
    the standard foreachBatch exactly-once-effect recipe for
    non-idempotent sinks."""
    applied_marker = path.rstrip("/") + ".__applied__"

    def _read_last() -> int:
        try:
            with open(applied_marker) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_last():
            return  # replayed batch: already folded into the table
        additive_merge_parquet(batch, path, keys, sums)
        with open(applied_marker, "w") as f:
            f.write(str(batch_id))

    return _apply
