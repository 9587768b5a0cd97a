"""Lakehouse table layout helpers: partitioned + bucketed + clustered
writes, and the read-side guarantees they buy.

At 100 TB the dominant costs are shuffles and full scans; the layout
tools here remove both for known access patterns:

- ``write_clustered``: hive-partition by a coarse key (partition
  PRUNING at read: only matching directories are listed) and sort rows
  within files by the clustering keys (min/max stats make range scans
  skip row groups) — the lakehouse restatement of the reference's
  Cassandra layout: PRIMARY KEY (sensor_group, sensor_id,
  time_received) = partition dir + file sort order
  (link_kafka_cassandra.py:33-46).
- ``write_bucketed``: hash-bucket by join key into a saved table; two
  tables bucketed the same way join WITHOUT any Exchange — the shuffle
  happens once at write time, then every subsequent join is free. This
  is how a fact table that joins the same dimension daily should be
  stored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: str,
    cluster_by: tuple[str, ...],
    mode: str = "overwrite",
) -> None:
    """Partition directories by ``partition_by``; sort rows within each
    output file by ``cluster_by`` (sortWithinPartitions — no global
    shuffle beyond the partition split)."""
    (
        df.repartition(partition_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .partitionBy(partition_by)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table (bucket pruning + shuffle-free
    joins between co-bucketed tables)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_sharded(
    df: DataFrame,
    path: str,
    n_shards: int,
    key: str,
    order_col: str | None = None,
) -> None:
    """Write exactly ``n_shards`` evenly-loaded parquet files with
    deterministic, rerun-stable content — the corpus-writer shape for
    a training-data export (downstream loaders want same-size shards
    and reproducible shard membership, not whatever partitioning the
    last shuffle left behind).

    Shard assignment is ``xxhash64(key) % n_shards`` (uniform and
    append-stable per row, like operators/sampling's splits). The rows
    are co-located per shard with one shuffle, then written
    ``partitionBy("shard")`` so every shard is exactly one directory
    with exactly one file — note a bare ``repartition(n, shard)`` would
    NOT guarantee that: it places rows by ``hash(shard_value) % n``,
    and two shard ids can collide into one partition leaving another
    empty. Rows are sorted within each shard so file content is
    deterministic given identical input; no global sort anywhere.
    """
    from pyspark.sql import functions as F

    shard = F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards))
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", order_col or key)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def analyze_table(
    spark: SparkSession, table: str, columns: tuple[str, ...] = ()
) -> None:
    """Collect table- and column-level statistics for Catalyst's
    cost-based optimizer (``ANALYZE TABLE``): row counts and size feed
    join-strategy selection; per-column NDV/min/max/null counts feed
    join REORDERING (``spark.sql.cbo.enabled`` +
    ``spark.sql.cbo.joinReorder.enabled``).

    The 100 TB practice this packages: AQE fixes plans at runtime from
    observed shuffle sizes, but it cannot reorder a five-way star join
    — only CBO's cardinality estimates can, and they only exist if
    something runs ANALYZE after each load. One stats pass per
    ingest/compaction cycle is the going rate for sane plans on big
    managed tables.
    """
    # backtick-quote each identifier part: reserved words and
    # dotted/hyphenated names must not break (or reshape) the statement
    qtable = ".".join(f"`{p}`" for p in table.split("."))
    spark.sql(f"ANALYZE TABLE {qtable} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(f"`{c}`" for c in columns)
        spark.sql(
            f"ANALYZE TABLE {qtable} COMPUTE STATISTICS FOR COLUMNS {cols}"
        )
