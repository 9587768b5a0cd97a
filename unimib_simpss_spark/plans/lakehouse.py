"""Lakehouse-layout proof queries: Z-order clustering's file-pruning
payoff, measured as numbers instead of asserted in a unit test.

The reference persists telemetry into a time-clustered Cassandra table
(`link_kafka_cassandra.py:45` — PRIMARY KEY (sensor_group, sensor_id,
time_received)): physical clustering IS its query-performance story.
The Spark-first analog at 100 TB is layout management on the object
store — small-file compaction plus multi-dimensional clustering so
parquet footer stats prune files for predicates on ANY clustered
column (Delta's OPTIMIZE ZORDER BY, restated as a Morton sort key in
`sources/lakehouse.py`).

x74 turns the pytest-only proof (tests/test_lakehouse.py) into a
driver-visible query: write the same 2-D relation twice — Z-ordered vs
linearly sorted on the leading key — then count, from the parquet
footers, how many files a conjunctive two-column band predicate forces
a stats-aware reader to touch. Rows-only entry: the output depends on
a filesystem layout written at run time, which DuckDB-over-the-source
tables cannot reproduce; determinism across reruns is covered by the
run-determinism sweep (range-partition boundaries are sample-based but
seeded deterministically from the input partitioning).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unimib_simpss_spark.catalog import load_table
from unimib_simpss_spark.plans.registry import query

_N_FILES = 16


@query("x74_zorder_pruning")  # run-time filesystem layout → rows-only
def x74_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-pruning proof for Z-order clustered writes: the events
    relation projected to (user_id, value), written as ``_N_FILES``
    parquet files twice — ``zorder`` (Morton key over both columns) and
    ``linear`` (range-sorted by user_id only) — then probed with a
    conjunctive two-column band predicate (the middle ~20% of each
    column's range).

    Output: one row per layout, ``(layout, files_total, files_read,
    rows)`` — ``files_read`` = files whose footer min/max span overlaps
    BOTH bands (the data-skipping arithmetic of Delta/Iceberg readers,
    computed by ``sources.lakehouse.pruned_file_count``), ``rows`` =
    the predicate's true row count (identical for both layouts; layout
    changes cost, never answers). The Z-ordered layout bounds every
    file's span on EVERY clustered column, so it reads strictly fewer
    files than the linear sort whenever the predicate touches the
    non-leading column — the 100 TB reason to cluster."""
    from unimib_simpss_spark.sources.lakehouse import (
        pruned_file_count,
        write_zordered,
    )

    src = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("double").alias("x"),
            F.col("value").cast("double").alias("y"),
        )
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    lo_x, hi_x, lo_y, hi_y = src.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).first()
    bands = {
        "x": (lo_x + 0.40 * (hi_x - lo_x), lo_x + 0.60 * (hi_x - lo_x)),
        "y": (lo_y + 0.40 * (hi_y - lo_y), lo_y + 0.60 * (hi_y - lo_y)),
    }

    tmp = tempfile.mkdtemp(prefix="simpss-x74-")
    try:
        zpath, lpath = f"{tmp}/zorder", f"{tmp}/linear"
        write_zordered(src, zpath, ("x", "y"), n_files=_N_FILES)
        (
            src.repartitionByRange(_N_FILES, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(lpath)
        )
        pred = (
            F.col("x").between(*bands["x"]) & F.col("y").between(*bands["y"])
        )
        rows = []
        for layout, path in (("zorder", zpath), ("linear", lpath)):
            total, read = pruned_file_count(path, bands)
            n = spark.read.parquet(path).where(pred).count()
            rows.append((layout, total, read, n))
        # materialized into local rows BEFORE the temp dir is removed —
        # the returned DataFrame must stay collectible by the driver
        return spark.createDataFrame(
            rows,
            "layout string, files_total long, files_read long, rows long",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
