"""Table catalog over the driver-generated parquet test tables.

``spark.read.parquet`` gives Catalyst full pushdown (predicate + column
pruning reach the scan — verify with ``df.explain('formatted')`` →
``PushedFilters`` / ``ReadSchema``). At 100 TB these tables would be
partitioned/bucketed lakehouse tables; the reader API is identical.
"""

from __future__ import annotations

import os

from py4j.protocol import Py4JError
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimensions small enough to broadcast at ANY scale factor (fixed-cardinality
# in TPC-H semantics). customer/supplier/part grow with SF — let Catalyst/AQE
# decide for those.
ALWAYS_BROADCAST: frozenset[str] = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_nanos_readable(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet readable on ANY session.

    ``events.parquet`` is written with nanosecond timestamps, which vanilla
    Spark rejects with PARQUET_TYPE_ILLEGAL. The legacy conf is
    runtime-settable, so set it here — callers (including external harnesses
    that build their own SparkSession) must not need a specially-configured
    session just to read a table.
    """
    # The conf intentionally STAYS set on the session (no restore): the
    # scan executes lazily, possibly long after load_table returns, and
    # still needs it then. Narrow guard: only "conf not recognized /
    # not runtime-settable" is survivable — the read below then surfaces
    # a clear error if nanos support is genuinely absent.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except (Py4JError, AnalysisException):
        # AnalysisException = CANNOT_MODIFY_CONFIG on builds where the
        # legacy conf is static; Py4JError = gateway-level rejection.
        pass


def _ensure_timestamps_ltz(spark: SparkSession) -> None:
    """Read naive parquet TIMESTAMP(MICROS) as session-tz TIMESTAMP.

    Driver-generated data stores isAdjustedToUTC=false micros (events.ts,
    lineitem.l_shipdate, orders.o_orderdate), which Spark 3.4+ surfaces
    as TIMESTAMP_NTZ by default. Disabling NTZ inference at the READER
    (rather than casting after the scan) matters for performance, not
    just types: a cast projection between scan and filter blocks parquet
    predicate pushdown — measured 2× on the q01 lineitem scan at sf0.1.
    Same conf-stays-set / narrow-guard contract as
    :func:`_ensure_nanos_readable`; the cast in :func:`load_table`
    remains as the fallback when the conf is rejected.
    """
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except (Py4JError, AnalysisException):
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        _ensure_nanos_readable(spark)
    _ensure_timestamps_ltz(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read via nanosAsLong: truncate to
        # microseconds exactly as DuckDB does when reading the same file.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) columns (events.ts,
    # lineitem.l_shipdate, orders.o_orderdate in driver-generated data)
    # surface as TIMESTAMP_NTZ on vanilla Spark 3.4+. Normalize to the
    # session-tz TIMESTAMP the engine (and the DuckDB oracle compare,
    # which reads the same values as naive timestamps under the UTC
    # session tz) expects — windows/watermarks/interval arithmetic then
    # behave identically on every session, preconfigured or not.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> None:
    """Register tables as temp views for ``spark.sql`` queries.

    ``names`` defaults to all tables; queries that only reference one or
    two views should pass them explicitly — each registration costs a
    parquet footer/schema read (plus the events nanos conf path), which
    is pure overhead on a hot query path.
    """
    for name in names if names is not None else TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
