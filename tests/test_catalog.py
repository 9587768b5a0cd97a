"""Catalog must work on a session the caller configured — or didn't.

The external harness builds its own vanilla SparkSession and calls
``queries()[name](spark, sf_dir)`` directly, so ``load_table`` cannot rely
on any conf set by ``session.get_spark``. In particular ``events.parquet``
carries TIMESTAMP(NANOS) which vanilla Spark rejects (PARQUET_TYPE_ILLEGAL)
unless ``spark.sql.legacy.parquet.nanosAsLong`` is set at read time.
"""

from __future__ import annotations

from unimib_simpss_spark.catalog import TABLES, load_table


def test_events_readable_without_preconfigured_session(spark, sf_dir):
    """Simulate the driver: drop the nanos conf, then load via the catalog."""
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.count() > 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def test_events_ts_is_timestamp_not_bigint(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_all_tables_load(spark, sf_dir):
    for name in TABLES:
        assert load_table(spark, sf_dir, name).columns


def test_cli_list_and_unknown_query(capsys):
    """--list prints the full inventory without touching Spark; an
    unknown query name is a usage error (rc=2), not a traceback."""
    from unimib_simpss_spark.__main__ import main
    from unimib_simpss_spark.plans import registry

    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    for name in registry.queries():
        assert name in out
    assert "oracle-paired" in out and "rows-only" in out
    assert main(["definitely_not_a_query"]) == 2
