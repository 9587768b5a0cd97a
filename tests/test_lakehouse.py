"""Layout guarantees: partition pruning for clustered writes, and
shuffle-free joins between co-bucketed tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unimib_simpss_spark.sources.lakehouse import (
    read_table,
    write_bucketed,
    write_clustered,
)


@pytest.fixture(scope="module")
def warehouse_spark(tmp_path_factory):
    from unimib_simpss_spark.session import get_spark

    # NOTE: if a session already exists (full-suite order), getOrCreate
    # returns it and static conf like warehouse.dir CANNOT change — so
    # never assume a private warehouse here; tests clean up by table name.
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="lakehouse-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s


def _drop_table_and_location(spark, name: str) -> None:
    """Drop a managed table AND its on-disk location. A stale location
    without a catalog entry (prior run, different session) makes
    saveAsTable fail with LOCATION_ALREADY_EXISTS, so remove both."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


def test_clustered_write_prunes_partitions(warehouse_spark, tmp_path_factory):
    spark = warehouse_spark
    out = str(tmp_path_factory.mktemp("clustered") / "sensor_data")
    df = spark.createDataFrame(
        [(g, i, t) for g in ("g1", "g2", "g3") for i in range(4) for t in range(5)],
        "sensor_group string, sensor_id int, t int",
    )
    write_clustered(df, out, partition_by="sensor_group", cluster_by=("sensor_id", "t"))

    got = spark.read.parquet(out).where(F.col("sensor_group") == "g2")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(sensor_group" in plan
    assert got.count() == 20
    # rows inside each file are sorted by the clustering keys
    part = spark.read.parquet(f"{out}/sensor_group=g2")
    rows = [(r.sensor_id, r.t) for r in part.collect()]
    assert rows == sorted(rows)


def test_cobucketed_join_has_no_exchange(warehouse_spark):
    spark = warehouse_spark
    n = 1000
    facts = spark.range(n).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    dims = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    _drop_table_and_location(spark, "b_facts")
    _drop_table_and_location(spark, "b_dims")
    write_bucketed(facts, "b_facts", bucket_by="k", n_buckets=8, sort_by=("k",))
    write_bucketed(dims, "b_dims", bucket_by="k", n_buckets=8, sort_by=("k",))

    joined = read_table(spark, "b_facts").join(read_table(spark, "b_dims"), "k")
    # disable broadcast so the join would NEED a shuffle if buckets didn't align
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert joined.count() == n


def test_write_sharded_even_and_deterministic(spark, sf_dir, tmp_path):
    from unimib_simpss_spark.catalog import load_table
    from unimib_simpss_spark.sources.lakehouse import write_sharded

    docs = load_table(spark, sf_dir, "documents")
    n = 4
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_sharded(docs, out1, n_shards=n, key="doc_id")
    write_sharded(docs, out2, n_shards=n, key="doc_id")

    import glob

    dirs1 = sorted(glob.glob(f"{out1}/shard=*"))
    assert len(dirs1) == n
    # one file per shard directory
    for d in dirs1:
        assert len(glob.glob(f"{d}/part-*.parquet")) == 1
    total = docs.count()
    sizes = [spark.read.parquet(d).count() for d in dirs1]
    assert sum(sizes) == total
    # hash sharding is uniform: no shard more than 2x the ideal share
    assert max(sizes) <= 2 * (total // n + 1)
    # rerun-stable membership: same doc_ids land in the same shard
    for d1, d2 in zip(dirs1, sorted(glob.glob(f"{out2}/shard=*"))):
        ids1 = {r.doc_id for r in spark.read.parquet(d1).collect()}
        ids2 = {r.doc_id for r in spark.read.parquet(d2).collect()}
        assert ids1 == ids2


def test_analyze_table_feeds_cbo_statistics(warehouse_spark):
    """ANALYZE TABLE populates table and column statistics the
    cost-based optimizer reads (row count table-level; NDV/min/max
    column-level, visible via DESCRIBE EXTENDED)."""
    from unimib_simpss_spark.sources.lakehouse import analyze_table

    spark = warehouse_spark
    _drop_table_and_location(spark, "t_analyze")
    df = spark.range(1000).withColumn("k", F.pmod(F.col("id"), F.lit(10)))
    df.write.mode("overwrite").saveAsTable("t_analyze")
    try:
        analyze_table(spark, "t_analyze", columns=("id", "k"))
        det = spark.sql("DESCRIBE TABLE EXTENDED t_analyze").collect()
        stats = next(
            r.data_type for r in det if r.col_name == "Statistics"
        )
        assert "1000 rows" in stats, stats
        col = spark.sql("DESCRIBE EXTENDED t_analyze k").collect()
        info = {r.info_name: r.info_value for r in col}
        assert info.get("distinct_count") == "10", info
    finally:
        _drop_table_and_location(spark, "t_analyze")


def test_analyze_table_quotes_reserved_identifiers(warehouse_spark):
    """ADVICE r8: reserved-word column names (e.g. `order`) must be
    backtick-quoted in the generated ANALYZE statements."""
    from unimib_simpss_spark.sources.lakehouse import analyze_table

    spark = warehouse_spark
    _drop_table_and_location(spark, "t_quoted")
    df = spark.range(100).withColumn("order", F.pmod(F.col("id"), F.lit(5)))
    df.write.mode("overwrite").saveAsTable("t_quoted")
    try:
        analyze_table(spark, "t_quoted", columns=("order",))
        col = spark.sql("DESCRIBE EXTENDED t_quoted `order`").collect()
        info = {r.info_name: r.info_value for r in col}
        assert info.get("distinct_count") == "5", info
    finally:
        _drop_table_and_location(spark, "t_quoted")


class TestCompaction:
    """file_stats / compaction_plan / compact_to: the small-files
    diagnosis and rewrite (metadata-only planning; shuffle-free
    coalesce rewrite)."""

    def _fragmented_table(self, spark, root):
        # 2 partition dirs; p=0 fragmented into many tiny files, p=1
        # written as a single file (already compact)
        df = spark.range(2000).selectExpr("id", "id % 2 AS p")
        (
            df.where("p = 0").repartition(20)
            .write.mode("overwrite").parquet(f"{root}/p=0")
        )
        (
            df.where("p = 1").coalesce(1)
            .write.mode("overwrite").parquet(f"{root}/p=1")
        )

    def test_file_stats_lists_data_files_only(self, spark, tmp_path):
        from unimib_simpss_spark.sources.lakehouse import file_stats

        root = str(tmp_path / "frag")
        self._fragmented_table(spark, root)
        rows = file_stats(spark, root).collect()
        assert all(not r.file.startswith(("_", ".")) for r in rows)
        by_dir = {}
        for r in rows:
            by_dir.setdefault(r.partition_dir, []).append(r)
            assert r.size_bytes > 0
        assert len(by_dir["p=0"]) == 20
        assert len(by_dir["p=1"]) == 1

    def test_plan_flags_fragmented_partition_only(self, spark, tmp_path):
        from unimib_simpss_spark.sources.lakehouse import compaction_plan

        root = str(tmp_path / "frag")
        self._fragmented_table(spark, root)
        # tiny target so the fragmented dir still plans >1 output file
        plan = {
            r.partition_dir: r
            for r in compaction_plan(
                spark, root, target_bytes=64 * 1024
            ).collect()
        }
        assert plan["p=0"].action == "compact"
        assert plan["p=0"].n_files == 20
        assert 1 <= plan["p=0"].n_target_files < 20
        assert plan["p=1"].action == "ok"

    def test_compact_to_rewrites_to_planned_count_and_preserves_rows(
        self, spark, tmp_path
    ):
        from unimib_simpss_spark.sources.lakehouse import (
            compaction_plan,
            compact_to,
        )

        root = str(tmp_path / "frag")
        out = str(tmp_path / "compacted")
        self._fragmented_table(spark, root)
        plan = compact_to(spark, root, out, target_bytes=64 * 1024)
        want = {
            r.partition_dir: int(r.n_target_files)
            for r in plan.where("action = 'compact'").collect()
        }
        assert set(want) == {"p=0"}
        import os

        got_files = [
            f for f in os.listdir(f"{out}/p=0") if f.endswith(".parquet")
        ]
        assert len(got_files) == want["p=0"]
        # row-level parity on the rewritten partition
        a = sorted(r.id for r in spark.read.parquet(f"{root}/p=0").collect())
        b = sorted(r.id for r in spark.read.parquet(f"{out}/p=0").collect())
        assert a == b
        # untouched partition was not rewritten
        assert not os.path.exists(f"{out}/p=1")
        # and the rewritten layout now audits clean
        after = {
            r.partition_dir: r.action
            for r in compaction_plan(
                spark, out, target_bytes=64 * 1024
            ).collect()
        }
        assert after["p=0"] == "ok"
