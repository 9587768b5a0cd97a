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


def test_corpus_release_manifest_roundtrip(spark, sf_dir, tmp_path):
    """write_corpus_release publishes shards + a per-shard manifest
    (rows, token mass, order-free digest); validate_corpus_release
    verifies a clean drop, detects a lost shard and a tampered row,
    and flags a manifest-less (crashed) release."""
    import shutil

    from unimib_simpss_spark.sources.lakehouse import (
        validate_corpus_release,
        write_corpus_release,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text", "n_chars"
    )
    out = str(tmp_path / "release")
    man = write_corpus_release(
        docs, out, n_shards=4, key="doc_id", token_col="n_chars"
    )
    rows = {r["shard"]: r for r in man.collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert sum(r["n_rows"] for r in rows.values()) == docs.count()
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows.values()) == total_chars
    # clean drop validates (the validator reads token_col from the
    # manifest itself — no caller guess to get wrong); identical rerun
    # publishes an identical manifest
    got = validate_corpus_release(spark, out)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, man.collect())
    )
    out2 = str(tmp_path / "release2")
    man2 = write_corpus_release(
        docs, out2, n_shards=4, key="doc_id", token_col="n_chars"
    )
    assert sorted(map(tuple, man2.collect())) == sorted(
        map(tuple, man.collect())
    )
    # a TAMPERED ROW that preserves row count and token mass is caught
    # by the digest alone: rewrite shard 1 with one text value edited
    sh1 = f"{out}/shard=1"
    d1 = spark.read.parquet(sh1)
    sch = d1.schema
    edited = [
        tuple(
            "TAMPERED" if (i == 0 and f.name == "text") else r[f.name]
            for f in sch.fields
        )
        for i, r in enumerate(d1.collect())
    ]
    spark.createDataFrame(edited, sch).coalesce(1).write.mode(
        "overwrite"
    ).parquet(sh1)
    with pytest.raises(ValueError, match=r"shards \[1\]"):
        validate_corpus_release(spark, out)
    # a lost shard directory is named in the failure
    shutil.rmtree(f"{out2}/shard=2")
    with pytest.raises(ValueError, match=r"shards \[2\]"):
        validate_corpus_release(spark, out2)
    # ALL shard dirs lost but the manifest intact: descriptive, not an
    # uncaught AnalysisException
    for d in (0, 1, 3):
        shutil.rmtree(f"{out2}/shard={d}")
    with pytest.raises(ValueError, match="shard"):
        validate_corpus_release(spark, out2)
    # a crashed release (no manifest) is flagged as such
    out3 = str(tmp_path / "release3")
    from unimib_simpss_spark.sources.lakehouse import write_sharded

    write_sharded(docs, out3, n_shards=2, key="doc_id")
    with pytest.raises(ValueError, match="incomplete or crashed"):
        validate_corpus_release(spark, out3)


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


class TestZOrder:
    """write_zordered: every output file must cover a bounded hypercube
    of the clustered columns' value space, measured from the actual
    parquet footer min/max stats — the property that makes min/max file
    skipping work on EITHER column, which a linear sort only provides
    for its leading key."""

    @staticmethod
    def _file_spans(path, col):
        import os

        import pyarrow.parquet as pq

        spans = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            assert lo is not None, (f, col)
            spans.append((lo, hi))
        return spans

    def test_zordered_files_bound_both_columns(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from unimib_simpss_spark.sources.lakehouse import write_zordered

        # 64x64 grid: x and y independent, both uniform on [0, 63]
        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
        zpath = str(tmp_path / "zorder")
        lpath = str(tmp_path / "linear")
        write_zordered(df, zpath, ("x", "y"), n_files=16)
        # linear comparison: same file count, sorted by x only
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(lpath)
        )
        # parity first: same rows
        a = sorted((r.x, r.y) for r in spark.read.parquet(zpath).collect())
        b = sorted((r.x, r.y) for r in df.collect())
        assert a == b

        def avg_span(path, col):
            spans = self._file_spans(path, col)
            return sum(hi - lo for lo, hi in spans) / len(spans) / 63.0

        # z-order: BOTH columns bounded per file (16 files over a 2-D
        # grid → each covers ~1/4 of each axis; allow slack)
        assert avg_span(zpath, "x") < 0.5
        assert avg_span(zpath, "y") < 0.5
        # linear: leading key tightly bounded, second key spans ~all
        assert avg_span(lpath, "x") < 0.2
        assert avg_span(lpath, "y") > 0.9

    def test_zorder_prunes_files_on_the_second_column(self, spark, tmp_path):
        """The operational payoff: a selective y predicate overlaps few
        z-ordered files (min/max skipping) but EVERY x-sorted file."""
        from pyspark.sql import functions as F

        from unimib_simpss_spark.sources.lakehouse import write_zordered

        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
        zpath = str(tmp_path / "zorder2")
        lpath = str(tmp_path / "linear2")
        write_zordered(df, zpath, ("x", "y"), n_files=16)
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(lpath)
        )

        def overlapping(path, lo, hi):
            spans = self._file_spans(path, "y")
            return sum(1 for mn, mx in spans if not (mx < lo or mn > hi))

        assert overlapping(zpath, 10, 13) <= 8   # skips at least half
        assert overlapping(lpath, 10, 13) == 16  # linear skips nothing

    def test_zorder_validates_inputs(self, spark):
        import pytest as _pytest

        from unimib_simpss_spark.sources.lakehouse import zorder_value

        with _pytest.raises(ValueError, match="at least 2"):
            zorder_value(("x",))

    def test_zorder_many_columns_stays_out_of_sign_bit(self, spark):
        """ADVICE r10 — 4 columns at the default bits=16 would
        interleave into bit 63 (the sign bit), inverting the range
        order for the high half of the key space; the resolution must
        scale down so the key stays a nonnegative, order-correct
        long."""
        from pyspark.sql import functions as F

        from unimib_simpss_spark.sources.lakehouse import zorder_value

        cols = ("a", "b", "c", "d")
        df = spark.range(256).select(
            *[F.col("id").cast("double").alias(c) for c in cols],
            *[F.lit(0.0).alias(f"{c}__min") for c in cols],
            *[F.lit(255.0).alias(f"{c}__max") for c in cols],
        )
        z = df.select(F.col("a"), zorder_value(cols).alias("z")).collect()
        assert all(r.z >= 0 for r in z)
        # order correctness along the diagonal: monotone in the value
        # (sign-bit overflow would flip the high half below the low)
        ordered = [r.z for r in sorted(z, key=lambda r: r.a)]
        assert ordered == sorted(ordered)
        assert ordered[-1] > ordered[0]


def test_compact_with_zorder_clusters_both_columns(spark, tmp_path):
    """compact_to(zorder_cols=...) = compaction + clustering in one
    byte pass (the OPTIMIZE-ZORDER shape): the rewritten partition has
    the planned file count AND bounded per-file spans on both z
    columns."""
    from pyspark.sql import functions as F

    from unimib_simpss_spark.sources.lakehouse import (
        compact_to,
        compaction_plan,
    )

    root = str(tmp_path / "zfrag")
    out = str(tmp_path / "zcompact")
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    df.repartition(24).write.mode("overwrite").parquet(f"{root}/p=0")
    plan = compact_to(
        spark, root, out, target_bytes=64 * 1024, zorder_cols=("x", "y")
    )
    want = int(
        plan.where("partition_dir = 'p=0'").collect()[0].n_target_files
    )
    import os

    files = [f for f in os.listdir(f"{out}/p=0") if f.endswith(".parquet")]
    assert len(files) == want
    a = sorted((r.x, r.y) for r in spark.read.parquet(f"{out}/p=0").collect())
    b = sorted((r.x, r.y) for r in df.collect())
    assert a == b
    spans = TestZOrder._file_spans(f"{out}/p=0", "y")
    if len(spans) >= 4:  # clustering only observable with several files
        avg = sum(hi - lo for lo, hi in spans) / len(spans) / 63.0
        assert avg < 0.7


def test_zorder_three_columns(spark, tmp_path):
    """The Morton key generalizes past 2-D: with 3 clustered columns
    every file bounds all three."""
    from pyspark.sql import functions as F

    from unimib_simpss_spark.sources.lakehouse import write_zordered

    df = spark.range(4096).select(
        (F.col("id") % 16).alias("x"),
        ((F.col("id") / 16) % 16).cast("long").alias("y"),
        (F.col("id") / 256).cast("long").alias("z"),
    )
    path = str(tmp_path / "z3")
    # NB: repartitionByRange picks boundaries by SAMPLING, so per-file
    # spans vary slightly between runs — use enough output files that
    # even a worst-draw boundary set stays clearly bounded, and assert
    # against a threshold with headroom (full-span would be 1.0)
    write_zordered(df, path, ("x", "y", "z"), n_files=16)
    assert sorted(
        (r.x, r.y, r.z) for r in spark.read.parquet(path).collect()
    ) == sorted((r.x, r.y, r.z) for r in df.collect())
    for col in ("x", "y", "z"):
        spans = TestZOrder._file_spans(path, col)
        avg = sum(hi - lo for lo, hi in spans) / len(spans) / 15.0
        assert avg < 0.8, (col, avg)


def test_pruned_file_count_and_x74_invariants(spark, sf_dir, tmp_path):
    """The driver-visible pruning proof (x74): pruned_file_count runs
    the data-skipping arithmetic on real footers, and the z-ordered
    layout never touches MORE files than the linear sort for a
    two-column band predicate — while both layouts return the same
    rows (layout changes cost, never answers)."""
    from pyspark.sql import functions as F

    from unimib_simpss_spark.plans.lakehouse import x74_zorder_pruning
    from unimib_simpss_spark.sources.lakehouse import (
        pruned_file_count,
        write_zordered,
    )

    # unit level: a hand-built grid where the answer is known
    df = spark.range(4096).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("long").cast("double").alias("y"),
    )
    path = str(tmp_path / "grid")
    write_zordered(df, path, ("x", "y"), n_files=16)
    total, read = pruned_file_count(path, {"x": (10.0, 20.0), "y": (10.0, 20.0)})
    assert total == 16 and 1 <= read < 16
    # a band outside the domain touches nothing
    _, read0 = pruned_file_count(path, {"x": (1e9, 2e9), "y": (10.0, 20.0)})
    assert read0 == 0

    # entry level: the registered query's invariants
    out = {r.layout: r for r in x74_zorder_pruning(spark, sf_dir).collect()}
    assert set(out) == {"zorder", "linear"}
    z, lin = out["zorder"], out["linear"]
    # range partitioning may leave a few empty partitions at tiny scale
    assert 1 <= z.files_total <= 16 and 1 <= lin.files_total <= 16
    assert z.rows == lin.rows  # layout never changes the answer
    assert z.files_read <= lin.files_read  # ...only the files touched


def test_file_span_stats_missing_min_max_is_must_touch(spark, tmp_path):
    """ADVICE r11 — a parquet statistics object can exist WITHOUT
    min/max (here: binary values past the writer's statistics-size
    truncation; NaN-bearing doubles under older writers are the same
    shape): the span must come back None (conservative must-touch),
    not raise TypeError on min(lo, None), and a file with only SOME
    stat-less row groups must void its whole span (the unseen rows
    could be anywhere)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from unimib_simpss_spark.sources.lakehouse import (
        file_span_stats,
        pruned_file_count,
    )

    path = tmp_path / "nostats"
    path.mkdir()
    big = "z" * 5000  # > the 4096-byte stats cap → has_min_max False
    pq.write_table(
        pa.table({"x": pa.array([big, big + "a"], pa.string())}),
        str(path / "a.parquet"),
    )
    pq.write_table(
        pa.table({"x": pa.array(["m", "n"], pa.string())}),
        str(path / "b.parquet"),
    )
    # one clean row group + one stat-less row group → whole span voided
    pq.write_table(
        pa.table({"x": pa.array(["c", "d", big, big], pa.string())}),
        str(path / "c.parquet"),
        row_group_size=2,
    )
    # the stat-less row group really is the shape the advice names
    md = pq.ParquetFile(str(path / "a.parquet")).metadata
    s = md.row_group(0).column(0).statistics
    assert s is not None and not s.has_min_max
    spans = {
        r["file"]: (r["x_min"], r["x_max"])
        for r in file_span_stats(str(path), ("x",))
    }
    assert spans["b.parquet"] == ("m", "n")
    assert spans["a.parquet"] == (None, None)
    assert spans["c.parquet"] == (None, None)
    total, read = pruned_file_count(str(path), {"x": ("e", "f")})
    assert total == 3
    # only the clean file is skippable; stat-less files must be touched
    assert read == 2


class TestScd2:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double"
        )

    def test_change_collapse_and_validity_chain(self, spark):
        """Consecutive same-value writes collapse into one version
        (NULL-safe: NULL->NULL is 'unchanged'); each version's
        valid_to is the NEXT version's valid_from; the last stays
        open."""
        import datetime as dt

        from unimib_simpss_spark.sources.lakehouse import scd2_history

        t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
        rows = [
            (1, t(0), 7, "temp", 10.0),
            (2, t(10), 7, "temp", 10.0),   # same value -> collapsed
            (3, t(20), 7, "temp", 12.0),   # change -> version 2
            (4, t(30), 7, "temp", None),   # change -> version 3
            (5, t(40), 7, "temp", None),   # NULL==NULL -> collapsed
            (6, t(50), 7, "temp", 12.0),   # change back -> version 4
            (7, None, 7, "temp", 99.0),    # NULL ts -> excluded
        ]
        got = sorted(
            (r.version_id, r.value, r.valid_from, r.valid_to)
            for r in scd2_history(
                self._ev(spark, rows), keys=("user_id", "event_type"),
                ts_col="ts", id_col="event_id", value_col="value",
            ).collect()
        )
        assert got == [
            (1, 10.0, t(0), t(20)),
            (3, 12.0, t(20), t(30)),
            (4, None, t(30), t(50)),
            (6, 12.0, t(50), None),
        ]

    def test_asof_boundaries_and_parity(self, spark, sf_dir):
        """as-of is inclusive at valid_from, exclusive at valid_to;
        open versions match any later time. Full history + snapshot
        parity vs the DuckDB twins on the fixture."""
        import datetime as dt

        import duckdb

        from unimib_simpss_spark.sources.lakehouse import (
            scd2_asof,
            scd2_asof_sql,
            scd2_history,
            scd2_history_sql,
        )

        t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
        hist = scd2_history(
            self._ev(spark, [
                (1, t(0), 7, "temp", 1.0),
                (2, t(10), 7, "temp", 2.0),
            ]),
            keys=("user_id", "event_type"), ts_col="ts",
            id_col="event_id", value_col="value",
        )
        at_boundary = scd2_asof(hist, "2024-01-01 00:10:00").collect()
        assert [r.version_id for r in at_boundary] == [2]  # from incl, to excl
        before = scd2_asof(hist, "2024-01-01 00:09:59").collect()
        assert [r.version_id for r in before] == [1]
        # fixture parity, both twins
        from unimib_simpss_spark.catalog import load_table

        e = load_table(spark, sf_dir, "events")
        h = scd2_history(e, ("user_id", "event_type"), "ts", "event_id", "value")
        got_h = sorted(map(tuple, h.collect()))
        got_a = sorted(map(tuple, scd2_asof(h, "2024-01-15 00:00:00").collect()))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
        hs = scd2_history_sql()
        want_h = sorted(map(tuple, con.sql(hs).fetchall()))
        want_a = sorted(map(tuple, con.sql(
            scd2_asof_sql(hs, "2024-01-15 00:00:00")).fetchall()))
        assert got_h == want_h and got_a == want_a and len(got_h) > 500

    def test_single_exchange_plan(self, spark, sf_dir):
        """lag change-flag + post-filter lead share one key exchange."""
        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.sources.lakehouse import scd2_history

        df = scd2_history(
            load_table(spark, sf_dir, "events"),
            ("user_id", "event_type"), "ts", "event_id", "value",
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_x78_entry_proves_exchange_elimination(spark, sf_dir):
    """The driver-visible bucketed-join entry must report 0 hash
    exchanges for the bucketed variant, 2 for raw parquet, and
    identical row counts/checksums (layout changes cost, never
    answers)."""
    from unimib_simpss_spark.plans import registry

    rows = {
        r.variant: (r.exchanges, r.n_rows, r.custkey_sum)
        for r in registry.queries()["x78_bucketed_join"](
            spark, sf_dir
        ).collect()
    }
    assert rows["bucketed"][0] == 0 and rows["raw"][0] == 2
    assert rows["bucketed"][1:] == rows["raw"][1:]
