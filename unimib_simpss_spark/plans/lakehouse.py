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
_N_BUCKETS = 8


@query("x78_bucketed_join")  # run-time catalog tables → rows-only
def x78_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join proof: the fact (orders) and dimension
    (customer) relations written as BUCKETED tables on the join key
    (``bucketBy`` + ``sortBy`` — Spark's pre-partitioned lakehouse
    layout; Hive-compatible bucketing, the open-table analog of a
    co-located distribution key), then sort-merge-joined and compared
    against the same join over the raw parquet.

    Output: one row per variant, ``(variant, exchanges, n_rows,
    custkey_sum)`` — ``exchanges`` counts ``Exchange hashpartitioning``
    nodes in the EXECUTED physical plan. The bucketed variant must
    show 0 (both sides' bucket layout already satisfies the join's
    clustering, so the shuffle is planned away entirely); the raw
    variant shows 2 (both sides repartition). This is THE
    100 TB repeated-join economics: a fact table joined on the same
    key every day pays its shuffle once at write time, not per query.
    ``custkey_sum`` is an order-independent integer checksum proving
    both variants join the same rows.

    Rows-only entry (the x74 pattern): the result depends on run-time
    catalog tables and a physical-plan property DuckDB cannot
    reproduce; run-determinism is covered by the sweep. The MERGE
    hint pins the comparison to sort-merge on both variants (a
    broadcast plan would trivially have no hash exchange and prove
    nothing). Tables are uniquely named, externally pathed to a temp
    dir, and dropped in ``finally`` — no warehouse state leaks."""
    import shutil
    import tempfile
    import uuid

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    tag = uuid.uuid4().hex[:8]
    t_o, t_c = f"x78_orders_{tag}", f"x78_customer_{tag}"
    tmp = tempfile.mkdtemp(prefix="simpss-x78-")
    try:
        for name, df, key in ((t_o, orders, "o_custkey"), (t_c, cust, "c_custkey")):
            (
                df.write.mode("overwrite")
                .option("path", f"{tmp}/{name}")
                .bucketBy(_N_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(name)
            )

        def measure(left: DataFrame, right: DataFrame) -> tuple[int, int, int]:
            j = (
                left.hint("merge")
                .join(right, left["o_custkey"] == right["c_custkey"])
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(left["o_custkey"]).alias("ck"),
                )
            )
            import re

            # collect() (NOT first(): that runs a separate limit-1
            # plan and leaves THIS queryExecution un-executed) so the
            # string below is the final adaptive plan that actually
            # ran — review r15 pass 2 repro'd isFinalPlan=false after
            # a first(). An executed AdaptiveSparkPlan prints BOTH
            # "== Final Plan ==" and "== Initial Plan ==" sections;
            # count exchanges only in the plan that ran.
            row = j.collect()[0]
            phys = j._jdf.queryExecution().executedPlan().toString()
            final = phys.split("== Initial Plan ==")[0]
            n_ex = len(re.findall(r"\bExchange hashpartitioning", final))
            return n_ex, int(row["n"]), int(row["ck"])

        rows = []
        for variant, (lf, rt) in (
            ("bucketed", (spark.table(t_o), spark.table(t_c))),
            ("raw", (orders, cust)),
        ):
            n_ex, n, ck = measure(lf, rt)
            rows.append((variant, n_ex, n, ck))
        # materialized into local rows BEFORE the tables are dropped —
        # the returned DataFrame must stay collectible by the driver
        return spark.createDataFrame(
            rows,
            "variant string, exchanges long, n_rows long, custkey_sum long",
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")
        shutil.rmtree(tmp, ignore_errors=True)


@query("x81_corpus_release")  # run-time filesystem artifact → rows-only
def x81_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-RELEASE proof: the documents table shipped as a
    training-data drop (``sources/lakehouse.py: write_corpus_release``
    — deterministic hash-bucketed shards + a ``_MANIFEST`` parquet
    written last) and then verified loader-side
    (:func:`validate_corpus_release` recomputes every shard's row
    count, token mass, and order-free content digest from the data and
    compares row-for-row). Output = the VERIFIED manifest, one row per
    shard — the contract a downstream training loader checks before
    trusting a drop. Rows-only entry (the x74 pattern): the artifact
    is a run-time filesystem layout DuckDB-over-the-sources cannot
    reproduce; every column is deterministic given the input (shard
    membership is hash-bucketed, the digest is order-free), so the
    run-determinism sweep covers it. The temp release is removed in
    ``finally`` after the manifest is materialized to local rows."""
    import shutil as _shutil
    import tempfile as _tempfile

    from unimib_simpss_spark.sources.lakehouse import (
        validate_corpus_release,
        write_corpus_release,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", "n_chars"
    )
    tmp = _tempfile.mkdtemp(prefix="simpss-x81-")
    try:
        out = f"{tmp}/release"
        write_corpus_release(
            docs, out, n_shards=8, key="doc_id", token_col="n_chars"
        )
        man = validate_corpus_release(spark, out)
        rows = sorted(
            (
                int(r["shard"]),
                int(r["n_rows"]),
                int(r["n_tokens"]),
                int(r["digest"]),
            )
            for r in man.collect()
        )
        return spark.createDataFrame(
            rows, "shard int, n_rows long, n_tokens long, digest long"
        )
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)


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
