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

    (
        df.withColumn("shard", shard_col(key, n_shards))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", order_col or key)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


_MANIFEST_DIR = "_MANIFEST"
_DIGEST_MOD = (1 << 61) - 1  # Mersenne: order-free sum stays in a long


def shard_col(key: str, n_shards: int):
    """THE shard-membership expression — ``pmod(xxhash64(key),
    n_shards)``. Single definition: :func:`write_sharded`, the
    manifest machinery, and the streaming manifest sink
    (``streaming/sinks.foreach_batch_release_manifest``) must all
    bucket identically or the loader-side digest contract silently
    breaks (review r18 pass 3)."""
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards))


def _shard_manifest(df: DataFrame, token_col: str | None) -> DataFrame:
    """Per-shard integrity rows over a shard-tagged corpus: row count,
    token mass, and an ORDER-FREE content digest — the per-row 60-bit
    md5 hash of the full row (fixed column order via to_json of a
    struct) summed in decimal and folded mod a Mersenne prime, so the
    digest is independent of row order and partitioning, overflow-free
    to 10^18 rows, and any single-row change moves it."""
    from pyspark.sql import functions as F

    from unimib_simpss_spark.functions.hashing import hash64

    data_cols = sorted(c for c in df.columns if c != "shard")
    h = hash64(F.to_json(F.struct(*[F.col(c) for c in data_cols])))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(
            F.sum(h.cast("decimal(38,0)")), F.lit(_DIGEST_MOD)
        )
        .cast("long")
        .alias("digest"),
    ]
    if token_col is not None:
        aggs.insert(
            1, F.sum(F.col(token_col)).cast("long").alias("n_tokens")
        )
    else:
        aggs.insert(1, F.lit(None).cast("long").alias("n_tokens"))
    return df.groupBy("shard").agg(*aggs)


def write_corpus_release(
    df: DataFrame,
    path: str,
    n_shards: int,
    key: str,
    token_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """The finished-corpus RELEASE: :func:`write_sharded`'s
    deterministic hash-bucketed shards plus a ``_MANIFEST`` parquet —
    one row per shard with ``(n_rows, n_tokens, digest)`` — written
    LAST, so a crashed or partial release is machine-detectable (no
    manifest ⇒ not a release; see :func:`validate_corpus_release`).
    This is the contract a training loader actually needs from a data
    drop: reproducible shard membership (hash-bucketed, append-stable),
    same-size files, and checksums it can verify shard-by-shard without
    trusting the producer. The manifest records ``token_col`` as a
    constant metadata column, so the validator recomputes under the
    WRITER's definition instead of trusting a caller parameter (a
    mismatched guess would read as whole-release corruption — review
    r18 pass 3; the streaming twin stores ``n_shards`` for the same
    reason). Re-running over identical input rewrites byte-identical
    shards and an identical manifest (mode=overwrite end-to-end).
    Returns the manifest DataFrame (read back from storage, so the
    caller holds the published artifact, not a recomputation plan)."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    write_sharded(df, path, n_shards, key, order_col)
    man = _shard_manifest(spark.read.parquet(path), token_col).withColumn(
        "token_col", F.lit(token_col).cast("string")
    )
    man.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{_MANIFEST_DIR}"
    )
    return spark.read.parquet(f"{path}/{_MANIFEST_DIR}")


def validate_corpus_release(spark: SparkSession, path: str) -> DataFrame:
    """Loader-side integrity check of a :func:`write_corpus_release`
    drop: recompute the per-shard manifest from the shard data —
    under the manifest's own stored ``token_col``, so the check cannot
    be derailed by a caller guessing the writer's settings — and
    compare row-for-row against the published one. Raises ValueError
    naming the bad shards on any mismatch (bit rot, a lost/truncated
    shard directory, a tampered row — the digest catches value edits
    that preserve counts), when the shard data is missing entirely,
    and when no manifest exists (a crashed release never publishes
    one). Returns the verified manifest. Cost: one scan of the
    release — the same price the loader pays to read it."""
    from pyspark.sql.utils import AnalysisException

    try:
        stored = spark.read.parquet(f"{path}/{_MANIFEST_DIR}")
    except AnalysisException as exc:
        raise ValueError(
            f"no manifest at {path}/{_MANIFEST_DIR} — incomplete or "
            "crashed release (the manifest is written last)"
        ) from exc
    tc_row = stored.select("token_col").first()
    token_col = tc_row["token_col"] if tc_row is not None else None
    # plain directory read: parquet listing skips underscore-prefixed
    # children, so _MANIFEST is excluded WITHOUT a glob (a glob would
    # both mis-expand metachar-bearing paths and raise an uncaught
    # AnalysisException when every shard dir is lost — review r18
    # pass 3); shard=N dirs come back as the partition column
    try:
        data = spark.read.parquet(path)
    except AnalysisException as exc:
        raise ValueError(
            f"corpus release at {path} has a manifest but no readable "
            "shard data — the shard directories are lost"
        ) from exc
    if "shard" not in data.columns:
        raise ValueError(
            f"corpus release at {path} has a manifest but no shard=N "
            "directories — the shard layout is lost"
        )
    fresh = _shard_manifest(data, token_col)
    s = {r["shard"]: (r["n_rows"], r["n_tokens"], r["digest"])
         for r in stored.collect()}
    f = {r["shard"]: (r["n_rows"], r["n_tokens"], r["digest"])
         for r in fresh.collect()}
    bad = sorted(
        k for k in (s.keys() | f.keys()) if s.get(k) != f.get(k)
    )
    if bad:
        raise ValueError(
            f"corpus release at {path} failed validation on shards "
            f"{bad}: stored={[s.get(k) for k in bad]} "
            f"recomputed={[f.get(k) for k in bad]}"
        )
    return stored


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


# --------------------------------------------------------- compaction
def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file metadata of a parquet table: one row per data file with
    its hive-partition directory (relative to ``path``), name, and
    size. Hidden/marker files (``_SUCCESS``, ``.crc``) are skipped.

    The listing walks the Hadoop FileSystem recursively — a METADATA
    operation, O(#files) driver rows, which is the same inventory any
    compactor (Delta OPTIMIZE, Iceberg rewrite_data_files) must hold;
    table formats keep it in their metadata layer, plain parquet pays a
    listing. The rows become a DataFrame so the planning aggregation
    itself runs on the cluster."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    root_str = fs.makeQualified(root).toString().rstrip("/")
    rows = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        full = p.toString()
        rel = full[len(root_str):].lstrip("/")
        # exclude hidden/marker paths by ANY component, not just the
        # basename: a failed/concurrent write leaves real-looking
        # part files under _temporary/..., and table formats keep
        # _delta_log/ — none of it is table data
        if any(part.startswith(("_", ".")) for part in rel.split("/")):
            continue
        part_dir = rel.rsplit("/", 1)[0] if "/" in rel else ""
        rows.append((part_dir, name, int(st.getLen())))
    return spark.createDataFrame(
        rows, "partition_dir string, file string, size_bytes long"
    )


def file_span_stats(path: str, cols: tuple[str, ...]) -> list[dict]:
    """Per-file parquet footer min/max spans for ``cols`` — the exact
    statistics a stats-aware reader (Delta/Iceberg data skipping, or
    Spark's parquet row-group filters) consults to decide which files a
    predicate must touch. One dict per data file:
    ``{"file": name, "<col>_min": lo, "<col>_max": hi, ...}``.

    Footer-only reads — O(#files) metadata, no data pages; a table
    format would serve the same numbers from its metadata layer without
    touching storage. Local-path form (the container's test surface);
    the spans logic is storage-agnostic."""
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet") or f.startswith(("_", ".")):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        row: dict = {"file": f}
        for col in cols:
            lo, hi = None, None
            complete = True
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema != col:
                        continue
                    # a statistics object can exist WITHOUT min/max
                    # (e.g. double columns containing NaN; ADVICE r11)
                    # — and a file-level span computed from only SOME
                    # row groups would let pruned_file_count skip a
                    # file whose stat-less rows it never saw, so any
                    # gap voids the whole file's span (None = must
                    # touch, the conservative reading every
                    # data-skipping reader applies)
                    if c.statistics is None or not c.statistics.has_min_max:
                        complete = False
                        break
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
                if not complete:
                    break
            if not complete:
                lo, hi = None, None
            row[f"{col}_min"], row[f"{col}_max"] = lo, hi
        out.append(row)
    return out


def pruned_file_count(
    path: str, predicate_bands: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(files_total, files_a_stats_aware_reader_must_touch) for a
    conjunctive band predicate ``{col: (lo, hi)}`` — a file is touched
    iff its footer span overlaps EVERY band (NULL stats → must touch).
    This is the pruning arithmetic data-skipping readers run; returning
    it as numbers makes layout quality (Z-order vs linear sort)
    driver-checkable."""
    spans = file_span_stats(path, tuple(predicate_bands))
    must = 0
    for row in spans:
        touch = True
        for col, (lo, hi) in predicate_bands.items():
            mn, mx = row[f"{col}_min"], row[f"{col}_max"]
            if mn is None or mx is None:
                continue  # no stats → cannot skip
            if mx < lo or mn > hi:
                touch = False
                break
        must += int(touch)
    return len(spans), must


def compaction_plan(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_fraction: float = 0.5,
) -> DataFrame:
    """The small-files diagnosis + prescription, per partition
    directory: how many files exist, how many are 'small' (under
    ``small_fraction × target_bytes``), total bytes, the file count a
    compaction should produce (``ceil(total/target)``), and the
    recommended action —

    - ``'compact'``: more files than the target count AND at least two
      small ones (the rewrite would genuinely reduce file count);
    - ``'ok'``: layout already within budget.

    Why this matters at 100 TB: every file under ~a task's worth of
    bytes costs a full task-scheduling + footer-read + open/close
    overhead; a partition with 10k × 1 MB files reads ~50× slower than
    the same bytes in 80 × 128 MB files, and the driver pays the
    listing on every query. Streaming sinks and over-partitioned
    shuffles are the usual culprits. One combinable groupBy over the
    metadata relation — never touches data bytes."""
    from pyspark.sql import functions as F

    small = F.lit(int(target_bytes * small_fraction))
    agg = (
        file_stats(spark, path)
        .groupBy("partition_dir")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum((F.col("size_bytes") < small).cast("long")).alias("n_small"),
            F.sum("size_bytes").alias("total_bytes"),
        )
        .withColumn(
            "n_target_files",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("total_bytes") / F.lit(target_bytes)).cast("long"),
            ),
        )
    )
    return agg.withColumn(
        "action",
        F.when(
            (F.col("n_files") > F.col("n_target_files"))
            & (F.col("n_small") >= 2),
            F.lit("compact"),
        ).otherwise(F.lit("ok")),
    )


def compact_to(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_fraction: float = 0.5,
    zorder_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Execute a :func:`compaction_plan`: rewrite each
    ``action='compact'`` partition directory of ``src_path`` into its
    planned file count under ``dst_path`` (same relative directory);
    ``'ok'`` directories are NOT rewritten (copy/link them, or leave
    the table split across generations the way Delta's OPTIMIZE leaves
    untouched files in place). Returns the plan that was executed.

    Rewrites to a NEW root rather than in place: in-place compaction
    of plain parquet cannot be atomic (a reader between delete and
    rename sees a torn table) — table formats solve this with metadata
    swaps; plain parquet solves it with a directory swap after the
    write finishes. ``coalesce(n)`` (not repartition) does each
    rewrite: no shuffle, just task merging — the bytes stream through
    once."""
    plan = compaction_plan(spark, src_path, target_bytes, small_fraction)
    todo = [
        (r.partition_dir, int(r.n_target_files))
        for r in plan.where("action = 'compact'").collect()
    ]
    for part_dir, n_files in todo:
        src = f"{src_path}/{part_dir}" if part_dir else src_path
        dst = f"{dst_path}/{part_dir}" if part_dir else dst_path
        if zorder_cols:
            write_zordered(
                spark.read.parquet(src), dst, zorder_cols, n_files
            )
        else:
            (
                spark.read.parquet(src)
                .coalesce(n_files)
                .write.mode("overwrite")
                .parquet(dst)
            )
    return plan


# ---------------------------------------------------------- Z-ordering
def zorder_value(cols: tuple[str, ...], bits: int = 16):
    """Morton (Z-order) key over 2+ columns as a pure Column
    expression: each column's value is min-max normalized to a
    ``bits``-bit bucket rank (against ``<col>__min``/``<col>__max``
    companion columns the caller must attach — one broadcast stats
    row), then the bucket bits are interleaved.

    Why: single-key clustering (``write_clustered``) gives perfect
    min/max file pruning on ONE column and none on the others; the
    space-filling curve bounds every file's span on EVERY participating
    column (each file covers a small hypercube of the value space), so
    parquet min/max stats skip files for predicates on ANY of them —
    Delta's ``OPTIMIZE ZORDER BY``, restated as a sort key. All integer
    Column arithmetic; no UDF.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    # The interleaved key must fit a signed 64-bit long: bits landing in
    # the sign bit would invert the range-partition order for the high
    # half of the key space and silently destroy the per-file hypercube
    # bound. Scale per-column resolution down to what 63 bits afford
    # (4 cols → 15 bits each), which preserves correctness at slightly
    # coarser pruning granularity.
    if bits * n > 63:
        bits = 63 // n
        if bits < 1:
            raise ValueError(f"zorder cannot interleave {n} columns")
    ranks = []
    max_rank = (1 << bits) - 1
    for c in cols:
        v = F.col(c).cast("double")
        lo = F.col(f"{c}__min").cast("double")
        hi = F.col(f"{c}__max").cast("double")
        span = hi - lo
        r = F.when(span <= 0, F.lit(0)).otherwise(
            F.least(
                F.lit(max_rank).cast("long"),
                F.floor((v - lo) / span * F.lit(1 << bits)),
            )
        )
        ranks.append(r.cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned AND
    sorted by the Morton key over ``cols`` — every output file covers a
    bounded hypercube of the (col1, col2, ...) space, so min/max footer
    stats prune files for a selective predicate on ANY of the columns.

    Cost: one stats aggregate (min/max per column, a 1-row broadcast),
    then ONE range shuffle on the z key — the same bill as a plain
    sorted write. The curve does the multi-dimensional work."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[
            agg
            for c in cols
            for agg in (
                F.min(F.col(c).cast("double")).alias(f"{c}__min"),
                F.max(F.col(c).cast("double")).alias(f"{c}__max"),
            )
        ]
    )
    helper = [f"{c}__min" for c in cols] + [f"{c}__max" for c in cols]
    (
        df.join(F.broadcast(stats), how="cross")
        .withColumn("__z", zorder_value(cols, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *helper)
        .write.mode(mode)
        .parquet(path)
    )


# -------------------------------------------------------------- SCD2
def scd2_history(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    id_col: str,
    value_col: str,
    seed_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 history off an event/update
    stream: one VERSION row per value CHANGE per key, carrying
    ``valid_from`` / ``valid_to`` validity (valid_to NULL = the open
    current version) — the lakehouse dimension-table evolution layout
    (Kimball SCD2; what Delta/Iceberg MERGE writers materialize), built
    relationally from the same upsert stream q25's last-writer-wins
    read consumes.

    Semantics, pinned on both engines: updates order by ``(ts, id)``
    per key; an update opens a new version only when its value DIFFERS
    (NULL-safe) from the key's previous update — consecutive
    same-value writes collapse into the earlier version; each
    version's ``valid_to`` is the next version's ``valid_from``.
    NULL-ts rows are excluded (no position in time).

    One shuffle: the change-flag lag window, the post-filter lead
    window, and nothing else — filters preserve the key partitioning,
    so both windows share one exchange (plan-asserted in tests).
    DuckDB twin: :func:`scd2_history_sql`.

    ``seed_col``: an optional extra ordering column between ``ts`` and
    ``id`` (ascending) — the streaming merge sink passes its
    seed-vs-update flag here so an already-open version sorts strictly
    BEFORE a new update at the exact same timestamp, keeping the open
    version's identity stable across merges. Not part of the output."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    kcols = [F.col(k) for k in keys]
    order = [F.col(ts_col)]
    if seed_col is not None:
        order.append(F.col(seed_col))
    order.append(F.col(id_col))
    w = Window.partitionBy(*kcols).orderBy(*order)
    changed = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn(
            "_chg",
            ~F.col(value_col).eqNullSafe(F.lag(value_col).over(w))
            | F.lag(ts_col).over(w).isNull(),
        )
        .where(F.col("_chg"))
    )
    return changed.select(
        *keys,
        F.col(id_col).alias("version_id"),
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )


def scd2_asof(history: DataFrame, at: str) -> DataFrame:
    """Time-travel read of an SCD2 history: the version of each key
    valid AS OF timestamp ``at`` (valid_from <= at < valid_to, open
    versions unbounded) — at most one row per key by construction."""
    from pyspark.sql import functions as F

    t = F.to_timestamp(F.lit(at))
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def scd2_history_sql(
    keys: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`scd2_history` (same NULL-safe change rule
    and tie order)."""
    ks = ", ".join(keys)
    return f"""
    SELECT {ks}, {id_col} AS version_id, {value_col} AS value,
           {ts_col} AS valid_from,
           lead({ts_col}) OVER (
               PARTITION BY {ks} ORDER BY {ts_col}, {id_col}) AS valid_to
    FROM (
        SELECT *, ({value_col} IS DISTINCT FROM lag({value_col}) OVER w
                   OR lag({ts_col}) OVER w IS NULL) AS _chg
        FROM {table}
        WHERE {ts_col} IS NOT NULL
        WINDOW w AS (PARTITION BY {ks} ORDER BY {ts_col}, {id_col})
    )
    WHERE _chg
    """


def scd2_asof_sql(history_sql: str, at: str) -> str:
    """DuckDB twin of :func:`scd2_asof`."""
    return f"""
    SELECT * FROM ({history_sql})
    WHERE valid_from <= TIMESTAMP '{at}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{at}')
    """
