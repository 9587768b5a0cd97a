"""Deterministic cache lifecycle for operators that persist big
intermediates.

The dedup pair miners and ANN index builders persist an O(corpus)
relation for two reasons: compute sharing (the verify join re-reads the
same hashed-shingle arrays the candidate join indexes) and as a plan
barrier (CollapseProject re-inlines expensive projections into every
consumer expression — measured 16× re-hashing in the MinHash signature
without it). A bare ``.persist()`` leaks in a long-lived session: the
operator returns a lazy DataFrame, so there is no point inside the
operator where the cache is both (a) already consumed and (b) safe to
drop.

The contract here makes release deterministic instead of GC-driven:

- :func:`materialize_release` eagerly materializes the (small) result
  via checkpointing while the caches are alive, then unpersists every
  cache. The returned DataFrame owns its own (checkpointed) blocks and
  no longer references the inputs. Note this makes operator results
  EAGER — callers that only want to inspect a plan should use the
  operator's ``materialize=False`` escape hatch where offered.
- :func:`release_result` frees those blocks once the caller is done —
  iterative loops use it to drop round N-1 after round N exists.

Checkpoint modes (:func:`set_checkpoint_mode`):

- ``"local"`` (default): ``localCheckpoint`` — fast, but blocks die
  with their executor. Right for single-JVM local mode and short jobs.
- ``"durable"``: ``checkpoint()`` to the context's checkpoint dir
  (``spark.sparkContext.setCheckpointDir`` must point at durable
  storage, e.g. an HDFS/S3 path). Survives executor churn — the right
  mode for a 1000-executor 100 TB run where losing a block mid-job
  would otherwise fail the lineage-free plan.
- ``"table"``: an explicit CHECKPOINT TABLE — the relation is written
  to parquet under :func:`set_checkpoint_table_dir`'s path and re-read
  (PLANS.md's "at 100 TB the persist becomes an explicit checkpoint
  table", as code). Unlike executor-memory blocks, the table survives
  executor churn AND session restarts, gets real file statistics +
  column pruning on the re-read, and its lifecycle is visible storage,
  not CacheManager state. :func:`materialize_release` /
  :func:`release_result` delete the backing directory (any Hadoop
  filesystem) — same deterministic release points as the block modes.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

try:  # py4j is always present under pyspark; guard for type-checkers only
    from py4j.protocol import Py4JError
except ImportError:  # pragma: no cover
    Py4JError = RuntimeError  # type: ignore[assignment,misc]

_CHECKPOINT_MODE = "local"
_VALID_MODES = ("local", "durable", "table")
_TABLE_DIR: str | None = None
_TABLE_SEQ = itertools.count()
# path attribute stashed on table-backed DataFrames so the release
# helpers can find the storage to delete
_TABLE_PATH_ATTR = "_simpss_checkpoint_table_path"


def set_checkpoint_mode(mode: str) -> None:
    """Select how :func:`materialize_release` checkpoints results.

    ``"local"`` = ``localCheckpoint`` (fast, executor-lifetime blocks);
    ``"durable"`` = ``checkpoint()`` against the SparkContext checkpoint
    dir (caller must have called ``setCheckpointDir`` on durable
    storage first). Process-global, like the Spark conf it mirrors.
    """
    global _CHECKPOINT_MODE
    if mode not in _VALID_MODES:
        raise ValueError(f"checkpoint mode {mode!r} not in {_VALID_MODES}")
    if mode == "table" and _TABLE_DIR is None:
        raise ValueError(
            "set_checkpoint_table_dir(path) must be called before "
            "selecting the 'table' mode"
        )
    _CHECKPOINT_MODE = mode


def set_checkpoint_table_dir(path: str | None) -> None:
    """Root directory (any Hadoop-filesystem URI — local path, hdfs://,
    s3a://) under which ``"table"``-mode checkpoints are written. Each
    checkpoint gets its own ``ckpt-N`` subdirectory."""
    global _TABLE_DIR
    _TABLE_DIR = path


def checkpoint_mode() -> str:
    return _CHECKPOINT_MODE


def _delete_path(spark, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API — works for
    whatever scheme the table dir uses, not just the local FS."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)


def _write_table(df: DataFrame) -> DataFrame:
    path = f"{_TABLE_DIR}/ckpt-{next(_TABLE_SEQ)}"
    df.write.mode("overwrite").parquet(path)
    out = df.sparkSession.read.parquet(path)
    setattr(out, _TABLE_PATH_ATTR, path)
    return out


def _checkpoint(df: DataFrame) -> DataFrame:
    if _CHECKPOINT_MODE == "table":
        return _write_table(df)
    if _CHECKPOINT_MODE == "durable":
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def cache_intermediate(df: DataFrame) -> DataFrame:
    """Cache a shared intermediate relation under the current mode:
    block modes ``persist()`` it (lazy — first action populates), the
    ``"table"`` mode materializes it as a checkpoint table and returns
    the re-read (which also acts as the plan barrier the persist was
    providing). Release through :func:`materialize_release`'s cache
    list or :func:`release_intermediate` — never raw ``unpersist`` —
    so the table-backed form is cleaned identically."""
    if _CHECKPOINT_MODE == "table":
        return _write_table(df)
    return df.persist()


def release_intermediate(df: DataFrame) -> None:
    """Free an intermediate from :func:`cache_intermediate` (unpersist
    or checkpoint-table delete, per how it was created)."""
    path = getattr(df, _TABLE_PATH_ATTR, None)
    if path is not None:
        _delete_path(df.sparkSession, path)
    else:
        df.unpersist()


def materialize_release(result: DataFrame, *caches: DataFrame) -> DataFrame:
    """Compute ``result`` now (while ``caches`` back it), then release
    every cache (unpersist, or directory delete for table-backed
    intermediates). Returns the checkpointed, input-independent
    result."""
    out = _checkpoint(result)
    for c in caches:
        release_intermediate(c)
    return out


def persistent_rdd_ids(spark) -> set:
    """IDs of every RDD currently holding persisted/checkpointed blocks
    in the context — the observable for cache-leak tests."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release_result(df: DataFrame) -> None:
    """Free the blocks behind an eagerly-checkpointed DataFrame.

    HARD failure mode, by contract: checkpoint blocks are irrecoverable
    once released — a released handle has no lineage to recompute from,
    so any later action on ``df`` (or a plan built over it) fails with
    missing-checkpoint-block errors rather than silently recomputing.
    Call this only when the handle is genuinely spent.

    Best-effort on the release itself: a non-checkpointed plan has no
    LogicalRDD to release (AttributeError/Py4JError from the plan walk),
    and the ContextCleaner remains the GC-driven fallback for those.
    Anything else propagates — a real unpersist failure should be seen,
    not swallowed.

    Table-backed results (``"table"`` mode) release by deleting their
    backing directory — the same irrecoverability contract, only the
    storage is files instead of blocks.
    """
    path = getattr(df, _TABLE_PATH_ATTR, None)
    if path is not None:
        _delete_path(df.sparkSession, path)
        return
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except (Py4JError, AttributeError):
        pass
