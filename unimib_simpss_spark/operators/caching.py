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
import threading as _threading
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame

try:  # py4j is always present under pyspark; guard for type-checkers only
    from py4j.protocol import Py4JError
except ImportError:  # pragma: no cover
    Py4JError = RuntimeError  # type: ignore[assignment,misc]

_CHECKPOINT_MODE = "local"
_VALID_MODES = ("local", "durable", "table")
# Namespaced root for this session's checkpoint tables: the user-supplied
# dir plus a per-session uuid component, so two drivers (or a restarted
# session) pointed at the same root can never clobber each other's
# surviving ckpt-N tables — the counter below is process-local and WOULD
# restart at 0.
_TABLE_DIR: str | None = None
_TABLE_SEQ = itertools.count()
# path attribute stashed on table-backed DataFrames so the release
# helpers can find the storage to delete without a plan walk
_TABLE_PATH_ATTR = "_simpss_checkpoint_table_path"
# Registry of every table path written and not yet released. Release
# does not depend on the caller holding the exact returned handle: a
# transformed handle (``.select``, a re-created wrapper) loses the
# Python attribute, and the registry + input-file match below still
# finds (and deletes) the backing directory. Mirrors the
# ``persistent_rdd_ids`` hygiene observable for block-mode caches.
_LIVE_TABLE_PATHS: set[str] = set()


# ------------------------------------------------ pre-checkpoint lint
# VERDICT r10 #1: the registry hands out eagerly-checkpointed handles,
# so the 60-query scale-clean sweep lints post-checkpoint SCANS — the
# candidate joins, CC iterations, and GEMM stages the linter exists to
# police are exactly the plans it never saw. The capture hook below
# records a lint of every DataFrame ENTERING this layer (i.e. the
# pre-materialization plan, lineage intact) while a capture context is
# open; tests/test_plan_lint.py sweeps the heavy operator family under
# it with the same named-allowlist discipline as the registry sweep.
# Zero cost when no capture is active (one None check per checkpoint).
_LINT_SINK: list | None = None
# Explicit label override for lints captured inside worker threads: a
# host that submits checkpoint_result/cache_intermediate to a pool has
# no frame of its own on the worker thread's stack, so the walk below
# would label those lints "thread.run" and decouple them from the
# host's allowlist entry (optimization r18 — q61's per-leg concurrent
# checkpoints). Thread-local so concurrent hosts cannot cross-label.
_LINT_LABEL = _threading.local()


@contextmanager
def lint_label(label: str):
    """Attribute lints captured while open to ``label`` instead of the
    stack walk — for checkpoints submitted to pool threads."""
    prev = getattr(_LINT_LABEL, "v", None)
    _LINT_LABEL.v = label
    try:
        yield
    finally:
        _LINT_LABEL.v = prev


@contextmanager
def capture_checkpoint_lints():
    """Collect ``(label, findings)`` for every plan checkpointed or
    cached while open; ``label`` is the nearest non-caching caller
    (``module.function``), so findings map back to the operator whose
    interior plan they describe. Nestable; inner captures shadow."""
    global _LINT_SINK
    prev, sink = _LINT_SINK, []
    _LINT_SINK = sink
    try:
        yield sink
    finally:
        _LINT_SINK = prev


def _lint_incoming(df: DataFrame) -> None:
    if _LINT_SINK is None:
        return
    import inspect

    from unimib_simpss_spark.operators.plan_lint import lint_plan

    label = getattr(_LINT_LABEL, "v", None)
    if label is None:
        label = "?"
        for fr in inspect.stack()[1:]:
            mod = fr.frame.f_globals.get("__name__", "")
            if not mod.endswith("operators.caching"):
                label = f"{mod.rsplit('.', 1)[-1]}.{fr.function}"
                break
    _LINT_SINK.append((label, lint_plan(df)))


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
    call starts a fresh per-session namespace ``<path>/sess-<uuid>``
    and each checkpoint gets its own ``ckpt-N`` subdirectory inside it,
    so concurrent or restarted sessions sharing a root never collide.
    Passing ``None`` clears the dir and is rejected while the ``table``
    mode is active (the next checkpoint would otherwise write to a
    nonsense relative path)."""
    global _TABLE_DIR
    if path is None:
        if _CHECKPOINT_MODE == "table":
            raise ValueError(
                "cannot clear the checkpoint table dir while mode is "
                "'table'; call set_checkpoint_mode first"
            )
        _TABLE_DIR = None
        return
    _TABLE_DIR = f"{path.rstrip('/')}/sess-{uuid.uuid4().hex[:12]}"


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
    if _TABLE_DIR is None:  # mode was flipped behind our back
        raise ValueError(
            "checkpoint mode is 'table' but no table dir is set; call "
            "set_checkpoint_table_dir(path) first"
        )
    # mode('overwrite') is safe: the per-session uuid namespace makes the
    # path unique, so the only thing overwritten is a partial write from
    # this same session's failed attempt.
    path = f"{_TABLE_DIR}/ckpt-{next(_TABLE_SEQ)}"
    df.write.mode("overwrite").parquet(path)
    out = df.sparkSession.read.parquet(path)
    setattr(out, _TABLE_PATH_ATTR, path)
    _LIVE_TABLE_PATHS.add(path)
    return out


def _checkpoint(df: DataFrame) -> DataFrame:
    _lint_incoming(df)
    if _CHECKPOINT_MODE == "table":
        return _write_table(df)
    if _CHECKPOINT_MODE == "durable":
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def checkpoint_result(df: DataFrame) -> DataFrame:
    """Eagerly checkpoint ``df`` under the current mode — the
    mode-switchable form of ``df.localCheckpoint(eager=True)`` that
    iterative operators (connected components' per-round label
    relation) must use so the ``"table"`` mode really covers the heavy
    lineage-truncation path, not just the shared-intermediate caches.
    Pair with :func:`release_result`."""
    return _checkpoint(df)


def cache_intermediate(df: DataFrame) -> DataFrame:
    """Cache a shared intermediate relation under the current mode:
    block modes ``persist()`` it (lazy — first action populates), the
    ``"table"`` mode materializes it as a checkpoint table and returns
    the re-read (which also acts as the plan barrier the persist was
    providing). Release through :func:`materialize_release`'s cache
    list or :func:`release_intermediate` — never raw ``unpersist`` —
    so the table-backed form is cleaned identically."""
    _lint_incoming(df)
    if _CHECKPOINT_MODE == "table":
        return _write_table(df)
    return df.persist()


def _strip_scheme(p: str) -> str:
    if p.startswith("file://"):
        return p[len("file://"):]
    if p.startswith("file:"):
        return p[len("file:"):]
    return p


def _backing_table_path(df: DataFrame) -> str | None:
    """Locate the live checkpoint table backing ``df``, surviving handle
    transformations.

    Fast path: the Python attribute stashed by :func:`_write_table`.
    Fallback: match the plan's input files against the live-path
    registry — a ``.select``/re-created wrapper loses the attribute but
    keeps the file scan. Two guards on the fallback:

    - a BLOCK-persisted handle (its own ``persist()``/cache) is never
      resolved to a table it merely READS — releasing it must
      unpersist its blocks, not delete upstream storage another handle
      still needs (the mode-flip trap: ``cache_intermediate`` in local
      mode over a table-backed input);
    - if the plan reads MORE than one live table (e.g. a join of two
      table-backed intermediates), releasing "the" backing table is
      ambiguous and we raise rather than guess.

    Contract note: any non-persisted handle whose scan reads a live
    table IS that table for release purposes — releasing one view
    releases the storage for every view (the same irrecoverability
    contract as ``release_result``)."""
    path = getattr(df, _TABLE_PATH_ATTR, None)
    if path is not None and path in _LIVE_TABLE_PATHS:
        return path
    if not _LIVE_TABLE_PATHS:
        return None
    try:
        if df.storageLevel.useMemory or df.storageLevel.useDisk:
            return None  # block-persisted: release = unpersist, always
    except Exception:
        pass
    try:
        files = df.inputFiles()
    except Exception:  # non-file-backed plan; nothing to match
        return None
    hits = {
        live
        for live in _LIVE_TABLE_PATHS
        for f in files
        if _strip_scheme(f).startswith(_strip_scheme(live).rstrip("/") + "/")
    }
    if len(hits) > 1:
        raise ValueError(
            f"plan reads {len(hits)} live checkpoint tables "
            f"({sorted(hits)}); release each original handle explicitly"
        )
    return next(iter(hits), None)


def live_checkpoint_tables() -> frozenset:
    """Paths of every table-mode checkpoint written and not yet
    released — the observable for table-mode leak tests, mirroring
    :func:`persistent_rdd_ids`."""
    return frozenset(_LIVE_TABLE_PATHS)


def sweep_checkpoint_tables(spark) -> int:
    """Delete every live checkpoint table (end-of-job hygiene / test
    teardown). Returns the number of directories removed."""
    n = 0
    for path in list(_LIVE_TABLE_PATHS):
        _delete_path(spark, path)
        _LIVE_TABLE_PATHS.discard(path)
        n += 1
    return n


def _release_table(df: DataFrame, path: str) -> None:
    _delete_path(df.sparkSession, path)
    _LIVE_TABLE_PATHS.discard(path)


def release_intermediate(df: DataFrame) -> None:
    """Free an intermediate from :func:`cache_intermediate` (unpersist
    or checkpoint-table delete, per how it was created). Table-backed
    handles are found via the live-path registry, so releasing a
    transformed handle still deletes the right directory."""
    path = _backing_table_path(df)
    if path is not None:
        _release_table(df, path)
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


@contextmanager
def release_on_error(caches: list, handles: list | None = None):
    """Guard a multi-leg host's assembly (ADVICE r18): if anything in
    the block raises — a pool leg, a .result(), the final materialize —
    release every cache and every already-materialized handle appended
    to the tracked lists before the exception propagates. Without it a
    failing leg leaks its siblings' persisted blocks (or, in "table"
    checkpoint mode, written directories nothing ever deletes). Pass
    the SAME list objects the host appends to as it builds; releases
    are best-effort (the exception in flight is the one that matters).
    """
    try:
        yield
    except BaseException:
        for df in list(caches):
            try:
                release_intermediate(df)
            except Exception:
                pass
        for df in list(handles or ()):
            try:
                release_result(df)
            except Exception:
                pass
        raise


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
    path = _backing_table_path(df)
    if path is not None:
        _release_table(df, path)
        return
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except (Py4JError, AttributeError):
        pass
