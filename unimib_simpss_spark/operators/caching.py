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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # py4j is always present under pyspark; guard for type-checkers only
    from py4j.protocol import Py4JError
except ImportError:  # pragma: no cover
    Py4JError = RuntimeError  # type: ignore[assignment,misc]

_CHECKPOINT_MODE = "local"
_VALID_MODES = ("local", "durable")


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
    _CHECKPOINT_MODE = mode


def checkpoint_mode() -> str:
    return _CHECKPOINT_MODE


def _checkpoint(df: DataFrame) -> DataFrame:
    if _CHECKPOINT_MODE == "durable":
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def materialize_release(result: DataFrame, *caches: DataFrame) -> DataFrame:
    """Compute ``result`` now (while ``caches`` back it), then unpersist
    every cache. Returns the checkpointed, input-independent result."""
    out = _checkpoint(result)
    for c in caches:
        c.unpersist()
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
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except (Py4JError, AttributeError):
        pass
