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
  via ``localCheckpoint`` while the caches are alive, then unpersists
  every cache. The returned DataFrame owns its own (checkpointed)
  blocks and no longer references the inputs.
- :func:`release_result` frees those blocks once the caller is done —
  iterative loops use it to drop round N-1 after round N exists.

Scale note: ``localCheckpoint`` trades fault-tolerance for speed (blocks
die with their executor). On a real cluster with executor churn, point
``spark.sparkContext.setCheckpointDir`` at durable storage and swap in
``.checkpoint()``; the lifecycle contract is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_release(result: DataFrame, *caches: DataFrame) -> DataFrame:
    """Compute ``result`` now (while ``caches`` back it), then unpersist
    every cache. Returns the checkpointed, input-independent result."""
    out = result.localCheckpoint(eager=True)
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

    Best-effort by design: a non-checkpointed plan has no LogicalRDD to
    release, and the ContextCleaner remains the GC-driven fallback.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
