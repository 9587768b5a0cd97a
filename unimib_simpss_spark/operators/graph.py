"""PageRank over an undirected pair graph — node centrality for
near-duplicate corpora (the authority signal a curation pipeline can
use to pick cluster representatives or weight sources, complementing
the quality-ranked survivor rule in :mod:`.dedup`).

Power iteration as relational algebra, the same iterative-Spark
discipline as connected components (:mod:`.dedup`):

- every round is two key-shuffles (ranks ⋈ degree-annotated edges on
  the source, contribution groupBy on the destination) — no
  per-node driver state, no collect of anything graph-sized;
- each round's rank relation is an eager mode-switchable checkpoint
  (``caching.checkpoint_result``) so round N never replays rounds
  1..N−1, and round N−1's blocks release as soon as round N exists;
- the driver holds ONLY the L1 delta (one scalar action per round)
  and the iteration counter.

Undirected graphs have no dangling nodes (symmetrization gives every
node degree ≥ 1), so the teleport term is exactly ``(1−d)/n`` — no
dangling-mass redistribution pass. Isolated documents (no qualifying
pair) are not nodes here; their rank is the trivial baseline and the
caller can union them in if needed.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "doc1",
    dst: str = "doc2",
    damping: float = 0.85,
    max_iters: int = 100,
    tol: float | None = 1e-6,
    ndigits: int = 6,
    weight: str | None = None,
    seeds: DataFrame | None = None,
    seed_col: str = "node",
) -> DataFrame:
    """PageRank of the undirected graph given as an edge list (each
    pair listed once in either orientation; self-loops and duplicate
    pairs are canonicalized away; NULL endpoints drop). Returns
    ``(node, rank, degree)`` with ``rank`` rounded to ``ndigits``
    (ranks sum to ~1 over the graph's nodes).

    ``weight`` names an optional positive edge-weight column
    (e.g. the cosine score a kNN similarity edge already carries):
    each node then spreads its rank proportionally to edge weight —
    contribution along (u,v) is ``rank_u * w(u,v) / wdeg(u)`` with
    ``wdeg`` the node's summed edge weight — the curation-grade
    centrality where a 0.99-cosine neighbor pulls more than a 0.60
    one. Duplicate pairs SUM their weights during canonicalization
    (multigraph semantics); rows with NULL, NaN, or non-positive
    weight carry no mass and are excluded exactly like NULL
    endpoints. The ``degree`` output column
    stays the NEIGHBOR COUNT in both modes (schema-stable); weighted
    degree is internal.

    ``seeds`` switches to PERSONALIZED PageRank (topic-sensitive;
    Haveliwala 2002): the teleport mass lands uniformly on
    ``seeds[seed_col]`` instead of all nodes, so ranks measure
    proximity to the seed set — the "spread trust from my vetted
    high-quality documents" signal for curation. Seed ids not in the
    graph are ignored (all-ignored raises); the rank vector still
    sums to ~1, initialized on the seeds. Composes with ``weight``.

    Iterates until the L1 rank delta falls below ``tol`` or
    ``max_iters`` rounds, whichever first (``pagerank.last_iters``
    records the count; the loop raises on non-convergence only if
    ``tol`` is set and never reached — pass ``tol=None`` for a fixed
    ``max_iters`` schedule). Keep the pair self-consistent: the L1
    delta decays ~``damping^t``, so reaching ``tol`` needs about
    ``log(tol)/log(damping)`` rounds (the defaults: 1e-6 ≈ 85 < 100);
    production fan-outs usually prefer the fixed schedule — 10-15
    rounds differentiate ranks well past the output rounding and the
    cost is bounded up front."""
    from unimib_simpss_spark.operators.caching import (
        checkpoint_result,
        release_result,
    )

    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    # long-id contract enforced LOUDLY (review r13): a string/uuid id
    # column would cast to all-NULL and silently return an empty
    # ranking — map non-integral ids to a surrogate long upstream
    for c in (src, dst):
        t = edges.schema[c].dataType.simpleString()
        if t not in ("bigint", "int", "smallint", "tinyint"):
            raise ValueError(
                f"pagerank needs integral node ids; column {c!r} is "
                f"{t} — derive a surrogate long id (e.g. xxhash64) "
                "before ranking"
            )
    # seed schema validation is pure inspection — run it BEFORE any
    # checkpoint so the error path leaks nothing (review r14)
    if seeds is not None:
        st = seeds.schema[seed_col].dataType.simpleString()
        if st not in ("bigint", "int", "smallint", "tinyint"):
            raise ValueError(
                f"seed column {seed_col!r} must be integral like the "
                f"node ids, got {st}"
            )
    u, v = F.col(src).cast("long"), F.col(dst).cast("long")
    ok = u.isNotNull() & v.isNotNull() & (u != v)
    if weight is None:
        canon = (
            edges.where(ok)
            .select(
                F.least(u, v).alias("_lo"), F.greatest(u, v).alias("_hi")
            )
            .distinct()
            .withColumn("_w", F.lit(1.0))
        )
    else:
        wc = F.col(weight).cast("double")
        canon = (
            edges.where(ok & wc.isNotNull() & ~F.isnan(wc) & (wc > 0))
            .select(
                F.least(u, v).alias("_lo"),
                F.greatest(u, v).alias("_hi"),
                wc.alias("_w"),
            )
            .groupBy("_lo", "_hi")
            .agg(F.sum("_w").alias("_w"))
        )
    sym = canon.select(
        F.col("_lo").alias("_u"), F.col("_hi").alias("_v"), "_w"
    ).unionAll(
        canon.select(
            F.col("_hi").alias("_u"), F.col("_lo").alias("_v"), "_w"
        )
    )
    deg = sym.groupBy("_u").agg(
        F.count(F.lit(1)).alias("_deg"), F.sum("_w").alias("_wdeg")
    )
    # degree-annotated edges are the loop-invariant relation — build
    # and checkpoint once, every round joins against it
    sym_deg = checkpoint_result(sym.join(deg, "_u"))
    n = sym_deg.select("_u").distinct().count()
    if n == 0:
        release_result(sym_deg)
        pagerank.last_iters = 0
        return edges.sparkSession.createDataFrame(
            [], "node long, rank double, degree long"
        )
    base = (1.0 - damping) / n
    nodes = sym_deg.select(F.col("_u").alias("_n")).distinct()
    if seeds is None:
        base_df = None
        ranks = checkpoint_result(
            nodes.select("_n", F.lit(1.0 / n).alias("_r"))
        )
    else:
        s_in = checkpoint_result(
            seeds.select(F.col(seed_col).cast("long").alias("_n"))
            .where(F.col("_n").isNotNull())
            .distinct()
            .join(nodes, "_n", "semi")
        )
        nseeds = s_in.count()
        if nseeds == 0:
            release_result(s_in)
            release_result(sym_deg)
            raise ValueError(
                "personalized pagerank: no seed id appears in the graph"
            )
        # per-node teleport share and initial mass — loop-invariant,
        # checkpointed once like the degree-annotated edges
        base_df = checkpoint_result(
            nodes.join(s_in.withColumn("_seed", F.lit(1)), "_n", "left")
            .select(
                "_n",
                F.when(
                    F.col("_seed") == 1, (1.0 - damping) / nseeds
                ).otherwise(0.0).alias("_b"),
                F.when(F.col("_seed") == 1, 1.0 / nseeds)
                .otherwise(0.0)
                .alias("_r0"),
            )
        )
        release_result(s_in)
        ranks = checkpoint_result(
            base_df.select("_n", F.col("_r0").alias("_r"))
        )
    iters = 0
    converged = tol is None
    for iters in range(1, max_iters + 1):
        spread = (
            sym_deg.join(ranks, sym_deg["_u"] == ranks["_n"])
            .select(
                F.col("_v").alias("_n"),
                (F.col("_r") * F.col("_w") / F.col("_wdeg")).alias("_c"),
            )
            .groupBy("_n")
            .agg(F.sum("_c").alias("_s"))
        )
        if base_df is None:
            contribs = spread.select(
                "_n", (F.lit(base) + F.lit(damping) * F.col("_s")).alias("_r")
            )
        else:
            contribs = spread.join(base_df, "_n").select(
                "_n",
                (F.col("_b") + F.lit(damping) * F.col("_s")).alias("_r"),
            )
        new_ranks = checkpoint_result(contribs)
        if tol is not None:
            delta = (
                ranks.alias("a")
                .join(new_ranks.alias("b"), F.col("a._n") == F.col("b._n"))
                .select(
                    F.abs(F.col("a._r") - F.col("b._r")).alias("_d")
                )
                .agg(F.sum("_d"))
                .collect()[0][0]
            )
        release_result(ranks)
        ranks = new_ranks
        if tol is not None and delta < tol:
            converged = True
            break
    if not converged:
        release_result(ranks)
        release_result(sym_deg)
        if base_df is not None:
            release_result(base_df)
        raise ValueError(
            f"pagerank did not converge to tol={tol} in {max_iters} "
            "rounds — raise max_iters or pass tol=None for a fixed "
            "iteration schedule"
        )
    pagerank.last_iters = iters
    # degree read back off the CHECKPOINTED edge relation — the lazy
    # `deg` would replay the caller's (possibly expensive) edge miner
    degs = sym_deg.select("_u", "_deg").distinct()
    out = checkpoint_result(
        ranks.join(degs, ranks["_n"] == degs["_u"]).select(
            F.col("_n").alias("node"),
            F.round("_r", ndigits).alias("rank"),
            F.col("_deg").alias("degree"),
        )
    )
    release_result(ranks)
    release_result(sym_deg)
    if base_df is not None:
        release_result(base_df)
    return out
