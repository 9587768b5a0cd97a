"""Join-strategy rewrites: salted joins, binned range joins, and
bloom-pruned semi joins.

Techniques Spark doesn't apply automatically in every case, written
as plan-level rewrites that preserve exact semantics:

- **Salted equi-join** — for a shuffle join where a handful of hot keys
  overwhelm their reducer: the skewed side gets a random salt in
  [0, S), the build side is replicated S× with every salt value, and
  the join key becomes (key, salt). AQE's skew-join splitting handles
  sort-merge spills; explicit salting is still the tool when the hot
  key is so large a single key must be spread across MANY tasks (AQE
  splits by partition, salting splits WITHIN a key), and for stateful
  streaming aggs where AQE doesn't apply.
- **Binned range join** — replaces the broadcast-nested-loop plan of
  ``a.v BETWEEN b.lo AND b.hi`` with an equi-join on overlapping
  fixed-width bins + residual predicate: cost drops from |A|·|B| to
  Σ co-binned pairs. This is the standard open-source answer to
  Databricks' range-join optimization.
- **Bloom-pruned semi join** — the runtime-filter pattern: build a
  Bloom bit relation from the (filtered) build side's keys, probe it
  MAP-SIDE on the probe side (broadcast joins against the ≤m-row bit
  relation, no shuffle), and only bloom-hit rows enter the real semi
  join. False positives are removed by the join, so the result is
  EXACTLY the plain semi join; the win is shuffle volume — at 100 TB
  the probe side's exchange shrinks to near the true match rate.
  Spark's own runtime bloom filter (spark.sql.optimizer.runtime.
  bloomFilter) covers inner joins when stats line up; this explicit
  form works on any build relation, composes with the portable
  oracle-checkable sketch (functions/sketches.py), and makes the
  pruning observable (the pre-filtered relation is a first-class
  DataFrame).

Salting uses a DETERMINISTIC salt (hash of a unique column, not
``rand()``) so results are reproducible and retries/speculative tasks
can't diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from unimib_simpss_spark.operators.ranking import broadcast_topk_rank
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_buckets: int = 8,
    salt_by: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted into ``salt_buckets``
    sub-keys and ``other`` replicated once per salt value.

    ``salt_by``: column of ``skewed`` whose hash picks the salt
    (default: the join key's row — uses a uniform spread over all
    columns via ``xxhash64``). Exact same rows as a plain join; the
    only change is shuffle placement.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, got {how!r}: "
            "replicating the build side breaks right/full semantics"
        )
    salt_src = F.xxhash64(F.col(salt_by)) if salt_by else F.xxhash64(*skewed.columns)
    a = skewed.withColumn("_salt", F.pmod(salt_src, F.lit(salt_buckets)).cast("int"))
    b = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = a.join(b, [on, "_salt"], how)
    return out.drop("_salt")


def binned_range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how_residual: Column | None = None,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Range join ``facts.value BETWEEN ranges.lo AND ranges.hi`` as an
    equi-join on fixed-width bins.

    Each range row is exploded to every bin it overlaps (cheap when
    ``bin_width`` ≈ typical range width); each fact row maps to exactly
    one bin. The bin equi-join co-partitions both sides (shuffle hash
    join — broadcast not required), and the residual BETWEEN filter
    restores exact semantics. ``how_residual`` appends an extra join
    predicate evaluated after the bin match.
    """
    v = F.col(value_col)
    fb = facts.withColumn("_bin", F.floor(v / bin_width).cast("long"))
    rb = ranges.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    rb = rb.withColumnRenamed("_bin", "_rbin")
    # Locally-built range frames carry no stats, so without a hint the
    # planner may broadcast the FACT side (BuildLeft — measured 5×
    # slower at bench scale). Small range tables: broadcast them
    # explicitly; huge ones: broadcast_ranges=False co-partitions both
    # sides on the bin (the actual scale path).
    if broadcast_ranges:
        rb = F.broadcast(rb)
    joined = fb.join(rb, F.col("_bin") == F.col("_rbin"))
    pred = v.between(F.col(lo_col), F.col(hi_col))
    if how_residual is not None:
        pred = pred & how_residual
    return joined.where(pred).drop("_bin", "_rbin")


def key_skew_profile(
    df: DataFrame, key, top_n: int = 10, ndigits: int = 4
) -> DataFrame:
    """Join/agg-key skew PROFILER — the measurement that decides when
    the two rewrites above are worth their cost: before salting a key
    or splitting a range join, something has to quantify how hot the
    hot keys actually are.

    Two tagged legs (union-compatible):

    - ``'hot'``: the ``top_n`` heaviest keys — rank, key (as string),
      row count, and the key's share of all rows;
    - ``'summary'``: one row — total rows, distinct keys, the max
      per-key count, and ``skew_factor`` = max count / mean count
      (1.0 = perfectly uniform; the classic rule of thumb salts keys
      whose factor exceeds the per-task budget).

    Scale shape: one combinable groupBy on the key (map-side partial
    aggregation collapses the hot key BEFORE the shuffle — profiling a
    skewed key does not itself skew), then ``TakeOrderedAndProject``
    for the top-N and a 1-row rollup; nothing after the first
    aggregate is larger than the key cardinality. Deterministic ties:
    count desc, key asc. NULL keys count as a key (rendered as the
    string 'NULL') — a null-heavy join column is the most common skew
    in the wild and must show up in the profile, not vanish from it.
    """
    k = F.col(key) if isinstance(key, str) else key
    counts = (
        df.select(F.coalesce(k.cast("string"), F.lit("NULL")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    # Rank the ≤ top_n hot rows window-free (broadcast_topk_rank —
    # the shared TakeOrderedAndProject + broadcast-self-join pattern):
    # same deterministic result as a global row_number window, without
    # the partition-less WindowExec and its "moving all data to a
    # single partition" warning.
    hot = (
        broadcast_topk_rank(counts, top_n, "cnt", "k")
        .join(F.broadcast(tot.select("n_rows")), how="cross")
        .select(
            F.lit("hot").alias("section"),
            F.col("rank").cast("long").alias("rank"),
            F.col("k").alias("key"),
            F.col("cnt").alias("cnt"),
            F.round(F.col("cnt") / F.col("n_rows"), ndigits).alias("share"),
            F.lit(None).cast("long").alias("n_rows"),
            F.lit(None).cast("long").alias("n_keys"),
            F.lit(None).cast("double").alias("skew_factor"),
        )
    )
    summary = tot.select(
        F.lit("summary").alias("section"),
        F.lit(None).cast("long").alias("rank"),
        F.lit(None).cast("string").alias("key"),
        F.lit(None).cast("long").alias("cnt"),
        F.lit(None).cast("double").alias("share"),
        "n_rows",
        "n_keys",
        # cast-first: max_cnt × n_keys as a long product overflows at
        # extreme cardinalities (DuckDB would error, Spark would wrap);
        # the double product is the same expression order both engines
        F.round(
            F.col("max_cnt").cast("double") * F.col("n_keys") / F.col("n_rows"),
            ndigits,
        ).alias("skew_factor"),
    )
    return hot.unionAll(summary)


def key_skew_profile_sql(
    table: str, key_expr: str, top_n: int = 10, ndigits: int = 4
) -> str:
    """DuckDB text twin of :func:`key_skew_profile`."""
    return f"""
    WITH counts AS (
        SELECT coalesce(CAST({key_expr} AS VARCHAR), 'NULL') AS k,
               count(*) AS cnt
        FROM {table} GROUP BY 1
    ), tot AS (
        SELECT sum(cnt) AS n_rows, count(*) AS n_keys, max(cnt) AS max_cnt
        FROM counts
    ), hot AS (
        SELECT k, cnt, row_number() OVER (ORDER BY cnt DESC, k) AS rank
        FROM counts ORDER BY cnt DESC, k LIMIT {top_n}
    )
    SELECT 'hot' AS section, CAST(rank AS BIGINT) AS rank, k AS key,
           CAST(cnt AS BIGINT) AS cnt,
           round(cnt / CAST(n_rows AS DOUBLE), {ndigits}) AS share,
           CAST(NULL AS BIGINT) AS n_rows, CAST(NULL AS BIGINT) AS n_keys,
           CAST(NULL AS DOUBLE) AS skew_factor
    FROM hot CROSS JOIN tot
    UNION ALL
    SELECT 'summary', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           CAST(n_rows AS BIGINT), CAST(n_keys AS BIGINT),
           round(CAST(max_cnt AS DOUBLE) * n_keys / n_rows, {ndigits})
    FROM tot
    """


def bloom_pruned_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """LEFT SEMI join with a Bloom runtime filter on the probe side —
    exactly the rows of ``probe.join(build, key, "left_semi")``, but
    the probe relation is pre-filtered MAP-SIDE against a Bloom bit
    relation of the build keys before any shuffle.

    Cost model: the bit relation is ≤ m rows (built with one combinable
    aggregate over the build keys, broadcast to the probe scan), so the
    probe side's shuffle exchange carries only bloom-hit rows — true
    matches plus the Bloom false-positive rate — instead of the whole
    relation. The final semi join removes false positives, so the
    rewrite is semantics-preserving at ANY m/k: sizing only tunes how
    much shuffle is saved. NULL probe keys never match a semi join and
    never pass the bloom gate — identical drop on both paths.

    This is the manual form of the runtime-filter optimization
    (Spark's spark.sql.optimizer.runtime.bloomFilter covers inner
    equi-joins when stats qualify); explicit, so it applies to any
    build relation and the pruned intermediate stays observable.
    """
    from unimib_simpss_spark.functions.sketches import (
        BLOOM_K,
        BLOOM_M,
        bloom_bits,
        bloom_probe,
    )

    m = BLOOM_M if m is None else m
    k = BLOOM_K if k is None else k
    bits = bloom_bits(build.select(build_key), build_key, m=m, k=k)
    pre = (
        bloom_probe(bits, probe, probe_key, m=m, k=k, hit_col="__bloom_hit")
        .where(F.col("__bloom_hit") == 1)
        .drop("__bloom_hit")
    )
    return pre.join(
        build, pre[probe_key] == build[build_key], "left_semi"
    )
