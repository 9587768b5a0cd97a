"""Declarative data-quality constraint verification (SURVEY.md §2.7
[EXT] — the Deequ/Great-Expectations-shaped validation gate every
large-scale ingest runs before data is allowed downstream).

The reference validates its one dimension CSV imperatively — a pandas
loop raising on NaN / duplicate ids (utils.py:21-40, restated in
sources/csv_dim.py). This module is the general, engine-level form:
a rule set declared as data, verified in a CONSTANT number of bounded
aggregation passes, reported as one tiny relation (rule, n_rows,
n_violations, passed) that a pipeline gate can join, alert on, or
persist as an audit trail.

Rule classes and their 100 TB cost model:

- **row rules** (not-null, range, set-membership, regex, any boolean
  predicate): ALL of them fold into ONE aggregate over ONE scan — each
  rule is a conditional count (``sum(pred violated)``), map-side
  combined, output = one row per rule. Adding a rule adds a column to
  the partial aggregate, never a pass over the data.
- **uniqueness rules**: exact ``count - count(DISTINCT cols)`` — one
  expand-based aggregate per rule set, same bill as any distinct.
- **referential rules** (FK containment): LEFT ANTI join against the
  referenced key set, broadcast when the dimension is small (the usual
  case — the 100 TB side streams, the key side broadcasts).

Everything is pure Column arithmetic — no UDFs, no collects; the
result relation is O(#rules) rows regardless of input scale.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA_COLS = ("rule", "n_rows", "n_violations", "passed")


def check_row_rules(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Verify row-level predicates in ONE aggregation pass.

    ``rules`` maps rule name → Column predicate that must hold for
    every row (NULL predicate results count as violations — a rule
    that cannot evaluate did not hold). Returns one row per rule:
    ``(rule, n_rows, n_violations, passed)``, ``passed`` = 1 iff zero
    violations. Deterministic output order is the caller's sort.
    """
    if not rules:
        raise ValueError("check_row_rules needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules.items():
        # violated when the predicate is false OR null (three-valued
        # logic: un-evaluable is not "held")
        aggs.append(
            F.sum(
                F.when(pred.isNull() | ~pred, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    # Unpivot the single aggregate row into long format with ONE
    # explode — a union of per-rule projections would re-plan the
    # aggregate (and the input scan) once per rule.
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.coalesce(F.col(f"__v_{name}"), F.lit(0))
                .cast("long")
                .alias("v"),
            )
            for name in rules
        ]
    )
    return (
        one.select(
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_rows"),
            F.explode(pairs).alias("p"),
        )
        .select(
            F.col("p.rule").alias("rule"),
            "n_rows",
            F.col("p.v").alias("n_violations"),
        )
        .withColumn("passed", (F.col("n_violations") == 0).cast("long"))
    )


def row_rule_indicators(
    df: DataFrame, rules: Mapping[str, Column]
) -> DataFrame:
    """Per-row rule outcomes in long format: ``(rule, violated)`` — one
    output row per input row per rule, produced by the same
    array+explode unpivot as :func:`check_row_rules` (a map-only
    projection, no shuffle). This is the streaming-ingestible form:
    grouped by ``rule`` with ``sum(violated)`` it reproduces
    :func:`check_row_rules` exactly, and because both counts are
    ADDITIVE it feeds the storage-resident rollup sink
    (:func:`foreach_batch_audit`) without any stream-side state."""
    if not rules:
        raise ValueError("row_rule_indicators needs at least one rule")
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.when(pred.isNull() | ~pred, F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("violated"),
            )
            for name, pred in rules.items()
        ]
    )
    return df.select(F.explode(pairs).alias("p")).select(
        F.col("p.rule").alias("rule"), F.col("p.violated").alias("violated")
    )


def foreach_batch_audit(path: str, rules: Mapping[str, Column]):
    """Streaming twin of :func:`check_row_rules`: a ``foreachBatch``
    body that folds every micro-batch's rule outcomes into a
    storage-resident audit rollup at ``path`` (one row per rule:
    ``n_rows``, ``n_violations`` — both additive), reusing the
    crash-safe, replay-protected generation-swap sink
    (:mod:`..streaming.sinks` ``foreach_batch_additive``). The
    streaming job holds NO state: after any prefix of the stream the
    table equals the batch gate over the same rows
    (:func:`read_audit`), the house batch/streaming parity contract."""
    from unimib_simpss_spark.streaming.sinks import foreach_batch_additive

    inner = foreach_batch_additive(path, ("rule",), {"n_violations": "violated"})

    def _apply(batch: DataFrame, batch_id: int) -> None:
        inner(row_rule_indicators(batch, rules), batch_id)

    return _apply


def read_audit(spark, path: str) -> DataFrame:
    """Read the audit rollup :func:`foreach_batch_audit` maintains,
    restoring the :func:`check_row_rules` schema (``passed`` derived
    from the merged violation count)."""
    return spark.read.parquet(path).select(
        "rule",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).cast("long").alias("passed"),
    )


def check_unique(df: DataFrame, rule: str, cols: list[str]) -> DataFrame:
    """Uniqueness constraint over ``cols``: violations = rows beyond
    the first per key (``count - countDistinct`` over the key STRUCT).

    NULL-key semantics — stated because they diverge from bare SQL
    ``count(DISTINCT col)``: the struct is never NULL, so all-NULL keys
    form ONE distinct value and every NULL-keyed row past the first
    counts as a violation. That is the conservative reading for a
    uniqueness gate (two unknown keys are not provably distinct); a SQL
    oracle must mirror it with ``count(DISTINCT coalesce(CAST(k AS
    VARCHAR), '__null__'))``, as q63's does — bare ``count(DISTINCT
    k)`` skips NULLs and under-counts violations."""
    key = F.struct(*[F.col(c) for c in cols])
    one = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(key).alias("__d"),
    )
    return one.select(
        F.lit(rule).alias("rule"),
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_rows"),
        F.coalesce(F.col("__n") - F.col("__d"), F.lit(0)).alias(
            "n_violations"
        ),
    ).withColumn("passed", (F.col("n_violations") == 0).cast("long"))


def check_foreign_key(
    left: DataFrame,
    rule: str,
    fk_cols: list[str],
    dim: DataFrame,
    pk_cols: list[str],
    max_dim_rows: int | None = 1_000_000,
) -> DataFrame:
    """Referential-integrity constraint: every non-NULL ``fk_cols``
    tuple in ``left`` must exist in ``dim``'s ``pk_cols``. Violations
    via LEFT ANTI join — the fact side streams, only O(#rules) counts
    come back. NULL FKs are exempt (SQL FK semantics).

    The broadcast hint on the dimension is SIZE-GATED, never forced
    (the repo-wide cap-gated broadcast discipline, ADVICE r11): with
    ``max_dim_rows`` set (default 1M PK rows ≈ tens of MB), one cheap
    limit-bounded count decides; an oversized dimension degrades to a
    shuffled anti join instead of OOMing executors past AQE's size
    check. ``max_dim_rows=None`` skips the count and lets AQE choose."""
    fk_present = left
    for c in fk_cols:
        fk_present = fk_present.where(F.col(c).isNotNull())
    cond = None
    for fc, pc in zip(fk_cols, pk_cols):
        c = F.col(f"__l.{fc}") == F.col(f"__d.{pc}")
        cond = c if cond is None else (cond & c)
    # the anti join only needs the PK columns — prune before gating so
    # both the count and any broadcast move the narrowest relation
    dim_keys = dim.select(*pk_cols)
    if max_dim_rows is not None:
        n = dim_keys.limit(max_dim_rows + 1).count()
        dim_side = (
            F.broadcast(dim_keys.alias("__d"))
            if n <= max_dim_rows
            else dim_keys.alias("__d")
        )
    else:
        dim_side = dim_keys.alias("__d")
    orphans = (
        fk_present.alias("__l")
        .join(dim_side, cond, "left_anti")
        .agg(F.count(F.lit(1)).alias("__v"))
    )
    total = left.agg(F.count(F.lit(1)).alias("__n"))
    return (
        total.crossJoin(orphans)
        .select(
            F.lit(rule).alias("rule"),
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_rows"),
            F.coalesce(F.col("__v"), F.lit(0)).alias("n_violations"),
        )
        .withColumn("passed", (F.col("n_violations") == 0).cast("long"))
    )


def audit_union(*checks: DataFrame) -> DataFrame:
    """Union check relations into one audit table (schema asserted)."""
    out = None
    for c in checks:
        if tuple(c.columns) != _SCHEMA_COLS:
            raise ValueError(f"not an audit relation: {c.columns}")
        out = c if out is None else out.unionAll(c)
    if out is None:
        raise ValueError("audit_union needs at least one check")
    return out


# ------------------------------------------------- distribution drift
def _drift_bin(v: Column, lo: Column, hi: Column, bins: int) -> Column:
    """Equal-width bin of ``v`` over the REFERENCE range [lo, hi] —
    the exact expression shape is shared with :func:`drift_sql`
    (floor((v-lo)*B/(hi-lo)) then clamp): mathematically-equal
    rewrites like precomputing the width are NOT IEEE-identical, and
    a boundary value crossing bins between engines breaks the hash."""
    raw = F.floor((v - lo) * F.lit(bins) / (hi - lo))
    clamped = F.least(
        F.greatest(raw, F.lit(0).cast("long")),
        F.lit(bins - 1).cast("long"),
    )
    return F.when(hi == lo, F.lit(0).cast("long")).otherwise(
        clamped.cast("long")
    )


# Shared summary-term SQL snippets over smoothed frequencies rp/cp —
# ONE copy, used verbatim by all three SQL builders, because the Spark
# columns (_jsd_term / the psi expression) must be mirrored with the
# EXACT same expression shape: an algebraically-equal rewrite is not
# IEEE-identical and would break oracle hash parity.
_PSI_TERM_SQL = "(cp - rp) * ln(cp / rp)"
_JSD_TERM_SQL = (
    "0.5 * (rp * ln(rp / ((rp + cp) / 2)) "
    "+ cp * ln(cp / ((rp + cp) / 2)))"
)


def _guarded_stats(st: DataFrame, col: str) -> DataFrame:
    """Fail LOUDLY (at execution, where the data is) when the reference
    range is undefined — an empty/all-NULL reference would otherwise
    emit NULL ``_lo``/``_hi``, Spark's null-ignoring greatest/least
    would clamp every current row into bin 0, and the engines would
    diverge on an arbitrary histogram nobody asked for."""
    msg = (
        f"distribution_drift: reference has no non-NULL values of "
        f"{col!r} (or pinned stats are NULL) — no range to bin against"
    )
    bad = F.col("_lo").isNull() | F.col("_hi").isNull()
    return st.select(
        F.when(bad, F.raise_error(F.lit(msg)).cast("double"))
        .otherwise(F.col("_lo"))
        .alias("_lo"),
        F.when(bad, F.raise_error(F.lit(msg)).cast("double"))
        .otherwise(F.col("_hi"))
        .alias("_hi"),
        *[c for c in st.columns if c not in ("_lo", "_hi")],
    )


def distribution_drift(
    ref: DataFrame | None,
    cur: DataFrame,
    col: str,
    bins: int = 10,
    ndigits: int = 6,
    ref_stats: DataFrame | None = None,
    ref_counts: DataFrame | None = None,
) -> DataFrame:
    """Distribution-drift monitor between a REFERENCE snapshot and the
    CURRENT one — the "did my corpus silently shift between releases"
    gate a training pipeline runs beside the row-rule audit:

    - one row per bin (``metric='bin'``): equal-width bins over the
      reference min/max (the PSI convention — drift is measured
      against where the reference lived; current values outside the
      range clamp into the edge bins), with both snapshots' counts;
    - ``metric='psi'``: the Population Stability Index
      Σ (p_cur − p_ref)·ln(p_cur/p_ref) over counts smoothed by +0.5
      per bin (Laplace — keeps empty bins finite and both engines
      rational; the usual read: <0.1 stable, 0.1-0.25 drifting,
      >0.25 shifted);
    - ``metric='ks'``: the two-sample Kolmogorov-Smirnov statistic at
      bin granularity — max |CDF_ref − CDF_cur| over the bin edges,
      UNsmoothed (KS is about mass placement, not log ratios).

    Output: ``(metric, bin, ref_n, cur_n, value)``; NULL values of
    ``col`` are excluded on both engines. An empty or all-NULL
    reference raises at execution (no range to bin against) instead
    of emitting an arbitrary all-bin-0 histogram.

    Scale shape and the PINNED mode: by default one min/max aggregate
    runs over the reference (broadcast as a 1-row relation). At
    100 TB a release-over-release gate should NOT re-scan the prior
    release on every call — pass ``ref_stats`` (1 row, columns
    ``lo``/``hi`` from the prior release's published stats) to skip
    the min/max pass, and additionally ``ref_counts`` (``(bin, n)``,
    e.g. :func:`binned_counts` output persisted at release time, or
    the streaming drift sink's rollup) to skip the reference binning
    pass too — with both pinned the reference side is entirely
    SCAN-FREE (``ref`` may be ``None``) and only the current snapshot
    is read. Pinning stats equal to the computed ones yields
    bit-identical rows. Remaining work: one map-side-combinable count
    per (unpinned) snapshot, then all arithmetic on a ``bins``-row
    relation. DuckDB twin: :func:`drift_sql`."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if ref_counts is not None and ref_stats is None:
        raise ValueError(
            "ref_counts requires ref_stats (the counts are only "
            "meaningful under the range that binned them)"
        )
    if ref is None and (ref_stats is None or ref_counts is None):
        raise ValueError(
            "ref=None requires BOTH ref_stats and ref_counts (nothing "
            "else defines the reference)"
        )
    v = F.col(col).cast("double")
    curd = cur.where(v.isNotNull()).select(v.alias("_v"))
    if ref_stats is not None:
        # pinned relations are tiny by contract, so shape errors are
        # checked EAGERLY — a 2-row stats relation would cross-join
        # every current value against both ranges and silently double
        # (and mis-bin) every count (review r15 pass 1)
        if ref_stats.limit(2).count() != 1:
            raise ValueError(
                "ref_stats must be exactly 1 row (lo, hi) — got a "
                "multi-row or empty relation (per-group stats belong "
                "to distribution_drift_by)"
            )
        st = ref_stats.select(
            F.col("lo").cast("double").alias("_lo"),
            F.col("hi").cast("double").alias("_hi"),
        )
    else:
        refd = ref.where(v.isNotNull()).select(v.alias("_v"))
        st = refd.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    st = _guarded_stats(st, col)
    if ref_counts is not None:
        # one eager pass rejects BOTH duplicate bins (the join would
        # double-count) and out-of-range bins (counts persisted under
        # a different bins config would silently VANISH in the
        # allbins join, truncating the reference histogram — review
        # r15 pass 2)
        if (
            ref_counts.groupBy("bin")
            .count()
            .where(
                (F.col("count") > 1)
                | F.col("bin").isNull()
                | (F.col("bin") < 0)
                | (F.col("bin") >= bins)
            )
            .limit(1)
            .count()
        ):
            raise ValueError(
                f"ref_counts must hold exactly one row per bin in "
                f"[0, {bins}) — duplicate, NULL, or out-of-range bins "
                "found (were the counts persisted under a "
                "different bins config?)"
            )
        rc = ref_counts.select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("_rn"),
        )
    else:
        refd = ref.where(v.isNotNull()).select(v.alias("_v"))
        rc = binned_counts(refd, "_v", st, bins).withColumnRenamed("n", "_rn")
    j = _joined_bin_counts(
        rc,
        binned_counts(curd, "_v", st, bins).withColumnRenamed("n", "_cn"),
        bins,
        cur.sparkSession,
    )
    return drift_metrics_from_counts(j, bins, ndigits)


def binned_counts(
    d: DataFrame, col: str, st: DataFrame, bins: int
) -> DataFrame:
    """``(bin, n)`` counts of ``d[col]`` under the reference-range
    stats relation ``st`` (1 row: ``_lo``/``_hi``) — the map-side-
    combinable half of :func:`distribution_drift`, shared with the
    streaming sink's per-batch fold."""
    return (
        d.join(F.broadcast(st), how="cross")
        .select(
            _drift_bin(F.col(col), F.col("_lo"), F.col("_hi"), bins).alias(
                "bin"
            )
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _joined_bin_counts(rc: DataFrame, cc: DataFrame, bins: int, spark):
    allbins = spark.range(bins).select(F.col("id").alias("bin"))
    return (
        allbins.join(rc, "bin", "left")
        .join(cc, "bin", "left")
        .select(
            "bin",
            F.coalesce("_rn", F.lit(0)).alias("ref_n"),
            F.coalesce("_cn", F.lit(0)).alias("cur_n"),
        )
    )


def drift_metrics_from_counts(
    j: DataFrame, bins: int, ndigits: int = 6
) -> DataFrame:
    """:func:`distribution_drift`'s metric arithmetic over an already-
    joined ``(bin, ref_n, cur_n)`` relation (one row per bin 0..bins-1,
    zero-filled) — the entry point for count-preserving paths like the
    streaming additive sink, guaranteed to emit the SAME rows the batch
    operator would for the same counts."""
    from pyspark.sql import Window

    tot = j.agg(
        F.sum("ref_n").alias("_tr"), F.sum("cur_n").alias("_tc")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    p = j.join(F.broadcast(tot), how="cross").select(
        "bin",
        "ref_n",
        "cur_n",
        "_tr",
        "_tc",
        (
            (F.col("ref_n") + F.lit(0.5))
            / (F.col("_tr") + F.lit(0.5 * bins))
        ).alias("_rp"),
        (
            (F.col("cur_n") + F.lit(0.5))
            / (F.col("_tc") + F.lit(0.5 * bins))
        ).alias("_cp"),
        (F.col("ref_n").cast("double") / F.col("_tr")).alias("_rp0"),
        (F.col("cur_n").cast("double") / F.col("_tc")).alias("_cp0"),
    )
    scored = p.select(
        "bin",
        "ref_n",
        "cur_n",
        "_tr",
        "_tc",
        ((F.col("_cp") - F.col("_rp")) * F.log(F.col("_cp") / F.col("_rp"))).alias(
            "_psi_term"
        ),
        _jsd_term(F.col("_rp"), F.col("_cp")).alias("_jsd_term"),
        F.abs(
            F.sum("_rp0").over(w) - F.sum("_cp0").over(w)
        ).alias("_cdf_gap"),
    )
    summary = scored.agg(
        F.max("_tr").alias("ref_n"),
        F.max("_tc").alias("cur_n"),
        F.round(F.sum("_psi_term"), ndigits).alias("psi"),
        F.round(F.max("_cdf_gap"), ndigits).alias("ks"),
        F.round(F.sum("_jsd_term"), ndigits).alias("jsd"),
    )
    bins_leg = scored.select(
        F.lit("bin").alias("metric"),
        "bin",
        "ref_n",
        "cur_n",
        F.lit(None).cast("double").alias("value"),
    )
    sum_leg = summary.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("psi").alias("metric"), F.col("psi").alias("value")
                ),
                F.struct(F.lit("ks").alias("metric"), F.col("ks").alias("value")),
                F.struct(
                    F.lit("jsd").alias("metric"), F.col("jsd").alias("value")
                ),
            )
        ).alias("_e"),
        "ref_n",
        "cur_n",
    ).select(
        F.col("_e.metric").alias("metric"),
        F.lit(None).cast("long").alias("bin"),
        "ref_n",
        "cur_n",
        F.col("_e.value").alias("value"),
    )
    return bins_leg.unionAll(sum_leg)


def _jsd_term(rp: Column, cp: Column) -> Column:
    """Per-bucket Jensen-Shannon divergence term over the SMOOTHED
    frequencies (0.5·[p·ln(p/m) + q·ln(q/m)], m = (p+q)/2) — the
    symmetric, ln(2)-bounded companion to PSI (which is unbounded and
    blows up on near-empty buckets). Smoothing keeps every log finite;
    the expression shape is mirrored verbatim by the SQL twins (an
    algebraically-equal rewrite would not be IEEE-identical)."""
    m = (rp + cp) / F.lit(2.0)
    return F.lit(0.5) * (rp * F.log(rp / m) + cp * F.log(cp / m))


def _drift_tail_sql(bins: int, ndigits: int) -> str:
    """The metric arithmetic shared verbatim by :func:`drift_sql` and
    :func:`quantile_drift_sql` — everything downstream of the two
    ``rc``/``cc`` ``(bin, n)`` count CTEs (zero-fill, smoothing,
    PSI/KS/JSD terms, the final union). ONE copy because the Spark
    side (:func:`drift_metrics_from_counts`) is likewise shared: the
    binning rule is the only thing that differs between the
    equal-width and equi-depth forms."""
    return f"""
    b AS (SELECT CAST(range AS BIGINT) AS bin FROM range({bins})),
    j AS (
        SELECT b.bin, coalesce(rc.n, 0) AS ref_n, coalesce(cc.n, 0) AS cur_n
        FROM b LEFT JOIN rc USING (bin) LEFT JOIN cc USING (bin)
    ),
    t AS (SELECT sum(ref_n) AS tr, sum(cur_n) AS tc FROM j),
    sp AS (
        SELECT bin, ref_n, cur_n, tr, tc,
               (ref_n + 0.5) / (tr + {0.5 * bins}) AS rp,
               (cur_n + 0.5) / (tc + {0.5 * bins}) AS cp
        FROM j, t
    ),
    s AS (
        SELECT bin, ref_n, cur_n, tr, tc,
               {_PSI_TERM_SQL} AS psi_term,
               {_JSD_TERM_SQL} AS jsd_term,
               abs(sum(CAST(ref_n AS DOUBLE) / tr) OVER cdf
                   - sum(CAST(cur_n AS DOUBLE) / tc) OVER cdf) AS cdf_gap
        FROM sp
        WINDOW cdf AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)
    )
    SELECT 'bin' AS metric, bin, ref_n, cur_n, CAST(NULL AS DOUBLE) AS value
    FROM s
    UNION ALL
    SELECT m.metric, CAST(NULL AS BIGINT) AS bin,
           max(tr) AS ref_n, max(tc) AS cur_n,
           CASE m.metric WHEN 'psi' THEN round(sum(psi_term), {ndigits})
                         WHEN 'jsd' THEN round(sum(jsd_term), {ndigits})
                         ELSE round(max(cdf_gap), {ndigits}) END AS value
    FROM s, (SELECT 'psi' AS metric UNION ALL SELECT 'ks'
             UNION ALL SELECT 'jsd') m
    GROUP BY m.metric
    """


def drift_sql(
    ref_sql: str,
    cur_sql: str,
    expr: str,
    bins: int = 10,
    ndigits: int = 6,
) -> str:
    """DuckDB twin of :func:`distribution_drift` (same bin expression
    shape, same +0.5 smoothing, same rounding)."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    return f"""
    WITH refd AS (
        SELECT CAST(({expr}) AS DOUBLE) AS v FROM ({ref_sql})
        WHERE ({expr}) IS NOT NULL
    ),
    curd AS (
        SELECT CAST(({expr}) AS DOUBLE) AS v FROM ({cur_sql})
        WHERE ({expr}) IS NOT NULL
    ),
    st AS (SELECT min(v) AS lo, max(v) AS hi FROM refd),
    rc AS (
        SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(LEAST(GREATEST(
                   FLOOR((v - lo) * {bins} / (hi - lo)), 0), {bins - 1})
               AS BIGINT) END AS bin, count(*) AS n
        FROM refd, st GROUP BY 1
    ),
    cc AS (
        SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(LEAST(GREATEST(
                   FLOOR((v - lo) * {bins} / (hi - lo)), 0), {bins - 1})
               AS BIGINT) END AS bin, count(*) AS n
        FROM curd, st GROUP BY 1
    ),
    {_drift_tail_sql(bins, ndigits)}
    """


def distribution_drift_by(
    ref: DataFrame | None,
    cur: DataFrame,
    col: str,
    group_col: str,
    bins: int = 10,
    ndigits: int = 6,
    ref_stats: DataFrame | None = None,
    ref_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-GROUP :func:`distribution_drift` — the attribution form
    ("WHICH source shifted?") a multi-source corpus runs beside the
    corpus-level gate: every group gets its own reference-range bins,
    counts, PSI, and KS, all computed in one pass per snapshot with
    the group key carried through every aggregate.

    Groups are defined by the REFERENCE (the PSI convention at group
    granularity): current rows whose group never appears in the
    reference have no distribution to drift FROM and are excluded —
    brand-new groups are the corpus-diff 'added' class's job, not a
    drift number. Output: ``(group, metric, bin, ref_n, cur_n,
    value)`` with the group column named after ``group_col``.

    Scale shape: one per-group min/max aggregate (groups-sized,
    broadcast), one combinable (group, bin) count per snapshot, then
    arithmetic on a groups×bins relation; the CDF window partitions
    on the group. The PINNED mode mirrors :func:`distribution_drift`:
    ``ref_stats`` = ``(group_col, lo, hi)`` from the prior release
    skips the per-group min/max pass, adding ``ref_counts`` =
    ``(group_col, bin, n)`` skips the reference binning pass too
    (``ref`` may then be ``None`` — the reference side is scan-free).
    DuckDB twin: :func:`drift_by_sql`."""
    from pyspark.sql import Window

    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if ref_counts is not None and ref_stats is None:
        raise ValueError(
            "ref_counts requires ref_stats (the counts are only "
            "meaningful under the range that binned them)"
        )
    if ref is None and (ref_stats is None or ref_counts is None):
        raise ValueError(
            "ref=None requires BOTH ref_stats and ref_counts (nothing "
            "else defines the reference)"
        )
    spark = cur.sparkSession
    v = F.col(col).cast("double")
    pick = lambda d: d.where(  # noqa: E731
        v.isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("_g"), v.alias("_v"))
    curd = pick(cur)
    if ref_stats is not None:
        # eager shape check (tiny by contract): duplicate groups would
        # bin every value under two ranges and double-count
        if (
            ref_stats.groupBy(group_col)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        ):
            raise ValueError(
                "ref_stats holds duplicate group rows — one (lo, hi) "
                "per group required"
            )
        # NULL-group pins are dropped to mirror the computed path's
        # pick() filter — otherwise allbins would emit spurious
        # all-zero rows for group NULL that the computed mode can
        # never produce (review r15 pass 2)
        st = ref_stats.where(F.col(group_col).isNotNull()).select(
            F.col(group_col).alias("_g"),
            F.col("lo").cast("double").alias("_lo"),
            F.col("hi").cast("double").alias("_hi"),
        )
    else:
        st = pick(ref).groupBy("_g").agg(
            F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
        )
    st = _guarded_stats(st, col)
    binned = lambda d: (  # noqa: E731
        d.join(F.broadcast(st), "_g")
        .select(
            "_g",
            _drift_bin(F.col("_v"), F.col("_lo"), F.col("_hi"), bins).alias(
                "bin"
            ),
        )
        .groupBy("_g", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if ref_counts is not None:
        if (
            ref_counts.groupBy(group_col, "bin")
            .count()
            .where(
                (F.col("count") > 1)
                | F.col("bin").isNull()
                | (F.col("bin") < 0)
                | (F.col("bin") >= bins)
            )
            .limit(1)
            .count()
        ):
            raise ValueError(
                f"ref_counts must hold exactly one row per (group, "
                f"bin) with bin in [0, {bins}) — duplicate, NULL, "
                "or out-of-range rows found (different bins config?)"
            )
        rc = ref_counts.select(
            F.col(group_col).alias("_g"),
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("_rn"),
        )
    else:
        rc = binned(pick(ref)).withColumnRenamed("n", "_rn")
    allbins = st.select("_g").crossJoin(
        F.broadcast(spark.range(bins).select(F.col("id").alias("bin")))
    )
    j = (
        allbins.join(rc, ["_g", "bin"], "left")
        .join(
            binned(curd).withColumnRenamed("n", "_cn"), ["_g", "bin"], "left"
        )
        .select(
            "_g",
            "bin",
            F.coalesce("_rn", F.lit(0)).alias("ref_n"),
            F.coalesce("_cn", F.lit(0)).alias("cur_n"),
        )
    )
    return drift_by_metrics_from_counts(j, bins, ndigits, group_col)


def drift_by_metrics_from_counts(
    j: DataFrame, bins: int, ndigits: int = 6, group_col: str = "grp"
) -> DataFrame:
    """:func:`distribution_drift_by`'s metric arithmetic over an
    already-joined ``(_g, bin, ref_n, cur_n)`` relation (one row per
    group × bin 0..bins-1, zero-filled) — the count-preserving entry
    point the streaming per-source sink reads through, guaranteed to
    emit the SAME rows the batch operator would for the same counts
    (the ungrouped :func:`drift_metrics_from_counts` contract, with
    the group carried through every aggregate)."""
    from pyspark.sql import Window

    tot = j.groupBy("_g").agg(
        F.sum("ref_n").alias("_tr"), F.sum("cur_n").alias("_tc")
    )
    w = (
        Window.partitionBy("_g")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = j.join(F.broadcast(tot), "_g").select(
        "_g",
        "bin",
        "ref_n",
        "cur_n",
        "_tr",
        "_tc",
        (
            (F.col("ref_n") + F.lit(0.5))
            / (F.col("_tr") + F.lit(0.5 * bins))
        ).alias("_rp"),
        (
            (F.col("cur_n") + F.lit(0.5))
            / (F.col("_tc") + F.lit(0.5 * bins))
        ).alias("_cp"),
        (F.col("ref_n").cast("double") / F.col("_tr")).alias("_rp0"),
        (F.col("cur_n").cast("double") / F.col("_tc")).alias("_cp0"),
    )
    scored = p.select(
        "_g",
        "bin",
        "ref_n",
        "cur_n",
        "_tr",
        "_tc",
        (
            (F.col("_cp") - F.col("_rp")) * F.log(F.col("_cp") / F.col("_rp"))
        ).alias("_psi_term"),
        _jsd_term(F.col("_rp"), F.col("_cp")).alias("_jsd_term"),
        F.abs(F.sum("_rp0").over(w) - F.sum("_cp0").over(w)).alias(
            "_cdf_gap"
        ),
    )
    summary = scored.groupBy("_g").agg(
        F.max("_tr").alias("ref_n"),
        F.max("_tc").alias("cur_n"),
        F.round(F.sum("_psi_term"), ndigits).alias("psi"),
        F.round(F.max("_cdf_gap"), ndigits).alias("ks"),
        F.round(F.sum("_jsd_term"), ndigits).alias("jsd"),
    )
    bins_leg = scored.select(
        F.col("_g").alias(group_col),
        F.lit("bin").alias("metric"),
        "bin",
        "ref_n",
        "cur_n",
        F.lit(None).cast("double").alias("value"),
    )
    sum_leg = summary.select(
        F.col("_g").alias(group_col),
        F.explode(
            F.array(
                F.struct(
                    F.lit("psi").alias("metric"), F.col("psi").alias("value")
                ),
                F.struct(F.lit("ks").alias("metric"), F.col("ks").alias("value")),
                F.struct(
                    F.lit("jsd").alias("metric"), F.col("jsd").alias("value")
                ),
            )
        ).alias("_e"),
        "ref_n",
        "cur_n",
    ).select(
        group_col,
        F.col("_e.metric").alias("metric"),
        F.lit(None).cast("long").alias("bin"),
        "ref_n",
        "cur_n",
        F.col("_e.value").alias("value"),
    )
    return bins_leg.unionAll(sum_leg)


def _drift_by_tail_sql(bins: int, ndigits: int, groups_from: str) -> str:
    """Per-group metric arithmetic shared verbatim by
    :func:`drift_by_sql` and :func:`quantile_drift_by_sql` —
    everything downstream of the per-group ``rc``/``cc`` count CTEs;
    ``groups_from`` names the CTE whose ``g`` column enumerates the
    reference's groups (``st`` for the range form, ``ed`` for the
    edge form)."""
    return f"""
    b AS (
        SELECT {groups_from}.g, CAST(range AS BIGINT) AS bin
        FROM {groups_from}, range({bins})
    ),
    j AS (
        SELECT b.g, b.bin, coalesce(rc.n, 0) AS ref_n,
               coalesce(cc.n, 0) AS cur_n
        FROM b LEFT JOIN rc ON b.g = rc.g AND b.bin = rc.bin
               LEFT JOIN cc ON b.g = cc.g AND b.bin = cc.bin
    ),
    t AS (SELECT g, sum(ref_n) AS tr, sum(cur_n) AS tc FROM j GROUP BY g),
    sp AS (
        SELECT j.g, bin, ref_n, cur_n, tr, tc,
               (ref_n + 0.5) / (tr + {0.5 * bins}) AS rp,
               (cur_n + 0.5) / (tc + {0.5 * bins}) AS cp
        FROM j JOIN t ON j.g = t.g
    ),
    s AS (
        SELECT g, bin, ref_n, cur_n, tr, tc,
               {_PSI_TERM_SQL} AS psi_term,
               {_JSD_TERM_SQL} AS jsd_term,
               abs(sum(CAST(ref_n AS DOUBLE) / tr) OVER cdf
                   - sum(CAST(cur_n AS DOUBLE) / tc) OVER cdf) AS cdf_gap
        FROM sp
        WINDOW cdf AS (PARTITION BY g ORDER BY bin
                       ROWS UNBOUNDED PRECEDING)
    )
    SELECT g AS grp, 'bin' AS metric, bin, ref_n, cur_n,
           CAST(NULL AS DOUBLE) AS value
    FROM s
    UNION ALL
    SELECT g AS grp, m.metric, CAST(NULL AS BIGINT) AS bin,
           max(tr) AS ref_n, max(tc) AS cur_n,
           CASE m.metric WHEN 'psi' THEN round(sum(psi_term), {ndigits})
                         WHEN 'jsd' THEN round(sum(jsd_term), {ndigits})
                         ELSE round(max(cdf_gap), {ndigits}) END AS value
    FROM s, (SELECT 'psi' AS metric UNION ALL SELECT 'ks'
             UNION ALL SELECT 'jsd') m
    GROUP BY g, m.metric
    """


def drift_by_sql(
    ref_sql: str,
    cur_sql: str,
    expr: str,
    group_expr: str,
    bins: int = 10,
    ndigits: int = 6,
) -> str:
    """DuckDB twin of :func:`distribution_drift_by` (same per-group
    bin expression shape, smoothing, and rounding); the group column
    is emitted as ``grp``."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    return f"""
    WITH refd AS (
        SELECT ({group_expr}) AS g, CAST(({expr}) AS DOUBLE) AS v
        FROM ({ref_sql})
        WHERE ({expr}) IS NOT NULL AND ({group_expr}) IS NOT NULL
    ),
    curd AS (
        SELECT ({group_expr}) AS g, CAST(({expr}) AS DOUBLE) AS v
        FROM ({cur_sql})
        WHERE ({expr}) IS NOT NULL AND ({group_expr}) IS NOT NULL
    ),
    st AS (SELECT g, min(v) AS lo, max(v) AS hi FROM refd GROUP BY g),
    rc AS (
        SELECT refd.g, CASE WHEN hi = lo THEN 0 ELSE CAST(LEAST(GREATEST(
                   FLOOR((v - lo) * {bins} / (hi - lo)), 0), {bins - 1})
               AS BIGINT) END AS bin, count(*) AS n
        FROM refd JOIN st ON refd.g = st.g GROUP BY 1, 2
    ),
    cc AS (
        SELECT curd.g, CASE WHEN hi = lo THEN 0 ELSE CAST(LEAST(GREATEST(
                   FLOOR((v - lo) * {bins} / (hi - lo)), 0), {bins - 1})
               AS BIGINT) END AS bin, count(*) AS n
        FROM curd JOIN st ON curd.g = st.g GROUP BY 1, 2
    ),
    {_drift_by_tail_sql(bins, ndigits, "st")}
    """


# ------------------------------------------------ categorical drift
OTHER_BUCKET = "__other__"


def categorical_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    top_k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """PSI over CATEGORY frequencies — the other half of a production
    drift deck beside the numeric :func:`distribution_drift` ("did the
    source/language/format mix shift between releases"):

    - buckets are the reference's ``top_k`` most frequent categories
      (count desc, value asc on ties — deterministic on both engines)
      plus one ``'__other__'`` bucket absorbing every remaining
      category, INCLUDING categories that appear only in the current
      snapshot (the PSI convention: the comparison frame is defined
      by where the reference lived);
    - ``metric='cat'``: one row per bucket with both snapshots'
      counts (the ``'__other__'`` row is always present);
    - ``metric='psi'``: Σ (p_cur − p_ref)·ln(p_cur/p_ref) over
      bucket frequencies smoothed by +0.5 per bucket (Laplace, the
      numeric gate's convention — empty buckets stay finite). KS is
      deliberately absent: categories are unordered, a CDF gap over
      an arbitrary category order is not a statistic.

    Output: ``(metric, category, ref_n, cur_n, value)``; NULL
    categories are excluded on both engines; categories compare in
    STRING space (cast on both sides — portable across engines).

    Scale shape: the top-k bucket VALUES are collected driver-side —
    a gated collect bounded by the caller's own ``top_k`` (the
    label_silhouette k×d-centroid discipline), never by data — so
    bucketing is a literal ``isin`` predicate and each snapshot is
    scanned exactly ONCE for its bucket counts (a join-based draft
    re-evaluated the top-k subtree in three plan branches: ~7 input
    scans where this does 3, measured 3.9 s → ~1 s at sf0.1). All
    remaining arithmetic runs on a ≤(top_k+1)-row relation. DuckDB
    twin: :func:`categorical_drift_sql`."""
    top_vals = top_categories(ref, col, top_k)
    c = F.col(col).cast("string")
    refd = ref.where(c.isNotNull()).select(c.alias("_c"))
    curd = cur.where(c.isNotNull()).select(c.alias("_c"))
    bucketize = lambda d: (  # noqa: E731
        d.select(bucket_expr(F.col("_c"), top_vals).alias("category"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j = categorical_counts_frame(
        ref.sparkSession,
        top_vals,
        bucketize(refd),
        bucketize(curd),
    )
    return categorical_metrics_from_counts(j, ndigits)


def top_categories(ref: DataFrame, col: str, top_k: int) -> list:
    """The reference's top-``top_k`` category VALUES by (count desc,
    value asc), string space, NULLs excluded — the bucket-frame rule
    shared by :func:`categorical_drift` and the streaming reader
    (``read_drift_cat_metrics``), living ONCE so the two can never
    derive different frames for the same reference. A gated collect
    bounded by ``top_k``. Raises on an empty/all-NULL reference (no
    frame to drift from) and on data using the reserved
    ``'__other__'`` sentinel as a top category."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    c = F.col(col).cast("string")
    refc = (
        ref.where(c.isNotNull())
        .select(c.alias("_c"))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    top_vals = [
        r["_c"]
        for r in refc.orderBy(F.desc("_n"), F.asc("_c"))
        .limit(top_k)
        .select("_c")
        .collect()
    ]
    if not top_vals:
        # same contract as the numeric gate's _guarded_stats: an empty
        # or all-NULL reference has no category frame to drift FROM —
        # a silent "psi = 0.0 vs nothing" verdict is the hazard
        raise ValueError(
            f"categorical drift: reference has no non-NULL values of "
            f"{col!r} — no category frame to compare against"
        )
    if OTHER_BUCKET in top_vals:
        raise ValueError(
            f"categorical drift reserves the bucket name {OTHER_BUCKET!r} "
            f"and the reference data uses it as a top-{top_k} category — "
            "rename that category upstream"
        )
    return top_vals


def bucket_expr(c: Column, top_vals: list) -> Column:
    """Map a string category column onto the pinned frame: its own
    value when in ``top_vals``, else the ``'__other__'`` bucket."""
    return F.when(c.isin(top_vals), c).otherwise(F.lit(OTHER_BUCKET))


def categorical_counts_frame(
    spark, top_vals: list, rc: DataFrame, cc: DataFrame
) -> DataFrame:
    """Zero-filled ``(category, ref_n, cur_n)`` over the full bucket
    frame (``top_vals`` + '__other__') from two ``(category, n)``
    count relations — the join both the batch operator and the
    streaming reader feed into :func:`categorical_metrics_from_counts`."""
    buckets = spark.createDataFrame(
        [(v,) for v in top_vals] + [(OTHER_BUCKET,)], "category string"
    )
    return (
        buckets.join(rc.withColumnRenamed("n", "_rn"), "category", "left")
        .join(cc.withColumnRenamed("n", "_cn"), "category", "left")
        .select(
            "category",
            F.coalesce("_rn", F.lit(0)).alias("ref_n"),
            F.coalesce("_cn", F.lit(0)).alias("cur_n"),
        )
    )


def categorical_metrics_from_counts(
    j: DataFrame, ndigits: int = 6
) -> DataFrame:
    """:func:`categorical_drift`'s PSI arithmetic over an already-
    joined ``(category, ref_n, cur_n)`` relation (one row per bucket
    incl. the zero-filled '__other__' row) — the count-preserving
    entry point the streaming categorical sink reads through,
    guaranteed to emit the SAME rows the batch operator would for the
    same counts (the numeric family's ``*_metrics_from_counts``
    contract)."""
    # bucket count B is data-dependent (min(top_k, |ref categories|)+1),
    # so the smoothing denominator reads it from the same 1-row
    # aggregate as the totals — no collect
    tot = j.agg(
        F.sum("ref_n").alias("_tr"),
        F.sum("cur_n").alias("_tc"),
        F.count(F.lit(1)).cast("double").alias("_b"),
    )
    p = j.join(F.broadcast(tot), how="cross").select(
        "category",
        "ref_n",
        "cur_n",
        "_tr",
        "_tc",
        (
            (F.col("ref_n") + F.lit(0.5))
            / (F.col("_tr") + F.lit(0.5) * F.col("_b"))
        ).alias("_rp"),
        (
            (F.col("cur_n") + F.lit(0.5))
            / (F.col("_tc") + F.lit(0.5) * F.col("_b"))
        ).alias("_cp"),
    )
    scored = p.select(
        "category",
        "ref_n",
        "cur_n",
        "_tr",
        "_tc",
        (
            (F.col("_cp") - F.col("_rp")) * F.log(F.col("_cp") / F.col("_rp"))
        ).alias("_psi_term"),
        _jsd_term(F.col("_rp"), F.col("_cp")).alias("_jsd_term"),
    )
    cat_leg = scored.select(
        F.lit("cat").alias("metric"),
        "category",
        "ref_n",
        "cur_n",
        F.lit(None).cast("double").alias("value"),
    )
    sum_leg = scored.agg(
        F.max("_tr").alias("ref_n"),
        F.max("_tc").alias("cur_n"),
        F.round(F.sum("_psi_term"), ndigits).alias("psi"),
        F.round(F.sum("_jsd_term"), ndigits).alias("jsd"),
    ).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("psi").alias("metric"), F.col("psi").alias("value")
                ),
                F.struct(
                    F.lit("jsd").alias("metric"), F.col("jsd").alias("value")
                ),
            )
        ).alias("_e"),
        "ref_n",
        "cur_n",
    ).select(
        F.col("_e.metric").alias("metric"),
        F.lit(None).cast("string").alias("category"),
        "ref_n",
        "cur_n",
        F.col("_e.value").alias("value"),
    )
    return cat_leg.unionAll(sum_leg)


def categorical_drift_sql(
    ref_sql: str,
    cur_sql: str,
    expr: str,
    top_k: int = 10,
    ndigits: int = 6,
) -> str:
    """DuckDB twin of :func:`categorical_drift` (same top-k tie-break,
    same '__other__' bucket, same +0.5-per-bucket smoothing and
    rounding)."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    return f"""
    WITH refd AS (
        SELECT CAST(({expr}) AS VARCHAR) AS c FROM ({ref_sql})
        WHERE ({expr}) IS NOT NULL
    ),
    curd AS (
        SELECT CAST(({expr}) AS VARCHAR) AS c FROM ({cur_sql})
        WHERE ({expr}) IS NOT NULL
    ),
    refc AS (SELECT c, count(*) AS n FROM refd GROUP BY c),
    topk AS (
        SELECT CASE WHEN c = '{OTHER_BUCKET}'
                    THEN error('categorical_drift reserves {OTHER_BUCKET}')
                    ELSE c END AS c
        FROM refc
        QUALIFY row_number() OVER (ORDER BY n DESC, c) <= {top_k}
    ),
    rb AS (
        SELECT CASE WHEN t.c IS NOT NULL THEN refd.c
                    ELSE '{OTHER_BUCKET}' END AS category,
               count(*) AS n
        FROM refd LEFT JOIN topk t ON refd.c = t.c GROUP BY 1
    ),
    cb AS (
        SELECT CASE WHEN t.c IS NOT NULL THEN curd.c
                    ELSE '{OTHER_BUCKET}' END AS category,
               count(*) AS n
        FROM curd LEFT JOIN topk t ON curd.c = t.c GROUP BY 1
    ),
    buckets AS (
        SELECT c AS category FROM topk
        UNION ALL SELECT '{OTHER_BUCKET}'
    ),
    j AS (
        SELECT b.category, coalesce(rb.n, 0) AS ref_n,
               coalesce(cb.n, 0) AS cur_n
        FROM buckets b
        LEFT JOIN rb ON b.category = rb.category
        LEFT JOIN cb ON b.category = cb.category
    ),
    t AS (
        SELECT sum(ref_n) AS tr, sum(cur_n) AS tc,
               CAST(count(*) AS DOUBLE) AS b
        FROM j
    ),
    sp AS (
        SELECT category, ref_n, cur_n, tr, tc,
               (ref_n + 0.5) / (tr + 0.5 * b) AS rp,
               (cur_n + 0.5) / (tc + 0.5 * b) AS cp
        FROM j, t
    ),
    s AS (
        SELECT category, ref_n, cur_n, tr, tc,
               {_PSI_TERM_SQL} AS psi_term,
               {_JSD_TERM_SQL} AS jsd_term
        FROM sp
    )
    SELECT 'cat' AS metric, category, ref_n, cur_n,
           CAST(NULL AS DOUBLE) AS value
    FROM s
    UNION ALL
    SELECT m.metric, CAST(NULL AS VARCHAR) AS category,
           max(tr) AS ref_n, max(tc) AS cur_n,
           CASE m.metric WHEN 'psi' THEN round(sum(psi_term), {ndigits})
                         ELSE round(sum(jsd_term), {ndigits}) END AS value
    FROM s, (SELECT 'psi' AS metric UNION ALL SELECT 'jsd') m
    GROUP BY m.metric
    """


# ---------------------------------------------------------------------------
# Equi-depth (quantile-edge) drift — the OTHER binning convention of a
# production PSI deck. Equal-width bins (distribution_drift) starve on
# heavy-tailed metrics: one outlier stretches the range until almost all
# mass lands in one bin and PSI goes numb. The standard fix is equi-depth
# bins — edges at the REFERENCE's q-quantiles, so every bin holds ~1/q of
# the reference mass and PSI reacts to movement anywhere in the
# distribution. Binning here is PURE INTEGER edge comparisons (count of
# edges below the value) — no float division at all, so the cross-engine
# hazard is strictly smaller than the equal-width form's width arithmetic.
# ---------------------------------------------------------------------------


def _qbin(v: Column, edges: Column, q: int) -> Column:
    """Equi-depth bin of ``v`` under the ``q-1``-element sorted
    ``edges`` array: the count of edges strictly below ``v`` (values
    <= the first edge fall in bin 0, values above the last in bin
    q-1 — clamping is inherent, no range arithmetic). The unrolled
    when-sum is mirrored verbatim by :func:`quantile_drift_sql`'s
    CASE sum; both engines compare doubles and add small ints, so
    matching edges imply bit-identical bins."""
    terms = [
        F.when(v > F.element_at(edges, i), 1).otherwise(0)
        for i in range(1, q)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def _edges_exprs(q: int) -> list:
    """The q-1 ``percentile_disc`` aggregate expressions over ``_v``
    — the ONE place the ceil(p·n) edge rule is written, shared by the
    ungrouped relation, the grouped relation, and the streaming
    reader's derivation (their parity contract depends on binning
    under identical edges)."""
    return [
        F.expr(
            f"percentile_disc({i / q!r}) WITHIN GROUP (ORDER BY _v)"
        ).alias(f"_e{i}")
        for i in range(1, q)
    ]


def _edges_rel(ref_vals: DataFrame, q: int) -> DataFrame:
    """1-row ``(edges)`` relation: the reference's interior
    ``q``-quantile edges via ``percentile_disc`` (SQL-standard
    ceil(p·n) discrete percentile — an ACTUAL data element, which
    DuckDB's ``quantile_disc`` picks identically; verified including
    exact p·n boundaries). One aggregate pass; all q-1 percentiles
    share the single sorted-group pass. Raises at execution when the
    reference has no non-NULL values (no edges to bin against — the
    :func:`_guarded_stats` contract)."""
    msg = (
        "quantile_drift: reference has no non-NULL values — no "
        "quantile edges to bin against"
    )
    raw = ref_vals.agg(*_edges_exprs(q)).select(
        F.array(*[F.col(f"_e{i}") for i in range(1, q)]).alias("_raw")
    )
    return raw.select(
        F.when(
            F.element_at("_raw", 1).isNull(),
            F.raise_error(F.lit(msg)).cast("array<double>"),
        )
        .otherwise(F.col("_raw"))
        .alias("edges")
    )


def quantile_edges(ref: DataFrame, col: str, q: int) -> list:
    """The reference's interior q-quantile edges as a ``q-1`` list of
    floats — the PUBLISHED artifact a release pins for downstream
    gates (:func:`quantile_drift`'s ``ref_edges``) and streams
    (``foreach_batch_drift_q``). The collect is bounded by the
    caller's own ``q`` (the gated-collect discipline), never by
    data."""
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    v = F.col(col).cast("double")
    row = (
        _edges_rel(ref.where(v.isNotNull()).select(v.alias("_v")), q)
        .first()
    )
    return [float(e) for e in row["edges"]]


def _check_edges(ref_edges, q: int) -> list:
    # None must raise the contractual ValueError, not float()'s
    # TypeError (review r15 pass 3 — a NULL element in an
    # array<double> pin survives the cast and reaches here)
    if any(e is None for e in ref_edges):
        raise ValueError("ref_edges must be finite (no NULL elements)")
    edges = [float(e) for e in ref_edges]
    if len(edges) != q - 1:
        raise ValueError(
            f"ref_edges must hold exactly q-1 = {q - 1} edges, got "
            f"{len(edges)} (were they published under a different q?)"
        )
    if any(e != e or e in (float("inf"), float("-inf")) for e in edges):
        raise ValueError("ref_edges must be finite (no NaN/inf)")
    if any(a > b for a, b in zip(edges, edges[1:])):
        raise ValueError("ref_edges must be non-decreasing")
    return edges


def pinned_edges_array(ref_edges, q: int) -> Column:
    """The validated pinned edge list as ONE literal array Column —
    the single construction shared by the batch operator, the
    streaming sink, and the reader, so a future change to edge
    typing/normalization cannot make the three bin differently."""
    edges = _check_edges(ref_edges, q)
    return F.array(*[F.lit(e).cast("double") for e in edges])


def pinned_edges_rel(spark, ref_edges, q: int) -> DataFrame:
    """1-row ``(edges)`` relation over :func:`pinned_edges_array` —
    the pinned-mode stand-in for :func:`_edges_rel`."""
    return spark.range(1).select(pinned_edges_array(ref_edges, q).alias("edges"))


def _qbinned_counts(d: DataFrame, edges_rel: DataFrame, q: int) -> DataFrame:
    """``(bin, n)`` counts of ``d._v`` under the 1-row edges relation —
    the equi-depth twin of :func:`binned_counts` (same broadcast +
    map-side-combinable count shape)."""
    return (
        d.join(F.broadcast(edges_rel), how="cross")
        .select(_qbin(F.col("_v"), F.col("edges"), q).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantile_drift(
    ref: DataFrame | None,
    cur: DataFrame,
    col: str,
    q: int = 10,
    ndigits: int = 6,
    ref_edges=None,
    ref_counts: DataFrame | None = None,
) -> DataFrame:
    """Equi-depth :func:`distribution_drift`: bins are the REFERENCE's
    q-quantile intervals (each holding ~1/q of the reference mass)
    instead of equal-width slices of its range — the binning a
    production drift deck uses on heavy-tailed metrics, where one
    outlier stretches equal-width bins until PSI goes numb. Same
    output contract (``metric`` ∈ 'bin'/'psi'/'ks'/'jsd'), same
    smoothing, same rounding; the metric arithmetic IS
    :func:`drift_metrics_from_counts` — only the binning rule
    differs, and it is pure integer edge comparisons (no float
    division anywhere).

    Heavy ties are legal: duplicated edges leave some bins empty and
    the +0.5 smoothing keeps every metric finite; a constant
    reference degenerates to all mass in bin 0 on both engines.

    Scale shape and the PINNED mode: by default one percentile
    aggregate runs over the reference — exact q-quantiles need the
    group's values on one pass (fine at audit scale, and the oracle
    demands exactness). At 100 TB pass ``ref_edges`` (the q-1 floats
    :func:`quantile_edges` published at release time — driver-held,
    bounded by q) to skip that pass, and ``ref_counts`` (``(bin,
    n)``) to skip the reference binning pass too; with both pinned
    the reference side is entirely SCAN-FREE (``ref`` may be
    ``None``). Where even the one-off exact pass is too hot, publish
    edges from the mergeable KLL sketch (``functions/kll.py``)
    instead — the rank error lands in bin BOUNDARIES, not in the
    count arithmetic. DuckDB twin: :func:`quantile_drift_sql`."""
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    if ref_counts is not None and ref_edges is None:
        raise ValueError(
            "ref_counts requires ref_edges (the counts are only "
            "meaningful under the edges that binned them)"
        )
    if ref is None and (ref_edges is None or ref_counts is None):
        raise ValueError(
            "ref=None requires BOTH ref_edges and ref_counts (nothing "
            "else defines the reference)"
        )
    spark = cur.sparkSession
    v = F.col(col).cast("double")
    curd = cur.where(v.isNotNull()).select(v.alias("_v"))
    if ref_edges is not None:
        er = pinned_edges_rel(spark, ref_edges, q)
    else:
        er = _edges_rel(ref.where(v.isNotNull()).select(v.alias("_v")), q)
    if ref_counts is not None:
        # same eager tiny-relation shape check as distribution_drift:
        # duplicate bins double-count, NULL or out-of-range bins
        # silently vanish in the zero-fill join
        if (
            ref_counts.groupBy("bin")
            .count()
            .where(
                (F.col("count") > 1)
                | F.col("bin").isNull()
                | (F.col("bin") < 0)
                | (F.col("bin") >= q)
            )
            .limit(1)
            .count()
        ):
            raise ValueError(
                f"ref_counts must hold exactly one row per bin in "
                f"[0, {q}) — duplicate, NULL, or out-of-range bins "
                "found (were the counts persisted under a different "
                "q?)"
            )
        rc = ref_counts.select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("_rn"),
        )
    else:
        refd = ref.where(v.isNotNull()).select(v.alias("_v"))
        rc = _qbinned_counts(refd, er, q).withColumnRenamed("n", "_rn")
    j = _joined_bin_counts(
        rc,
        _qbinned_counts(curd, er, q).withColumnRenamed("n", "_cn"),
        q,
        spark,
    )
    return drift_metrics_from_counts(j, q, ndigits)


def quantile_bin_sql(q: int, edges_from: str = "ed") -> str:
    """The equi-depth bin expression over scalar edge columns
    ``e1..e{q-1}`` (from CTE ``edges_from``) — the verbatim SQL mirror
    of :func:`_qbin`'s when-sum, shared so the batch twin and any
    embedding query bin identically."""
    terms = " + ".join(
        f"(CASE WHEN v > {edges_from}.e{i} THEN 1 ELSE 0 END)"
        for i in range(1, q)
    )
    return f"CAST({terms} AS BIGINT)"


def quantile_drift_sql(
    ref_sql: str,
    cur_sql: str,
    expr: str,
    q: int = 10,
    ndigits: int = 6,
) -> str:
    """DuckDB twin of :func:`quantile_drift` — ``quantile_disc`` picks
    the same data elements as Spark's ``percentile_disc`` (both
    SQL-standard ceil(p·n); verified at exact boundaries), the CASE
    sum mirrors :func:`_qbin`, and the metric tail is the shared
    :func:`_drift_tail_sql`. (The twin has no loud empty-reference
    guard — NULL edges bin everything to 0 here, while the batch
    operator raises; the oracle never exercises an empty reference.)"""
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    qd = ", ".join(
        f"quantile_disc(v, {i / q!r}) AS e{i}" for i in range(1, q)
    )
    b = quantile_bin_sql(q)
    return f"""
    WITH refd AS (
        SELECT CAST(({expr}) AS DOUBLE) AS v FROM ({ref_sql})
        WHERE ({expr}) IS NOT NULL
    ),
    curd AS (
        SELECT CAST(({expr}) AS DOUBLE) AS v FROM ({cur_sql})
        WHERE ({expr}) IS NOT NULL
    ),
    ed AS (SELECT {qd} FROM refd),
    rc AS (
        SELECT {b} AS bin, count(*) AS n FROM refd, ed GROUP BY 1
    ),
    cc AS (
        SELECT {b} AS bin, count(*) AS n FROM curd, ed GROUP BY 1
    ),
    {_drift_tail_sql(q, ndigits)}
    """


def quantile_edges_kll(
    ref: DataFrame, col: str, q: int, k: int = 200
) -> list:
    """Approximate q-quantile edges from the mergeable KLL sketch
    (``functions/sketches.py: kll_quantiles``) — the 100 TB publish
    path :func:`quantile_drift`'s docstring prescribes where even one
    exact percentile pass over the reference is too hot. KLL's rank
    error moves bin BOUNDARIES by ±O(1/k) of rank; the drift
    arithmetic downstream is untouched (counts are exact under
    whatever edges are pinned), so the metric stays well-defined —
    just measured against slightly-shifted deciles. Returns q-1
    floats accepted verbatim by ``ref_edges`` / the streaming sink."""
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    from unimib_simpss_spark.functions.sketches import kll_quantiles

    names = {f"_e{i}": i / q for i in range(1, q)}
    row = kll_quantiles(
        ref.select(F.lit(1).alias("_g"), col), ["_g"], col, names, k=k,
        ndigits=9,
    ).first()
    if row is None:
        raise ValueError(
            "quantile_edges_kll: reference has no non-NULL values — "
            "no quantile edges to publish"
        )
    return [float(row[f"_e{i}"]) for i in range(1, q)]


def quantile_drift_by(
    ref: DataFrame | None,
    cur: DataFrame,
    col: str,
    group_col: str,
    q: int = 10,
    ndigits: int = 6,
    ref_edges: DataFrame | None = None,
    ref_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-GROUP :func:`quantile_drift` — the attribution form of the
    equi-depth gate, completing the drift matrix ({corpus, per-group}
    × {equal-width, equi-depth} + categorical): every group gets its
    own reference-quantile edges, counts, PSI, KS, and JSD in one
    keyed pass per snapshot. The heavy-tail argument is STRONGER per
    group than at corpus level — a single outlier inside one source
    numbs that source's equal-width bins while leaving the corpus
    range untouched, which is exactly where 'driftsrc' would
    under-report.

    Groups are defined by the REFERENCE (the distribution_drift_by
    convention): current-only groups are excluded, NULL groups drop.
    Output: ``(group_col, metric, bin, ref_n, cur_n, value)``.

    Scale shape: one per-group percentile aggregate over the
    reference (q-1 ``percentile_disc`` in ONE pass, groups-sized
    output broadcast), one combinable (group, bin) count per
    snapshot, arithmetic on the groups×q relation via the shared
    :func:`drift_by_metrics_from_counts`. PINNED mode: ``ref_edges``
    = ``(group_col, edges array<double>)`` from the prior release's
    published per-group edges skips the percentile pass; adding
    ``ref_counts`` = ``(group_col, bin, n)`` makes the reference side
    scan-free (``ref`` may be None). ``ref_edges`` also accepts the
    streaming sink's ``{group: [q-1 floats]}`` dict shape
    (``foreach_batch_drift_q_by``'s pin — one publisher output feeds
    both forms); a flat float list is rejected early with a pointer
    at :func:`quantile_drift`, whose pin it is. DuckDB twin:
    :func:`quantile_drift_by_sql`."""
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    dict_pin = isinstance(ref_edges, dict)
    if ref_edges is not None and not isinstance(ref_edges, DataFrame):
        if dict_pin:
            bad = [g for g in ref_edges if not isinstance(g, str)]
            if bad:
                raise TypeError(
                    "quantile_drift_by ref_edges dict keys must be str "
                    "(Spark cast-to-string group values, as "
                    "quantile_edges_kll_by publishes) — got non-str "
                    f"keys {bad[:3]!r}"
                )
            # the dict pin is the streaming sink's shape and lives in
            # STRING group space — bin both snapshots under
            # string-cast groups (the read_drift_q_metrics_by
            # convention) so a published pin means the same thing on
            # the batch and streaming paths
            # a real StructType, not a DDL string: interpolating
            # group_col into DDL breaks on names with spaces/reserved
            # characters with a parse error unrelated to the pin
            # (ADVICE r16)
            from pyspark.sql.types import (
                ArrayType,
                DoubleType,
                StringType,
                StructField,
                StructType,
            )

            ref_edges = cur.sparkSession.createDataFrame(
                [
                    (g, [float(e) for e in es])
                    for g, es in sorted(ref_edges.items())
                ],
                StructType(
                    [
                        StructField(group_col, StringType()),
                        StructField("edges", ArrayType(DoubleType())),
                    ]
                ),
            )
        else:
            raise TypeError(
                "quantile_drift_by ref_edges must be a (group, edges) "
                "DataFrame or a {group: [q-1 floats]} dict — got "
                f"{type(ref_edges).__name__}; a flat edge list is "
                "quantile_drift's (ungrouped) pin shape"
            )
    if ref_counts is not None and ref_edges is None:
        raise ValueError(
            "ref_counts requires ref_edges (the counts are only "
            "meaningful under the edges that binned them)"
        )
    if ref is None and (ref_edges is None or ref_counts is None):
        raise ValueError(
            "ref=None requires BOTH ref_edges and ref_counts (nothing "
            "else defines the reference)"
        )
    spark = cur.sparkSession
    v = F.col(col).cast("double")
    g = (
        F.col(group_col).cast("string") if dict_pin else F.col(group_col)
    )
    pick = lambda d: d.where(  # noqa: E731
        v.isNotNull() & F.col(group_col).isNotNull()
    ).select(g.alias("_g"), v.alias("_v"))
    curd = pick(cur)
    if ref_edges is not None:
        ed = _pinned_grouped_edges(ref_edges, group_col, q)
    else:
        ed = _grouped_edges_rel(pick(ref), q)
    binned = lambda d: _grouped_qbinned_counts(d, ed, q)  # noqa: E731
    if ref_counts is not None:
        if (
            ref_counts.groupBy(group_col, "bin")
            .count()
            .where(
                (F.col("count") > 1)
                | F.col("bin").isNull()
                | (F.col("bin") < 0)
                | (F.col("bin") >= q)
            )
            .limit(1)
            .count()
        ):
            raise ValueError(
                f"ref_counts must hold exactly one row per (group, "
                f"bin) with bin in [0, {q}) — duplicate, NULL, or "
                "out-of-range rows found (different q?)"
            )
        # ref_counts' group rides the SAME cast as pick()'s: under a
        # dict pin everything is in string group space, and joining a
        # native-typed count key against the string '_g' would go
        # through Spark's implicit string↔numeric coercion (review
        # r16 pass 1 — bigint keys near 2^53 collapse under the
        # double cast and the counts join to the wrong group)
        rc = ref_counts.select(
            g.alias("_g"),
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("_rn"),
        )
    else:
        rc = binned(pick(ref)).withColumnRenamed("n", "_rn")
    j = _grouped_joined_bin_counts(
        ed, rc, binned(curd).withColumnRenamed("n", "_cn"), q, spark
    )
    return drift_by_metrics_from_counts(j, q, ndigits, group_col)


def _grouped_edges_rel(refd: DataFrame, q: int) -> DataFrame:
    """``(_g, edges)`` per group — the grouped :func:`_edges_rel`
    (same ceil(p·n) rule via :func:`_edges_exprs`); groups come from
    the non-NULL-filtered reference, so no group's edges can be NULL
    by construction. Shared by :func:`quantile_drift_by` and the
    streaming reader's derivation."""
    return (
        refd.groupBy("_g")
        .agg(*_edges_exprs(q))
        .select(
            "_g",
            F.array(*[F.col(f"_e{i}") for i in range(1, q)]).alias("edges"),
        )
    )


def _pinned_grouped_edges(
    ref_edges: DataFrame, group_col: str, q: int
) -> DataFrame:
    """Validate the groups-sized per-group edge pin with ONE collect
    and the SAME scalar validator every other pinned path uses
    (:func:`_check_edges` — rejects wrong length, NULL elements, NaN,
    ±inf, decreasing; an expression-side check missed NULL arrays and
    ±inf, and cost three jobs — review r15 pass 2), then rebuild the
    ``(_g, edges)`` relation FROM the validated rows (same schema as
    the projection, so group typing is preserved) — re-projecting the
    caller's relation would evaluate its lineage again downstream and
    the rows that passed validation would not be the rows that bin
    the data (review r15 pass 3)."""
    proj = ref_edges.where(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col("edges").cast("array<double>").alias("edges"),
    )
    rows = proj.collect()
    seen = set()
    for r in rows:
        g = r["_g"]
        if g in seen:
            raise ValueError(
                "ref_edges holds duplicate group rows — one edges "
                "array per group required"
            )
        seen.add(g)
        if r["edges"] is None:
            raise ValueError(f"ref_edges: group {g!r} has a NULL edges array")
        try:
            _check_edges(r["edges"], q)
        except ValueError as e:
            raise ValueError(f"ref_edges: group {g!r}: {e}") from e
    return ref_edges.sparkSession.createDataFrame(rows, schema=proj.schema)


def _grouped_qbinned_counts(d: DataFrame, ed: DataFrame, q: int) -> DataFrame:
    """Per-group ``(_g, bin, n)`` counts under the broadcast
    ``(_g, edges)`` relation — the grouped :func:`_qbinned_counts`,
    shared by the batch operator and the streaming reader (their
    parity contract requires one binning implementation)."""
    return (
        d.join(F.broadcast(ed), "_g")
        .select("_g", _qbin(F.col("_v"), F.col("edges"), q).alias("bin"))
        .groupBy("_g", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _grouped_joined_bin_counts(
    ed: DataFrame, rc: DataFrame, cc: DataFrame, q: int, spark
) -> DataFrame:
    """Zero-filled groups × bins join of reference/current counts
    (``rc``/``cc`` carry ``_rn``/``_cn``) — the grouped
    :func:`_joined_bin_counts`, shared by batch and streaming."""
    allbins = ed.select("_g").crossJoin(
        F.broadcast(spark.range(q).select(F.col("id").alias("bin")))
    )
    return (
        allbins.join(rc, ["_g", "bin"], "left")
        .join(cc, ["_g", "bin"], "left")
        .select(
            "_g",
            "bin",
            F.coalesce("_rn", F.lit(0)).alias("ref_n"),
            F.coalesce("_cn", F.lit(0)).alias("cur_n"),
        )
    )


def quantile_drift_by_sql(
    ref_sql: str,
    cur_sql: str,
    expr: str,
    group_expr: str,
    q: int = 10,
    ndigits: int = 6,
) -> str:
    """DuckDB twin of :func:`quantile_drift_by` — per-group
    ``quantile_disc`` edges, the shared CASE-sum bin, and the shared
    per-group metric tail; the group column is emitted as ``grp``."""
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    qd = ", ".join(
        f"quantile_disc(v, {i / q!r}) AS e{i}" for i in range(1, q)
    )
    b = quantile_bin_sql(q)
    return f"""
    WITH refd AS (
        SELECT ({group_expr}) AS g, CAST(({expr}) AS DOUBLE) AS v
        FROM ({ref_sql})
        WHERE ({expr}) IS NOT NULL AND ({group_expr}) IS NOT NULL
    ),
    curd AS (
        SELECT ({group_expr}) AS g, CAST(({expr}) AS DOUBLE) AS v
        FROM ({cur_sql})
        WHERE ({expr}) IS NOT NULL AND ({group_expr}) IS NOT NULL
    ),
    ed AS (SELECT g, {qd} FROM refd GROUP BY g),
    rc AS (
        SELECT refd.g, {b} AS bin, count(*) AS n
        FROM refd JOIN ed ON refd.g = ed.g GROUP BY 1, 2
    ),
    cc AS (
        SELECT curd.g, {b} AS bin, count(*) AS n
        FROM curd JOIN ed ON curd.g = ed.g GROUP BY 1, 2
    ),
    {_drift_by_tail_sql(q, ndigits, "ed")}
    """


def quantile_edges_kll_by(
    ref: DataFrame, col: str, group_col: str, q: int, k: int = 200
) -> dict:
    """Per-group approximate q-quantile edges from the mergeable KLL
    sketch — the grouped :func:`quantile_edges_kll`, returning the
    ``{group: [q-1 floats]}`` dict the per-group sink
    (``foreach_batch_drift_q_by``) and reader pin verbatim. One
    two-stage sketch pass (the kll_quantiles shape: partial sketches
    per partition, one merge per group); NULL groups drop per the _by
    convention; the collect is groups-sized. Group keys are
    normalized through Spark's OWN cast-to-string — the sink and
    reader stringify groups the same way, and Python ``str()`` of a
    collected native value can disagree with the engine's cast
    (``str(True)`` vs ``'true'``, float formatting), which would pin
    groups no stream row ever matches (review r15 pass 3)."""
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    from unimib_simpss_spark.functions.sketches import kll_quantiles

    names = {f"_e{i}": i / q for i in range(1, q)}
    rows = kll_quantiles(
        ref.where(F.col(group_col).isNotNull()).select(
            F.col(group_col).cast("string").alias(group_col), col
        ),
        [group_col],
        col,
        names,
        k=k,
        ndigits=9,
    ).collect()
    return {
        r[group_col]: [float(r[f"_e{i}"]) for i in range(1, q)]
        for r in rows
    }


def drift_gate_suite(
    ref: DataFrame | None,
    cur: DataFrame,
    col: str,
    group_col: str,
    bins: int = 10,
    q: int = 10,
    ndigits: int = 6,
    ref_stats: DataFrame | None = None,
    ref_cells: DataFrame | None = None,
) -> dict:
    """The four numeric drift gates ({corpus, per-group} ×
    {equal-width, equi-depth}) over ONE release pair, FUSED: row-for-
    row identical output to running :func:`distribution_drift`,
    :func:`quantile_drift`, :func:`distribution_drift_by`, and
    :func:`quantile_drift_by` separately, at a quarter of the data
    passes. Returns ``{"ew", "q", "ew_by", "q_by", "caches",
    "ref_stats", "ref_cells"}`` — the four gate DataFrames, the
    cached cell relations the caller releases (the
    ``materialize_release`` cache-list contract), and the two
    PUBLISHABLE reference artifacts for the pinned mode below.

    PINNED mode (the release-over-release shape at 100 TB — the
    fused analog of the individual gates' ``ref_stats``/
    ``ref_edges``/``ref_counts``): pass ``ref_stats`` = the prior
    release's published ``(group_col, lo, hi, edges)`` relation
    (exactly ONE NULL-group row = the corpus stats; NULL groups never
    occur among the per-group rows by construction) to skip the cube
    pass, and ``ref_cells`` = its published ``(slot, group_col, bin,
    n)`` cell relation to skip the reference bin-count pass — with
    both pinned the reference side is entirely SCAN-FREE (``ref`` may
    be ``None``). Both artifacts are exactly what this function
    returns under those keys, so publish-at-release is one
    ``.write.parquet`` each; pinning values equal to the computed
    ones yields bit-identical gate rows (pytest-pinned).

    Why it exists: run separately, the four gates make ~8 aggregate
    passes over the reference and 4 over the current snapshot
    (min/max, percentiles, and a bin count per gate per snapshot).
    At 100 TB each pass re-reads a corpus-sized (if cached, still
    memory-bandwidth-sized) relation. Fused shape:

    - ONE stats pass over the reference: ``cube(group)`` computes the
      corpus min/max/q-quantile edges (grand-total grouping set —
      which, exactly like the ungrouped operators, still includes
      rows whose group is NULL) and every per-group stats row in a
      single traversal, disambiguated by ``grouping()``. The collect
      is groups-sized (the bounded-collect discipline shared with
      ``_pinned_grouped_edges``); an empty/all-NULL reference raises
      here, driver-side, instead of at execution.
    - ONE fused bin-count pass per snapshot: a single projection
      emits all four bin assignments per row (``posexplode`` over a
      4-slot array — the per-group slots are NULL when the row's
      group is NULL or absent from the reference, mirroring the _by
      operators' inner stats join), then one map-side-combinable
      count over ``(slot, group, bin)``. The cell relation is
      bounded by ``2·groups·(bins+q)`` rows and cached; the four
      gates re-aggregate it.
    - The metric arithmetic is the SAME code the individual
      operators call (:func:`drift_metrics_from_counts` /
      :func:`drift_by_metrics_from_counts` over the same zero-filled
      joins), and the bin expressions are the same
      :func:`_drift_bin` / :func:`_qbin` columns with the collected
      stats re-injected as literals (a Python float round-trip of a
      double is exact), so every row hashes identically to the
      unfused gates — asserted by the parity tests and q61's
      unchanged oracle."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    if ref is None and (ref_stats is None or ref_cells is None):
        raise ValueError(
            "ref=None requires BOTH ref_stats and ref_cells (nothing "
            "else defines the reference)"
        )
    if ref_cells is not None and ref_stats is None:
        raise ValueError(
            "ref_cells requires ref_stats: the published counts were "
            "binned under the publishing release's stats, and pairing "
            "them with freshly-computed stats from a different ref "
            "would compare two bin frames (review r16 pass 3)"
        )
    from unimib_simpss_spark.operators.caching import cache_intermediate

    spark = cur.sparkSession
    v = F.col(col).cast("double")
    pick = lambda d: d.where(v.isNotNull()).select(  # noqa: E731
        F.col(group_col).alias("_g"), v.alias("_v")
    )
    curd = pick(cur)
    if ref_stats is not None:
        # the published artifact: tiny by contract (groups + 1 rows),
        # collected and validated through the SAME scalar checks the
        # computed path's rows get
        sel = ref_stats.select(
            F.col(group_col).alias("_g"),
            F.col("lo").cast("double").alias("_lo"),
            F.col("hi").cast("double").alias("_hi"),
            F.col("edges").cast("array<double>").alias("_edges"),
        )
        srows = sel.collect()
        rows = []
        seen: set = set()
        for r in srows:
            if r["_g"] in seen:
                raise ValueError(
                    f"ref_stats holds duplicate rows for group "
                    f"{r['_g']!r} — one (lo, hi, edges) per group "
                    "required"
                )
            seen.add(r["_g"])
            if r["_lo"] is None or r["_hi"] is None or r["_edges"] is None:
                raise ValueError(
                    f"ref_stats: group {r['_g']!r} has NULL lo/hi/edges"
                )
            try:
                _check_edges(r["_edges"], q)
            except ValueError as e:
                raise ValueError(
                    f"ref_stats: group {r['_g']!r}: {e}"
                ) from e
            rows.append(
                {"_all": 1 if r["_g"] is None else 0, "_g": r["_g"],
                 "_lo": r["_lo"], "_hi": r["_hi"], "_edges": r["_edges"]}
            )
        if None not in seen:
            raise ValueError(
                "ref_stats must hold exactly one NULL-group row (the "
                "corpus stats) — none found"
            )
        gschema_src = sel.schema
    else:
        stats = pick(ref).cube("_g").agg(
            F.grouping("_g").alias("_all"),
            F.min("_v").alias("_lo"),
            F.max("_v").alias("_hi"),
            *_edges_exprs(q),
        ).select(
            "_all",
            "_g",
            "_lo",
            "_hi",
            F.array(*[F.col(f"_e{i}") for i in range(1, q)]).alias("_edges"),
        )
        rows = stats.collect()
        gschema_src = stats.select("_g", "_lo", "_hi", "_edges").schema
    corpus = [r for r in rows if r["_all"] == 1]
    if not corpus:
        raise ValueError(
            f"drift_gate_suite: reference has no non-NULL values of "
            f"{col!r} — no range or quantile edges to bin against"
        )
    clo, chi = float(corpus[0]["_lo"]), float(corpus[0]["_hi"])
    cedges = F.array(
        *[F.lit(float(e)).cast("double") for e in corpus[0]["_edges"]]
    )
    grows = [
        (r["_g"], r["_lo"], r["_hi"], r["_edges"])
        for r in rows
        if r["_all"] == 0 and r["_g"] is not None
    ]
    gstats = spark.createDataFrame(grows, schema=gschema_src)
    # the publishable stats artifact (groups + 1 rows, driver-built):
    # per-group rows plus the NULL-group corpus row
    pub_stats = spark.createDataFrame(
        grows
        + [(None, float(corpus[0]["_lo"]), float(corpus[0]["_hi"]),
            [float(e) for e in corpus[0]["_edges"]])],
        schema=gschema_src,
    ).select(
        F.col("_g").alias(group_col),
        F.col("_lo").alias("lo"),
        F.col("_hi").alias("hi"),
        F.col("_edges").alias("edges"),
    )

    def cells(d: DataFrame) -> DataFrame:
        binned = d.join(F.broadcast(gstats), "_g", "left").select(
            "_g",
            F.posexplode(
                F.array(
                    _drift_bin(
                        F.col("_v"), F.lit(clo), F.lit(chi), bins
                    ),
                    _qbin(F.col("_v"), cedges, q),
                    F.when(
                        F.col("_lo").isNotNull(),
                        _drift_bin(
                            F.col("_v"), F.col("_lo"), F.col("_hi"), bins
                        ),
                    ),
                    F.when(
                        F.col("_edges").isNotNull(),
                        _qbin(F.col("_v"), F.col("_edges"), q),
                    ),
                )
            ).alias("slot", "bin"),
        )
        return cache_intermediate(
            binned.groupBy("slot", "_g", "bin").agg(
                F.count(F.lit(1)).alias("n")
            )
        )

    if ref_cells is not None:
        cin = _check_suite_cells(
            ref_cells.select(
                F.col("slot").cast("int").alias("slot"),
                F.col(group_col).alias("_g"),
                F.col("bin").cast("long").alias("bin"),
                F.col("n").cast("long").alias("n"),
            ),
            bins,
            q,
            group_col,
        )
        rcells = cache_intermediate(cin)
    else:
        rcells = cells(pick(ref))
    ccells = cells(curd)
    out = _suite_gates_from_cells(
        rcells, ccells, gstats, bins, q, ndigits, group_col, spark
    )
    out.update(
        {
            "caches": [rcells, ccells],
            "ref_stats": pub_stats,
            "ref_cells": rcells.select(
                "slot",
                F.col("_g").alias(group_col),
                "bin",
                "n",
            ),
        }
    )
    return out


def _check_suite_cells(
    cin: DataFrame, bins: int, q: int, group_col: str = "grp"
) -> DataFrame:
    """Eager tiny-relation shape check for a published fused cell
    relation (columns ``slot``/``_g``/``bin``/``n`` — the
    pinned-gate discipline, shared by the batch suite's pinned path
    and the streaming reader): duplicate (slot, group, bin) rows
    would double-count in the marginals; NULL or out-of-range slots
    and bins mean the cells were published under a different
    (bins, q) config (NULL slots would silently match no gate —
    review r16 pass 3). NULL bins are legal ONLY on the per-group
    slots (rows whose group was NULL or absent from the reference —
    the computed relation carries them, the derivations filter
    them). Returns ``cin`` unchanged."""
    cap = F.when(F.col("slot").isin(0, 2), F.lit(bins)).otherwise(F.lit(q))
    bad_bin = F.when(
        F.col("slot").isin(0, 1),
        F.col("bin").isNull() | (F.col("bin") < 0) | (F.col("bin") >= cap),
    ).otherwise(
        F.col("bin").isNotNull()
        & ((F.col("bin") < 0) | (F.col("bin") >= cap))
    )
    if (
        cin.groupBy("slot", "_g", "bin")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(
            (F.col("_c") > 1)
            | F.col("slot").isNull()
            | ~F.col("slot").isin(0, 1, 2, 3)
            | bad_bin
        )
        .limit(1)
        .count()
    ):
        raise ValueError(
            f"ref_cells must hold unique (slot, {group_col}, bin) "
            f"rows with slot in 0..3 and bin in [0, bins={bins}) "
            f"for slots 0/2 or [0, q={q}) for slots 1/3 (NULL bins "
            "only on slots 2/3) — were the cells published under a "
            "different config?"
        )
    return cin


def _suite_gates_from_cells(
    rcells: DataFrame,
    ccells: DataFrame,
    gstats: DataFrame,
    bins: int,
    q: int,
    ndigits: int,
    group_col: str,
    spark,
) -> dict:
    """The four gate derivations over a reference/current pair of
    fused cell relations (columns ``slot``/``_g``/``bin``/``n``) —
    ONE copy shared by :func:`drift_gate_suite` and the streaming
    reader (``read_drift_suite_metrics``), because their row-identity
    contract would otherwise rest on duplicated assembly code
    (review r16 pass 3). ``gstats`` only needs a ``_g`` column (the
    reference's group universe for the zero-filled _by frames)."""
    corpus_counts = lambda c, slot, nm: (  # noqa: E731
        c.where(F.col("slot") == slot)
        .groupBy("bin")
        .agg(F.sum("n").alias(nm))
    )
    by_counts = lambda c, slot, nm: (  # noqa: E731
        c.where((F.col("slot") == slot) & F.col("bin").isNotNull())
        .select("_g", "bin", F.col("n").alias(nm))
    )
    corpus_gate = lambda slot, width: drift_metrics_from_counts(  # noqa: E731
        _joined_bin_counts(
            corpus_counts(rcells, slot, "_rn"),
            corpus_counts(ccells, slot, "_cn"),
            width,
            spark,
        ),
        width,
        ndigits,
    )
    by_gate = lambda slot, width: drift_by_metrics_from_counts(  # noqa: E731
        _grouped_joined_bin_counts(
            gstats,
            by_counts(rcells, slot, "_rn"),
            by_counts(ccells, slot, "_cn"),
            width,
            spark,
        ),
        width,
        ndigits,
        group_col,
    )
    return {
        "ew": corpus_gate(0, bins),
        "q": corpus_gate(1, q),
        "ew_by": by_gate(2, bins),
        "q_by": by_gate(3, q),
    }
