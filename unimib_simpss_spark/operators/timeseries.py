"""Per-key EWMA smoothing — the classic sensor-telemetry filter the
reference's monitoring stack gestures at (its Graphite/Grafana compose
services, docker-compose.yml:74-100, would apply exactly this to the
temperature/pressure series the pipeline persists).

``y_t = α·x_t + (1-α)·y_{t-1}`` is inherently SEQUENTIAL — no Spark
built-in window expresses the recursion, and the closed-form rewrite
(two cumulative sums of x·(1-α)^{-i}) overflows for long series. The
scalable shape is the per-key fold:

- **batch** (:func:`ewma`): ``applyInPandas`` per key — one key's
  series sorts and folds inside one task (state = that series; keys
  are the parallel unit, the same contract as the packer/profiler).
  The fold is an explicit float loop in ts order, so the result is a
  deterministic IEEE-754 sequence — bit-identical across engines,
  reruns, and the streaming twin.
- **streaming** (:mod:`..streaming.stateful` ``streaming_ewma``):
  ``applyInPandasWithState`` carrying ``(y, sum, n, last_ts)`` — O(1)
  state per key forever, and because the fold order and arithmetic are
  IDENTICAL to the batch form, the snapshot after any prefix of the
  stream EQUALS the batch EWMA of that prefix bit for bit (the same
  parity contract as the weighted reservoir and KLL trackers).

Out-of-order rows: batch sorts per key before folding; the streaming
fold consumes arrival order within the watermark discipline the caller
configures — the documented difference, same as every stateful op here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Per-key series operators assemble ONE key's full series in ONE task
# (the documented state contract). Fine for sensor-sized keys; a single
# multi-billion-point hot key at 100× the test scale would OOM that task
# SILENTLY (executor lost, stage retry loop). The guard below makes the
# failure loud and actionable instead: default 50M points/key ≈ 400 MB
# of doubles — well inside an executor task, far above any sane sensor
# cardinality. Callers with genuinely larger keys must either raise the
# bound deliberately or pre-aggregate (downsample) before folding.
MAX_POINTS_PER_KEY = 50_000_000


def _check_series_bound(n: int, key: Any, max_points: int | None) -> None:
    """Pandas-side backstop of the per-key state bound (second line of
    defense — the in-plan gate below fires first)."""
    if max_points is not None and n > max_points:
        raise ValueError(
            f"per-key series for key={key!r} has {n} points, exceeding "
            f"max_points={max_points}; one task would hold the whole "
            "series (documented per-key state contract) — downsample or "
            "raise max_points deliberately"
        )


def _with_series_bound_gate(src, max_points: int | None):
    """In-plan per-key count gate, evaluated BEFORE any per-key series
    materializes: a pandas-side check alone fires only after
    applyInPandas has already built the whole group in memory, so the
    multi-billion-point hot key it exists to catch would OOM the task
    before the check runs (review r11). One map-side combinable count
    aggregate (one row per key) is joined back NULL-SAFELY on the key,
    and the raise_error rides INSIDE the consumed ``v`` column — both
    lessons from the second review pass: a plain inner join silently
    dropped NULL-key groups, and a raise_error in a column that is
    immediately ``.drop()``-ed is pruned by Catalyst into dead code
    (pattern_topk's gate survives precisely because it REPLACES the
    consumed array). The raise fires as the first row of an oversized
    key streams through the join — before the fold's group buffers."""
    if max_points is None:
        return src
    counts = src.groupBy("key").agg(F.count(F.lit(1)).alias("__n"))
    gate = counts.select(F.col("key").alias("__gk"), "__n")
    return (
        src.join(gate, F.col("key").eqNullSafe(F.col("__gk")))
        .select(
            "key",
            "ts",
            F.when(
                F.col("__n") > max_points,
                F.raise_error(
                    F.concat(
                        F.lit("per-key series for key="),
                        F.coalesce(F.col("key"), F.lit("NULL")),
                        F.lit(
                            f" exceeds max_points={max_points}; downsample"
                            " or raise max_points deliberately"
                        ),
                    )
                ).cast("double"),
            )
            .otherwise(F.col("v"))
            .alias("v"),
        )
    )


def _valid_point():
    """Shared row filter: NULL *and NaN* drop, on both value and ts —
    the streaming twins skip NaN via pd.isna, so the batch side must
    apply the identical convention or prefix parity breaks on NaN
    inputs."""
    v, ts = F.col("v"), F.col("ts")
    return (
        v.isNotNull() & ~F.isnan(v) & ts.isNotNull() & ~F.isnan(ts)
    )


EWMA_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("last_ts", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("mean", DoubleType()),
    ]
)


def ewma_fold(values: list, alpha: float) -> float:
    """The reference fold both engines/forms share: explicit
    left-to-right ``y = α·x + (1-α)·y`` over floats. First value seeds
    ``y`` (the ``adjust=False`` convention)."""
    it = iter(values)
    y = float(next(it))
    for x in it:
        y = alpha * float(x) + (1.0 - alpha) * y
    return y


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    alpha: float = 0.3,
    ndigits: int = 6,
    max_points: int | None = MAX_POINTS_PER_KEY,
) -> DataFrame:
    """Per-key EWMA of ``val_col`` in ``ts_col`` order → one row per
    key: ``(key, n, last_ts, ewma, mean)`` (the plain mean rides along
    as the smoothing diagnostic). NULL values are dropped; ties in ts
    break by value then arrival to stay deterministic.

    State bound: one key's whole series folds in one task; a key longer
    than ``max_points`` (default :data:`MAX_POINTS_PER_KEY`) raises
    loudly instead of OOMing the task silently."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    src = _with_series_bound_gate(
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col).cast("double").alias("ts"),
            F.col(val_col).cast("double").alias("v"),
        ).where(_valid_point()),
        max_points,
    )

    def fold(pdf):
        import pandas as pd

        _check_series_bound(len(pdf), pdf["key"].iloc[0], max_points)
        pdf = pdf.sort_values(["ts", "v"], kind="mergesort")
        vals = pdf["v"].tolist()
        return pd.DataFrame(
            [
                [
                    pdf["key"].iloc[0],
                    len(vals),
                    float(pdf["ts"].iloc[-1]),
                    round(ewma_fold(vals, alpha), ndigits),
                    round(sum(vals) / len(vals), ndigits),
                ]
            ],
            columns=["key", "n", "last_ts", "ewma", "mean"],
        )

    return src.groupBy("key").applyInPandas(fold, EWMA_SCHEMA)


def ewma_sql(
    key_expr: str,
    ts_expr: str,
    val_expr: str,
    alpha: float = 0.3,
    ndigits: int = 6,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`ewma` — the identical sequential fold via
    ``list_reduce`` over the (ts, value)-ordered list, so the IEEE
    float sequence matches the batch operator bit for bit (the mean is
    also a list_reduce, mirroring Python's strictly left-to-right
    ``sum``). Pass a NUMERIC ``ts_expr`` — for timestamp columns use
    ``epoch(ts)``, which matches Spark's timestamp→double cast
    (microseconds / 1e6) on the operator side. Value-level parity is
    asserted through the standard compare harness in
    tests/test_llm_ops.py."""
    return f"""
    WITH s AS (
        SELECT CAST({key_expr} AS VARCHAR) AS key,
               CAST({ts_expr} AS DOUBLE)   AS ts,
               CAST({val_expr} AS DOUBLE)  AS v
        FROM {table}
        WHERE {val_expr} IS NOT NULL AND NOT isnan(CAST({val_expr} AS DOUBLE))
          AND {ts_expr} IS NOT NULL AND NOT isnan(CAST({ts_expr} AS DOUBLE))
    ),
    g AS (
        SELECT key,
               count(*)       AS n,
               max(ts)        AS last_ts,
               list(v ORDER BY ts, v) AS vs
        FROM s GROUP BY key
    )
    SELECT key, CAST(n AS BIGINT) AS n, last_ts,
           round(list_reduce(vs,
               (acc, x) -> {alpha!r} * x + {1.0 - alpha!r} * acc),
               {ndigits}) AS ewma,
           round(list_reduce(vs, (acc, x) -> acc + x) / n, {ndigits})
               AS mean
    FROM g
    """


# ------------------------------------------------ pattern similarity
def pattern_topk(
    df: DataFrame,
    pattern: list,
    key_col: str,
    ts_col: str,
    val_col: str,
    k: int = 5,
    ndigits: int = 6,
    max_points: int | None = MAX_POINTS_PER_KEY,
) -> DataFrame:
    """Top-k most similar sliding windows to a query ``pattern`` across
    every key's value series — z-normalized Euclidean distance, the
    similarity measure of UCR-suite-style subsequence search (the
    shape-matching primitive behind 'find me sensors that did THIS';
    PAPERS.md: Time Series Similarity Search for Streaming Data, EDBT
    2019). No DTW: z-normalized ED is the standard first-line measure
    and is exactly computable as Column expressions.

    Output: ``(key, start_pos, dist, rank)`` — ``start_pos`` 0-based in
    the key's (ts, value)-sorted series; deterministic ties (dist, key,
    start). Constant-variance windows (σ=0) z-normalize to zeros, the
    usual convention.

    Scale shape: the per-key series is assembled ONCE with
    ``array_sort`` over collected (ts, v) structs — one combinable
    collect per key, state bounded by the key's own series (the same
    per-key contract as :func:`ewma`; keys longer than ``max_points``
    raise loudly in-plan instead of OOMing the collect); each window's
    μ/σ/distance folds
    over an array SLICE inside whole-stage codegen (O(n·m) per key, no
    Python); the global top-k is ``TakeOrderedAndProject`` + the
    window-free broadcast rank. DuckDB twin: :func:`pattern_topk_sql`
    (same sequential folds → bit-identical doubles; value parity via
    the compare harness in tests)."""
    from unimib_simpss_spark.operators.ranking import broadcast_topk_rank

    m = len(pattern)
    if m < 2:
        raise ValueError("pattern needs at least 2 points")
    mu_q = sum(pattern) / m
    var_q = sum((x - mu_q) ** 2 for x in pattern) / m
    sd_q = var_q**0.5
    qz = [0.0 if sd_q == 0 else (x - mu_q) / sd_q for x in pattern]

    # Pre-collect count gate (same as ewma's): the bound must fire
    # BEFORE collect_list builds the oversized key's full series in the
    # aggregation buffer — a post-collect F.size check only raises after
    # the memory it guards against is already committed (ADVICE r11).
    src = _with_series_bound_gate(
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col).cast("double").alias("ts"),
            F.col(val_col).cast("double").alias("v"),
        ).where(_valid_point()),
        max_points,
    )
    series = (
        src.groupBy("key")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("v")))
            ).alias("pts")
        )
        .select("key", F.transform("pts", lambda p: p["v"]).alias("vs"))
        .where(F.size("vs") >= m)
    )

    # Per-window cost is a CONSTANT number of O(m) folds (sum, sum of
    # squares, pattern cross-product) — naively folding (x-mu)²  with mu
    # itself an aggregate re-evaluates the mu fold per element inside
    # the HOF lambda (no CSE across lambda scopes), turning each window
    # into O(m²)-O(m³). The closed form: with the pattern z-normalized,
    # dist² = Σz² - 2Σz·q + Σq² = m - 2·(SXQ - mu·Σq)/sd + Σq²
    # (σ=0 windows z-normalize to zeros → dist² = Σq²). Identical
    # operation order in the DuckDB twin keeps bit parity.
    mf = float(m)
    qsum = sum(qz)
    qss = sum(q * q for q in qz)
    qarr = F.array(*[F.lit(float(q)) for q in qz])

    def win_dist(s):
        w = F.slice("vs", s + 1, F.lit(m))
        S = F.aggregate(w, F.lit(0.0), lambda a, x: a + x)
        SS = F.aggregate(w, F.lit(0.0), lambda a, x: a + x * x)
        SXQ = F.aggregate(
            F.zip_with(w, qarr, lambda x, q: x * q),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        mu = S / F.lit(mf)
        var = SS / F.lit(mf) - mu * mu
        sd = F.sqrt(F.greatest(var, F.lit(0.0)))
        d2 = F.when(sd == 0, F.lit(qss)).otherwise(
            F.lit(mf) - 2.0 * (SXQ - mu * F.lit(qsum)) / sd + F.lit(qss)
        )
        return F.sqrt(F.greatest(d2, F.lit(0.0)))

    wins = series.select(
        "key",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("vs") - m), lambda s: win_dist(s)
            )
        ).alias("start_pos", "dist"),
    ).select(
        "key",
        F.col("start_pos").cast("long").alias("start_pos"),
        F.round("dist", ndigits).alias("dist"),
    )
    # total order for the rank helper: one unique asc key per row
    keyed = wins.withColumn(
        "_ord", F.concat_ws("\x00", "key", F.lpad(F.col("start_pos"), 12, "0"))
    ).withColumn("_negd", -F.col("dist"))
    return (
        broadcast_topk_rank(keyed, k, "_negd", "_ord")
        .select("key", "start_pos", "dist", "rank")
    )


def pattern_topk_sql(
    pattern: list,
    key_expr: str,
    ts_expr: str,
    val_expr: str,
    k: int = 5,
    ndigits: int = 6,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`pattern_topk` — identical sequential folds
    (list_reduce) for μ/σ/distance, same rounding, same tie order."""
    m = len(pattern)
    mu_q = sum(pattern) / m
    var_q = sum((x - mu_q) ** 2 for x in pattern) / m
    sd_q = var_q**0.5
    qz = [0.0 if sd_q == 0 else (x - mu_q) / sd_q for x in pattern]
    qlist = "[" + ", ".join(repr(float(q)) for q in qz) + "]"
    mf = float(m)
    qsum = sum(qz)
    qss = sum(q * q for q in qz)
    return f"""
    WITH s AS (
        SELECT CAST({key_expr} AS VARCHAR) AS key,
               {ts_expr} AS ts, CAST({val_expr} AS DOUBLE) AS v
        FROM {table}
        WHERE {val_expr} IS NOT NULL AND NOT isnan(CAST({val_expr} AS DOUBLE))
          AND {ts_expr} IS NOT NULL AND NOT isnan(CAST({ts_expr} AS DOUBLE))
    ),
    g AS (
        SELECT key, list(v ORDER BY ts, v) AS vs FROM s GROUP BY key
        HAVING count(*) >= {m}
    ),
    w AS (
        SELECT key, start_pos,
               vs[start_pos + 1 : start_pos + {m}] AS win
        FROM g, unnest(generate_series(0, len(vs) - {m})) AS t(start_pos)
    ),
    d AS (
        SELECT key, CAST(start_pos AS BIGINT) AS start_pos,
               list_reduce(win, (a, x) -> a + x)                    AS s1,
               list_reduce(list_transform(win, x -> x * x),
                           (a, x) -> a + x)                          AS ss,
               list_reduce(list_transform(list_zip(win, {qlist}),
                                          p -> p[1] * p[2]),
                           (a, x) -> a + x)                          AS sxq
        FROM w
    ),
    z AS (
        SELECT key, start_pos,
               round(sqrt(greatest(
                   CASE WHEN sqrt(greatest(
                            ss / {mf!r} - (s1 / {mf!r}) * (s1 / {mf!r}),
                            0.0)) = 0
                        THEN {qss!r}
                        ELSE {mf!r}
                             - 2.0 * (sxq - (s1 / {mf!r}) * {qsum!r})
                               / sqrt(greatest(
                                   ss / {mf!r}
                                     - (s1 / {mf!r}) * (s1 / {mf!r}),
                                   0.0))
                             + {qss!r} END,
                   0.0)), {ndigits}) AS dist
        FROM d
    )
    SELECT key, start_pos, dist,
           CAST(row_number() OVER (
               ORDER BY dist, key, start_pos) AS BIGINT) AS rank
    FROM z
    ORDER BY dist, key, start_pos
    LIMIT {k}
    """


# -------------------------------------------------- anomaly detection
def anomaly_fold(
    rows: list, alpha: float = 0.3, k: float = 4.0, min_n: int = 5
) -> list:
    """The shared residual-anomaly fold (batch and streaming run THIS
    exact sequence): maintain an exponentially-weighted mean ``y`` and
    EW second central moment ``v`` (the EW analogue of variance); a
    point is anomalous when its residual against the PRE-UPDATE state
    exceeds ``k·sqrt(v)``, after a ``min_n`` warmup. Anomalous points
    STILL update the state (a level shift eventually becomes the new
    normal — the standard monitoring behavior). Returns one
    ``(value, is_anomaly, resid)`` triple per input value."""
    y = None
    v = 0.0
    n = 0
    out = []
    for x in rows:
        x = float(x)
        if y is None:
            out.append((x, False, 0.0))
            y = x
        else:
            resid = abs(x - y)
            sd = v**0.5
            flag = n >= min_n and resid > k * sd
            out.append((x, bool(flag), resid))
            v = alpha * (x - y) * (x - y) + (1.0 - alpha) * v
            y = alpha * x + (1.0 - alpha) * y
        n += 1
    return out


def anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    alpha: float = 0.3,
    k: float = 4.0,
    min_n: int = 5,
    ndigits: int = 6,
    max_points: int | None = MAX_POINTS_PER_KEY,
) -> DataFrame:
    """Per-key EWMA-residual anomaly flags — the monitoring alarm the
    reference's Grafana stack implies over its temperature/pressure
    series: one output row per ANOMALOUS point ``(key, ts, value,
    resid)``. Same per-key applyInPandas shape (and the same fold) as
    :func:`ewma`; the streaming twin
    (:mod:`..streaming.stateful` ``streaming_anomalies``) carries
    ``(y, v, n)`` per key — O(1) state — and flags the identical points
    on any in-order prefix."""
    src = _with_series_bound_gate(
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col).cast("double").alias("ts"),
            F.col(val_col).cast("double").alias("v"),
        ).where(_valid_point()),
        max_points,
    )

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("ts", DoubleType()),
            StructField("value", DoubleType()),
            StructField("resid", DoubleType()),
        ]
    )

    def fold(pdf):
        import pandas as pd

        _check_series_bound(len(pdf), pdf["key"].iloc[0], max_points)
        pdf = pdf.sort_values(["ts", "v"], kind="mergesort")
        flags = anomaly_fold(pdf["v"].tolist(), alpha, k, min_n)
        rows = [
            [pdf["key"].iloc[0], float(t), x, round(r, ndigits)]
            for t, (x, bad, r) in zip(pdf["ts"], flags)
            if bad
        ]
        return pd.DataFrame(rows, columns=["key", "ts", "value", "resid"])

    return src.groupBy("key").applyInPandas(fold, out_schema)


def acf_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lags: tuple[int, ...] = (1, 2, 3),
    ndigits: int = 4,
) -> DataFrame:
    """Per-key autocorrelation of an event-ordered value series at the
    given ``lags`` — the seasonality/persistence diagnostic a telemetry
    pipeline reads before picking window sizes or anomaly baselines
    (the series form of q53's corr moment): Pearson correlation between
    the series and its lag-k shift, ordered by ``(ts, id)`` within each
    key. Returns ``(key, lag, n_pairs, acf)``; ``acf`` is NULL where
    undefined (constant series or < 2 complete pairs), identically on
    both engines. DuckDB twin: :func:`acf_sql`.

    Plan: ONE window pass computes every lag column (same partition
    key, one Exchange + sort), and the per-key aggregate reuses that
    clustering (hash(key) satisfies the groupBy's distribution — no
    second shuffle). Each lag adds a column, not a pass."""
    from pyspark.sql import Window

    if not lags or any(k <= 0 for k in lags):
        raise ValueError(f"lags must be positive, got {lags!r}")
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    v = F.col(value_col).cast("double")
    # the key keeps its ORIGINAL name through the window + aggregate:
    # re-aliasing it between the two defeats Catalyst's alias-aware
    # partitioning propagation and buys a second exchange
    lagged = df.where(F.col(ts_col).isNotNull()).select(
        key_col,
        v.alias("_v"),
        *[F.lag(v, k).over(w).alias(f"_l{k}") for k in lags],
    )
    agg = lagged.groupBy(key_col).agg(
        *[
            F.round(F.corr("_v", f"_l{k}"), ndigits).alias(f"_acf{k}")
            for k in lags
        ],
        *[
            F.count(
                F.when(
                    F.col("_v").isNotNull() & F.col(f"_l{k}").isNotNull(),
                    1,
                )
            ).alias(f"_n{k}")
            for k in lags
        ],
    )
    # unpivot via one explode (one evaluation, not len(lags) unions)
    return agg.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col(f"_n{k}").alias("n_pairs"),
                        F.col(f"_acf{k}").alias("acf"),
                    )
                    for k in lags
                ]
            )
        ).alias("_e"),
    ).select(
        key_col,
        F.col("_e.lag").alias("lag"),
        F.col("_e.n_pairs").alias("n_pairs"),
        F.col("_e.acf").alias("acf"),
    )


def acf_sql(
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lags: tuple[int, ...] = (1, 2, 3),
    ndigits: int = 4,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`acf_by_key` (same ordering, same
    NULL-where-undefined convention)."""
    assert lags
    lag_cols = ", ".join(
        f"lag({value_col}::DOUBLE, {k}) OVER w AS _l{k}" for k in lags
    )
    legs = " UNION ALL ".join(
        f"""
        SELECT {key_col}, CAST({k} AS BIGINT) AS lag,
               COUNT(CASE WHEN _v IS NOT NULL AND _l{k} IS NOT NULL
                          THEN 1 END) AS n_pairs,
               round(corr(_v, _l{k}), {ndigits}) + 0 AS acf
        FROM lagged GROUP BY {key_col}
        """
        for k in lags
    )
    return f"""
    WITH lagged AS (
        SELECT {key_col}, {value_col}::DOUBLE AS _v, {lag_cols}
        FROM {table}
        WHERE {ts_col} IS NOT NULL
        WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col})
    )
    {legs}
    """


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_seconds: int = 3600,
    ndigits: int = 6,
) -> DataFrame:
    """Sample-and-hold time-weighted average per (key, tumbling
    window) — the industrial-historian aggregate (step interpolation:
    each reading HOLDS until the next one) that a plain ``avg`` gets
    wrong on irregularly sampled telemetry (a sensor reporting 59
    minutes of 100 and one minute of 0 averages ~98.3, not 50).

    Semantics, pinned identically on both engines: windows are
    epoch-aligned ``[start, start+W)``; within a window each reading
    holds from its timestamp to the next reading's (ties ordered by
    ``id``), the last holds to the window END, and the span before the
    window's first reading is excluded from numerator and denominator
    (no value is known there — and no cross-window hold: windows stay
    independent, which is what makes the operator embarrassingly
    parallel instead of a sequential scan of the stream). NULL-ts /
    NULL-value rows are excluded. All time arithmetic in integer
    microseconds (``unix_micros`` / ``epoch_us``).

    Returns ``(key, window_start, n_readings, twa)``. One shuffle: the
    lead window partitions on (key, bucket) and the aggregate reuses
    that clustering. DuckDB twin: :func:`time_weighted_avg_sql`."""
    from pyspark.sql import Window

    if window_seconds <= 0:
        raise ValueError(
            f"window_seconds must be positive, got {window_seconds}"
        )
    v = F.col(value_col).cast("double")
    e = (
        df.where(F.col(ts_col).isNotNull() & v.isNotNull())
        .select(
            key_col,
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            v.alias("_v"),
        )
        .withColumn("_b", F.window("_ts", f"{window_seconds} seconds"))
    )
    w = Window.partitionBy(key_col, "_b").orderBy("_ts", "_id")
    weighted = e.select(
        key_col,
        "_b",
        "_v",
        (
            F.coalesce(
                F.unix_micros(F.lead("_ts").over(w)),
                F.unix_micros(F.col("_b.end")),
            )
            - F.unix_micros(F.col("_ts"))
        ).alias("_w"),
    )
    return (
        weighted.groupBy(key_col, "_b")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            F.round(
                F.sum(F.col("_v") * F.col("_w")) / F.sum("_w"), ndigits
            ).alias("twa"),
        )
        .select(
            key_col,
            F.col("_b.start").alias("window_start"),
            "n_readings",
            "twa",
        )
    )


def time_weighted_avg_sql(
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_seconds: int = 3600,
    ndigits: int = 6,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`time_weighted_avg` (same µs arithmetic,
    same hold/exclusion rules)."""
    w_us = int(window_seconds) * 1_000_000
    return f"""
    WITH e AS (
        -- FLOOR division, not DuckDB's truncating '//' (-7 // 2 = -3):
        -- Spark's F.window floors, so a pre-epoch timestamp must land
        -- in the window BELOW zero on both engines (review r13)
        SELECT {key_col}, {value_col}::DOUBLE AS _v, {id_col} AS _id,
               epoch_us({ts_col}) AS _tus,
               epoch_us({ts_col}) // {w_us}
                 - CASE WHEN epoch_us({ts_col}) < 0
                             AND epoch_us({ts_col}) % {w_us} <> 0
                        THEN 1 ELSE 0 END AS _b
        FROM {table}
        WHERE {ts_col} IS NOT NULL AND {value_col} IS NOT NULL
    ), l AS (
        SELECT {key_col}, _b, _v,
               coalesce(
                   lead(_tus) OVER (PARTITION BY {key_col}, _b
                                    ORDER BY _tus, _id),
                   (_b + 1) * {w_us}
               ) - _tus AS _w
        FROM e
    )
    SELECT {key_col}, make_timestamp(_b * {w_us}) AS window_start,
           COUNT(*) AS n_readings,
           round(SUM(_v * _w) / SUM(_w), {ndigits}) + 0 AS twa
    FROM l GROUP BY {key_col}, _b
    """


TREND_EPOCH = "2024-01-01 00:00:00"  # conditioning origin (see below)


def linear_trend_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    origin: str = TREND_EPOCH,
    slope_digits: int = 9,
    intercept_digits: int = 4,
) -> DataFrame:
    """Per-key OLS line of the value series over time — the drift
    diagnostic a telemetry pipeline alerts on (a sensor whose baseline
    creeps is failing long before a threshold trips): ``slope`` =
    covar_samp(t, v) / var_samp(t) in value-units per SECOND,
    ``intercept`` = mean(v) − slope·mean(t) (value at ``origin``).
    Returns ``(key, n_points, slope, intercept)``; NULL slope where
    undefined (constant time column or < 2 points), identically on
    both engines.

    ``t`` is seconds since ``origin`` (NOT the raw epoch): raw epoch
    seconds are ~1.7e9 with in-corpus spread ~1e6, so the variance
    computation would cancel 6+ significant digits before the moments
    ever disagree — shifting to a corpus-local origin keeps both
    engines' co-moment arithmetic well-conditioned, which is what lets
    the rounded outputs hash-match. One combinable aggregate, one
    shuffle. DuckDB twin: :func:`linear_trend_sql`."""
    t = (
        F.unix_micros(F.col(ts_col))
        - F.unix_micros(F.to_timestamp(F.lit(origin)))
    ) / F.lit(1_000_000.0)
    v = F.col(value_col).cast("double")
    agg = (
        df.where(F.col(ts_col).isNotNull() & v.isNotNull())
        .select(F.col(key_col), t.alias("_t"), v.alias("_v"))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (F.covar_samp("_t", "_v") / F.var_samp("_t")).alias("_slope"),
            F.avg("_v").alias("_mv"),
            F.avg("_t").alias("_mt"),
        )
    )
    return agg.select(
        key_col,
        "n_points",
        F.round("_slope", slope_digits).alias("slope"),
        F.round(
            F.col("_mv") - F.col("_slope") * F.col("_mt"), intercept_digits
        ).alias("intercept"),
    )


def linear_trend_sql(
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    origin: str = TREND_EPOCH,
    slope_digits: int = 9,
    intercept_digits: int = 4,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`linear_trend_by_key` (same origin shift,
    same moments)."""
    return f"""
    SELECT {key_col}, n_points,
           round(_slope, {slope_digits}) + 0 AS slope,
           round(_mv - _slope * _mt, {intercept_digits}) + 0 AS intercept
    FROM (
        SELECT {key_col}, COUNT(*) AS n_points,
               covar_samp(_t, _v) / var_samp(_t) AS _slope,
               avg(_v) AS _mv, avg(_t) AS _mt
        FROM (
            SELECT {key_col},
                   (epoch_us({ts_col})
                    - epoch_us(TIMESTAMP '{origin}')) / 1000000.0 AS _t,
                   {value_col}::DOUBLE AS _v
            FROM {table}
            WHERE {ts_col} IS NOT NULL AND {value_col} IS NOT NULL
        ) GROUP BY {key_col}
    )
    """
