"""Core relational query surface (SURVEY.md §2.2-2.6).

Covers [REF] operators (strict rename P1-P3, filters P7/P8, broadcast
lookup join J1, distinct A1, sort/limit W1/W2) and the [EXT] relational
surface the driver contract demands (predicates P9, scalar functions P10,
joins J2-J5, aggregations A3-A6, windows W3-W6, set ops W5).

Determinism/parity rules used throughout (and mirrored in every oracle):
- every floating-point AGGREGATE is rounded identically on both sides;
- every top-k ORDER BY sorts on the rounded value plus a unique key;
- computed integer columns are cast to BIGINT on both sides;
- window frames are fully ordered (unique tie-break) so running values
  are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unimib_simpss_spark.catalog import load_table
from unimib_simpss_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# A3/A6 + P9: grouped aggregation with filter pushdown (TPC-H Q1 shape)
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                        AS sum_qty,
           round(sum(l_extendedprice), 2)                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4)                        AS avg_qty,
           round(avg(l_discount), 4)                        AS avg_disc,
           count(*)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '2000-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: scan → pushed filter → hash agg (partial+final)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# W3: latest-reading-per-key (the reference's natural query on sensor_data)
# --------------------------------------------------------------------------
_Q02_GAP = 28_800  # 8 h — the fixture's event density yields real
#                    multi-event sessions (avg ~2, max ~15 at sf0.01)
_Q02_FUNNEL = ["signup", "view", "click", "purchase"]  # depth-4 chain


def _q02_oracle() -> str:
    from unimib_simpss_spark.operators.sessions import (
        funnel_sql,
        session_stats_sql,
    )
    from unimib_simpss_spark.operators.timeseries import (
        acf_sql,
        linear_trend_sql as trend_sql,
        time_weighted_avg_sql as twa_sql,
    )

    steps = ", ".join(f"'{s}'" for s in _Q02_FUNNEL)
    funnel_steps = " UNION ALL ".join(
        f"SELECT user_id, CAST({i} AS BIGINT) AS seq, t{i} AS ts_a, "
        f"steps_completed, [{steps}][{i}] AS str_val "
        f"FROM f WHERE t{i} IS NOT NULL"
        for i in range(1, len(_Q02_FUNNEL) + 1)
    )
    fsummary_rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS seq, c{i} AS n, "
        + (
            f"round(CAST(c{i} AS DOUBLE) / NULLIF(c{i - 1}, 0), 6)"
            if i > 1
            else "CAST(NULL AS DOUBLE)"
        )
        + f" AS num, [{steps}][{i}] AS str_val FROM fs"
        for i in range(1, len(_Q02_FUNNEL) + 1)
    )
    fcounts = ", ".join(
        f"count(t{i}) AS c{i}" for i in range(1, len(_Q02_FUNNEL) + 1)
    )
    return f"""
    WITH f AS ({funnel_sql(_Q02_FUNNEL)}),
         fs AS (SELECT {fcounts} FROM f),
         tr AS ({trend_sql()})
    SELECT 'latest' AS section, user_id, event_id AS seq, ts AS ts_a,
           CAST(NULL AS TIMESTAMP) AS ts_b, CAST(NULL AS BIGINT) AS n,
           value AS num, event_type AS str_val
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    UNION ALL
    SELECT 'session' AS section, user_id, session_seq AS seq,
           session_start AS ts_a, session_end AS ts_b, n_events AS n,
           duration_sec AS num, CAST(NULL AS VARCHAR) AS str_val
    FROM ({session_stats_sql(_Q02_GAP)})
    UNION ALL
    SELECT 'funnel' AS section, user_id, seq, ts_a,
           CAST(NULL AS TIMESTAMP) AS ts_b, steps_completed AS n,
           CAST(NULL AS DOUBLE) AS num, str_val
    FROM ({funnel_steps})
    UNION ALL
    SELECT 'fsummary' AS section, CAST(NULL AS BIGINT) AS user_id, seq,
           CAST(NULL AS TIMESTAMP) AS ts_a, CAST(NULL AS TIMESTAMP) AS ts_b,
           n, num, str_val
    FROM ({fsummary_rows})
    UNION ALL
    SELECT 'acf' AS section, user_id, lag AS seq,
           CAST(NULL AS TIMESTAMP) AS ts_a, CAST(NULL AS TIMESTAMP) AS ts_b,
           n_pairs AS n, acf AS num, CAST(NULL AS VARCHAR) AS str_val
    FROM ({acf_sql()})
    UNION ALL
    SELECT 'twa' AS section, user_id, CAST(NULL AS BIGINT) AS seq,
           window_start AS ts_a, CAST(NULL AS TIMESTAMP) AS ts_b,
           n_readings AS n, twa AS num, CAST(NULL AS VARCHAR) AS str_val
    FROM ({twa_sql()})
    UNION ALL
    SELECT 'trend' AS section, user_id, CAST(NULL AS BIGINT) AS seq,
           CAST(NULL AS TIMESTAMP) AS ts_a, CAST(NULL AS TIMESTAMP) AS ts_b,
           n_points AS n, num, str_val
    FROM (
        SELECT user_id, n_points, slope AS num, 'slope' AS str_val
        FROM tr
        UNION ALL
        SELECT user_id, n_points, intercept, 'intercept'
        FROM tr
    )
    """


@query("q02_latest_event_per_user", oracle=_q02_oracle())
def q02_latest_event_per_user(
    spark: SparkSession, sf_dir: str, sections=None
) -> DataFrame:
    """The per-user event-sequence analytics host, three sections over
    one events scan:

    - ``latest``: top-1 per key via row_number — the reference's
      latest-per-sensor scan. Single shuffle on the partition key; at
      100 TB prefer this over groupBy(max)+self-join (one vs two).
    - ``session``: gap-based sessionization (operators/sessions.py) —
      the lag window flags >= 8 h gaps, a running sum over the SAME
      user partition numbers the sessions, and the per-session
      aggregate adds NO second exchange (HashPartitioning(user)
      already clusters (user, session_seq) — plan-asserted in tests).
    - ``funnel``: first-completion funnel signup→view→click→purchase
      (depth-4 stacked conditional min-windows over one user
      exchange, strictly-after semantics; one explode pass emits one
      row per completed step, n = steps the user finished). No
      per-user event array anywhere — hot users cost nothing.
    - ``fsummary``: the funnel's step-to-step conversion summary —
      one row per step, n = users reaching the step, num = n divided
      by the previous step's reach (NULL for step 1) — off ONE
      4-column count aggregate over the funnel relation (exchange
      reuse folds it into the per-step legs' shuffles).
    - ``acf``: per-user autocorrelation of the value series at lags
      1..3 (operators/timeseries.py acf_by_key — ONE window pass for
      all lags, aggregate reuses the window's clustering; seq = lag,
      num = acf, n = complete pairs).
    - ``twa``: per-user hourly TIME-WEIGHTED average of the value
      series (operators/timeseries.py time_weighted_avg —
      sample-and-hold step interpolation, the industrial-historian
      aggregate a plain avg gets wrong on irregular telemetry;
      ts_a = window start, num = twa, n = readings).
    - ``trend``: per-user OLS drift line (linear_trend_by_key — one
      combinable covar/var aggregate over origin-shifted seconds, the
      conditioning that lets both engines' moments hash-match); two
      rows per user, str_val = 'slope' | 'intercept', num = the value.
    """
    from unimib_simpss_spark.operators.caching import (
        cache_intermediate,
        materialize_release,
    )
    from unimib_simpss_spark.operators.sessions import (
        funnel_first_completion,
        session_stats,
    )
    from unimib_simpss_spark.operators.timeseries import (
        acf_by_key,
        linear_trend_by_key,
        time_weighted_avg,
    )
    from unimib_simpss_spark.plans.registry import pick_sections

    _ALL = ("latest", "session", "funnel", "fsummary", "acf", "twa", "trend")
    want = pick_sections(sections, _ALL)
    e = _t(spark, sf_dir, "events")
    caches: list = []
    legs: dict = {}
    if len(want) > 1:
        # Every section windows/aggregates on the user key — ONE
        # projected, user-partitioned cache replaces seven scans and
        # seven exchanges of the same table (optimization r18, guide
        # §2.4 "share one exchange"): each window's required
        # ClusteredDistribution(user_id[, ...]) is satisfied by the
        # cached HashPartitioning(user_id), so no section adds an
        # exchange. Single-leg section runs keep the shipped lazy
        # single-scan shape (the q61 discipline).
        e = cache_intermediate(
            e.select(
                "user_id", "event_id", "ts", "value", "event_type"
            ).repartition("user_id")
        )
        caches.append(e)
        from unimib_simpss_spark.operators.caching import checkpoint_mode

        if checkpoint_mode() != "table":
            # Fill the cache NOW: consumers planned before the cached
            # AQE subplan finalizes cannot see its HashPartitioning and
            # each re-adds its own Exchange (measured — an
            # un-materialized cached repartition buys one consumer-side
            # shuffle per section). The fill runs exactly once either
            # way; eager fill just moves it before planning. Table mode
            # re-reads parquet (no partitioning to preserve) — skip the
            # extra job there.
            e.count()
    _nul = lambda t, name: F.lit(None).cast(t).alias(name)  # noqa: E731
    if "latest" in want:
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        legs["latest"] = (
            e.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                F.lit("latest").alias("section"),
                "user_id",
                F.col("event_id").alias("seq"),
                F.col("ts").alias("ts_a"),
                _nul("timestamp", "ts_b"),
                _nul("long", "n"),
                F.col("value").alias("num"),
                F.col("event_type").alias("str_val"),
            )
        )
    if "session" in want:
        legs["session"] = session_stats(e, gap_seconds=_Q02_GAP).select(
            F.lit("session").alias("section"),
            "user_id",
            F.col("session_seq").alias("seq"),
            F.col("session_start").alias("ts_a"),
            F.col("session_end").alias("ts_b"),
            F.col("n_events").alias("n"),
            F.col("duration_sec").alias("num"),
            _nul("string", "str_val"),
        )
    fun = None
    if want & {"funnel", "fsummary"}:
        fun = funnel_first_completion(e, _Q02_FUNNEL)
        if {"funnel", "fsummary"} <= want:
            # two consumers (the step rows + the conversion summary):
            # cache the users-sized funnel relation so the window pass
            # runs once
            fun = cache_intermediate(fun)
            caches.append(fun)
    if "funnel" in want:
        # one explode pass emits all four step rows per user (the four
        # per-step filters were four planned copies of the funnel
        # subtree — optimization r18); rows are identical: step i
        # emits iff t{i} is non-NULL
        legs["funnel"] = (
            fun.select(
                "user_id",
                "steps_completed",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).cast("long").alias("seq"),
                                F.col(f"t{i}").alias("ts_a"),
                                F.lit(step).alias("str_val"),
                            )
                            for i, step in enumerate(_Q02_FUNNEL, start=1)
                        ]
                    )
                ).alias("_e"),
            )
            .where(F.col("_e.ts_a").isNotNull())
            .select(
                F.lit("funnel").alias("section"),
                "user_id",
                F.col("_e.seq").alias("seq"),
                F.col("_e.ts_a").alias("ts_a"),
                _nul("timestamp", "ts_b"),
                F.col("steps_completed").alias("n"),
                _nul("double", "num"),
                F.col("_e.str_val").alias("str_val"),
            )
        )
    if "fsummary" in want:
        # 'fsummary': per-step reach + step-to-step conversion — the
        # standard funnel deliverable (one 4-column aggregate row
        # exploded into one row per step; NULLIF guards the
        # empty-funnel 0/0)
        legs["fsummary"] = (
            fun.agg(
                *[
                    F.count(F.col(f"t{i}")).alias(f"c{i}")
                    for i in range(1, len(_Q02_FUNNEL) + 1)
                ]
            )
            .select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).cast("long").alias("seq"),
                                F.col(f"c{i}").alias("n"),
                                (
                                    F.round(
                                        F.col(f"c{i}").cast("double")
                                        / F.nullif(
                                            F.col(f"c{i - 1}"), F.lit(0)
                                        ),
                                        6,
                                    )
                                    if i > 1
                                    else F.lit(None).cast("double")
                                ).alias("num"),
                                F.lit(step).alias("str_val"),
                            )
                            for i, step in enumerate(_Q02_FUNNEL, start=1)
                        ]
                    )
                ).alias("_e")
            )
            .select(
                F.lit("fsummary").alias("section"),
                _nul("long", "user_id"),
                F.col("_e.seq").alias("seq"),
                _nul("timestamp", "ts_a"),
                _nul("timestamp", "ts_b"),
                F.col("_e.n").alias("n"),
                F.col("_e.num").alias("num"),
                F.col("_e.str_val").alias("str_val"),
            )
        )
    if "acf" in want:
        legs["acf"] = acf_by_key(e).select(
            F.lit("acf").alias("section"),
            "user_id",
            F.col("lag").alias("seq"),
            _nul("timestamp", "ts_a"),
            _nul("timestamp", "ts_b"),
            F.col("n_pairs").alias("n"),
            F.col("acf").alias("num"),
            _nul("string", "str_val"),
        )
    if "twa" in want:
        legs["twa"] = time_weighted_avg(e).select(
            F.lit("twa").alias("section"),
            "user_id",
            _nul("long", "seq"),
            F.col("window_start").alias("ts_a"),
            _nul("timestamp", "ts_b"),
            F.col("n_readings").alias("n"),
            F.col("twa").alias("num"),
            _nul("string", "str_val"),
        )
    if "trend" in want:
        legs["trend"] = linear_trend_by_key(e).select(
            "user_id",
            "n_points",
            F.explode(
                F.array(
                    F.struct(
                        F.col("slope").alias("num"),
                        F.lit("slope").alias("str_val"),
                    ),
                    F.struct(
                        F.col("intercept").alias("num"),
                        F.lit("intercept").alias("str_val"),
                    ),
                )
            ).alias("_e"),
        ).select(
            F.lit("trend").alias("section"),
            "user_id",
            _nul("long", "seq"),
            _nul("timestamp", "ts_a"),
            _nul("timestamp", "ts_b"),
            F.col("n_points").alias("n"),
            F.col("_e.num").alias("num"),
            F.col("_e.str_val").alias("str_val"),
        )
    ordered = [legs[k] for k in _ALL if k in legs]
    out = ordered[0]
    for leg in ordered[1:]:
        out = out.unionAll(leg)
    if caches:
        return materialize_release(out, *caches)
    return out


# --------------------------------------------------------------------------
# J2 + A3 + W6: multi-join, aggregate, global top-k (TPC-H Q3 shape)
# --------------------------------------------------------------------------
@query(
    "q03_top_revenue_orders",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-01-01'
      AND l_shipdate  > TIMESTAMP '1996-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact-dim join → agg → TakeOrderedAndProject top-k.

    Scale note: customer filter prunes before the join; AQE turns the
    filtered customer side into a broadcast when it fits. Global top-k is
    TakeOrderedAndProject — per-partition heaps, no full sort.
    """
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# P9: predicate gauntlet — comparison / IN / BETWEEN / LIKE / NULL / boolean
# --------------------------------------------------------------------------
@query(
    "q04_predicate_gauntlet",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND o_totalprice BETWEEN 10000 AND 200000
      AND o_orderpriority LIKE '1-%'
      AND o_custkey IS NOT NULL
      AND NOT (o_totalprice < 20000)
    """,
)
def q04_predicate_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate family in one pushed-down scan filter."""
    o = _t(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(10000, 200000)
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_custkey").isNotNull()
        & ~(F.col("o_totalprice") < 20000)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


# --------------------------------------------------------------------------
# P10: scalar string/math/conditional + date/time functions in one gauntlet
# (two disjoint-column union legs so every function keeps its exact
# output and type; merged from the former q05/q06 to fit the driver's
# 50-query verification window)
# --------------------------------------------------------------------------
@query(
    "q05_scalar_gauntlet",
    oracle="""
    SELECT 'part_scalars'                       AS family,
           CAST(p_partkey AS BIGINT)            AS row_key,
           upper(substring(p_name, 1, 10))      AS name10,
           concat(p_brand, '#', p_type)         AS brand_type,
           CAST(length(p_name) AS BIGINT)       AS name_len,
           CAST(abs(p_size - 25) AS BIGINT)     AS size_dev,
           round(p_retailprice * 1.1, 2)        AS uplifted,
           CASE WHEN p_size > 25 THEN 'L'
                WHEN p_size > 10 THEN 'M'
                ELSE 'S' END                    AS size_class,
           CAST(NULL AS BIGINT)                 AS order_year,
           CAST(NULL AS BIGINT)                 AS order_month,
           CAST(NULL AS BIGINT)                 AS order_day,
           CAST(NULL AS BIGINT)                 AS order_quarter,
           CAST(NULL AS DATE)                   AS order_date,
           CAST(NULL AS BIGINT)                 AS days_since_epoch_start,
           CAST(NULL AS DATE)                   AS month_start
    FROM part
    UNION ALL
    SELECT 'date_scalars'                       AS family,
           CAST(o_orderkey AS BIGINT)           AS row_key,
           NULL, NULL, NULL, NULL, NULL, NULL,
           CAST(year(o_orderdate) AS BIGINT)    AS order_year,
           CAST(month(o_orderdate) AS BIGINT)   AS order_month,
           CAST(day(o_orderdate) AS BIGINT)     AS order_day,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(o_orderdate AS DATE)            AS order_date,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
                                                AS days_since_epoch_start,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM orders
    WHERE year(o_orderdate) = 1997
    """,
)
def q05_scalar_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function suite — string/math/conditional over part plus
    date extraction/arithmetic/truncation over orders, all JVM
    built-ins inside whole-stage codegen. One tagged union, each leg
    NULL-padding the other's columns so every scalar keeps its type."""
    p = _t(spark, sf_dir, "part")
    o = _t(spark, sf_dir, "orders")
    part_leg = p.select(
        F.lit("part_scalars").alias("family"),
        F.col("p_partkey").cast("long").alias("row_key"),
        F.upper(F.substring("p_name", 1, 10)).alias("name10"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("uplifted"),
        F.when(F.col("p_size") > 25, "L")
        .when(F.col("p_size") > 10, "M")
        .otherwise("S")
        .alias("size_class"),
        F.lit(None).cast("long").alias("order_year"),
        F.lit(None).cast("long").alias("order_month"),
        F.lit(None).cast("long").alias("order_day"),
        F.lit(None).cast("long").alias("order_quarter"),
        F.lit(None).cast("date").alias("order_date"),
        F.lit(None).cast("long").alias("days_since_epoch_start"),
        F.lit(None).cast("date").alias("month_start"),
    )
    date_leg = o.where(F.year("o_orderdate") == 1997).select(
        F.lit("date_scalars").alias("family"),
        F.col("o_orderkey").cast("long").alias("row_key"),
        F.lit(None).cast("string").alias("name10"),
        F.lit(None).cast("string").alias("brand_type"),
        F.lit(None).cast("long").alias("name_len"),
        F.lit(None).cast("long").alias("size_dev"),
        F.lit(None).cast("double").alias("uplifted"),
        F.lit(None).cast("string").alias("size_class"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
    )
    return part_leg.unionAll(date_leg)


# --------------------------------------------------------------------------
# P10: JSON extraction (events.props is a JSON string column)
# --------------------------------------------------------------------------
@query(
    "q07_json_props",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
               AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q07_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over a JSON-string column, then aggregate.

    Reference parity: the reference's wire format is JSON text everywhere
    (consumer.py:128-138); this is the query-side JSON surface.
    """
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).cast("long").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# J2: left outer join with null-handling aggregate
# --------------------------------------------------------------------------
@query(
    "q08_customer_order_stats",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey)                              AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2)     AS total_spent
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def q08_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join preserving customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


# --------------------------------------------------------------------------
# J3: left-semi (EXISTS) + left-anti (NOT EXISTS) joins, tagged union
# --------------------------------------------------------------------------
@query(
    "q09_semi_anti_customers",
    oracle="""
    SELECT 'semi' AS tag, c_custkey, c_name,
           CAST(NULL AS VARCHAR) AS c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    UNION ALL
    SELECT 'anti' AS tag, c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT 'bloom_semi' AS tag, c_custkey, c_name,
           CAST(NULL AS VARCHAR) AS c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def q09_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence AND absence checks as left-semi / left-anti joins, one
    tagged union (merged from the former q09/q10 to fit the driver's
    50-query verification window). The semi leg NULL-pads the anti
    leg's extra column so each side keeps its exact projection.

    The 'bloom_semi' leg runs the SAME existence check through the
    bloom-pruned rewrite (operators/skew.py bloom_pruned_semi_join):
    the probe side is map-side-filtered against a Bloom bit relation of
    the build keys before the shuffle semi join — the runtime-filter
    pattern, semantics-preserving by construction, so its oracle is the
    identical EXISTS (the driver hash proves the rewrite changes
    nothing but the plan).

    Reference parity: the strict lookup-join failure branch
    (mqtt_kafka_producer.py:203-209 — unknown sensor id raises KeyError)
    is exactly the anti-join leg routed to a dead-letter side (see
    operators/sensor_pipeline.py).
    """
    from unimib_simpss_spark.operators.skew import bloom_pruned_semi_join

    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        F.lit("semi").alias("tag"),
        "c_custkey",
        "c_name",
        F.lit(None).cast("string").alias("c_mktsegment"),
    )
    anti = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").select(
        F.lit("anti").alias("tag"), "c_custkey", "c_name", "c_mktsegment"
    )
    bsemi = bloom_pruned_semi_join(
        c, big, "c_custkey", "o_custkey"
    ).select(
        F.lit("bloom_semi").alias("tag"),
        "c_custkey",
        "c_name",
        F.lit(None).cast("string").alias("c_mktsegment"),
    )
    return semi.unionAll(anti).unionAll(bsemi)


# --------------------------------------------------------------------------
# A5: the whole grouping-analytics family in one tagged union — ROLLUP
# (region→nation hierarchy, DataFrame API), CUBE (two independent dims,
# DataFrame API), and GROUPING SETS through the raw spark.sql surface
# (S7: the IDENTICAL SQL text runs on both engines). Merged from the
# former q12/q13/q47 to fit the driver's 50-query verification window.
# Every leg carries grouping() flags so NULL group keys and NULL
# super-aggregate rows stay distinguishable.
# --------------------------------------------------------------------------
_GS_LEG_SQL = """
    SELECT 'gsets_lineitem' AS family,
           l_returnflag AS key1, l_linestatus AS key2,
           count(*)                               AS n_rows,
           round(sum(l_extendedprice), 2)         AS total,
           CAST(grouping(l_returnflag) AS BIGINT) AS g1,
           CAST(grouping(l_linestatus) AS BIGINT) AS g2
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query(
    "q12_rollup_cube",
    oracle=f"""
    SELECT 'rollup_supplier' AS family,
           r_name AS key1, n_name AS key2,
           count(*)                 AS n_rows,
           round(sum(s_acctbal), 2) AS total,
           CAST(grouping(r_name) AS BIGINT) AS g1,
           CAST(grouping(n_name) AS BIGINT) AS g2
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    UNION ALL
    SELECT 'cube_orders' AS family,
           o_orderstatus AS key1, o_orderpriority AS key2,
           count(*)                    AS n_rows,
           round(sum(o_totalprice), 2) AS total,
           CAST(grouping(o_orderstatus) AS BIGINT)   AS g1,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g2
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    {_GS_LEG_SQL}
    """,
)
def q12_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy (broadcast dim joins),
    CUBE over two independent order dimensions, and GROUPING SETS
    submitted as raw SQL text through spark.sql over registered views —
    the engine's full-SQL entry point (S7) checked against the SAME text
    on DuckDB. The family tag + grouping() flags disambiguate every
    super-aggregate row."""
    from unimib_simpss_spark.catalog import register_views

    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    rollup_leg = (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("s_acctbal"), 2).alias("total"),
            F.grouping("r_name").cast("long").alias("g1"),
            F.grouping("n_name").cast("long").alias("g2"),
        )
        .select(
            F.lit("rollup_supplier").alias("family"),
            F.col("r_name").alias("key1"),
            F.col("n_name").alias("key2"),
            "n_rows",
            "total",
            "g1",
            "g2",
        )
    )
    o = _t(spark, sf_dir, "orders")
    cube_leg = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.grouping("o_orderstatus").cast("long").alias("g1"),
            F.grouping("o_orderpriority").cast("long").alias("g2"),
        )
        .select(
            F.lit("cube_orders").alias("family"),
            F.col("o_orderstatus").alias("key1"),
            F.col("o_orderpriority").alias("key2"),
            "n_rows",
            "total",
            "g1",
            "g2",
        )
    )
    register_views(spark, sf_dir, names=("lineitem",))
    gsets_leg = spark.sql(_GS_LEG_SQL)
    return rollup_leg.unionAll(cube_leg).unionAll(gsets_leg)


# --------------------------------------------------------------------------
# W4: ranking + lag analytic windows
# --------------------------------------------------------------------------
@query(
    "q14_supplier_rank",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           CAST(rank() OVER w AS BIGINT)        AS bal_rank,
           CAST(dense_rank() OVER w AS BIGINT)  AS bal_dense_rank,
           lag(s_acctbal) OVER w                AS prev_bal,
           round(percent_rank() OVER w, 6)      AS bal_pct_rank,
           round(cume_dist() OVER w, 6)         AS bal_cume_dist,
           CAST(ntile(4) OVER w AS BIGINT)      AS bal_quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def q14_supplier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over a per-nation window:
    rank / dense_rank / lag plus the distribution forms —
    percent_rank, cume_dist, and ntile(4) quartile bucketing (the
    remaining W4 analytic functions; all share ONE window spec so
    Spark evaluates them in a single WindowExec pass over one
    exchange)."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.lag("s_acctbal").over(w).alias("prev_bal"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
    )


# --------------------------------------------------------------------------
# W4: running aggregate with an explicit frame
# --------------------------------------------------------------------------
@query(
    "q15_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    WHERE o_custkey <= 200
    """,
)
def q15_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with ROWS frame; fully-ordered → bit-identical folds."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


# --------------------------------------------------------------------------
# W5: union / intersect / except
# --------------------------------------------------------------------------
@query(
    "q16_set_ops",
    oracle="""
    WITH seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                 WHERE o_totalprice > 250000)
    SELECT 'both' AS tag, c_custkey FROM (SELECT * FROM seg INTERSECT SELECT * FROM big)
    UNION ALL
    SELECT 'seg_only' AS tag, c_custkey FROM (SELECT * FROM seg EXCEPT SELECT * FROM big)
    UNION ALL
    SELECT 'big_only' AS tag, c_custkey FROM (SELECT * FROM big EXCEPT SELECT * FROM seg)
    """,
)
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL with tagged provenance."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    seg = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        o.where(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    tag = lambda df, t: df.select(F.lit(t).alias("tag"), "c_custkey")  # noqa: E731
    return (
        tag(seg.intersect(big), "both")
        .unionAll(tag(seg.subtract(big), "seg_only"))
        .unionAll(tag(big.subtract(seg), "big_only"))
    )


# --------------------------------------------------------------------------
# A1/A4: distinct + count distinct
# --------------------------------------------------------------------------
def _q17_oracle() -> str:
    from unimib_simpss_spark.functions.sketches import hll_distinct_sql

    hll = hll_distinct_sql("orders", "o_orderstatus", "o_custkey")
    return f"""
    WITH exact AS (
        SELECT o_orderstatus,
               count(DISTINCT o_custkey)  AS n_customers,
               count(*)                   AS n_orders,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY o_orderstatus
    ), hll AS ({hll})
    SELECT o_orderstatus, n_customers, n_orders, avg_price,
           hll_est AS hll_customers
    FROM exact JOIN hll USING (o_orderstatus)
    """


@query("q17_distinct_counts", oracle=_q17_oracle())
def q17_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) with expand-based partial aggregation, next to
    the PORTABLE deterministic HyperLogLog estimate of the same
    cardinality (functions/sketches.py hll_distinct: md5-bucketed
    registers, integer-exact harmonic sum — unlike
    approx_count_distinct's engine-private HLL++ sketch, this one is
    value-checkable against the DuckDB oracle bit-for-bit). The HLL
    side is the 100 TB cardinality path: one map-side-combinable
    shuffle to (status × 512) register rows, no distinct expand."""
    from unimib_simpss_spark.functions.sketches import hll_distinct

    o = _t(spark, sf_dir, "orders")
    exact = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )
    hll = hll_distinct(o, ["o_orderstatus"], "o_custkey").withColumnRenamed(
        "hll_est", "hll_customers"
    )
    return exact.join(hll, "o_orderstatus")


# --------------------------------------------------------------------------
# A6: HAVING
# --------------------------------------------------------------------------
@query(
    "q18_frequent_buyers",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def q18_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .where(F.col("n_orders") >= 15)
    )


# --------------------------------------------------------------------------
# W6 (global top-k) + W1/W2/S7 (ordered scan + limit, the reference's CQL
# query shape, Readme.md:268) — one tagged union, merged from the former
# q19/q22 to fit the driver's 50-query window. Columns are NULL-padded per
# leg so both keep native types.
# --------------------------------------------------------------------------
@query(
    "q19_global_topk",
    oracle="""
    SELECT * FROM (
        SELECT 'lineitem_topk' AS leg,
               l_orderkey, l_linenumber, l_extendedprice,
               NULL AS event_id, NULL AS event_type, NULL AS user_id,
               NULL AS ts
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 20
    )
    UNION ALL
    SELECT * FROM (
        SELECT 'events_limit' AS leg,
               NULL AS l_orderkey, NULL AS l_linenumber,
               NULL AS l_extendedprice,
               event_id, event_type, user_id, ts
        FROM events
        ORDER BY event_type, ts, event_id
        LIMIT 15
    )
    """,
)
def q19_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k over lineitem (TakeOrderedAndProject: per-partition
    heaps, no full sort) unioned with the reference's cqlsh
    SELECT…ORDER BY…LIMIT shape over events — both legs keep limits
    inside their own subquery, so each stays a k-row heap scan at any
    scale."""
    l = _t(spark, sf_dir, "lineitem")
    topk = (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
        .select(
            F.lit("lineitem_topk").alias("leg"),
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("string").alias("event_type"),
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast("timestamp").alias("ts"),
        )
    )
    e = _t(spark, sf_dir, "events")
    limited = (
        e.select("event_id", "event_type", "user_id", "ts")
        .orderBy("event_type", "ts", "event_id")
        .limit(15)
        .select(
            F.lit("events_limit").alias("leg"),
            F.lit(None).cast("long").alias("l_orderkey"),
            F.lit(None).cast("int").alias("l_linenumber"),
            F.lit(None).cast("double").alias("l_extendedprice"),
            "event_id",
            "event_type",
            "user_id",
            "ts",
        )
    )
    return topk.unionAll(limited)


# --------------------------------------------------------------------------
# J5: as-of join (event-time), merge-union formulation
# --------------------------------------------------------------------------
@query(
    "q20_asof_click_before_purchase",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, 0 AS side,
               event_id AS click_id, value AS click_value
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, event_id, 1 AS side,
               NULL AS click_id, NULL AS click_value
        FROM events WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT user_id, ts, event_id, side,
               last_value(click_id IGNORE NULLS) OVER w AS asof_click_id,
               last_value(click_value IGNORE NULLS) OVER w AS asof_click_value
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
           asof_click_id, asof_click_value
    FROM m WHERE side = 1
    """,
)
def q20_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click at-or-before each purchase, per user.

    Implemented as the scalable merge-union: tag both sides, union, and
    carry the last non-null left-side value forward in one window pass —
    ONE shuffle on the key, no row-multiplying range join. This is the
    100 TB formulation (a naive ts<=ts join is quadratic per key).
    """
    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("side"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
    )
    u = clicks.unionAll(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("asof_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn(
            "asof_click_value", F.last("click_value", ignorenulls=True).over(w)
        )
        .where(F.col("side") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "asof_click_id",
            "asof_click_value",
        )
    )


# --------------------------------------------------------------------------
# J2 (full outer / right): nation coverage from both fact directions
# --------------------------------------------------------------------------
@query(
    "q43_nation_coverage",
    oracle="""
    WITH s AS (
        SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
        FROM supplier GROUP BY 1
    ), c AS (
        SELECT c_nationkey AS nationkey, count(*) AS n_customers
        FROM customer GROUP BY 1
    )
    SELECT coalesce(s.nationkey, c.nationkey) AS nationkey,
           coalesce(n_suppliers, 0) AS n_suppliers,
           coalesce(n_customers, 0) AS n_customers
    FROM s FULL OUTER JOIN c ON s.nationkey = c.nationkey
    """,
)
def q43_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates — rows survive from either
    side; the nullable gap is filled with 0 on both engines."""
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return (
        s.join(c, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
    )


# --------------------------------------------------------------------------
# W4 (lead / ntile / percent_rank): order timeline analytics
# --------------------------------------------------------------------------
@query(
    "q44_order_timeline",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lead(o_orderkey) OVER w                       AS next_orderkey,
           CAST(ntile(4) OVER w AS BIGINT)               AS spend_quartile,
           round(percent_rank() OVER w, 6)               AS pr
    FROM orders
    WHERE o_custkey < 300
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q44_order_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead / ntile / percent_rank over a per-customer timeline window."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.ntile(4).over(w).cast("long").alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


# --------------------------------------------------------------------------
# A4 (approx count distinct): Spark's built-in HLL++ sketch is
# engine-private, so it can't carry a value-level oracle; accuracy is
# bounded in tests/test_relational_extra.py against the exact count.
# NOT a registry entry (folded per VERDICT r8 #4): the oracle-paired
# approx-distinct surface is q17's hll_customers column (the portable
# in-engine HLL, functions/sketches.py hll_distinct), which q17 checks
# hash-green against the same DuckDB arithmetic every round.
# --------------------------------------------------------------------------
def approx_distinct_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct(user_id) per event_type (rsd=0.02) next to
    the exact distinct count — the 100 TB cardinality path (one pass,
    fixed-size sketch, no distinct shuffle)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


# --------------------------------------------------------------------------
# Scale-technique variants: binned range join (vs BNL) and salted join
# (vs hot-key shuffle). Oracles are plain declarative SQL — the Spark
# side must produce the IDENTICAL answer through the rewritten plan.
# --------------------------------------------------------------------------
_PRICE_BANDS = [
    (f"b{i:02d}", float(i * 50_000), float((i + 1) * 50_000)) for i in range(12)
]
_PRICE_BANDS_SQL = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)


_PART_BANDS_SQL = """
        VALUES ('budget', 0.0, 940.0),
               ('mid', 940.0, 980.0),
               ('premium', 980.0, 1e12)
"""


@query(
    "q48_binned_range_join",
    oracle=f"""
    WITH bands(band, lo, hi) AS (VALUES {_PRICE_BANDS_SQL}),
    part_bands(band, lo, hi) AS ({_PART_BANDS_SQL})
    SELECT 'orders_binned' AS leg, band,
           count(*) AS n_rows, round(avg(o_totalprice), 4) AS avg_price
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    UNION ALL
    SELECT 'part_bnl' AS leg, band,
           count(*) AS n_rows, round(avg(p_retailprice), 4) AS avg_price
    FROM part JOIN part_bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def q48_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both J4 range-join strategies in one tagged union (merged q11+q48
    to fit the driver's 50-query window), same band-join semantics
    through two physical plans:

    - ``orders_binned``: the binned equi-join rewrite (operators/skew.py)
      — ranges explode to overlapping fixed-width bins, facts map to one
      bin, the bin equi-join co-partitions both sides, and the residual
      BETWEEN restores exact semantics. |A|·|B| BNL becomes Σ co-binned
      pairs — the 100 TB formulation.
    - ``part_bnl``: broadcast-nested-loop against a constant 3-row band
      dim — the right plan when the dim side is tiny (no shuffle at all;
      the fact side streams through).
    """
    from unimib_simpss_spark.operators.skew import binned_range_join

    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        _PRICE_BANDS, schema="band string, lo double, hi double"
    )
    # hi is exclusive: shrink by epsilon so the hi-edge bin matches BETWEEN
    joined = binned_range_join(
        o.select("o_orderkey", "o_totalprice"),
        bands.withColumn("hi", F.col("hi") - F.lit(1e-9)),
        value_col="o_totalprice",
        lo_col="lo",
        hi_col="hi",
        bin_width=50_000.0,
    )
    binned_leg = joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    ).select(F.lit("orders_binned").alias("leg"), "band", "n_rows", "avg_price")

    p = _t(spark, sf_dir, "part")
    part_bands = spark.createDataFrame(
        [("budget", 0.0, 940.0), ("mid", 940.0, 980.0), ("premium", 980.0, 1e12)],
        schema="band string, lo double, hi double",
    )
    bnl_leg = (
        p.join(
            F.broadcast(part_bands),
            (p.p_retailprice >= part_bands.lo) & (p.p_retailprice < part_bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .select(F.lit("part_bnl").alias("leg"), "band", "n_rows", "avg_price")
    )
    return binned_leg.unionAll(bnl_leg)


def _salted_join_oracle() -> str:
    from unimib_simpss_spark.operators.skew import key_skew_profile_sql

    profile = key_skew_profile_sql("orders", "o_custkey", top_n=10)
    return f"""
    SELECT 'join' AS section,
           o_orderpriority AS key,
           count(*) AS n1,
           count(DISTINCT c_nationkey) AS n2,
           CAST(NULL AS DOUBLE) AS ratio
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY o_orderpriority
    UNION ALL
    SELECT section, key,
           CASE section WHEN 'hot' THEN cnt ELSE n_rows END AS n1,
           CASE section WHEN 'hot' THEN rank ELSE n_keys END AS n2,
           CASE section WHEN 'hot' THEN share ELSE skew_factor END AS ratio
    FROM ({profile})
    """


@query("q49_salted_join", oracle=_salted_join_oracle())
def q49_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join next to the skew PROFILE of the very key
    being salted (merged q49+q70 to stay inside the driver's 50-slot
    window):

    - 'join' — the fact side is salted into 8 sub-keys, the dim side
      replicated 8× — identical rows to the plain join (the oracle
      proves it), with hot keys spread across 8 tasks instead of one.
      The explicit-salt tool for when AQE can't split (single giant
      key, stateful streaming aggs).
    - 'hot' / 'summary' — the measurement that justifies the rewrite
      (operators/skew.py key_skew_profile over orders.o_custkey): the
      top-10 heaviest keys with their row shares, plus total rows /
      distinct keys / skew_factor = max count over mean count. One
      combinable groupBy — map-side partials collapse the hot key
      BEFORE the shuffle, so profiling a skewed key does not itself
      skew; NULL keys surface as the string 'NULL' instead of
      vanishing."""
    from unimib_simpss_spark.operators.skew import key_skew_profile, salted_join

    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    joined = salted_join(o, c.select("custkey", "c_nationkey"), on="custkey",
                         salt_buckets=8, salt_by="o_orderkey")
    join_leg = (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.countDistinct("c_nationkey").alias("n2"),
        )
        .select(
            F.lit("join").alias("section"),
            F.col("o_orderpriority").alias("key"),
            "n1",
            "n2",
            F.lit(None).cast("double").alias("ratio"),
        )
    )
    prof = key_skew_profile(
        _t(spark, sf_dir, "orders"), "o_custkey", top_n=10
    ).select(
        "section",
        "key",
        F.when(F.col("section") == "hot", F.col("cnt"))
        .otherwise(F.col("n_rows"))
        .alias("n1"),
        F.when(F.col("section") == "hot", F.col("rank"))
        .otherwise(F.col("n_keys"))
        .alias("n2"),
        F.when(F.col("section") == "hot", F.col("share"))
        .otherwise(F.col("skew_factor"))
        .alias("ratio"),
    )
    return join_leg.unionAll(prof)


# --------------------------------------------------------------------------
# A3 variant: pivot (wide conditional aggregation). Explicit pivot values
# skip Spark's extra distinct-scan pass — at 100 TB the value list must be
# declared (or derived from a tiny dim), never discovered from the fact.
# --------------------------------------------------------------------------
@query(
    "q52_pivot_returnflag",
    oracle="""
    SELECT l_linestatus,
           round(sum(l_extendedprice) FILTER (WHERE l_returnflag = 'A'), 2) AS rf_a,
           round(sum(l_extendedprice) FILTER (WHERE l_returnflag = 'N'), 2) AS rf_n,
           round(sum(l_extendedprice) FILTER (WHERE l_returnflag = 'R'), 2) AS rf_r
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q52_pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = groupBy().pivot(values).agg(): compiles to ONE pass of
    conditional partial aggregates (same plan as SQL FILTER clauses) —
    a single shuffle of |groups| x |pivot values| cells."""
    l = _t(spark, sf_dir, "lineitem")
    p = (
        l.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_extendedprice"), 2))
    )
    return p.select(
        "l_linestatus",
        F.col("A").alias("rf_a"),
        F.col("N").alias("rf_n"),
        F.col("R").alias("rf_r"),
    )


# --------------------------------------------------------------------------
# A3 variant: statistical profile — variance/stddev/corr/covar are
# single-pass partial-aggregatable moments; exact percentiles need a
# per-group sort but stay distributed (one shuffle on the group key).
# --------------------------------------------------------------------------
_Q53_QUANTILES = {"p50_hist": 0.5, "p90_hist": 0.9}


def _q53_oracle() -> str:
    from unimib_simpss_spark.functions.sketches import hist_quantile_sql

    hq = hist_quantile_sql(
        "lineitem", "l_returnflag", "l_extendedprice", _Q53_QUANTILES
    )
    return f"""
    -- + 0 on the signed moments normalizes DuckDB's -0.0 (round of a
    -- tiny negative corr/covar) to +0.0 to match Spark's BigDecimal round
    WITH base AS (
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4)                 AS sd_qty,
               round(var_samp(l_quantity), 4)                    AS var_qty,
               round(corr(l_quantity, l_extendedprice), 4) + 0   AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 2) + 0
                                                                 AS covar_qty_price,
               round(quantile_disc(l_extendedprice, 0.5), 2)     AS median_price,
               round(quantile_disc(l_extendedprice, 0.9), 2)     AS p90_price
        FROM lineitem
        GROUP BY l_returnflag
    ),
    hq AS ({hq})
    -- LEFT join: a group whose values are all NULL has no histogram
    -- row (the sketch drops NULLs) but must keep its exact-stats row
    SELECT base.*, hq.p50_hist, hq.p90_hist
    FROM base LEFT JOIN hq USING (l_returnflag)
    """


@query("q53_stat_profile", oracle=_q53_oracle())
def q53_stat_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment aggregates (stddev/var/corr/covar) + exact
    percentiles, grouped. All moments are map-side combinable.
    Percentiles are DISCRETE (percentile_disc = SQL-standard smallest
    value with cum. distribution >= p): both engines then return an
    actual data element, dodging the last-ulp interpolation arithmetic
    that makes quantile_cont round differently across engines.

    p50_hist/p90_hist put the fixed-memory histogram-quantile sketch
    (functions/sketches.py: hist_quantile) on the same rows as the
    exact percentiles — the mergeable estimate the 100 TB path uses
    where per-group sorts don't fit, with its error visible against
    the exact column it approximates. Value-level oracle-checked."""
    from unimib_simpss_spark.functions.sketches import hist_quantile

    l = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    base = l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"), 2
        ).alias("median_price"),
        F.round(
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)"), 2
        ).alias("p90_price"),
        # histogram stats ride the SAME aggregate (one scan serves the
        # moments and the sketch; ReusedExchange feeds both consumers)
        F.min(price).alias("vmin"),
        F.max(price).alias("vmax"),
        F.count("l_extendedprice").alias("n"),
    )
    hq = hist_quantile(
        l,
        ["l_returnflag"],
        "l_extendedprice",
        _Q53_QUANTILES,
        stats=base.select("l_returnflag", "vmin", "vmax", "n"),
    )
    return base.drop("vmin", "vmax", "n").join(hq, "l_returnflag", "left")


# --------------------------------------------------------------------------
# Correlated scalar subquery through the full-SQL surface (S7). Catalyst
# decorrelates it into an aggregate + join — no per-row re-execution, so
# the shape survives at any scale. Identical SQL text on both engines.
# --------------------------------------------------------------------------
_CORRELATED_SQL = """
    SELECT c_mktsegment,
           count(*)               AS n_above,
           round(avg(c_acctbal), 2) AS avg_bal_above
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal)
                       FROM customer c2
                       WHERE c2.c_mktsegment = c.c_mktsegment)
    GROUP BY c_mktsegment
"""


@query("q56_correlated_subquery", oracle=_CORRELATED_SQL)
def q56_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their segment's mean balance. Proves the SQL
    entry point handles correlated scalar subqueries (decorrelated by
    Catalyst into agg + broadcast join, visible in explain())."""
    from unimib_simpss_spark.catalog import register_views

    register_views(spark, sf_dir, names=("customer",))
    return spark.sql(_CORRELATED_SQL)


# --------------------------------------------------------------------------
# J2 at depth: six-way star join (TPC-H Q5 shape). The point is what
# Catalyst does unprompted: region/nation broadcast (tiny), customer/
# supplier broadcast under AQE at this SF, join order driven by the
# pushed region filter — at 100 TB the same declarative plan flips the
# big sides to shuffle joins without a code change.
# --------------------------------------------------------------------------
@query(
    "q60_regional_revenue",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON c_nationkey = n_nationkey
                   AND s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
)
def q60_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation where customer and supplier are co-national,
    restricted to two regions — the deepest join tree in the suite,
    left entirely to Catalyst/AQE ordering."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n, (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey))
        .join(r, n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
