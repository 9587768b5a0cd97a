"""Event sessionization and funnel analysis — the two canonical
large-scale clickstream/telemetry operators the reference's sensor
pipeline implies but never materializes (its Grafana/Graphite services
chart event streams, `docker-compose.yml:74-100`; per-device event
sequences are exactly what `simpss.sensor_data` stores,
`cassandra_storage.py:36-60`).

Scale shapes (the 100 TB contract):

- :func:`sessionize` is ONE shuffle on the user key: a lag window
  flags gap boundaries, a running-sum window over the SAME partition
  key numbers the sessions — two stacked WindowExecs, one Exchange.
- :func:`session_stats` groups on ``(user, session_seq)`` directly on
  top of that window output: ``HashPartitioning(user)`` satisfies
  ``ClusteredDistribution(user, session_seq)`` (every (user, seq)
  group lives inside one user partition), so Catalyst adds NO second
  exchange — asserted in tests/test_relational_extra.py.
- :func:`session_stats_native` is the same aggregation through
  Spark's built-in ``session_window`` (dynamic-gap session windows,
  SPARK-10816) — the streaming-legal form (the same groupBy runs
  under ``withWatermark`` in Structured Streaming). Batch parity with
  the explicit form is pinned by test; the explicit form exists
  because it also yields per-EVENT session tags (native
  session_window only aggregates).
- :func:`funnel_first_completion` is stacked conditional
  min-windows: step 1 is an unconditioned ``min(ts) FILTER
  (type = step1)`` over the whole user partition; step i is the first
  step-i event STRICTLY after the step-(i-1) completion, one stacked
  WindowExec per step over the SAME exchange + sort (t_{i-1} is a
  per-row column when step i's window runs). One scan, one shuffle,
  zero joins; nothing ever materializes a per-user event array (no
  collect_list — hot users cost nothing extra).

Rows with a NULL timestamp are EXCLUDED by both operators (an event
with no position in time belongs to no session and completes no
step) — mirrored in the SQL twins.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "session_stats",
    "session_stats_native",
    "funnel_first_completion",
    "sessionize_sql",
    "session_stats_sql",
    "funnel_sql",
]


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Tag every event with its per-user session ordinal: a new
    session starts when the gap to the previous event (same user,
    ordered by ``(ts, id)`` — the id breaks timestamp ties
    deterministically) reaches ``gap_seconds`` (delta >= gap → new;
    the ecosystem-standard session-window rule, so the built-in
    ``session_window`` twin agrees EXACTLY at the same gap). Output =
    the input columns plus ``session_seq`` (1-based per user).

    The delta is computed in integer MICROSECONDS (``unix_micros`` /
    DuckDB ``epoch_us``) — ``unix_timestamp`` truncates sub-second
    precision and would mis-place events within a second of the
    boundary; integer µs make both engines bit-agree.

    One shuffle: both windows partition on ``user_col``, so the lag
    and the running sum share a single Exchange + sort."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    is_new = (
        prev.isNull()
        | (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
            >= F.lit(int(gap_seconds) * 1_000_000)
        )
    ).cast("long")
    return (
        events.where(F.col(ts_col).isNotNull())
        .withColumn(
            "session_seq",
            F.sum(is_new).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session summaries off :func:`sessionize`'s tags:
    ``(user, session_seq, session_start, session_end, n_events,
    duration_sec)``. The groupBy keys on ``(user, session_seq)`` but
    costs NO second exchange — the window's HashPartitioning(user)
    already clusters every (user, seq) group (plan-asserted)."""
    tagged = sessionize(events, gap_seconds, user_col, ts_col, id_col)
    return tagged.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        # integer µs both engines, rounded µs-exact seconds — never
        # unix_timestamp's silent sub-second truncation
        F.round(
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000.0),
            6,
        ).alias("duration_sec"),
    )


def session_stats_native(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """:func:`session_stats` through Spark's BUILT-IN
    ``session_window`` (merging session windows in the aggregation
    exec — the form that also runs under a watermark in Structured
    Streaming). Same output contract; ``session_seq`` is recovered by
    ranking each user's sessions by start time (a window on the
    aggregation's own user-keyed clustering).

    Semantics: session_window merges an event iff it lands strictly
    inside the previous window (delta < gap), i.e., a new session at
    delta >= gap — exactly :func:`sessionize`'s rule at the SAME gap,
    so batch parity is exact at full timestamp precision (pinned by
    test)."""
    grouped = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(
            user_col,
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w = Window.partitionBy(user_col).orderBy("session_start")
    return grouped.select(
        user_col,
        F.row_number().over(w).cast("long").alias("session_seq"),
        "session_start",
        "session_end",
        "n_events",
        F.round(
            (
                F.unix_micros(F.col("session_end"))
                - F.unix_micros(F.col("session_start"))
            )
            / F.lit(1_000_000.0),
            6,
        ).alias("duration_sec"),
    )


def funnel_first_completion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-completion funnel over ordered ``steps``: per user,
    ``t1`` = the first step-1 event, ``t{i}`` = the first step-i event
    STRICTLY after ``t{i-1}`` (the standard earliest-completion funnel
    — a step-2 event before any step-1 event does not count), plus
    ``steps_completed``. Users with no step-1 event emit no row.

    Shape: ONE scan, ONE exchange. Each ``t{i}`` is a conditional
    ``min`` over the SAME whole-partition user window, referencing
    ``t{i-1}`` (a per-row column by then) in its condition — the
    chained dependency costs one stacked WindowExec per step over one
    shared sort, never a join. The per-user aggregate at the end
    collapses the (per-user-constant) window columns and reuses the
    window's clustering, so no second exchange. A NULL ``t{i-1}``
    nulls the comparison, so incomplete prefixes propagate exactly as
    in the join-chain form this replaced — that form re-referenced
    its own accumulating output per step, doubling the planned
    subtree each step (2^k scans of the events table at depth k,
    ~140 planned scans through q02's five funnel consumers; optimization
    r18). No per-user event ARRAY is ever collected, but each of the k
    stacked unbounded WindowExecs buffers a user's filtered step events
    in a spillable row buffer (ADVICE r18): a pathologically hot user
    costs k spillable partition buffers plus a straggling sort
    partition, where the replaced join-chain streamed through partial
    aggregates. (A per-(user, step) min-ts pre-aggregation would NOT
    fix that: t_i is the min of step-i timestamps AFTER t_{i-1}, so
    every step-i timestamp is a candidate, not just the global min. If
    bench-visible skew ever shows up here, dedup exact-duplicate
    (user, step, ts) rows first — the recurrence is insensitive to
    multiplicity — and lean on the windows' spill path.)"""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    e = events.where(
        F.col(ts_col).isNotNull() & F.col(type_col).isin(list(steps))
    ).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_tp"),
    )
    wu = Window.partitionBy("user_id")
    cur = e.withColumn(
        "t1",
        F.min(F.when(F.col("_tp") == steps[0], F.col("_ts"))).over(wu),
    )
    for i, step in enumerate(steps[1:], start=2):
        cur = cur.withColumn(
            f"t{i}",
            F.min(
                F.when(
                    (F.col("_tp") == step)
                    & (F.col("_ts") > F.col(f"t{i - 1}")),
                    F.col("_ts"),
                )
            ).over(wu),
        )
    tcols = [f"t{i}" for i in range(1, len(steps) + 1)]
    out = (
        cur.groupBy("user_id")
        .agg(*[F.min(t).alias(t) for t in tcols])
        .where(F.col("t1").isNotNull())
    )
    done: Column = F.lit(1)
    for i in range(2, len(steps) + 1):
        done = done + F.col(f"t{i}").isNotNull().cast("int")
    return out.select(
        # the key keeps the CALLER'S column name (review r13: the
        # internal user_id alias must not leak into the output schema)
        F.col("user_id").alias(user_col),
        done.cast("long").alias("steps_completed"),
        *tcols,
    )


# ------------------------------------------------------------ SQL twins
def sessionize_sql(gap_seconds: int = 1800, table: str = "events") -> str:
    """DuckDB twin of :func:`sessionize` (same µs-exact >= gap rule and
    (ts, event_id) tie order)."""
    return f"""
    SELECT * EXCLUDE (is_new), SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM (
        SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= {int(gap_seconds) * 1_000_000}
                       THEN 1 ELSE 0 END AS is_new
        FROM {table}
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    """


def session_stats_sql(gap_seconds: int = 1800, table: str = "events") -> str:
    """DuckDB twin of :func:`session_stats`."""
    return f"""
    SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           round((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0, 6)
               AS duration_sec
    FROM ({sessionize_sql(gap_seconds, table)})
    GROUP BY user_id, session_seq
    """


def funnel_sql(steps: list[str], table: str = "events") -> str:
    """DuckDB twin of :func:`funnel_first_completion` (same strict-after
    chaining)."""
    assert steps
    quoted = [s.replace("'", "''") for s in steps]
    ctes = [
        f"s1 AS (SELECT user_id, MIN(ts) AS t1 FROM {table} "
        f"WHERE ts IS NOT NULL AND event_type = '{quoted[0]}' GROUP BY user_id)"
    ]
    for i, s in enumerate(quoted[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, MIN(e.ts) AS t{i} "
            f"FROM {table} e JOIN s{i - 1} p ON e.user_id = p.user_id "
            f"WHERE e.ts IS NOT NULL AND e.event_type = '{s}' "
            f"AND e.ts > p.t{i - 1} GROUP BY e.user_id)"
        )
    joins = " ".join(
        f"LEFT JOIN s{i} USING (user_id)" for i in range(2, len(steps) + 1)
    )
    done = " + ".join(
        ["1"]
        + [
            f"CASE WHEN t{i} IS NOT NULL THEN 1 ELSE 0 END"
            for i in range(2, len(steps) + 1)
        ]
    )
    tcols = ", ".join(f"t{i}" for i in range(1, len(steps) + 1))
    return f"""
    WITH {", ".join(ctes)}
    SELECT user_id, CAST({done} AS BIGINT) AS steps_completed, {tcols}
    FROM s1 {joins}
    """
