"""Checks for queries without a value-level oracle (q45) and plan-shape
assertions that the oracle harness can't see (broadcast choice,
pushdown)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from unimib_simpss_spark.plans import registry


def test_approx_distinct_within_rsd(spark, sf_dir):
    from unimib_simpss_spark.plans.relational import approx_distinct_builtin

    rows = approx_distinct_builtin(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(3, 0.1 * r.exact_users), (
            r.event_type,
            r.approx_users,
            r.exact_users,
        )


def test_dim_join_is_broadcast(spark, sf_dir):
    """q03's region/nation dims must broadcast, not shuffle."""
    plan = registry.queries()["q03_top_revenue_orders"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """q01's shipdate filter must reach the parquet scan."""
    df = registry.queries()["q01_pricing_summary"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1][:200]


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change the joined row multiset."""
    from unimib_simpss_spark.operators.skew import salted_join

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("k"), "o_orderkey"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_nationkey"
    )
    plain = sorted(map(tuple, o.join(c, "k").collect()))
    salted = sorted(map(tuple, salted_join(o, c, on="k", salt_buckets=4,
                                           salt_by="o_orderkey").collect()))
    assert plain == salted


def test_salted_join_rejects_full_outer(spark, sf_dir):
    import pytest as _pytest

    from unimib_simpss_spark.operators.skew import salted_join

    df = spark.range(2).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError):
        salted_join(df, df, on="k", how="full_outer")


def test_binned_range_join_matches_between(spark, sf_dir):
    """Bin rewrite must equal the naive BETWEEN join, including rows on
    bin boundaries."""
    from unimib_simpss_spark.operators.skew import binned_range_join

    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0, 49, 50, 99, 100, 150, 249, 250])],
        "id long, v double",
    )
    ranges = spark.createDataFrame(
        [("a", 0.0, 99.0), ("b", 50.0, 149.0), ("c", 240.0, 260.0)],
        "name string, lo double, hi double",
    )
    naive = sorted(
        (r.id, r.name)
        for r in facts.join(ranges, facts.v.between(ranges.lo, ranges.hi)).collect()
    )
    binned = sorted(
        (r.id, r.name)
        for r in binned_range_join(facts, ranges, "v", "lo", "hi", bin_width=100.0).collect()
    )
    assert naive == binned and naive


def test_star_join_broadcasts_dims(spark, sf_dir):
    """q60's six-way star join must broadcast the dimension sides and
    never fall back to a cartesian/BNL product."""
    plan = registry.queries()["q60_regional_revenue"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_never_forces_corpus_broadcast(spark, sf_dir):
    """q61 must not hint-broadcast the O(corpus) sides relation. The
    production path eagerly checkpoints (its plan is just a scan of the
    result blocks), so the assertion runs on the PRE-checkpoint lazy
    join via materialize=False. With the auto-broadcast threshold
    disabled, only an explicit hint could still force a
    BroadcastExchange — so the lazy plan must contain none."""
    from pyspark.sql import functions as F

    from unimib_simpss_spark.catalog import load_table
    from unimib_simpss_spark.operators.caching import release_result
    from unimib_simpss_spark.operators.dedup import incremental_dedup_pairs

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    pairs = None
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        docs = load_table(spark, sf_dir, "documents")
        lazy, pairs = incremental_dedup_pairs(
            docs, is_new=(F.col("doc_id") % 5 == 0), threshold=0.8,
            materialize=False,
        )
        plan = lazy._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        # Not vacuous: the lazy plan must expose the real join strategy
        # (shuffle join with broadcast disabled), not a checkpoint scan.
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        if pairs is not None:
            release_result(pairs)
        if prev is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_gapfill_spine_is_broadcast(spark, sf_dir):
    """q55's generated time spine must broadcast against the rollup —
    the spine is O(keys x buckets), never worth a shuffle."""
    plan = registry.queries()["q55_gapfill_rollup"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_gapfill_interp_hand_computed(spark):
    """interp_value: the straight line between surrounding non-null
    buckets; observed buckets pass through exactly; NULL outside the
    observed span (the line has no anchor there, unlike LOCF's step)."""
    from unimib_simpss_spark.plans.timeseries import gapfill_rollup

    rows = [
        ("k", "2024-01-01 01:00:00", 10.0),
        ("k", "2024-01-01 04:00:00", 40.0),  # 3h gap: 2h, 3h interpolate
        ("k", "2024-01-01 05:00:00", 0.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        r["bucket"].hour: (r["interp_value"], r["locf_value"])
        for r in gapfill_rollup(
            df, "g", "ts", "v",
            "2024-01-01 00:00:00", "2024-01-01 06:00:00",
        ).collect()
    }
    assert out[0] == (None, None)          # before first point
    assert out[1] == (10.0, 10.0)          # observed passes through
    assert out[2] == (20.0, 10.0)          # 1/3 of the way 10→40
    assert out[3] == (30.0, 10.0)          # 2/3 of the way
    assert out[4] == (40.0, 40.0)
    assert out[5] == (0.0, 0.0)
    assert out[6] == (None, 0.0)           # after last: LOCF holds, line NULL


def test_gapfill_single_sort_plan_shape(spark, sf_dir):
    """The LOCF + both interpolation anchors must ride ONE sort on
    (key, bucket) — the forward frame only flips the bounds, so the
    interp column may not add an exchange or a second sort."""
    import re

    plan = registry.queries()["q55_gapfill_rollup"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bSort\b", plan)) == 1, plan


def test_q64_no_string_shuffle_plan_shape(spark, sf_dir):
    """The bigram LM plan must never shuffle token strings: every
    exchange after the mine carries the 8-byte xxhash64 bigram key (or
    the doc id), and the persisted per-doc relation keeps the mine from
    running twice. Regression guard for the round-6 rewrite."""
    from unimib_simpss_spark.operators.curation import bigram_lm_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = bigram_lm_scores(docs, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    for line in plan.splitlines():
        if "hashpartitioning" in line:
            assert "w1" not in line and "w2" not in line, line
    # exactly one cached relation feeds both the LM build and scoring
    assert plan.count("InMemoryTableScan") >= 2


def test_q66_topk_never_full_sorts_vocab(spark, sf_dir):
    """vocab_coverage's global top-k must be TakeOrderedAndProject
    (per-partition heaps), not a global Sort of the vocabulary."""
    from unimib_simpss_spark.catalog import load_table
    from unimib_simpss_spark.operators.curation import vocab_coverage

    df = vocab_coverage(load_table(spark, sf_dir, "documents"), topk=50)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_source_cap_single_exchange(spark, sf_dir):
    """source_cap (q30's 'cap' leg) is one hash exchange on the group
    key + window."""
    from unimib_simpss_spark.catalog import load_table
    from unimib_simpss_spark.operators.curation import source_cap

    df = source_cap(load_table(spark, sf_dir, "documents"), quota=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_bm25_plan_shape_no_corpus_reshuffle(spark, sf_dir):
    """The BM25 leg must never re-shuffle the corpus-sized postings
    relation past the query-term filter:

    - exactly ONE Window in the whole plan (the final top-k rank) — dl
      is a combinable groupBy, not a window over the full postings
      relation (a window there forces a second full Exchange of the
      corpus that the query-term filter cannot push below);
    - in the AQE FINAL plan, every join the postings feed is a
      broadcast join at this scale — no shuffle join ever re-exchanges
      the unfiltered tf relation into the scoring aggregate;
    - the scoring agg keeps a map-side partial, and top-k is
      rank-limited before the final window, not a full sort."""
    from pyspark.sql import functions as F

    from unimib_simpss_spark.operators.curation import bm25_decontam_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = bm25_decontam_topk(
        docs, is_benchmark=(F.col("doc_id") % 97 == 0), materialize=False
    )
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("Window [") == 1, opt
    df.collect()  # resolve AQE so the final (runtime) join picks show
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats cross
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # the postings×query fan-out must be collapsed by a map-side
    # partial BEFORE the scoring exchange: tf is doc_id-clustered, so
    # every (bench_id, doc_id) group is partition-local and the
    # partial reduces fan-out rows to group count (only the agg
    # output, never the unfiltered postings, re-shuffles)
    assert "partial_sum" in plan
    # the corpus postings relation is exchanged exactly once — the
    # pre-explode doc_id repartition; no postings-sized window/join
    # exchange survives (dl is a groupBy joined after the term filter)
    assert not re.search(r"Exchange hashpartitioning\(doc_id#\d+L?, is_bench", plan)
    # top-k is rank-limited before the final window, not a full sort
    assert "WindowGroupLimit" in plan
    spark.catalog.clearCache()  # materialize=False left tf to us


def test_q30_pps_leg_scan_prunes_text(spark, sf_dir):
    """The 'pps' (and 'alpha') legs must read only the columns they
    use — at least one of q30's parquet scans omits the text column
    entirely while carrying n_chars (the PPS weight)."""
    df = registry.queries()["q30_corpus_mix"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
    assert any("n_chars" in s and "text" not in s for s in schemas), schemas


def test_hist_quantile_plan_broadcasts_stats(spark, sf_dir):
    """hist_quantile's two stats joins are broadcasts of the
    groups-sized relation (never a shuffle join against the rows), the
    bin count keeps its map-side partial, and no sort-merge join
    appears anywhere."""
    from unimib_simpss_spark.functions.sketches import hist_quantile

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = hist_quantile(
        l, ["l_returnflag"], "l_extendedprice", {"p50": 0.5, "p90": 0.9}
    )
    df.collect()  # resolve AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan[:1500]
    assert "partial_count" in plan
    assert "SortMergeJoin" not in plan


def test_q66_cms_grid_reuses_count_exchange(spark, sf_dir):
    """The CMS grid is built FROM the vocabulary count relation: the
    count shuffle must be computed once and re-served (ReusedExchange),
    not re-aggregated from a second corpus scan."""
    df = registry.queries()["q66_vocab_coverage"](spark, sf_dir)
    df.collect()  # resolve AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan[:1500]


def test_key_skew_profile_values_and_nulls(spark):
    """Constructed skew: key 'a' holds 60 of 100 rows (skew_factor =
    60/mean), NULL keys surface as the 'NULL' key, ties break key-asc."""
    from unimib_simpss_spark.operators.skew import key_skew_profile

    rows = (
        [("a",)] * 60 + [("b",)] * 20 + [("c",)] * 10 + [(None,)] * 10
    )
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", top_n=3).collect()
    hot = {r.rank: (r.key, r.cnt, r.share) for r in out if r.section == "hot"}
    assert hot[1] == ("a", 60, 0.6)
    assert hot[2] == ("b", 20, 0.2)
    # c and NULL tie at 10 — 'NULL' < 'c' lexicographically
    assert hot[3] == ("NULL", 10, 0.1)
    s = next(r for r in out if r.section == "summary")
    assert (s.n_rows, s.n_keys) == (100, 4)
    assert s.skew_factor == 2.4  # 60 / (100/4)


def test_skew_profile_plan_shape(spark, sf_dir):
    """VERDICT r9 #6/#8 — the profiler's scale contract, as a plan
    assertion: the full relation is exchanged exactly ONCE (the
    combinable key-groupBy, with a map-side partial that collapses the
    hot key before the shuffle), every other consumer REUSES that
    exchange, and there is NO window operator at all — the hot-row rank
    is a broadcast self-join over the limited top-N, so the old
    partition-less WindowExec (and its scary 'moving all data to a
    single partition' warning) cannot reappear."""
    from unimib_simpss_spark.operators.skew import key_skew_profile

    prof = key_skew_profile(
        spark.read.parquet(f"{sf_dir}/orders.parquet"), "o_custkey", top_n=10
    )
    prof.collect()  # resolve AQE
    final = (
        prof._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert len(re.findall(r"\+- Exchange hashpartitioning", final)) == 1, final
    assert final.count("ReusedExchange") >= 2, final
    assert "partial_count" in final, final
    assert "Window [" not in final, final


def test_bpe_source_leg_repartition_survives_aqe(spark, sf_dir):
    """VERDICT r9 #6 — q27's bpe_source leg pins repartition(N, col)
    so the compute-bound encode chain runs wide. A bare
    repartition(col) is origin REPARTITION_BY_COL, which AQE's
    byte-based coalescing collapses to ~1 task on this small-bytes/
    high-cpu relation (measured 1 task / 4.1 s); the pinned count is
    origin REPARTITION_BY_NUM, which AQE must preserve. Guard both the
    origin tag and the runtime partition count."""
    df = registry.queries()["q27_text_profile"](spark, sf_dir)
    df.collect()  # resolve AQE
    final = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "REPARTITION_BY_NUM" in final, final
    # the pinned exchange must not be wrapped in a coalesced read
    m = re.search(
        r"(AQEShuffleRead coalesced\s*\n[^\n]*\n?[^\n]*REPARTITION_BY_NUM)", final
    )
    assert m is None, m.group(0) if m else None


def test_bloom_pruned_semi_join_exact_and_pruning(spark, sf_dir):
    """The runtime-filter rewrite returns EXACTLY the plain semi join
    (bloom FPs removed by the real join, NULL keys dropped on both
    paths), and the pruned intermediate actually shrinks the probe
    side: bloom-hit rows < all rows at a selective build filter."""
    from unimib_simpss_spark.functions.sketches import bloom_bits, bloom_probe
    from unimib_simpss_spark.operators.skew import bloom_pruned_semi_join

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_totalprice") > 450000  # highly selective build side
    )
    plain = sorted(
        r.c_custkey
        for r in c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey").collect()
    )
    pruned = sorted(
        r.c_custkey
        for r in bloom_pruned_semi_join(c, big, "c_custkey", "o_custkey")
        .select("c_custkey").collect()
    )
    assert plain == pruned
    # the map-side gate really prunes: hits ≤ a small multiple of the
    # true match count, and strictly below the full probe relation
    bits = bloom_bits(big.select("o_custkey"), "o_custkey")
    n_hits = (
        bloom_probe(bits, c, "c_custkey").where("bloom_hit = 1").count()
    )
    assert len(plain) <= n_hits < c.count()


def test_bloom_pruned_semi_join_null_probe_keys(spark):
    """NULL probe keys: dropped by the semi join AND by the bloom gate
    — both paths agree."""
    from unimib_simpss_spark.operators.skew import bloom_pruned_semi_join

    probe = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k long, v string"
    )
    build = spark.createDataFrame([(1,), (3,)], "k long")
    got = sorted(
        (r.k, r.v)
        for r in bloom_pruned_semi_join(probe, build, "k", "k").collect()
    )
    assert got == [(1, "a")]


# ---------------------------------------------------------------- sessions
class TestSessionize:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )

    def test_gap_boundary_is_microsecond_exact(self, spark):
        """delta >= gap starts a NEW session (the session_window rule);
        delta one microsecond under keeps the event — unix_timestamp's
        sub-second truncation would misplace both edge cases."""
        import datetime as dt

        from unimib_simpss_spark.operators.sessions import sessionize

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            (1, t0, 7, "a"),
            # exactly gap later -> new session
            (2, t0 + dt.timedelta(seconds=100), 7, "a"),
            # gap minus 1 us later -> SAME session
            (3, t0 + dt.timedelta(seconds=199, microseconds=999_999), 7, "a"),
        ]
        got = {
            r.event_id: r.session_seq
            for r in sessionize(self._ev(spark, rows), gap_seconds=100).collect()
        }
        assert got == {1: 1, 2: 2, 3: 2}

    def test_ties_and_null_ts(self, spark):
        """Same-timestamp events order by event_id (deterministic, no
        spurious boundary); NULL-ts rows are excluded."""
        import datetime as dt

        from unimib_simpss_spark.operators.sessions import sessionize

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (2, t0, 7, "a"),
            (1, t0, 7, "a"),
            (3, None, 7, "a"),
            (4, t0 + dt.timedelta(seconds=5), 8, "b"),
        ]
        out = sessionize(self._ev(spark, rows), gap_seconds=100).collect()
        assert {r.event_id: r.session_seq for r in out} == {1: 1, 2: 1, 4: 1}

    def test_session_stats_no_second_exchange(self, spark, sf_dir):
        """The per-session aggregate groups on (user, session_seq) but
        must reuse the window's user-key exchange:
        HashPartitioning(user) satisfies the wider clustering, so the
        whole plan holds exactly ONE hash exchange."""
        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators.sessions import session_stats

        df = session_stats(load_table(spark, sf_dir, "events"), 28_800)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]

    def test_native_session_window_parity(self, spark, sf_dir):
        """Spark's built-in session_window aggregation (the
        streaming-legal form) must agree with the explicit
        lag+running-sum form row-for-row at the same gap — both
        implement 'new session at delta >= gap'."""
        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators.sessions import (
            session_stats,
            session_stats_native,
        )

        e = load_table(spark, sf_dir, "events")
        a = sorted(map(tuple, session_stats(e, 28_800).collect()))
        b = sorted(map(tuple, session_stats_native(e, 28_800).collect()))
        assert a == b
        assert len(a) > 100

    def test_bad_gap_raises(self, spark):
        import pytest as _pytest

        from unimib_simpss_spark.operators.sessions import sessionize

        with _pytest.raises(ValueError, match="gap_seconds"):
            sessionize(self._ev(spark, []), gap_seconds=0)


class TestFunnel:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )

    def test_strictly_after_chaining(self, spark):
        """A step-2 event BEFORE (or exactly AT) the step-1 completion
        does not count; the first qualifying one after it does."""
        import datetime as dt

        from unimib_simpss_spark.operators.sessions import (
            funnel_first_completion,
        )

        t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
        rows = [
            # user 1: click before view, then view, then click -> completes
            (1, t(0), 1, "click"),
            (2, t(10), 1, "view"),
            (3, t(10), 1, "click"),   # same ts as view: does NOT count
            (4, t(20), 1, "click"),   # first strictly-after -> t2
            # user 2: view only
            (5, t(0), 2, "view"),
            # user 3: never views -> no row
            (6, t(0), 3, "click"),
        ]
        got = {
            r.user_id: (r.steps_completed, r.t1, r.t2)
            for r in funnel_first_completion(
                self._ev(spark, rows), ["view", "click"]
            ).collect()
        }
        assert set(got) == {1, 2}
        assert got[1] == (2, t(10), t(20))
        assert got[2] == (1, t(0), None)

    def test_matches_sql_twin(self, spark, sf_dir):
        """Spark funnel vs the DuckDB chained-CTE twin on the fixture."""
        import duckdb

        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators.sessions import (
            funnel_first_completion,
            funnel_sql,
        )

        steps = ["view", "click", "purchase"]
        got = sorted(
            map(tuple, funnel_first_completion(
                load_table(spark, sf_dir, "events"), steps
            ).collect())
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = sorted(map(tuple, con.sql(funnel_sql(steps)).fetchall()))
        assert got == want
        assert len(got) > 10  # sf0.001 has ~15 users with a 'view'

    def test_bad_steps_raise(self, spark):
        import pytest as _pytest

        from unimib_simpss_spark.operators.sessions import (
            funnel_first_completion,
        )

        e = self._ev(spark, [])
        with _pytest.raises(ValueError, match="at least one step"):
            funnel_first_completion(e, [])
        with _pytest.raises(ValueError, match="distinct"):
            funnel_first_completion(e, ["a", "a"])

    def test_one_exchange_no_joins(self, spark, sf_dir):
        """The window-stack shape (optimization r18): a depth-4 funnel
        plans ONE exchange, ONE scan, and ZERO joins. The join-chain
        form it replaced re-referenced its own accumulating output per
        step, doubling the planned subtree each step (2^k scans at
        depth k) and shuffling once per step."""
        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators.sessions import (
            funnel_first_completion,
        )

        fun = funnel_first_completion(
            load_table(spark, sf_dir, "events"),
            ["signup", "view", "click", "purchase"],
        )
        plan = fun._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "Join" not in plan, plan
        assert plan.count("Scan parquet") == 1, plan


class TestAcfByKey:
    def test_alternating_and_constant_series(self, spark):
        """Alternating values: lag-1 ACF = -1, lag-2 ACF = +1 exactly;
        a constant series has no defined correlation -> NULL."""
        import datetime as dt

        from unimib_simpss_spark.operators.timeseries import acf_by_key

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, t0 + dt.timedelta(seconds=i), 1, float(i % 2))
            for i in range(10)
        ] + [
            (100 + i, t0 + dt.timedelta(seconds=i), 2, 5.0)
            for i in range(6)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        got = {
            (r.user_id, r.lag): (r.n_pairs, r.acf)
            for r in acf_by_key(df, lags=(1, 2)).collect()
        }
        assert got[(1, 1)] == (9, -1.0)
        assert got[(1, 2)] == (8, 1.0)
        assert got[(2, 1)] == (5, None)
        assert got[(2, 2)] == (4, None)

    def test_single_exchange_plan(self, spark, sf_dir):
        """All lag columns in one window pass; the per-key aggregate
        reuses the window's clustering — exactly one hash exchange."""
        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators.timeseries import acf_by_key

        df = acf_by_key(load_table(spark, sf_dir, "events"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]

    def test_matches_sql_twin(self, spark, sf_dir):
        import duckdb

        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators.timeseries import (
            acf_by_key,
            acf_sql,
        )

        got = sorted(
            map(tuple, acf_by_key(
                load_table(spark, sf_dir, "events")
            ).collect())
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = sorted(map(tuple, con.sql(acf_sql()).fetchall()))
        assert got == want and len(got) > 30

    def test_bad_lags_raise(self, spark):
        import pytest as _pytest

        from unimib_simpss_spark.operators.timeseries import acf_by_key

        df = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, value double"
        )
        with _pytest.raises(ValueError, match="lags"):
            acf_by_key(df, lags=())
        with _pytest.raises(ValueError, match="lags"):
            acf_by_key(df, lags=(0,))


class TestTimeWeightedAvg:
    def test_hold_semantics_hand_computed(self, spark):
        """59 minutes of 100 and 1 minute of 0 must average ~98.33
        (sample-and-hold), not 50 (plain avg) — the reason the
        operator exists. Prefix before the first reading is excluded:
        a window whose first reading is at minute 30 weighs only the
        last 30 minutes."""
        import datetime as dt

        from unimib_simpss_spark.operators.timeseries import (
            time_weighted_avg,
        )

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            # window [00:00, 01:00): v=100 holds 59 min, v=0 holds 1 min
            (1, t0, 7, 100.0),
            (2, t0 + dt.timedelta(minutes=59), 7, 0.0),
            # window [01:00, 02:00): first reading at 01:30 -> only the
            # last 30 min count; 20 min of 10, 10 min of 40 -> 20.0
            (3, t0 + dt.timedelta(minutes=90), 7, 10.0),
            (4, t0 + dt.timedelta(minutes=110), 7, 40.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        got = {
            r.window_start: (r.n_readings, r.twa)
            for r in time_weighted_avg(df).collect()
        }
        assert got[t0] == (2, round(100 * 59 / 60, 6))
        assert got[t0 + dt.timedelta(hours=1)] == (2, 20.0)

    def test_windows_are_independent_no_cross_hold(self, spark):
        """A reading near a window's end holds to the WINDOW end only —
        the next window (with no readings) emits nothing, and a later
        window restarts from its own first reading."""
        import datetime as dt

        from unimib_simpss_spark.operators.timeseries import (
            time_weighted_avg,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0 + dt.timedelta(minutes=55), 7, 100.0),
            (2, t0 + dt.timedelta(hours=2, minutes=10), 7, 4.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        got = {
            r.window_start: r.twa for r in time_weighted_avg(df).collect()
        }
        assert got == {t0: 100.0, t0 + dt.timedelta(hours=2): 4.0}

    def test_single_exchange_and_sql_twin(self, spark, sf_dir):
        import duckdb

        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators.timeseries import (
            time_weighted_avg,
            time_weighted_avg_sql,
        )

        df = time_weighted_avg(load_table(spark, sf_dir, "events"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
        got = sorted(map(tuple, df.collect()))
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = sorted(
            map(tuple, con.sql(time_weighted_avg_sql()).fetchall())
        )
        assert got == want and len(got) > 100

    def test_bad_window_raises(self, spark):
        import pytest as _pytest

        from unimib_simpss_spark.operators.timeseries import (
            time_weighted_avg,
        )

        df = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, value double"
        )
        with _pytest.raises(ValueError, match="window_seconds"):
            time_weighted_avg(df, window_seconds=0)


class TestLinearTrend:
    def test_perfect_line_recovered_exactly(self, spark):
        """v = 3 + 2·t (t in seconds from the origin): slope 2,
        intercept 3, recovered exactly; a single-point key and a
        constant-time key yield NULL slope on both engines."""
        import datetime as dt

        import duckdb

        from unimib_simpss_spark.operators.timeseries import (
            linear_trend_by_key,
            linear_trend_sql,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, t0 + dt.timedelta(seconds=i), 7, 3.0 + 2.0 * i)
            for i in range(10)
        ] + [
            (100, t0, 8, 5.0),                       # single point
            (101, t0 + dt.timedelta(seconds=9), 9, 1.0),
            (102, t0 + dt.timedelta(seconds=9), 9, 2.0),  # same ts
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        got = {
            r.user_id: (r.n_points, r.slope, r.intercept)
            for r in linear_trend_by_key(df).collect()
        }
        assert got[7] == (10, 2.0, 3.0)
        assert got[8] == (1, None, None)
        assert got[9] == (2, None, None)  # var_samp(t) = 0
        con = duckdb.connect()
        con.sql(
            "CREATE TABLE events AS SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, TIMESTAMP '2024-01-01' + INTERVAL {s} SECOND, "
                f"{u}, {v})"
                for i, s, u, v in [
                    (i, i, 7, 3.0 + 2.0 * i) for i in range(10)
                ] + [(100, 0, 8, 5.0), (101, 9, 9, 1.0), (102, 9, 9, 2.0)]
            )
            + ") t(event_id, ts, user_id, value)"
        )
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in con.sql(linear_trend_sql()).fetchall()
        }
        assert want == got

    def test_fixture_parity(self, spark, sf_dir):
        import duckdb

        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators.timeseries import (
            linear_trend_by_key,
            linear_trend_sql,
        )

        got = sorted(map(tuple, linear_trend_by_key(
            load_table(spark, sf_dir, "events")
        ).collect()))
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = sorted(map(tuple, con.sql(linear_trend_sql()).fetchall()))
        assert got == want and len(got) > 10  # sf0.001: 15 users
