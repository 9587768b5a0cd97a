"""Checks for queries without a value-level oracle (q45) and plan-shape
assertions that the oracle harness can't see (broadcast choice,
pushdown)."""

from __future__ import annotations

from pyspark.sql import functions as F

from unimib_simpss_spark.plans import registry


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = registry.queries()["q45_approx_distinct"](spark, sf_dir).collect()
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
