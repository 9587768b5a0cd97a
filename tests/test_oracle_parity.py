"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local emulation of the driver's correctness gate."""

from __future__ import annotations

import pytest

from unimib_simpss_spark.plans import registry
from unimib_simpss_spark.testing import compare_query, duckdb_connection

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, sf_dir, name):
    res = compare_query(spark, con, name, QUERIES[name], ORACLES[name], sf_dir)
    assert res.ok, f"{name}: rows spark={res.spark_rows} oracle={res.oracle_rows}; " + "; ".join(
        res.mismatches
    )
    assert res.spark_rows > 0, f"{name}: empty result — weak test"


def test_all_queries_have_entries():
    assert QUERIES, "no queries registered"
    for name in ORACLES:
        assert name in QUERIES
