"""Full-oracle parity at sf0.1 — ten times the driver's checking scale.

Float-determinism traps are scale-dependent (see
functions/analysis.py: exact_avg: q23/q55 were green at sf0.01 and red
at sf0.1), so this sweep exists to run the ENTIRE oracle surface at the
bench scale. It takes several minutes (the dedup/CC oracles are heavy
in DuckDB), so it is opt-in:

    SPARK_GRAFT_SCALE_PARITY=1 python -m pytest tests/test_scale_parity.py -q
"""

from __future__ import annotations

import os

import pytest

from unimib_simpss_spark.plans import registry

SF_BENCH = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_PARITY"),
    reason="slow sf0.1 sweep; set SPARK_GRAFT_SCALE_PARITY=1 to run",
)

_ORACLES = sorted(registry.oracle_sql())


@pytest.fixture(scope="module")
def duck(spark):
    from unimib_simpss_spark.testing import duckdb_connection

    return duckdb_connection(SF_BENCH)


@pytest.mark.parametrize("name", _ORACLES)
def test_scale_parity(spark, duck, name):
    from unimib_simpss_spark.testing import compare_query

    r = compare_query(
        spark, duck, name, registry.queries()[name],
        registry.oracle_sql()[name], SF_BENCH,
    )
    assert r.ok, r.mismatches[:3]
