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


@pytest.mark.parametrize(
    "qname",
    [
        "q59_dedup_clusters",
        "q62_corpus_pipeline",
        # VERDICT r11 #6: q46's pair barrier routes through
        # cache_intermediate and q61 checkpoints a four-leg union —
        # both must survive the table mode too
        "q46_embedding_cosine_pairs",
        "q61_incremental_dedup",
    ],
)
def test_table_checkpoint_mode_parity(spark, tmp_path, qname):
    """VERDICT r9 #4 / r10 #2 / r11 #6 — the 'table' checkpoint mode on
    the heavy paths at bench scale: q59's connected-components loop,
    the q62 capstone (whose shingle barrier and tokenize-once admission
    gate route through cache_intermediate), q46's pair barrier, and
    q61's four-leg union re-run with every checkpoint/cache routed
    through parquet CHECKPOINT TABLES must produce the exact local-mode
    result, leave zero live table directories after the run, and hold
    zero persisted RDD blocks while in table mode."""
    from unimib_simpss_spark.operators.caching import (
        live_checkpoint_tables,
        persistent_rdd_ids,
        set_checkpoint_mode,
        set_checkpoint_table_dir,
        sweep_checkpoint_tables,
    )

    q = registry.queries()[qname]

    def run():
        # None-safe sort: q61's drift section mixes NULLs and ints in
        # one tuple position (bin on per-bin rows, NULL on summaries)
        # and Python cannot order None < int
        return sorted(
            (tuple(r) for r in q(spark, SF_BENCH).collect()),
            key=lambda t: tuple(
                (v is None, 0 if v is None else v) for v in t
            ),
        )

    local = run()
    set_checkpoint_table_dir(str(tmp_path / "ckpt"))
    set_checkpoint_mode("table")
    before_blocks = persistent_rdd_ids(spark)
    try:
        table = run()
        assert persistent_rdd_ids(spark) - before_blocks == set()
    finally:
        set_checkpoint_mode("local")
        set_checkpoint_table_dir(None)
    assert table == local
    # operators release their own intermediates; anything left (e.g.
    # the final materialized result handle) is swept here and must be
    # small — never the per-round checkpoint chain
    leaked = live_checkpoint_tables()
    assert len(leaked) <= 1, leaked
    sweep_checkpoint_tables(spark)
    assert live_checkpoint_tables() == frozenset()
    # zero leaked ckpt-*/sess-* directories on disk after release
    import os as _os

    stray = [
        _os.path.join(dp, d)
        for dp, dns, _ in _os.walk(tmp_path / "ckpt")
        for d in dns
        if d.startswith("ckpt-")
    ]
    assert not stray, stray


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", SF_BENCH])
def test_q59_two_phase_cc_parity(spark, sf):
    """VERDICT r10 #3 — q59's cluster resolution re-run with the
    large-star/small-star algorithm must reproduce the propagation
    (oracle-green) output exactly at sf0.01 and the bench scale."""
    from unimib_simpss_spark.catalog import load_table
    from unimib_simpss_spark.operators import dedup as D
    from unimib_simpss_spark.operators.caching import release_result

    docs = load_table(spark, sf, "documents")
    outs = {}
    for alg in ("propagation", "two-phase"):
        pairs = D.jaccard_pairs(docs, threshold=0.8)
        cl = D.dedup_clusters(docs, pairs, cc_algorithm=alg)
        outs[alg] = sorted(tuple(r) for r in cl.collect())
        release_result(pairs)
        release_result(cl)
    assert outs["propagation"] == outs["two-phase"]


def _hashable(v):
    if isinstance(v, list):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    return v


@pytest.mark.parametrize(
    "name", sorted(n for n in registry.queries() if n not in registry.oracle_sql())
)
def test_rows_only_queries_are_run_deterministic(spark, sf_dir, name):
    """Rows-only entries have no oracle hash to pin them, so nothing
    else would catch run-to-run nondeterminism (the failure mode the
    KLL merge-order bug had) — run each twice and require identical
    row multisets. Runs at the conftest sf_dir (sf0.001) inside the
    opt-in sweep."""
    fn = registry.queries()[name]

    def run():
        return sorted(
            tuple(_hashable(v) for v in r) for r in fn(spark, sf_dir).collect()
        )

    assert run() == run()
