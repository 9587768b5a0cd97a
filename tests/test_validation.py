"""Declarative constraint verification (operators/validation.py) —
the Deequ-shaped audit gate. Semantics under NULLs, empties, and
violations; plan shape (one aggregate pass for all row rules; broadcast
anti-join for FKs). The oracle-paired surface is q63's 'audit' section.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unimib_simpss_spark.operators.validation import (
    audit_union,
    check_foreign_key,
    check_row_rules,
    check_unique,
)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [
            (1, "alice", 30),
            (2, "bob", -5),
            (3, None, 41),
            (3, "carol", None),  # duplicate id + NULL age
        ],
        "id long, name string, age long",
    )


def test_row_rules_single_pass_and_null_semantics(spark, people):
    out = {
        r.rule: r
        for r in check_row_rules(
            people,
            {
                "age_nonneg": F.col("age") >= 0,
                "name_not_null": F.col("name").isNotNull(),
                "id_positive": F.col("id") > 0,
            },
        ).collect()
    }
    assert set(out) == {"age_nonneg", "name_not_null", "id_positive"}
    assert all(r.n_rows == 4 for r in out.values())
    # NULL predicate result counts as a violation (un-evaluable ≠ held)
    assert out["age_nonneg"].n_violations == 2  # -5 and NULL age
    assert out["name_not_null"].n_violations == 1
    assert out["id_positive"].n_violations == 0
    assert out["id_positive"].passed == 1
    assert out["age_nonneg"].passed == 0


def test_row_rules_one_aggregate_pass(spark, people):
    """All row rules share ONE scan + ONE aggregate: the physical plan
    must contain exactly one pair of (partial, final) aggregates over
    the input — rules are columns, not passes."""
    df = check_row_rules(
        people,
        {f"r{i}": F.col("age") > i for i in range(8)},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # 8 rules → ONE input scan and ONE aggregation; rules are columns
    # of the partial aggregate, not passes over the data
    assert plan.count("Scan ExistingRDD") == 1
    assert plan.count("HashAggregate") <= 2  # partial + final
    assert df.count() == 8


def test_row_rules_empty_input_and_empty_rules(spark):
    empty = spark.createDataFrame([], "id long")
    out = check_row_rules(empty, {"id_pos": F.col("id") > 0}).collect()
    assert [(r.n_rows, r.n_violations, r.passed) for r in out] == [(0, 0, 1)]
    with pytest.raises(ValueError, match="at least one rule"):
        check_row_rules(empty, {})


def test_unique(spark, people):
    r = check_unique(people, "id_unique", ["id"]).first()
    assert (r.rule, r.n_rows, r.n_violations, r.passed) == (
        "id_unique", 4, 1, 0,
    )
    r2 = check_unique(people, "id_name_unique", ["id", "name"]).first()
    assert (r2.n_violations, r2.passed) == (0, 1)


def test_unique_null_keys_count_as_one_distinct_value(spark):
    """Pin the documented NULL semantics: all-NULL keys form ONE
    distinct value, so every NULL-keyed row past the first is a
    violation — matching the coalesce form q63's oracle uses, NOT bare
    count(DISTINCT) which would skip NULLs and report 2 here."""
    df = spark.createDataFrame(
        [(1,), (2,), (3,), (None,), (None,)], "id long"
    )
    r = check_unique(df, "id_unique", ["id"]).first()
    assert (r.n_rows, r.n_violations, r.passed) == (5, 1, 0)
    # and the exact SQL convention the docstring prescribes agrees
    import duckdb

    v = duckdb.connect().execute(
        "SELECT count(*) - count(DISTINCT coalesce(CAST(id AS VARCHAR),"
        " '__null__')) FROM (VALUES (1),(2),(3),(NULL),(NULL)) t(id)"
    ).fetchone()[0]
    assert v == r.n_violations


def test_foreign_key_null_exempt_and_broadcast(spark):
    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, dept long"
    )
    dims = spark.createDataFrame([(10,), (20,)], "dept long")
    df = check_foreign_key(facts, "dept_fk", ["dept"], dims, ["dept"])
    r = df.first()
    # 99 is an orphan; the NULL FK is exempt (SQL FK semantics)
    assert (r.rule, r.n_rows, r.n_violations, r.passed) == ("dept_fk", 4, 1, 0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_audit_union_schema_gate(spark, people):
    a = check_row_rules(people, {"id_pos": F.col("id") > 0})
    b = check_unique(people, "id_unique", ["id"])
    out = audit_union(a, b).collect()
    assert {r.rule for r in out} == {"id_pos", "id_unique"}
    with pytest.raises(ValueError, match="not an audit relation"):
        audit_union(people)
    with pytest.raises(ValueError, match="at least one"):
        audit_union()


def test_q63_audit_section_matches_handwritten_counts(spark, sf_dir):
    """The registered surface: q63's 'audit' section reports the same
    counts a direct computation gives (the DuckDB hash parity is
    covered by the oracle sweep; this pins the semantics readably)."""
    from unimib_simpss_spark.catalog import load_table
    from unimib_simpss_spark.plans.llm_curation import q63_pii_pipeline

    cust = load_table(spark, sf_dir, "customer")
    n = cust.count()
    neg = cust.where(F.col("c_acctbal") < 0).count()
    out = {
        r.rule: r
        for r in q63_pii_pipeline(spark, sf_dir)
        .where("section = 'audit'")
        .collect()
    }
    assert out["acctbal_nonnegative"].n_violations == neg
    assert out["acctbal_nonnegative"].n_rows == n
    assert out["custkey_unique"].audit_pass == 1
    assert out["nationkey_fk"].audit_pass == 1
    assert len(out) == 6


# ---------------------------------------------------- distribution drift
class TestDistributionDrift:
    def _drift(self, spark, ref_rows, cur_rows, **kw):
        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
        )

        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            [(r,) for r in rows], "x double"
        )
        return {
            (r.metric, r.bin): (r.ref_n, r.cur_n, r.value)
            for r in distribution_drift(
                mk(ref_rows), mk(cur_rows), "x", **kw
            ).collect()
        }

    def test_hand_computed_two_bins(self, spark):
        """ref 8/2 vs cur 2/8 over two bins: PSI and KS by hand.
        Smoothed p = (c+0.5)/(n+1): ref (.773, .227), cur (.227, .773);
        PSI = 2 * (.773-.227) * ln(.773/.227); KS = |0.8-0.2| = 0.6."""
        import math

        got = self._drift(
            spark,
            [0.0] * 8 + [1.0] * 2,
            [0.0] * 2 + [1.0] * 8,
            bins=2,
        )
        rp, cp = 8.5 / 11, 2.5 / 11
        psi = round(2 * (rp - cp) * math.log(rp / cp), 6)
        assert got[("psi", None)] == (10, 10, psi)
        assert got[("ks", None)] == (10, 10, 0.6)
        # JSD over the smoothed frequencies: m = (rp+cp)/2 = 0.5 in
        # both bins by symmetry
        jsd = round(
            rp * math.log(rp / 0.5) + cp * math.log(cp / 0.5), 6
        )
        assert got[("jsd", None)] == (10, 10, jsd)
        assert 0.0 < jsd < math.log(2) + 1e-12  # the ln(2) bound
        assert got[("bin", 0)] == (8, 2, None)
        assert got[("bin", 1)] == (2, 8, None)

    def test_identical_distributions_score_zero(self, spark):
        vals = [float(i % 7) for i in range(70)]
        got = self._drift(spark, vals, vals, bins=5)
        assert got[("psi", None)][2] == 0.0
        assert got[("ks", None)][2] == 0.0
        assert got[("jsd", None)][2] == 0.0

    def test_nulls_excluded_and_outliers_clamp(self, spark):
        """NULL values drop; current values outside the reference
        range land in the edge bins instead of vanishing."""
        got = self._drift(
            spark,
            [0.0, 1.0, 2.0, 3.0],
            [None, -50.0, 99.0],
            bins=4,
        )
        assert got[("psi", None)][:2] == (4, 2)
        assert got[("bin", 0)] == (1, 1, None)   # -50 clamps low
        assert got[("bin", 3)] == (1, 1, None)   # 99 clamps high
        assert got[("bin", 1)][1] == 0 and got[("bin", 2)][1] == 0

    def test_constant_reference_degenerates_to_one_bin(self, spark):
        got = self._drift(spark, [5.0, 5.0], [5.0, 6.0], bins=3)
        assert got[("bin", 0)] == (2, 2, None)
        assert got[("ks", None)][2] == 0.0

    def test_bad_bins_raise(self, spark):
        import pytest as _pytest

        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
            drift_sql,
        )

        df = spark.createDataFrame([(1.0,)], "x double")
        with _pytest.raises(ValueError, match="bins"):
            distribution_drift(df, df, "x", bins=1)
        with _pytest.raises(ValueError, match="bins"):
            drift_sql("SELECT 1", "SELECT 1", "x", bins=0)

    def test_matches_duckdb_twin_on_fixture(self, spark, sf_dir):
        import duckdb

        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
            drift_sql,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = distribution_drift(
            docs.where("doc_id % 2 = 0").select(
                F.length("text").alias("chars")
            ),
            docs.where("doc_id % 2 = 1").select(
                F.length("text").alias("chars")
            ),
            "chars",
            bins=8,
        )
        got = sorted(
            (r.metric, r.bin, r.ref_n, r.cur_n, r.value)
            for r in out.collect()
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(map(tuple, con.sql(drift_sql(
            "SELECT text FROM documents WHERE doc_id % 2 = 0",
            "SELECT text FROM documents WHERE doc_id % 2 = 1",
            "length(text)",
            bins=8,
        )).fetchall()))
        assert got == want


class TestPinnedRangeDrift:
    """The 100 TB release-over-release mode: the prior release's
    published stats/counts replace every reference pass."""

    def _fixture(self, spark, tmp_path):
        ref = spark.createDataFrame(
            [(float(i % 9),) for i in range(90)], "x double"
        )
        cur = spark.createDataFrame(
            [(float(i % 9) + 2,) for i in range(60)], "x double"
        )
        rp, cp = f"{tmp_path}/ref.parquet", f"{tmp_path}/cur.parquet"
        ref.write.parquet(rp)
        cur.write.parquet(cp)
        return spark.read.parquet(rp), spark.read.parquet(cp)

    def test_pinned_stats_equal_computed_rows(self, spark, tmp_path):
        from unimib_simpss_spark.operators.validation import (
            binned_counts,
            distribution_drift,
        )

        ref, cur = self._fixture(spark, tmp_path)
        full = sorted(
            map(tuple, distribution_drift(ref, cur, "x", bins=6).collect())
        )
        stats = spark.createDataFrame([(0.0, 8.0)], "lo double, hi double")
        pinned_stats = sorted(
            map(
                tuple,
                distribution_drift(
                    ref, cur, "x", bins=6, ref_stats=stats
                ).collect(),
            )
        )
        assert pinned_stats == full
        counts = binned_counts(
            ref.select(F.col("x").alias("_v")),
            "_v",
            stats.select(
                F.col("lo").alias("_lo"), F.col("hi").alias("_hi")
            ),
            6,
        )
        fully_pinned = distribution_drift(
            None, cur, "x", bins=6, ref_stats=stats, ref_counts=counts
        )
        assert sorted(map(tuple, fully_pinned.collect())) == full

    def test_fully_pinned_mode_is_reference_scan_free(self, spark, tmp_path):
        """With stats AND counts pinned, the plan must read ONLY the
        current snapshot — the judge-prescribed proof that a 100 TB
        gate pays no reference pass."""
        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
        )

        ref, cur = self._fixture(spark, tmp_path)
        stats = spark.createDataFrame([(0.0, 8.0)], "lo double, hi double")
        counts = spark.createDataFrame(
            [(i, 15) for i in range(6)], "bin long, n long"
        )
        out = distribution_drift(
            None, cur, "x", bins=6, ref_stats=stats, ref_counts=counts
        )
        files = {f for f in out.inputFiles()}
        assert files and all("cur.parquet" in f for f in files), files

    def test_pinned_by_matches_computed(self, spark):
        from unimib_simpss_spark.operators.validation import (
            distribution_drift_by,
        )

        ref = spark.createDataFrame(
            [("a", float(i % 5)) for i in range(40)]
            + [("b", float(i % 11)) for i in range(33)],
            "g string, x double",
        )
        cur = spark.createDataFrame(
            [("a", float(i % 5) + 1) for i in range(20)]
            + [("b", float(i % 11)) for i in range(33)],
            "g string, x double",
        )
        full = sorted(
            map(
                tuple,
                distribution_drift_by(ref, cur, "x", "g", bins=4).collect(),
            )
        )
        stats = spark.createDataFrame(
            [("a", 0.0, 4.0), ("b", 0.0, 10.0)],
            "g string, lo double, hi double",
        )
        pinned = sorted(
            map(
                tuple,
                distribution_drift_by(
                    ref, cur, "x", "g", bins=4, ref_stats=stats
                ).collect(),
            )
        )
        assert pinned == full

    def test_fully_pinned_by_is_reference_scan_free(self, spark, tmp_path):
        from unimib_simpss_spark.operators.validation import (
            distribution_drift_by,
        )

        ref = spark.createDataFrame(
            [("a", float(i % 5)) for i in range(40)], "g string, x double"
        )
        cp = f"{tmp_path}/curby.parquet"
        spark.createDataFrame(
            [("a", float(i % 5) + 1) for i in range(20)], "g string, x double"
        ).write.parquet(cp)
        cur = spark.read.parquet(cp)
        full = sorted(
            map(
                tuple,
                distribution_drift_by(ref, cur, "x", "g", bins=4).collect(),
            )
        )
        stats = spark.createDataFrame(
            [("a", 0.0, 4.0)], "g string, lo double, hi double"
        )
        counts = spark.createDataFrame(
            [("a", 0, 8), ("a", 1, 8), ("a", 2, 8), ("a", 3, 16)],
            "g string, bin long, n long",
        )
        out = distribution_drift_by(
            None, cur, "x", "g", bins=4, ref_stats=stats, ref_counts=counts
        )
        assert sorted(map(tuple, out.collect())) == full
        files = set(out.inputFiles())
        assert files and all("curby.parquet" in f for f in files), files

    def test_partial_pin_rejected(self, spark):
        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
            distribution_drift_by,
        )

        cur = spark.createDataFrame([(1.0,)], "x double")
        counts = spark.createDataFrame([(0, 1)], "bin long, n long")
        with pytest.raises(ValueError, match="ref_stats"):
            distribution_drift(cur, cur, "x", ref_counts=counts)
        with pytest.raises(ValueError, match="ref=None"):
            distribution_drift(None, cur, "x")
        curg = spark.createDataFrame([("a", 1.0)], "g string, x double")
        gcounts = spark.createDataFrame(
            [("a", 0, 1)], "g string, bin long, n long"
        )
        with pytest.raises(ValueError, match="ref_stats"):
            distribution_drift_by(curg, curg, "x", "g", ref_counts=gcounts)
        with pytest.raises(ValueError, match="ref=None"):
            distribution_drift_by(None, curg, "x", "g")

    def test_malformed_pins_rejected(self, spark):
        """Review r15: a multi-row ungrouped stats relation (or
        duplicate bins / duplicate groups) would silently multiply
        counts through the joins — refuse eagerly."""
        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
            distribution_drift_by,
        )

        cur = spark.createDataFrame([(1.0,)], "x double")
        two_stats = spark.createDataFrame(
            [(0.0, 5.0), (0.0, 9.0)], "lo double, hi double"
        )
        with pytest.raises(ValueError, match="exactly 1 row"):
            distribution_drift(None, cur, "x", ref_stats=two_stats,
                               ref_counts=spark.createDataFrame(
                                   [(0, 1)], "bin long, n long"))
        ok_stats = spark.createDataFrame([(0.0, 5.0)], "lo double, hi double")
        dup_counts = spark.createDataFrame(
            [(0, 1), (0, 2)], "bin long, n long"
        )
        with pytest.raises(ValueError, match="one row per bin"):
            distribution_drift(
                None, cur, "x", ref_stats=ok_stats, ref_counts=dup_counts
            )
        curg = spark.createDataFrame([("a", 1.0)], "g string, x double")
        dup_gstats = spark.createDataFrame(
            [("a", 0.0, 5.0), ("a", 0.0, 9.0)],
            "g string, lo double, hi double",
        )
        with pytest.raises(ValueError, match="duplicate group"):
            distribution_drift_by(
                curg, curg, "x", "g", ref_stats=dup_gstats
            )
        ok_gstats = spark.createDataFrame(
            [("a", 0.0, 5.0)], "g string, lo double, hi double"
        )
        dup_gcounts = spark.createDataFrame(
            [("a", 0, 1), ("a", 0, 2)], "g string, bin long, n long"
        )
        with pytest.raises(ValueError, match="\\(group, bin\\)"):
            distribution_drift_by(
                None, curg, "x", "g",
                ref_stats=ok_gstats, ref_counts=dup_gcounts,
            )
        # review r15 pass 2: counts persisted under a DIFFERENT bins
        # config would silently vanish in the allbins join
        oob_counts = spark.createDataFrame(
            [(0, 1), (9, 2)], "bin long, n long"
        )
        with pytest.raises(ValueError, match="out-of-range"):
            distribution_drift(
                None, cur, "x", bins=6,
                ref_stats=ok_stats, ref_counts=oob_counts,
            )
        # review r15 pass 2: a NULL group pin must be dropped like the
        # computed path drops NULL groups — no spurious NULL-group rows
        null_gstats = spark.createDataFrame(
            [("a", 0.0, 5.0), (None, 0.0, 5.0)],
            "g string, lo double, hi double",
        )
        groups = {
            r.g
            for r in distribution_drift_by(
                curg, curg, "x", "g", bins=2, ref_stats=null_gstats
            ).select("g").distinct().collect()
        }
        assert groups == {"a"}

    def test_empty_or_all_null_reference_raises(self, spark):
        """ADVICE r14: an undefined reference range must fail loudly,
        not clamp everything into bin 0 (engine-divergent NULL
        arithmetic)."""
        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
        )

        cur = spark.createDataFrame([(1.0,), (2.0,)], "x double")
        empty = spark.createDataFrame([], "x double")
        allnull = spark.createDataFrame([(None,), (None,)], "x double")
        for bad in (empty, allnull):
            with pytest.raises(Exception, match="no non-NULL values"):
                distribution_drift(bad, cur, "x", bins=4).collect()


class TestCategoricalDrift:
    def _drift(self, spark, ref_rows, cur_rows, **kw):
        from unimib_simpss_spark.operators.validation import (
            categorical_drift,
        )

        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            [(r,) for r in rows], "c string"
        )
        return {
            (r.metric, r.category): (r.ref_n, r.cur_n, r.value)
            for r in categorical_drift(
                mk(ref_rows), mk(cur_rows), "c", **kw
            ).collect()
        }

    def test_hand_computed_two_categories(self, spark):
        """ref 8a/2b vs cur 2a/8b, top_k=2 → buckets {a, b, __other__}
        (B=3): smoothed p = (c+0.5)/(n+1.5)."""
        import math

        got = self._drift(
            spark, ["a"] * 8 + ["b"] * 2, ["a"] * 2 + ["b"] * 8, top_k=2
        )
        pa_r, pa_c = 8.5 / 11.5, 2.5 / 11.5
        po = 0.5 / 11.5
        psi = round(
            2 * (pa_r - pa_c) * math.log(pa_r / pa_c)
            + (po - po) * math.log(po / po),
            6,
        )
        assert got[("psi", None)] == (10, 10, psi)
        assert got[("cat", "a")] == (8, 2, None)
        assert got[("cat", "b")] == (2, 8, None)
        assert got[("cat", "__other__")] == (0, 0, None)

    def test_other_bucket_absorbs_tail_and_new_categories(self, spark):
        """Categories beyond top_k AND current-only categories land in
        '__other__' (the reference defines the frame)."""
        got = self._drift(
            spark,
            ["a"] * 5 + ["b"] * 3 + ["tail1", "tail2"],
            ["a"] * 2 + ["BRAND_NEW"] * 4 + ["tail1"],
            top_k=2,
        )
        assert set(c for m, c in got if m == "cat") == {"a", "b", "__other__"}
        assert got[("cat", "__other__")] == (2, 5, None)  # tails + new

    def test_identical_mix_scores_zero_and_nulls_drop(self, spark):
        vals = ["x"] * 6 + ["y"] * 4
        got = self._drift(spark, vals + [None], vals, top_k=5)
        assert got[("psi", None)] == (10, 10, 0.0)

    def test_topk_tiebreak_is_value_ordered(self, spark):
        """Equal counts must break ties by category value asc — the
        determinism the fixture's uniform sources exercise."""
        got = self._drift(
            spark, ["b", "a", "c", "d"], ["a"], top_k=2
        )
        assert set(c for m, c in got if m == "cat") == {"a", "b", "__other__"}

    def test_empty_reference_raises(self, spark):
        """Review r15: an empty/all-NULL reference must fail loudly
        (the numeric gate's contract), not report PSI = 0.0 against a
        category frame that does not exist."""
        import pytest as _pytest

        from unimib_simpss_spark.operators.validation import (
            categorical_drift,
        )

        cur = spark.createDataFrame([("a",)], "c string")
        for bad in (
            spark.createDataFrame([], "c string"),
            spark.createDataFrame([(None,)], "c string"),
        ):
            with _pytest.raises(ValueError, match="no non-NULL"):
                categorical_drift(bad, cur, "c")

    def test_reserved_bucket_raises_on_both_engines(self, spark):
        import duckdb
        import pytest as _pytest

        from unimib_simpss_spark.operators.validation import (
            categorical_drift,
            categorical_drift_sql,
        )

        ref = spark.createDataFrame([("__other__",)], "c string")
        with _pytest.raises(ValueError, match="reserves"):
            categorical_drift(ref, ref, "c")
        con = duckdb.connect()
        with _pytest.raises(Exception, match="reserves"):
            con.sql(
                categorical_drift_sql(
                    "SELECT '__other__' AS c", "SELECT 'a' AS c", "c"
                )
            ).fetchall()

    def test_bad_topk_raises(self, spark):
        import pytest as _pytest

        from unimib_simpss_spark.operators.validation import (
            categorical_drift,
            categorical_drift_sql,
        )

        df = spark.createDataFrame([("a",)], "c string")
        with _pytest.raises(ValueError, match="top_k"):
            categorical_drift(df, df, "c", top_k=0)
        with _pytest.raises(ValueError, match="top_k"):
            categorical_drift_sql("SELECT 1", "SELECT 1", "c", top_k=0)

    def test_matches_duckdb_twin_on_fixture(self, spark, sf_dir):
        import duckdb

        from unimib_simpss_spark.operators.validation import (
            categorical_drift,
            categorical_drift_sql,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = categorical_drift(
            docs.where("doc_id % 2 = 0").select("source"),
            docs.where("doc_id % 2 = 1").select("source"),
            "source",
            top_k=4,
        )
        got = sorted(
            (r.metric, r.category, r.ref_n, r.cur_n, r.value)
            for r in out.collect()
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(map(tuple, con.sql(categorical_drift_sql(
            "SELECT source FROM documents WHERE doc_id % 2 = 0",
            "SELECT source FROM documents WHERE doc_id % 2 = 1",
            "source",
            top_k=4,
        )).fetchall()))
        assert got == want


class TestDistributionDriftBy:
    def test_each_group_equals_its_own_ungrouped_run(self, spark):
        """The grouped form must be EXACTLY the per-group composition
        of the ungrouped operator (same bins, smoothing, rounding)."""
        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
            distribution_drift_by,
        )

        ref_rows = [("a", float(i)) for i in range(40)] + [
            ("b", float(i * 3)) for i in range(25)
        ]
        cur_rows = [("a", float(i) + 5) for i in range(30)] + [
            ("b", float(i * 3)) for i in range(25)
        ]
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "g string, x double"
        )
        grouped = {
            (r.g, r.metric, r.bin): (r.ref_n, r.cur_n, r.value)
            for r in distribution_drift_by(
                mk(ref_rows), mk(cur_rows), "x", "g", bins=6
            ).collect()
        }
        for g in ("a", "b"):
            solo = {
                (g, r.metric, r.bin): (r.ref_n, r.cur_n, r.value)
                for r in distribution_drift(
                    mk(ref_rows).where(F.col("g") == g),
                    mk(cur_rows).where(F.col("g") == g),
                    "x",
                    bins=6,
                ).collect()
            }
            for k, v in solo.items():
                assert grouped[k] == v, (k, grouped[k], v)
        # group b is unchanged -> zero drift; group a shifted -> nonzero
        assert grouped[("b", "psi", None)][2] == 0.0
        assert grouped[("a", "psi", None)][2] > 0.0

    def test_current_only_groups_excluded(self, spark):
        from unimib_simpss_spark.operators.validation import (
            distribution_drift_by,
        )

        ref = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0)], "g string, x double"
        )
        cur = spark.createDataFrame(
            [("a", 1.0), ("NEW", 9.0), (None, 5.0)], "g string, x double"
        )
        groups = {
            r.g
            for r in distribution_drift_by(ref, cur, "x", "g", bins=2)
            .select("g").distinct().collect()
        }
        assert groups == {"a"}


class TestQuantileDrift:
    """Equi-depth drift (quantile_drift): edges at the reference's
    q-quantiles, binning by integer edge comparisons, the shared
    metric arithmetic. The oracle-paired surface is q61's 'driftq'
    leg; here: hand-computed values, the heavy-tail motivation,
    pinning, and the loud-failure contract."""

    def _ref_cur(self, spark):
        ref = spark.createDataFrame(
            [(float(i),) for i in range(1, 101)], "x double"
        )
        cur = spark.createDataFrame(
            [(float(i),) for i in range(51, 151)], "x double"
        )
        return ref, cur

    def test_hand_computed_bins_and_metrics(self, spark):
        from unimib_simpss_spark.operators.validation import quantile_drift

        ref, cur = self._ref_cur(spark)
        rows = quantile_drift(ref, cur, "x", q=10).collect()
        by_bin = {
            r.bin: (r.ref_n, r.cur_n) for r in rows if r.metric == "bin"
        }
        # ref 1..100: each decile bin holds exactly 10 (equi-depth by
        # construction); cur 51..150: bins 5..8 hold 10, bin 9 clamps
        # the 60 values above the last edge (90)
        assert all(by_bin[b][0] == 10 for b in range(10))
        assert [by_bin[b][1] for b in range(10)] == [
            0, 0, 0, 0, 0, 10, 10, 10, 10, 60,
        ]
        m = {r.metric: r.value for r in rows if r.bin is None}
        # KS: ref CDF climbs 0.1/bin, cur is 0 through bin 4 → max gap
        # at bin 4 is exactly 0.5 (integer-ratio arithmetic)
        assert m["ks"] == 0.5
        # PSI/JSD from the same smoothed frequencies, mirrored in
        # plain Python
        rp = [(10 + 0.5) / (100 + 5.0)] * 10
        cp = [
            (c + 0.5) / (100 + 5.0)
            for c in [0, 0, 0, 0, 0, 10, 10, 10, 10, 60]
        ]
        import math

        psi = sum((c - r) * math.log(c / r) for r, c in zip(rp, cp))
        jsd = sum(
            0.5
            * (
                r * math.log(r / ((r + c) / 2))
                + c * math.log(c / ((r + c) / 2))
            )
            for r, c in zip(rp, cp)
        )
        assert m["psi"] == pytest.approx(round(psi, 6), abs=2e-6)
        assert m["jsd"] == pytest.approx(round(jsd, 6), abs=2e-6)

    def test_identical_distribution_is_zero(self, spark):
        from unimib_simpss_spark.operators.validation import quantile_drift

        ref, _ = self._ref_cur(spark)
        m = {
            r.metric: r.value
            for r in quantile_drift(ref, ref, "x", q=10).collect()
            if r.bin is None
        }
        assert m == {"psi": 0.0, "ks": 0.0, "jsd": 0.0}

    def test_heavy_tail_motivation(self, spark):
        """The reason this operator exists: one outlier stretches
        equal-width bins until PSI goes numb; decile edges keep
        reacting to the shift."""
        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
            quantile_drift,
        )

        ref = spark.createDataFrame(
            [(float(i),) for i in range(1, 100)] + [(1e6,)], "x double"
        )
        cur = spark.createDataFrame(
            [(float(i) + 30,) for i in range(1, 100)] + [(1e6,)],
            "x double",
        )
        ew = {
            r.metric: r.value
            for r in distribution_drift(ref, cur, "x", bins=10).collect()
            if r.bin is None
        }
        eq = {
            r.metric: r.value
            for r in quantile_drift(ref, cur, "x", q=10).collect()
            if r.bin is None
        }
        # equal-width: all mass lands in bin 0 both sides → numb
        assert ew["psi"] < 0.01
        # equi-depth: a +30 shift over ~100-wide deciles is loud
        assert eq["psi"] > 0.2
        assert eq["psi"] > 20 * ew["psi"]

    def test_ties_and_constant_reference_are_legal(self, spark):
        from unimib_simpss_spark.operators.validation import quantile_drift

        ref = spark.createDataFrame([(1.0,)] * 40, "x double")
        cur = spark.createDataFrame(
            [(0.5,)] * 10 + [(1.0,)] * 10 + [(2.0,)] * 10, "x double"
        )
        rows = quantile_drift(ref, cur, "x", q=4).collect()
        by_bin = {
            r.bin: (r.ref_n, r.cur_n) for r in rows if r.metric == "bin"
        }
        # all edges equal 1.0: values <= 1.0 → bin 0, values above →
        # bin q-1; middle bins legally empty, metrics finite
        assert by_bin[0] == (40, 20)
        assert by_bin[3] == (0, 10)
        m = {r.metric: r.value for r in rows if r.bin is None}
        assert all(v is not None and v == v for v in m.values())

    def test_pinned_equals_computed_and_scan_free(self, spark, tmp_path):
        from unimib_simpss_spark.operators.validation import (
            quantile_drift,
            quantile_edges,
        )

        ref, cur = self._ref_cur(spark)
        rp, cp = f"{tmp_path}/qref.parquet", f"{tmp_path}/qcur.parquet"
        ref.write.parquet(rp)
        cur.write.parquet(cp)
        ref, cur = spark.read.parquet(rp), spark.read.parquet(cp)
        full = sorted(
            map(tuple, quantile_drift(ref, cur, "x", q=10).collect())
        )
        edges = quantile_edges(ref, "x", 10)
        assert edges == [float(i * 10) for i in range(1, 10)]
        pinned_edges = sorted(
            map(
                tuple,
                quantile_drift(
                    ref, cur, "x", q=10, ref_edges=edges
                ).collect(),
            )
        )
        assert pinned_edges == full
        counts = spark.createDataFrame(
            [(i, 10) for i in range(10)], "bin long, n long"
        )
        fully = quantile_drift(
            None, cur, "x", q=10, ref_edges=edges, ref_counts=counts
        )
        assert sorted(map(tuple, fully.collect())) == full
        files = set(fully.inputFiles())
        assert files and all("qcur.parquet" in f for f in files), files

    def test_loud_failures(self, spark):
        from unimib_simpss_spark.operators.validation import quantile_drift

        ref, cur = self._ref_cur(spark)
        with pytest.raises(ValueError, match="q must be >= 2"):
            quantile_drift(ref, cur, "x", q=1)
        with pytest.raises(ValueError, match="requires ref_edges"):
            quantile_drift(
                ref,
                cur,
                "x",
                q=4,
                ref_counts=spark.createDataFrame(
                    [(0, 1)], "bin long, n long"
                ),
            )
        with pytest.raises(ValueError, match="requires BOTH"):
            quantile_drift(None, cur, "x", q=4, ref_edges=[1.0, 2.0, 3.0])
        with pytest.raises(ValueError, match="exactly q-1"):
            quantile_drift(ref, cur, "x", q=4, ref_edges=[1.0, 2.0])
        with pytest.raises(ValueError, match="finite"):
            quantile_drift(
                ref, cur, "x", q=4, ref_edges=[1.0, float("nan"), 3.0]
            )
        with pytest.raises(ValueError, match="non-decreasing"):
            quantile_drift(ref, cur, "x", q=4, ref_edges=[3.0, 2.0, 1.0])
        bad_counts = spark.createDataFrame(
            [(0, 5), (0, 7)], "bin long, n long"
        )
        with pytest.raises(ValueError, match="duplicate, NULL, or out"):
            quantile_drift(
                ref,
                cur,
                "x",
                q=4,
                ref_edges=[25.0, 50.0, 75.0],
                ref_counts=bad_counts,
            )
        # a NULL bin would silently vanish in the zero-fill join —
        # the guard must catch it (review finding, both drift forms)
        null_counts = spark.createDataFrame(
            [(None, 5), (1, 7)], "bin long, n long"
        )
        with pytest.raises(ValueError, match="duplicate, NULL, or out"):
            quantile_drift(
                ref,
                cur,
                "x",
                q=4,
                ref_edges=[25.0, 50.0, 75.0],
                ref_counts=null_counts,
            )
        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
        )

        stats = spark.createDataFrame([(0.0, 100.0)], "lo double, hi double")
        with pytest.raises(ValueError, match="duplicate, NULL, or out"):
            distribution_drift(
                ref, cur, "x", bins=4, ref_stats=stats,
                ref_counts=null_counts,
            )

    def test_empty_reference_raises_at_execution(self, spark):
        from unimib_simpss_spark.operators.validation import quantile_drift

        ref = spark.createDataFrame([(None,)], "x double")
        cur = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(Exception, match="no non-NULL values"):
            quantile_drift(ref, cur, "x", q=4).collect()

    def test_kll_edges_feed_pinned_drift(self, spark):
        """The sketch-published edges (the 100 TB path) are close in
        rank to the exact deciles and pin straight into the operator:
        identical snapshots still read PSI = 0 under ANY edge frame."""
        from unimib_simpss_spark.operators.validation import (
            quantile_drift,
            quantile_edges,
            quantile_edges_kll,
        )

        ref = spark.createDataFrame(
            [(float(i),) for i in range(1, 1001)], "x double"
        )
        exact = quantile_edges(ref, "x", 10)
        approx = quantile_edges_kll(ref, "x", 10, k=200)
        assert len(approx) == 9
        assert all(a <= b for a, b in zip(approx, approx[1:]))
        # rank error ±O(1/k): each edge within 5% of the population span
        assert all(abs(a - e) <= 50 for a, e in zip(approx, exact))
        m = {
            r.metric: r.value
            for r in quantile_drift(
                ref, ref, "x", q=10, ref_edges=approx
            ).collect()
            if r.bin is None
        }
        assert m == {"psi": 0.0, "ks": 0.0, "jsd": 0.0}
        with pytest.raises(ValueError, match="no non-NULL"):
            quantile_edges_kll(
                spark.createDataFrame([(None,)], "x double"), "x", 10
            )


class TestQuantileDriftBy:
    """Per-group equi-depth drift (quantile_drift_by) — composition
    with the ungrouped form, the per-source heavy-tail motivation,
    pinning, and the loud-failure contract. The oracle-paired surface
    is q61's 'driftqsrc' leg."""

    def _fixture(self, spark):
        ref = spark.createDataFrame(
            [("a", float(i)) for i in range(1, 101)]
            + [("b", float(i * 3)) for i in range(1, 51)],
            "g string, x double",
        )
        cur = spark.createDataFrame(
            [("a", float(i) + 20) for i in range(1, 81)]
            + [("b", float(i * 3)) for i in range(1, 51)],
            "g string, x double",
        )
        return ref, cur

    def test_per_group_equals_ungrouped_composition(self, spark):
        """Each group's rows must equal running the ungrouped operator
        on that group alone — the drift_by composition contract."""
        from unimib_simpss_spark.operators.validation import (
            quantile_drift,
            quantile_drift_by,
        )

        ref, cur = self._fixture(spark)
        by = quantile_drift_by(ref, cur, "x", "g", q=5)
        for g in ("a", "b"):
            got = sorted(
                (r.metric, r.bin, r.ref_n, r.cur_n, r.value)
                for r in by.where(F.col("g") == g).collect()
            )
            want = sorted(
                (r.metric, r.bin, r.ref_n, r.cur_n, r.value)
                for r in quantile_drift(
                    ref.where(F.col("g") == g),
                    cur.where(F.col("g") == g),
                    "x",
                    q=5,
                ).collect()
            )
            assert got == want, g

    def test_in_source_outlier_motivation(self, spark):
        """One outlier inside a source numbs that source's equal-width
        bins; its decile edges keep reacting — the reason the
        attribution needs the equi-depth form too."""
        from unimib_simpss_spark.operators.validation import (
            distribution_drift_by,
            quantile_drift_by,
        )

        ref = spark.createDataFrame(
            [("s", float(i)) for i in range(1, 100)] + [("s", 1e6)],
            "g string, x double",
        )
        cur = spark.createDataFrame(
            [("s", float(i) + 30) for i in range(1, 100)] + [("s", 1e6)],
            "g string, x double",
        )
        ew = {
            r.metric: r.value
            for r in distribution_drift_by(ref, cur, "x", "g").collect()
            if r.bin is None
        }
        eq = {
            r.metric: r.value
            for r in quantile_drift_by(ref, cur, "x", "g").collect()
            if r.bin is None
        }
        assert ew["psi"] < 0.01 and eq["psi"] > 0.2

    def test_pinned_equals_computed_and_scan_free(self, spark, tmp_path):
        from unimib_simpss_spark.operators.validation import (
            quantile_drift_by,
        )

        ref, cur = self._fixture(spark)
        rp, cp = f"{tmp_path}/qbref.parquet", f"{tmp_path}/qbcur.parquet"
        ref.write.parquet(rp)
        cur.write.parquet(cp)
        ref, cur = spark.read.parquet(rp), spark.read.parquet(cp)
        full = sorted(
            map(tuple, quantile_drift_by(ref, cur, "x", "g", q=5).collect())
        )
        edges = spark.createDataFrame(
            [("a", [20.0, 40.0, 60.0, 80.0]), ("b", [30.0, 60.0, 90.0, 120.0])],
            "g string, edges array<double>",
        )
        pinned = sorted(
            map(
                tuple,
                quantile_drift_by(
                    ref, cur, "x", "g", q=5, ref_edges=edges
                ).collect(),
            )
        )
        assert pinned == full
        counts = spark.createDataFrame(
            [("a", i, 20) for i in range(5)]
            + [("b", i, 10) for i in range(5)],
            "g string, bin long, n long",
        )
        fully = quantile_drift_by(
            None, cur, "x", "g", q=5, ref_edges=edges, ref_counts=counts
        )
        assert sorted(map(tuple, fully.collect())) == full
        files = set(fully.inputFiles())
        assert files and all("qbcur.parquet" in f for f in files), files

    def test_loud_failures(self, spark):
        from unimib_simpss_spark.operators.validation import (
            quantile_drift_by,
        )

        ref, cur = self._fixture(spark)
        bad_len = spark.createDataFrame(
            [("a", [1.0, 2.0])], "g string, edges array<double>"
        )
        with pytest.raises(ValueError, match="exactly q-1"):
            quantile_drift_by(ref, cur, "x", "g", q=5, ref_edges=bad_len)
        unsorted = spark.createDataFrame(
            [("a", [4.0, 3.0, 2.0, 1.0])], "g string, edges array<double>"
        )
        with pytest.raises(ValueError, match="non-decreasing"):
            quantile_drift_by(ref, cur, "x", "g", q=5, ref_edges=unsorted)
        dup = spark.createDataFrame(
            [("a", [1.0, 2.0, 3.0, 4.0]), ("a", [1.0, 2.0, 3.0, 4.0])],
            "g string, edges array<double>",
        )
        with pytest.raises(ValueError, match="duplicate group"):
            quantile_drift_by(ref, cur, "x", "g", q=5, ref_edges=dup)
        with pytest.raises(ValueError, match="requires BOTH"):
            quantile_drift_by(None, cur, "x", "g", q=5)

    def test_dict_pin_matches_dataframe_pin(self, spark):
        """ref_edges accepts the streaming sink's {group: [edges]}
        dict (one publisher output feeds batch and stream); results
        must match the DataFrame pin exactly."""
        from unimib_simpss_spark.operators.validation import (
            quantile_drift_by,
        )

        ref, cur = self._fixture(spark)
        edge_map = {
            "a": [20.0, 40.0, 60.0, 80.0],
            "b": [30.0, 60.0, 90.0, 120.0],
        }
        df_pin = spark.createDataFrame(
            sorted(edge_map.items()), "g string, edges array<double>"
        )
        via_df = sorted(
            map(
                tuple,
                quantile_drift_by(
                    ref, cur, "x", "g", q=5, ref_edges=df_pin
                ).collect(),
            )
        )
        via_dict = sorted(
            map(
                tuple,
                quantile_drift_by(
                    ref, cur, "x", "g", q=5, ref_edges=edge_map
                ).collect(),
            )
        )
        assert via_dict == via_df

    def test_dict_pin_survives_hostile_group_column_name(self, spark):
        """ADVICE r16: the dict-pin path used to interpolate group_col
        into a DDL schema string — a name with a space broke
        createDataFrame with a parse error unrelated to the pin. The
        StructType build must accept any column name."""
        from unimib_simpss_spark.operators.validation import (
            quantile_drift_by,
        )

        ref, cur = self._fixture(spark)
        hostile = "g col;drop"
        refh = ref.withColumnRenamed("g", hostile)
        curh = cur.withColumnRenamed("g", hostile)
        edge_map = {
            "a": [20.0, 40.0, 60.0, 80.0],
            "b": [30.0, 60.0, 90.0, 120.0],
        }
        via_hostile = sorted(
            map(
                tuple,
                quantile_drift_by(
                    refh, curh, "x", hostile, q=5, ref_edges=edge_map
                ).collect(),
            )
        )
        via_plain = sorted(
            map(
                tuple,
                quantile_drift_by(
                    ref, cur, "x", "g", q=5, ref_edges=edge_map
                ).collect(),
            )
        )
        assert via_hostile == via_plain

    def test_dict_pin_casts_groups_to_string_space(self, spark):
        """A dict pin lives in string group space (the streaming
        reader's convention) — an int-keyed corpus binned under a
        dict pin must match the same corpus pre-cast to string groups
        and pinned via DataFrame."""
        from unimib_simpss_spark.operators.validation import (
            quantile_drift_by,
        )

        ref = spark.createDataFrame(
            [(1, float(i)) for i in range(1, 41)], "g int, x double"
        )
        cur = spark.createDataFrame(
            [(1, float(i) + 5) for i in range(1, 31)], "g int, x double"
        )
        edge_map = {"1": [10.0, 20.0, 30.0]}
        via_dict = sorted(
            map(
                tuple,
                quantile_drift_by(
                    ref, cur, "x", "g", q=4, ref_edges=edge_map
                ).collect(),
            )
        )
        refs = ref.select(F.col("g").cast("string").alias("g"), "x")
        curs = cur.select(F.col("g").cast("string").alias("g"), "x")
        df_pin = spark.createDataFrame(
            [("1", [10.0, 20.0, 30.0])], "g string, edges array<double>"
        )
        via_df = sorted(
            map(
                tuple,
                quantile_drift_by(
                    refs, curs, "x", "g", q=4, ref_edges=df_pin
                ).collect(),
            )
        )
        assert via_dict == via_df

    def test_wrong_pin_shapes_fail_early_and_loud(self, spark):
        """A flat float list (quantile_drift's pin) and non-str dict
        keys are rejected with descriptive TypeErrors BEFORE any job
        runs — not an opaque AttributeError at .where/.select time."""
        from unimib_simpss_spark.operators.validation import (
            quantile_drift_by,
        )

        ref, cur = self._fixture(spark)
        with pytest.raises(TypeError, match="ungrouped"):
            quantile_drift_by(
                ref, cur, "x", "g", q=5, ref_edges=[1.0, 2.0, 3.0, 4.0]
            )
        with pytest.raises(TypeError, match="non-str keys"):
            quantile_drift_by(
                ref, cur, "x", "g", q=5,
                ref_edges={True: [1.0, 2.0, 3.0, 4.0]},
            )


class TestDriftCompositions:
    """Production patterns that are pure COMPOSITIONS of the shipped
    drift operators — pinned here so the recipes stay working (and
    documented) without dedicated operators."""

    def test_temporal_drift_is_drift_by_over_time_buckets(self, spark):
        """Day-over-day drift tracking = distribution_drift_by with
        the group column set to a time bucket: each bucket gets its
        own PSI against its reference-period twin."""
        from pyspark.sql import functions as F

        from unimib_simpss_spark.operators.validation import (
            distribution_drift_by,
        )

        mk = lambda day, vals: [  # noqa: E731
            (f"2024-01-0{day} 0{i % 9}:00:00", float(v))
            for i, v in enumerate(vals)
        ]
        ref = spark.createDataFrame(
            mk(1, range(50)) + mk(2, range(50)), "ts string, x double"
        ).select(F.to_timestamp("ts").alias("ts"), "x")
        # day 1 stable, day 2 shifted +30
        cur = spark.createDataFrame(
            mk(1, range(50)) + mk(2, [v + 30 for v in range(50)]),
            "ts string, x double",
        ).select(F.to_timestamp("ts").alias("ts"), "x")
        bucket = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
        out = {
            (r.day, r.metric): r.value
            for r in distribution_drift_by(
                ref.select("x", bucket.alias("day")),
                cur.select("x", bucket.alias("day")),
                "x",
                "day",
                bins=5,
            ).collect()
            if r.bin is None
        }
        assert out[("2024-01-01", "psi")] == 0.0
        assert out[("2024-01-02", "psi")] > 0.25

    def test_embedding_drift_via_distance_to_pinned_centroid(self, spark):
        """Embedding-space drift = quantile_drift over each vector's
        cosine distance to a PINNED anchor (the prior release's
        centroid): a rotated/shifted embedding distribution moves the
        distance distribution even when no scalar column changes.
        Pure Column HOFs — the distance projection is the same dot/
        norm arithmetic the similarity stack uses."""
        import math

        from pyspark.sql import functions as F

        from unimib_simpss_spark.operators.validation import quantile_drift

        anchor = [1.0, 0.0]
        dot = (
            F.col("v")[0] * F.lit(anchor[0]) + F.col("v")[1] * F.lit(anchor[1])
        )
        norm = F.sqrt(F.col("v")[0] ** 2 + F.col("v")[1] ** 2)
        dist = (F.lit(1.0) - dot / norm).alias("d")
        mk = lambda ang: [  # noqa: E731
            ([math.cos(ang + i * 0.001), math.sin(ang + i * 0.001)],)
            for i in range(100)
        ]
        ref = spark.createDataFrame(mk(0.1), "v array<double>").select(dist)
        same = spark.createDataFrame(mk(0.1), "v array<double>").select(dist)
        rotated = spark.createDataFrame(mk(0.9), "v array<double>").select(
            dist
        )
        psi = lambda cur: {  # noqa: E731
            r.metric: r.value
            for r in quantile_drift(ref, cur, "d", q=5).collect()
            if r.bin is None
        }["psi"]
        assert psi(same) == 0.0
        assert psi(rotated) > 1.0


class TestQuantileDriftByPinHoles:
    """Review r15 pass 2: the expression-side pin check missed NULL
    edge arrays and ±inf (silently binning a whole group into bin 0);
    the collect-and-validate path must reject both."""

    def test_null_and_inf_edges_rejected(self, spark):
        from unimib_simpss_spark.operators.validation import (
            quantile_drift_by,
        )

        ref = spark.createDataFrame(
            [("a", float(i)) for i in range(1, 21)], "g string, x double"
        )
        null_edges = spark.createDataFrame(
            [("a", None)], "g string, edges array<double>"
        )
        with pytest.raises(ValueError, match="NULL edges array"):
            quantile_drift_by(
                ref, ref, "x", "g", q=5, ref_edges=null_edges
            )
        inf_edges = spark.createDataFrame(
            [("a", [1.0, 2.0, float("inf"), 4.0])],
            "g string, edges array<double>",
        )
        with pytest.raises(ValueError, match="finite"):
            quantile_drift_by(ref, ref, "x", "g", q=5, ref_edges=inf_edges)


def test_kll_edges_by_feed_the_per_group_pins(spark):
    """The grouped sketch publisher: per-group approximate edges close
    to each group's exact deciles, accepted verbatim by the per-group
    pinned mode (identical snapshots read PSI 0 under any frame)."""
    from unimib_simpss_spark.operators.validation import (
        quantile_drift_by,
        quantile_edges,
        quantile_edges_kll_by,
    )

    ref = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 501)]
        + [("b", float(i * 10)) for i in range(1, 201)]
        + [(None, 1.0)],
        "g string, x double",
    )
    pub = quantile_edges_kll_by(ref, "x", "g", q=4)
    assert set(pub) == {"a", "b"}
    for g, span in (("a", 500), ("b", 2000)):
        exact = quantile_edges(
            ref.where(F.col("g") == g), "x", 4
        )
        assert all(
            abs(a - e) <= 0.05 * span for a, e in zip(pub[g], exact)
        ), (g, pub[g], exact)
    edges_rel = spark.createDataFrame(
        [(g, es) for g, es in pub.items()], "g string, edges array<double>"
    )
    m = {
        (r.g, r.metric): r.value
        for r in quantile_drift_by(
            ref, ref, "x", "g", q=4, ref_edges=edges_rel
        ).collect()
        if r.bin is None
    }
    assert m[("a", "psi")] == 0.0 and m[("b", "psi")] == 0.0


def test_pinned_edges_null_element_raises_value_error(spark):
    """A NULL ELEMENT inside an array<double> pin must raise the
    contractual ValueError with the group named — not float()'s bare
    TypeError (review r15 pass 3); same for the scalar dict path."""
    from unimib_simpss_spark.operators.validation import (
        quantile_drift,
        quantile_drift_by,
    )

    ref = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 21)], "g string, x double"
    )
    holey = spark.createDataFrame(
        [("a", [1.0, None, 3.0, 4.0])], "g string, edges array<double>"
    )
    with pytest.raises(ValueError, match="group 'a'.*NULL"):
        quantile_drift_by(ref, ref, "x", "g", q=5, ref_edges=holey)
    with pytest.raises(ValueError, match="NULL elements"):
        quantile_drift(
            ref.select("x"), ref.select("x"), "x", q=5,
            ref_edges=[1.0, None, 3.0, 4.0],
        )


def test_kll_edges_by_keys_match_engine_cast(spark):
    """Published dict keys must be the engine's cast-to-string form —
    the exact strings the sink's broadcast join will see — not Python
    str() of the native value (review r15 pass 3: str(True) vs
    'true' pinned groups no stream row could match)."""
    from unimib_simpss_spark.operators.validation import (
        quantile_edges_kll_by,
    )

    ref = spark.createDataFrame(
        [(True, float(i)) for i in range(1, 21)]
        + [(False, float(i * 2)) for i in range(1, 21)],
        "g boolean, x double",
    )
    pub = quantile_edges_kll_by(ref, "x", "g", q=4)
    assert set(pub) == {"true", "false"}  # engine cast, not str(True)


class TestDriftGateSuite:
    """The fused four-gate suite (drift_gate_suite) — row parity with
    the individual operators, the loud empty-reference failure, and
    the pass-count contract (the whole point of fusing: 2 reference
    traversals + 1 current traversal, vs 8 + 4 run separately)."""

    def _fixture(self, spark):
        import random

        rnd = random.Random(11)
        ref = spark.createDataFrame(
            [
                (
                    rnd.choice(["a", "b", "c", None]),
                    float(rnd.randint(0, 100))
                    if rnd.random() > 0.05
                    else None,
                )
                for _ in range(600)
            ],
            "g string, x double",
        )
        cur = spark.createDataFrame(
            [
                (
                    rnd.choice(["a", "b", "d", None]),  # d = cur-only
                    float(rnd.randint(10, 140))
                    if rnd.random() > 0.05
                    else None,
                )
                for _ in range(500)
            ],
            "g string, x double",
        )
        return ref, cur

    def test_all_four_gates_match_the_individual_operators(self, spark):
        """Bit-identical rows: NULL groups count in the corpus gates
        but not the _by gates; cur-only group 'd' is excluded; ref
        group 'c' (absent from cur) is zero-filled."""
        from unimib_simpss_spark.operators.caching import (
            release_intermediate,
        )
        from unimib_simpss_spark.operators.validation import (
            distribution_drift,
            distribution_drift_by,
            drift_gate_suite,
            quantile_drift,
            quantile_drift_by,
        )

        ref, cur = self._fixture(spark)
        s = drift_gate_suite(ref, cur, "x", "g", bins=7, q=5)
        expected = {
            "ew": distribution_drift(ref, cur, "x", bins=7),
            "q": quantile_drift(ref, cur, "x", q=5),
            "ew_by": distribution_drift_by(ref, cur, "x", "g", bins=7),
            "q_by": quantile_drift_by(ref, cur, "x", "g", q=5),
        }
        for k, ind in expected.items():
            got = sorted(map(tuple, s[k].collect()))
            want = sorted(map(tuple, ind.collect()))
            assert got == want, k
            assert s[k].columns == ind.columns, k
        for c in s["caches"]:
            release_intermediate(c)

    def test_empty_reference_raises_loudly(self, spark):
        from unimib_simpss_spark.operators.validation import (
            drift_gate_suite,
        )

        cur = spark.createDataFrame([("a", 1.0)], "g string, x double")
        empty = spark.createDataFrame([], "g string, x double")
        with pytest.raises(ValueError, match="no non-NULL values"):
            drift_gate_suite(empty, cur, "x", "g")
        all_null = spark.createDataFrame(
            [("a", None)], "g string, x double"
        )
        with pytest.raises(ValueError, match="no non-NULL values"):
            drift_gate_suite(all_null, cur, "x", "g")

    def test_snapshot_pass_counts(self, spark):
        """THE fusion contract: constructing the suite and collecting
        ALL FOUR gates traverses the reference exactly twice (one
        cube stats pass, one fused bin-count pass) and the current
        snapshot exactly once. Counted with a traced identity UDF on
        the value column (test-only; marked nondeterministic so
        Catalyst cannot duplicate or collapse it) — every lineage
        traversal pays one UDF call per row."""
        from pyspark.sql.types import DoubleType

        from unimib_simpss_spark.operators.caching import (
            release_intermediate,
        )
        from unimib_simpss_spark.operators.validation import (
            drift_gate_suite,
        )

        sc = spark.sparkContext
        acc_ref = sc.accumulator(0)
        acc_cur = sc.accumulator(0)

        def traced(acc):
            def f(v):
                acc.add(1)
                return v

            return F.udf(f, DoubleType()).asNondeterministic()

        n_ref, n_cur = 300, 200
        ref = spark.range(n_ref).select(
            (F.col("id") % 3).cast("string").alias("g"),
            traced(acc_ref)(F.col("id").cast("double")).alias("x"),
        )
        cur = spark.range(n_cur).select(
            (F.col("id") % 3).cast("string").alias("g"),
            traced(acc_cur)((F.col("id") + 5).cast("double")).alias("x"),
        )
        s = drift_gate_suite(ref, cur, "x", "g", bins=6, q=4)
        for k in ("ew", "q", "ew_by", "q_by"):
            s[k].collect()
        assert acc_ref.value == 2 * n_ref, acc_ref.value
        assert acc_cur.value == 1 * n_cur, acc_cur.value
        for c in s["caches"]:
            release_intermediate(c)

    def test_pinned_equals_computed_and_scan_free(self, spark, tmp_path):
        """The suite's published artifacts round-trip: ref_stats +
        ref_cells pinned back in (ref=None — the reference side
        cannot be scanned because it is not even passed) reproduce
        the computed gates bit-for-bit."""
        from unimib_simpss_spark.operators.caching import (
            release_intermediate,
        )
        from unimib_simpss_spark.operators.validation import (
            drift_gate_suite,
        )

        ref, cur = self._fixture(spark)
        s1 = drift_gate_suite(ref, cur, "x", "g", bins=6, q=4)
        full = {
            k: sorted(map(tuple, s1[k].collect()))
            for k in ("ew", "q", "ew_by", "q_by")
        }
        s1["ref_stats"].write.parquet(f"{tmp_path}/stats.parquet")
        s1["ref_cells"].write.parquet(f"{tmp_path}/cells.parquet")
        for c in s1["caches"]:
            release_intermediate(c)
        s2 = drift_gate_suite(
            None,
            cur,
            "x",
            "g",
            bins=6,
            q=4,
            ref_stats=spark.read.parquet(f"{tmp_path}/stats.parquet"),
            ref_cells=spark.read.parquet(f"{tmp_path}/cells.parquet"),
        )
        pinned = {
            k: sorted(map(tuple, s2[k].collect()))
            for k in ("ew", "q", "ew_by", "q_by")
        }
        assert pinned == full
        for c in s2["caches"]:
            release_intermediate(c)

    def test_pinned_mode_loud_failures(self, spark):
        from unimib_simpss_spark.operators.validation import (
            drift_gate_suite,
        )

        ref, cur = self._fixture(spark)
        with pytest.raises(ValueError, match="requires BOTH"):
            drift_gate_suite(None, cur, "x", "g")
        no_corpus = spark.createDataFrame(
            [("a", 0.0, 9.0, [3.0, 6.0, 8.0])],
            "g string, lo double, hi double, edges array<double>",
        )
        cells = spark.createDataFrame(
            [(0, None, 0, 5)], "slot int, g string, bin long, n long"
        )
        with pytest.raises(ValueError, match="NULL-group row"):
            drift_gate_suite(
                None, cur, "x", "g", q=4,
                ref_stats=no_corpus, ref_cells=cells,
            )
        dup = spark.createDataFrame(
            [
                (None, 0.0, 9.0, [3.0, 6.0, 8.0]),
                ("a", 0.0, 9.0, [3.0, 6.0, 8.0]),
                ("a", 1.0, 8.0, [3.0, 6.0, 8.0]),
            ],
            "g string, lo double, hi double, edges array<double>",
        )
        with pytest.raises(ValueError, match="duplicate"):
            drift_gate_suite(
                None, cur, "x", "g", q=4, ref_stats=dup, ref_cells=cells
            )
        bad_edges = spark.createDataFrame(
            [(None, 0.0, 9.0, [3.0, 6.0])],
            "g string, lo double, hi double, edges array<double>",
        )
        with pytest.raises(ValueError, match="q-1"):
            drift_gate_suite(
                None, cur, "x", "g", q=4,
                ref_stats=bad_edges, ref_cells=cells,
            )
        ok_stats = spark.createDataFrame(
            [(None, 0.0, 9.0, [3.0, 6.0, 8.0])],
            "g string, lo double, hi double, edges array<double>",
        )
        bad_cells = spark.createDataFrame(
            [(0, None, 99, 5)], "slot int, g string, bin long, n long"
        )
        with pytest.raises(ValueError, match="different config"):
            drift_gate_suite(
                None, cur, "x", "g", bins=6, q=4,
                ref_stats=ok_stats, ref_cells=bad_cells,
            )
