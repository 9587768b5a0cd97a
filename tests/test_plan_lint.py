"""Plan-lint tests: the 100 TB design review as CI.

Two halves: (1) constructed-bad plans must trigger the right findings;
(2) EVERY registered query's plan must pass ``assert_scale_clean`` —
no cartesian products, no row-at-a-time Python, no unbounded global
window/sort — with a per-query allowlist naming each intentional
BroadcastNestedLoopJoin (all of them broadcast-tiny stats crosses or
gated theta residuals)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unimib_simpss_spark.operators.plan_lint import (
    assert_scale_clean,
    hof_counts,
    lint_plan,
)
from unimib_simpss_spark.plans import registry


def _rules(findings, severity=None):
    return [
        f.rule
        for f in findings
        if severity is None or f.severity == severity
    ]


class TestDetectors:
    def test_cartesian_product_is_an_error(self, spark):
        a = spark.range(10)
        b = spark.range(10).withColumnRenamed("id", "id2")
        # crossJoin without broadcast at disabled-AQE thresholds plans a
        # CartesianProduct; force it by disabling auto-broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = a.crossJoin(b)
            rules = _rules(lint_plan(df), "error")
            assert "cartesian-product" in rules
            with pytest.raises(AssertionError, match="cartesian-product"):
                assert_scale_clean(df)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_row_python_udf_is_an_error(self, spark):
        from pyspark.sql.types import LongType

        plus_one = F.udf(lambda x: x + 1, LongType(), useArrow=False)
        df = spark.range(10).select(plus_one("id").alias("y"))
        assert "python-row-udf" in _rules(lint_plan(df), "error")

    def test_arrow_python_is_only_info(self, spark):
        def ident(it):
            yield from it

        df = spark.range(10).mapInPandas(ident, "id long")
        findings = lint_plan(df)
        assert "arrow-python" in _rules(findings, "info")
        assert not _rules(findings, "error")
        assert_scale_clean(df)  # info never fails the gate

    def test_global_window_is_a_warn(self, spark):
        from pyspark.sql import Window

        df = spark.range(100).withColumn(
            "rn", F.row_number().over(Window.orderBy("id"))
        )
        assert "global-window" in _rules(lint_plan(df), "warn")
        with pytest.raises(AssertionError, match="global-window"):
            assert_scale_clean(df)
        # partitioned windows pass
        ok = spark.range(100).withColumn(
            "rn", F.row_number().over(Window.partitionBy(F.col("id") % 10).orderBy("id"))
        )
        assert "global-window" not in _rules(lint_plan(ok))
        # partitioned-but-UNORDERED windows also pass: the plan printer
        # elides the empty orderSpec, so this prints the same two
        # bracket groups as a global window — the detector must read
        # the windowspecdefinition args, not count brackets
        ok2 = spark.range(100).withColumn(
            "c",
            F.count(F.lit(1)).over(Window.partitionBy(F.col("id") % 10)),
        )
        assert "global-window" not in _rules(lint_plan(ok2))
        # ...and an ordered-AND-partitioned frame still passes while a
        # frame-only global window (count over ()) is flagged
        glob = spark.range(100).withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy())
        )
        assert "global-window" in _rules(lint_plan(glob), "warn")

    def test_global_sort_warns_but_topk_fusion_passes(self, spark):
        # NB: orderBy("id") on a range would be ELIMINATED by Catalyst
        # (already ordered) — sort on a derived key instead
        df = spark.range(1000).orderBy(F.col("id") % 7)
        assert "global-sort" in _rules(lint_plan(df), "warn")
        topk = spark.range(1000).orderBy(F.col("id") % 7).limit(5)
        assert "global-sort" not in _rules(lint_plan(topk))

    def test_exchange_count_reported(self, spark):
        df = spark.range(100).groupBy((F.col("id") % 7).alias("g")).count()
        info = [f for f in lint_plan(df) if f.rule == "exchange-count"]
        assert len(info) == 1 and info[0].detail.startswith("1 ")


# Intentional BroadcastNestedLoopJoins, each a broadcast-tiny build side:
_ALLOW: dict[str, set] = {
    "q30_corpus_mix": {"bnl-join"},        # 1-row totals for alpha/divergence
    "q36_cosine_topk": {"bnl-join"},       # size-gated query-side broadcast
    "q37_ivf_topk": {"bnl-join"},          # mrl stage-1: size-gated 8-query
                                           # broadcast × prefix-width corpus
    "q48_binned_range_join": {"bnl-join"}, # the BNL leg IS the theta baseline
    "q49_salted_join": {"bnl-join"},       # 1-row n_rows cross in the profile
    "q55_gapfill_rollup": {"bnl-join"},    # per-key bounds grid cross
    "q63_pii_pipeline": {"bnl-join"},      # 1-row total × 1-row FK-orphan count
    "q66_vocab_coverage": {"bnl-join"},    # 1-row token-total cross
    "x41_media_pipeline": {"bnl-join"},    # cosine gate over decoded feats
    "x67_cms_heavy_hitters": {"bnl-join"}, # rank self-join over ≤k rows
    "x73_pattern_topk": {"bnl-join"},      # rank self-join over ≤k rows
}


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_registered_query_plans_are_scale_clean(spark, sf_dir, name):
    df = registry.queries()[name](spark, sf_dir)
    assert_scale_clean(df, allow=_ALLOW.get(name, set()))


# --------------------------------------- repeated-HOF-derivation ceiling
# VERDICT r16 #1/#2: a `.where` above a projection is predicate-pushed
# with its alias SUBSTITUTED, so guarding on a derived value re-derives
# its whole expression chain inside the scan filters of every branch —
# q36's sq8 leg shipped a hash-green 4× warm regression exactly this way
# (optimized plan: 18 `transform(` / 9 `aggregate(` vs 6 / 7 clean).
# These ceilings FAIL at the regressed shape and pass at the clean one,
# so the class can't hide behind correct output again.


class TestHofDerivationCeiling:
    def _quantized(self, spark, sf_dir):
        from unimib_simpss_spark.operators import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return S.quantize_vectors(
            emb.where(S.defined_vector_pred()), keep=("label",)
        )

    def test_sq8_topk_plan_derives_the_quantize_chain_once_per_branch(
        self, spark, sf_dir
    ):
        from unimib_simpss_spark.operators import similarity as S

        df = S.cosine_topk_quantized(
            self._quantized(spark, sf_dir), k=5,
            query_pred=F.col("vec_id") < 8,
        )
        counts = hof_counts(df)
        # clean shape: 6 transform / 7 aggregate (one quantize chain per
        # join branch); the r16 regression read 18 / 9
        assert counts["transform"] <= 8, counts
        assert counts["aggregate"] <= 8, counts

    def test_ivf_sq8_column_plan_derives_the_quantize_chain_once_per_branch(
        self, spark, sf_dir
    ):
        from unimib_simpss_spark.operators import similarity as S

        qz = self._quantized(spark, sf_dir).withColumn(
            "cell", F.pmod(F.col("vec_id"), F.lit(4))
        )
        counts = hof_counts(S.ivf_topk_quantized(qz, k=3, impl="column"))
        assert counts["transform"] <= 8, counts
        assert counts["aggregate"] <= 8, counts


# ------------------------------------------------ pre-checkpoint sweep
# VERDICT r10 #1: the registry sweep above lints what the registry
# RETURNS — but the dedup/ANN/capstone family returns eagerly-
# checkpointed handles, so it certifies post-checkpoint scans while the
# candidate joins, CC iterations, and GEMM stages go unchecked. This
# sweep captures a lint of every plan ENTERING the caching layer
# (lineage intact, pre-materialization) and holds it to the same
# standard, with the same named-allowlist discipline keyed by the
# operator the plan came from.

# Intentional warns in operator INTERIORS, each bounded by construction:
_INTERIOR_ALLOW: dict[str, set] = {
    # short-subset all-pairs + cross-length-band legs: inequality joins
    # over the (histogram-bounded) short-string subset only — the
    # documented exactness floor below the positional-gram filter
    "dedup.edit_distance_pairs": {"bnl-join"},
    "dedup.edit_distance_join": {"bnl-join"},  # same two legs, 2-relation
    # 1-row corpus-totals cross feeding the BM25 idf terms
    "curation.bm25_decontam_topk": {"bnl-join"},
    # hardneg leg: cap-gated anchor broadcast × corpus (the q36
    # pattern — bounded-driver contract enforces the build side)
    "llm_similarity.q46_embedding_cosine_pairs": {"bnl-join"},
    # q61's union interior: the edit legs' documented BNL floor (above)
    # seen through the union, plus the drift section's 1-row stats/
    # totals crosses and the CDF window over the bins-row relation —
    # every one bounded by construction (bins defaults to 10)
    "llm_dedup.q61_incremental_dedup": {"bnl-join", "global-window"},
    # q62's perplexity stage scores under the pinned trigram LM whose
    # 1-row (n_tokens, v_types) total rides a broadcast cross join —
    # the same bounded 1-row BNL class as bm25's corpus-totals cross;
    # the host's own bucket relation crosses the 1-row tertile-edges
    # aggregate the same way
    "curation.trigram_lm_scores": {"bnl-join"},
    "llm_dedup.q62_corpus_pipeline": {"bnl-join"},
}

# The heavy operator family the sweep must cover (checkpoint users).
_HEAVY = [
    "q33_jaccard_pairs",
    "q34_hash_band_pairs",
    "q38_decontamination",
    "q46_embedding_cosine_pairs",
    "q59_dedup_clusters",
    "q61_incremental_dedup",
    "q62_corpus_pipeline",
    "x50_ann_learned_index",
    "x66_pq_topk",
    "x75_perceptual_dedup",
    "x76_hardneg_ivf",
    "x77_pagerank",  # one checkpoint per power-iteration round
]


@pytest.mark.parametrize("name", _HEAVY)
def test_pre_checkpoint_interior_plans_are_scale_clean(spark, sf_dir, name):
    from unimib_simpss_spark.operators.caching import (
        capture_checkpoint_lints,
    )

    with capture_checkpoint_lints() as sink:
        registry.queries()[name](spark, sf_dir)
    # the heavy family must actually route through the caching layer —
    # a raw .persist() would silently drop out of this sweep
    assert sink, f"{name} never hit the checkpoint/cache layer"
    for label, findings in sink:
        allow = _INTERIOR_ALLOW.get(label, set())
        bad = [
            f
            for f in findings
            if f.severity == "error"
            or (f.severity == "warn" and f.rule not in allow)
        ]
        assert not bad, f"{name} interior plan from {label}: {bad}"
