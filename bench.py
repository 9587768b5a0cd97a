#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the ``noop`` sink — full execution, no
driver-side row transfer — so the timing measures the engine, not
py4j serialization. A warmup query first absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unimib_simpss_spark.operators.caching import release_result  # noqa: E402
from unimib_simpss_spark.plans import registry  # noqa: E402
from unimib_simpss_spark.session import get_spark  # noqa: E402

# Headline subset: one per operator family (agg, topk-join, window,
# as-of, set-ops, streaming-shaped, ingest, text, dedup incl. LSH,
# similarity incl. IVF + Arrow).
HEADLINE = [
    "q01_pricing_summary",
    "q02_latest_event_per_user",
    "q03_top_revenue_orders",
    "q08_customer_order_stats",
    "q12_rollup_cube",
    "q14_supplier_rank",
    "q16_set_ops",
    "q20_asof_click_before_purchase",
    "q23_tumbling_window",
    "q26_ingest_replay",
    "q27_text_profile",
    "q29_doc_profile",
    "q30_corpus_mix",
    "q32_sequence_packing",
    "q33_jaccard_pairs",
    "q34_hash_band_pairs",
    "q36_cosine_topk",
    "q37_ivf_topk",
    "q38_decontamination",
    "q39_media_profile",
    "q44_order_timeline",
    "q46_embedding_cosine_pairs",
    "q48_binned_range_join",
    "q49_salted_join",
    "q52_pivot_returnflag",
    "q53_stat_profile",
    "q55_gapfill_rollup",
    "q56_correlated_subquery",
    "q57_label_centroids",
    "q58_hash_split",
    "q59_dedup_clusters",
    "q60_regional_revenue",
    "q61_incremental_dedup",
    "q62_corpus_pipeline",
    # round 6 additions: privacy scrub, LM-score filter, vocab curve,
    # dup spans (the former q65 domain cap is now q30's 'cap' leg)
    "q63_pii_pipeline",
    "q64_bigram_lm_score",
    "q66_vocab_coverage",
    "q67_dup_spans",
    # round 9's additions ride existing entries: BPE encode legs on
    # q27, mixture-divergence sections on q30, the key-skew profile on
    # q49 — all inside the driver's 50-slot verification window.
]

# Per-section timing targets (VERDICT r15 #2): the multi-leg tagged-
# union hosts whose totals dominate bench noise — without per-leg
# walls every leg-cost question burns a worktree A/B. Each section is
# timed as an INDEPENDENT run building only that leg (the plan
# functions take sections=[tag]; q02 is lazy, so a section filter on
# the union prunes the other branches via constant folding). A
# section's wall therefore INCLUDES its shared deps (the cached
# shingle/chars relations), so sections sum to MORE than the host's
# single-run total — they answer "what does this leg cost alone",
# not "how does the total split".
SECTIONED: dict[str, tuple[str, list[str]]] = {
    "q02_latest_event_per_user": (
        "section",
        ["latest", "session", "funnel", "fsummary", "acf", "twa", "trend"],
    ),
    "q33_jaccard_pairs": ("family", ["jaccard", "containment"]),
    "q34_hash_band_pairs": (
        "family",
        ["minhash", "simhash", "edit", "hamming24"],
    ),
    # VERDICT r16 #2: q36's sq8 leg hid a 4× regression for lack of a
    # section wall — every leg of the quantization story gets one.
    "q36_cosine_topk": ("method", ["hof", "arrow", "quant", "sq8"]),
    # r17: q64 grew the lm3 trigram leg (its legs materialize eagerly,
    # so it needs the sections kwarg, not the filter fallback)
    "q64_bigram_lm_score": ("section", ["lm", "dsir", "lm3", "lm3t"]),
    # r18: q67 grew the duplicate-span rewrite leg (VERDICT r17 #1);
    # q62 grew the CCNet perplexity-bucketed admission stage + report
    "q67_dup_spans": ("section", ["spans", "rewrite"]),
    "q62_corpus_pipeline": ("section", ["stats", "ppl"]),
    "q38_decontamination": (
        "section",
        ["ngram", "bm25", "overlap", "rrf", "ev"],
    ),
    "q61_incremental_dedup": (
        "section",
        [
            "pairs",
            "bloom",
            "edit",
            "diff",
            "drift",
            "driftq",
            "driftsrc",
            "driftqsrc",
            "driftcat",
        ],
    ),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="simpss-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # Ambient-load annotations: single-run spikes on a co-tenanted box
    # have cost judge re-measure sessions in rounds 9 and 10 (q03 14.6 s
    # vs a 1.9 s floor; q59/q62 at 2× their floors). Recording the 1-min
    # load average around each query makes every run self-adjudicating:
    # a spike with load > ~2 is ambient, not a regression (BASELINE.md's
    # noise protocol).
    def loadavg() -> float:
        try:
            return round(os.getloadavg()[0], 2)
        except (OSError, AttributeError):  # pragma: no cover - non-POSIX
            # AttributeError: os.getloadavg doesn't exist off-POSIX
            return -1.0

    load_markers: dict[str, list[float]] = {}

    def run(name: str) -> float:
        load_before = loadavg()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        elapsed = time.perf_counter() - t0
        # Dedup/ANN queries return eagerly-checkpointed results; free
        # their blocks so a 33-query session doesn't accumulate them.
        release_result(df)
        load_markers[name] = [load_before, loadavg()]
        return elapsed

    load_start = loadavg()
    run(HEADLINE[0])  # warmup: JVM + codegen + parquet footer cache

    # Box-factor calibration (r17): floors are per-VM, and three
    # rounds running have paid adjudication time re-deriving each
    # box's factor from untouched queries. This times a FIXED
    # CPU-bound job (no I/O, no shuffle data volume, fully
    # deterministic) AFTER warmup; the ratio of two runs' calib_s
    # approximates their box-speed ratio, so cross-VM per-query
    # comparisons can be de-rated without hunting for calm controls.
    # The job is parallel, so calib_s conflates core count with
    # per-core speed (ADVICE r17): cross-VM de-rating by calib ratio is
    # valid only between runs with the same effective parallelism. The
    # metric line therefore records calib_cores (and calib_rows) next
    # to calib_s so a reader can reject an apples-to-oranges ratio.
    calib_rows = 1 << 30
    calib_cores = spark.sparkContext.defaultParallelism

    def calibrate() -> float:
        t0 = time.perf_counter()
        # xxhash64 per row: representative of real query work (hash
        # joins/groupBys), resistant to JIT auto-vectorization
        # shortcuts, and large enough (~1 s) that task-scheduling
        # overhead does not dominate the reading
        spark.range(calib_rows).selectExpr(
            "sum(xxhash64(id)) AS s"
        ).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    # the calibration must be self-adjudicating like every other
    # timing: a >window ambient wave inflates all three samples
    # together (median can't filter it), so the load markers are the
    # only way a reader can reject a hot calib_s
    _calib_load_before = loadavg()
    calib = sorted(calibrate() for _ in range(3))[1]  # median of 3
    load_markers["_calib"] = [_calib_load_before, loadavg()]
    timings = {name: round(run(name), 3) for name in HEADLINE}
    total = round(sum(timings.values()), 3)

    # Per-section walls AFTER the headline pass so they cannot warm or
    # skew it; excluded from `value` (the driver's metric) by design.
    # Kwarg support is detected by SIGNATURE, not try/except TypeError
    # — a TypeError raised INSIDE a sections-aware plan must surface,
    # not silently reroute to timing the full host (review r16 pass 1).
    import inspect

    from pyspark.sql import functions as F

    def _takes_sections(fn) -> bool:
        return "sections" in inspect.signature(fn).parameters

    def run_section(name: str, tagcol: str, tag: str) -> float:
        t0 = time.perf_counter()
        if _takes_sections(qs[name]):
            df = qs[name](spark, sf_dir, sections=[tag])
        else:
            df = qs[name](spark, sf_dir).where(F.col(tagcol) == tag)
        df.write.mode("overwrite").format("noop").save()
        elapsed = time.perf_counter() - t0
        release_result(df)
        return elapsed

    # For filter-fallback hosts, validate the configured tags against
    # the live output ONCE per host — a renamed section literal would
    # otherwise bench a constant-folded empty plan and record ~0 s as
    # the leg's floor (sections-aware hosts validate via
    # _pick_sections inside the plan).
    for name, (tagcol, tags) in SECTIONED.items():
        if _takes_sections(qs[name]):
            continue
        df = qs[name](spark, sf_dir)
        live = {r[0] for r in df.select(tagcol).distinct().collect()}
        # an eagerly-checkpointed host would otherwise leave its
        # result blocks live through the whole sections pass (lazy
        # hosts: no-op)
        release_result(df)
        missing = set(tags) - live
        if missing:
            raise ValueError(
                f"{name}: configured section(s) {sorted(missing)} not in "
                f"the live {tagcol!r} values {sorted(live)}"
            )

    sections = {
        name: {
            tag: round(run_section(name, tagcol, tag), 3) for tag in tags
        }
        for name, (tagcol, tags) in SECTIONED.items()
    }
    # The driver captures only a TAIL of stdout, so the metric line must
    # be compact and LAST (round 11's per-query load map doubled the line
    # and cut off its head — BENCH_r11 recorded parsed:null). Emit the
    # full per-query load-marker map on its own line FIRST (for human /
    # BASELINE.md adjudication), then the driver-contract JSON line with
    # only the session-level load fields.
    print(json.dumps({"query_load_1min": load_markers}))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sections": sections,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "calib_s": calib,
                "calib_cores": calib_cores,
                "calib_rows": calib_rows,
                "load_1min_start": load_start,
                "load_1min_end": loadavg(),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
