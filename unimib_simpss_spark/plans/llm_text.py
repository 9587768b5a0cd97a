"""Text-analysis queries over ``documents`` (SURVEY.md §2.7 [EXT]).

Language-ID, quality scoring, token counting, rolling-hash
fingerprinting. All expressions are built-in Column functions
(whole-stage codegen, zero Python in the row path) and fully per-row —
embarrassingly parallel, no shuffle except the final aggregations, so
the plans scale linearly to 100 TB. Oracle SQL is generated from the
same constants in :mod:`unimib_simpss_spark.functions.analysis`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unimib_simpss_spark.catalog import load_table
from unimib_simpss_spark.functions import analysis as A
from unimib_simpss_spark.plans.registry import query

_ws = A.token_count_ws_sql("text")
_bpe = A.token_count_bpe_sql("text")


_pred_sql, _best_sql = A.lang_id_sql("text")

# --------------------------------------------------------- cleaning leg
# The documents fixture is clean ASCII, so the cleaning gate would be
# a no-op on it; both engines therefore DIRTY each doc with the same
# deterministic per-doc_id mutation (wrapping tags + one of four dirt
# classes: a doc_id-parameterized URL with an encoded ampersand,
# typographic unicode + a ligature, zero-width/control/fullwidth
# chars, double-encoded entities) and then clean it — the oracle
# hash-checks the CLEANED TEXT verbatim, so every strip/fold/decode
# rule is exercised end-to-end on real plumbing.
_DIRT_OPEN = '<p class="x">'
_DIRT_CLOSE = "</p>"
_DIRT_URL_PRE = " see https://ex.com/a?id="
_DIRT_URL_POST = "&amp;x=1 ok"
_DIRT_UNI = "  “drift—ahead”… ﬁn"
_DIRT_CTRL = " ​zwbell ＦＷ"
_DIRT_ENT = " &lt;b&gt; &amp;amp; co"


def _dirty_text_col():
    return F.concat(
        F.lit(_DIRT_OPEN),
        F.col("text"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(_DIRT_URL_PRE),
                F.col("doc_id").cast("string"),
                F.lit(_DIRT_URL_POST),
            ),
        )
        .when(F.col("doc_id") % 4 == 1, F.lit(_DIRT_UNI))
        .when(F.col("doc_id") % 4 == 2, F.lit(_DIRT_CTRL))
        .otherwise(F.lit(_DIRT_ENT)),
        F.lit(_DIRT_CLOSE),
    )


def _dirty_text_sql() -> str:
    from unimib_simpss_spark.functions.cleaning import _q as q

    return (
        f"({q(_DIRT_OPEN)} || text || CASE doc_id % 4"
        f" WHEN 0 THEN {q(_DIRT_URL_PRE)} || CAST(doc_id AS VARCHAR)"
        f" || {q(_DIRT_URL_POST)}"
        f" WHEN 1 THEN {q(_DIRT_UNI)}"
        f" WHEN 2 THEN {q(_DIRT_CTRL)}"
        f" ELSE {q(_DIRT_ENT)} END || {q(_DIRT_CLOSE)})"
    )


# The line-rule leg's dirt: the single-line fixture docs wrapped in
# scraped-page chrome — nav row, repeated share buttons, a separator
# row, a digits-only row, and a partial-duplicate content line.
_LINE_NAV = "Home | About | Contact"
_LINE_SHARE = "Share this:"
_LINE_SEP = "***"


def _line_dirty_col():
    return F.concat_ws(
        "\n",
        F.lit(_LINE_NAV),
        F.col("text"),
        F.lit(_LINE_SHARE),
        F.lit(_LINE_SHARE),
        F.lit(_LINE_SEP),
        F.col("doc_id").cast("string"),
        F.substring("text", 1, 25),
        F.lit(_LINE_SHARE),
    )


def _line_dirty_sql() -> str:
    from unimib_simpss_spark.functions.cleaning import _q as q

    return (
        f"concat_ws(chr(10), {q(_LINE_NAV)}, text, {q(_LINE_SHARE)}, "
        f"{q(_LINE_SHARE)}, {q(_LINE_SEP)}, CAST(doc_id AS VARCHAR), "
        f"substring(text, 1, 25), {q(_LINE_SHARE)})"
    )


def _text_profile_oracle() -> str:
    from unimib_simpss_spark.functions.analysis import exact_avg_sql
    from unimib_simpss_spark.functions.cleaning import (
        clean_document_sql,
        clean_text_sql,
        cleanliness_components_sql,
    )
    from unimib_simpss_spark.operators.curation import (
        BPE_DEMO_MERGES,
        bpe_encode_sql,
        bpe_token_count_sql,
    )

    enc = bpe_encode_sql("text", BPE_DEMO_MERGES)
    cnt = bpe_token_count_sql("text", BPE_DEMO_MERGES)
    cc = cleanliness_components_sql("dt")
    return f"""
    SELECT 'tokens' AS family, source AS key1, CAST(NULL AS VARCHAR) AS key2,
           count(*)                    AS n_docs,
           CAST(sum({_ws}) AS BIGINT)  AS sum_a,
           CAST(sum({_bpe}) AS BIGINT) AS sum_b,
           {A.exact_avg_sql("n_chars", 2)}      AS avg_chars
    FROM documents
    GROUP BY source
    UNION ALL
    SELECT 'lang' AS family, lang AS key1, {_pred_sql} AS key2,
           count(*) AS n_docs,
           CAST(sum({_best_sql}) AS BIGINT) AS sum_a,
           CAST(NULL AS BIGINT) AS sum_b,
           CAST(NULL AS DOUBLE) AS avg_chars
    FROM documents
    GROUP BY 1, 2, 3
    UNION ALL
    SELECT * FROM (
        SELECT 'top_tokens' AS family, tok AS key1,
               CAST(NULL AS VARCHAR) AS key2,
               count(*) AS n_docs,
               CAST(NULL AS BIGINT) AS sum_a,
               CAST(NULL AS BIGINT) AS sum_b,
               CAST(NULL AS DOUBLE) AS avg_chars
        FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok
            FROM documents
        )
        WHERE length(tok) >= 4
        GROUP BY tok
        ORDER BY n_docs DESC, tok
        LIMIT 20
    )
    UNION ALL
    SELECT 'bpe_docs' AS family, CAST(doc_id AS VARCHAR) AS key1,
           {enc} AS key2,
           CAST(NULL AS BIGINT) AS n_docs,
           {cnt} AS sum_a,
           CAST(NULL AS BIGINT) AS sum_b,
           CAST(NULL AS DOUBLE) AS avg_chars
    FROM documents WHERE doc_id < 40
    UNION ALL
    SELECT 'bpe_source' AS family, source AS key1,
           CAST(NULL AS VARCHAR) AS key2,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS sum_a,
           CAST(NULL AS BIGINT) AS sum_b,
           round(CAST(sum(n) AS DOUBLE) / count(*), 4) AS avg_chars
    FROM (SELECT source, {cnt} AS n FROM documents)
    GROUP BY source
    UNION ALL
    SELECT 'clean' AS family, source AS key1, CAST(NULL AS VARCHAR) AS key2,
           count(*) AS n_docs,
           CAST(sum(raw - cln) AS BIGINT) AS sum_a,
           CAST(sum(dirt_n) AS BIGINT) AS sum_b,
           {exact_avg_sql("sf", 4)} AS avg_chars
    FROM (
        SELECT source, {cc["n_chars_raw"]} AS raw, {cc["n_chars_clean"]} AS cln,
               {cc["stripped_frac"]} AS sf,
               {cc["n_urls"]} + {cc["n_tags"]} + {cc["n_control"]} AS dirt_n
        FROM (SELECT source, {_dirty_text_sql()} AS dt FROM documents)
    )
    GROUP BY source
    UNION ALL
    SELECT 'clean_docs' AS family, CAST(doc_id AS VARCHAR) AS key1,
           {clean_text_sql("dt")} AS key2,
           CAST(NULL AS BIGINT) AS n_docs,
           {cc["n_chars_clean"]} AS sum_a,
           CAST({cc["n_urls"]} + {cc["n_tags"]} + {cc["n_control"]} AS BIGINT)
               AS sum_b,
           {cc["stripped_frac"]} AS avg_chars
    FROM (SELECT doc_id, {_dirty_text_sql()} AS dt FROM documents
          WHERE doc_id < 40)
    UNION ALL
    SELECT 'lines' AS family, CAST(doc_id AS VARCHAR) AS key1,
           {clean_document_sql("lt")} AS key2,
           CAST(NULL AS BIGINT) AS n_docs,
           CAST(len(string_split({clean_document_sql("lt")}, chr(10)))
                AS BIGINT) AS sum_a,
           CAST(len(string_split(lt, chr(10))) AS BIGINT) AS sum_b,
           CAST(NULL AS DOUBLE) AS avg_chars
    FROM (SELECT doc_id, {_line_dirty_sql()} AS lt FROM documents
          WHERE doc_id < 40)
    """


@query("q27_text_profile", oracle=_text_profile_oracle())
def q27_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text profile, three tagged legs over the same table (merged
    from the former q27/q28/q54 to fit the driver's 50-query window):
    ``tokens`` = per-source token counting (whitespace + BPE-ish regex),
    ``lang`` = language-ID (char-trigram heuristic) labeled-vs-predicted
    confusion counts, ``top_tokens`` = the UDTF-shape explode → filter →
    count → global top-20 (Generate streams into a partial HashAggregate;
    the order-by-limit is TakeOrderedAndProject — per-partition heaps, no
    full sort). Per-row Column exprs + small aggs — scales.

    Round 9 adds the BPE ENCODE surface (the apply side of
    x68_bpe_merges' trained table): ``bpe_docs`` = per-doc encoded
    subword strings + token counts for a bounded sample, ``bpe_source``
    = per-source corpus token totals under the demo merge table —
    entirely JVM-side (a codegen'd chain of string replaces over
    sentinel-wrapped symbols, operators/curation.py bpe_encode_expr;
    fan-out pinned against AQE's byte-based coalescing because the
    stage is compute-bound). The Arrow-batched canonical encoder
    (bpe_encode) carries production-sized tables; this Column form IS
    the oracle surface."""
    from unimib_simpss_spark.operators.curation import (
        BPE_DEMO_MERGES,
        bpe_encode_expr,
        bpe_token_count_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "source",
            "n_chars",
            A.token_count_ws("text").alias("ws"),
            A.token_count_bpe("text").alias("bpe"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("sum_a"),
            F.sum("bpe").alias("sum_b"),
            A.exact_avg("n_chars", 2).alias("avg_chars"),
        )
        .select(
            F.lit("tokens").alias("family"),
            F.col("source").alias("key1"),
            F.lit(None).cast("string").alias("key2"),
            "n_docs",
            "sum_a",
            "sum_b",
            "avg_chars",
        )
    )
    pred, best = A.lang_id("text")
    lng = (
        docs.select("lang", pred.alias("pred_lang"), best.alias("score"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("score").alias("sum_a"))
        .select(
            F.lit("lang").alias("family"),
            F.col("lang").alias("key1"),
            F.col("pred_lang").alias("key2"),
            "n_docs",
            "sum_a",
            F.lit(None).cast("long").alias("sum_b"),
            F.lit(None).cast("double").alias("avg_chars"),
        )
    )
    top = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok")
        )
        .where(F.length("tok") >= 4)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), "tok")
        .limit(20)
        .select(
            F.lit("top_tokens").alias("family"),
            F.col("tok").alias("key1"),
            F.lit(None).cast("string").alias("key2"),
            "n_docs",
            F.lit(None).cast("long").alias("sum_a"),
            F.lit(None).cast("long").alias("sum_b"),
            F.lit(None).cast("double").alias("avg_chars"),
        )
    )
    enc = bpe_encode_expr("text", BPE_DEMO_MERGES)
    cnt = bpe_token_count_expr("text", BPE_DEMO_MERGES)
    bpe_docs = docs.where(F.col("doc_id") < 40).select(
        F.lit("bpe_docs").alias("family"),
        F.col("doc_id").cast("string").alias("key1"),
        enc.alias("key2"),
        F.lit(None).cast("long").alias("n_docs"),
        cnt.alias("sum_a"),
        F.lit(None).cast("long").alias("sum_b"),
        F.lit(None).cast("double").alias("avg_chars"),
    )
    # repartition with a pinned count: the corpus often arrives as few
    # large files, and the per-row replace chain is compute-bound — a
    # bare repartition(col) would be coalesced back to ~1 task by AQE's
    # byte-based sizing (measured 1 task / 4.1 s → 32 tasks)
    spread = docs.select("doc_id", "source", "text").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    bpe_src = (
        spread.select("source", cnt.alias("n"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("sum_bpe"))
        .select(
            F.lit("bpe_source").alias("family"),
            F.col("source").alias("key1"),
            F.lit(None).cast("string").alias("key2"),
            "n_docs",
            F.col("sum_bpe").alias("sum_a"),
            F.lit(None).cast("long").alias("sum_b"),
            F.round(
                F.col("sum_bpe").cast("double") / F.col("n_docs"), 4
            ).alias("avg_chars"),
        )
    )
    # the text-CLEANING surface (functions/cleaning.py): both engines
    # dirty each doc with the same deterministic doc_id-keyed mutation
    # (see _dirty_text_col), then 'clean' reports per-source chars
    # removed / dirt counts / mean stripped fraction and 'clean_docs'
    # hash-checks the cleaned text VERBATIM for a bounded sample —
    # per-row Column chains only, zero new shuffles beyond the agg
    from unimib_simpss_spark.functions import cleaning as CL

    dirt = docs.select("doc_id", "source", _dirty_text_col().alias("dt"))
    pc = CL.cleanliness_components(F.col("dt"))
    cln = (
        dirt.select(
            "source",
            (pc["n_chars_raw"] - pc["n_chars_clean"]).alias("removed"),
            pc["stripped_frac"].alias("sf"),
            (pc["n_urls"] + pc["n_tags"] + pc["n_control"]).alias("dirt_n"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("removed").alias("sum_a"),
            F.sum("dirt_n").alias("sum_b"),
            A.exact_avg("sf", 4).alias("avg_chars"),
        )
        .select(
            F.lit("clean").alias("family"),
            F.col("source").alias("key1"),
            F.lit(None).cast("string").alias("key2"),
            "n_docs",
            "sum_a",
            "sum_b",
            "avg_chars",
        )
    )
    clean_docs = dirt.where(F.col("doc_id") < 40).select(
        F.lit("clean_docs").alias("family"),
        F.col("doc_id").cast("string").alias("key1"),
        CL.clean_text(F.col("dt")).alias("key2"),
        F.lit(None).cast("long").alias("n_docs"),
        pc["n_chars_clean"].alias("sum_a"),
        (pc["n_urls"] + pc["n_tags"] + pc["n_control"]).alias("sum_b"),
        pc["stripped_frac"].alias("avg_chars"),
    )
    # 'lines': the LINE-level rules (filter boilerplate-shaped lines,
    # first-occurrence dedup) over scraped-page-shaped dirt — the
    # cleaned document hash-checked verbatim, plus kept/raw line counts
    ldoc = CL.clean_document(F.col("lt"))
    lines_leg = docs.where(F.col("doc_id") < 40).select(
        "doc_id", _line_dirty_col().alias("lt")
    ).select(
        F.lit("lines").alias("family"),
        F.col("doc_id").cast("string").alias("key1"),
        ldoc.alias("key2"),
        F.lit(None).cast("long").alias("n_docs"),
        F.size(F.split(ldoc, "\n")).cast("long").alias("sum_a"),
        F.size(F.split(F.col("lt"), "\n")).cast("long").alias("sum_b"),
        F.lit(None).cast("double").alias("avg_chars"),
    )
    return (
        tok.unionAll(lng)
        .unionAll(top)
        .unionAll(bpe_docs)
        .unionAll(bpe_src)
        .unionAll(cln)
        .unionAll(clean_docs)
        .unionAll(lines_leg)
    )


_qc_sql = A.quality_components_sql("text")

# Learned quality score (q29's 'cls_score' column): 32-bucket portable-
# hash logistic model TRAINED IN-ENGINE by operators/classifier.py
# logistic_train(portable=True, n_features=32, iters=8, lr=1.0) on the
# sf0.01 documents table with y = (lang = 'en'), then frozen here —
# the fixed-weight inference path is pure relational algebra, so it
# carries a DuckDB oracle (the dedup miners' shared-hash-space recipe).
_CLS_BIAS = -0.221618
_CLS_WEIGHTS = [
    -0.01254, -0.009897, -0.038937, 0.0, -0.019642, 0.0, 0.0, -0.015289,
    0.0, -0.017801, -0.007421, 0.0, -0.013065, -0.009799, -0.013908, 0.0,
    0.0, -0.018215, -0.012947, -0.007819, 0.001187, 0.0, 0.0, -0.003621,
    0.004915, -0.008539, -0.01038, 0.0, 0.0, -0.009577, -0.000241, 0.001917,
]


def _doc_profile_oracle() -> str:
    from unimib_simpss_spark.functions.text import tokens_sql
    from unimib_simpss_spark.operators.classifier import logistic_score_sql

    rc = A.repetition_components_sql("text")
    cls = logistic_score_sql(tokens_sql("text"), _CLS_WEIGHTS, _CLS_BIAS)
    return f"""
    WITH m AS (
        SELECT doc_id,
               {_qc_sql['n_tokens']}    AS n_tokens,
               {_qc_sql['stop_ratio']}  AS stop_ratio,
               {_qc_sql['punct_ratio']} AS punct_ratio,
               {_qc_sql['mean_tok_len']} AS mean_tok_len,
               {A.quality_score_sql('text')} AS quality,
               {A.rolling_fingerprint_sql('text')} AS fingerprint,
               {rc['top_token_frac']} AS top_token_frac,
               {rc['dup_2gram_frac']} AS dup_2gram_frac,
               {rc['dup_3gram_frac']} AS dup_3gram_frac,
               {cls} AS cls_score
        FROM documents
    )
    SELECT doc_id, n_tokens, stop_ratio, punct_ratio, mean_tok_len,
           quality, fingerprint, top_token_frac, dup_2gram_frac,
           dup_3gram_frac, cls_score,
           CAST(CASE WHEN top_token_frac <= {A.REPETITION_MAX_TOP_TOKEN_FRAC}
                      AND dup_2gram_frac <= {A.REPETITION_MAX_DUP_2GRAM_FRAC}
                      AND dup_3gram_frac <= {A.REPETITION_MAX_DUP_3GRAM_FRAC}
                THEN 1 ELSE 0 END AS BIGINT) AS passes
    FROM m
    """


@query("q29_doc_profile", oracle=_doc_profile_oracle())
def q29_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text profile in ONE scan and one projection: quality
    heuristics (length/stopword/punct ratios + composite score), the
    order-sensitive rolling-hash fingerprint, the Gopher-style
    repetition metrics with their corpus-calibrated pass gate (merged
    q29+q30 — every metric shares the same per-doc grain), and the
    LEARNED quality score: a frozen in-engine-trained logistic model
    scored as a pure Column fold over the same bound token array
    (operators/classifier.py logistic_score_expr — map-only inference,
    no explode/join/shuffle added to the profile scan).

    Plan shape: tokenize ONCE into a column, then an exchange barrier
    (repartition on doc_id — also spreads single-split files across the
    cluster), then one metric projection over the bound array. Without
    the barrier, each metric's nested HOF lambdas re-evaluate the raw
    tokenizer expression per invocation (lambda scoping defeats CSE —
    measured 12× slower at sf0.1)."""
    from unimib_simpss_spark.functions.text import tokens
    from unimib_simpss_spark.operators.classifier import logistic_score_expr

    docs = load_table(spark, sf_dir, "documents")
    pre = docs.select(
        "doc_id", "text", tokens("text").alias("tk")
    ).repartition("doc_id")
    qc = A.quality_components_from_tokens(F.col("tk"), F.col("text"))
    rc = A.repetition_components_from_tokens(F.col("tk"))
    m = pre.select(
        "doc_id",
        qc["n_tokens"].alias("n_tokens"),
        qc["stop_ratio"].alias("stop_ratio"),
        qc["punct_ratio"].alias("punct_ratio"),
        qc["mean_tok_len"].alias("mean_tok_len"),
        A.quality_score_from_components(qc).alias("quality"),
        A.rolling_fingerprint_from_tokens(F.col("tk")).alias("fingerprint"),
        rc["top_token_frac"].alias("top_token_frac"),
        rc["dup_2gram_frac"].alias("dup_2gram_frac"),
        rc["dup_3gram_frac"].alias("dup_3gram_frac"),
        logistic_score_expr(F.col("tk"), _CLS_WEIGHTS, _CLS_BIAS).alias(
            "cls_score"
        ),
    )
    passes = (
        (F.col("top_token_frac") <= A.REPETITION_MAX_TOP_TOKEN_FRAC)
        & (F.col("dup_2gram_frac") <= A.REPETITION_MAX_DUP_2GRAM_FRAC)
        & (F.col("dup_3gram_frac") <= A.REPETITION_MAX_DUP_3GRAM_FRAC)
    )
    return m.withColumn("passes", passes.cast("long"))


_MIX_FRACS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_MIX_DEFAULT = 0.75
_SOURCE_CAP_QUOTA = 10
_MIX_ALPHA = 0.3
_PPS_FULL_CHARS = 500  # docs at/over this length are always kept
# Epoch weights for the 'rep' up-sampling leg: exercise every branch —
# integer ≥ 2, exactly 1 (identity), fractional < 1 (the mix_keep
# degenerate), and a fractional default for unlisted sources.
_REP_WEIGHTS = {"src0": 2.5, "src1": 1.0, "src2": 0.3}
_REP_DEFAULT = 1.25


def _corpus_mix_oracle() -> str:
    from unimib_simpss_spark.operators.curation import source_divergence_sql
    from unimib_simpss_spark.operators.sampling import (
        mix_keep_sql,
        pps_keep_sql,
        replicate_copies_sql,
    )

    keep = mix_keep_sql(
        "source", "doc_id", _MIX_FRACS, default_fraction=_MIX_DEFAULT
    )
    pps = pps_keep_sql("n_chars", "doc_id", _PPS_FULL_CHARS)
    nc = replicate_copies_sql(
        "source", "doc_id", _REP_WEIGHTS, default_weight=_REP_DEFAULT
    )
    div = source_divergence_sql()
    return f"""
    WITH m AS (
        SELECT source, {keep} AS keep, {_ws} AS ws FROM documents
    )
    SELECT 'mix' AS section,
           source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep THEN ws ELSE 0 END) AS BIGINT) AS kept_tokens,
           round(sum(CASE WHEN keep THEN 1 ELSE 0 END) / count(*)::DOUBLE, 4)
               AS achieved_frac,
           CAST(NULL AS BIGINT) AS doc_id,
           CAST(NULL AS BIGINT) AS rk
    FROM m
    GROUP BY source
    UNION ALL
    SELECT 'cap' AS section,
           source,
           CAST(NULL AS BIGINT) AS n_docs,
           CAST(NULL AS BIGINT) AS n_kept,
           CAST(NULL AS BIGINT) AS kept_tokens,
           CAST(NULL AS DOUBLE) AS achieved_frac,
           doc_id,
           rk
    FROM (
        SELECT source, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS rk
        FROM documents
    ) WHERE rk <= {_SOURCE_CAP_QUOTA}
    UNION ALL
    SELECT 'alpha' AS section,
           source,
           count(*) AS n_docs,
           CAST(NULL AS BIGINT) AS n_kept,
           CAST(NULL AS BIGINT) AS kept_tokens,
           round(power(count(*), {_MIX_ALPHA})
                 / (SELECT sum(power(n, {_MIX_ALPHA}))
                    FROM (SELECT count(*) AS n FROM documents GROUP BY source)),
                 6) AS achieved_frac,
           CAST(NULL AS BIGINT) AS doc_id,
           CAST(NULL AS BIGINT) AS rk
    FROM documents
    GROUP BY source
    UNION ALL
    SELECT 'pps' AS section,
           source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN {pps} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN {pps} THEN n_chars ELSE 0 END) AS BIGINT)
               AS kept_tokens,
           round(sum(CASE WHEN {pps} THEN 1 ELSE 0 END) / count(*)::DOUBLE, 4)
               AS achieved_frac,
           CAST(NULL AS BIGINT) AS doc_id,
           CAST(NULL AS BIGINT) AS rk
    FROM documents
    GROUP BY source
    UNION ALL
    SELECT 'rep' AS section, source, count(*) AS n_docs,
           CAST(sum(nc) AS BIGINT) AS n_kept,
           CAST(sum(nc * ws) AS BIGINT) AS kept_tokens,
           round(sum(nc) / count(*)::DOUBLE, 4) AS achieved_frac,
           CAST(NULL AS BIGINT) AS doc_id,
           CAST(NULL AS BIGINT) AS rk
    FROM (SELECT source, {_ws} AS ws, {nc} AS nc FROM documents)
    GROUP BY source
    UNION ALL
    SELECT m.section, d.source,
           d.n_tokens AS n_docs,
           d.n_types  AS n_kept,
           CAST(NULL AS BIGINT) AS kept_tokens,
           CASE m.section WHEN 'entropy' THEN d.entropy
                          WHEN 'kl' THEN d.kl_corpus
                          ELSE d.js_corpus END AS achieved_frac,
           CAST(NULL AS BIGINT) AS doc_id,
           CAST(NULL AS BIGINT) AS rk
    FROM ({div}) d
    CROSS JOIN (VALUES ('entropy'), ('kl'), ('js')) AS m(section)
    """


@query("q30_corpus_mix", oracle=_corpus_mix_oracle())
def q30_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two deterministic per-source row selectors of a training-data
    pipeline in one tagged union (merged q30+q65 — same recipe as
    q05/q09/q12/q36):

    - 'mix' — corpus mixing (operators/sampling.py mix_keep), the
      per-source sampling-weight step (LLaMA/Pile-style mixes).
      Membership is a pure function of hash(doc_id) so the mix is
      rerun/engine/append-stable; reported as per-source kept counts +
      token mass + achieved fraction. Per-row flag, one small agg — no
      extra shuffle at any scale.
    - 'cap' — domain capping (operators/curation.py source_cap):
      deterministic hash-ordered top-10 documents per source, bounding
      any one source's share of the training mix. One shuffle on the
      group key; see source_cap for stability and scale notes.
    - 'alpha' — temperature-scaled mixture weights, p(s) ∝ n_s^α with
      α=0.3 (the multilingual up-sampling rule of XLM-R / mT5:
      down-weight head sources, up-weight tail sources relative to raw
      share). One combinable per-source count over a scan pruned to
      the source column alone, plus a broadcast 1-row normalizer.
    - 'pps' — probability-proportional-to-size Bernoulli sampling
      (operators/sampling.py pps_keep): each doc kept with probability
      min(1, n_chars/500) — the size-biased per-ROW generalization of
      the per-group 'mix' fractions, with INTEGER-exact hash
      membership. For this leg kept_tokens carries the kept CHAR mass
      (the PPS weight), and the leg's scan reads only (doc_id, source,
      n_chars) — never the text column.
    - 'rep' (round 18) — fractional-epoch UP-sampling
      (operators/sampling.py replicate_copies / replicate_by_weight):
      the other half of the mixing story, where a 2.5-epoch recipe
      weight repeats every doc 2× plus a deterministic-hash 50% third
      copy (the LLaMA/Pile regime — books/wiki repeat, crawl
      sub-samples; weights < 1 degenerate to exactly the 'mix' leg's
      row set, same hash space and threshold convention). The report
      rides the SAME scan and per-source aggregate as 'mix' (Σnc is
      the replica count and Σ nc·ws the replicated token mass by
      construction — no explode, no join); the materializing form
      (replicate_by_weight's rep-tagged explode) is what downstream
      packing consumes, determinism-tested in pytest.
    - 'entropy' / 'kl' / 'js' (round 9) — mixture DIAGNOSTICS
      (operators/curation.py source_divergence): per-source unigram
      entropy, KL divergence to the corpus distribution, and
      Jensen-Shannon distance, each riding achieved_frac (n_docs =
      token count, n_kept = type count). One corpus shuffle builds the
      (source, token) count relation; everything after is
      vocabulary-sized; per-term fixed-point quantization keeps the
      float sums hash-identical across engines. q30 both SETS the mix
      (weights, caps, samplers) and now MEASURES it.
    """
    from unimib_simpss_spark.operators.curation import (
        source_cap,
        source_divergence,
    )
    from unimib_simpss_spark.operators.sampling import (
        mix_keep,
        pps_keep,
        replicate_copies,
    )

    docs = load_table(spark, sf_dir, "documents")
    keep = mix_keep("source", "doc_id", _MIX_FRACS, default_fraction=_MIX_DEFAULT)
    nc = replicate_copies(
        "source", "doc_id", _REP_WEIGHTS, default_weight=_REP_DEFAULT
    )
    t = docs.select(
        "source",
        keep.alias("keep"),
        nc.alias("nc"),
        A.token_count_ws("text").alias("ws"),
    )
    # 'mix' (down-sampling) and 'rep' (up-sampling) ride ONE scan and
    # ONE combinable per-source aggregate, then explode into their two
    # section rows (the div_leg idiom). The rep report never
    # materializes the replicas: Σnc IS the exploded row count and
    # Σ(nc·ws) the replicated token mass by construction — exploding
    # just to re-aggregate would pay the copy blow-up for nothing (the
    # materializing form, replicate_by_weight, is what downstream
    # packing consumes and is determinism-tested in pytest).
    g = t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("mix_kept"),
        F.sum(F.when(F.col("keep"), F.col("ws")).otherwise(F.lit(0)))
        .cast("long")
        .alias("mix_tokens"),
        F.sum("nc").cast("long").alias("rep_kept"),
        F.sum(F.col("nc") * F.col("ws")).cast("long").alias("rep_tokens"),
    )
    mix = g.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("mix").alias("s"),
                    F.col("mix_kept").alias("k"),
                    F.col("mix_tokens").alias("t"),
                ),
                F.struct(
                    F.lit("rep").alias("s"),
                    F.col("rep_kept").alias("k"),
                    F.col("rep_tokens").alias("t"),
                ),
            )
        ).alias("m"),
        "source",
        "n_docs",
    ).select(
        F.col("m.s").alias("section"),
        "source",
        "n_docs",
        F.col("m.k").alias("n_kept"),
        F.col("m.t").alias("kept_tokens"),
        F.round(F.col("m.k") / F.col("n_docs"), 4).alias("achieved_frac"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("long").alias("rk"),
    )
    cap = source_cap(docs, quota=_SOURCE_CAP_QUOTA).select(
        F.lit("cap").alias("section"),
        "source",
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("n_kept"),
        F.lit(None).cast("long").alias("kept_tokens"),
        F.lit(None).cast("double").alias("achieved_frac"),
        "doc_id",
        "rk",
    )
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    norm = counts.agg(
        F.sum(F.pow("n_docs", F.lit(_MIX_ALPHA))).alias("norm")
    )
    alpha = counts.crossJoin(F.broadcast(norm)).select(
        F.lit("alpha").alias("section"),
        "source",
        "n_docs",
        F.lit(None).cast("long").alias("n_kept"),
        F.lit(None).cast("long").alias("kept_tokens"),
        F.round(
            F.pow("n_docs", F.lit(_MIX_ALPHA)) / F.col("norm"), 6
        ).alias("achieved_frac"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("long").alias("rk"),
    )
    pk = pps_keep("n_chars", "doc_id", _PPS_FULL_CHARS)
    pps = (
        docs.select("source", pk.alias("keep"), "n_chars")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum(
                F.when(F.col("keep"), F.col("n_chars")).otherwise(F.lit(0))
            ).alias("kept_tokens"),
            F.round(
                F.sum(F.col("keep").cast("long")) / F.count(F.lit(1)), 4
            ).alias("achieved_frac"),
        )
        .select(
            F.lit("pps").alias("section"),
            "source",
            "n_docs",
            "n_kept",
            "kept_tokens",
            "achieved_frac",
            F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast("long").alias("rk"),
        )
    )
    div = source_divergence(docs)
    div_leg = div.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("entropy").alias("s"), F.col("entropy").alias("v")
                ),
                F.struct(F.lit("kl").alias("s"), F.col("kl_corpus").alias("v")),
                F.struct(F.lit("js").alias("s"), F.col("js_corpus").alias("v")),
            )
        ).alias("m"),
        "source",
        "n_tokens",
        "n_types",
    ).select(
        F.col("m.s").alias("section"),
        "source",
        F.col("n_tokens").alias("n_docs"),
        F.col("n_types").alias("n_kept"),
        F.lit(None).cast("long").alias("kept_tokens"),
        F.col("m.v").alias("achieved_frac"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("long").alias("rk"),
    )
    return mix.unionAll(cap).unionAll(alpha).unionAll(pps).unionAll(div_leg)


_PACK_BUDGET = 512  # ws tokens/doc ≈ 50 → ~10 docs per sequence


_CHUNK_TOKENS, _CHUNK_STRIDE, _CHUNK_MIN = 64, 48, 8


def _packing_oracle() -> str:
    from unimib_simpss_spark.operators.curation import (
        BPE_DEMO_MERGES,
        bpe_token_count_sql,
    )
    from unimib_simpss_spark.operators.sampling import greedy_pack_sql

    sb = greedy_pack_sql("source", "doc_id", "ws", _PACK_BUDGET)
    bpe_cnt = bpe_token_count_sql("text", BPE_DEMO_MERGES)
    legs = []
    for tag, cnt in (("ws", _ws), ("bpe", bpe_cnt)):
        legs.append(f"""
    SELECT '{tag}' AS counter, source, seq_bin,
           count(*)                  AS n_docs,
           CAST(sum(ws) AS BIGINT)   AS sum_tokens,
           round(sum(ws) / {_PACK_BUDGET}.0, 4) AS fill_ratio,
           CAST(NULL AS BIGINT)  AS doc_id,
           CAST(NULL AS BIGINT)  AS chunk_id,
           CAST(NULL AS BIGINT)  AS start_tok,
           CAST(NULL AS BIGINT)  AS n_tok,
           CAST(NULL AS VARCHAR) AS chunk_md5
    FROM (SELECT source, ws, {sb} AS seq_bin
          FROM (SELECT doc_id, source, {cnt} AS ws FROM documents))
    GROUP BY source, seq_bin
    """)
    from unimib_simpss_spark.operators.curation import chunk_documents_sql

    legs.append(f"""
    SELECT 'chunk' AS counter, CAST(NULL AS VARCHAR) AS source,
           CAST(NULL AS BIGINT) AS seq_bin,
           CAST(NULL AS BIGINT) AS n_docs,
           CAST(NULL AS BIGINT) AS sum_tokens,
           CAST(NULL AS DOUBLE) AS fill_ratio,
           doc_id, chunk_id, start_tok, n_tok,
           md5(chunk_text) AS chunk_md5
    FROM ({chunk_documents_sql(chunk_tokens=_CHUNK_TOKENS,
                               stride=_CHUNK_STRIDE,
                               min_tokens=_CHUNK_MIN)})
    """)
    return " UNION ALL ".join(legs)


@query("q32_sequence_packing", oracle=_packing_oracle())
def q32_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (token-budget binning): concat-and-chunk docs
    into 512-token training sequences per source (operators/sampling.py
    greedy_pack — deterministic doc_id order, window prefix-sum), then
    per-sequence fill stats. The parallel unit is the partition key, so
    the plan is one shuffle at any scale.

    Two counter legs (VERDICT r9 #3): 'ws' budgets by the whitespace
    token count; 'bpe' budgets by the TRAINED-tokenizer count the
    engine actually ships (bpe_token_count_expr under the fixed demo
    merge table — a packer that budgets with a different tokenizer than
    training mis-sizes every sequence). The 'chunk' leg is the OTHER
    way text becomes training units: overlapping fixed-token windows
    per document (operators/curation.py chunk_documents — RAG/long-doc
    prep; stride 48 under a 64-token window = 16 tokens of carried
    context, min-tail merge so no fragment ships), one row per chunk
    with its content md5. All legs are oracle-paired."""
    from unimib_simpss_spark.operators.curation import (
        BPE_DEMO_MERGES,
        bpe_token_count_expr,
        chunk_documents,
    )
    from unimib_simpss_spark.operators.sampling import greedy_pack

    docs = load_table(spark, sf_dir, "documents")
    counters = [
        ("ws", A.token_count_ws("text")),
        ("bpe", bpe_token_count_expr("text", BPE_DEMO_MERGES)),
    ]
    pad_chunk = [
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("long").alias("chunk_id"),
        F.lit(None).cast("long").alias("start_tok"),
        F.lit(None).cast("long").alias("n_tok"),
        F.lit(None).cast("string").alias("chunk_md5"),
    ]
    legs = []
    for tag, cnt in counters:
        t = docs.select("doc_id", "source", cnt.alias("ws"))
        packed = greedy_pack(
            t, partition_col="source", order_col="doc_id", token_col="ws",
            budget=_PACK_BUDGET,
        )
        legs.append(
            packed.groupBy("source", "seq_bin").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("ws").alias("sum_tokens"),
                F.round(F.sum("ws") / F.lit(float(_PACK_BUDGET)), 4).alias(
                    "fill_ratio"
                ),
            ).select(
                F.lit(tag).alias("counter"),
                "source",
                "seq_bin",
                "n_docs",
                "sum_tokens",
                "fill_ratio",
                *pad_chunk,
            )
        )
    chunks = chunk_documents(
        docs, chunk_tokens=_CHUNK_TOKENS, stride=_CHUNK_STRIDE,
        min_tokens=_CHUNK_MIN,
    ).select(
        F.lit("chunk").alias("counter"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("seq_bin"),
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("sum_tokens"),
        F.lit(None).cast("double").alias("fill_ratio"),
        "doc_id",
        "chunk_id",
        "start_tok",
        "n_tok",
        F.md5("chunk_text").alias("chunk_md5"),
    )
    return legs[0].unionAll(legs[1]).unionAll(chunks)


_SPLIT_FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _split_oracle() -> str:
    from unimib_simpss_spark.functions.text import token_fingerprint_sql
    from unimib_simpss_spark.operators.sampling import (
        split_assignment_sql,
        stratified_split_sql,
    )

    case = split_assignment_sql("doc_id", _SPLIT_FRACS)
    strat = stratified_split_sql("source", "doc_id", _SPLIT_FRACS)
    return f"""
    WITH s AS (
        SELECT source, n_chars, text, {case} AS split FROM documents
    )
    SELECT 'split' AS section, source, split,
           count(*)               AS n_docs,
           {A.exact_avg_sql("n_chars", 2)} AS avg_chars,
           CAST(NULL AS VARCHAR)  AS group_key,
           CAST(NULL AS BIGINT)   AS n_splits
    FROM s
    GROUP BY source, split
    UNION ALL
    SELECT 'strat' AS section, source, split,
           count(*)               AS n_docs,
           {A.exact_avg_sql("n_chars", 2)} AS avg_chars,
           CAST(NULL AS VARCHAR)  AS group_key,
           CAST(NULL AS BIGINT)   AS n_splits
    FROM ({strat})
    GROUP BY source, split
    UNION ALL
    SELECT 'leak' AS section,
           CAST(NULL AS VARCHAR) AS source,
           CAST(NULL AS VARCHAR) AS split,
           n_docs, CAST(NULL AS DOUBLE) AS avg_chars, group_key, n_splits
    FROM (
        SELECT {token_fingerprint_sql('text')} AS group_key,
               count(*) AS n_docs,
               CAST(count(DISTINCT split) AS BIGINT) AS n_splits
        FROM s
        GROUP BY 1
        HAVING count(*) > 1 AND count(DISTINCT split) > 1
    )
    """


@query("q58_hash_split", oracle=_split_oracle())
def q58_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split AND the leakage audit it
    needs, tagged by section:

    - 'split' — membership is a pure function of hash(doc_id), so the
      split is identical on every rerun/retry/engine and append-stable
      (the reproducible alternative to RNG df.sample()); summarized per
      (source, split).
    - 'leak' — cross-split contamination: token-fingerprint duplicate
      groups that span more than one split (an eval doc whose exact/
      reordered copy sits in train — the leakage dedup must remove
      BEFORE splitting; Lee et al. 2022's train-test overlap finding).
      One combinable groupBy on the fingerprint, over its own
      column-pruned scan of (doc_id, text) — the split summary's scan
      never reads the text column, so the two legs each read only what
      they need.
    - 'strat' — the STRATIFIED splitter beside the hash splitter:
      per-source proportions exact to one row per boundary
      (operators/sampling.py stratified_split, integer per-mille
      boundary arithmetic), summarized the same way — the snapshot
      split for frozen corpora where hash_split's per-stratum binomial
      noise is unacceptable.
    """
    from unimib_simpss_spark.functions.text import token_fingerprint
    from unimib_simpss_spark.operators.sampling import (
        hash_split,
        stratified_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    s = hash_split(docs, key="doc_id", fractions=_SPLIT_FRACS)
    split = s.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        A.exact_avg("n_chars", 2).alias("avg_chars"),
    ).select(
        F.lit("split").alias("section"),
        "source",
        "split",
        "n_docs",
        "avg_chars",
        F.lit(None).cast("string").alias("group_key"),
        F.lit(None).cast("long").alias("n_splits"),
    )
    leak = (
        s.select(token_fingerprint("text").alias("group_key"), "split")
        .groupBy("group_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("split").alias("n_splits"),
        )
        .where((F.col("n_docs") > 1) & (F.col("n_splits") > 1))
        .select(
            F.lit("leak").alias("section"),
            F.lit(None).cast("string").alias("source"),
            F.lit(None).cast("string").alias("split"),
            "n_docs",
            F.lit(None).cast("double").alias("avg_chars"),
            "group_key",
            "n_splits",
        )
    )
    strat = (
        stratified_split(
            docs.select("source", "n_chars", "doc_id"),
            stratum_col="source",
            key="doc_id",
            fractions=_SPLIT_FRACS,
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            A.exact_avg("n_chars", 2).alias("avg_chars"),
        )
        .select(
            F.lit("strat").alias("section"),
            "source",
            "split",
            "n_docs",
            "avg_chars",
            F.lit(None).cast("string").alias("group_key"),
            F.lit(None).cast("long").alias("n_splits"),
        )
    )
    return split.unionAll(leak).unionAll(strat)
