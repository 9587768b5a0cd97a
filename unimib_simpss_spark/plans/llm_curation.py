"""Curation / privacy queries (SURVEY.md §2.7 [EXT]).

Three training-data-pipeline knobs over the shared test tables, each
oracle-paired with DuckDB running the equivalent ANSI SQL:

- q63: PII pipeline — join-preserving pseudonymization + digit-run
  redaction over the ``customer`` direct identifier, unioned with a
  k-anonymity audit of the (mktsegment, nationkey) quasi-identifiers,
  the l-diversity/t-closeness audit, the declarative constraint gate,
  and the structured-PII scrub section (email/phone/IPv4/IPv6 → class
  tokens, verbatim-hash-checked).
- q64: bigram LM scoring — perplexity-proxy quality score per document
  under the corpus's own bigram frequency model.

(The per-source domain cap that lived here as q65 is now the 'cap' leg
of q30_corpus_mix in plans/llm_text.py — merged so every oracle-paired
query sorts inside the driver's 50-slot window.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unimib_simpss_spark.catalog import load_table
from unimib_simpss_spark.functions import privacy as P
from unimib_simpss_spark.operators import curation as C
from unimib_simpss_spark.plans.registry import query

_KANON_K = 5
_LDIV_L = 3
_LDIV_T = 0.25

# Data-quality audit rules over customer (the 'audit' section of q63):
# one name → (DuckDB predicate SQL, Spark Column builder). Row rules
# fold into ONE aggregate pass (operators/validation.py); uniqueness
# and referential rules are separate bounded checks.
_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")
_AUDIT_ROW_RULES_SQL = {
    "acctbal_nonnegative": "c_acctbal >= 0",
    "custkey_not_null": "c_custkey IS NOT NULL",
    "mktsegment_domain": "c_mktsegment IN ('"
    + "', '".join(_SEGMENTS)
    + "')",
    "name_format": "regexp_matches(c_name, '^Customer#[0-9]{9}$')",
}


def _audit_oracle() -> str:
    rule_rows = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, rr.n AS n_rows,"
        f" rr.v_{name} AS n_violations FROM rr"
        for name in _AUDIT_ROW_RULES_SQL
    )
    v_cols = ",\n".join(
        f"CAST(sum(CASE WHEN {pred} THEN 0 ELSE 1 END) AS BIGINT)"
        f" AS v_{name}"
        for name, pred in _AUDIT_ROW_RULES_SQL.items()
    )
    return f"""
    WITH rr AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               -- coalesce mirrors the operator's struct semantics:
               -- NULL keys form ONE distinct value (every NULL-keyed
               -- row past the first is a violation) instead of being
               -- skipped by bare count(DISTINCT)
               CAST(count(*) - count(DISTINCT
                        coalesce(CAST(c_custkey AS VARCHAR), '__null__'))
                    AS BIGINT) AS v_unique,
               {v_cols}
        FROM customer
    ),
    fk AS (
        SELECT CAST(count(*) AS BIGINT) AS v FROM customer c
        WHERE c_nationkey IS NOT NULL AND NOT EXISTS (
            SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    )
    SELECT rule, n_rows, n_violations,
           CAST(n_violations = 0 AS BIGINT) AS audit_pass
    FROM (
        {rule_rows}
        UNION ALL
        SELECT 'custkey_unique' AS rule, rr.n, rr.v_unique FROM rr
        UNION ALL
        SELECT 'nationkey_fk' AS rule, rr.n, fk.v FROM rr, fk
    )
    """


def _ldiv_oracle() -> str:
    """DuckDB twin of functions/privacy.py ldiversity_groups over
    quasi = (c_nationkey), sensitive = c_mktsegment — entropy and TV
    expressions mirror the Spark Columns verbatim (same cast/sum
    order)."""
    return f"""
    WITH cell AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS c
        FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
        GROUP BY 1, 2
    ),
    pg AS (
        SELECT c_nationkey, sum(c) AS group_n, count(*) AS distinct_l,
               round(ln(CAST(sum(c) AS DOUBLE))
                     - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                       / CAST(sum(c) AS DOUBLE), 6) AS entropy
        FROM cell GROUP BY 1
    ),
    gseg AS (SELECT c_mktsegment, sum(c) AS gc FROM cell GROUP BY 1),
    tot AS (SELECT sum(c) AS n FROM cell),
    tv AS (
        SELECT p.c_nationkey,
               round(0.5 * sum(abs(
                   CAST(coalesce(cell.c, 0) AS DOUBLE) / pg.group_n
                   - CAST(g.gc AS DOUBLE) / t.n)), 6) AS tv_dist
        FROM (SELECT DISTINCT c_nationkey FROM cell) p
        CROSS JOIN gseg g CROSS JOIN tot t
        LEFT JOIN cell ON cell.c_nationkey = p.c_nationkey
                      AND cell.c_mktsegment = g.c_mktsegment
        JOIN pg ON pg.c_nationkey = p.c_nationkey
        GROUP BY 1
    )
    SELECT pg.c_nationkey, pg.group_n,
           CAST(pg.distinct_l AS BIGINT) AS distinct_l,
           pg.entropy, tv.tv_dist,
           CAST(pg.distinct_l < {_LDIV_L} OR tv.tv_dist > {_LDIV_T}
                AS BIGINT) AS suppressed
    FROM pg JOIN tv USING (c_nationkey)
    """


# The 'scrub' section's contact blob: REAL customer columns composed
# into a PII-bearing line, built engine-identically on both sides so
# the driver hash-checks the SCRUBBED TEXT verbatim (the cleaning-
# family discipline — every regex rule is proven engine-identical on
# every customer row, not just summary counts). The email is
# name-derived, the +intl phone and NNN-555-NNNN dashed phone and
# both IPs are key-derived (the driver's customer table carries no
# phone column), so all four PII classes vary per row. Both engines
# LOWER the hex tail (Spark F.hex and DuckDB to_hex are both
# uppercase) — review r17 pass 2: an unlowered to_hex left the RAW
# blobs differing on every A-F row, masked only because IPV6_RE is
# case-insensitive and consumed the whole tail on both sides.
_SCRUB_BLOB_SQL = (
    "'Reach ' || replace(lower(c_name), '#', '.') || "
    "'@example.com or +39 02 ' || "
    "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || "
    "' 5678 at 10.' || CAST(c_nationkey % 256 AS VARCHAR) || "
    "'.0.1 / 2001:db8::' || lower(to_hex(c_custkey % 65536)) || "
    "' tel ' || CAST(c_custkey % 900 + 100 AS VARCHAR) || '-555-' || "
    "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"
)

_SCRUB_COUNTS_SQL = P.pii_class_counts_sql(_SCRUB_BLOB_SQL)

_SCRUB_PADS_SQL = """CAST(NULL AS VARCHAR) AS scrubbed,
       CAST(NULL AS BIGINT)  AS n_emails,
       CAST(NULL AS BIGINT)  AS n_phones,
       CAST(NULL AS BIGINT)  AS n_ipv4,
       CAST(NULL AS BIGINT)  AS n_ipv6"""

_PII_ORACLE = f"""
SELECT 'redact' AS section,
       c_custkey,
       substr(sha256(c_name), 1, 16)                      AS pseudonym,
       regexp_replace(c_name, '[0-9]+', '[ID]', 'g')      AS redacted_name,
       CAST(length(c_name)
            - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT)
                                                          AS n_digits,
       CAST(NULL AS VARCHAR) AS c_mktsegment,
       CAST(NULL AS INT)     AS c_nationkey,
       CAST(NULL AS BIGINT)  AS group_n,
       CAST(NULL AS BIGINT)  AS suppressed,
       CAST(NULL AS VARCHAR) AS rule,
       CAST(NULL AS BIGINT)  AS n_rows,
       CAST(NULL AS BIGINT)  AS n_violations,
       CAST(NULL AS BIGINT)  AS audit_pass,
       CAST(NULL AS BIGINT)  AS distinct_l,
       CAST(NULL AS DOUBLE)  AS entropy,
       CAST(NULL AS DOUBLE)  AS tv_dist,
       {_SCRUB_PADS_SQL}
FROM customer
UNION ALL
SELECT 'kanon' AS section,
       CAST(NULL AS BIGINT)  AS c_custkey,
       CAST(NULL AS VARCHAR) AS pseudonym,
       CAST(NULL AS VARCHAR) AS redacted_name,
       CAST(NULL AS BIGINT)  AS n_digits,
       c_mktsegment,
       c_nationkey,
       CAST(count(*) AS BIGINT)                           AS group_n,
       CAST(count(*) < {_KANON_K} AS BIGINT)              AS suppressed,
       CAST(NULL AS VARCHAR) AS rule,
       CAST(NULL AS BIGINT)  AS n_rows,
       CAST(NULL AS BIGINT)  AS n_violations,
       CAST(NULL AS BIGINT)  AS audit_pass,
       CAST(NULL AS BIGINT)  AS distinct_l,
       CAST(NULL AS DOUBLE)  AS entropy,
       CAST(NULL AS DOUBLE)  AS tv_dist,
       {_SCRUB_PADS_SQL}
FROM customer
GROUP BY c_mktsegment, c_nationkey
UNION ALL
SELECT 'audit' AS section,
       CAST(NULL AS BIGINT)  AS c_custkey,
       CAST(NULL AS VARCHAR) AS pseudonym,
       CAST(NULL AS VARCHAR) AS redacted_name,
       CAST(NULL AS BIGINT)  AS n_digits,
       CAST(NULL AS VARCHAR) AS c_mktsegment,
       CAST(NULL AS INT)     AS c_nationkey,
       CAST(NULL AS BIGINT)  AS group_n,
       CAST(NULL AS BIGINT)  AS suppressed,
       rule, n_rows, n_violations, audit_pass,
       CAST(NULL AS BIGINT)  AS distinct_l,
       CAST(NULL AS DOUBLE)  AS entropy,
       CAST(NULL AS DOUBLE)  AS tv_dist,
       {_SCRUB_PADS_SQL}
FROM ({_audit_oracle()})
UNION ALL
SELECT 'ldiv' AS section,
       CAST(NULL AS BIGINT)  AS c_custkey,
       CAST(NULL AS VARCHAR) AS pseudonym,
       CAST(NULL AS VARCHAR) AS redacted_name,
       CAST(NULL AS BIGINT)  AS n_digits,
       CAST(NULL AS VARCHAR) AS c_mktsegment,
       c_nationkey,
       group_n,
       suppressed,
       CAST(NULL AS VARCHAR) AS rule,
       CAST(NULL AS BIGINT)  AS n_rows,
       CAST(NULL AS BIGINT)  AS n_violations,
       CAST(NULL AS BIGINT)  AS audit_pass,
       distinct_l, entropy, tv_dist,
       {_SCRUB_PADS_SQL}
FROM ({_ldiv_oracle()})
UNION ALL
SELECT 'scrub' AS section,
       c_custkey,
       CAST(NULL AS VARCHAR) AS pseudonym,
       CAST(NULL AS VARCHAR) AS redacted_name,
       CAST(NULL AS BIGINT)  AS n_digits,
       CAST(NULL AS VARCHAR) AS c_mktsegment,
       CAST(NULL AS INT)     AS c_nationkey,
       CAST(NULL AS BIGINT)  AS group_n,
       CAST(NULL AS BIGINT)  AS suppressed,
       CAST(NULL AS VARCHAR) AS rule,
       CAST(NULL AS BIGINT)  AS n_rows,
       CAST(NULL AS BIGINT)  AS n_violations,
       CAST(NULL AS BIGINT)  AS audit_pass,
       CAST(NULL AS BIGINT)  AS distinct_l,
       CAST(NULL AS DOUBLE)  AS entropy,
       CAST(NULL AS DOUBLE)  AS tv_dist,
       {P.scrub_pii_sql(_SCRUB_BLOB_SQL)} AS scrubbed,
       {_SCRUB_COUNTS_SQL["emails"]} AS n_emails,
       {_SCRUB_COUNTS_SQL["phones"]} AS n_phones,
       {_SCRUB_COUNTS_SQL["ipv4"]} AS n_ipv4,
       {_SCRUB_COUNTS_SQL["ipv6"]} AS n_ipv6
FROM customer
"""


@query("q63_pii_pipeline", oracle=_PII_ORACLE)
def q63_pii_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub + k-anonymity + declarative data-quality audit, tagged
    by section.

    'redact' pseudonymizes and redacts the direct identifier (pure
    Column exprs, codegen'd, no shuffle); 'kanon' sizes every
    quasi-identifier group and flags those below k=5 for suppression
    (one combinable shuffle); 'ldiv' is the l-diversity + t-closeness
    audit over quasi = nationkey with mktsegment as the sensitive
    attribute (functions/privacy.py ldiversity_groups — distinct-l,
    Shannon entropy, and the total-variation distance to the global
    mix, with the combined publish/suppress verdict: the homogeneity-
    and skew-attack gates k-anonymity misses); 'audit' is the
    Deequ-shaped constraint
    gate (operators/validation.py): four row rules verified in ONE
    aggregate pass (not-null, range, set-membership, regex), a
    uniqueness rule, and a referential rule against the broadcast
    nation dimension — one (rule, n_rows, n_violations, audit_pass)
    row each, value-checked against the DuckDB oracle; 'scrub' is the
    structured-PII pass (VERDICT r16 #4 — the CCNet/RefinedWeb scrub
    beyond digit runs): email, phone, IPv4, and IPv6 redaction with
    class-preserving placeholders plus a per-class count profile,
    over a contact blob composed engine-identically from customer
    columns (the driver's customer table has no phone column, so the
    phone shapes are key-derived — see _SCRUB_BLOB_SQL) so the oracle
    hash-checks the scrubbed TEXT verbatim. See
    functions/privacy.py for the 100 TB notes."""
    from unimib_simpss_spark.operators import validation as V

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    pad_audit = [
        F.lit(None).cast("string").alias("rule"),
        F.lit(None).cast("long").alias("n_rows"),
        F.lit(None).cast("long").alias("n_violations"),
        F.lit(None).cast("long").alias("audit_pass"),
    ]
    pad_ldiv = [
        F.lit(None).cast("long").alias("distinct_l"),
        F.lit(None).cast("double").alias("entropy"),
        F.lit(None).cast("double").alias("tv_dist"),
    ]
    pad_scrub = [
        F.lit(None).cast("string").alias("scrubbed"),
        F.lit(None).cast("long").alias("n_emails"),
        F.lit(None).cast("long").alias("n_phones"),
        F.lit(None).cast("long").alias("n_ipv4"),
        F.lit(None).cast("long").alias("n_ipv6"),
    ]
    redact = cust.select(
        F.lit("redact").alias("section"),
        "c_custkey",
        P.pseudonym("c_name").alias("pseudonym"),
        P.redact_digits("c_name").alias("redacted_name"),
        P.digit_count("c_name").alias("n_digits"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("long").alias("group_n"),
        F.lit(None).cast("long").alias("suppressed"),
        *pad_audit,
        *pad_ldiv,
        *pad_scrub,
    )
    kanon = P.kanon_groups(cust, ["c_mktsegment", "c_nationkey"], k=_KANON_K).select(
        F.lit("kanon").alias("section"),
        F.lit(None).cast("long").alias("c_custkey"),
        F.lit(None).cast("string").alias("pseudonym"),
        F.lit(None).cast("string").alias("redacted_name"),
        F.lit(None).cast("long").alias("n_digits"),
        "c_mktsegment",
        "c_nationkey",
        "group_n",
        "suppressed",
        *pad_audit,
        *pad_ldiv,
        *pad_scrub,
    )
    ldiv = P.ldiversity_groups(
        cust, ["c_nationkey"], "c_mktsegment", l_min=_LDIV_L, t_max=_LDIV_T
    ).select(
        F.lit("ldiv").alias("section"),
        F.lit(None).cast("long").alias("c_custkey"),
        F.lit(None).cast("string").alias("pseudonym"),
        F.lit(None).cast("string").alias("redacted_name"),
        F.lit(None).cast("long").alias("n_digits"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        "c_nationkey",
        "group_n",
        "suppressed",
        *pad_audit,
        "distinct_l",
        "entropy",
        "tv_dist",
        *pad_scrub,
    )
    audit_rel = V.audit_union(
        V.check_row_rules(
            cust,
            {
                "acctbal_nonnegative": F.col("c_acctbal") >= 0,
                "custkey_not_null": F.col("c_custkey").isNotNull(),
                "mktsegment_domain": F.col("c_mktsegment").isin(*_SEGMENTS),
                "name_format": F.col("c_name").rlike("^Customer#[0-9]{9}$"),
            },
        ),
        V.check_unique(cust, "custkey_unique", ["c_custkey"]),
        V.check_foreign_key(
            cust, "nationkey_fk", ["c_nationkey"], nation, ["n_nationkey"]
        ),
    )
    audit = audit_rel.select(
        F.lit("audit").alias("section"),
        F.lit(None).cast("long").alias("c_custkey"),
        F.lit(None).cast("string").alias("pseudonym"),
        F.lit(None).cast("string").alias("redacted_name"),
        F.lit(None).cast("long").alias("n_digits"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("long").alias("group_n"),
        F.lit(None).cast("long").alias("suppressed"),
        "rule",
        "n_rows",
        "n_violations",
        F.col("passed").alias("audit_pass"),
        *pad_ldiv,
        *pad_scrub,
    )
    # the 'scrub' section: the structured-PII pass (email/phone/IPv4/
    # IPv6 → class tokens, functions/privacy.py) over a contact blob
    # composed engine-identically from real customer columns — the
    # SCRUBBED TEXT is hash-checked verbatim, plus the per-class count
    # profile over the raw blob. Pure regexp_replace/regexp_count
    # chain: zero shuffles, zero Python.
    blob = F.concat(
        F.lit("Reach "),
        F.replace(F.lower(F.col("c_name")), F.lit("#"), F.lit(".")),
        F.lit("@example.com or +39 02 "),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" 5678 at 10."),
        (F.col("c_nationkey") % 256).cast("string"),
        F.lit(".0.1 / 2001:db8::"),
        F.lower(F.hex(F.col("c_custkey") % 65536)),
        F.lit(" tel "),
        (F.col("c_custkey") % 900 + 100).cast("string"),
        F.lit("-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
    )
    counts = P.pii_class_counts(blob)
    scrub = cust.select(
        F.lit("scrub").alias("section"),
        "c_custkey",
        F.lit(None).cast("string").alias("pseudonym"),
        F.lit(None).cast("string").alias("redacted_name"),
        F.lit(None).cast("long").alias("n_digits"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("long").alias("group_n"),
        F.lit(None).cast("long").alias("suppressed"),
        *pad_audit,
        *pad_ldiv,
        P.scrub_pii(blob).alias("scrubbed"),
        counts["emails"].alias("n_emails"),
        counts["phones"].alias("n_phones"),
        counts["ipv4"].alias("n_ipv4"),
        counts["ipv6"].alias("n_ipv6"),
    )
    return (
        redact.unionAll(kanon).unionAll(ldiv).unionAll(audit)
        .unionAll(scrub)
    )


_DSIR_TARGET_SOURCE = "src0"

_BIGRAM_LM_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source, string_split(text, ' ') AS l FROM documents
),
bi AS (
    SELECT doc_id, source, l[i] AS w1, l[i + 1] AS w2
    FROM toks, LATERAL (SELECT unnest(range(1, len(l))) AS i) s
),
counts AS (SELECT w1, w2, count(*) AS cnt FROM bi GROUP BY w1, w2),
tcounts AS (
    SELECT w1, w2, count(*) AS tcnt FROM bi
    WHERE source = '{_DSIR_TARGET_SOURCE}' GROUP BY w1, w2
),
stats AS (
    SELECT count(*)::DOUBLE AS v,
           sum(cnt)::DOUBLE AS rtot,
           coalesce(sum(tcnt), 0)::DOUBLE AS ttot
    FROM counts LEFT JOIN tcounts USING (w1, w2)
),
joined AS (
    SELECT bi.doc_id, counts.cnt, tcounts.tcnt
    FROM bi JOIN counts USING (w1, w2) LEFT JOIN tcounts USING (w1, w2)
),
tri AS (
    SELECT doc_id, source, l[i] AS w1, l[i + 1] AS w2, l[i + 2] AS w3
    FROM toks, LATERAL (SELECT unnest(range(1, len(l) - 1)) AS i) s
),
t3counts AS (
    SELECT w1, w2, w3, count(*) AS c123 FROM tri GROUP BY w1, w2, w3
),
uni AS (SELECT source, unnest(l) AS w FROM toks),
ucounts AS (SELECT w, count(*) AS uc FROM uni GROUP BY w),
utot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
-- the lm3t (reference-trained) model: counts from the target subset
t3c_t AS (
    SELECT w1, w2, w3, count(*) AS c123 FROM tri
    WHERE source = '{_DSIR_TARGET_SOURCE}' GROUP BY w1, w2, w3
),
bc_t AS (
    SELECT w1, w2, count(*) AS cnt FROM bi
    WHERE source = '{_DSIR_TARGET_SOURCE}' GROUP BY w1, w2
),
uc_t AS (
    SELECT w, count(*) AS uc FROM uni
    WHERE source = '{_DSIR_TARGET_SOURCE}' GROUP BY w
),
ut_t AS (
    SELECT CAST(coalesce(sum(uc), 0) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS v
    FROM uc_t
),
-- the interpolated-trigram mixture: evaluation SHAPE mirrors the
-- Spark Column verbatim (each ratio parenthesized and cast the same
-- way, lambda terms summed left-to-right) so the doubles agree
-- bit-for-bit before the shared round
tj AS (
    SELECT t.doc_id,
           0.6 * (CAST(c.c123 AS DOUBLE) / b12.cnt)
         + 0.3 * (CAST(b23.cnt AS DOUBLE) / u2.uc)
         + 0.1 * (CAST(u3.uc AS DOUBLE) / (SELECT n FROM utot)) AS p
    FROM tri t
    JOIN t3counts c USING (w1, w2, w3)
    JOIN counts b12 ON b12.w1 = t.w1 AND b12.w2 = t.w2
    JOIN counts b23 ON b23.w1 = t.w2 AND b23.w2 = t.w3
    JOIN ucounts u2 ON u2.w = t.w2
    JOIN ucounts u3 ON u3.w = t.w3
),
-- the pinned mixture: MLE conditionals 0 off the model's support,
-- add-one unigram floor over the reference vocabulary (shape mirrors
-- the Spark Column verbatim)
tj_t AS (
    SELECT t.doc_id,
           0.6 * coalesce(CAST(c.c123 AS DOUBLE) / b12.cnt, 0.0)
         + 0.3 * coalesce(CAST(b23.cnt AS DOUBLE) / u2.uc, 0.0)
         + 0.1 * ((coalesce(u3.uc, 0) + 1)
                  / ((SELECT n FROM ut_t) + (SELECT v FROM ut_t))) AS p
    FROM tri t
    LEFT JOIN t3c_t c ON c.w1 = t.w1 AND c.w2 = t.w2 AND c.w3 = t.w3
    LEFT JOIN bc_t b12 ON b12.w1 = t.w1 AND b12.w2 = t.w2
    LEFT JOIN bc_t b23 ON b23.w1 = t.w2 AND b23.w2 = t.w3
    LEFT JOIN uc_t u2 ON u2.w = t.w2
    LEFT JOIN uc_t u3 ON u3.w = t.w3
)
SELECT 'lm' AS section, doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       round(avg(ln(cnt / (SELECT rtot FROM stats))), 3) AS score
FROM joined GROUP BY doc_id
UNION ALL
SELECT 'dsir' AS section, doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       -- + 0 normalizes DuckDB's -0.0 (round of a tiny negative mean)
       -- to +0.0; Spark's BigDecimal round can't produce -0.0
       round(avg(
           ln((coalesce(tcnt, 0) + 1)
              / ((SELECT ttot FROM stats) + (SELECT v FROM stats)))
         - ln((cnt + 1)
              / ((SELECT rtot FROM stats) + (SELECT v FROM stats)))
       ), 3) + 0 AS score
FROM joined GROUP BY doc_id
UNION ALL
SELECT 'lm3' AS section, doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       round(avg(ln(p)), 3) + 0 AS score
FROM tj GROUP BY doc_id
UNION ALL
SELECT 'lm3t' AS section, doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       round(avg(ln(p)), 3) + 0 AS score
FROM tj_t GROUP BY doc_id
"""


@query("q64_bigram_lm_score", oracle=_BIGRAM_LM_ORACLE)
def q64_bigram_lm_score(
    spark: SparkSession, sf_dir: str, sections=None
) -> DataFrame:
    """LM document scoring, four pipeline knobs off ONE tokenize,
    tagged by section: 'lm' is the bigram perplexity-proxy quality
    score (mean bigram log-probability under the corpus's own model),
    'dsir' is the DSIR importance weight against the '{src0}'
    in-domain target (Xie et al. 2023 — up-sample documents whose
    bigrams look like the target corpus), 'lm3' (VERDICT r16 #5)
    is the interpolated-trigram upgrade of 'lm' — the KenLM-shaped
    Jelinek-Mercer mixture λ3·p(w3|w1w2) + λ2·p(w3|w2) + λ1·p(w3)
    at 0.6/0.3/0.1 — and 'lm3t' is the same mixture trained on the
    '{src0}' target subset and scoring EVERYTHING (the actual CCNet
    perplexity-filter regime: reference-trained model, smoothed
    unigram floor for unseen mass — see trigram_lm_scores' pinned
    mode). The bound-token relation is cached ONCE and feeds
    every n-gram order and both models; all count relations are
    xxhash64-keyed so no string ever shuffles (the q64 discipline).
    See operators/curation.py bigram_lm_dsir / trigram_lm_scores for
    the plans and 100 TB notes."""
    from unimib_simpss_spark.operators.caching import (
        cache_intermediate,
        checkpoint_result,
        release_intermediate,
        release_result,
    )
    from unimib_simpss_spark.plans.registry import pick_sections

    want = pick_sections(sections, ("lm", "dsir", "lm3", "lm3t"))
    docs = load_table(spark, sf_dir, "documents")
    pred = F.col("source") == _DSIR_TARGET_SOURCE
    base = docs.withColumn("_tgt", pred)
    # _bound_tokens' exact schema, but repartitioned BEFORE the split
    # (optimization r19, the q62 fill lesson): the operator's
    # projection-below-exchange form computes the split map-side — one
    # task on a single-split corpus — while this cached host form runs
    # it cores-wide in the fill stage and ships text, not arrays. Only
    # safe because the relation is cached immediately (the cache is
    # the anti-CollapseProject barrier the operator's exchange
    # otherwise provides to lazy callers).
    toks = cache_intermediate(
        base.select("doc_id", "_tgt", "text")
        .repartition("doc_id")
        .select(
            "doc_id", "_tgt", F.split(F.col("text"), " ").alias("toks")
        )
    )
    legs, handles = [], []
    dtri = None
    if "lm3" in want:
        # the scored side's five-key trigram-count relation is
        # IDENTICAL under both models — mine the triples ONCE and
        # share it across the legs (the tokenize-once discipline,
        # one mine up). Built only when the lm3 leg runs: a LONE
        # lm3t section consumes dtri exactly once, where caching it
        # would be pure overhead (review r17 pass 5 — the operator's
        # own unpersisted-in-pinned-mode rule, kept at the host)
        dtri = cache_intermediate(C._doc_trigram_counts(toks, "doc_id"))
    # The three scorers are INDEPENDENT eagerly-materialized operators
    # over the same caches: overlap their checkpoint jobs (guide §2.6,
    # the q61/q62 discipline). Shared cache fills (toks, dtri) are
    # per-partition-locked in the BlockManager, so concurrent
    # consumers compute each block once; plans and rows are unchanged.
    from concurrent.futures import ThreadPoolExecutor

    f_bi = f_lm3 = f_lm3t = None
    with ThreadPoolExecutor(max_workers=3) as pool:
        if want & {"lm", "dsir"}:
            # the two bigram legs are ONE fused operator (shared mine
            # and scoring join) — a single-leg section wall pays the
            # fused cost, the q61 indivisible-suite convention
            f_bi = pool.submit(
                C.bigram_lm_dsir, base, target_pred=pred, toks=toks
            )
        if "lm3" in want:
            f_lm3 = pool.submit(
                C.trigram_lm_scores, None, toks=toks, dtri=dtri
            )
        if "lm3t" in want:
            # reference-trained mode: the model is the '{src0}'
            # in-domain subset — a SLICE of the same cached tokenize
            # (zero extra scans); every document scores under the
            # target LM, the CCNet perplexity-filter regime
            f_lm3t = pool.submit(
                C.trigram_lm_scores,
                None,
                toks=toks,
                ref_toks=toks.where(F.col("_tgt")),
                dtri=dtri,
            )
    if f_bi is not None:
        both = f_bi.result()
        legs.append(
            both.withColumnRenamed("n_bigrams", "n_ngrams").where(
                F.col("section").isin(*sorted(want & {"lm", "dsir"}))
            )
        )
        handles.append(both)
    if f_lm3 is not None:
        lm3 = f_lm3.result()
        legs.append(
            lm3.select(
                F.lit("lm3").alias("section"), "doc_id", "n_ngrams", "score"
            )
        )
        handles.append(lm3)
    if f_lm3t is not None:
        lm3t = f_lm3t.result()
        legs.append(
            lm3t.select(
                F.lit("lm3t").alias("section"), "doc_id", "n_ngrams", "score"
            )
        )
        handles.append(lm3t)
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionAll(leg)
    out = checkpoint_result(u)
    # the q61 union discipline: a caller's single release_result()
    # cannot free a lazy Union over two checkpointed legs, so the
    # union is re-checkpointed (tiny — rows, not tokens) and the leg
    # handles + the shared tokenize cache are freed here
    for h in handles:
        release_result(h)
    if dtri is not None:
        release_intermediate(dtri)
    release_intermediate(toks)
    return out


_VOCAB_TOPK = 50
_VOCAB_CMS_DEPTH = 4
_VOCAB_CMS_WIDTH = 512


def _vocab_oracle() -> str:
    from unimib_simpss_spark.functions.sketches import portable_cell_sql

    cell = [
        portable_cell_sql("tok", j, _VOCAB_CMS_WIDTH)
        for j in range(_VOCAB_CMS_DEPTH)
    ]
    grid_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {cell[j]} AS c, cnt FROM counts"
        for j in range(_VOCAB_CMS_DEPTH)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT tok, {j} AS j, {cell[j]} AS c FROM topk"
        for j in range(_VOCAB_CMS_DEPTH)
    )
    return f"""
    WITH counts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
    ),
    tot AS (SELECT sum(cnt) AS total FROM counts),
    topk AS (
        SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT {_VOCAB_TOPK}
    ),
    cells AS (
        SELECT j, c, sum(cnt) AS cell_cnt FROM ({grid_rows}) GROUP BY j, c
    ),
    probe AS (
        SELECT tok, CAST(min(cell_cnt) AS BIGINT) AS cms_est
        FROM ({probe_rows}) p JOIN cells USING (j, c)
        GROUP BY tok
    )
    SELECT t.tok AS token,
           t.cnt,
           CAST(row_number() OVER (ORDER BY t.cnt DESC, t.tok) AS BIGINT)
               AS rank,
           round(sum(t.cnt) OVER (ORDER BY t.cnt DESC, t.tok
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
                 / (SELECT total FROM tot), 6) AS cum_share,
           probe.cms_est
    FROM topk t JOIN probe ON t.tok = probe.tok
    """


@query("q66_vocab_coverage", oracle=_vocab_oracle())
def q66_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary curve: top-50 tokens with rank,
    cumulative corpus-coverage share, and the portable count-min-sketch
    estimate of the same count on the same row (exact vs fixed-memory
    estimate, value-level oracle-checked — the x67 sketch graduating to
    a hash-verified column). See operators/curation.py vocab_coverage
    for the plan shape and 100 TB notes."""
    return C.vocab_coverage(
        load_table(spark, sf_dir, "documents"),
        topk=_VOCAB_TOPK,
        with_cms=True,
        cms_depth=_VOCAB_CMS_DEPTH,
        cms_width=_VOCAB_CMS_WIDTH,
    )


@query("x67_cms_heavy_hitters")  # fixed-memory sketch estimates → rows-only
def x67_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the document token stream:
    top-20 tokens by CMS estimate from a fixed 4×512-cell grid.
    Overestimate/merge bounds are property-tested in
    tests/test_sketches.py; the exact counterpart is
    q66_vocab_coverage (same stream, exact counts)."""
    from unimib_simpss_spark.functions.sketches import cms_heavy_hitters
    from unimib_simpss_spark.operators.curation import _bound_tokens

    toks = _bound_tokens(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    ).select(F.explode("toks").alias("token"))
    return cms_heavy_hitters(toks, "token", k=20)


@query("x71_kll_quantiles")  # engine-local compaction order → rows-only
def x71_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KLL rank-error quantiles (VERDICT r9 #7) over two
    deliberately different shapes in one tagged union:

    - 'price': lineitem.l_extendedprice per returnflag — the bounded,
      benign distribution (cross-checked against q53's exact
      percentiles by the test suite);
    - 'chars': documents.n_chars per source — the skewed text-length
      distribution where the equi-width histogram's span/bins error
      (hist_quantile, q53) degrades and the rank bound does not.

    Rank-error + merge-order properties live in tests/test_sketches.py;
    no DuckDB twin exists because compaction order is engine-local."""
    from unimib_simpss_spark.functions.sketches import kll_quantiles

    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    price = kll_quantiles(
        load_table(spark, sf_dir, "lineitem"),
        ["l_returnflag"], "l_extendedprice", qs,
    ).select(
        F.lit("price").alias("section"),
        F.col("l_returnflag").alias("key"),
        "n", "p50", "p90", "p99",
    )
    chars = kll_quantiles(
        load_table(spark, sf_dir, "documents"), ["source"], "n_chars", qs
    ).select(
        F.lit("chars").alias("section"),
        F.col("source").alias("key"),
        "n", "p50", "p90", "p99",
    )
    return price.unionAll(chars)


_DUP_N = 6


def _dup_spans_oracle() -> str:
    from unimib_simpss_spark.functions.text import tokens_sql

    tk = tokens_sql("text")
    n = _DUP_N
    return f"""
    WITH tn AS (
        SELECT doc_id, {tk} AS tk FROM documents
    ),
    grams AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(list_slice(tk, i, i + {n - 1}), ' ') AS g
        FROM (SELECT doc_id, tk FROM tn WHERE len(tk) >= {n}) tg,
             LATERAL (SELECT unnest(range(1, len(tk) - {n} + 2)) AS i) s
    ),
    shared AS (
        SELECT g, min(doc_id) AS owner
        FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ),
    dup AS (SELECT doc_id, pos FROM grams JOIN shared USING (g)),
    d1 AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         > {n} THEN 1 ELSE 0 END AS brk
        FROM dup
    ),
    isl AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
        FROM d1
    ),
    spans AS (
        SELECT doc_id, island, count(*) AS gs, max(pos) - min(pos) + {n} AS st
        FROM isl GROUP BY doc_id, island
    ),
    rep AS (
        SELECT doc_id,
               CAST(sum(gs) AS BIGINT) AS n_dup_grams,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(st) AS BIGINT) AS dup_tokens
        FROM spans GROUP BY doc_id
    ),
    lose AS (
        SELECT g2.doc_id, g2.pos FROM grams g2
        JOIN shared sh ON g2.g = sh.g WHERE g2.doc_id <> sh.owner
    ),
    r1 AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         > {n} THEN 1 ELSE 0 END AS brk
        FROM lose
    ),
    risl AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
        FROM r1
    ),
    rspans AS (
        SELECT doc_id, min(pos) AS lo, max(pos) + {n - 1} AS hi
        FROM risl GROUP BY doc_id, island
    ),
    cov AS (SELECT doc_id, unnest(range(lo, hi + 1)) AS p FROM rspans),
    removed AS (
        SELECT doc_id, CAST(sum(hi - lo + 1) AS BIGINT) AS removed_tokens
        FROM rspans GROUP BY doc_id
    ),
    toksx AS (
        SELECT doc_id, i - 1 AS p, tk[i] AS w
        FROM tn, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) s
    ),
    kept AS (
        SELECT t.doc_id, t.p, t.w FROM toksx t
        LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
        WHERE c.p IS NULL
    ),
    rtext AS (
        SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS text
        FROM kept GROUP BY doc_id
    ),
    rew AS (
        SELECT tn.doc_id,
               coalesce(rm.removed_tokens, 0) AS removed_tokens,
               coalesce(rt.text, '') AS text
        FROM tn
        LEFT JOIN removed rm USING (doc_id)
        LEFT JOIN rtext rt USING (doc_id)
    )
    SELECT 'spans' AS section, doc_id, n_dup_grams, n_spans, dup_tokens,
           CAST(NULL AS VARCHAR) AS text
    FROM rep
    UNION ALL
    SELECT 'rewrite' AS section, doc_id,
           CAST(NULL AS BIGINT) AS n_dup_grams,
           CAST(NULL AS BIGINT) AS n_spans,
           removed_tokens AS dup_tokens, text
    FROM rew
    """


@query("q67_dup_spans", oracle=_dup_spans_oracle())
def q67_dup_spans(
    spark: SparkSession, sf_dir: str, sections=None
) -> DataFrame:
    """Exact-substring dedup at n-gram granularity (Lee et al. 2022),
    two legs off ONE positional 6-gram mine: 'spans' is the per-doc
    duplicated-island report (one row per doc sharing a 6-gram with
    another doc), 'rewrite' (VERDICT r17 #1) is the paper's actual
    deliverable — the REWRITTEN corpus with every non-surviving
    occurrence excised at gram boundaries, one row per input document,
    hash-checked VERBATIM against the DuckDB twin (dup_tokens carries
    the leg's token tally: merged-span length in 'spans', removed
    tokens in 'rewrite'). Survivor convention: the lowest-doc_id
    holder of each shared gram keeps it; see
    operators/curation.py: remove_dup_spans for the plan + 100 TB
    notes. Sorts inside the driver's 50-slot window since the q65→q30
    merge; the local parity gate (tests/test_oracle_parity.py) runs
    the same hash compare at sf0.001."""
    from unimib_simpss_spark.operators.caching import (
        cache_intermediate,
        checkpoint_result,
        release_intermediate,
    )
    from unimib_simpss_spark.plans.registry import pick_sections

    want = pick_sections(sections, ("spans", "rewrite"))
    docs = load_table(spark, sf_dir, "documents")
    base, grams = C.dup_gram_relations(docs, n=_DUP_N)
    own = []
    if len(want) == 2:
        # four consumers across the two legs (shared-gram agg + join
        # back, owner agg + join back) — mine once; a single-leg
        # section run stays lazy (two consumers, the operator's
        # shipped shape). base is cached FIRST and the cached grams
        # derive from it (optimization r19): un-cached, the rewrite
        # leg's join-back onto base was a SECOND full corpus scan +
        # tokenize + doc_id exchange next to the cached mine (the
        # interior plan showed two documents scans; now one). The
        # cached fill also tokenizes AFTER the exchange (cores-wide on
        # a single-split corpus; the cache is the pushdown barrier) —
        # the operator's projection-below-exchange form stays as-is
        # for lazy single-leg runs, which need that exchange as the
        # anti-CollapseProject barrier.
        from unimib_simpss_spark.functions.text import tokens as _tk

        base = cache_intermediate(
            docs.select("doc_id", "text")
            .repartition("doc_id")
            .select(F.col("doc_id"), _tk("text").alias("tk"))
        )
        own.append(base)
        _, grams = C.dup_gram_relations(None, n=_DUP_N, base=base)
        grams = cache_intermediate(grams)
        own.append(grams)
    nul = F.lit(None)
    legs = []
    if "spans" in want:
        rep = C.dup_spans(None, n=_DUP_N, grams=grams)
        legs.append(
            rep.select(
                F.lit("spans").alias("section"),
                "doc_id", "n_dup_grams", "n_spans", "dup_tokens",
                nul.cast("string").alias("text"),
            )
        )
    if "rewrite" in want:
        rw = C.remove_dup_spans(None, n=_DUP_N, base=base, grams=grams)
        legs.append(
            rw.select(
                F.lit("rewrite").alias("section"),
                "doc_id",
                nul.cast("long").alias("n_dup_grams"),
                nul.cast("long").alias("n_spans"),
                F.col("removed_tokens").alias("dup_tokens"),
                "text",
            )
        )
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionAll(leg)
    if not own:
        return u
    out = checkpoint_result(u)
    for c in own:
        release_intermediate(c)
    return out

@query("x68_bpe_merges")  # iterative argmax loop → rows-only
def x68_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training at production shape (VERDICT r15 #4),
    two tagged paths over the SAME enriched corpus (documents text ∪
    customer names — the documents fixture alone has 31 word types,
    which exhausts below 140 merges; the id-like names add the
    digit-heavy vocabulary a real tokenizer slogs through):

    - 'driver': 256 merges via bpe_merges_driver — ONE distributed
      word-count job reduces the corpus to the type vocabulary, then
      the exact sequential algorithm with incremental pair updates
      runs on the driver (the production regime whenever the
      vocabulary fits memory, gated by max_vocab_types);
    - 'dist': the first 16 merges via the distributed batched rounds
      (batch=8, vocabulary-sized jobs) — kept in the output so the
      two paths' agreement on the shared prefix is DATA the
      determinism sweep re-checks every round, not just a test.

    Iterative argmax → not SQL-expressible for the driver's oracle;
    sequential-exactness of both paths is parity-tested in
    tests/test_curation.py against the pure-Python reference. The
    learned table's APPLY side is q27's oracle-paired bpe_docs /
    bpe_source legs."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("text")
    )
    corpus = docs.unionAll(cust)
    drv = C.bpe_merges_driver(corpus, n_merges=256).select(
        F.lit("driver").alias("path"), "*"
    )
    dist = C.bpe_merges(
        corpus, n_merges=16, batch=8, vocab_partitions=2
    ).select(F.lit("dist").alias("path"), "*")
    return drv.unionAll(dist)

@query("x80_unigram_vocab")  # EM trainer, iterative → rows-only
def x80_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer training at
    production shape (VERDICT r17 #4) — the prune-under-EM counterpart
    to x68's merge-growing BPE, over the SAME enriched corpus
    (documents text ∪ customer names; the id-like names supply the
    digit-heavy vocabulary). ONE distributed word-count job reduces
    the corpus to the type vocabulary; seeding, the exact
    forward/backward EM, and expected-count pruning run on the driver
    (operators/curation.py: unigram_lm_vocab_driver — Kudo 2018).

    Two tagged sections in one rows-only relation the determinism
    sweep re-checks end-to-end: 'vocab' is the learned (rank, piece,
    logp) table; 'enc' / 'enc_docs' are the APPLY side — the documents
    corpus Viterbi-encoded under the learned table via the Arrow batch
    pass (unigram_encode), summarized as total pieces / docs (encoding
    floats through the mapInPandas boundary stay deterministic because
    the model collects ROUNDED logp). Iterative EM → not
    SQL-expressible for the driver's oracle; the trainer, the lattice
    E-step, and the Viterbi encoder are parity-tested against
    pure-Python enumeration references in tests/test_curation.py."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("text")
    )
    vocab = C.unigram_lm_vocab_driver(
        docs.unionAll(cust), vocab_size=300
    )
    nul_l = F.lit(None).cast("long")
    vleg = vocab.select(
        F.lit("vocab").alias("section"),
        "rank",
        "piece",
        "logp",
        nul_l.alias("n"),
    )
    enc = C.unigram_encode(
        load_table(spark, sf_dir, "documents"), vocab
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_pieces").cast("long").alias("n_pieces"),
    )
    pad = [
        F.lit(None).cast("int").alias("rank"),
        F.lit(None).cast("string").alias("piece"),
        F.lit(None).cast("double").alias("logp"),
    ]
    # both summary rows off ONE evaluation of the encode aggregate (a
    # union of two selects would run the Arrow encode twice)
    eleg = enc.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("enc").alias("section"),
                    F.col("n_pieces").alias("n"),
                ),
                F.struct(
                    F.lit("enc_docs").alias("section"),
                    F.col("n_docs").cast("long").alias("n"),
                ),
            )
        ).alias("e")
    ).select(F.col("e.section").alias("section"), *pad, F.col("e.n").alias("n"))
    return vleg.unionAll(eleg)


@query("x70_quality_classifier")  # iterative GD loop → rows-only
def x70_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine quality-classifier training (CCNet/fastText shape):
    full-batch logistic regression on hashed token-frequency features,
    y = (lang = 'en'), 6 steps — returns the per-iteration mean log
    loss curve. On this corpus lang is independent of the token stream
    (no learnable signal), so the curve descends only toward the
    base-rate entropy — separability, convergence, and determinism are
    property-tested on constructed corpora in tests/test_llm_ops.py;
    see operators/classifier.py for the all-relational GD plan."""
    from unimib_simpss_spark.operators.classifier import logistic_train

    docs = load_table(spark, sf_dir, "documents")
    _, losses = logistic_train(
        docs, label=F.col("lang") == "en", n_features=1024, iters=6, lr=1.0
    )
    return spark.createDataFrame(
        [(i + 1, round(float(l), 6)) for i, l in enumerate(losses)],
        "iter int, logloss double",
    )
