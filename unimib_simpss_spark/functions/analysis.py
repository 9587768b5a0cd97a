"""Text-analysis expressions for the LLM-data pipeline: language-ID,
quality scoring, token counting, and rolling-hash fingerprints.

Like :mod:`~unimib_simpss_spark.functions.text`, every expression is
produced twice from the SAME constants — a Spark ``Column`` (built-in
functions only, whole-stage codegen, no Python in the row path) and a
DuckDB SQL string — so the driver's oracle can verify it bit-for-bit.

The reference (PCampi/unimib-simpss) has no text surface at all; these
are [EXT] operators demanded by the driver contract, built to be
per-row/stateless so they scale embarrassingly-parallel to 100 TB.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import Column
from pyspark.sql import functions as F

from unimib_simpss_spark.functions.hashing import MERSENNE_31, hash64
from unimib_simpss_spark.functions.text import tokens, tokens_sql

# ----------------------------------------------------------------- constants
# Character-trigram markers per language (ASCII only, leading space = word
# boundary). Chained-CASE order below is the deterministic tie-break.
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "ing", " an"),
    "es": (" de", "que", " el", " la"),
    "de": ("der", "ein", "sch", "und"),
    "fr": (" le", "les", " et", "ent"),
    "it": (" di", "che", " il", "zio"),
}
LANG_UNKNOWN = "und"

# Common-English stopwords for the quality heuristic.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "to", "and", "in", "is", "that", "it",
    "for", "on", "with", "as", "was", "at", "by", "this", "are", "or",
)

# BPE-ish pre-tokenizer: letter runs | digit runs | single symbol.
# Same regex semantics in Java (Spark) and RE2-ish (DuckDB).
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r]"
WS_SPLIT_RE = "\\s+"
PUNCT_RE = "[^a-zA-Z0-9 \\t\\n\\r]"

# Rolling polynomial hash: acc = (acc*B + h(token)) mod 2^31-1.
ROLLING_BASE = 1_000_003


from unimib_simpss_spark.functions.common import col_of as _c  # noqa: E402


# ------------------------------------------------------------ token counting
def token_count_ws(col: Column | str) -> Column:
    """Whitespace-delimited token count."""
    return F.size(F.filter(F.split(_c(col), WS_SPLIT_RE), lambda t: t != "")).cast(
        "long"
    )


def token_count_ws_sql(expr: str) -> str:
    return (
        f"CAST(len(list_filter(string_split_regex({expr}, '{WS_SPLIT_RE}'),"
        " t -> t <> '')) AS BIGINT)"
    )


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish pre-token count (letter runs / digit runs / symbols)."""
    return F.regexp_count(_c(col), F.lit(BPE_TOKEN_RE)).cast("long")


def token_count_bpe_sql(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{BPE_TOKEN_RE}')) AS BIGINT)"


# ------------------------------------------------------------- language ID
def _occurrences(text: Column, gram: str) -> Column:
    """Occurrence count of a literal n-gram via length differencing
    (JVM-side; no regex engine in the loop)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(gram)))) / len(gram)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-trigram occurrence totals over lowercased text."""
    t = F.lower(_c(col))
    return {
        lang: functools.reduce(
            _op.add, (_occurrences(t, g) for g in grams)
        ).cast("long")
        for lang, grams in LANG_TRIGRAMS.items()
    }


def lang_id(col: Column | str) -> tuple[Column, Column]:
    """(predicted_language, best_score): argmax of marker-trigram counts,
    ties broken by LANG_TRIGRAMS declaration order; all-zero → 'und'."""
    scores = lang_scores(col)
    langs = list(LANG_TRIGRAMS)
    best = F.greatest(*scores.values()) if len(scores) > 1 else scores[langs[0]]
    pred = F.when(best <= 0, F.lit(LANG_UNKNOWN))
    for lang in langs:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return pred.otherwise(F.lit(LANG_UNKNOWN)), best


def _occurrences_sql(texpr: str, gram: str) -> str:
    g = gram.replace("'", "''")
    return f"((length({texpr}) - length(replace({texpr}, '{g}', ''))) // {len(gram)})"


def lang_id_sql(expr: str) -> tuple[str, str]:
    """(pred_sql, best_score_sql) — DuckDB twins of :func:`lang_id`."""
    texpr = f"lower({expr})"
    score = {
        lang: "(" + " + ".join(_occurrences_sql(texpr, g) for g in grams) + ")"
        for lang, grams in LANG_TRIGRAMS.items()
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    whens = " ".join(
        f"WHEN {score[lang]} = {best} THEN '{lang}'" for lang in LANG_TRIGRAMS
    )
    pred = (
        f"CASE WHEN {best} <= 0 THEN '{LANG_UNKNOWN}' {whens} "
        f"ELSE '{LANG_UNKNOWN}' END"
    )
    return pred, f"CAST({best} AS BIGINT)"


# ----------------------------------------------------------- quality scoring
def quality_components(col: Column | str) -> dict[str, Column]:
    """n_tokens, stopword ratio, punctuation ratio, mean token length.

    Convenience form re-deriving ``tokens()`` per component (~4×/row);
    hot paths project tokens once and use
    :func:`quality_components_from_tokens`."""
    c = _c(col)
    return quality_components_from_tokens(tokens(c), c)


def quality_components_from_tokens(tk: Column, raw: Column) -> dict[str, Column]:
    """Quality components from a pre-tokenized array column plus the raw
    text column (punctuation/char ratios need the original string)."""
    n_tok = F.size(tk)
    stop_hits = F.size(F.filter(tk, lambda t: t.isin(*STOPWORDS)))
    tok_chars = F.aggregate(tk, F.lit(0), lambda acc, t: acc + F.length(t))
    n_chars = F.length(raw)
    punct = F.regexp_count(raw, F.lit(PUNCT_RE))
    return {
        "n_tokens": n_tok.cast("long"),
        "stop_ratio": F.round(stop_hits / F.nullif(n_tok, F.lit(0)), 4),
        "punct_ratio": F.round(punct / F.nullif(n_chars, F.lit(0)), 4),
        "mean_tok_len": F.round(tok_chars / F.nullif(n_tok, F.lit(0)), 4),
    }


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality: length saturation + stopword mass −
    punctuation noise. Heuristic, but deterministic and oracle-twinned."""
    return quality_score_from_components(quality_components(col))


def quality_score_from_components(c: dict[str, Column]) -> Column:
    """Composite quality from an already-built components dict — lets a
    one-scan profile query share the component expressions."""
    n_tok = c["n_tokens"].cast("double")
    score = (
        0.4 * F.least(n_tok / 80.0, F.lit(1.0))
        + 0.35 * F.least(c["stop_ratio"] * 4.0, F.lit(1.0))
        + 0.25 * (1.0 - F.least(c["punct_ratio"] * 8.0, F.lit(1.0)))
    )
    return F.round(score, 4)


def quality_components_sql(expr: str) -> dict[str, str]:
    tk = tokens_sql(expr)
    n_tok = f"len({tk})"
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    stop_hits = f"len(list_filter({tk}, t -> t IN ({stops})))"
    tok_chars = f"list_sum(list_transform({tk}, t -> length(t)))"
    punct = f"len(regexp_extract_all({expr}, '{PUNCT_RE}'))"
    return {
        "n_tokens": f"CAST({n_tok} AS BIGINT)",
        "stop_ratio": f"round({stop_hits} / nullif({n_tok}, 0)::DOUBLE, 4)",
        "punct_ratio": f"round({punct} / nullif(length({expr}), 0)::DOUBLE, 4)",
        "mean_tok_len": f"round({tok_chars} / nullif({n_tok}, 0)::DOUBLE, 4)",
    }


def quality_score_sql(expr: str) -> str:
    c = quality_components_sql(expr)
    return (
        f"round(0.4 * least({c['n_tokens']} / 80.0, 1.0)"
        f" + 0.35 * least({c['stop_ratio']} * 4.0, 1.0)"
        f" + 0.25 * (1.0 - least({c['punct_ratio']} * 8.0, 1.0)), 4)"
    )


# ------------------------------------------------ repetition (Gopher-style)
# Thresholds picked from the synthetic-corpus distributions (measured at
# sf0.001/0.01/0.1: top-token frac p50≈0.09, p90≈0.14; dup-2gram p90≈0.065;
# dup-3gram p95≈0.011) so both pass/fail classes are populated at every
# scale. Real deployments tune these per corpus, as Gopher does
# (Rae et al. 2021 use duplicate line/paragraph fractions; this corpus is
# single-line, so the token-level analogues are used).
REPETITION_MAX_TOP_TOKEN_FRAC = 0.125
REPETITION_MAX_DUP_2GRAM_FRAC = 0.06
REPETITION_MAX_DUP_3GRAM_FRAC = 0.01


def repetition_components(col: Column | str) -> dict[str, Column]:
    """Gopher-style repetition metrics over raw text — convenience
    wrapper around :func:`repetition_components_from_tokens`.

    PERF: this form re-tokenizes inside every nested HOF lambda (lambda
    scopes defeat common-subexpression elimination — measured 12× slower
    at sf0.1). Hot paths should tokenize into a column first, put an
    exchange/persist barrier behind it, and call the ``_from_tokens``
    variant — see ``plans/llm_text.py:q29_doc_profile``.
    """
    return repetition_components_from_tokens(tokens(col))


def repetition_components_from_tokens(tk: Column) -> dict[str, Column]:
    """Gopher-style repetition metrics from a pre-tokenized array
    column, all pure Column expressions (per-row, shuffle-free — scales
    linearly):

    - ``top_token_frac``: occurrences of the most frequent token / total
      tokens (the token-level analogue of Gopher's duplicate-line
      fraction for single-line corpora).
    - ``dup_2gram_frac`` / ``dup_3gram_frac``: 1 − distinct/total
      n-grams — mass of repeated word n-grams.

    All rounded to 6 so the DuckDB twin hashes bit-for-bit.
    """
    n = F.size(tk)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(tk), lambda x: F.size(F.filter(tk, lambda y: y == x))
        )
    )
    out = {
        "top_token_frac": F.when(
            n > 0, F.round(top_cnt.cast("double") / n, 6)
        ).otherwise(F.lit(0.0))
    }
    def _gram_at(g: int):
        # closure factory, NOT a default-arg lambda: Spark picks the HOF
        # variant by lambda arity, so `lambda i, g=g` would bind the
        # 2-param (element, index) transform and break the expression
        return lambda i: F.array_join(F.slice(tk, i, g), " ")

    for g in (2, 3):
        total = n - (g - 1)
        uniq = F.size(
            F.array_distinct(F.transform(F.sequence(F.lit(1), total), _gram_at(g)))
        )
        out[f"dup_{g}gram_frac"] = F.when(
            n >= g, F.round(F.lit(1.0) - uniq.cast("double") / total, 6)
        ).otherwise(F.lit(0.0))
    return out


def repetition_components_sql(expr: str) -> dict[str, str]:
    """DuckDB SQL twins of :func:`repetition_components` (token array
    bound once via a scalar subquery, same trick as the combo hashes)."""
    tk = tokens_sql(expr)
    top = (
        f"(SELECT CASE WHEN len(tk) > 0 THEN "
        f"round(list_max(list_transform(list_distinct(tk), "
        f"x -> len(list_filter(tk, y -> y = x))))::DOUBLE / len(tk), 6) "
        f"ELSE 0.0 END FROM (SELECT {tk} AS tk))"
    )
    out = {"top_token_frac": top}
    for g in (2, 3):
        out[f"dup_{g}gram_frac"] = (
            f"(SELECT CASE WHEN len(tk) >= {g} THEN "
            f"round(1.0 - len(list_distinct(list_transform("
            f"range(1, len(tk) - {g - 2}), "
            f"i -> array_to_string(list_slice(tk, i, i + {g - 1}), ' '))))::DOUBLE "
            f"/ (len(tk) - {g - 1}), 6) "
            f"ELSE 0.0 END FROM (SELECT {tk} AS tk))"
        )
    return out


# ------------------------------------------------- rolling-hash fingerprint
def rolling_fingerprint(col: Column | str) -> Column:
    """Order-sensitive polynomial rolling hash over the token sequence:
    acc = (acc*B + h64(token) mod P) mod P. One pass, no shuffle."""
    return rolling_fingerprint_from_tokens(tokens(col))


def rolling_fingerprint_from_tokens(tk: Column) -> Column:
    """Rolling hash from a pre-tokenized array column."""
    hs = F.transform(tk, lambda t: hash64(t) % MERSENNE_31)
    return F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_BASE + x) % MERSENNE_31,
    )


def rolling_fingerprint_sql(expr: str) -> str:
    hs = (
        f"list_transform({tokens_sql(expr)}, "
        f"t -> (('0x' || substring(md5(t), 1, 15))::BIGINT) % {MERSENNE_31})"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hs}), "
        f"(acc, x) -> (acc * {ROLLING_BASE} + x) % {MERSENNE_31})"
    )


# ------------------------------------------------- order-independent avg
AVG_SCALE = 1_000_000


def exact_avg(col: Column | str, ndigits: int = 4) -> Column:
    """Cross-engine order-independent average of a double column,
    rounded to ``ndigits`` in INTEGER arithmetic.

    Two distinct float traps make plain ``round(avg(value), n)``
    engine-divergent (both observed on q23/q55: green at sf0.01, red at
    sf0.1):

    - ``avg(double)`` is float summation in accumulation order — the
      engines can differ in the last ulp;
    - even on an IDENTICAL exact mean, ``round`` itself splits at a
      decimal boundary: for 51.51125 Spark rounds the shortest decimal
      string (BigDecimal HALF_UP → 51.5113) while DuckDB rounds the
      binary double, which sits just below the boundary (→ 51.5112).

    So both the sum AND the rounding run on exact integers: sum
    ``round(value × 1e6)`` as longs, then half-up at digit ``ndigits``
    via ``floor((S + half·n) / (div·n))`` — every operand is an exact
    integer-valued double well under 2^53 in both engines — and one
    final division by ``10^ndigits`` (identical IEEE op both sides).
    Quantizes input at 1e-6, invisible at report precision; halves
    round UP (toward +inf) by definition of this op on both engines.
    Must be paired with :func:`exact_avg_sql` (same constants, same
    operation order).

    INPUT-PRECISION ASSUMPTION: the quantization step itself
    (``round(value × 1e6)``) is the one remaining raw-double round, and
    Spark (shortest-decimal BigDecimal HALF_UP) and DuckDB (binary
    double) can disagree on it ONLY when ``value × 1e6`` lands within
    an ulp of a ``.5`` boundary — i.e. when the input is quantized at
    5e-7 or finer. This holds as long as input values are generated or
    stored on a grid coarser than 1e-6 (the driver's testdata is
    2-decimal: max |value×1e6 − nearest int| measured 6e-8 at sf0.1,
    nowhere near 0.5). Feeding full-precision doubles voids the
    cross-engine guarantee at the 1e-6 digit — re-quantize upstream or
    raise AVG_SCALE if that ever matters.
    """
    div = AVG_SCALE // 10**ndigits
    if div < 1:
        raise ValueError(f"ndigits={ndigits} exceeds AVG_SCALE precision")
    scaled = F.round(_c(col) * AVG_SCALE).cast("long")
    n = F.count(F.lit(1))
    units = F.floor(
        (F.sum(scaled).cast("double") + (div / 2) * n) / (div * n)
    )
    return units.cast("double") / (10**ndigits)


def exact_avg_sql(expr: str, ndigits: int = 4) -> str:
    """DuckDB twin of :func:`exact_avg` — identical constants and op
    order."""
    div = AVG_SCALE // 10**ndigits
    return (
        f"(CAST(floor((CAST(sum(CAST(round({expr} * {AVG_SCALE}) AS BIGINT)) AS DOUBLE)"
        f" + {div / 2} * count(*)) / ({div} * count(*))) AS DOUBLE)"
        f" / {10**ndigits})"
    )
