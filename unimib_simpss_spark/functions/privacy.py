"""PII handling for training-data curation (SURVEY.md §2.7 [EXT]).

Training pipelines scrub direct identifiers before a corpus ships:
join-preserving pseudonymization (stable hash tokens so references
still link up), pattern redaction (digit runs, the id-shaped part of a
name/handle), the structured scrub (email / phone / IPv4 / IPv6 →
class-preserving placeholders + a per-class count profile — the
CCNet/RefinedWeb PII pass, VERDICT r16 #4), and a k-anonymity pass
over quasi-identifier combinations
(suppress groups smaller than k — the classic re-identification guard).

Everything here is a pure Column expression — JVM-side, whole-stage
codegen, zero Python in the hot path — so the same code runs unchanged
over 100 TB. The only aggregation (k-anonymity group sizing) is one
map-side-combinable groupBy.

The reference (PCampi/unimib-simpss) carries raw sensor ids end-to-end
(mqtt_kafka_producer.py:198-206 enriches but never masks); this module
is the [EXT] scrub stage a corpus pipeline inserts at that same
enrichment point before anything persists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


from unimib_simpss_spark.functions.common import (  # noqa: E402
    col_of as _c,
    sql_quote as _q,
)


# --------------------------------------------- structured-PII patterns
# The CCNet/RefinedWeb-style structured scrub beyond digit runs:
# email, phone, IPv4, IPv6 — each with a class-preserving placeholder
# so downstream stats can still count "document mentions an email"
# after the scrub. All four patterns follow the cross-engine regex
# discipline of functions/cleaning.py (Java Pattern on the Spark side,
# RE2 in the DuckDB oracle): explicit ASCII classes (no \\s/\\d/\\w
# shorthands), \\b word boundaries (ASCII in both engines), and NO
# lookarounds — RE2 has none, so every guard here is structural.
# Shape-based, not value-validated: '999.999.999.999' scrubs as an
# IPv4-shaped string, which is the right bias for a privacy pass.

# local@domain.tld with a letters-only TLD — 'user@192.168.1.1' is NOT
# an email match (numeric TLD), so the host falls through to the IPv4
# rule and scrubs as 'user@[IP4]'.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

# Three documented phone shapes (alternation is leftmost-first in both
# engines): parenthesized area code, +international, and the
# separator-required NNN-NNN-NNNN. Bare digit runs ('5551234567') are
# deliberately NOT matched — they are redact_digits' domain, and a
# separator-free rule would eat years/ISBNs/order ids. Dates survive:
# '2023-08-16' is 4-2-2, the dashed rule requires 3-3-4.
PHONE_RE = (
    "\\([0-9]{2,4}\\)[ .-]?[0-9]{2,4}([ .-]?[0-9]{2,4}){1,3}\\b"
    "|\\+[0-9]{1,3}([ .-]?[0-9]{2,4}){2,5}\\b"
    "|\\b[0-9]{3}[.-][0-9]{3}[.-][0-9]{4}\\b"
)

# Dotted quad. The trailing \\b rejects a 4+-digit last group, so
# version strings like '10.1.2.3000' stay; '1.2.3.4.5' scrubs its
# leftmost quad (documented: shape-based).
IPV4_RE = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

# IPv6: the full 8-group form plus the three '::'-compressed forms.
# Every compressed alternative requires a LITERAL '::', so times
# ('12:30:45') and MAC addresses (6 groups, no '::') never match; the
# residual false-positive class is hex-named C++ paths ('cafe::babe'),
# accepted and documented. No trailing \\b on the trailing-'::' form
# (':' is a non-word char, \\b would mis-anchor).
_H = "[0-9A-Fa-f]{1,4}"
IPV6_RE = (
    f"\\b({_H}:){{7}}{_H}\\b"
    f"|\\b({_H}:){{1,6}}(:{_H}){{1,6}}\\b"
    f"|\\b({_H}:){{1,7}}:"
    f"|::{_H}(:{_H}){{0,6}}\\b"
)

# Scrub order is part of the contract: emails first (so 'user@host'
# consumes its host before the IP rules see it… except numeric hosts,
# which the email rule deliberately rejects), then IPv4 BEFORE IPv6 —
# an IPv4-mapped '::ffff:1.2.3.4' must lose its dotted-quad TAIL
# first ('::ffff:[IP4]', then the IPv6 rule takes the '::ffff'
# prefix → '[IP6]:[IP4]'); with IPv6 first, its rule consumes only
# '::ffff:1' and the un-matchable remainder '.2.3.4' leaks three
# octets (review r17 pass 1, DuckDB-verified). A pure IPv6 address
# carries no dots, so the IPv4 rule never bites it. Phones run last
# (the digit-greedy rule must never see IP octets). Idempotence is
# STRUCTURAL, not digit-free: [IP4]/[IP6] do contain a digit, but
# every rule requires a run the placeholders cannot seed (emails an
# '@', IPv4 three dots, IPv6 a hex:hex pair or '::', phones a '+',
# '(' or a \b-anchored 3-digit run — ']4'/'']6' can anchor none of
# them); pinned by the idempotence test over every hostile case.
_SCRUB_CHAIN: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "[EMAIL]"),
    (IPV4_RE, "[IP4]"),
    (IPV6_RE, "[IP6]"),
    (PHONE_RE, "[PHONE]"),
)

_PII_CLASSES: tuple[tuple[str, str], ...] = (
    ("emails", EMAIL_RE),
    ("phones", PHONE_RE),
    ("ipv4", IPV4_RE),
    ("ipv6", IPV6_RE),
)


def redact_emails(col: Column | str, token: str = "[EMAIL]") -> Column:
    """Replace every email-shaped run with a class token."""
    return F.regexp_replace(_c(col), EMAIL_RE, token)


def redact_emails_sql(expr: str, token: str = "[EMAIL]") -> str:
    return f"regexp_replace({expr}, {_q(EMAIL_RE)}, {_q(token)}, 'g')"


def redact_phones(col: Column | str, token: str = "[PHONE]") -> Column:
    """Replace every phone-shaped run (see :data:`PHONE_RE` for the
    three documented shapes) with a class token."""
    return F.regexp_replace(_c(col), PHONE_RE, token)


def redact_phones_sql(expr: str, token: str = "[PHONE]") -> str:
    return f"regexp_replace({expr}, {_q(PHONE_RE)}, {_q(token)}, 'g')"


def redact_ipv4(col: Column | str, token: str = "[IP4]") -> Column:
    """Replace every dotted-quad run with a class token."""
    return F.regexp_replace(_c(col), IPV4_RE, token)


def redact_ipv4_sql(expr: str, token: str = "[IP4]") -> str:
    return f"regexp_replace({expr}, {_q(IPV4_RE)}, {_q(token)}, 'g')"


def redact_ipv6(col: Column | str, token: str = "[IP6]") -> Column:
    """Replace every IPv6-shaped run with a class token."""
    return F.regexp_replace(_c(col), IPV6_RE, token)


def redact_ipv6_sql(expr: str, token: str = "[IP6]") -> str:
    return f"regexp_replace({expr}, {_q(IPV6_RE)}, {_q(token)}, 'g')"


def scrub_pii(col: Column | str) -> Column:
    """The composed structured scrub: email → IPv4 → IPv6 → phone,
    each class to its own placeholder (order documented at
    :data:`_SCRUB_CHAIN`). Pure ``regexp_replace`` chain — JVM-side,
    whole-stage codegen, zero Python, zero shuffles; at 100 TB this
    rides the same projection as tokenization. Digit-run redaction
    (:func:`redact_digits`) stays a separate, stricter pass a caller
    applies after this one when bare numbers must go too."""
    out = _c(col)
    for pat, token in _SCRUB_CHAIN:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_pii_sql(expr: str) -> str:
    """DuckDB twin of :func:`scrub_pii` — same constants, same order."""
    for pat, token in _SCRUB_CHAIN:
        expr = f"regexp_replace({expr}, {_q(pat)}, {_q(token)}, 'g')"
    return expr


def pii_class_counts(col: Column | str) -> dict[str, Column]:
    """Per-class match counts over the RAW text (the scrub audit
    profile): ``{'emails','phones','ipv4','ipv6'} -> long``. Counted
    independently per pattern, before any redaction — a host inside an
    IPv4-mapped IPv6 counts under both classes (documented; the scrub
    chain, not the counter, owns precedence)."""
    c = _c(col)
    return {
        name: F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat in _PII_CLASSES
    }


def pii_class_counts_sql(expr: str) -> dict[str, str]:
    """DuckDB twin of :func:`pii_class_counts` (RE2 counts the same
    non-overlapping leftmost matches)."""
    return {
        name: f"CAST(len(regexp_extract_all({expr}, {_q(pat)})) AS BIGINT)"
        for name, pat in _PII_CLASSES
    }


def pseudonym(col: Column | str, length: int = 16) -> Column:
    """Join-preserving pseudonym: prefix of sha256 hex of the value.

    Deterministic, so the same identifier maps to the same token in
    every table it appears in — joins keep working after the scrub.
    16 hex chars = 64 bits; collision odds are negligible below ~10^9
    distinct identities (birthday bound).
    """
    return F.substring(F.sha2(F.col(col) if isinstance(col, str) else col, 256), 1, length)


def redact_digits(col: Column | str, token: str = "[ID]") -> Column:
    """Replace every digit run with a redaction token.

    Collapses each maximal ``[0-9]+`` run to one token (idempotent:
    re-running redaction is a no-op because the token has no digits).
    """
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, "[0-9]+", token)


def digit_count(col: Column | str) -> Column:
    """Number of digit characters — the redaction audit metric."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))).cast("long")


def kanon_groups(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination.

    Returns one row per distinct quasi-identifier tuple with its group
    size and ``suppressed = 1`` where the group is smaller than ``k``
    (publishable only after suppression or generalization). One
    map-side-combinable shuffle; output cardinality is the number of
    distinct quasi-identifier tuples, not rows — tiny at any scale.
    """
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_n"),
        (F.count(F.lit(1)) < F.lit(k)).cast("long").alias("suppressed"),
    )


def ldiversity_groups(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_min: int = 3,
    t_max: float = 0.25,
    ndigits: int = 6,
) -> DataFrame:
    """l-diversity + t-closeness audit — the two gates that catch what
    k-anonymity misses. A group can be large (k-anonymous) yet leak:
    if everyone in it shares one sensitive value, membership alone
    discloses it (homogeneity attack — distinct l-diversity, Machanavajjhala
    et al. 2007); and a skewed-but-diverse group still narrows the
    sensitive value against the corpus prior (t-closeness, Li et al.
    2007 — here the total-variation distance between the group's
    sensitive distribution and the global one, the categorical EMD).

    Returns one row per distinct quasi-identifier tuple:

    - ``group_n``: group size (the k-anonymity count);
    - ``distinct_l``: distinct sensitive values in the group;
    - ``entropy``: Shannon entropy (nats) of the group's sensitive
      distribution — entropy l-diversity holds iff entropy >= ln(l);
      computed as ``ln(n) - sum(c*ln(c))/n`` (ONE combinable
      aggregate, no per-row ratio join — a SQL twin must mirror this
      exact form);
    - ``tv_dist``: 0.5 * Σ |p_group - p_global| over ALL sensitive
      values (absent values count at p_group = 0);
    - ``suppressed = 1`` where ``distinct_l < l_min`` OR
      ``tv_dist > t_max`` — the publish/suppress verdict.

    Rows with a NULL sensitive value are excluded (an unknown value
    neither diversifies nor discloses), and so are rows with any NULL
    quasi key (the distribution_drift_by convention — equi-joins on
    the quasi tuple would silently drop such groups halfway through
    the arithmetic otherwise; audit NULL quasi keys with a row rule
    first). Scale shape: one
    map-side-combinable (quasi, sensitive) count — the only pass over
    data — then all arithmetic on the groups × |sensitive| relation
    with the |sensitive|-sized global distribution broadcast; output
    cardinality is distinct quasi tuples.
    """
    if l_min < 1:
        raise ValueError(f"l_min must be >= 1, got {l_min}")
    s = F.col(sensitive_col)
    keep = s.isNotNull()
    for qc in quasi_cols:
        keep = keep & F.col(qc).isNotNull()
    cell = (
        df.where(keep)
        .groupBy(*quasi_cols, sensitive_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return ldiversity_from_cell(
        cell, quasi_cols, sensitive_col, l_min, t_max, ndigits
    )


def ldiversity_from_cell(
    cell: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_min: int = 3,
    t_max: float = 0.25,
    ndigits: int = 6,
) -> DataFrame:
    """:func:`ldiversity_groups`'s arithmetic over an already-counted
    ``(quasi..., sensitive, _c)`` cell relation — the count-preserving
    entry point (the ``drift_metrics_from_counts`` discipline): cell
    counts are ADDITIVE, so a streaming additive sink folding
    (quasi, sensitive) counts replays through here and is guaranteed
    the SAME rows the batch operator emits for the same data."""
    if l_min < 1:
        raise ValueError(f"l_min must be >= 1, got {l_min}")
    per_group = cell.groupBy(*quasi_cols).agg(
        F.sum("_c").alias("group_n"),
        F.count(F.lit(1)).alias("distinct_l"),
        F.round(
            F.log(F.sum("_c").cast("double"))
            - F.sum(F.col("_c").cast("double") * F.log(F.col("_c").cast("double")))
            / F.sum("_c").cast("double"),
            ndigits,
        ).alias("entropy"),
    )
    glob = cell.groupBy(sensitive_col).agg(F.sum("_c").alias("_gc"))
    tot = cell.agg(F.sum("_c").alias("_n"))
    frame = (
        per_group.select(*quasi_cols)
        .crossJoin(F.broadcast(glob.join(tot, how="cross")))
        .join(cell, [*quasi_cols, sensitive_col], "left")
        .withColumn("_c", F.coalesce("_c", F.lit(0)))
    )
    tv = (
        frame.join(
            per_group.select(*quasi_cols, "group_n"), quasi_cols
        )
        .groupBy(*quasi_cols)
        .agg(
            F.round(
                F.lit(0.5)
                * F.sum(
                    F.abs(
                        F.col("_c").cast("double") / F.col("group_n")
                        - F.col("_gc").cast("double") / F.col("_n")
                    )
                ),
                ndigits,
            ).alias("tv_dist")
        )
    )
    return per_group.join(tv, quasi_cols).select(
        *quasi_cols,
        "group_n",
        "distinct_l",
        "entropy",
        "tv_dist",
        (
            (F.col("distinct_l") < F.lit(l_min))
            | (F.col("tv_dist") > F.lit(float(t_max)))
        )
        .cast("long")
        .alias("suppressed"),
    )
