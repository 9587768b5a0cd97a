"""Text-cleaning expressions for the LLM-data pipeline — the
CCNet/RefinedWeb-style normalization stage UPSTREAM of every dedup,
drift, and quality gate this engine already has: unicode
compatibility folding, control/zero-width stripping, URL and
HTML-tag stripping, whitespace collapsing, and a cleanliness
profile.

Like :mod:`~unimib_simpss_spark.functions.analysis`, every expression
is produced twice from the SAME constants — a Spark ``Column``
(built-in functions only: ``translate``/``replace``/
``regexp_replace`` chains, whole-stage codegen, no Python in the row
path) and a DuckDB SQL string — so the driver's oracle verifies the
CLEANED TEXT verbatim, not just summary counts.

Cross-engine regex discipline (Java ``Pattern`` on the Spark side,
RE2 on the DuckDB side):

- NO ``\\s``/``\\S`` shorthands — Java's ASCII ``\\s`` includes
  ``\\x0B`` (vertical tab), RE2's does not, so a URL abutting a
  vertical tab would strip differently. Explicit classes only.
- Code points above ``\\xFF`` are written ``\\x{2026}`` — the one
  hex-escape syntax BOTH engines parse (RE2 has no ``\\uXXXX``).
- DuckDB ``regexp_replace`` replaces the FIRST match unless the
  ``'g'`` flag is passed; every SQL twin passes it.

The fold table is the high-frequency, deterministically-1:1 subset
of NFKC (typographic quotes/dashes/spaces, fullwidth ASCII,
f-ligatures, ellipsis) — full NFKC needs ICU tables no SQL twin can
mirror; what's here covers the classes web corpora actually hit.
The reference (PCampi/unimib-simpss) has no text surface; this is
[EXT] per-row/stateless work that scales embarrassingly-parallel.

Everything here is per-row and order-free: at 100 TB the whole
family runs inside the same projection as tokenization, adds zero
shuffles, and the counts aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "fold_unicode",
    "fold_unicode_sql",
    "strip_control",
    "strip_control_sql",
    "strip_urls",
    "strip_urls_sql",
    "strip_html",
    "strip_html_sql",
    "collapse_whitespace",
    "collapse_whitespace_sql",
    "clean_text",
    "clean_text_sql",
    "cleanliness_components",
    "cleanliness_components_sql",
    "filter_lines",
    "filter_lines_sql",
    "dedup_lines",
    "dedup_lines_sql",
    "clean_document",
    "clean_document_sql",
]


from unimib_simpss_spark.functions.common import (  # noqa: E402
    col_of as _c,
    sql_quote as _q,
)


# ------------------------------------------------------------ fold tables
# 1:1 code-point folds, applied via translate() (code-point-wise in
# DuckDB; UTF-16-unit-wise in Spark — identical for these BMP chars,
# and surrogate pairs pass through untouched, so astral chars like
# emoji are never corrupted).
_FOLD_1TO1: tuple[tuple[str, str], ...] = (
    # typographic single quotes → apostrophe
    ("‘", "'"), ("’", "'"), ("‚", "'"), ("‛", "'"),
    # typographic double quotes → quotation mark
    ("“", '"'), ("”", '"'), ("„", '"'), ("‟", '"'),
    # dashes and minus → hyphen-minus
    ("–", "-"), ("—", "-"), ("―", "-"), ("−", "-"),
    # exotic spaces → space (NBSP, en/em/thin/etc, narrow NBSP,
    # medium math space, ideographic space)
    (" ", " "),
    *((" ", " "), (" ", " "), (" ", " "), (" ", " "),
      (" ", " "), (" ", " "), (" ", " "), (" ", " "),
      (" ", " "), (" ", " "), (" ", " ")),
    (" ", " "), (" ", " "), ("　", " "),
) + tuple(
    # fullwidth ASCII ！..～ → ! .. ~ (U+FF01-U+FF5E is a pure offset
    # image of U+0021-U+007E)
    (chr(0xFF01 + i), chr(0x21 + i)) for i in range(94)
)
_FOLD_FROM = "".join(a for a, _ in _FOLD_1TO1)
_FOLD_TO = "".join(b for _, b in _FOLD_1TO1)

# one-to-many folds, applied via a replace() chain (order is part of
# the contract — both engines apply the same sequence)
_FOLD_MULTI: tuple[tuple[str, str], ...] = (
    ("…", "..."),  # ellipsis
    ("ﬀ", "ff"), ("ﬁ", "fi"), ("ﬂ", "fl"),
    ("ﬃ", "ffi"), ("ﬄ", "ffl"),  # f-ligatures
    ("™", "TM"), ("℠", "SM"),  # ™ ℠ (NFKC folds both)
)

# Control + zero-width + BOM/soft-hyphen strip class. Keeps \t \n \r.
# C0 (minus tab/newline/CR), DEL, C1, soft hyphen, zero-widths
# (ZWSP/ZWNJ/ZWJ), word joiner, BOM/ZWNBSP.
CONTROL_ZW_RE = (
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F"
    "\\x{0080}-\\x{009F}\\x{00AD}"
    "\\x{200B}-\\x{200D}\\x{2060}\\x{FEFF}]"
)

# URL: scheme'd or www.-led run of non-whitespace (explicit class —
# see the module docstring on \s). Case-insensitive scheme via an
# inline group, identical syntax both engines. The stop class also
# includes the exotic spaces and zero-widths the unicode fold maps
# later in the pipeline (NBSP, U+2000-200A, narrow NBSP, medium math
# space, ideographic space, ZWSP/ZWNJ/ZWJ, BOM): URLs are stripped
# BEFORE the fold, and a URL abutting an NBSP-joined word would
# otherwise swallow the legitimate text after it (review r16 pass 1).
URL_RE = (
    "(?i)(https?://|www\\.)"
    "[^ \\t\\n\\r\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F"
    "\\x{0080}-\\x{009F}\\x{00A0}\\x{00AD}"
    "\\x{2000}-\\x{200D}\\x{2028}\\x{2029}\\x{202F}\\x{205F}"
    "\\x{2060}\\x{3000}\\x{FEFF}]+"
)

# HTML tag: requires a letter, '/', or '!' after '<', so math like
# "3 < 4 and 5 > 2" survives. [^>]* spans newlines in both engines
# (negated classes match \n without any flag).
HTML_TAG_RE = "</?[a-zA-Z!][^>]*>"

# Entity decode chain, applied AFTER tag stripping; &amp; is decoded
# LAST so "&amp;lt;" becomes "&lt;" (one level), never "<".
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
)

_CRLF: tuple[tuple[str, str], ...] = (
    ("\r\n", "\n"),
    ("\r", "\n"),
    # U+2028/U+2029 LINE/PARAGRAPH SEPARATOR → LF (web text carries
    # them; they are line breaks, and leaving them also trips Java's
    # '$'-before-final-line-terminator quirk — see _EDGE_WS_RE)
    (" ", "\n"),
    (" ", "\n"),
)
_HSPACE_RUN_RE = "[ \\t]+"  # horizontal runs → one space
_BLANKS_RUN_RE = "\\n[ \\n]*\\n"  # blank-line runs → one blank line
# \A/\z anchors, NOT ^/$: Java's '$' matches BEFORE a final line
# terminator (\n, U+2028, U+2029, U+0085) while RE2's matches only at
# end of text — 'a  ' trimmed differently on the two engines
# (review r16 pass 2, execution-verified). \A/\z mean end-of-text in
# BOTH dialects.
_EDGE_WS_RE = "\\A[ \\t\\n]+|[ \\t\\n]+\\z"


def _replace_chain(col: Column, pairs) -> Column:
    for a, b in pairs:
        col = F.replace(col, F.lit(a), F.lit(b))
    return col


def _replace_chain_sql(expr: str, pairs) -> str:
    for a, b in pairs:
        expr = f"replace({expr}, {_q(a)}, {_q(b)})"
    return expr


# ------------------------------------------------------------- operators
def fold_unicode(col: Column | str) -> Column:
    """Deterministic NFKC-subset fold: typographic quotes/dashes →
    ASCII, exotic spaces → space, fullwidth ASCII → ASCII,
    f-ligatures/ellipsis/™ expanded."""
    return _replace_chain(
        F.translate(_c(col), _FOLD_FROM, _FOLD_TO), _FOLD_MULTI
    )


def fold_unicode_sql(expr: str) -> str:
    return _replace_chain_sql(
        f"translate({expr}, {_q(_FOLD_FROM)}, {_q(_FOLD_TO)})", _FOLD_MULTI
    )


def strip_control(col: Column | str) -> Column:
    """Drop control, zero-width, soft-hyphen, and BOM code points
    (keeps tab/newline/CR — whitespace collapsing owns those)."""
    return F.regexp_replace(_c(col), CONTROL_ZW_RE, "")


def strip_control_sql(expr: str) -> str:
    return f"regexp_replace({expr}, {_q(CONTROL_ZW_RE)}, '', 'g')"


def strip_urls(col: Column | str) -> Column:
    """Remove scheme'd / www.-led URLs (the RefinedWeb line-filter
    convention: URLs carry no training signal and poison n-gram
    dedup with unique tokens)."""
    return F.regexp_replace(_c(col), URL_RE, "")


def strip_urls_sql(expr: str) -> str:
    return f"regexp_replace({expr}, {_q(URL_RE)}, '', 'g')"


def strip_html(col: Column | str) -> Column:
    """Remove HTML/XML tags, then decode the common entities (&amp;
    last, so double-encoded entities decode exactly one level)."""
    return _replace_chain(
        F.regexp_replace(_c(col), HTML_TAG_RE, ""), _ENTITIES
    )


def strip_html_sql(expr: str) -> str:
    return _replace_chain_sql(
        f"regexp_replace({expr}, {_q(HTML_TAG_RE)}, '', 'g')", _ENTITIES
    )


def collapse_whitespace(col: Column | str) -> Column:
    """Normalize CRLF/CR to LF, collapse horizontal whitespace runs
    to one space and blank-line runs to one blank line, trim the
    ends."""
    c = _replace_chain(_c(col), _CRLF)
    c = F.regexp_replace(c, _HSPACE_RUN_RE, " ")
    c = F.regexp_replace(c, _BLANKS_RUN_RE, "\n\n")
    return F.regexp_replace(c, _EDGE_WS_RE, "")


def collapse_whitespace_sql(expr: str) -> str:
    c = _replace_chain_sql(expr, _CRLF)
    c = f"regexp_replace({c}, {_q(_HSPACE_RUN_RE)}, ' ', 'g')"
    c = f"regexp_replace({c}, {_q(_BLANKS_RUN_RE)}, '\n\n', 'g')"
    return f"regexp_replace({c}, {_q(_EDGE_WS_RE)}, '', 'g')"


def clean_text(col: Column | str) -> Column:
    """The composed cleaning pipeline: tags AND entities out first
    (strip_html does both — so attribute URLs vanish with their tags,
    and URL stripping then operates on DECODED text: '&amp;' inside a
    query string has become '&' and stays part of the URL token,
    while '&nbsp;' has become a space and terminates it), then
    raw-text URLs, then the unicode fold (fancy spaces become plain
    BEFORE collapsing), then control strip, then whitespace collapse
    + trim. Pinned by the hostile-input parity tests; reordering any
    stage changes hashed output on both engines at once."""
    return collapse_whitespace(
        strip_control(fold_unicode(strip_urls(strip_html(_c(col)))))
    )


def clean_text_sql(expr: str) -> str:
    return collapse_whitespace_sql(
        strip_control_sql(fold_unicode_sql(strip_urls_sql(strip_html_sql(expr))))
    )


def cleanliness_components(col: Column | str) -> dict[str, Column]:
    """Per-row cleanliness profile over the RAW text: ``n_chars_raw``
    / ``n_chars_clean`` (code points before/after :func:`clean_text`),
    ``stripped_frac`` (share of chars removed, 6 digits, 0.0 for
    empty), and the dirt counts ``n_urls`` / ``n_tags`` /
    ``n_control``. All long/double Columns — aggregate freely."""
    c = _c(col)
    raw = F.length(c).cast("long")
    cleaned = F.length(clean_text(c)).cast("long")
    # 6-digit half-up round in INTEGER arithmetic (the exact_avg
    # discipline): round(x, 6) on the two engines can split at a
    # decimal boundary; floor((d·2e6 + raw) / (2·raw)) cannot — every
    # operand is an exact integer-valued double far under 2^53, and
    # the final /1e6 is the identical IEEE op on both sides
    ppm = F.floor(
        ((raw - cleaned) * F.lit(2_000_000) + raw) / (raw * 2)
    )
    frac = F.when(raw > 0, ppm / F.lit(1_000_000.0)).otherwise(F.lit(0.0))
    return {
        "n_chars_raw": raw,
        "n_chars_clean": cleaned,
        "stripped_frac": frac.cast("double"),
        "n_urls": F.regexp_count(c, F.lit(URL_RE)).cast("long"),
        "n_tags": F.regexp_count(c, F.lit(HTML_TAG_RE)).cast("long"),
        "n_control": F.regexp_count(c, F.lit(CONTROL_ZW_RE)).cast("long"),
    }


def cleanliness_components_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`cleanliness_components` (same names,
    same rounding)."""
    raw = f"CAST(length({expr}) AS BIGINT)"
    cleaned = f"CAST(length({clean_text_sql(expr)}) AS BIGINT)"
    count = lambda pat: (  # noqa: E731
        f"CAST(len(regexp_extract_all({expr}, {_q(pat)})) AS BIGINT)"
    )
    return {
        "n_chars_raw": raw,
        "n_chars_clean": cleaned,
        "stripped_frac": (
            f"CASE WHEN {raw} > 0 THEN floor((({raw} - {cleaned})"
            f" * 2000000 + {raw}) / ({raw} * 2.0)) / 1000000.0"
            " ELSE 0.0 END"
        ),
        "n_urls": count(URL_RE),
        "n_tags": count(HTML_TAG_RE),
        "n_control": count(CONTROL_ZW_RE),
    }


# -------------------------------------------------------- line-level rules
# The OTHER half of the RefinedWeb/CCNet cleaning stage: document-level
# normalization above, LINE-level boilerplate rules here. Web text
# arrives with navigation chrome, share buttons, and cookie banners
# repeated across (and within) pages; the within-document forms are
# pure array HOFs — per-row, order-preserving, zero shuffles.


def filter_lines(col: Column | str, min_chars: int = 3) -> Column:
    """Drop boilerplate-shaped lines: a line survives only if its
    trimmed length is at least ``min_chars`` AND it contains at least
    one ASCII letter (kills separator rows, bare numbers, and
    symbol-art; the RefinedWeb line-filter shape). Order preserved;
    returns the re-joined text."""
    if min_chars < 1:
        raise ValueError(f"min_chars must be >= 1, got {min_chars}")
    lines = F.split(_c(col), "\n")
    kept = F.filter(
        lines,
        lambda x: (F.length(F.trim(x)) >= min_chars)
        & x.rlike("[a-zA-Z]"),
    )
    return F.array_join(kept, "\n")


def _join_lines_sql(expr: str, kept: str) -> str:
    """NULL-preserving line re-join: DuckDB's string_agg over an
    EMPTY kept-list is NULL where Spark's array_join is '' — coalesce
    the aggregate, but only for non-NULL input (NULL in → NULL out on
    both engines)."""
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL ELSE "
        f"coalesce(list_aggregate({kept}, 'string_agg', chr(10)), '') END"
    )


def filter_lines_sql(expr: str, min_chars: int = 3) -> str:
    if min_chars < 1:
        raise ValueError(f"min_chars must be >= 1, got {min_chars}")
    kept = (
        f"list_filter(string_split({expr}, chr(10)), "
        f"x -> length(trim(x)) >= {min_chars} "
        "AND regexp_matches(x, '[a-zA-Z]'))"
    )
    return _join_lines_sql(expr, kept)


def dedup_lines(col: Column | str) -> Column:
    """Keep each line's FIRST occurrence only (order preserved) — the
    repeated-line killer: share buttons, cookie banners, and nav rows
    recur verbatim inside a scraped page, and exact-match first-
    occurrence dedup is the standard counter (the within-document
    analog of the corpus-level exact dedup gate). Quadratic in the
    LINE COUNT of one document (array_position scan per line) — fine
    per-row at any corpus scale; it never touches another row."""
    lines = F.split(_c(col), "\n")
    kept = F.filter(
        lines,
        lambda x, i: F.array_position(lines, x) - 1 == i,
    )
    return F.array_join(kept, "\n")


def dedup_lines_sql(expr: str) -> str:
    # DuckDB's lambda index is 1-based where Spark's is 0-based; both
    # sides compare against their engine's own first-occurrence
    # position, so the kept sets are identical
    lines = f"string_split({expr}, chr(10))"
    kept = (
        f"list_filter({lines}, (x, i) -> list_position({lines}, x) = i)"
    )
    return _join_lines_sql(expr, kept)


def clean_document(col: Column | str, min_line_chars: int = 3) -> Column:
    """The full document-cleaning pipeline: :func:`clean_text` (tags/
    URLs/entities/unicode/control/whitespace), then the line rules —
    :func:`filter_lines` then :func:`dedup_lines` (filter first, so a
    boilerplate line hiding behind a dropped separator still
    deduplicates against its twin)."""
    return dedup_lines(filter_lines(clean_text(_c(col)), min_line_chars))


def clean_document_sql(expr: str, min_line_chars: int = 3) -> str:
    return dedup_lines_sql(
        filter_lines_sql(clean_text_sql(expr), min_line_chars)
    )
