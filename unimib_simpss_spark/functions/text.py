"""Portable text expressions: tokens, shingles, hashes — each produced
twice from the same constants, as a Spark Column and as DuckDB SQL text,
so every text/dedup operator is verifiable against the oracle
bit-for-bit.

All expressions are built-in higher-order functions (whole-stage
codegen, no Python in the row path) — the 100 TB-safe formulation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from unimib_simpss_spark.functions.hashing import COMBO_BASE, MERSENNE_31, hash64_sql

TOKEN_SPLIT_RE = "[^a-z0-9]+"


# ------------------------------------------------------------------ tokens
def tokens(col: Column | str) -> Column:
    """Lowercased alnum tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'),"
        " t -> t <> '')"
    )


# ---------------------------------------------------------------- shingles
def shingles_from_tokens(tk: Column, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined) from an already-bound
    token-array column; [] when fewer than n tokens. Guarded: Spark's
    sequence(1, 0) counts DOWN, so the short-document case must
    short-circuit.

    PERF CONTRACT: pass a projected column ATTRIBUTE (``F.col("tk")``
    over a prior ``.select(tokens(...).alias("tk"))``), not a raw
    expression. The per-position lambda references ``tk``, and an
    expression there is re-evaluated once PER POSITION (lambda scopes
    defeat common-subexpression elimination) — re-tokenizing a k-token
    document k−n+1 times. An attribute reference is a cheap row lookup.
    The two-projection shape survives the optimizer: CollapseProject
    declines to inline a non-cheap alias that is referenced more than
    once, and ``tk`` appears in the guard, the sequence bound, and the
    lambda."""
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        )
    )
    return F.when(F.size(tk) >= n, sh).otherwise(
        F.array().cast("array<string>")
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles from raw text — self-contained
    expression form. Fine for one-off use on short text; hot paths
    should project ``tokens()`` first and use
    :func:`shingles_from_tokens` (see its perf contract).

    Formulation note (measured at sf0.1): per-position
    ``slice``+``array_join`` over a ``sequence`` beats a
    transform-with-index + ``element_at`` variant ~2× in the full
    pipeline."""
    return shingles_from_tokens(tokens(col), n)


def shingles_sql(expr: str, n: int = 3) -> str:
    tk = tokens_sql(expr)
    return (
        f"CASE WHEN len({tk}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({tk}) - {n - 2}), "
        f"i -> array_to_string(list_slice({tk}, i, i + {n - 1}), ' '))) "
        f"ELSE [] END"
    )


# ------------------------------------------------------- hashed shingles
def hashed_shingles(col: Column | str, n: int = 3) -> Column:
    """Shingles mapped through hash64 mod 2^31-1 (SimHash-style input
    space derived from the shingle STRING — costs one md5 per shingle;
    the dedup pair miners use the cheaper combo space below instead)."""
    return F.transform(
        shingles(col, n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % MERSENNE_31,
    )


def hashed_shingles_sql(expr: str, n: int = 3) -> str:
    return (
        f"list_transform({shingles_sql(expr, n)}, "
        f"s -> {hash64_sql('s')} % {MERSENNE_31})"
    )


def combo_shingle_hashes_sql(expr: str, n: int = 3) -> str:
    """DuckDB twin of the dedup miners' shingle-hash space: one md5 per
    TOKEN reduced mod 2^31-1, 3-gram hashes composed by Horner's rule
    (never builds shingle strings). Distinct values. Must stay
    arithmetically identical to ``dedup._combo_shingle_docs``."""
    assert n == 3, "combo composition is written for 3-gram shingles"
    th = (
        f"list_transform({tokens_sql(expr)}, "
        f"t -> {hash64_sql('t')} % {MERSENNE_31})"
    )
    b, p = COMBO_BASE, MERSENNE_31
    return (
        f"(SELECT CASE WHEN len(th) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len(th) - 1), "
        f"i -> ((th[i] * {b} + th[i+1]) % {p} * {b} + th[i+2]) % {p})) "
        f"ELSE [] END FROM (SELECT {th} AS th))"
    )


# ----------------------------------------------------------- normalization
def normalized_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace — exact-dedup normal form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def normalized_text_sql(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def token_fingerprint_from_tokens(tk: Column) -> Column:
    """:func:`token_fingerprint` over an already-bound token-array
    attribute — hosts that hoist one tokenize across legs (q61) derive
    the fingerprint without re-tokenizing; same perf contract as
    ``shingles_from_tokens`` (pass a projected attribute)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tk)), " "))


def token_fingerprint(col: Column | str) -> Column:
    """md5 of the sorted distinct token set — order/multiplicity-blind
    content fingerprint (catches shuffled near-dups exactly)."""
    return token_fingerprint_from_tokens(tokens(col))


def token_fingerprint_sql(expr: str) -> str:
    return (
        f"md5(array_to_string(list_sort(list_distinct({tokens_sql(expr)})), ' '))"
    )
