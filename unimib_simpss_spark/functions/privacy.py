"""PII handling for training-data curation (SURVEY.md §2.7 [EXT]).

Training pipelines scrub direct identifiers before a corpus ships:
join-preserving pseudonymization (stable hash tokens so references
still link up), pattern redaction (digit runs, the id-shaped part of a
name/handle), and a k-anonymity pass over quasi-identifier combinations
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
