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
