"""Strict rename-projection — the reference's core per-row transform.

Reference parity: ``convert`` in
``/root/reference/simpss_persistence/data_mapping/data_mapper.py:4-32``
rebuilds each record with destination column names from a ``src→dst``
name map and raises ``ValueError`` when the message does not have exactly
the mapped keys (tested in ``/root/reference/test/test_convert.py:8-66``).

Spark restatement: the arity check moves from per-row runtime (the
reference pays it on every message) to a single plan-time schema
assertion, and the rename itself is a zero-cost projection that Catalyst
folds into the scan. At 100 TB this is the difference between a per-row
Python dict rebuild and no work at all.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def convert(df: DataFrame, name_map: Mapping[str, str], strict: bool = True) -> DataFrame:
    """Rename-projection with the reference's strict-arity contract.

    ``name_map`` maps source → destination column names. With
    ``strict=True`` (reference behavior), the DataFrame must have exactly
    the mapped columns — extra or missing columns raise ``ValueError``
    before any job runs.
    """
    if strict:
        have = set(df.columns)
        want = set(name_map)
        if have != want:
            missing = sorted(want - have)
            extra = sorted(have - want)
            raise ValueError(
                "strict rename: schema mismatch "
                f"(missing={missing}, unexpected={extra})"
            )
    cols: list[Column] = [F.col(src).alias(dst) for src, dst in name_map.items()]
    return df.select(*cols)


def project_ordered(
    df: DataFrame, columns: list[str], types: Mapping[str, str] | None = None
) -> DataFrame:
    """Column-order projection; absent columns become typed NULLs.

    Reference parity: ``cassandra_storage.py:85-86`` orders values to the
    prepared statement's column order with ``row.get(column, None)``.
    ``types`` supplies the NULL cast type for absent columns.
    """
    have = set(df.columns)
    cols = [
        F.col(c)
        if c in have
        else F.lit(None).cast((types or {}).get(c, "string")).alias(c)
        for c in columns
    ]
    return df.select(*cols)
