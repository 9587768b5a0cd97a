"""Shared helpers for the twin-expression modules (analysis /
cleaning / privacy): every family that produces a Spark ``Column``
AND a DuckDB SQL string from the same constants needs the same two
conversions — hoisted here so a fix (e.g. a quoting rule for a new
oracle engine) lands once (review r17 pass 1: three private copies
of ``_c`` and two of ``_q`` had already accumulated)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def col_of(col: Column | str) -> Column:
    """Accept a column name or a Column (every twin module's input
    convention)."""
    return F.col(col) if isinstance(col, str) else col


def sql_quote(s: str) -> str:
    """SQL-quote a literal for the DuckDB twins (single quotes
    doubled; DuckDB standard strings do not process backslashes, so
    regex patterns pass through verbatim)."""
    return "'" + s.replace("'", "''") + "'"
