"""Oracle-parity harness: run a registered query on Spark AND its DuckDB
oracle over the same parquet tables, normalize, and diff.

This emulates the driver's correctness gate (row-count + schema +
order-insensitive value comparison) so parity failures surface locally
before a round is judged.
"""

from __future__ import annotations

import datetime
import decimal
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame, SparkSession

from unimib_simpss_spark.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with every test table registered as a view."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm_value(v: object) -> object:
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and float noise beyond ~12 significant digits
        return float(f"{v:.12g}")
    if isinstance(v, list):
        return tuple(_norm_value(x) for x in v)
    return v


def _norm_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    fn,
    oracle: str,
    sf_dir: str,
    max_report: int = 5,
) -> ParityResult:
    sdf: DataFrame = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = con.sql(oracle)
    o_cols = list(rel.columns)
    o_rows = rel.fetchall()

    res = ParityResult(name=name, ok=True, spark_rows=len(s_rows), oracle_rows=len(o_rows))
    if sorted(s_cols) != sorted(o_cols):
        res.ok = False
        res.mismatches.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return res
    sn = _norm_rows(s_cols, s_rows)
    on = _norm_rows(o_cols, o_rows)
    if len(sn) != len(on):
        res.ok = False
        res.mismatches.append(f"row count differs: spark={len(sn)} oracle={len(on)}")
    for i, (a, b) in enumerate(zip(sn, on)):
        if a != b:
            res.ok = False
            res.mismatches.append(f"row {i}: spark={a!r} oracle={b!r}")
            if len(res.mismatches) >= max_report:
                break
    return res
