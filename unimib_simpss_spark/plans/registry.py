"""Named-query registry with DuckDB oracle pairing.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered via
the ``@query`` decorator, optionally with an equivalent ANSI-SQL oracle
that DuckDB runs over the same parquet tables. Column names and types are
aligned on BOTH sides (the driver sorts columns by name and value-hashes),
and every floating-point aggregate is explicitly rounded identically in
both engines so the hashes match bit-for-bit.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import.
_QUERY_MODULES = (
    "unimib_simpss_spark.plans.relational",
    "unimib_simpss_spark.plans.sensor",
    "unimib_simpss_spark.plans.timeseries",
    "unimib_simpss_spark.plans.llm_text",
    "unimib_simpss_spark.plans.llm_dedup",
    "unimib_simpss_spark.plans.llm_similarity",
    "unimib_simpss_spark.plans.llm_multimodal",
    "unimib_simpss_spark.plans.llm_curation",
    "unimib_simpss_spark.plans.lakehouse",
)


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a named query, with optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def _load() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def queries() -> dict[str, QueryFn]:
    _load()
    return {name: d.fn for name, d in sorted(_REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    _load()
    return {
        name: d.oracle for name, d in sorted(_REGISTRY.items()) if d.oracle is not None
    }
