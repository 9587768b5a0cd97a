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


def pick_sections(sections, known: tuple) -> set:
    """Validate a per-section bench filter (None = all legs — the
    registered/driver behavior). ``bench.py`` passes a single tag to
    time each leg of a multi-leg host in isolation; an unknown tag
    raises so a renamed leg cannot silently bench an empty plan.
    Lives here because it is the sections CONTRACT every
    sections-aware host + bench.py + tests/test_bench_sections.py
    share (review r17 pass 1 — it was private to one plan module)."""
    if sections is None:
        return set(known)
    got = {sections} if isinstance(sections, str) else set(sections)
    bad = got - set(known)
    if bad:
        raise ValueError(
            f"unknown section(s) {sorted(bad)} — known: {sorted(known)}"
        )
    if not got:
        raise ValueError("sections must name at least one leg")
    return got


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
