"""Smoke the per-section bench paths (ADVICE r16 #4).

``bench.py``'s SECTIONED map drives 31 per-leg timing runs — each
either a ``sections=[tag]`` plan-pruned build (sections-aware hosts)
or a constant-folded tag filter on the tagged union (fallback hosts).
Until now those paths had no pinned test: a leg-gating regression
(an unbound shared relation, a renamed section literal) would surface
only at bench time, after the round's timing window. This sweep runs
every configured section at sf0.001 and asserts it executes; for
filter-fallback hosts it additionally asserts the configured tag is a
LIVE tag value, because a stale literal there benches a constant-
folded empty plan and records ~0 s as the leg's floor (bench.py's own
in-run validation, pinned here so it fails in CI first).
"""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from bench import SECTIONED
from unimib_simpss_spark.operators.caching import release_result
from unimib_simpss_spark.plans import registry

_CASES = [
    (name, tagcol, tag)
    for name, (tagcol, tags) in sorted(SECTIONED.items())
    for tag in tags
]


def _takes_sections(fn) -> bool:
    return "sections" in inspect.signature(fn).parameters


@pytest.fixture(scope="module")
def live_tags(spark, sf_dir):
    """Distinct tag values per filter-fallback host, computed once."""
    out: dict[str, set] = {}
    for name, (tagcol, _tags) in SECTIONED.items():
        fn = registry.queries()[name]
        if _takes_sections(fn):
            continue
        df = fn(spark, sf_dir)
        out[name] = {r[0] for r in df.select(tagcol).distinct().collect()}
        release_result(df)
    return out


@pytest.mark.parametrize("name,tagcol,tag", _CASES)
def test_section_runs(spark, sf_dir, name, tagcol, tag, live_tags):
    fn = registry.queries()[name]
    if _takes_sections(fn):
        df = fn(spark, sf_dir, sections=[tag])
    else:
        # the stale-literal guard: a renamed tag would silently bench
        # an empty constant-folded plan
        assert tag in live_tags[name], (
            f"{name}: configured section {tag!r} is not a live "
            f"{tagcol!r} value {sorted(live_tags[name])}"
        )
        df = fn(spark, sf_dir).where(F.col(tagcol) == tag)
    # full execution, no driver transfer — the bench.py shape
    df.write.mode("overwrite").format("noop").save()
    release_result(df)


@pytest.mark.parametrize(
    "name",
    sorted(n for n in SECTIONED if _takes_sections(registry.queries()[n])),
)
def test_unknown_section_raises(spark, sf_dir, name):
    with pytest.raises(ValueError, match="unknown section"):
        registry.queries()[name](spark, sf_dir, sections=["__nope__"])


def test_sectioned_hosts_are_headline_queries():
    from bench import HEADLINE

    assert set(SECTIONED) <= set(HEADLINE)
