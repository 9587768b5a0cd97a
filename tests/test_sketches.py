"""Count-min sketch properties: overestimate bound, exact mergeability,
heavy-hitter completeness (no false negatives)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from unimib_simpss_spark.catalog import load_table
from unimib_simpss_spark.functions import sketches as SK


@pytest.fixture(scope="module")
def tokens(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .cache()
    )


def test_estimates_overestimate_within_bound(tokens):
    depth, width = 4, 512
    sketch = SK.cms_build(tokens, "token", depth, width)
    cells = sketch.collect()
    assert len(cells) <= depth * width
    exact = {r.token: r.cnt for r in tokens.groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    n = sum(exact.values())
    est = {
        r.token: r.est
        for r in SK.cms_estimate(
            sketch, tokens.distinct(), "token", depth, width
        ).collect()
    }
    assert set(est) == set(exact)
    eps_n = math.e / width * n
    for t, e in est.items():
        assert e >= exact[t], t                       # never under
        assert e <= exact[t] + eps_n, (t, e, exact[t], eps_n)


def test_merge_equals_whole(tokens):
    half1 = tokens.where(F.xxhash64("token", F.lit(99)) % 2 == 0)
    half2 = tokens.where(F.xxhash64("token", F.lit(99)) % 2 != 0)
    whole = {(r.j, r.c): r.cnt for r in SK.cms_build(tokens, "token").collect()}
    merged = {
        (r.j, r.c): r.cnt
        for r in SK.cms_merge(
            SK.cms_build(half1, "token"), SK.cms_build(half2, "token")
        ).collect()
    }
    assert merged == whole


def test_heavy_hitters_no_false_negatives(tokens):
    exact_top = [
        r.token
        for r in tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(5)
        .collect()
    ]
    hh = SK.cms_heavy_hitters(tokens, "token", k=20)
    got = [r.token for r in hh.collect()]
    assert len(got) <= 20
    assert set(exact_top) <= set(got)
    ranks = [r.rank for r in hh.collect()]
    assert ranks == sorted(ranks)
