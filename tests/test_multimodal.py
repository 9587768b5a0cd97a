"""Multimodal operator tests: the Spark-side plumbing (schemas, Arrow
batch shapes, partition behavior) is real and verified; the codec step
itself is a deterministic fake (real decode is stubbed — no media libs
in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unimib_simpss_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return M.media_from_documents(docs).cache()


def test_media_schema(media):
    def shape(schema):
        return [(f.name, f.dataType.simpleString()) for f in schema.fields]

    assert shape(media.schema) == shape(M.MEDIA_SCHEMA)


def test_metadata_only_scan_never_reads_payload(media):
    """Kind/metadata predicates must not force payload into the plan."""
    plan = media.select("media_id", "kind", "meta").where(
        F.col("meta.width") > 100
    )
    assert "payload" not in plan.schema.fieldNames()


def test_decode_schema_and_rowcount(media):
    out = M.decode_media(media)
    assert out.schema == M.FEATURE_SCHEMA
    assert out.count() == media.count()


def test_decode_deterministic(media):
    a = {r.media_id: r.features for r in M.decode_media(media).collect()}
    b = {r.media_id: r.features for r in M.decode_media(media).collect()}
    assert a == b


def test_decode_features_l1_normalized(media):
    rows = M.decode_media(media).limit(20).collect()
    for r in rows:
        assert len(r.features) == M.N_FEATURES
        assert abs(sum(r.features) - 1.0) < 1e-3


def test_decode_nbytes_matches_jvm_octet_length(media):
    """Cross-check the Python decode path against JVM octet_length."""
    jvm = media.select("media_id", F.octet_length("payload").alias("n"))
    bad = (
        M.decode_media(media)
        .join(jvm, "media_id")
        .where(F.col("n_bytes") != F.col("n"))
    )
    assert bad.count() == 0


def test_decode_preserves_partitioning(media):
    out = M.decode_media(media.repartition(5))
    assert out.rdd.getNumPartitions() == 5


def test_real_decoder_is_stubbed(media):
    with pytest.raises(Exception) as ei:
        M.decode_media(media.limit(1), decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_counts(media):
    import math

    out = M.frame_sample_plan(media, every_ms=1000)
    got = {r.media_id: r.n for r in out.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    vids = media.where(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("d")
    ).collect()
    assert got and len(got) == len(vids)
    for r in vids:
        assert got[r.media_id] == math.ceil(r.d / 1000)


def test_feature_topk_contract(media):
    out = M.media_feature_topk(media, k=3, query_pred=F.col("vec_id") < 6)
    rows = out.collect()
    per_query: dict[int, list] = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r)
    assert set(per_query) <= set(range(6))
    for qid, nb in per_query.items():
        assert len(nb) == 3
        cos = [r.cosine for r in sorted(nb, key=lambda r: r.rank)]
        assert cos == sorted(cos, reverse=True)
        assert all(r.neighbor_id != qid for r in nb)
