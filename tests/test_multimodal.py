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


class TestResize:
    def test_shape_and_range(self, spark, sf_dir):
        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators import multimodal as M

        media = M.media_from_documents(load_table(spark, sf_dir, "documents"))
        out = M.resize_media(media, width=8, height=6).collect()
        assert out and all(r.kind != "audio" for r in out)
        n_visual = media.where("kind <> 'audio'").count()
        assert len(out) == n_visual
        for r in out:
            assert r.dst_w == 8 and r.dst_h == 6
            assert len(r.pixels) == 48
            assert all(0.0 <= p <= 1.0 for p in r.pixels)

    def test_area_average_preserves_mean_exactly(self, spark):
        import numpy as np

        from unimib_simpss_spark.operators import multimodal as M

        # 16x16 source -> 8x8 target: blocks tile evenly, so the mean
        # of the pooled grid equals the mean of the source grid exactly
        payload = bytes(range(256))
        media = spark.createDataFrame(
            [(1, "image", bytearray(payload), (16, 16, None, None, "png"))],
            M.MEDIA_SCHEMA,
        )
        r = M.resize_media(media, width=8, height=8).collect()[0]
        grid = np.frombuffer(payload, dtype=np.uint8).reshape(16, 16) / 255.0
        assert abs(float(np.mean(r.pixels)) - float(grid.mean())) < 1e-6
        # deterministic
        again = M.resize_media(media, width=8, height=8).collect()[0]
        assert list(again.pixels) == list(r.pixels)

    def test_real_decoder_is_an_honest_stub(self, spark, sf_dir):
        import pytest as _pytest

        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators import multimodal as M

        media = M.media_from_documents(load_table(spark, sf_dir, "documents"))
        with _pytest.raises(NotImplementedError):
            M.resize_media(media, decoder="real")

    def test_source_smaller_than_target_grid_is_finite(self, spark):
        """Upscaling (src < dst) repeats pooling-bin boundaries →
        zero-width bins; the divisor clamp must yield the boundary
        element, never Inf/NaN (round-6 advice)."""
        import math

        from unimib_simpss_spark.operators import multimodal as M

        media = spark.createDataFrame(
            [(2, "image", bytearray(bytes(range(12))), (4, 3, None, None, "png"))],
            M.MEDIA_SCHEMA,
        )
        r = M.resize_media(media, width=8, height=8).collect()[0]
        assert len(r.pixels) == 64
        assert all(math.isfinite(p) and 0.0 <= p <= 1.0 for p in r.pixels)


class TestResample:
    def test_audio_only_and_shapes(self, spark, sf_dir):
        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators import multimodal as M

        media = M.media_from_documents(load_table(spark, sf_dir, "documents"))
        out = M.resample_audio(media, target_rate=8_000).collect()
        assert out and all(r.kind == "audio" for r in out)
        assert len(out) == media.where("kind = 'audio'").count()
        for r in out:
            assert r.dst_rate == 8_000
            assert len(r.features) == M.N_FEATURES
            assert all(0.0 <= f <= 1.0 for f in r.features)
            # fixture audio is 16 kHz; downsampling to 8 kHz halves it
            assert r.src_rate == 16_000
            assert r.n_samples >= 2

    def test_resample_halves_sample_count_and_is_deterministic(self, spark):
        from unimib_simpss_spark.operators import multimodal as M

        payload = bytes(range(256)) * 4
        media = spark.createDataFrame(
            [(7, "audio", bytearray(payload), (None, None, 16_000, 125, "pcm16"))],
            M.MEDIA_SCHEMA,
        )
        r1 = M.resample_audio(media, target_rate=8_000).collect()[0]
        # 16 kHz x 125 ms = 2000 source samples -> 1000 at 8 kHz
        assert r1.n_samples == 1000
        r2 = M.resample_audio(media, target_rate=8_000).collect()[0]
        assert list(r1.features) == list(r2.features)

    def test_real_decoder_is_an_honest_stub(self, spark, sf_dir):
        import pytest as _pytest

        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators import multimodal as M

        media = M.media_from_documents(load_table(spark, sf_dir, "documents"))
        with _pytest.raises(NotImplementedError):
            M.resample_audio(media, decoder="real")

    def test_zero_duration_clip_is_finite(self, spark):
        """duration_ms=0 → n_src=2 → n_dst=2 < N_FEATURES: most envelope
        bins are zero-width; the divisor clamp must keep every feature
        finite (round-6 advice)."""
        import math

        from unimib_simpss_spark.operators import multimodal as M

        media = spark.createDataFrame(
            [(9, "audio", bytearray(b"\x00\xff"), (None, None, 16_000, 0, "pcm16"))],
            M.MEDIA_SCHEMA,
        )
        r = M.resample_audio(media, target_rate=8_000).collect()[0]
        assert len(r.features) == M.N_FEATURES
        assert all(math.isfinite(f) for f in r.features)
