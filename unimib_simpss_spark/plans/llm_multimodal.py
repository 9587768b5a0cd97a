"""Multimodal-column queries (SURVEY.md §2.7 [EXT]).

The media table is derived deterministically from ``documents`` (no real
media ships in the container — see operators/multimodal.py for what is
stubbed vs real). Metadata-level queries (q39, q40) are JVM-only and
oracle-paired; the decode/feature queries (q41, q42) run the Arrow
``mapInPandas`` path whose feature math lives in NumPy — those are
registered WITHOUT oracle SQL (driver does the rows-only check) and are
instead invariant-tested in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unimib_simpss_spark.catalog import load_table
from unimib_simpss_spark.operators import multimodal as M
from unimib_simpss_spark.plans.registry import query

_MEDIA_CTE = M.media_from_documents_sql("documents")


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.media_from_documents(load_table(spark, sf_dir, "documents"))


@query(
    "q39_media_profile",
    oracle=f"""
    WITH media AS ({_MEDIA_CTE})
    SELECT 'stats' AS section, kind, count(*) AS n_media,
           CAST(sum(octet_length(payload)) AS BIGINT) AS sum_bytes,
           CAST(sum(CASE WHEN kind <> 'image' THEN n * 10 ELSE 0 END)
               AS BIGINT) AS sum_duration_ms,
           max(CASE WHEN kind <> 'audio' THEN (n % 64 + 1) * 16 END)
               AS max_width,
           CAST(NULL AS BIGINT) AS media_id,
           CAST(NULL AS BIGINT) AS frame_ts_ms
    FROM media GROUP BY kind
    UNION ALL
    SELECT 'frames' AS section, CAST(NULL AS VARCHAR) AS kind,
           CAST(NULL AS BIGINT) AS n_media,
           CAST(NULL AS BIGINT) AS sum_bytes,
           CAST(NULL AS BIGINT) AS sum_duration_ms,
           CAST(NULL AS INT)    AS max_width,
           media_id,
           unnest(range(0, CAST(n * 10 AS BIGINT), 1000)) AS frame_ts_ms
    FROM media WHERE kind = 'video'
    """,
)
def q39_media_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media catalog stats (metadata + payload length, zero decode)
    unioned with the frame-sampling plan — one row per (video, 1s-grid
    timestamp) — tagged by section (merged from the former q39/q40 to
    fit the driver's 50-query verification window)."""
    media = _media(spark, sf_dir)
    stats = M.media_stats(media).select(
        F.lit("stats").alias("section"),
        "kind",
        "n_media",
        "sum_bytes",
        "sum_duration_ms",
        "max_width",
        F.lit(None).cast("long").alias("media_id"),
        F.lit(None).cast("long").alias("frame_ts_ms"),
    )
    frames = M.frame_sample_plan(media, every_ms=1000).select(
        F.lit("frames").alias("section"),
        F.lit(None).cast("string").alias("kind"),
        F.lit(None).cast("long").alias("n_media"),
        F.lit(None).cast("long").alias("sum_bytes"),
        F.lit(None).cast("long").alias("sum_duration_ms"),
        F.lit(None).cast("int").alias("max_width"),
        F.col("media_id").cast("long").alias("media_id"),
        F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"),
    )
    return stats.unionAll(frames)


@query("x41_media_pipeline")  # no oracle: NumPy feature math → rows-only check
def x41_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both Arrow-decode media paths in one tagged union (merged from
    the former x41/x42 so every rows-only query fits the driver's
    50-query verification window):

    The decode/resize/audio legs run the REAL uncompressed-format
    decoders (VERDICT r9 #2) over payloads that are actual encoded
    PPM / WAV / ppm-stream bytes
    (:func:`~unimib_simpss_spark.operators.multimodal.media_with_real_payloads`);
    the topk leg keeps the byte-level fake decoder over the raw-bytes
    media table, so BOTH plumbing variants stay exercised.

    - 'decode': Arrow-batched REAL decode (WAV envelope / image+video
      intensity histograms) → per-media feature digests.
    - 'topk': fake decode → cosine top-3 over decoded features
      (multimodal ANN; media_id carries the query id).
    - 'resize': metadata-pruned REAL decode-and-resize of the visual
      rows to an 8×8 area-averaged grid (n_dims carries the grid size,
      the digest folds the pixel vector; videos resize their first
      frame).
    - 'audio': metadata-pruned REAL WAV decode-and-resample of the
      audio rows to 8 kHz with envelope pooling (n_bytes carries the
      resampled sample count, the digest folds the envelope bins).

    The registered contract surface is SCALAR columns only — the raw
    ``features array<float>`` crashes hash canonicalizers that sort rows
    in pandas (lists are unhashable). Internal/tested consumers use
    :func:`~unimib_simpss_spark.operators.multimodal.decode_media`
    directly for the full array.
    """
    media = _media(spark, sf_dir)
    real_media = M.media_with_real_payloads(load_table(spark, sf_dir, "documents"))
    feats = M.decode_media(real_media, decoder="real")
    # Position-weighted checksum of the feature vector: deterministic,
    # order-stable (fold-left over the array), scalar.
    weighted = F.zip_with(
        "features",
        F.sequence(F.lit(1), F.size("features")),
        lambda f, i: f.cast("double") * i.cast("double"),
    )
    # Guard empty/NULL feature vectors: sequence(1, size) is not empty
    # when size <= 0 (Spark steps DOWNWARD for stop < start), so the
    # zip_with would NULL-pad and poison the fold — define the digest
    # as 0.0 for degenerate vectors instead.
    digest = F.when(
        F.size("features") >= 1,
        F.round(F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x), 4),
    ).otherwise(F.lit(0.0))
    decode_leg = feats.select(
        F.lit("decode").alias("method"),
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.size("features").cast("long").alias("n_dims"),
        digest.alias("feature_digest"),
        F.lit(None).cast("long").alias("neighbor_id"),
        F.lit(None).cast("double").alias("cosine"),
    )
    topk_leg = M.media_feature_topk(media, k=3, query_pred=F.col("vec_id") < 6).select(
        F.lit("topk").alias("method"),
        F.col("query_id").alias("media_id"),
        F.lit(None).cast("string").alias("kind"),
        F.lit(None).cast("long").alias("n_bytes"),
        F.lit(None).cast("long").alias("n_dims"),
        F.lit(None).cast("double").alias("feature_digest"),
        "neighbor_id",
        "cosine",
    )
    resized = M.resize_media(real_media, width=8, height=8, decoder="real")
    px_weighted = F.zip_with(
        "pixels",
        F.sequence(F.lit(1), F.size("pixels")),
        lambda p, i: p.cast("double") * i.cast("double"),
    )
    px_digest = F.when(
        F.size("pixels") >= 1,
        F.round(F.aggregate(px_weighted, F.lit(0.0), lambda acc, x: acc + x), 4),
    ).otherwise(F.lit(0.0))
    resize_leg = resized.select(
        F.lit("resize").alias("method"),
        "media_id",
        "kind",
        F.lit(None).cast("long").alias("n_bytes"),
        F.size("pixels").cast("long").alias("n_dims"),
        px_digest.alias("feature_digest"),
        F.lit(None).cast("long").alias("neighbor_id"),
        F.lit(None).cast("double").alias("cosine"),
    )
    resampled = M.resample_audio(real_media, target_rate=8_000, decoder="real")
    au_weighted = F.zip_with(
        "features",
        F.sequence(F.lit(1), F.size("features")),
        lambda p, i: p.cast("double") * i.cast("double"),
    )
    au_digest = F.when(
        F.size("features") >= 1,
        F.round(F.aggregate(au_weighted, F.lit(0.0), lambda acc, x: acc + x), 4),
    ).otherwise(F.lit(0.0))
    audio_leg = resampled.select(
        F.lit("audio").alias("method"),
        "media_id",
        "kind",
        F.col("n_samples").cast("long").alias("n_bytes"),
        F.size("features").cast("long").alias("n_dims"),
        au_digest.alias("feature_digest"),
        F.lit(None).cast("long").alias("neighbor_id"),
        F.lit(None).cast("double").alias("cosine"),
    )
    return (
        decode_leg.unionAll(topk_leg).unionAll(resize_leg).unionAll(audio_leg)
    )


@query("x75_perceptual_dedup")  # NumPy decode in the hash → rows-only
def x75_perceptual_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-duplicate detection: 64-bit perceptual aHash per
    media row (image grid / video keyframe / audio envelope — REAL
    uncompressed decoders, operators/multimodal.py ahash64), then the
    generic pigeonhole hamming band join (operators/dedup.py
    hamming_band_pairs, exact for hamming ≤ 3 over 4×16-bit bands)
    restricted to same-kind pairs.

    The corpus is the real-payload media table PLUS planted perceptual
    near-duplicates: every 7th row re-encoded after a positive affine
    content transform (brightness/volume — every payload byte changes,
    the perception doesn't; media_affine_variants). The miner links
    each original to its re-encoded copy THROUGH the codec roundtrip
    (recall ≥95%: 8-bit re-quantization can flip threshold-adjacent
    blocks on near-constant payloads past the hamming gate; precision
    is exact) — the multimodal analog of the text SimHash miner, and
    the case md5/fingerprint dedup provably misses. Rows-only (NumPy
    decode is engine-local); exactness vs brute-force hamming, affine
    invariance, and recall on the planted copies are tested in
    tests/test_multimodal.py + the run-determinism sweep."""
    from unimib_simpss_spark.operators.caching import (
        cache_intermediate,
        materialize_release,
    )
    from unimib_simpss_spark.operators.dedup import hamming_band_pairs

    # Encode ONCE behind a cache barrier: the corpus union feeds the
    # encoded payloads to BOTH legs (originals hashed directly, every
    # 7th decoded/re-encoded as its affine variant) — uncached, each
    # union leg would re-run the full per-row encode mapInPandas, and
    # the %7 filter can't push through the opaque Python stage
    # (review r11).
    media = cache_intermediate(
        M.media_with_real_payloads(
            load_table(spark, sf_dir, "documents")
        ).select("media_id", "kind", "payload")
    )
    corpus = media.unionAll(M.media_affine_variants(media))
    sigs = M.perceptual_hash_media(corpus)
    return materialize_release(
        hamming_band_pairs(
            sigs,
            id_col="media_id",
            hash_col="phash",
            max_hamming=3,
            bits=64,
            group_col="kind",
        ),
        media,
    )
