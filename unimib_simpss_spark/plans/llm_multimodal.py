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
    "q39_media_stats",
    oracle=f"""
    WITH media AS ({_MEDIA_CTE})
    SELECT kind, count(*) AS n_media,
           CAST(sum(octet_length(payload)) AS BIGINT) AS sum_bytes,
           CAST(sum(CASE WHEN kind <> 'image' THEN n * 10 ELSE 0 END)
               AS BIGINT) AS sum_duration_ms,
           max(CASE WHEN kind <> 'audio' THEN (n % 64 + 1) * 16 END)
               AS max_width
    FROM media GROUP BY kind
    """,
)
def q39_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media catalog stats — metadata + payload length, zero decode."""
    return M.media_stats(_media(spark, sf_dir))


@query(
    "q40_frame_sample",
    oracle=f"""
    WITH media AS ({_MEDIA_CTE})
    SELECT media_id, unnest(range(0, CAST(n * 10 AS BIGINT), 1000))
               AS frame_ts_ms
    FROM media WHERE kind = 'video'
    """,
)
def q40_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan: one row per (video, 1s-grid timestamp)."""
    out = M.frame_sample_plan(_media(spark, sf_dir), every_ms=1000)
    return out.select("media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"))


@query("q41_media_decode")  # no oracle: NumPy feature math → rows-only check
def q41_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode (deterministic fake decoder) → feature digests.

    The registered contract surface is SCALAR columns only — the raw
    ``features array<float>`` crashes hash canonicalizers that sort rows
    in pandas (lists are unhashable). Internal/tested consumers use
    :func:`~unimib_simpss_spark.operators.multimodal.decode_media`
    directly for the full array.
    """
    feats = M.decode_media(_media(spark, sf_dir))
    # Position-weighted checksum of the feature vector: deterministic,
    # order-stable (fold-left over the array), scalar.
    weighted = F.zip_with(
        "features",
        F.sequence(F.lit(1), F.size("features")),
        lambda f, i: f.cast("double") * i.cast("double"),
    )
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.size("features").alias("n_dims"),
        F.round(
            F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("feature_digest"),
    )


@query("q42_media_feature_topk")  # no oracle: decode feeds cosine top-k
def q42_media_feature_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → cosine top-3 over decoded features (multimodal ANN)."""
    return M.media_feature_topk(
        _media(spark, sf_dir), k=3, query_pred=F.col("vec_id") < 6
    )
