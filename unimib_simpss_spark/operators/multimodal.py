"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata (SURVEY.md §2.7 [EXT]).

Design for 100 TB:

- Payloads are **opaque bytes + a typed metadata struct** — Spark never
  interprets media server-side; the schema is the contract
  (:data:`MEDIA_META_TYPE`). Filters on metadata (kind, dims, duration)
  are plain Column predicates → predicate pushdown & column pruning
  still apply, and a scan that only needs metadata never reads payload
  bytes (parquet column pruning).
- Decode / feature-extraction runs as **Arrow-batched ``mapInPandas``**
  — one Python worker per partition, whole Arrow batches in, so the
  interop cost is per-batch not per-row. Partitioning is preserved;
  no shuffle is introduced by any decode step.
- Codec work: ``decoder="real"`` is REAL for one uncompressed format
  per modality — PCM WAV audio, PPM/PGM/BMP images, concatenated-P6
  video streams — via the pure-NumPy parsers in :mod:`.codecs`
  (VERDICT r9 #2). COMPRESSED codecs (JPEG decode, FLAC, H.264 frame
  extraction) require image/audio libs NOT in this container and raise
  ``NotImplementedError`` from the format sniff. The default
  ``decoder="fake"`` remains the deterministic byte-level stand-in
  (folded histogram) for payloads that aren't parseable media, keeping
  the Spark-side plumbing (schemas, batch shapes, UDF signatures,
  partition behavior) testable on arbitrary bytes.

The reference (PCampi/unimib-simpss) has no media surface; the closest
analog is its opaque-JSON-bytes handling on the Kafka path
(simpss_persistence/kafka_consumer/consumer.py:128-138).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_META_TYPE = StructType(
    [
        StructField("width", IntegerType()),        # image/video
        StructField("height", IntegerType()),       # image/video
        StructField("sample_rate", IntegerType()),  # audio
        StructField("duration_ms", IntegerType()),  # audio/video
        StructField("codec", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META_TYPE),
    ]
)

N_FEATURES = 64  # fake-decoder feature width (byte-histogram folded)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


# ------------------------------------------------------------ media builder
def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents`` (the
    container ships no real media): payload = utf-8 bytes of ``text``,
    kind cycles by id, metadata synthesized from ``n_chars``. Entirely
    JVM-side — this is the loader analog, not a UDF."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % len(MEDIA_KINDS) + 1).cast("int"),
    )
    n = F.col("n_chars").cast("int")
    is_img = kind == "image"
    is_aud = kind == "audio"
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.when(~is_aud, (n % 64 + 1) * 16).cast("int").alias("width"),
            F.when(~is_aud, (n % 48 + 1) * 16).cast("int").alias("height"),
            F.when(is_aud, F.lit(16_000)).cast("int").alias("sample_rate"),
            F.when(~is_img, n * 10).cast("int").alias("duration_ms"),
            F.when(is_img, F.lit("png"))
            .when(is_aud, F.lit("pcm16"))
            .otherwise(F.lit("h264"))
            .alias("codec"),
        ).alias("meta"),
    )


def media_from_documents_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`media_from_documents` (a FROM-able CTE body
    exposing media_id/kind/payload plus the raw ``n`` the metadata
    derives from), used to oracle-pair metadata-level queries."""
    kinds = ", ".join(f"'{k}'" for k in MEDIA_KINDS)
    return f"""
    SELECT doc_id AS media_id,
           ([{kinds}])[CAST(doc_id % {len(MEDIA_KINDS)} + 1 AS INT)] AS kind,
           encode(text) AS payload,
           CAST(n_chars AS INT) AS n
    FROM {table}
    """


def media_with_real_payloads(docs: DataFrame, fps: int = 4) -> DataFrame:
    """Derive a media table whose payloads are REAL encoded bytes in the
    uncompressed formats :mod:`.codecs` decodes — P6 PPM images, 16-bit
    PCM WAV audio, concatenated-P6 video streams — deterministically
    from each document's text bytes.

    This is the fixture path that lets ``decoder="real"`` run end-to-end
    in a container with no media libs: encoding happens in Arrow-batched
    ``mapInPandas`` (partition-preserving, per-batch Python cost), and
    the metadata struct reflects the ACTUAL encoded dimensions/rate so
    downstream metadata predicates stay truthful. Payload sizes are kept
    small (≤ a few KB per row) — the point is exercising the real parse/
    resize/resample plumbing, not bulk I/O."""
    src = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in MEDIA_KINDS]),
            (F.col("doc_id") % len(MEDIA_KINDS) + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("raw"),
    )

    def encode_batches(batches: Iterator[Any]) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        from unimib_simpss_spark.operators import codecs

        rate = 16_000
        for pdf in batches:
            rows = []
            for mid, kind, raw in zip(pdf["media_id"], pdf["kind"], pdf["raw"]):
                b = np.frombuffer(bytes(raw) or b"\x00", dtype=np.uint8)
                n = int(b.size)
                if kind == "image":
                    w, h = n % 24 + 8, n % 18 + 6
                    grid = np.resize(b, (h, w)).astype(np.float64) / 255.0
                    # alternate PPM / PNG per id so the real-decode
                    # legs (x41) and the perceptual hash (x75) exercise
                    # the compressed PNG path too (VERDICT r11 #3)
                    if mid % 2 == 0:
                        payload = codecs.encode_png(grid)
                        meta = (w, h, None, None, "png")
                    else:
                        payload = codecs.encode_ppm(grid)
                        meta = (w, h, None, None, "ppm")
                elif kind == "audio":
                    n_samp = n % 400 + 100
                    sig = np.resize(b, n_samp).astype(np.float64) / 127.5 - 1.0
                    payload = codecs.encode_wav(sig, rate, bits=16)
                    meta = (None, None, rate, n_samp * 1000 // rate, "pcm16")
                else:  # video: 3-frame concatenated-P6 stream
                    w, h = n % 16 + 6, n % 12 + 5
                    frames = [
                        np.resize(b[i:], (h, w)).astype(np.float64) / 255.0
                        for i in range(3)
                    ]
                    payload = b"".join(codecs.encode_ppm(f) for f in frames)
                    meta = (w, h, None, 3000 // fps, "ppm_stream")
                rows.append((mid, kind, payload, meta))
            yield pd.DataFrame(
                {
                    "media_id": [r[0] for r in rows],
                    "kind": [r[1] for r in rows],
                    "payload": [r[2] for r in rows],
                    "meta": [
                        {
                            "width": r[3][0],
                            "height": r[3][1],
                            "sample_rate": r[3][2],
                            "duration_ms": r[3][3],
                            "codec": r[3][4],
                        }
                        for r in rows
                    ],
                }
            )

    return src.mapInPandas(encode_batches, MEDIA_SCHEMA)


# ------------------------------------------------------- metadata operators
def media_stats(media: DataFrame) -> DataFrame:
    """Catalog stats over the metadata + payload envelope — pure Column
    expressions; payload only contributes its length (no decode)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.octet_length("payload")).alias("sum_bytes"),
        F.sum(F.coalesce(F.col("meta.duration_ms"), F.lit(0))).alias(
            "sum_duration_ms"
        ),
        F.max(F.col("meta.width")).alias("max_width"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling PLAN for videos: one row per (media_id, frame_ts).

    Generating the timestamp grid is JVM-side (``sequence``); the actual
    frame DECODE at each timestamp is the stubbed step — at scale this
    exact exploded plan feeds the decoder with (payload, offset) pairs,
    already partition-parallel with no shuffle."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


# ------------------------------------------------------------ decode (UDF)
def _fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic byte-level stand-in for a real media decode:
    folded byte histogram (N_FEATURES bins, L1-normalized). Replace with
    PIL/libsndfile/PyAV per-kind decoders in production."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % N_FEATURES, minlength=N_FEATURES).astype(np.float32)
    total = float(hist.sum()) or 1.0
    return {"n_bytes": int(arr.size), "features": (hist / total).tolist()}


def _real_decode(payload: bytes, kind: str) -> dict[str, Any]:
    """The REAL decode path for one uncompressed format per modality
    (VERDICT r9 #2) — pure-NumPy parsers in :mod:`.codecs`, no external
    libs:

    - image: P5/P6 netpbm or 24-bpp BMP → grayscale grid → N_FEATURES
      intensity-histogram features (L1-normalized).
    - audio: PCM RIFF/WAVE (8/16-bit, any channel count → mono) →
      N_FEATURES equal-time mean-|amplitude| envelope bins.
    - video: concatenated-P6 stream (ffmpeg image2pipe ppm) → intensity
      histogram pooled over all frames' pixels.

    COMPRESSED codecs (JPEG/FLAC/H.264) still genuinely require
    PIL/soundfile/PyAV and raise ``NotImplementedError`` — the sniff
    below only accepts the uncompressed magics.
    """
    import numpy as np

    from unimib_simpss_spark.operators import codecs

    magic = bytes(payload[:4])
    try:
        if kind == "image":
            px = codecs.decode_image(bytes(payload)).ravel()
        elif kind == "video":
            frames = codecs.decode_ppm_frames(bytes(payload))
            px = np.concatenate([f.ravel() for f in frames])
        elif kind == "audio":
            sig, _rate = codecs.decode_wav(bytes(payload))
            if sig.size == 0:
                # valid-but-empty data chunk: zero envelope, not a crash
                return {
                    "n_bytes": len(payload),
                    "features": [0.0] * N_FEATURES,
                }
            b = (np.arange(N_FEATURES) * len(sig)) // N_FEATURES
            env = np.add.reduceat(np.abs(sig), b) / np.maximum(
                np.diff(np.append(b, len(sig))), 1
            )
            total = float(env.sum()) or 1.0
            return {
                "n_bytes": len(payload),
                "features": (env / total).astype(np.float32).tolist(),
            }
        else:
            raise ValueError(f"unknown media kind {kind!r}")
    except ValueError as exc:
        raise NotImplementedError(
            f"real {kind} decode supports WAV/PPM/PGM/BMP/PNG/"
            f"ppm-stream; payload magic {magic!r} "
            f"needs PIL/soundfile/PyAV, which are not installed ({exc})"
        ) from exc
    hist = np.bincount(
        np.minimum((px * N_FEATURES).astype(np.int64), N_FEATURES - 1),
        minlength=N_FEATURES,
    ).astype(np.float64)
    total = float(hist.sum()) or 1.0
    return {
        "n_bytes": len(payload),
        "features": (hist / total).astype(np.float32).tolist(),
    }


def decode_media(
    media: DataFrame,
    decoder: str | Callable[[bytes, str], dict[str, Any]] = "fake",
) -> DataFrame:
    """Decode payloads into fixed-width feature rows via Arrow-batched
    ``mapInPandas`` (schema :data:`FEATURE_SCHEMA`).

    Partition-preserving; each Arrow batch is decoded in one Python call.
    ``decoder`` is 'fake' (deterministic byte-level stand-in), 'real'
    (WAV/PPM/PGM/BMP/PNG/ppm-stream parsers — see
    :func:`_real_decode`), or any ``(bytes, kind) → dict``.
    """
    if decoder == "fake":
        fn: Callable[[bytes, str], dict[str, Any]] = lambda p, k: _fake_decode(p)
    elif decoder == "real":
        fn = _real_decode
    else:
        fn = decoder

    def decode_batches(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            out = [fn(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [o["n_bytes"] for o in out],
                    "features": [o["features"] for o in out],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        decode_batches, FEATURE_SCHEMA
    )


def media_feature_topk(
    media: DataFrame, k: int = 3, query_pred=None
) -> DataFrame:
    """End-to-end multimodal similarity: decode → cosine top-k over the
    decoded features, reusing the embedding similarity operator."""
    from unimib_simpss_spark.operators.similarity import cosine_topk

    feats = decode_media(media).select(
        F.col("media_id").alias("vec_id"),
        F.col("features").alias("embedding"),
    )
    return cosine_topk(feats, k=k, query_pred=query_pred, id_col="vec_id")


# ------------------------------------------------------------ resize (UDF)
RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("dst_w", IntegerType()),
        StructField("dst_h", IntegerType()),
        StructField("pixels", ArrayType(FloatType())),
    ]
)


def resize_media(
    media: DataFrame,
    width: int = 8,
    height: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Decode-and-resize image/video rows to a fixed (height × width)
    grayscale grid via area-average pooling (row-major ``pixels``,
    values in [0, 1]).

    The plumbing is the production shape: audio rows are dropped by a
    METADATA predicate (JVM-side, pruned before any Python runs), the
    resize itself is Arrow-batched ``mapInPandas`` (partition-
    preserving, no shuffle), and pooling is vectorized
    ``np.add.reduceat`` over block boundaries — exact area averaging,
    the same downsample a real preprocessing pipeline applies before
    feature extraction. Codec work is stubbed exactly like
    :func:`decode_media`: ``decoder="fake"`` materializes the payload
    bytes as a ``src_h × src_w`` grid (tiled/truncated, /255);
    ``decoder="real"`` parses the payload as an actual P5/P6/BMP image
    (or takes the FIRST frame of a concatenated-P6 video stream — the
    keyframe analog) via :mod:`.codecs`, and reports the PARSED
    dimensions as ``src_w``/``src_h``.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def resize_batches(batches: Iterator[Any]) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        from unimib_simpss_spark.operators import codecs

        for pdf in batches:
            out_px = []
            src_ws, src_hs = [], []
            for payload, sw, sh, kind in zip(
                pdf["payload"], pdf["src_w"], pdf["src_h"], pdf["kind"]
            ):
                if decoder == "real":
                    try:
                        if kind == "video":
                            grid = codecs.decode_ppm_frames(bytes(payload))[0]
                        else:
                            grid = codecs.decode_image(bytes(payload))
                    except ValueError as exc:
                        raise NotImplementedError(
                            f"real {kind} resize supports uncompressed "
                            f"PPM/PGM/BMP/ppm-stream only ({exc})"
                        ) from exc
                    sh, sw = grid.shape
                else:
                    sw, sh = int(sw), int(sh)
                    grid = (
                        np.resize(np.frombuffer(payload, dtype=np.uint8), (sh, sw))
                        .astype(np.float64)
                        / 255.0
                    )
                src_ws.append(sw)
                src_hs.append(sh)
                rb = (np.arange(height) * sh) // height
                cb = (np.arange(width) * sw) // width
                pooled = np.add.reduceat(
                    np.add.reduceat(grid, rb, axis=0), cb, axis=1
                )
                # A source smaller than the target grid repeats block
                # boundaries → zero-width bins; reduceat returns the
                # single element at a repeated index, so clamping the
                # divisor to 1 yields that element (correct average)
                # instead of Inf/NaN.
                rcnt = np.maximum(np.diff(np.append(rb, sh)), 1)[:, None]
                ccnt = np.maximum(np.diff(np.append(cb, sw)), 1)[None, :]
                out_px.append((pooled / (rcnt * ccnt)).ravel().astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "src_w": np.asarray(src_ws, dtype=np.int32),
                    "src_h": np.asarray(src_hs, dtype=np.int32),
                    "dst_w": np.full(len(pdf), width, dtype=np.int32),
                    "dst_h": np.full(len(pdf), height, dtype=np.int32),
                    "pixels": out_px,
                }
            )

    visual = media.where(F.col("kind") != "audio").select(
        "media_id",
        "kind",
        "payload",
        F.col("meta.width").alias("src_w"),
        F.col("meta.height").alias("src_h"),
    )
    return visual.mapInPandas(resize_batches, RESIZE_SCHEMA)


# ----------------------------------------------------------- audio (UDF)
RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("src_rate", IntegerType()),
        StructField("dst_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def resample_audio(
    media: DataFrame,
    target_rate: int = 8_000,
    decoder: str = "fake",
) -> DataFrame:
    """Decode-and-resample audio rows to ``target_rate``, emitting
    ``N_FEATURES`` equal-time mean-|amplitude| envelope bins.

    Same production plumbing as :func:`resize_media`, audio flavor:
    non-audio rows drop on a JVM-side METADATA predicate before Python;
    the work is Arrow-batched ``mapInPandas`` (partition-preserving);
    resampling is vectorized linear interpolation onto the target
    sample grid and the envelope pooling is ``np.add.reduceat`` over
    |signal| — the standard waveform preprocessing ahead of a
    mel/feature stage. ``decoder="fake"`` materializes payload bytes as
    a centered [-1, 1] PCM signal whose length matches
    ``meta.sample_rate × meta.duration_ms`` (tiled/truncated);
    ``decoder="real"`` parses the payload as an actual PCM RIFF/WAVE
    file via :mod:`.codecs` and uses the PARSED sample rate as
    ``src_rate``.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def resample_batches(batches: Iterator[Any]) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        from unimib_simpss_spark.operators import codecs

        for pdf in batches:
            out_n, out_feat, out_rate = [], [], []
            for payload, rate, dur in zip(
                pdf["payload"], pdf["src_rate"], pdf["duration_ms"]
            ):
                if decoder == "real":
                    try:
                        sig, rate = codecs.decode_wav(bytes(payload))
                    except ValueError as exc:
                        raise NotImplementedError(
                            f"real audio resample supports PCM RIFF/WAVE "
                            f"only ({exc})"
                        ) from exc
                    n_src = max(len(sig), 2)
                    sig = np.resize(sig, n_src)  # pads the <2-sample edge
                else:
                    n_src = max(int(rate) * int(dur) // 1000, 2)
                    sig = (
                        np.resize(np.frombuffer(payload, dtype=np.uint8), n_src)
                        .astype(np.float64)
                        / 127.5
                        - 1.0
                    )
                out_rate.append(int(rate))
                n_dst = max(n_src * target_rate // int(rate), 2)
                resampled = np.interp(
                    np.linspace(0.0, n_src - 1, n_dst),
                    np.arange(n_src),
                    sig,
                )
                b = (np.arange(N_FEATURES) * n_dst) // N_FEATURES
                # n_dst < N_FEATURES (e.g. an empty-duration clip →
                # n_src=2) repeats bin boundaries → zero-width bins;
                # clamp the divisor to 1 (reduceat already returns the
                # single element at a repeated index).
                pooled = np.add.reduceat(np.abs(resampled), b) / np.maximum(
                    np.diff(np.append(b, n_dst)), 1
                )
                out_n.append(n_dst)
                out_feat.append(pooled.astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "src_rate": np.asarray(out_rate, dtype=np.int32),
                    "dst_rate": np.full(len(pdf), target_rate, dtype=np.int32),
                    "n_samples": out_n,
                    "features": out_feat,
                }
            )

    audio = media.where(F.col("kind") == "audio").select(
        "media_id",
        "kind",
        "payload",
        F.col("meta.sample_rate").alias("src_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    return audio.mapInPandas(resample_batches, RESAMPLE_SCHEMA)


# ---------------------------------------------------- perceptual hash
PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("phash", LongType()),
    ]
)

PHASH_GRID = 8  # 8×8 block means → 64-bit hash


def ahash64(payload: bytes, kind: str) -> int:
    """64-bit average-hash of one media payload — the classic
    perceptual fingerprint (aHash): content is pooled to 64 region
    means, each bit = region mean > global mean. Invariant to any
    positive affine pixel/amplitude transform (brightness/contrast/
    volume), because the threshold is the payload's own mean — the
    property that makes it a NEAR-dup key where md5 only catches
    byte-identical copies.

    - image: grayscale grid → 8×8 block means (area-averaged).
    - video: first frame's grid (the keyframe fingerprint).
    - audio: 64 equal-time mean-|amplitude| envelope bins.

    Same codec support matrix as :func:`_real_decode` — including PNG
    via the sniff in ``codecs.decode_image`` (unsupported compressed
    magics raise ``NotImplementedError`` there; here the caller
    pre-filters to real payloads). Returned as a SIGNED 64-bit
    int (bit 63 set → negative), the Spark ``long`` convention;
    consumers use unsigned shifts (`dedup.hamming_band_pairs`).
    """
    import numpy as np

    from unimib_simpss_spark.operators import codecs

    if kind == "image":
        g = codecs.decode_image(bytes(payload))
    elif kind == "video":
        g = codecs.decode_ppm_frames(bytes(payload))[0]
    elif kind == "audio":
        sig, _rate = codecs.decode_wav(bytes(payload))
        n = PHASH_GRID * PHASH_GRID
        if sig.size == 0:
            return 0
        b = (np.arange(n) * len(sig)) // n
        g = (
            np.add.reduceat(np.abs(sig), b)
            / np.maximum(np.diff(np.append(b, len(sig))), 1)
        ).reshape(PHASH_GRID, PHASH_GRID)
    else:
        raise ValueError(f"unknown media kind {kind!r}")
    H, W = g.shape
    rb = (np.arange(PHASH_GRID + 1) * H) // PHASH_GRID
    cb = (np.arange(PHASH_GRID + 1) * W) // PHASH_GRID
    means = np.empty((PHASH_GRID, PHASH_GRID), dtype=np.float64)
    for i in range(PHASH_GRID):
        for j in range(PHASH_GRID):
            block = g[rb[i]: max(rb[i + 1], rb[i] + 1),
                      cb[j]: max(cb[j + 1], cb[j] + 1)]
            means[i, j] = float(block.mean())
    bits = (means > means.mean()).ravel()
    h = 0
    for i, bit in enumerate(bits):
        if bit:
            h |= 1 << i
    if h >= 1 << 63:  # wrap to signed long
        h -= 1 << 64
    return h


def perceptual_hash_media(media: DataFrame) -> DataFrame:
    """Per-media 64-bit aHash via Arrow-batched ``mapInPandas`` —
    partition-preserving, one Python call per Arrow batch, O(payload)
    per row. Output ``(media_id, kind, phash)``; feed to
    ``dedup.hamming_band_pairs(..., group_col='kind')`` for exact
    near-dup pairs at any hamming threshold — the multimodal analog of
    the text SimHash miner, sharing its pigeonhole band join."""

    def batches(it: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "phash": [
                        ahash64(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, PHASH_SCHEMA
    )


def media_affine_variants(
    media: DataFrame,
    every: int = 7,
    id_offset: int = 1_000_000_000,
    gain: float = 0.8,
    bias: float = 0.1,
) -> DataFrame:
    """Planted perceptual near-duplicates: every ``every``-th media row
    re-encoded after a POSITIVE AFFINE transform of its decoded content
    — brightness/contrast (``gain·px + bias``, kept inside [0,1] so no
    clipping breaks affinity) for images and every video frame, volume
    (``gain·amplitude``) for audio. The copies are byte-identical
    NOWHERE (every pixel/sample byte changes) but perceptually
    identical everywhere — exactly what :func:`ahash64` is built to
    catch and an md5/fingerprint dedup provably cannot. Copies carry
    ``media_id + id_offset``. Output schema matches the projection
    :func:`perceptual_hash_media` consumes: (media_id, kind, payload).
    """

    def batches(it: Iterator[Any]) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        from unimib_simpss_spark.operators import codecs

        for pdf in it:
            ids, kinds, payloads = [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload)
                if kind == "image":
                    g = codecs.decode_image(raw)
                    enc = codecs.encode_ppm(g * gain + bias)
                elif kind == "video":
                    frames = codecs.decode_ppm_frames(raw)
                    enc = b"".join(
                        codecs.encode_ppm(f * gain + bias) for f in frames
                    )
                elif kind == "audio":
                    sig, rate = codecs.decode_wav(raw)
                    enc = codecs.encode_wav(sig * gain, rate)
                else:
                    raise ValueError(f"unknown media kind {kind!r}")
                ids.append(int(mid) + id_offset)
                kinds.append(kind)
                payloads.append(enc)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads}
            )

    src = media.where(F.col("media_id") % every == 0).select(
        "media_id", "kind", "payload"
    )
    return src.mapInPandas(
        batches,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("kind", StringType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )
