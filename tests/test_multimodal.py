"""Multimodal operator tests: the Spark-side plumbing (schemas, Arrow
batch shapes, partition behavior) is real and verified. The codec step
has two modes: ``decoder="fake"`` (deterministic byte-level stand-in
for arbitrary bytes) and ``decoder="real"`` — pure-NumPy parsers for
one UNCOMPRESSED format per modality (PCM WAV, PPM/PGM/BMP, ppm-stream
video; VERDICT r9 #2). Compressed codecs still need libs absent from
this container, and the real decoder must reject them loudly."""

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


def test_real_decode_rejects_unparseable_payloads(media):
    """The raw-bytes media table's payloads are utf-8 text, not valid
    WAV/PPM/BMP — decoder='real' must refuse them with the
    NotImplementedError that names the missing compressed-codec libs,
    never silently fall back to the fake path."""
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

    def test_real_decoder_rejects_unparseable_payloads(self, spark, sf_dir):
        import pytest as _pytest

        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators import multimodal as M

        media = M.media_from_documents(load_table(spark, sf_dir, "documents"))
        with _pytest.raises(Exception, match="NotImplementedError|unrecognized"):
            M.resize_media(media, decoder="real").collect()

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

    def test_real_decoder_rejects_unparseable_payloads(self, spark, sf_dir):
        import pytest as _pytest

        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators import multimodal as M

        media = M.media_from_documents(load_table(spark, sf_dir, "documents"))
        with _pytest.raises(Exception, match="NotImplementedError|RIFF"):
            M.resample_audio(media, decoder="real").collect()

    def test_truncated_payload_with_valid_magic_raises_valueerror(self):
        """ADVICE r10 — a payload whose magic sniffs fine but whose
        header is cut off must raise ValueError (the decoders' contract,
        what _real_decode wraps), not leak struct.error from
        unpack_from as a raw executor exception."""
        import numpy as np
        import pytest as _pytest

        from unimib_simpss_spark.operators import codecs as C

        wav = C.encode_wav(np.linspace(-1, 1, 64), 8_000)
        bmp = C.encode_bmp(np.linspace(0, 1, 64).reshape(8, 8))
        for trunc in (wav[:14], wav[:20]):
            with _pytest.raises(ValueError):
                C.decode_wav(trunc)
        for trunc in (bmp[:16], bmp[:10]):
            with _pytest.raises(ValueError):
                C.decode_image(trunc)

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


class TestRealCodecs:
    """VERDICT r9 #2 — the pure-NumPy uncompressed decoders, both as
    units (exact roundtrips) and end-to-end through the Spark
    mapInPandas plumbing with decoder='real'."""

    def test_wav_roundtrip_16_and_8_bit(self):
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C

        sig = np.sin(np.linspace(0, 20 * np.pi, 1600))
        dec, rate = C.decode_wav(C.encode_wav(sig, 16_000, bits=16))
        assert rate == 16_000 and len(dec) == 1600
        assert np.abs(dec - sig).max() < 1 / 32000
        d8, r8 = C.decode_wav(C.encode_wav(sig, 8_000, bits=8))
        assert r8 == 8_000 and np.abs(d8 - sig).max() < 1 / 250

    def test_wav_multichannel_averages_to_mono(self):
        import struct

        import numpy as np

        from unimib_simpss_spark.operators import codecs as C

        # hand-build a 2-channel PCM16 WAV: L = ramp, R = -ramp → mono 0
        n, rate = 64, 8_000
        ramp = (np.arange(n) * 100).astype("<i2")
        inter = np.empty(2 * n, dtype="<i2")
        inter[0::2], inter[1::2] = ramp, -ramp
        data = inter.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        sig, r = C.decode_wav(payload)
        assert r == rate and len(sig) == n
        assert np.abs(sig).max() < 1e-9

    def test_pnm_roundtrip_and_comment_header(self):
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C

        g = np.random.default_rng(3).random((13, 17))
        gq = np.round(g * 255) / 255
        assert np.abs(C.decode_pnm(C.encode_ppm(g)) - gq).max() < 1e-9
        assert np.abs(C.decode_pnm(C.encode_pgm(g)) - gq).max() < 1e-9
        with_comment = (
            b"P5\n# netpbm allows comments\n17 13\n255\n"
            + (gq * 255).round().astype(np.uint8).tobytes()
        )
        assert np.abs(C.decode_pnm(with_comment) - gq).max() < 1e-9

    def test_bmp_roundtrip_with_row_padding(self):
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C

        # width 7 → 21 raster bytes/row, padded to 24: exercises the
        # 4-byte alignment and the bottom-up row flip
        g = np.random.default_rng(5).random((9, 7))
        out = C.decode_bmp(C.encode_bmp(g))
        assert out.shape == (9, 7)
        assert np.abs(out - np.round(g * 255) / 255).max() < 1e-9
        assert C.decode_image(C.encode_bmp(g)).shape == (9, 7)

    def test_ppm_stream_frames(self):
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C

        rng = np.random.default_rng(11)
        frames = [rng.random((5, 6)) for _ in range(3)]
        got = C.decode_ppm_frames(b"".join(C.encode_ppm(f) for f in frames))
        assert len(got) == 3
        for gf, f in zip(got, frames):
            assert np.abs(gf - np.round(f * 255) / 255).max() < 1e-9

    def test_png_roundtrip_exact_and_sniffed(self):
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C

        g = np.random.default_rng(7).random((11, 13))
        gq = np.round(g * 255) / 255
        out = C.decode_png(C.encode_png(g))
        assert out.shape == (11, 13)
        assert np.abs(out - gq).max() < 1e-12  # exact: uint8 → /255
        # the sniff dispatches on the 8-byte PNG signature
        assert np.abs(C.decode_image(C.encode_png(g)) - gq).max() < 1e-12

    def _build_png(self, scanlines: bytes, w, h, ctype) -> bytes:
        import struct
        import zlib

        from unimib_simpss_spark.operators import codecs as C

        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (
            C._PNG_SIG
            + C._png_chunk(b"IHDR", ihdr)
            + C._png_chunk(b"IDAT", zlib.compress(scanlines))
            + C._png_chunk(b"IEND", b"")
        )

    def test_png_all_five_filter_types_unfilter_exactly(self):
        """Forward-filter a known grayscale raster with every filter
        type (spec §9 reference arithmetic, implemented independently
        here) and require the decoder to reconstruct the raw bytes —
        the encoder only emits filter None, so this is the only cover
        for Sub/Up/Average/Paeth."""
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C

        rng = np.random.default_rng(13)
        h, w, bpp = 10, 7, 1
        raw = rng.integers(0, 256, size=(h, w), dtype=np.uint8)

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        lines = bytearray()
        filters = [0, 1, 2, 3, 4, 2, 1, 4, 3, 0]
        for y, f in enumerate(filters):
            lines.append(f)
            for x in range(w):
                cur = int(raw[y, x])
                a = int(raw[y, x - bpp]) if x >= bpp else 0
                b = int(raw[y - 1, x]) if y else 0
                c = int(raw[y - 1, x - bpp]) if (y and x >= bpp) else 0
                if f == 0:
                    v = cur
                elif f == 1:
                    v = cur - a
                elif f == 2:
                    v = cur - b
                elif f == 3:
                    v = cur - ((a + b) >> 1)
                else:
                    v = cur - paeth(a, b, c)
                lines.append(v & 0xFF)
        out = C.decode_png(self._build_png(bytes(lines), w, h, ctype=0))
        assert np.array_equal((out * 255).round().astype(np.uint8), raw)

    def test_png_unfilter_wavefront_matches_scalar_reference(self):
        """The wavefront un-filter (VERDICT r12 #5) against the
        byte-at-a-time spec transcription it replaced, over random
        rasters, random per-row filters, and every supported bpp —
        the exactness pin for the vectorized formulation."""
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C

        rng = np.random.default_rng(23)
        for bpp in (1, 2, 3, 4):
            for h, w in ((1, 1), (1, 9), (7, 1), (13, 11), (32, 5)):
                stride = w * bpp
                arr = np.empty((h, stride + 1), dtype=np.uint8)
                arr[:, 0] = rng.integers(0, 5, size=h)
                arr[:, 1:] = rng.integers(0, 256, size=(h, stride))
                assert np.array_equal(
                    C._png_unfilter(arr, stride, bpp),
                    C._png_unfilter_scalar(arr, stride, bpp),
                ), (bpp, h, w, arr[:, 0].tolist())

    def test_png_large_adaptive_filtered_decodes_fast_and_exact(self):
        """VERDICT r12 #5's done-bar: a ≥256×256 PNG whose rows
        alternate Average/Paeth (the adaptive-filter worst case that
        the old per-pixel path crawled through) must decode exactly
        and in interactive time — the wavefront makes it H+W NumPy
        steps, not H×W interpreted Paeth evaluations."""
        import struct
        import time
        import zlib

        import numpy as np

        from unimib_simpss_spark.operators import codecs as C

        rng = np.random.default_rng(29)
        h = w = 256
        raw = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        # forward-filter with the scalar spec arithmetic (independent
        # of the decoder under test)
        lines = bytearray()
        for y in range(h):
            f = 3 if y % 2 else 4
            lines.append(f)
            prev = raw[y - 1].astype(np.int64) if y else np.zeros(w, np.int64)
            rec = raw[y].astype(np.int64)
            for x in range(w):
                a = int(rec[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                lines.append((int(rec[x]) - pred) & 0xFF)
        png = self._build_png(bytes(lines), w, h, ctype=0)
        t0 = time.perf_counter()
        out = C.decode_png(png)
        dt = time.perf_counter() - t0
        assert np.array_equal((out * 255).round().astype(np.uint8), raw)
        # generous CI bound — the wavefront runs this in ~10-30 ms,
        # the old per-pixel path took seconds
        assert dt < 1.0, f"adaptive-filtered decode took {dt:.2f}s"

    def test_png_rgb_and_rgba_luma(self):
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C

        rng = np.random.default_rng(17)
        h, w = 5, 4
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        lines = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
        out = C.decode_png(self._build_png(lines, w, h, ctype=2))
        want = (rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])) / 255.0
        assert np.abs(out - want).max() < 1e-12
        # RGBA: alpha byte ignored, same luma
        rgba = np.concatenate(
            [rgb, rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8)], axis=2
        )
        lines4 = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
        out4 = C.decode_png(self._build_png(lines4, w, h, ctype=6))
        assert np.abs(out4 - want).max() < 1e-12

    def test_png_malformed_payloads_raise_valueerror(self):
        import numpy as np
        import pytest as _pytest

        from unimib_simpss_spark.operators import codecs as C

        good = C.encode_png(np.random.default_rng(19).random((6, 6)))
        # flip one IDAT byte → CRC mismatch must be loud, not garbage
        bad = bytearray(good)
        bad[len(good) // 2] ^= 0xFF
        with _pytest.raises(ValueError):
            C.decode_png(bytes(bad))
        with _pytest.raises(ValueError, match="truncated|missing|size"):
            C.decode_png(good[: len(good) - 20])
        with _pytest.raises(ValueError, match="not a PNG"):
            C.decode_png(b"\x89PNX" + good[4:])
        # palette color type declined loudly
        lines = bytes([0, 1, 2, 0, 3, 4])
        with _pytest.raises(ValueError, match="color type"):
            C.decode_png(self._build_png(lines, 2, 2, ctype=3))

    def test_real_decode_end_to_end(self, spark, sf_dir):
        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators import multimodal as M

        docs = load_table(spark, sf_dir, "documents").limit(30)
        rmedia = M.media_with_real_payloads(docs)
        out = M.decode_media(rmedia, decoder="real").collect()
        assert len(out) == 30
        for r in out:
            assert len(r.features) == M.N_FEATURES
            assert abs(sum(r.features) - 1.0) < 1e-3  # L1-normalized
        # deterministic
        again = M.decode_media(rmedia, decoder="real").collect()
        assert {r.media_id: r.features for r in out} == {
            r.media_id: r.features for r in again
        }

    def test_real_resize_mean_preservation_and_parsed_dims(self, spark):
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C
        from unimib_simpss_spark.operators import multimodal as M

        # 16x16 PPM → 8x8: blocks tile evenly → pooled mean == source
        # mean exactly; src dims must come from the PARSED header, not
        # the (deliberately wrong) metadata
        grid = np.arange(256).reshape(16, 16) / 255.0
        payload = C.encode_ppm(grid)
        media = spark.createDataFrame(
            [(1, "image", bytearray(payload), (99, 99, None, None, "ppm"))],
            M.MEDIA_SCHEMA,
        )
        r = M.resize_media(media, width=8, height=8, decoder="real").collect()[0]
        assert (r.src_w, r.src_h) == (16, 16)  # parsed, not meta's 99
        gq = np.round(grid * 255) / 255
        assert abs(float(np.mean(r.pixels)) - float(gq.mean())) < 1e-6

    def test_real_resize_video_uses_first_frame(self, spark):
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C
        from unimib_simpss_spark.operators import multimodal as M

        f0 = np.zeros((6, 8))  # all-black first frame
        f1 = np.ones((6, 8))  # all-white second
        payload = C.encode_ppm(f0) + C.encode_ppm(f1)
        media = spark.createDataFrame(
            [(2, "video", bytearray(payload), (8, 6, None, 750, "ppm_stream"))],
            M.MEDIA_SCHEMA,
        )
        r = M.resize_media(media, width=4, height=3, decoder="real").collect()[0]
        assert (r.src_w, r.src_h) == (8, 6)
        assert max(r.pixels) < 1e-9  # frame 0 (black), not frame 1

    def test_real_resample_sample_count_and_parsed_rate(self, spark):
        import numpy as np

        from unimib_simpss_spark.operators import codecs as C
        from unimib_simpss_spark.operators import multimodal as M

        sig = np.sin(np.linspace(0, 40 * np.pi, 2000))
        payload = C.encode_wav(sig, 16_000, bits=16)
        # metadata lies about the rate; the parsed RIFF rate must win
        media = spark.createDataFrame(
            [(3, "audio", bytearray(payload), (None, None, 44_100, 125, "pcm16"))],
            M.MEDIA_SCHEMA,
        )
        r = M.resample_audio(media, target_rate=8_000, decoder="real").collect()[0]
        assert r.src_rate == 16_000  # parsed from the file
        assert r.n_samples == 1000  # 2000 @16k → 1000 @8k
        assert len(r.features) == M.N_FEATURES
        assert all(0.0 <= f <= 1.0 for f in r.features)
        # |sin| mean-envelope ≈ 2/π in every full bin
        assert abs(float(np.mean(r.features)) - 2 / np.pi) < 0.05

    def test_real_media_builder_metadata_is_truthful(self, spark, sf_dir):
        from unimib_simpss_spark.catalog import load_table
        from unimib_simpss_spark.operators import codecs as C
        from unimib_simpss_spark.operators import multimodal as M

        docs = load_table(spark, sf_dir, "documents").limit(12)
        rows = M.media_with_real_payloads(docs).collect()
        assert {r.kind for r in rows} == {"image", "audio", "video"}
        for r in rows:
            if r.kind == "image":
                g = C.decode_image(bytes(r.payload))
                assert g.shape == (r.meta.height, r.meta.width)
            elif r.kind == "audio":
                sig, rate = C.decode_wav(bytes(r.payload))
                assert rate == r.meta.sample_rate
                assert len(sig) * 1000 // rate == r.meta.duration_ms
            else:
                frames = C.decode_ppm_frames(bytes(r.payload))
                assert len(frames) == 3
                assert frames[0].shape == (r.meta.height, r.meta.width)


class TestPerceptualDedup:
    """aHash + generic hamming band join (x75): affine invariance,
    band-join exactness vs brute force (incl. sign-bit hashes), and
    100% recall on planted re-encoded copies."""

    def test_ahash_affine_invariance_pre_quantization(self):
        import numpy as np

        from unimib_simpss_spark.operators.codecs import encode_ppm, encode_wav
        from unimib_simpss_spark.operators.multimodal import ahash64

        rng = np.random.default_rng(7)
        g = rng.random((24, 40)) * 0.8 + 0.1
        # exact invariance on the float grid: same 64 bits either way
        a = ahash64(encode_ppm(g), "image")
        # 8-bit quantization of the transformed grid can flip blocks
        # sitting exactly on the mean; allow hamming <= 2
        b = ahash64(encode_ppm(g * 0.75 + 0.15), "image")
        assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 2
        sig = rng.random(4000) * 2 - 1
        wa = ahash64(encode_wav(sig, 16000), "audio")
        wb = ahash64(encode_wav(sig * 0.5, 16000), "audio")
        assert bin((wa ^ wb) & ((1 << 64) - 1)).count("1") <= 2

    def test_hamming_band_pairs_exact_vs_brute_force(self, spark):
        from pyspark.sql import functions as F

        from unimib_simpss_spark.operators.dedup import hamming_band_pairs

        # deterministic 64-bit signatures, some with bit 63 set
        # (negative longs — unsigned shifts must not sign-smear), plus
        # planted near-identical pairs
        base = spark.range(60).select(
            F.col("id"), F.xxhash64(F.col("id")).alias("h")
        )
        close = base.where(F.col("id") % 5 == 0).select(
            (F.col("id") + 1000).alias("id"),
            F.col("h")
            .bitwiseXOR(F.expr(f"CAST({(1 << 62) + 3} AS BIGINT)"))
            .alias("h"),
        )
        sigs = base.unionAll(close)
        rows = [(r.id, r.h) for r in sigs.collect()]
        for d in (0, 3, 5):
            want = sorted(
                (a, b, bin((ha ^ hb) & ((1 << 64) - 1)).count("1"))
                for a, ha in rows
                for b, hb in rows
                if a < b
                and bin((ha ^ hb) & ((1 << 64) - 1)).count("1") <= d
            )
            got = sorted(
                (r.id1, r.id2, r.hamming)
                for r in hamming_band_pairs(
                    sigs, "id", "h", max_hamming=d, bits=64
                ).collect()
            )
            assert got == want, d

    def test_hamming_band_pairs_validates(self, spark):
        import pytest as _pytest

        from unimib_simpss_spark.operators.dedup import hamming_band_pairs

        df = spark.range(1).select(F.col("id"), F.col("id").alias("h"))
        with _pytest.raises(ValueError, match="max_hamming"):
            hamming_band_pairs(df, "id", "h", max_hamming=-1)
        with _pytest.raises(ValueError, match="max_hamming"):
            hamming_band_pairs(df, "id", "h", max_hamming=64, bits=64)

    def test_x75_recall_on_planted_copies(self, spark, sf_dir):
        from unimib_simpss_spark.plans.llm_multimodal import (
            x75_perceptual_dedup,
        )

        rows = x75_perceptual_dedup(spark, sf_dir).collect()
        # every pair links an original to its planted re-encoded copy:
        # same kind, id2 = id1 + 1e9, tight hamming
        assert len(rows) > 0
        assert all(r.id2 == r.id1 + 1_000_000_000 for r in rows)
        assert all(r.hamming <= 3 for r in rows)
        assert all(r.id1 % 7 == 0 for r in rows)
        # near-total recall: 8-bit re-quantization can flip blocks
        # sitting exactly on the mean past the hamming-3 gate for the
        # occasional near-constant payload — bound it, don't wish it
        # away (precision stays exact: every reported pair IS a
        # planted copy, asserted above)
        import pyspark.sql.functions as F_

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_planted = docs.where(F_.col("doc_id") % 7 == 0).count()
        assert len(rows) >= 0.95 * n_planted
