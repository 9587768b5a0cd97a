"""Pure-NumPy codecs for UNCOMPRESSED media formats (VERDICT r9 #2).

The container has no PIL/soundfile/PyAV, but uncompressed formats need
none of them — their specs are fixed headers + raw sample arrays, which
NumPy parses directly:

- **PCM WAV** (RIFF): chunk walk → ``fmt `` (PCM only) + ``data``;
  8-bit unsigned and 16-bit signed little-endian, any channel count
  (averaged to mono). The decode result is the float64 signal in
  [-1, 1] plus the sample rate — exactly what ``soundfile.read`` would
  hand the resample stage.
- **PPM/PGM** (netpbm P6/P5): whitespace/comment-tolerant ASCII header,
  maxval ≤ 255, raw raster. RGB → grayscale via the ITU-R BT.601 luma
  weights (0.299, 0.587, 0.114).
- **BMP** (BITMAPINFOHEADER, 24 bpp, BI_RGB): bottom-up rows with
  4-byte padding, BGR byte order.
- **PPM stream** (concatenated P6 frames — ffmpeg's ``image2pipe``
  ppm output): the uncompressed video analog; frames parse
  sequentially from one payload.

Everything here is driver/executor-agnostic pure NumPy — it runs inside
Arrow-batched ``mapInPandas`` workers (operators/multimodal.py) with no
extra dependencies. Encoders exist so tests and the real-payload media
builder can synthesize valid fixture bytes deterministically.

The reference (PCampi/unimib-simpss) has no media surface; this closes
the engine's last stubbed decode step for one real format per modality
(compressed codecs — JPEG/H.264/FLAC — still genuinely require external
libs and remain out of scope).
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-R BT.601 luma weights for RGB → grayscale
_LUMA = np.array([0.299, 0.587, 0.114])


def _malformed_raises_valueerror(fn):
    """Decoder contract: malformed/truncated payloads raise ValueError,
    never a parser internal (a payload with a valid magic but a cut-off
    header raises struct.error from ``unpack_from`` — callers like
    multimodal._real_decode wrap ValueError only, so anything else would
    escape as a raw executor exception)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (struct.error, IndexError) as exc:
            raise ValueError(f"malformed payload: {exc}") from exc

    return wrapped


# ------------------------------------------------------------------- WAV
def encode_wav(signal: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Minimal canonical RIFF/WAVE writer: mono PCM, 8 or 16 bit.
    ``signal`` is float in [-1, 1] (clipped)."""
    sig = np.clip(np.asarray(signal, dtype=np.float64), -1.0, 1.0)
    if bits == 16:
        data = (sig * 32767.0).round().astype("<i2").tobytes()
    elif bits == 8:
        data = ((sig * 127.5) + 127.5).round().clip(0, 255).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    block_align = bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, 1, rate, rate * block_align, block_align, bits
    )
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(data)), data,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@_malformed_raises_valueerror
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF chunk walk → (mono float64 signal in [-1, 1], sample_rate).
    Supports PCM (format tag 1) at 8 or 16 bits, any channel count."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt_fields = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_fields is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, n_ch, rate, _, _, bits = fmt_fields
    if tag != 1:
        raise ValueError(f"only PCM WAV supported (format tag {tag})")
    if rate <= 0 or n_ch <= 0:
        raise ValueError(
            f"degenerate WAV fmt chunk (rate={rate}, channels={n_ch})"
        )
    if bits == 16:
        sig = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    elif bits == 8:
        sig = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 127.5) / 127.5
    else:
        raise ValueError(f"only 8/16-bit PCM supported (got {bits})")
    if n_ch > 1:
        sig = sig[: len(sig) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return sig, int(rate)


# --------------------------------------------------------------- PPM/PGM
def encode_ppm(grid01: np.ndarray) -> bytes:
    """P6 writer: grayscale [0,1] grid → RGB triplets (r=g=b)."""
    g = np.clip(np.asarray(grid01, dtype=np.float64), 0.0, 1.0)
    h, w = g.shape
    raster = np.repeat((g * 255.0).round().astype(np.uint8).ravel(), 3)
    return f"P6\n{w} {h}\n255\n".encode() + raster.tobytes()


def encode_pgm(grid01: np.ndarray) -> bytes:
    """P5 writer: grayscale [0,1] grid, 1 byte per pixel."""
    g = np.clip(np.asarray(grid01, dtype=np.float64), 0.0, 1.0)
    h, w = g.shape
    return f"P5\n{w} {h}\n255\n".encode() + (
        (g * 255.0).round().astype(np.uint8).tobytes()
    )


def _pnm_header(payload: bytes, pos: int) -> tuple[bytes, int, int, int, int]:
    """Parse magic + 3 header ints (w, h, maxval) starting at ``pos``,
    skipping whitespace and ``#`` comments per the netpbm spec. Returns
    (magic, w, h, maxval, raster_start)."""
    magic = payload[pos : pos + 2]
    pos += 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace / comments
        while pos < len(payload):
            c = payload[pos : pos + 1]
            if c == b"#":
                nl = payload.find(b"\n", pos)
                pos = len(payload) if nl < 0 else nl + 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PNM header")
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte before the raster
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("only 1-byte-per-sample PNM supported")
    return magic, w, h, maxval, pos


def _decode_pnm_at(payload: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Decode one P5/P6 image starting at ``pos``; returns (grid01,
    next_pos) so concatenated streams parse frame-by-frame."""
    magic, w, h, maxval, rpos = _pnm_header(payload, pos)
    if magic == b"P6":
        n = w * h * 3
        px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=rpos)
        grid = (px.reshape(h, w, 3).astype(np.float64) @ _LUMA) / maxval
    elif magic == b"P5":
        n = w * h
        px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=rpos)
        grid = px.reshape(h, w).astype(np.float64) / maxval
    else:
        raise ValueError(f"not a P5/P6 payload (magic {magic!r})")
    return grid, rpos + n


@_malformed_raises_valueerror
def decode_pnm(payload: bytes) -> np.ndarray:
    """Single P5/P6 image → grayscale float64 grid in [0, 1]."""
    grid, _ = _decode_pnm_at(payload, 0)
    return grid


@_malformed_raises_valueerror
def decode_ppm_frames(payload: bytes) -> list[np.ndarray]:
    """Concatenated-P6 stream (ffmpeg image2pipe ppm) → list of
    grayscale grids, one per frame."""
    frames: list[np.ndarray] = []
    pos = 0
    while pos < len(payload):
        grid, pos = _decode_pnm_at(payload, pos)
        frames.append(grid)
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
    if not frames:
        raise ValueError("empty PPM stream")
    return frames


# -------------------------------------------------------------------- BMP
def encode_bmp(grid01: np.ndarray) -> bytes:
    """24-bpp BI_RGB BMP writer (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding, BGR order) from a grayscale [0,1] grid."""
    g = np.clip(np.asarray(grid01, dtype=np.float64), 0.0, 1.0)
    h, w = g.shape
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    vals = (g * 255.0).round().astype(np.uint8)
    rgb = np.repeat(vals[::-1], 3, axis=1)  # bottom-up, b=g=r
    raster[:, : w * 3] = rgb
    data = raster.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    return header + info + data


@_malformed_raises_valueerror
def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bpp BI_RGB BMP → grayscale float64 grid in [0, 1]."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bpp BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=h * row_bytes, offset=offset
    ).reshape(h, row_bytes)
    bgr = raster[:, : w * 3].reshape(h, w, 3).astype(np.float64)
    if bottom_up:
        bgr = bgr[::-1]
    return (bgr @ _LUMA[::-1]) / 255.0  # BGR order → reversed luma weights


# ------------------------------------------------------------------ sniff
@_malformed_raises_valueerror
def decode_image(payload: bytes) -> np.ndarray:
    """Sniff-and-decode a single image payload (P5/P6/BMP) to a
    grayscale [0,1] grid."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_pnm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError(f"unrecognized image magic {payload[:2]!r}")
