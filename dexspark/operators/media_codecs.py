"""Real, dependency-free media codecs: WAV (stdlib ``wave``), BMP
(struct-parsed, 24-bit uncompressed) and PNG (stdlib ``zlib`` inflate
+ full scanline unfiltering).

The multimodal pipeline's codec plug point (multimodal.real_decode)
was a declared stub because this environment has no PIL/ffmpeg. These
formats need neither: WAV is a RIFF container the standard library
parses natively, uncompressed 24-bit BMP is a fixed header plus a
padded BGR pixel array, and PNG is zlib-deflated scanlines behind a
chunked container — all parseable with stdlib ``struct``/``zlib``.
Each gets a REAL encoder (used by the deterministic synthetic corpus
— no external data) and a REAL decoder producing genuine metadata and
pixels/samples, so decode → resize → feature-extract runs end-to-end
on actual bytes:

- images: true width/height from the BITMAPINFOHEADER / IHDR, true
  pixel array, nearest-neighbor resize over the real pixels, mean-RGB
  + grid-pooled embeddings. The PNG decoder implements all five
  scanline filters (None/Sub/Up/Average/Paeth), CRC-checks every
  chunk, and handles 8-bit greyscale/RGB/RGBA; the encoder can write
  any filter type, so every unfilter path is bit-exact round-trip
  tested.
- audio: true sample rate / channel count / frame count from the WAV
  header, RMS and windowed-energy embeddings over the real PCM.

Round 5 adds baseline JPEG (ITU-T T.81 sequential DCT) from scratch:
numpy DCT/IDCT, the Annex K quantization/Huffman tables, JFIF
container, 4:4:4 + 4:2:0 + greyscale, DRI/RSTn restart markers —
encoder AND decoder, so lossy round-trips are PSNR-tested and every
decode path (subsampling upsample, restart resync, multi-table
DQT/DHT) is driven by our own deterministic synthesis. Only MP4
still routes to the NotImplementedError plug (video genuinely needs
ffmpeg); the Spark-side plumbing is identical for every format, so
swapping it in touches only this module.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ------------------------------------------------------------------ WAV


def encode_wav(
    samples: "np.ndarray", sample_rate: int = 16_000, n_channels: int = 1
) -> bytes:
    """int16 PCM samples -> WAV bytes (stdlib writer)."""
    pcm = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """WAV bytes -> real metadata + the PCM samples.

    Returns {sample_rate, n_channels, n_frames, duration_ms, rms,
    samples(np.int16[frames, channels])}."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch, nframes = w.getframerate(), w.getnchannels(), w.getnframes()
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        pcm = np.frombuffer(w.readframes(nframes), dtype="<i2")
    samples = pcm.reshape(-1, nch) if nch > 1 else pcm.reshape(-1, 1)
    f = samples.astype("float64")
    rms = float(np.sqrt(np.mean(f * f))) if samples.size else 0.0
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_frames": nframes,
        "duration_ms": int(round(1000.0 * nframes / rate)) if rate else 0,
        "rms": rms,
        "samples": samples,
    }


def audio_embedding(samples: "np.ndarray", dim: int = 8) -> list[float]:
    """Windowed-energy embedding over real PCM: the signal is cut into
    ``dim`` equal windows; each coordinate is that window's RMS. Unit
    normalized — the array<float> shape the ANN operators take."""
    if len(samples) == 0:
        return [0.0] * dim
    mono = np.asarray(samples, dtype="float64").reshape(len(samples), -1).mean(axis=1)
    pad = (-len(mono)) % dim
    mono = np.pad(mono, (0, pad))
    win = mono.reshape(dim, -1)
    e = np.sqrt((win * win).mean(axis=1))
    n = np.linalg.norm(e)
    return (e / n if n else e).astype("float32").tolist()


# ------------------------------------------------------------------ BMP

_BMP_HEADER = struct.Struct("<2sIHHI")  # signature, size, res, res, offset
_DIB_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """uint8 RGB array [h, w, 3] -> 24-bit uncompressed BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = w * 3
    stride = row + ((-row) % 4)
    # BMP stores rows bottom-up in BGR order — one vectorized
    # construction of the whole padded block, no per-row Python
    block = np.zeros((h, stride), dtype=np.uint8)
    block[:, :row] = px[::-1, :, ::-1].reshape(h, row)
    body = block.tobytes()
    dib = _DIB_HEADER.pack(40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    off = _BMP_HEADER.size + len(dib)
    head = _BMP_HEADER.pack(b"BM", off + len(body), 0, 0, off)
    return head + dib + bytes(body)


def decode_bmp(payload: bytes) -> dict:
    """BMP bytes -> real metadata + the RGB pixel array.

    Returns {width, height, bpp, pixels(np.uint8[h, w, 3])}. Only the
    uncompressed 24-bit BITMAPINFOHEADER form is supported — exactly
    what :func:`encode_bmp` writes."""
    sig, _size, _r1, _r2, off = _BMP_HEADER.unpack_from(payload, 0)
    if sig != b"BM":
        raise ValueError("not a BMP payload")
    (hdr, w, h, _planes, bpp, comp, *_rest) = _DIB_HEADER.unpack_from(
        payload, _BMP_HEADER.size
    )
    if hdr < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP dimensions ({w}x{h})")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    # one vectorized reshape over the whole padded pixel block (no
    # per-row Python): rows x stride -> strip padding -> BGR->RGB
    block = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=off
    ).reshape(h, stride)
    px = block[:, :row].reshape(h, w, 3)[:, :, ::-1]
    if flip:  # BMP stores bottom-up when height is positive
        px = px[::-1]
    return {"width": w, "height": h, "bpp": bpp, "pixels": np.ascontiguousarray(px)}


def resize_nearest(pixels: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Real nearest-neighbor resample over the decoded pixel array."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * (h / out_h)).astype(int).clip(0, h - 1)
    xs = (np.arange(out_w) * (w / out_w)).astype(int).clip(0, w - 1)
    return pixels[ys][:, xs]


def image_embedding(
    pixels: "np.ndarray", grid: int = 2, dim: int | None = None
) -> list[float]:
    """Grid-pooled mean-RGB embedding over real pixels: the image is
    cut into a ``grid``x``grid`` raster; each cell contributes its
    per-channel mean, plus normalized (w, h). When ``dim`` is given
    the pooled vector is resampled (linear interpolation over index
    space) to exactly ``dim`` coordinates so image and audio
    embeddings share one width — an ANN column must be
    uniform-dimensional. Unit normalized."""
    h, w = pixels.shape[:2]
    cells = []
    for gy in range(grid):
        for gx in range(grid):
            cell = pixels[
                gy * h // grid : max((gy + 1) * h // grid, gy * h // grid + 1),
                gx * w // grid : max((gx + 1) * w // grid, gx * w // grid + 1),
            ]
            cells.extend(cell.reshape(-1, 3).mean(axis=0).tolist())
    v = np.array(cells + [w / 4096.0, h / 4096.0], dtype="float64")
    if dim is not None and dim != len(v):
        v = np.interp(
            np.linspace(0, len(v) - 1, dim), np.arange(len(v)), v
        )
    n = np.linalg.norm(v)
    return (v / n if n else v).astype("float32").tolist()


# ------------------------------------------------------------------ PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_IHDR = struct.Struct(">IIBBBBB")  # w, h, depth, color, comp, filter, interlace
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # greyscale, truecolor, truecolor+alpha


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/upleft
    to the linear estimate a + b - c, ties broken left, up, upleft."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ft: int, raw, prev, bpp: int):
    """Apply filter ``ft`` to one reconstructed row (encode side).
    ``raw``/``prev`` are int arrays of the row's reconstructed bytes."""
    n = len(raw)
    if ft == 0:
        return raw & 0xFF
    if ft == 1:  # Sub
        left = np.concatenate([np.zeros(bpp, dtype=raw.dtype), raw[:-bpp]])
        return (raw - left) & 0xFF
    if ft == 2:  # Up
        return (raw - prev) & 0xFF
    if ft == 3:  # Average
        left = np.concatenate([np.zeros(bpp, dtype=raw.dtype), raw[:-bpp]])
        return (raw - ((left + prev) >> 1)) & 0xFF
    if ft == 4:  # Paeth (per-byte: the predictor is order-dependent
        # only via upleft/left of the RECONSTRUCTED row, which on the
        # encode side is just `raw` — still expressible per byte)
        out = np.empty(n, dtype=raw.dtype)
        for i in range(n):
            a = int(raw[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            out[i] = (int(raw[i]) - _paeth(a, b, c)) & 0xFF
        return out
    raise ValueError(f"bad PNG filter type {ft}")


def _unfilter_row(ft: int, enc, prev, bpp: int):
    """Invert filter ``ft`` for one scanline (decode side)."""
    n = len(enc)
    if ft == 0:
        return enc & 0xFF
    if ft == 1:  # Sub: recon[i] = enc[i] + recon[i-bpp] -> per-channel
        # prefix sum (mod-256 commutes with cumsum)
        return (np.cumsum(enc.reshape(n // bpp, bpp), axis=0) & 0xFF).reshape(n)
    if ft == 2:  # Up
        return (enc + prev) & 0xFF
    if ft == 3:  # Average: needs the just-reconstructed left byte
        rec = np.empty(n, dtype=enc.dtype)
        for i in range(n):
            a = int(rec[i - bpp]) if i >= bpp else 0
            rec[i] = (int(enc[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        return rec
    if ft == 4:  # Paeth
        rec = np.empty(n, dtype=enc.dtype)
        for i in range(n):
            a = int(rec[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            rec[i] = (int(enc[i]) + _paeth(a, b, c)) & 0xFF
        return rec
    raise ValueError(f"bad PNG filter type {ft}")


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def encode_png(pixels: "np.ndarray", filter_type: int = 0) -> bytes:
    """uint8 array [h, w] / [h, w, 1] (greyscale), [h, w, 3] (RGB) or
    [h, w, 4] (RGBA) -> PNG bytes (8-bit, non-interlaced).

    ``filter_type`` selects the scanline filter for every row (0-4) —
    real encoders pick per-row; a fixed type keeps the synthetic
    corpus deterministic while letting tests exercise every unfilter
    path bit-exactly."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    if h <= 0 or w <= 0:
        raise ValueError(f"degenerate PNG dimensions ({w}x{h})")
    rows = px.reshape(h, w * ch).astype(np.int64)
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for r in range(h):
        lines.append(filter_type)
        lines.extend(
            _filter_row(filter_type, rows[r], prev, ch).astype(np.uint8).tobytes()
        )
        prev = rows[r]
    ihdr = _IHDR.pack(w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 9))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """PNG bytes -> real metadata + the pixel array.

    Returns {width, height, color_type, channels,
    pixels(np.uint8[h, w, channels])}. Supports the 8-bit
    non-interlaced greyscale/RGB/RGBA forms with any scanline filter;
    every chunk's CRC is verified; ancillary chunks are skipped."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(typ + data) != crc:
            raise ValueError(f"PNG chunk CRC mismatch ({typ!r})")
        if typ == b"IHDR":
            ihdr = _IHDR.unpack(data)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS.get(color)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {color}")
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate PNG dimensions ({w}x{h})")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG zlib stream: {e}") from None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        prev = _unfilter_row(int(lines[r, 0]), lines[r, 1:].astype(np.int64), prev, ch)
        out[r] = prev
    return {
        "width": w,
        "height": h,
        "color_type": color,
        "channels": ch,
        "pixels": out.astype(np.uint8).reshape(h, w, ch),
    }


def png_to_rgb(decoded: dict) -> "np.ndarray":
    """Normalize a decode_png result to [h, w, 3] RGB: greyscale is
    replicated across channels, RGBA drops alpha (the downstream
    embedding/resize shapes are 3-channel)."""
    px = decoded["pixels"]
    if px.shape[2] == 1:
        return np.repeat(px, 3, axis=2)
    if px.shape[2] == 4:
        return np.ascontiguousarray(px[:, :, :3])
    return px


def probe(payload: bytes) -> dict | None:
    """Header-only metadata probe — no sample/pixel materialization.

    Returns {kind, width, height, n_frames, sample_rate?} for
    WAV/BMP payloads, None for anything else. This is what a
    metadata-only scan (decode_media) should use: reading headers is
    O(1) per payload, while a full decode is O(payload bytes) of
    wasted work when the data is discarded."""
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            with wave.open(io.BytesIO(payload), "rb") as w:
                return {
                    "kind": "audio",
                    "width": None,
                    "height": None,
                    "n_frames": w.getnframes(),
                    "sample_rate": w.getframerate(),
                }
        if payload[:2] == b"BM":
            (_hdr, w_, h_, _planes, bpp, comp, *_r) = _DIB_HEADER.unpack_from(
                payload, _BMP_HEADER.size
            )
            if bpp != 24 or comp != 0 or w_ <= 0 or h_ == 0:
                return None
            return {
                "kind": "image",
                "width": w_,
                "height": abs(h_),
                "n_frames": 1,
            }
        if payload[:8] == _PNG_SIG:
            # IHDR is mandated first: its 13 data bytes sit at a fixed
            # offset, so the probe stays O(1) — no inflate
            w_, h_, depth, color, comp, filt, inter = _IHDR.unpack_from(
                payload, 16
            )
            if (
                depth != 8 or comp != 0 or filt != 0 or inter != 0
                or color not in _PNG_CHANNELS or w_ <= 0 or h_ <= 0
            ):
                return None
            return {
                "kind": "image",
                "width": w_,
                "height": h_,
                "n_frames": 1,
            }
        if payload[:2] == b"\xff\xd8":
            # walk marker segments to SOF0/1 — O(#segments), no
            # entropy decode; progressive/arithmetic SOFs probe None
            pos = 2
            while pos + 4 <= len(payload):
                if payload[pos] != 0xFF:
                    return None
                marker = payload[pos + 1]
                if marker in (0xC0, 0xC1):
                    _p, h_, w_ = struct.unpack_from(">BHH", payload, pos + 4)
                    return {
                        "kind": "image",
                        "width": w_,
                        "height": h_,
                        "n_frames": 1,
                    }
                if marker in (
                    0xD9, 0xDA,  # EOI / SOS before any SOF: malformed
                    # non-baseline SOFs (progressive, lossless,
                    # arithmetic; NOT 0xC4/0xC8/0xCC = DHT/JPG/DAC)
                    0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
                ):
                    return None
                (ln,) = struct.unpack_from(">H", payload, pos + 2)
                pos += 2 + ln
    except Exception:
        return None
    return None


# ----------------------------------------------- deterministic synthesis


def synth_wav(seed: int, max_frames: int = 4_000) -> bytes:
    """Deterministic synthetic audio: a seeded sine mix, 16 kHz mono
    int16 — REAL WAV bytes, length/frequency derived from the seed."""
    rng = np.random.default_rng(int(seed) & ((1 << 63) - 1))
    n = int(rng.integers(400, max_frames))
    freq = float(rng.uniform(80, 2000))
    t = np.arange(n) / 16_000.0
    sig = 0.6 * np.sin(2 * np.pi * freq * t) + 0.2 * np.sin(
        2 * np.pi * 2.7 * freq * t
    )
    return encode_wav((sig * 20_000).astype("<i2"))


def synth_png(seed: int, max_side: int = 48) -> bytes:
    """Deterministic synthetic image: seeded gradient + noise, REAL
    PNG bytes. The seed also picks the scanline filter (0-4) and
    whether an alpha channel is present, so a synthetic corpus
    exercises every decode path."""
    rng = np.random.default_rng(int(seed) & ((1 << 63) - 1))
    w = int(rng.integers(8, max_side))
    h = int(rng.integers(8, max_side))
    yy, xx = np.mgrid[0:h, 0:w]
    planes = [
        (255 * xx / max(w - 1, 1)),
        (255 * yy / max(h - 1, 1)),
        rng.integers(0, 256, size=(h, w)),
    ]
    if int(seed) % 3 == 0:  # RGBA every third image
        planes.append(rng.integers(128, 256, size=(h, w)))
    px = np.stack(planes, axis=-1).astype(np.uint8)
    return encode_png(px, filter_type=int(seed) % 5)


def synth_bmp(seed: int, max_side: int = 48) -> bytes:
    """Deterministic synthetic image: seeded gradient + noise, REAL
    24-bit BMP bytes, dimensions derived from the seed."""
    rng = np.random.default_rng(int(seed) & ((1 << 63) - 1))
    w = int(rng.integers(8, max_side))
    h = int(rng.integers(8, max_side))
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (255 * xx / max(w - 1, 1)),
            (255 * yy / max(h - 1, 1)),
            rng.integers(0, 256, size=(h, w)),
        ],
        axis=-1,
    )
    return encode_bmp(base.astype(np.uint8))


# ------------------------------------------------------------------ JPEG
# Baseline sequential DCT JPEG (ITU-T T.81), dependency-free: numpy
# DCT/IDCT, the Annex K quantization + Huffman tables (public spec
# constants), JFIF container. Encoder writes 4:4:4 or 4:2:0 (and
# greyscale), optional restart markers; decoder handles any baseline
# (h,v) in {1,2} sampling, multiple DQT/DHT segments, DRI/RSTn, and
# rejects progressive (SOF2) with a clear error. Closes the last
# image-codec plug in multimodal.real_decode — only MP4 still needs
# an external decoder (ffmpeg).

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K base quantization tables (luminance K.1 / chrominance K.2)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,   12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,   14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,  18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,  47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman table specs: (BITS[1..16], HUFFVAL)
_H_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_H_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_H_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_H_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis (orthonormal): dct = _DCT8 @ B @ _DCT8.T
_DCT8 = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _DCT8[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16.0) * (
            np.sqrt(0.125) if _u == 0 else 0.5
        )


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman per T.81 C.2: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the decoder."""
    return {(l, c): s for s, (c, l) in _huff_codes(bits, vals).items()}


def _quality_scale(base: "np.ndarray", quality: int) -> "np.ndarray":
    """IJG quality scaling: 50 = the Annex K tables verbatim."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def pad_to_byte(self) -> None:  # 1-fill padding (B.1.1.5)
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


def _encode_block(bw, zz, dc_pred, dc_tab, ac_tab) -> int:
    """Huffman-encode one zigzagged quantized block; returns new DC."""
    diff = int(zz[0]) - dc_pred
    s = int(diff).bit_length() if diff else 0
    code, length = dc_tab[s]
    bw.write(code, length)
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        bw.write(v, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        if i > last_nz:
            break
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_tab[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        s = abs(v).bit_length()
        c, l = ac_tab[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, l = ac_tab[0x00]  # EOB
        bw.write(c, l)
    return int(zz[0])


def _blocks_of(plane: "np.ndarray") -> "np.ndarray":
    """(H, W) uint8 plane (already padded to /8) -> (n, 8, 8) float."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
    )


def _pad8(plane: "np.ndarray") -> "np.ndarray":
    h, w = plane.shape
    return np.pad(plane, ((0, -h % 8), (0, -w % 8)), mode="edge")


def _rgb_to_ycbcr(px: "np.ndarray") -> tuple:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _ycbcr_to_rgb(y, cb, cr) -> "np.ndarray":
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(
    pixels: "np.ndarray",
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 RGB (or HxW greyscale) uint8 -> baseline JFIF bytes.

    ``subsample`` picks the chroma layout: ``False`` = 4:4:4 (default),
    ``True`` or ``"420"`` = 4:2:0 (chroma block-averaged 2x2,
    interleaved 2x2-luma MCUs), ``"422"`` = 4:2:2 (chroma averaged
    horizontally only, 2x1-luma MCUs). ``restart_interval`` > 0 emits
    DRI + RSTn every N MCUs (the decoder's resync path)."""
    px = np.asarray(pixels)
    grey = px.ndim == 2
    h, w = px.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    mode = {False: "444", True: "420"}.get(subsample, subsample)
    if mode not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    if grey:
        comps = [(px.astype(np.float64), ql, 1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        if mode == "420":
            # pad to /16 so 2x2 block-averaging then /8 tiling is exact
            cbp = np.pad(cb, ((0, -h % 16), (0, -w % 16)), mode="edge")
            crp = np.pad(cr, ((0, -h % 16), (0, -w % 16)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            comps = [(y, ql, 2, 2), (cb, qc, 1, 1), (cr, qc, 1, 1)]
        elif mode == "422":
            # horizontal-only averaging; pad width to /16
            cbp = np.pad(cb, ((0, 0), (0, -w % 16)), mode="edge")
            crp = np.pad(cr, ((0, 0), (0, -w % 16)), mode="edge")
            cb = cbp.reshape(cbp.shape[0], cbp.shape[1] // 2, 2).mean(axis=2)
            cr = crp.reshape(crp.shape[0], crp.shape[1] // 2, 2).mean(axis=2)
            comps = [(y, ql, 2, 1), (cb, qc, 1, 1), (cr, qc, 1, 1)]
        else:
            comps = [(y, ql, 1, 1), (cb, qc, 1, 1), (cr, qc, 1, 1)]
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantized zigzag blocks per component, in MCU traversal order
    planes = []
    for plane, q, hf, vf in comps:
        want_h, want_w = mcuy * vf * 8, mcux * hf * 8
        p = np.pad(
            plane,
            ((0, want_h - plane.shape[0]), (0, want_w - plane.shape[1])),
            mode="edge",
        )
        blocks = _blocks_of(p) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", _DCT8, blocks, _DCT8)
        zz = np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]
        planes.append((zz, p.shape[1] // 8, hf, vf))

    dc_l, ac_l = _huff_codes(*_H_DC_LUMA), _huff_codes(*_H_AC_LUMA)
    dc_c, ac_c = _huff_codes(*_H_DC_CHROMA), _huff_codes(*_H_AC_CHROMA)
    tabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(comps) - 1)

    bw = _BitWriter()
    preds = [0] * len(comps)
    scan = bytearray()
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.pad_to_byte()
            scan += bytes(bw.out)
            scan += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (zz, bw_blocks, hf, vf) in enumerate(planes):
            for v in range(vf):
                for hh in range(hf):
                    bi = (my * vf + v) * bw_blocks + (mx * hf + hh)
                    preds[ci] = _encode_block(
                        bw, zz[bi], preds[ci], tabs[ci][0], tabs[ci][1]
                    )
    bw.pad_to_byte()
    scan += bytes(bw.out)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(ql.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    if not grey:
        out += _seg(
            0xDB, bytes([1]) + bytes(qc.reshape(-1)[_ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_p, _q, hf, vf) in enumerate(comps):
        sof += bytes([i + 1, (hf << 4) | vf, 0 if i == 0 else 1])
    out += _seg(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, _H_DC_LUMA), (1, 0, _H_AC_LUMA),
        (0, 1, _H_DC_CHROMA), (1, 1, _H_AC_CHROMA),
    ):
        if grey and tid == 1:
            continue
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment reader: un-stuffs FF00, stops at markers, and
    resynchronizes across RSTn on demand."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker()
            else:  # real marker (EOI/...): decoder over-read
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if not self._n:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Align to the next RSTn and consume it."""
        self._acc = self._n = 0
        d = self.data
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _decode_huff(br: "_BitReader", lookup) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = lookup.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> dict:
    """Baseline JFIF bytes -> {width, height, n_channels, pixels}.

    ``pixels`` is HxWx3 uint8 RGB (greyscale replicated). Supports
    multiple DQT/DHT segments, sampling factors in {1,2} (4:4:4,
    4:2:2, 4:2:0), DRI/RSTn resync; rejects progressive (SOF2) and
    arithmetic-coded streams with explicit errors. Truncated or
    corrupt payloads always raise ValueError (the per-item isolation
    contract every codec here shares)."""
    try:
        return _decode_jpeg(payload)
    except ValueError:
        raise
    except (IndexError, struct.error, KeyError) as exc:
        raise ValueError(f"corrupt or truncated JPEG: {exc}") from exc


def _decode_jpeg(payload: bytes) -> dict:
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan_order = None
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError("bad marker stream")
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", d, pos + 2)
        body = d[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                o += 1
                if pq:  # 16-bit table
                    tbl = np.frombuffer(body, dtype=">u2", count=64, offset=o)
                    o += 128
                else:
                    tbl = np.frombuffer(body, dtype=np.uint8, count=64, offset=o)
                    o += 64
                z = np.zeros(64, dtype=np.int64)
                z[_ZIGZAG] = tbl.astype(np.int64)
                qt[tq] = z.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                (huff_ac if cls else huff_dc)[tid] = _huff_lookup(bits, vals)
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG supported (got SOF "
                f"0x{marker:02x} — progressive/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_order = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan_order.append((cs, tabs >> 4, tabs & 0xF))
            break
        # APPn / COM / others: skipped
    if comps is None or scan_order is None:
        raise ValueError("missing SOF/SOS")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise ValueError("sampling factors beyond 2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, dct, act in scan_order:
        c = by_id[cs]
        order.append((c, huff_dc[dct], huff_ac[act], qt[c["tq"]]))
    for c, *_r in order:
        c["coef"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        c["zz"] = np.zeros(
            (mcuy * c["v"] * mcux * c["h"], 64), dtype=np.int64
        )
    br = _BitReader(d, pos)
    preds = [0] * len(order)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            preds = [0] * len(order)
        my, mx = divmod(m, mcux)
        for ci, (c, dctab, actab, q) in enumerate(order):
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    try:
                        s = _decode_huff(br, dctab)
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, actab)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            s = rs & 0xF
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                    except _RestartMarker as exc:
                        raise ValueError(
                            "unexpected restart marker (corrupt stream)"
                        ) from exc
                    bi = (my * c["v"] + v) * (mcux * c["h"]) + mx * c["h"] + hh
                    c["zz"][bi] = zz
    # dequantize + IDCT, whole component at once
    planes = []
    for c, _dc, _ac, q in order:
        blk = np.zeros((c["zz"].shape[0], 64), dtype=np.float64)
        blk[:, _ZIGZAG] = c["zz"]
        blk = blk.reshape(-1, 8, 8) * q
        spat = np.einsum("xu,nuv,yv->nxy", _DCT8.T, blk, _DCT8.T) + 128.0
        bh, bwid = mcuy * c["v"], mcux * c["h"]
        plane = (
            spat.reshape(bh, bwid, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bwid * 8)
        )
        # upsample to full resolution (nearest), then crop
        plane = np.repeat(
            np.repeat(plane, hmax // c["h"], axis=1), vmax // c["v"], axis=0
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        grey = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        px = np.stack([grey] * 3, axis=-1)
    else:
        px = _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    return {"width": w, "height": h, "n_channels": 3, "pixels": px}


def synth_jpeg(seed: int, max_side: int = 48) -> bytes:
    """Deterministic synthetic image -> REAL baseline JPEG bytes.
    The seed picks dimensions, quality, 4:4:4 vs 4:2:0, and whether
    restart markers are emitted, so a synthetic corpus exercises
    every decode path."""
    rng = np.random.default_rng(int(seed) & ((1 << 63) - 1))
    w = int(rng.integers(8, max_side))
    h = int(rng.integers(8, max_side))
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [
            255 * xx / max(w - 1, 1),
            255 * yy / max(h - 1, 1),
            128 + 96 * np.sin(xx / 5.0) * np.cos(yy / 7.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    return encode_jpeg(
        px,
        quality=int(rng.integers(70, 96)),
        subsample=bool(int(seed) % 2),
        restart_interval=0 if int(seed) % 3 == 0 else 4,
    )
