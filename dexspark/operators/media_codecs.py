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

JPEG/MP4 still route to the NotImplementedError plug (they genuinely
need external codecs); the Spark-side plumbing is identical for every
format, so swapping PIL/ffmpeg in touches only this module.
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
