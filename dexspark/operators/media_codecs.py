"""Real, dependency-free media codecs: WAV (stdlib ``wave``) and BMP
(struct-parsed, 24-bit uncompressed).

The multimodal pipeline's codec plug point (multimodal.real_decode)
was a declared stub because this environment has no PIL/ffmpeg. These
two formats need neither: WAV is a RIFF container the standard
library parses natively, and uncompressed 24-bit BMP is a fixed
header plus a padded BGR pixel array. Both get a REAL encoder (used
by the deterministic synthetic corpus — no external data) and a REAL
decoder producing genuine metadata and pixels/samples, so decode →
resize → feature-extract runs end-to-end on actual bytes:

- images: true width/height from the BITMAPINFOHEADER, true pixel
  array, nearest-neighbor resize over the real pixels, mean-RGB +
  grid-pooled embeddings;
- audio: true sample rate / channel count / frame count from the WAV
  header, RMS and windowed-energy embeddings over the real PCM.

JPEG/PNG/MP4 still route to the NotImplementedError plug (they
genuinely need external codecs); the Spark-side plumbing is identical
for every format, so swapping PIL/ffmpeg in touches only this module.
"""

from __future__ import annotations

import io
import struct
import wave

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
