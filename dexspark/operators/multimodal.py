"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through per-row Python.

Codecs (rounds 4-5): REAL for the dependency-free formats — WAV via
the stdlib wave module, 24-bit uncompressed BMP via struct parsing,
PNG via stdlib zlib + scanline unfiltering, and baseline JPEG via a
from-scratch T.81 Huffman + numpy-DCT codec (operators/media_codecs;
lossless formats bit-exact round-trip tested, JPEG PSNR/quality-
monotonicity tested; real resize over actual pixels, embeddings over
actual samples). ``real_decode`` dispatches by magic bytes; only MP4
still raises NotImplementedError at the plug point (video needs
ffmpeg, not in this container) — swapping it in touches only that
dispatch. The original hash-derived stub path (``decode_media_stub``)
is kept for the oracle-pinned driver query and as the
format-agnostic stand-in. Everything Spark-side — schema, batch
shape, partition behavior, per-item error isolation — is tested
(tests/test_multimodal.py, tests/test_media_codecs.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("meta", T.StringType(), True),  # sidecar JSON
    ]
)

DECODED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields)
    + [
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sha_prefix", T.StringType(), True),
    ]
)


def real_decode(payload: bytes, kind: str) -> dict:
    """Codec plug point, dispatched by magic bytes.

    REAL for the dependency-free formats (operators/media_codecs):
    WAV (``RIFF``) via the stdlib wave module, 24-bit uncompressed BMP
    (``BM``) via struct parsing, PNG (``\\x89PNG``) via stdlib zlib +
    full scanline unfiltering, and baseline JPEG (``\\xff\\xd8``) via
    the T.81 Huffman + numpy-DCT decoder — genuine metadata, pixels
    and PCM. Only MP4 (needs ffmpeg, not in this environment) still
    raises NotImplementedError; swapping a video codec in touches
    only this dispatch."""
    from . import media_codecs as mc

    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        d = mc.decode_wav(payload)
        return {
            "width": None,
            "height": None,
            "n_frames": d["n_frames"],
            "sample_rate": d["sample_rate"],
            "n_channels": d["n_channels"],
            "duration_ms": d["duration_ms"],
            "rms": d["rms"],
            "samples": d["samples"],
        }
    if payload[:2] == b"BM":
        d = mc.decode_bmp(payload)
        return {
            "width": d["width"],
            "height": d["height"],
            "n_frames": 1,
            "pixels": d["pixels"],
        }
    if payload[:8] == mc._PNG_SIG:
        d = mc.decode_png(payload)
        return {
            "width": d["width"],
            "height": d["height"],
            "n_frames": 1,
            # RGB-normalized (grey replicated, alpha dropped): the
            # downstream resize/embedding shapes are 3-channel
            "pixels": mc.png_to_rgb(d),
        }
    if payload[:2] == b"\xff\xd8":
        d = mc.decode_jpeg(payload)
        return {
            "width": d["width"],
            "height": d["height"],
            "n_frames": 1,
            "pixels": d["pixels"],
        }
    raise NotImplementedError(
        f"no dependency-free codec for this {kind} payload "
        "(MP4 needs ffmpeg)"
    )


def decode_media_stub(df: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': derives deterministic metadata from the
    payload bytes (stand-in for real decode; same plumbing/shape)."""

    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            payloads = pdf["payload"]
            # vectorized length over the Arrow-backed bytes column; the
            # per-item digest below is the codec stand-in itself (a real
            # decoder is inherently per-payload work at this plug point)
            n_bytes = payloads.str.len().fillna(0).astype("int32")
            digests = payloads.map(
                lambda b: hashlib.sha256(b or b"").hexdigest()
            )
            seed = digests.str[:8].apply(int, base=16)
            pdf["n_bytes"] = n_bytes
            pdf["width"] = (seed % 1920 + 1).astype("int32")
            pdf["height"] = (seed // 1920 % 1080 + 1).astype("int32")
            pdf["n_frames"] = (
                (seed % 240 + 1).where(pdf["kind"].eq("video"), 1).astype("int32")
            )
            pdf["sha_prefix"] = digests.str[:16]
            yield pdf[DECODED_SCHEMA.fieldNames()]

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode for WAV/BMP/PNG/JPEG payloads (same
    output schema as the stub path — the two are interchangeable
    downstream). width/height come from the actual image headers
    (JPEG: a marker walk to SOF0); audio n_frames from the actual WAV
    header. Payloads with no dependency-free codec get
    NULL dimensions (they would route to the external-codec plug in a
    PIL/ffmpeg deployment) rather than failing the batch — per-item
    error isolation, the engine's quarantine philosophy."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            n_bytes, widths, heights, frames, shas = [], [], [], [], []
            from . import media_codecs as mc

            for p in pdf["payload"]:
                b = bytes(p or b"")
                n_bytes.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest()[:16])
                # header-only probe: O(1) per payload — a full decode
                # would materialize every sample/pixel only to read
                # width/height/n_frames off the fixed headers
                d = mc.probe(b)
                widths.append(d.get("width") if d else None)
                heights.append(d.get("height") if d else None)
                frames.append(d.get("n_frames") if d else None)
            pdf["n_bytes"] = pd.array(n_bytes, dtype="int32")
            pdf["width"] = pd.array(widths, dtype="Int32")
            pdf["height"] = pd.array(heights, dtype="Int32")
            pdf["n_frames"] = pd.array(frames, dtype="Int32")
            pdf["sha_prefix"] = shas
            yield pdf[DECODED_SCHEMA.fieldNames()]

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def media_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """REAL feature extraction over decodable payloads: windowed-RMS
    energy embeddings for WAV, grid-pooled mean-RGB for BMP/PNG/JPEG —
    computed from the actual samples/pixels (operators/media_codecs). Output
    shape matches the embeddings table, so ANN/cosine-dedup run on it
    unchanged. Undecodable payloads yield NULL embeddings."""
    from . import media_codecs as mc

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for p in pdf["payload"]:
                b = bytes(p or b"")
                try:
                    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                        vecs.append(
                            mc.audio_embedding(mc.decode_wav(b)["samples"], dim)
                        )
                    elif b[:2] == b"BM":
                        # dim-resampled so image and audio vectors
                        # share ONE width (an ANN column must be
                        # uniform-dimensional)
                        vecs.append(
                            mc.image_embedding(mc.decode_bmp(b)["pixels"], dim=dim)
                        )
                    elif b[:8] == mc._PNG_SIG:
                        vecs.append(
                            mc.image_embedding(
                                mc.png_to_rgb(mc.decode_png(b)), dim=dim
                            )
                        )
                    elif b[:2] == b"\xff\xd8":
                        vecs.append(
                            mc.image_embedding(
                                mc.decode_jpeg(b)["pixels"], dim=dim
                            )
                        )
                    else:
                        vecs.append(None)
                except Exception:  # malformed payload: NULL, keep row
                    vecs.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": vecs,
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


def resize_images(
    decoded: DataFrame, max_w: int = 224, max_h: int = 224
) -> DataFrame:
    """REAL image resize: decodes the BMP/PNG/JPEG payload,
    nearest-neighbor resamples the actual pixel array to fit the box
    (aspect preserved), and re-encodes in the SAME format as the
    output payload. Non-image / undecodable payloads pass through
    untouched with NULL out dims."""
    from . import media_codecs as mc

    out_schema = T.StructType(
        list(DECODED_SCHEMA.fields)
        + [
            T.StructField("out_w", T.IntegerType(), True),
            T.StructField("out_h", T.IntegerType(), True),
            T.StructField("resized_payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            ows, ohs, outs = [], [], []
            for p in pdf["payload"]:
                b = bytes(p or b"")
                try:
                    if b[:2] == b"BM":
                        d = mc.decode_bmp(b)
                        px, enc = d["pixels"], mc.encode_bmp
                    elif b[:8] == mc._PNG_SIG:
                        # resize runs on the RGB-normalized pixels and
                        # re-encodes PNG (filter 0): same format out
                        d = mc.decode_png(b)
                        px, enc = mc.png_to_rgb(d), mc.encode_png
                    elif b[:2] == b"\xff\xd8":
                        d = mc.decode_jpeg(b)
                        px, enc = d["pixels"], mc.encode_jpeg
                    else:
                        raise ValueError("not an image payload")
                    if d["width"] <= 0 or d["height"] <= 0:
                        raise ValueError("degenerate dimensions")
                    scale = min(max_w / d["width"], max_h / d["height"], 1.0)
                    ow = max(1, int(d["width"] * scale))
                    oh = max(1, int(d["height"] * scale))
                    ows.append(ow), ohs.append(oh)
                    outs.append(enc(mc.resize_nearest(px, ow, oh)))
                except Exception:  # non-image / malformed: pass through
                    ows.append(None), ohs.append(None), outs.append(None)
            pdf["out_w"] = pd.array(ows, dtype="Int32")
            pdf["out_h"] = pd.array(ohs, dtype="Int32")
            pdf["resized_payload"] = outs
            yield pdf[out_schema.fieldNames()]

    return decoded.mapInPandas(batches, schema=out_schema)


def media_from_documents_real(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table with REAL payloads: each
    doc becomes a genuine WAV (seeded sine mix) or genuine image —
    rotating BMP / PNG / JPEG (seeded gradient; the PNG synth cycles
    through all five scanline filters and RGBA, the JPEG synth through
    quality levels, 4:4:4 / 4:2:0 and restart intervals) keyed by
    doc_id — no external data, real codecs
    (operators/media_codecs.synth_*). Runs as mapInPandas so the
    synthesis is Arrow-batched like every other media op."""
    src = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("kind"),
        F.to_json(F.struct("source")).alias("meta"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import media_codecs as mc

        def synth(mid: int, kind: str) -> bytes:
            if kind != "image":
                return mc.synth_wav(mid)
            if mid % 4 == 0:
                return mc.synth_png(mid)
            if mid % 4 == 2:
                return mc.synth_jpeg(mid)
            return mc.synth_bmp(mid)

        for pdf in it:
            payloads = [
                synth(int(mid), kind)
                for mid, kind in zip(pdf["media_id"], pdf["kind"])
            ]
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf[MEDIA_SCHEMA.fieldNames()]

    return src.mapInPandas(batches, schema=MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic media table from `documents` (text
    bytes as the opaque payload) — no external data."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.to_json(F.struct("lang", "source")).alias("meta"),
    )


def resize_stub(decoded: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Arrow-batched 'resize': scales width/height to fit the target
    box (aspect preserved) and derives a deterministic stand-in for
    the resized payload (sha256 of original bytes + target box — the
    real PIL/ffmpeg resample plugs in at ``real_decode``). Plumbing —
    schema, batch shape, pass-through of untouched columns — is real."""
    import hashlib

    out_schema = T.StructType(
        list(DECODED_SCHEMA.fields)
        + [
            T.StructField("out_w", T.IntegerType(), True),
            T.StructField("out_h", T.IntegerType(), True),
            T.StructField("resized_sha", T.StringType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            scale = (max_w / pdf["width"]).combine(max_h / pdf["height"], min).clip(upper=1.0)
            pdf["out_w"] = (pdf["width"] * scale).astype(int).clip(lower=1).astype("int32")
            pdf["out_h"] = (pdf["height"] * scale).astype(int).clip(lower=1).astype("int32")
            pdf["resized_sha"] = [
                hashlib.sha256((p or b"") + f"|{w}x{h}".encode()).hexdigest()[:16]
                for p, w, h in zip(pdf["payload"], pdf["out_w"], pdf["out_h"])
            ]
            yield pdf[out_schema.fieldNames()]

    return decoded.mapInPandas(batches, schema=out_schema)


def extract_features_stub(decoded: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched 'feature extraction': a deterministic unit-norm
    float vector per media item derived from the payload digest (the
    real encoder — CLIP/wav2vec — plugs in at ``real_decode``).
    Output shape matches the embeddings table (array<float>), so the
    ANN / cosine-dedup operators run on it unchanged."""
    import hashlib

    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for p in pdf["payload"]:
                dig = hashlib.sha256(p or b"").digest()
                raw = np.frombuffer((dig * ((dim * 4) // len(dig) + 1))[: dim * 4], dtype="<i4")
                v = raw.astype("float64")
                v = v / (np.linalg.norm(v) or 1.0)
                vecs.append(v.astype("float32").tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "embedding": vecs}
            )

    return decoded.mapInPandas(batches, schema=out_schema)


def frame_sample(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for videos: one row per sampled frame index
    (explode of a JVM-generated sequence — no Python in the path)."""
    frames = F.when(
        F.col("kind") == "video",
        F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)),
    ).otherwise(F.array(F.lit(0)))
    return decoded.select(
        "media_id",
        "kind",
        F.explode(frames).alias("frame_idx"),
        "width",
        "height",
        "n_bytes",
        "sha_prefix",
    )
