"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through per-row Python.

The actual codec step is STUBBED (no image/audio libraries in this
container): ``decode_image_stub`` derives deterministic fake
width/height/n_frames from the payload hash, and the real-codec hook
raises NotImplementedError where PIL/ffmpeg would plug in. Everything
Spark-side — schema, batch shape, partition behavior — is real and
tested (tests/test_multimodal.py).
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


def real_decode(payload: bytes, kind: str):  # pragma: no cover - stub
    """Plug point for PIL / torchaudio / ffmpeg. Not available here."""
    raise NotImplementedError("media codecs are not installed in this environment")


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
