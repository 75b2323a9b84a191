"""Multimodal plumbing: binary payload columns + Arrow-batched decode
stub + frame sampling (schema/partitioning real, codec stubbed)."""

import pytest
from pyspark.sql import functions as F

from dexspark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_media_stub,
    extract_features_stub,
    frame_sample,
    media_from_documents,
    real_decode,
    resize_stub,
)


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"text payload {i}", "en", "web") for i in range(9)],
        "doc_id long, text string, lang string, source string",
    )
    return media_from_documents(docs)


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_stub_deterministic(media):
    a = {r["media_id"]: r.asDict() for r in decode_media_stub(media).collect()}
    b = {r["media_id"]: r.asDict() for r in decode_media_stub(media).collect()}
    assert a == b
    row = a[0]
    assert row["n_bytes"] == len("text payload 0")
    assert 1 <= row["width"] <= 1920 and 1 <= row["height"] <= 1080
    assert len(row["sha_prefix"]) == 16


def test_non_video_gets_one_frame(media):
    decoded = decode_media_stub(media)
    frames = frame_sample(decoded, every_n=30)
    per = {
        r["media_id"]: r["cnt"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("cnt")).collect()
    }
    kinds = {r["media_id"]: r["kind"] for r in decoded.collect()}
    nf = {r["media_id"]: r["n_frames"] for r in decoded.collect()}
    for mid, k in kinds.items():
        if k == "video":
            assert per[mid] == (nf[mid] - 1) // 30 + 1
        else:
            assert per[mid] == 1


def test_decode_is_arrow_batched(media):
    plan = decode_media_stub(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_real_codec_is_stubbed():
    # only MP4 still routes to the external-codec plug
    # (WAV/BMP/PNG/JPEG are real dependency-free codecs now)
    with pytest.raises(NotImplementedError):
        real_decode(b"\x00\x00\x00\x18ftypmp42", "video")


def test_decoded_schema_stable(media):
    assert decode_media_stub(media).schema == DECODED_SCHEMA


def test_resize_preserves_aspect_and_bounds(media):
    rs = resize_stub(decode_media_stub(media), max_w=224, max_h=224)
    for r in rs.collect():
        assert 1 <= r["out_w"] <= 224 and 1 <= r["out_h"] <= 224
        # aspect preserved within integer rounding; never upscaled
        assert r["out_w"] <= r["width"] and r["out_h"] <= r["height"]
        if r["width"] > 224 or r["height"] > 224:
            assert r["out_w"] == 224 or r["out_h"] == 224
        assert len(r["resized_sha"]) == 16
    plan = rs._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_feature_extraction_matches_embeddings_shape(media):
    feats = extract_features_stub(decode_media_stub(media), dim=8)
    rows = feats.collect()
    assert dict(feats.dtypes)["embedding"] == "array<float>"
    for r in rows:
        assert len(r["embedding"]) == 8
        norm = sum(x * x for x in r["embedding"]) ** 0.5
        assert abs(norm - 1.0) < 1e-3  # unit-norm, ANN-ready
    # deterministic across runs
    again = extract_features_stub(decode_media_stub(media), dim=8).collect()
    assert {r["media_id"]: r["embedding"] for r in rows} == {
        r["media_id"]: r["embedding"] for r in again
    }
