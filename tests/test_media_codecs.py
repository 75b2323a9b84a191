"""Real dependency-free media codecs (operators/media_codecs) and
their Spark pipeline (multimodal.decode_media / media_features /
resize_images) — actual WAV/BMP bytes, actual samples/pixels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dexspark.operators import media_codecs as mc
from dexspark.operators.multimodal import (
    decode_media,
    frame_sample,
    media_features,
    media_from_documents_real,
    real_decode,
    resize_images,
)


# ------------------------------------------------------------ pure codecs


def test_wav_roundtrip_exact():
    sig = (np.sin(np.arange(1000) / 7.0) * 12_000).astype("<i2")
    payload = mc.encode_wav(sig, sample_rate=8_000)
    d = mc.decode_wav(payload)
    assert d["sample_rate"] == 8_000
    assert d["n_channels"] == 1
    assert d["n_frames"] == 1000
    assert d["duration_ms"] == 125
    assert np.array_equal(d["samples"][:, 0], sig)  # bit-exact PCM
    ref_rms = float(np.sqrt(np.mean(sig.astype("float64") ** 2)))
    assert abs(d["rms"] - ref_rms) < 1e-9


def test_wav_stereo_and_embedding():
    sig = np.stack(
        [np.arange(600) % 100, (np.arange(600) * 3) % 77], axis=1
    ).astype("<i2")
    d = mc.decode_wav(mc.encode_wav(sig.reshape(-1), n_channels=2))
    assert d["n_channels"] == 2 and d["n_frames"] == 600
    emb = mc.audio_embedding(d["samples"], dim=8)
    assert len(emb) == 8
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-5


def test_bmp_roundtrip_exact():
    px = np.zeros((5, 7, 3), dtype=np.uint8)
    px[..., 0] = np.arange(7)[None, :] * 30  # R gradient
    px[..., 1] = np.arange(5)[:, None] * 40  # G gradient
    px[2, 3] = (1, 2, 3)
    payload = mc.encode_bmp(px)
    d = mc.decode_bmp(payload)
    assert (d["width"], d["height"], d["bpp"]) == (7, 5, 24)
    assert np.array_equal(d["pixels"], px)  # bit-exact pixels
    with pytest.raises(ValueError):
        mc.decode_bmp(b"NOPE" + payload)


def test_resize_nearest_real_pixels():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[2:, 2:] = 255  # bottom-right quadrant white
    out = mc.resize_nearest(px, 2, 2)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [0, 0, 0]
    assert out[1, 1].tolist() == [255, 255, 255]
    emb = mc.image_embedding(px, grid=2)
    assert len(emb) == 3 * 4 + 2
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-5


def test_real_decode_dispatch():
    wav = mc.synth_wav(7)
    bmp = mc.synth_bmp(7)
    png = mc.synth_png(7)
    dw = real_decode(wav, "audio")
    assert dw["sample_rate"] == 16_000 and dw["n_frames"] > 0
    db = real_decode(bmp, "image")
    assert db["width"] >= 8 and db["height"] >= 8
    dp = real_decode(png, "image")
    assert dp["width"] >= 8 and dp["pixels"].shape[2] == 3  # RGB-normal
    jpg = mc.synth_jpeg(7)
    dj = real_decode(jpg, "image")
    assert dj["width"] >= 8 and dj["pixels"].shape[2] == 3
    with pytest.raises(NotImplementedError):
        # MP4 ftyp box: the one remaining external-codec plug
        real_decode(b"\x00\x00\x00\x18ftypmp42....", "video")


# ------------------------------------------------------------ Spark path


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "web") for i in range(12)],
        "doc_id long, text string, source string",
    )
    return media_from_documents_real(docs)


def test_decode_media_real_metadata(spark, media):
    rows = {r["media_id"]: r for r in decode_media(media).collect()}
    assert len(rows) == 12
    for mid, r in rows.items():
        if r["kind"] == "image":
            b = bytes(r["payload"])
            if b[:8] == mc._PNG_SIG:
                d = mc.decode_png(b)
            elif b[:2] == b"\xff\xd8":
                d = mc.decode_jpeg(b)
            else:
                d = mc.decode_bmp(b)
            assert (r["width"], r["height"]) == (d["width"], d["height"])
            assert r["n_frames"] == 1
        else:
            d = mc.decode_wav(bytes(r["payload"]))
            assert r["n_frames"] == d["n_frames"]
            assert r["width"] is None and r["height"] is None
    # frame_sample composes on the real decode output
    fs = frame_sample(decode_media(media))
    assert fs.count() >= 12


def test_media_features_real_embeddings(spark, media):
    rows = media_features(media, dim=8).collect()
    assert len(rows) == 12
    for r in rows:
        assert r["embedding"] is not None
        v = np.array(r["embedding"])
        assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    # deterministic: same input -> same embeddings
    again = {r["media_id"]: r["embedding"] for r in media_features(media, dim=8).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["embedding"]


def test_resize_images_real(spark, media):
    out = resize_images(decode_media(media), max_w=10, max_h=10).collect()
    for r in out:
        if r["kind"] != "image":
            assert r["out_w"] is None and r["resized_payload"] is None
            continue
        assert 1 <= r["out_w"] <= 10 and 1 <= r["out_h"] <= 10
        rb = bytes(r["resized_payload"])
        # format-preserving: PNG in -> PNG out, JPEG in -> JPEG out,
        # BMP in -> BMP out
        src = bytes(r["payload"])
        if src[:8] == mc._PNG_SIG:
            assert rb[:8] == mc._PNG_SIG
            d = mc.decode_png(rb)
        elif src[:2] == b"\xff\xd8":
            assert rb[:2] == b"\xff\xd8"
            d = mc.decode_jpeg(rb)
        else:
            assert rb[:2] == b"BM"
            d = mc.decode_bmp(rb)
        # the resized payload really decodes to the declared box
        assert (d["width"], d["height"]) == (r["out_w"], r["out_h"])
        # aspect preserved within integer rounding
        if r["width"] >= r["height"]:
            assert r["out_w"] >= r["out_h"] - 1
        else:
            assert r["out_h"] >= r["out_w"] - 1


def test_undecodable_payload_isolated(spark):
    # every malformed shape that previously could kill the task:
    # PNG-ish-but-not-PNG bytes, corrupt real PNG, RIFF-but-not-WAVE
    # (wave.Error), truncated BM (struct.error), zero-width BMP
    bad_bmp = mc.synth_bmp(3)[:10]
    zero_w = bytearray(mc.synth_bmp(4))
    struct_w_off = 18  # BITMAPINFOHEADER width field
    zero_w[struct_w_off : struct_w_off + 4] = (0).to_bytes(4, "little")
    bad_png = bytearray(mc.synth_png(6))
    bad_png[25] ^= 0xFF  # corrupt IHDR -> CRC mismatch
    rows = [
        (1, "image", bytearray(b"\x89PNGnotreallydecodable"), None),
        (2, "audio", bytearray(b"RIFF\x00\x00\x00\x00AVI LIST"), None),
        (3, "image", bytearray(bad_bmp), None),
        (4, "image", zero_w, None),
        (5, "image", bad_png, None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta string"
    )
    got = {r["media_id"]: r for r in decode_media(df).collect()}
    assert len(got) == 5  # no task death: every row survives
    assert got[1]["width"] is None and got[1]["n_frames"] is None
    assert got[1]["n_bytes"] == 22
    assert got[2]["n_frames"] is None  # RIFF-non-WAVE isolated
    assert got[3]["width"] is None  # truncated header isolated
    assert got[5]["width"] is None  # corrupt PNG isolated
    feats = {r["media_id"]: r["embedding"] for r in media_features(df).collect()}
    assert all(v is None for v in feats.values())
    rz = {r["media_id"]: r for r in resize_images(decode_media(df)).collect()}
    assert all(r["out_w"] is None for r in rz.values())


def test_embedding_dims_uniform_across_kinds(spark, media):
    """One ANN column = one vector width: image and audio embeddings
    must share the requested dim."""
    dims = {
        len(r["embedding"]) for r in media_features(media, dim=8).collect()
    }
    assert dims == {8}


def test_edge_cases_pure():
    # zero-frame WAV: embedding is the zero vector, not a crash
    empty = mc.encode_wav(np.array([], dtype="<i2"))
    d = mc.decode_wav(empty)
    assert d["n_frames"] == 0 and d["rms"] == 0.0
    assert mc.audio_embedding(d["samples"], dim=4) == [0.0] * 4
    # negative doc_id seeds synthesize fine (seed masking)
    assert mc.synth_wav(-3)[:4] == b"RIFF"
    assert mc.synth_bmp(-3)[:2] == b"BM"
    # header-only probe agrees with the full decode
    wav, bmp = mc.synth_wav(9), mc.synth_bmp(9)
    assert mc.probe(wav)["n_frames"] == mc.decode_wav(wav)["n_frames"]
    pb = mc.probe(bmp)
    db = mc.decode_bmp(bmp)
    assert (pb["width"], pb["height"]) == (db["width"], db["height"])
    assert mc.probe(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert mc.probe(b"BMxx") is None


# ------------------------------------------------------------ PNG codec


def test_png_roundtrip_exact_all_filters_and_channels():
    """Bit-exact encode->decode across every scanline filter
    (None/Sub/Up/Average/Paeth) and channel layout (grey/RGB/RGBA)."""
    rng = np.random.default_rng(42)
    for ch in (1, 3, 4):
        px = rng.integers(0, 256, size=(11, 9, ch)).astype(np.uint8)
        for ft in range(5):
            d = mc.decode_png(mc.encode_png(px, filter_type=ft))
            assert (d["width"], d["height"], d["channels"]) == (9, 11, ch)
            assert np.array_equal(d["pixels"], px), (ch, ft)
    # 2D greyscale input accepted
    g = rng.integers(0, 256, size=(5, 6)).astype(np.uint8)
    d = mc.decode_png(mc.encode_png(g, filter_type=4))
    assert np.array_equal(d["pixels"][:, :, 0], g)


def test_png_to_rgb_normalization():
    rng = np.random.default_rng(3)
    grey = rng.integers(0, 256, size=(4, 5, 1)).astype(np.uint8)
    rgb3 = mc.png_to_rgb(mc.decode_png(mc.encode_png(grey)))
    assert rgb3.shape == (4, 5, 3)
    assert np.array_equal(rgb3[..., 0], grey[..., 0])
    assert np.array_equal(rgb3[..., 1], grey[..., 0])
    rgba = rng.integers(0, 256, size=(4, 5, 4)).astype(np.uint8)
    out = mc.png_to_rgb(mc.decode_png(mc.encode_png(rgba)))
    assert out.shape == (4, 5, 3)
    assert np.array_equal(out, rgba[..., :3])


def test_png_malformed_rejected():
    good = mc.encode_png(np.zeros((3, 3, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="not a PNG"):
        mc.decode_png(b"\x89PNX" + good[4:])
    # CRC corruption detected
    bad = bytearray(good)
    bad[20] ^= 0xFF  # inside IHDR data
    with pytest.raises(ValueError, match="CRC"):
        mc.decode_png(bytes(bad))
    # truncation inside IDAT: either the chunk-length check or the
    # zlib-stream check fires, both as ValueError (never zlib.error)
    idat_start = 8 + 12 + 13  # sig + IHDR chunk
    for cut in (idat_start + 7, idat_start + 13):
        with pytest.raises(ValueError):
            mc.decode_png(good[:cut])
    # unsupported bit depth via a hand-built IHDR
    ihdr = mc._IHDR.pack(3, 3, 16, 2, 0, 0, 0)
    doc = mc._PNG_SIG + mc._png_chunk(b"IHDR", ihdr) + mc._png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        mc.decode_png(doc)
    with pytest.raises(ValueError, match="channel count"):
        mc.encode_png(np.zeros((2, 2, 2), dtype=np.uint8))


def test_png_ancillary_chunks_skipped():
    """tEXt and other ancillary chunks between IHDR and IDAT are
    skipped (real-world PNGs carry them)."""
    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    good = mc.encode_png(px)
    # splice a tEXt chunk after IHDR (sig 8 + IHDR chunk 12+13=25)
    cut = 8 + 12 + 13
    text = mc._png_chunk(b"tEXt", b"Comment\x00synthetic")
    spliced = good[:cut] + text + good[cut:]
    d = mc.decode_png(spliced)
    assert np.array_equal(d["pixels"], px)
    assert mc.probe(spliced)["width"] == 3


def test_png_probe_and_synth():
    png = mc.synth_png(12)
    p = mc.probe(png)
    d = mc.decode_png(png)
    assert p["kind"] == "image"
    assert (p["width"], p["height"]) == (d["width"], d["height"])
    assert mc.synth_png(-5)[:8] == mc._PNG_SIG  # negative seeds fine
    # seed 0 mod 3 == 0 -> RGBA; seed 1 -> RGB
    assert mc.decode_png(mc.synth_png(0))["channels"] == 4
    assert mc.decode_png(mc.synth_png(1))["channels"] == 3
    # filters rotate with the seed: all five appear over 5 seeds
    fts = set()
    for s in range(5):
        raw = zlib_inflate_first_scanline(mc.synth_png(s))
        fts.add(raw)
    assert fts == {0, 1, 2, 3, 4}


def zlib_inflate_first_scanline(png: bytes) -> int:
    """First scanline's filter byte (test helper)."""
    import struct as _s
    import zlib as _z

    pos, idat = 8, b""
    while pos + 12 <= len(png):
        (ln,) = _s.unpack_from(">I", png, pos)
        typ = png[pos + 4 : pos + 8]
        if typ == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    return _z.decompress(idat)[0]


def test_png_through_spark_pipeline(spark):
    """decode_media / media_features / resize_images over a corpus
    whose images are all PNG: real header metadata, unit embeddings,
    format-preserving resize."""
    docs = spark.createDataFrame(
        [(i * 4, f"t{i}", "web") for i in range(1, 7)],  # %4==0 -> PNG
        "doc_id long, text string, source string",
    )
    media = media_from_documents_real(docs)
    payloads = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }
    assert all(b[:8] == mc._PNG_SIG for b in payloads.values())
    rows = {r["media_id"]: r for r in decode_media(media).collect()}
    for mid, r in rows.items():
        d = mc.decode_png(payloads[mid])
        assert (r["width"], r["height"]) == (d["width"], d["height"])
    feats = media_features(media, dim=8).collect()
    assert all(
        abs(np.linalg.norm(np.array(r["embedding"])) - 1.0) < 1e-4
        for r in feats
    )
    rz = resize_images(decode_media(media), max_w=10, max_h=10).collect()
    for r in rz:
        out = mc.decode_png(bytes(r["resized_payload"]))
        assert (out["width"], out["height"]) == (r["out_w"], r["out_h"])
        assert out["channels"] == 3  # RGB-normalized re-encode


# ------------------------------------------------------------ JPEG codec


def _psnr(a, b) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else float(10 * np.log10(255**2 / mse))


def _grad_image(h=37, w=53):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            255 * xx / (w - 1),
            255 * yy / (h - 1),
            128 + 96 * np.sin(xx / 5.0) * np.cos(yy / 7.0),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_roundtrip_psnr_all_modes():
    """Lossy codec bar: decode(encode(img)) stays close to the source
    across 4:4:4 / 4:2:0 and with/without restart markers, on odd
    (non-multiple-of-8/16) dimensions."""
    img = _grad_image()
    for subsample in (False, True):
        for ri in (0, 4):
            b = mc.encode_jpeg(img, quality=85, subsample=subsample,
                               restart_interval=ri)
            d = mc.decode_jpeg(b)
            assert (d["width"], d["height"]) == (53, 37)
            floor = 30.0 if subsample else 38.0
            assert _psnr(img, d["pixels"]) > floor, (subsample, ri)


def test_jpeg_quality_monotone():
    """Higher quality -> strictly better PSNR and larger payload —
    the quantization-table scaling behaves per the IJG curve."""
    img = _grad_image()
    stats = []
    for q in (30, 60, 90):
        b = mc.encode_jpeg(img, quality=q)
        stats.append((len(b), _psnr(img, mc.decode_jpeg(b)["pixels"])))
    sizes, psnrs = zip(*stats)
    assert sizes[0] < sizes[1] < sizes[2]
    assert psnrs[0] < psnrs[1] < psnrs[2]


def test_jpeg_uniform_block_exact():
    """A uniform image is DC-only: the round trip must be EXACT (the
    DCT/quant/Huffman chain introduces zero error on it) — a
    known-value check that catches table/zigzag/predictor bugs that
    PSNR thresholds would absorb."""
    for val in (0, 77, 128, 255):
        u = np.full((16, 24, 3), val, np.uint8)
        d = mc.decode_jpeg(mc.encode_jpeg(u, quality=90))
        assert int(np.abs(d["pixels"].astype(int) - val).max()) == 0, val


def test_jpeg_greyscale_and_determinism():
    g = (_grad_image()[..., 0]).astype(np.uint8)
    b1 = mc.encode_jpeg(g, quality=90)
    b2 = mc.encode_jpeg(g, quality=90)
    assert b1 == b2  # bit-deterministic encoder
    d = mc.decode_jpeg(b1)
    assert d["pixels"].shape == (37, 53, 3)  # grey replicated to RGB
    assert _psnr(np.stack([g] * 3, -1), d["pixels"]) > 40


def test_jpeg_rejects_progressive_and_garbage():
    b = bytearray(mc.encode_jpeg(_grad_image()))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        mc.decode_jpeg(bytes(b))
    assert mc.probe(bytes(b)) is None  # probe refuses non-baseline too
    with pytest.raises(ValueError):
        mc.decode_jpeg(b"\x00\x01\x02")


def test_jpeg_probe_and_synth_paths():
    """probe() reads dims from the marker walk only; the synth corpus
    covers 4:4:4, 4:2:0, restart and no-restart streams."""
    saw_ss = saw_ri = False
    for seed in range(12):
        payload = mc.synth_jpeg(seed)
        p = mc.probe(payload)
        d = mc.decode_jpeg(payload)
        assert p == {
            "kind": "image",
            "width": d["width"],
            "height": d["height"],
            "n_frames": 1,
        }
        saw_ss = saw_ss or bool(seed % 2)
        saw_ri = saw_ri or (seed % 3 != 0)
    assert saw_ss and saw_ri


def test_jpeg_through_spark_pipeline(spark):
    """decode_media / media_features / resize_images over a corpus
    whose images are all JPEG: header metadata matches the full
    decode, embeddings are unit-norm, and resize re-encodes JPEG."""
    from dexspark.operators.multimodal import (
        decode_media as dm,
        media_features as mf,
        media_from_documents_real as mk,
        resize_images as rz,
    )

    docs = spark.createDataFrame(
        # doc_id % 4 == 2 and even -> image lane, JPEG branch
        [(i, f"t{i}", "web") for i in (2, 6, 10, 14, 18, 22)],
        "doc_id long, text string, source string",
    )
    media = mk(docs)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert all(b[:2] == b"\xff\xd8" for b in payloads.values())
    rows = {r["media_id"]: r for r in dm(media).collect()}
    for mid, r in rows.items():
        d = mc.decode_jpeg(payloads[mid])
        assert (r["width"], r["height"]) == (d["width"], d["height"])
    feats = mf(media, dim=8).collect()
    assert all(
        r["embedding"] is not None
        and abs(np.linalg.norm(np.array(r["embedding"])) - 1.0) < 1e-4
        for r in feats
    )
    for r in rz(dm(media), max_w=10, max_h=10).collect():
        out = mc.decode_jpeg(bytes(r["resized_payload"]))
        assert (out["width"], out["height"]) == (r["out_w"], r["out_h"])


def test_jpeg_truncation_always_valueerror():
    """The per-item isolation contract: any truncation point raises
    ValueError (never IndexError/KeyError/struct.error), so the Spark
    pipelines' except-and-NULL isolation holds for every malformed
    payload shape."""
    b = mc.synth_jpeg(5)
    for cut in range(8, len(b), max(1, len(b) // 40)):
        try:
            mc.decode_jpeg(b[:cut])
        except ValueError:
            pass  # the only permitted failure type


def test_jpeg_422_between_420_and_444():
    """4:2:2 halves chroma horizontally only: fidelity and size land
    strictly between 4:2:0 and 4:4:4 on a chroma-varying image, and
    the decoder's (2,1)-sampling upsample path round-trips it."""
    img = _grad_image()
    stats = {}
    for mode in ("420", "422", "444"):
        b = mc.encode_jpeg(img, quality=85, subsample=mode,
                           restart_interval=3)
        stats[mode] = (len(b), _psnr(img, mc.decode_jpeg(b)["pixels"]))
    assert stats["420"][0] < stats["422"][0] < stats["444"][0]
    assert stats["420"][1] < stats["422"][1] < stats["444"][1]
    assert stats["422"][1] > 32
    with pytest.raises(ValueError, match="subsampling"):
        mc.encode_jpeg(img, subsample="411")
