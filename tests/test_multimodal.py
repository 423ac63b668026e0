"""Multimodal binary-column operators: schema, batch plumbing, cardinality."""

import hashlib

import pytest

from pyspark.sql import functions as F

from databatchprotectionservice_spark.operators.multimodal import (
    FRAME_BYTES,
    decode_media,
    extract_features,
    media_table,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return media_table(spark, sf_dir).cache()


def test_media_table_schema(media):
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["meta"] == "struct<n_bytes:int,checksum:string>"
    row = media.first()
    assert row.meta.n_bytes == len(row.payload)


def test_decode_fake_is_deterministic(media):
    a = {r.doc_id: (r.width, r.height) for r in decode_media(media).collect()}
    b = {r.doc_id: (r.width, r.height) for r in decode_media(media).collect()}
    assert a == b
    assert all(16 <= w < 256 and 16 <= h < 256 for w, h in a.values())


def test_decode_real_requires_codec_for_unknown_formats(media):
    """mode="real" decodes PPM/BMP; payloads in any OTHER format (here:
    raw text bytes) surface NotImplementedError at execution — the seam
    where Pillow/ffmpeg would slot in."""
    with pytest.raises(Exception, match="no codec for media"):
        decode_media(media, mode="real").collect()


def test_decode_real_roundtrips_generated_images(spark, sf_dir):
    """The real path end-to-end: text bytes -> PPM/BMP/PNG/JPEG/GIF
    containers -> real decoder -> raster md5 equals the closed form
    (flat padded text for the lossless flat formats; the 8x8
    constant-tile expansion for baseline JPEG, which is bit-exact for
    constant blocks under all-ones quantization; the byte-tripled
    expansion for palette-indexed GIF)."""
    import numpy as np

    from databatchprotectionservice_spark.operators.multimodal import (
        IMG_W,
        image_table,
    )
    from databatchprotectionservice_spark.plans.registry import load

    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents").limit(40).collect()
    }
    decoded = {
        r.doc_id: r
        for r in decode_media(image_table(spark, sf_dir), mode="real")
        .filter(F.col("doc_id").isin(list(docs)))
        .collect()
    }
    assert set(decoded) == set(docs)
    for doc_id, text in docs.items():
        r = decoded[doc_id]
        raw = text.encode("utf-8")
        # jp/gf legs build pixels from CODEPOINTS folded to printable
        # ASCII (ord(c) % 95 + 32) so the oracle's character-indexed
        # substr() agrees on non-ASCII text; pad stays a raw space
        vals = bytes((ord(ch) % 95 + 32) for ch in text)
        if doc_id % 5 == 3:  # JPEG constant-tile fixture
            trs = max((len(vals) + IMG_W - 1) // IMG_W, 1)
            tiles = np.frombuffer(
                vals.ljust(trs * IMG_W, b" "), dtype=np.uint8
            ).reshape(trs, IMG_W)
            gray = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
            raster = np.repeat(gray[:, :, None], 3, axis=2).tobytes()
            assert r.fmt == "jpeg"
            assert (r.width, r.height) == (IMG_W * 8, trs * 8)
            assert r.raster_md5 == hashlib.md5(raster).hexdigest()
            continue
        if doc_id % 5 == 4:  # GIF identity-palette fixture
            trs = max((len(vals) + IMG_W - 1) // IMG_W, 1)
            padded = vals.ljust(trs * IMG_W, b" ")
            raster = bytes(b for ch in padded for b in (ch, ch, ch))
            assert r.fmt == "gif"
            assert (r.width, r.height) == (IMG_W, trs)
            assert r.raster_md5 == hashlib.md5(raster).hexdigest()
            continue
        h = max((((len(raw) + 2) // 3) + IMG_W - 1) // IMG_W, 1)
        raster = raw.ljust(IMG_W * h * 3, b" ")
        leg = doc_id % 5
        want_fmt = ("ppm", "bmp", "png")[leg]
        if leg == 0 and (doc_id // 5) % 2:
            want_fmt = "png"  # the r8 palette-PNG sub-rotation
        if leg == 1 and (doc_id // 5) % 2:
            want_fmt = "tiff"  # the r8 LZW+predictor sub-rotation
        if leg == 2 and (doc_id // 5) % 3 == 1:
            want_fmt = "webp"  # the r8 VP8L sub-rotation
        # leg 2 with (doc_id // 5) % 3 == 2 is the Adam7 interlaced-PNG
        # rotation: still fmt 'png', identical raster, new wire layout
        assert r.fmt == want_fmt
        assert (r.width, r.height) == (IMG_W, h)
        assert r.raster_md5 == hashlib.md5(raster).hexdigest()


def test_palette_png_leg_falls_back_to_truecolor_above_256_colors(
    spark, tmp_path
):
    """The leg-0 palette-PNG sub-rotation builds its raster from
    consecutive 3-byte windows of document TEXT, so a long diverse
    document exceeds the 256-entry PLTE limit; the encoder must then
    dispatch to truecolor PNG (mirroring encode_webp) instead of
    raising ImageFormatError (ADVICE r8).  Same decoded raster, same
    'png' format either way."""
    import random

    import numpy as np

    from databatchprotectionservice_spark.operators.multimodal import (
        IMG_W,
        image_table,
    )

    rng = random.Random(9)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 .,;:!?'-()[]{}"
    )
    wide = "".join(rng.choice(alphabet) for _ in range(2400))
    raw = wide.encode("utf-8")
    n_pix = (len(raw) + 2) // 3
    h = max((n_pix + IMG_W - 1) // IMG_W, 1)
    raster = raw.ljust(IMG_W * h * 3, b" ")
    n_colors = len(
        np.unique(
            np.frombuffer(raster, dtype=np.uint8).reshape(-1, 3), axis=0
        )
    )
    assert n_colors > 256  # the document genuinely overflows the PLTE
    docs = tmp_path / "wide"
    # doc_id=5: leg 0 (PPM slot) with (5 // 5) % 2 == 1 -> palette leg;
    # doc_id=15 exercises the same branch with a SHORT (<256-color) text
    spark.createDataFrame(
        [(5, wide, "en", "test", len(wide)), (15, "tiny doc", "en", "test", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(docs / "documents.parquet"))
    rows = {
        r.doc_id: r
        for r in decode_media(
            image_table(spark, str(docs)), mode="real"
        ).collect()
    }
    assert rows[5].fmt == "png" and rows[15].fmt == "png"
    assert (rows[5].width, rows[5].height) == (IMG_W, h)
    assert rows[5].raster_md5 == hashlib.md5(raster).hexdigest()
    short_raw = b"tiny doc"
    short_h = max((((len(short_raw) + 2) // 3) + IMG_W - 1) // IMG_W, 1)
    short_raster = short_raw.ljust(IMG_W * short_h * 3, b" ")
    assert rows[15].raster_md5 == hashlib.md5(short_raster).hexdigest()


def test_decode_matches_reference_sha(media):
    """The fake decoder's dimensions follow the documented sha256 rule."""
    src = {r.doc_id: r.payload for r in media.limit(20).collect()}
    decoded = {
        r.doc_id: (r.width, r.height)
        for r in decode_media(media).collect()
        if r.doc_id in src
    }
    for doc_id, payload in src.items():
        d = hashlib.sha256(payload).digest()
        assert decoded[doc_id] == (16 + d[0] % 240, 16 + d[1] % 240)


def test_resize_caps_max_dimension(media):
    resized = resize_media(decode_media(media), max_dim=64).collect()
    assert resized
    for r in resized:
        assert max(r.width, r.height) <= 64


def test_features_match_python_reference(media):
    feats = {r.doc_id: r for r in extract_features(media).collect()}
    for row in media.limit(30).collect():
        p = bytes(row.payload)
        f = feats[row.doc_id]
        assert f.n_bytes == len(p)
        assert f.n_alpha == sum(1 for b in p if 0x41 <= b <= 0x5A or 0x61 <= b <= 0x7A)
        assert f.n_digit == sum(1 for b in p if 0x30 <= b <= 0x39)
        assert f.n_space == sum(1 for b in p if b == 0x20 or 0x09 <= b <= 0x0D)
        assert f.n_other == f.n_bytes - f.n_alpha - f.n_digit - f.n_space


def test_frame_sample_cardinality_and_reassembly(media):
    frames = sample_frames(media).cache()
    per_doc = (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("frame")).alias("total"),
        )
        .collect()
    )
    sizes = {r.doc_id: len(r.payload) for r in media.collect()}
    for r in per_doc:
        expect_frames = (sizes[r.doc_id] + FRAME_BYTES - 1) // FRAME_BYTES
        assert r.n == expect_frames
        assert r.total == sizes[r.doc_id]
    # reassembling ordered frames restores the payload bit-exactly
    doc_id = per_doc[0].doc_id
    got = b"".join(
        bytes(r.frame)
        for r in frames.filter(F.col("doc_id") == doc_id)
        .orderBy("frame_idx")
        .collect()
    )
    src = dict(
        media.filter(F.col("doc_id") == doc_id)
        .select("doc_id", "payload")
        .collect()
    )
    assert got == bytes(src[doc_id])
    frames.unpersist()


def test_frame_sample_stride(media):
    strided = sample_frames(media, stride=2)
    idxs = [
        r.frame_idx
        for r in strided.filter(F.col("doc_id") == media.first().doc_id).collect()
    ]
    assert idxs and all(i % 2 == 0 for i in idxs)


def test_empty_and_multibatch_plumbing(spark):
    """Empty payloads and >1 Arrow batch per partition both flow through."""
    import pandas as pd

    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        pdf = pd.DataFrame(
            {
                "doc_id": range(40),
                "media_type": ["media/t"] * 40,
                "payload": [b"" if i % 5 == 0 else bytes([i]) * i for i in range(40)],
            }
        )
        df = spark.createDataFrame(pdf).repartition(2)
        feats = {r.doc_id: r for r in extract_features(df).collect()}
        assert len(feats) == 40
        assert feats[0].n_bytes == 0 and feats[0].n_other == 0
        assert feats[13].n_bytes == 13
        frames = sample_frames(df).collect()
        # empty payloads contribute zero frames
        assert {r.doc_id for r in frames} == {i for i in range(40) if i % 5 != 0}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
