"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The pattern for 100 TB media pipelines: media travels as a ``binary``
payload column plus a metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the payload
never crosses the JVM<->Python boundary row-at-a-time and a stage can
change cardinality (frame sampling is one->many).

Two decode modes:

* ``mode="fake"`` — deterministic pseudo-dimensions from a sha256 of the
  payload; the oracle-checkable twin exercising identical mapInPandas
  plumbing.
* ``mode="real"`` — genuine from-scratch decoders for SEVEN public
  image formats: P6 PPM and 24bpp BI_RGB BMP (``core/imagecodec.py``),
  8-bit PNG in BOTH interlace methods (CRC-checked chunks, zlib
  inflate, all five filters, Adam7 per-pass scatter), baseline AND progressive JPEG (``core/jpegcodec.py``,
  T.81 SOF0/SOF2), GIF 87a/89a (``core/gifcodec.py``, variable-width
  LZW), TIFF 6.0 (``core/tiffcodec.py``, none/PackBits/LZW +
  predictor, both endiannesses) and WebP-lossless
  (``core/webpcodec.py``, VP8L: prefix codes, LZ77, color cache, all
  four transforms). Audio and video have their own real paths:
  ``core/audiocodec.py`` parses RIFF/WAVE PCM16, ``core/videocodec.py``
  parses YUV4MPEG2 C444/C422/C420, and ``core/mp4codec.py`` walks
  ISO-BMFF box trees (``multimodal_mp4_metadata``). Formats needing a
  third-party codec (lossy VP8, MP3/AAC, H.264/VP9 payload decode)
  raise ``NotImplementedError`` — that is the seam where Pillow/ffmpeg
  slot in, exactly at the codec boundary, never in container or
  pipeline plumbing.

Everything around decode — schema, partitioning, batch shapes,
cardinality changes — is real and oracle-checked: the payloads here are
the UTF-8 bytes of ``documents.text`` so every byte-level result is
independently computable in SQL by DuckDB; ``multimodal_decode_real``
additionally *containerizes* those bytes as real PPM/BMP/PNG files and
checks the decoded raster's md5 end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..plans.registry import load, load_spread, prep, register

FRAME_BYTES = 256  # fake "frame" stride for the video-style sampler


def media_table(spark, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, media_type, payload binary, meta struct).

    ``media_type`` is derived from ``source`` and the payload is the UTF-8
    encoding of ``text`` — an opaque blob as far as every operator below
    is concerned, but one whose properties SQL oracles can recompute.
    """
    d = load_spread(spark, sf_dir, "documents")
    # NULL-safe derivations matching the DuckDB oracles: concat_ws
    # skips NULLs the way DuckDB's concat() does (plain F.concat would
    # NULL the whole media_type), and a NULL text normalizes to the
    # empty payload on BOTH sides
    txt = F.coalesce(F.col("text"), F.lit(""))
    return d.select(
        "doc_id",
        F.concat_ws("", F.lit("media/"), F.col("source")).alias("media_type"),
        F.encode(txt, "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode(txt, "UTF-8")).alias("n_bytes"),
            F.md5(F.encode(txt, "UTF-8")).alias("checksum"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# decode (STUB) — the seam for a real codec
# ---------------------------------------------------------------------------

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


_DECODE_REAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("raster_md5", T.StringType()),
    ]
)


def decode_media(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode payloads to (width, height).

    ``mode="fake"`` derives deterministic dimensions from a sha256 of the
    payload — the oracle-checkable twin. ``mode="real"`` runs the genuine
    PPM/BMP/PNG decoder in ``core/imagecodec.py`` over payloads that must
    be actual image bytes, emitting the parsed dimensions plus the md5 of
    the re-serialized row-major RGB raster (the round-trip proof).
    Formats the environment has no codec for (JPEG/audio/video) surface
    as ``NotImplementedError`` from the decode dispatch."""
    if mode == "real":
        from ..core.gifcodec import GifFormatError, decode_gif
        from ..core.imagecodec import ImageFormatError, decode_image
        from ..core.jpegcodec import JpegFormatError, decode_jpeg
        from ..core.tiffcodec import TiffFormatError, decode_tiff
        from ..core.webpcodec import WebpFormatError, decode_webp

        def _decode_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, fmts, ws, hs, md5s = [], [], [], [], []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    if payload is None:
                        continue
                    magic = bytes(payload[:2])
                    if magic not in (
                        b"P6", b"BM", b"\x89P", b"\xff\xd8", b"GI",
                        b"II", b"MM", b"RI",
                    ):
                        raise NotImplementedError(
                            f"no codec for media with magic {magic!r}: only "
                            "PPM/BMP/PNG/GIF/JPEG/TIFF/WebP-lossless decode "
                            "without third-party libraries (Pillow/ffmpeg "
                            "would slot in here for the rest)"
                        )
                    if magic == b"RI" and bytes(payload[8:12]) != b"WEBP":
                        # RIFF covers WAV/AVI/lossy-WebP too: a non-WEBP
                        # RIFF is the documented codec SEAM, not a
                        # corrupt image
                        raise NotImplementedError(
                            "RIFF payload is not lossless WebP "
                            f"(form {bytes(payload[8:12])!r}): audio/"
                            "video/lossy-WebP RIFF forms need a third-"
                            "party codec at this seam"
                        )
                    try:
                        if magic == b"\xff\xd8":
                            w, h, pixels = decode_jpeg(bytes(payload))
                        elif magic == b"GI":
                            w, h, pixels = decode_gif(bytes(payload))
                        elif magic in (b"II", b"MM"):
                            w, h, pixels = decode_tiff(bytes(payload))
                        elif magic == b"RI":
                            w, h, pixels = decode_webp(bytes(payload))
                        else:
                            w, h, pixels = decode_image(bytes(payload))
                    except (
                        ImageFormatError,
                        JpegFormatError,
                        GifFormatError,
                        TiffFormatError,
                        WebpFormatError,
                    ) as exc:
                        raise ValueError(
                            f"doc {doc_id}: undecodable payload: {exc}"
                        ) from exc
                    ids.append(doc_id)
                    fmts.append(
                        {
                            b"P6": "ppm",
                            b"BM": "bmp",
                            b"\x89P": "png",
                            b"GI": "gif",
                            b"II": "tiff",
                            b"MM": "tiff",
                            b"RI": "webp",
                        }.get(magic, "jpeg")
                    )
                    ws.append(w)
                    hs.append(h)
                    md5s.append(hashlib.md5(pixels.tobytes()).hexdigest())
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "fmt": pd.Series(fmts, dtype="object"),
                        "width": pd.Series(ws, dtype="int32"),
                        "height": pd.Series(hs, dtype="int32"),
                        "raster_md5": pd.Series(md5s, dtype="object"),
                    }
                )

        return df.mapInPandas(_decode_real, _DECODE_REAL_SCHEMA)
    if mode != "fake":
        raise ValueError(f"unknown decode mode: {mode!r}")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            digests = [
                hashlib.sha256(p if p is not None else b"").digest()
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [16 + d[0] % 240 for d in digests],
                    "height": [16 + d[1] % 240 for d in digests],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in payloads
                    ],
                }
            )

    return df.mapInPandas(_decode, _DECODE_SCHEMA)


def resize_media(decoded: DataFrame, max_dim: int = 64) -> DataFrame:
    """Proportional resize of the decoded dimensions — pure column math
    (no UDF needed once dimensions are relational data)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim) / F.greatest("width", "height").cast("double"),
    )
    return decoded.select(
        "doc_id",
        "media_type",
        F.floor(F.col("width") * scale).cast("int").alias("width"),
        F.floor(F.col("height") * scale).cast("int").alias("height"),
        "n_bytes",
    )


# ---------------------------------------------------------------------------
# feature extraction — real byte math, vectorized
# ---------------------------------------------------------------------------

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_alpha", T.LongType()),
        T.StructField("n_digit", T.LongType()),
        T.StructField("n_space", T.LongType()),
        T.StructField("n_other", T.LongType()),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Byte-class histogram per payload (the stand-in for an embedding
    model), numpy-vectorized per Arrow batch. In UTF-8, bytes < 0x80 are
    exactly the ASCII characters, so these counts are independently
    computable from the text by the SQL oracle."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            lengths = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
            )

            def classcount(lo: int, hi: int) -> np.ndarray:
                # per-row counts need segment sums, not the global bincount
                mask = (flat >= lo) & (flat <= hi)
                return np.add.reduceat(
                    np.concatenate([mask.astype(np.int64), [0]]),
                    np.concatenate([[0], np.cumsum(lengths)[:-1]]),
                ) * (lengths > 0) if flat.size else np.zeros(len(payloads), np.int64)

            is_alpha = classcount(0x41, 0x5A) + classcount(0x61, 0x7A)
            is_digit = classcount(0x30, 0x39)
            is_space = (
                classcount(0x20, 0x20)
                + classcount(0x09, 0x0D)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": lengths,
                    "n_alpha": is_alpha,
                    "n_digit": is_digit,
                    "n_space": is_space,
                    "n_other": lengths - is_alpha - is_digit - is_space,
                }
            )

    return df.mapInPandas(_features, _FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# frame sampling — one->many cardinality change
# ---------------------------------------------------------------------------

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = 1
) -> DataFrame:
    """Split each payload into fixed-size frames, keeping every
    ``stride``-th — the video-frame-sampling shape: a mapInPandas stage
    whose output cardinality differs from its input."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, idxs, frames = [], [], [], []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if payload is None:
                    continue
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for k in range(0, n_frames, stride):
                    ids.append(doc_id)
                    types.append(mt)
                    idxs.append(k)
                    frames.append(payload[k * frame_bytes : (k + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "media_type": pd.Series(types, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return df.mapInPandas(_frames, _FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# registered queries — every mapInPandas stage verified by a SQL oracle
# ---------------------------------------------------------------------------


@register(
    "multimodal_payload_stats",
    oracle="""
        SELECT concat('media/', source) AS media_type,
               count(*) AS n_media,
               CAST(sum(octet_length(encode(coalesce(text, '')))) AS BIGINT) AS total_bytes,
               min(md5(coalesce(text, ''))) AS min_checksum,
               max(md5(coalesce(text, ''))) AS max_checksum
        FROM documents
        GROUP BY 1
    """,
    description="binary payload + typed metadata column model",
)
def multimodal_payload_stats(spark, sf_dir):
    prep(spark)
    m = media_table(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("meta.n_bytes").cast("bigint").alias("total_bytes"),
        F.min("meta.checksum").alias("min_checksum"),
        F.max("meta.checksum").alias("max_checksum"),
    )


@register(
    "multimodal_feature_extract",
    oracle="""
        SELECT concat('media/', source) AS media_type,
               count(*) AS n_media,
               CAST(sum(octet_length(encode(coalesce(text, '')))) AS BIGINT) AS sum_bytes,
               CAST(sum(length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                    AS BIGINT) AS sum_alpha,
               CAST(sum(length(regexp_replace(text, '[^0-9]', '', 'g')))
                    AS BIGINT) AS sum_digit,
               CAST(sum(octet_length(encode(coalesce(text, '')))
                   - octet_length(encode(regexp_replace(text, e'[ \\t\\n\\x0b\\f\\r]', '', 'g'))))
                    AS BIGINT) AS sum_space
        FROM documents
        GROUP BY 1
    """,
    description="byte-class feature extraction via Arrow-batched mapInPandas",
)
def multimodal_feature_extract(spark, sf_dir):
    prep(spark)
    feats = extract_features(media_table(spark, sf_dir))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").cast("bigint").alias("sum_bytes"),
        F.sum("n_alpha").cast("bigint").alias("sum_alpha"),
        F.sum("n_digit").cast("bigint").alias("sum_digit"),
        F.sum("n_space").cast("bigint").alias("sum_space"),
    )


@register(
    "multimodal_frame_sample",
    # a zero-byte payload yields zero frames and therefore no row in
    # the frame stream — n_media counts media that produced frames
    # (hostile-corpus finding, r9: the empty document)
    oracle=f"""
        SELECT concat('media/', source) AS media_type,
               count(*) AS n_media,
               CAST(sum((octet_length(encode(coalesce(text, ''))) + {FRAME_BYTES - 1}) // {FRAME_BYTES})
                    AS BIGINT) AS n_frames,
               CAST(sum(octet_length(encode(coalesce(text, '')))) AS BIGINT) AS frame_bytes_total
        FROM documents
        WHERE octet_length(encode(coalesce(text, ''))) > 0
        GROUP BY 1
    """,
    description="video-style frame sampling (one->many mapInPandas)",
)
def multimodal_frame_sample(spark, sf_dir):
    prep(spark)
    frames = sample_frames(media_table(spark, sf_dir))
    per_doc = frames.groupBy("doc_id", "media_type").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.octet_length("frame")).alias("frame_bytes"),
    )
    return per_doc.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_frames").cast("bigint").alias("n_frames"),
        F.sum("frame_bytes").cast("bigint").alias("frame_bytes_total"),
    )


@register(
    "multimodal_decode_resize",
    # the fake decoder's dimensions are sha256-derived and therefore fully
    # SQL-expressible: DuckDB's sha256(VARCHAR) hashes the UTF-8 bytes of
    # the string — exactly the payload bytes Spark hashes — and bytes 0/1
    # are the first two hex pairs of the digest string
    oracle="""
        WITH decoded AS (
            SELECT concat('media/', source) AS media_type,
                   16 + CAST(('0x' || substr(sha256(coalesce(text, '')), 1, 2)) AS INT) % 240
                       AS w,
                   16 + CAST(('0x' || substr(sha256(coalesce(text, '')), 3, 2)) AS INT) % 240
                       AS h
            FROM documents
        ),
        resized AS (
            SELECT media_type,
                   CAST(floor(w * least(1.0, 64.0 / CAST(greatest(w, h) AS DOUBLE)))
                        AS INT) AS width,
                   CAST(floor(h * least(1.0, 64.0 / CAST(greatest(w, h) AS DOUBLE)))
                        AS INT) AS height
            FROM decoded
        )
        SELECT media_type,
               count(*) AS n_media,
               CAST(sum(width) AS BIGINT) AS sum_width,
               CAST(sum(height) AS BIGINT) AS sum_height,
               max(width) AS max_width,
               max(height) AS max_height
        FROM resized
        GROUP BY media_type
    """,
    description="decode (stubbed) + proportional resize pipeline",
)
def multimodal_decode_resize(spark, sf_dir):
    prep(spark)
    decoded = decode_media(media_table(spark, sf_dir), mode="fake")
    resized = resize_media(decoded, max_dim=64)
    return resized.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("width").alias("sum_width"),
        F.sum("height").alias("sum_height"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


# ---------------------------------------------------------------------------
# REAL decode — genuine PPM/BMP bytes through a genuine decoder
# ---------------------------------------------------------------------------

IMG_W = 32  # fixed raster width for the deterministic image fixtures
_PAD = 0x20  # space — expressible as repeat(' ', n) on the DuckDB side

_ENCODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def image_table(spark, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload) where payload is a REAL image file:
    containerized as P6 PPM (doc_id % 5 == 0), 24bpp bottom-up BMP
    (== 1), zlib-compressed PNG (== 2) — each carrying the UTF-8 text
    bytes as a space-padded ``IMG_W``-wide RGB raster — baseline
    JPEG (== 3), where each text byte becomes an 8x8 CONSTANT grayscale
    tile (``IMG_W`` tiles per row), or GIF (== 4), where each text byte
    is a palette index through the identity grayscale palette
    (index i -> (i,i,i)), so the decoded RGB raster is the padded text
    with every byte TRIPLED. With all-ones quantization a constant
    block's DCT is a lone exact-integer DC coefficient, so the JPEG
    decode is BIT-EXACT; GIF is lossless outright — every raster stays
    SQL-predictable (see ``core/jpegcodec.py`` / ``core/gifcodec.py``).
    Deterministic by construction: flat formats hash
    ``md5(text || repeat(' ', pad))``; JPEG hashes the tile expansion;
    GIF hashes the byte-tripled expansion."""
    import numpy as np

    from ..core.gifcodec import GRAY_PALETTE, encode_gif
    from ..core.imagecodec import (
        ImageFormatError,
        encode_bmp,
        encode_png,
        encode_png_adam7,
        encode_png_palette,
        encode_ppm,
    )
    from ..core.jpegcodec import (
        encode_jpeg_gray_tiles,
        encode_jpeg_gray_tiles_progressive,
    )
    from ..core.tiffcodec import encode_tiff
    from ..core.webpcodec import encode_webp

    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "text", F.encode("text", "UTF-8").alias("payload")
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, txt, raw in zip(
                pdf["doc_id"], pdf["text"], pdf["payload"]
            ):
                raw = bytes(raw) if raw is not None else b""
                txt = txt if txt is not None else ""
                ids.append(doc_id)
                leg = doc_id % 5
                if leg >= 3:  # 1 CHAR -> 1 grayscale unit, IMG_W per row
                    # pixel = printable-ASCII fold of the CODEPOINT
                    # (ord(c) % 95 + 32): the oracle rebuilds the same
                    # stream with chr(ascii(..)%95+32), which only
                    # md5-matches the raster BYTES because every folded
                    # value is single-byte UTF-8.  (The earlier
                    # byte-indexed form diverged from the oracle's
                    # character-indexed substr() on non-ASCII text.)
                    vals = bytes((ord(ch) % 95 + 32) for ch in txt)
                    trs = max((len(vals) + IMG_W - 1) // IMG_W, 1)
                    padded = vals.ljust(trs * IMG_W, bytes([_PAD]))
                    tiles = np.frombuffer(padded, dtype=np.uint8).reshape(
                        trs, IMG_W
                    )
                    if leg == 3:  # JPEG: byte -> 8x8 constant tile;
                        # byte-identical to the general encoders on the
                        # expanded raster (parity-pinned), ~15x faster
                        # synthesis.  Sub-rotation (doc_id // 5) % 2
                        # alternates baseline SOF0 and PROGRESSIVE SOF2
                        # files — both decode to the SAME raster (exact
                        # DC-only blocks), so the oracle is unchanged
                        # while every corpus exercises both decode paths
                        if (doc_id // 5) % 2:
                            payloads.append(
                                encode_jpeg_gray_tiles_progressive(tiles)
                            )
                        else:
                            payloads.append(encode_jpeg_gray_tiles(tiles))
                    else:  # GIF: byte -> palette index, lossless
                        payloads.append(encode_gif(tiles, GRAY_PALETTE))
                    continue
                n_pix = (len(raw) + 2) // 3
                h = max((n_pix + IMG_W - 1) // IMG_W, 1)
                raster = raw.ljust(IMG_W * h * 3, bytes([_PAD]))
                pixels = np.frombuffer(raster, dtype=np.uint8).reshape(
                    h, IMG_W, 3
                )
                if leg == 1 and (doc_id // 5) % 2:
                    # BMP leg sub-rotation: LZW+predictor TIFF carries
                    # the SAME row-major RGB raster, so the closed-form
                    # oracle is untouched while the corpus exercises
                    # the TIFF IFD/LZW/predictor decode path
                    payloads.append(
                        encode_tiff(
                            pixels, compression="lzw", predictor=True
                        )
                    )
                    continue
                if leg == 0 and (doc_id // 5) % 2 == 1:
                    # PPM leg sub-rotation: PALETTE PNG (color type 3)
                    # — the raster's distinct colors in first-
                    # appearance order become the PLTE, pixels become
                    # indices; decode maps them straight back, so the
                    # closed-form oracle is untouched.  The raster is
                    # consecutive 3-byte windows of document TEXT, so a
                    # long/diverse document can exceed the 256-entry
                    # PLTE limit: the palette encoder's own >256-color
                    # rejection triggers the truecolor fallback (one
                    # distinct-color pass, inside the codec; same
                    # decoded raster, oracle 'png' unchanged)
                    try:
                        payloads.append(encode_png_palette(pixels))
                    except ImageFormatError:
                        payloads.append(encode_png(pixels))
                    continue
                if leg == 2 and (doc_id // 5) % 3 == 1:
                    # PNG leg sub-rotation 1/3: VP8L lossless WebP,
                    # same raster closed form (palette or literal path
                    # chosen by the raster's color count)
                    payloads.append(encode_webp(pixels))
                    continue
                if leg == 2 and (doc_id // 5) % 3 == 2:
                    # PNG leg sub-rotation 2/3: Adam7 INTERLACED PNG —
                    # seven independently-filtered sub-images, same
                    # decoded raster (interlacing only reorders
                    # transmission), so the oracle is untouched while
                    # the per-pass scatter path runs on every corpus
                    payloads.append(encode_png_adam7(pixels))
                    continue
                enc = (encode_ppm, encode_bmp, encode_png)[leg]
                payloads.append(enc(pixels))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return d.mapInPandas(_encode, _ENCODE_SCHEMA)


@register(
    "multimodal_decode_real",
    # the decoded row-major RGB raster is a closed form of the text:
    # for PPM / bottom-up-BGR BMP / zlib-filtered PNG it is the text
    # bytes space-padded to w*h*3; for baseline JPEG it is the 8x8
    # constant-tile expansion of the padded text (each char -> 24 bytes
    # per scanline x 8 scanlines; exact because constant blocks survive
    # all-ones quantization bit-for-bit); for GIF it is the padded text
    # with every byte tripled (identity grayscale palette, LZW lossless)
    # — so DuckDB recomputes every decoder output, including the
    # lossy-format one, from first principles
    oracle=f"""
        WITH imgs AS (
            SELECT doc_id,
                   CASE doc_id % 5
                        WHEN 0 THEN (CASE WHEN (doc_id // 5) % 2 = 1
                                          THEN 'png' ELSE 'ppm' END)
                        WHEN 1 THEN (CASE WHEN (doc_id // 5) % 2 = 1
                                          THEN 'tiff' ELSE 'bmp' END)
                        WHEN 2 THEN (CASE WHEN (doc_id // 5) % 3 = 1
                                          THEN 'webp' ELSE 'png' END)
                        WHEN 3 THEN 'jpeg'
                        ELSE 'gif' END AS fmt,
                   coalesce(text, '') AS text,
                   octet_length(encode(coalesce(text, ''))) AS nb
            FROM documents
        ),
        flat AS (
            SELECT fmt,
                   greatest(((nb + 2) // 3 + {IMG_W - 1}) // {IMG_W}, 1)
                       AS height,
                   md5(coalesce(text, '') || repeat(' ',
                       CAST({IMG_W} * greatest(((nb + 2) // 3
                            + {IMG_W - 1}) // {IMG_W}, 1) * 3 - nb
                            AS INT))) AS raster_md5
            FROM imgs WHERE fmt IN ('ppm', 'bmp', 'png', 'tiff', 'webp')
        ),
        -- jp/gf pixel units come from CHARACTERS folded to printable
        -- ASCII (chr(ascii(c) % 95 + 32), 1 byte per pixel in UTF-8),
        -- so string md5 equals raster-byte md5 on ANY text; padding
        -- chars are raw spaces (the fixture pads with 0x20 unfolded)
        tiled AS (
            SELECT fmt,
                   greatest((length(text) + {IMG_W - 1}) // {IMG_W}, 1)
                       AS trs,
                   list_aggregate(list_transform(
                       range(0, CAST(greatest((length(text)
                           + {IMG_W - 1}) // {IMG_W}, 1) * {IMG_W} AS INT)),
                       i -> CASE WHEN i < length(text)
                                 THEN chr(ascii(substr(text,
                                      CAST(i + 1 AS INT), 1)) % 95 + 32)
                                 ELSE ' ' END),
                       'string_agg', '') AS padded
            FROM imgs WHERE fmt IN ('jpeg', 'gif')
        ),
        jp AS (
            SELECT fmt, 8 * trs AS height,
                   md5(list_aggregate(list_transform(range(0, trs), tr ->
                       repeat(list_aggregate(
                           list_transform(range(0, {IMG_W}), c ->
                               repeat(substr(padded,
                                   CAST(tr * {IMG_W} + c + 1 AS INT), 1),
                                   24)),
                           'string_agg', ''), 8)),
                       'string_agg', '')) AS raster_md5
            FROM tiled WHERE fmt = 'jpeg'
        ),
        gf AS (
            SELECT fmt, trs AS height,
                   md5(list_aggregate(
                       list_transform(range(1, CAST(trs * {IMG_W} + 1 AS INT)),
                           i -> repeat(substr(padded, CAST(i AS INT), 1), 3)),
                       'string_agg', '')) AS raster_md5
            FROM tiled WHERE fmt = 'gif'
        ),
        hashed AS (
            SELECT * FROM flat
            UNION ALL SELECT * FROM jp
            UNION ALL SELECT * FROM gf
        )
        SELECT fmt,
               count(*) AS n_images,
               CAST(sum(height) AS BIGINT) AS sum_height,
               max(height) AS max_height,
               min(raster_md5) AS min_raster_md5,
               max(raster_md5) AS max_raster_md5
        FROM hashed
        GROUP BY fmt
    """,
    description="REAL image decode: PPM/BMP/PNG/baseline-JPEG/GIF bytes "
    "-> header parse, row flip, BGR->RGB, stride strip, inflate+unfilter, "
    "Huffman+IDCT, LZW+palette -> raster md5 round-trip",
)
def multimodal_decode_real(spark, sf_dir):
    prep(spark)
    decoded = decode_media(image_table(spark, sf_dir), mode="real")
    return decoded.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("height").cast("bigint").alias("sum_height"),
        F.max("height").alias("max_height"),
        F.min("raster_md5").alias("min_raster_md5"),
        F.max("raster_md5").alias("max_raster_md5"),
    )


# ---------------------------------------------------------------------------
# REAL audio decode — genuine WAV (RIFF PCM) bytes through a genuine parser
# ---------------------------------------------------------------------------

WAV_RATE = 8000
_AUDIO_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)
_AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_table(spark, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, source, payload) where payload is a REAL
    RIFF/WAVE PCM16 file carrying a deterministic sawtooth-ish signal:
    ``greatest(n_chars, 1) * 4`` frames of
    ``(doc_id * 31 + i * 17) % 65536 - 32768`` — closed-form, so every
    decoded-sample statistic is SQL-predictable with EXACT integers."""
    import numpy as np

    from ..core.audiocodec import encode_wav

    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srcs, payloads = [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                n = max(int(n_chars or 0), 1) * 4
                i = np.arange(n, dtype=np.int64)
                s = ((doc_id * 31 + i * 17) % 65536 - 32768).astype(np.int16)
                ids.append(doc_id)
                srcs.append(source)
                payloads.append(encode_wav(s, rate=WAV_RATE))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "source": pd.Series(srcs, dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return d.mapInPandas(_synth, _AUDIO_TABLE_SCHEMA)


@register(
    "multimodal_audio_wav_stats",
    # the signal is closed-form, so DuckDB recomputes every decoded
    # statistic from first principles — all EXACT integer math
    oracle="""
        WITH clips AS (
            SELECT source,
                   greatest(n_chars, 1) * 4 AS nf,
                   list_aggregate(list_transform(
                       range(0, greatest(n_chars, 1) * 4),
                       i -> abs((doc_id * 31 + i * 17) % 65536 - 32768)),
                       'max') AS peak,
                   list_aggregate(list_transform(
                       range(0, greatest(n_chars, 1) * 4),
                       i -> CAST((doc_id * 31 + i * 17) % 65536 - 32768
                                 AS BIGINT)
                            * ((doc_id * 31 + i * 17) % 65536 - 32768)),
                       'sum') AS energy
            FROM documents
        )
        SELECT source,
               count(*) AS n_clips,
               CAST(sum(nf) AS BIGINT) AS total_frames,
               CAST(max(peak) AS BIGINT) AS max_peak,
               CAST(sum(energy) AS BIGINT) AS total_energy
        FROM clips
        GROUP BY source
    """,
    description="REAL audio decode: RIFF/WAVE PCM16 chunk walk -> exact "
    "integer sample stats (frames, peak, energy)",
)
def multimodal_audio_wav_stats(spark, sf_dir):
    """WAV clips decoded by the genuine RIFF parser
    (``core/audiocodec.py``): chunk walk, PCM/16-bit validation, frame
    reshape — then per-clip statistics on the int16 samples in exact
    int64 (peak, energy), aggregated per source. The oracle recomputes
    everything from the closed-form signal, so a parser that misreads
    one header field or drops one frame hash-mismatches.

    100 TB shape: identical to the image path — payload bytes cross the
    JVM<->Python boundary once per Arrow batch in each mapInPandas
    stage, stats are map-only, and the only exchange is the final
    per-source aggregate. Compressed codecs (MP3/AAC) raise at the
    dispatch seam."""
    import numpy as np

    from ..core.audiocodec import AudioFormatError, decode_wav

    prep(spark)
    clips = audio_table(spark, sf_dir)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, nfs, peaks, energies = [], [], [], []
            for doc_id, source, payload in zip(
                pdf["doc_id"], pdf["source"], pdf["payload"]
            ):
                try:
                    rate, ch, samples = decode_wav(bytes(payload))
                except AudioFormatError as exc:
                    raise ValueError(
                        f"doc {doc_id}: undecodable audio: {exc}"
                    ) from exc
                s = samples.astype(np.int64)
                srcs.append(source)
                nfs.append(samples.shape[0])
                peaks.append(int(np.abs(s).max()))
                energies.append(int((s * s).sum()))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_frames": pd.Series(nfs, dtype="int64"),
                    "peak": pd.Series(peaks, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    decoded = clips.mapInPandas(_stats, _AUDIO_STATS_SCHEMA)
    return decoded.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n_frames").cast("bigint").alias("total_frames"),
        F.max("peak").cast("bigint").alias("max_peak"),
        F.sum("energy").cast("bigint").alias("total_energy"),
    )


# ---------------------------------------------------------------------------
# REAL video decode — genuine Y4M (YUV4MPEG2) bytes through a genuine parser
# ---------------------------------------------------------------------------

VID_W, VID_H = 4, 2  # C444 frame = 24 stream bytes; C420 frame = 12
VID_SAMPLE_STRIDE = 2  # keep every 2nd frame
_VIDEO_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)
_VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("sampled_bytes_sum", T.LongType()),
        T.StructField("max_byte", T.LongType()),
    ]
)


#: C420 stream bytes per frame: full-res Y + two (w/2 x h/2) chroma planes
VID_FB_420 = VID_W * VID_H + 2 * (VID_W // 2) * (VID_H // 2)


def video_table(spark, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, source, payload) where payload is a REAL
    YUV4MPEG2 clip of ``(n_chars % 7) + 2`` frames — C444 for even
    doc_id, C420 (ffmpeg's default rawvideo layout) for odd — whose
    STREAM bytes follow the closed form ``(doc_id*13 + f*7 + j*3) %
    256`` over the frame's stream length (w*h*3 for C444,
    w*h + 2*(w/2)*(h/2) for C420). Replication upsampling makes every
    decoded byte an exact stream copy, so each decoded statistic stays
    SQL-predictable with exact integers (a C420 chroma byte counts 4x
    in plane sums)."""
    import numpy as np

    from ..core.videocodec import encode_y4m, encode_y4m_planar

    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    fb = VID_W * VID_H * 3
    cw, ch = VID_W // 2, VID_H // 2

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srcs, payloads = [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                nf = (int(n_chars or 0) % 7) + 2
                f = np.arange(nf, dtype=np.int64)[:, None]
                ids.append(doc_id)
                srcs.append(source)
                if doc_id % 2:  # C420
                    j = np.arange(VID_FB_420, dtype=np.int64)[None, :]
                    raster = ((doc_id * 13 + f * 7 + j * 3) % 256).astype(
                        np.uint8
                    )
                    y = raster[:, : VID_W * VID_H].reshape(
                        nf, VID_H, VID_W
                    )
                    u = raster[
                        :, VID_W * VID_H : VID_W * VID_H + cw * ch
                    ].reshape(nf, ch, cw)
                    v = raster[:, VID_W * VID_H + cw * ch :].reshape(
                        nf, ch, cw
                    )
                    payloads.append(encode_y4m_planar(y, u, v, "C420"))
                    continue
                j = np.arange(fb, dtype=np.int64)[None, :]
                raster = ((doc_id * 13 + f * 7 + j * 3) % 256).astype(
                    np.uint8
                )
                frames = raster.reshape(nf, 3, VID_H, VID_W)
                payloads.append(encode_y4m(frames))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "source": pd.Series(srcs, dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return d.mapInPandas(_synth, _VIDEO_TABLE_SCHEMA)


@register(
    "multimodal_video_frame_stats",
    # the stream is closed-form, so DuckDB recomputes the sampled-frame
    # statistics from first principles — all EXACT integer math. For the
    # C420 clips (odd doc_id) each chroma stream byte is replicated 2x2
    # by the decoder's upsample, so it carries weight 4 in the sum and
    # the frame's stream length is w*h + 2*(w/2)*(h/2); the max is
    # weight-free because replication adds no new values.
    oracle=f"""
        WITH clips AS (
            SELECT source, doc_id,
                   (n_chars % 7) + 2 AS nf,
                   CASE WHEN doc_id % 2 = 0 THEN {VID_W * VID_H * 3}
                        ELSE {VID_FB_420} END AS fb
            FROM documents
        ),
        vals AS (
            SELECT source, nf,
                   flatten(list_transform(
                       list_filter(range(0, nf),
                                   f -> f % {VID_SAMPLE_STRIDE} = 0),
                       f -> list_transform(range(0, fb),
                           j -> ((doc_id * 13 + f * 7 + j * 3) % 256)
                                * (CASE WHEN doc_id % 2 = 0
                                        OR j < {VID_W * VID_H}
                                   THEN 1 ELSE 4 END))))
                       AS weighted,
                   flatten(list_transform(
                       list_filter(range(0, nf),
                                   f -> f % {VID_SAMPLE_STRIDE} = 0),
                       f -> list_transform(range(0, fb),
                           j -> (doc_id * 13 + f * 7 + j * 3) % 256)))
                       AS sampled
            FROM clips
        )
        SELECT source,
               count(*) AS n_clips,
               CAST(sum(nf) AS BIGINT) AS total_frames,
               CAST(sum((nf + 1) // {VID_SAMPLE_STRIDE}) AS BIGINT)
                   AS total_sampled,
               CAST(sum(list_aggregate(weighted, 'sum')) AS BIGINT)
                   AS sampled_bytes_sum,
               CAST(max(list_aggregate(sampled, 'max')) AS BIGINT)
                   AS max_byte
        FROM vals
        GROUP BY source
    """,
    description="REAL video decode: YUV4MPEG2 C444 + C420 (replication "
    "upsample) header parse + frame slice -> every-2nd-frame sampling "
    "-> exact integer raster stats",
)
def multimodal_video_frame_stats(spark, sf_dir):
    """Y4M clips decoded by the genuine parser (``core/videocodec.py``):
    stream-header parse (W/H/F/C tags), per-frame FRAME-marker walk,
    raster slice, C420 chroma replication-upsample for the odd-doc_id
    clips (ffmpeg's default rawvideo layout) — then frame sampling
    (every ``VID_SAMPLE_STRIDE``-th frame, the standard preprocessing
    step for video training data) and integer statistics over the
    sampled rasters, aggregated per source.
    The oracle recomputes everything from the closed-form signal: a
    parser that misparses one header tag, misaligns one frame, or
    samples the wrong frames hash-mismatches.

    100 TB shape: same as image/audio — one mapInPandas stage per
    direction, payload bytes cross the boundary once per Arrow batch,
    frame sampling changes cardinality INSIDE the stage (no explode
    shuffle), and the only exchange is the final per-source aggregate.
    Compressed video (H.264/VP9/AV1) raises at the dispatch seam."""
    import numpy as np

    from ..core.videocodec import VideoFormatError, decode_y4m

    prep(spark)
    clips = video_table(spark, sf_dir)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, nfs, nss, sums, maxs = [], [], [], [], []
            for doc_id, source, payload in zip(
                pdf["doc_id"], pdf["source"], pdf["payload"]
            ):
                try:
                    w, h, fps, frames = decode_y4m(bytes(payload))
                except VideoFormatError as exc:
                    raise ValueError(
                        f"doc {doc_id}: undecodable video: {exc}"
                    ) from exc
                sampled = frames[::VID_SAMPLE_STRIDE]
                s = sampled.astype(np.int64)
                srcs.append(source)
                nfs.append(frames.shape[0])
                nss.append(sampled.shape[0])
                sums.append(int(s.sum()))
                maxs.append(int(s.max()))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_frames": pd.Series(nfs, dtype="int64"),
                    "n_sampled": pd.Series(nss, dtype="int64"),
                    "sampled_bytes_sum": pd.Series(sums, dtype="int64"),
                    "max_byte": pd.Series(maxs, dtype="int64"),
                }
            )

    decoded = clips.mapInPandas(_stats, _VIDEO_STATS_SCHEMA)
    return decoded.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n_frames").cast("bigint").alias("total_frames"),
        F.sum("n_sampled").cast("bigint").alias("total_sampled"),
        F.sum("sampled_bytes_sum").cast("bigint").alias("sampled_bytes_sum"),
        F.max("max_byte").cast("bigint").alias("max_byte"),
    )


# ---------------------------------------------------------------------------
# Temporal analysis: video scene changes + audio activity windows
# ---------------------------------------------------------------------------

#: a frame pair is a "scene change" when its Y-plane sum of absolute
#: differences exceeds this (the synthetic signal steps every Y byte by
#: +7 mod 256 per frame, so a pair's SAD is 7 per byte except where the
#: byte WRAPS — wraps jump the SAD by 242, making wrap frames the
#: deterministic "cuts" this detector must find)
SCENE_SAD_THRESHOLD = VID_W * VID_H * 7

_SCENE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_pairs", T.LongType()),
        T.StructField("sad_sum", T.LongType()),
        T.StructField("n_cuts", T.LongType()),
    ]
)


@register(
    "multimodal_video_scene_stats",
    # decoded Y planes are the first w*h stream bytes for BOTH C444 and
    # C420 clips (the Y plane is never subsampled), so the frame-pair
    # sum of absolute differences has one closed form for all clips
    oracle=f"""
        WITH clips AS (
            SELECT source, doc_id, (n_chars % 7) + 2 AS nf
            FROM documents
        ),
        pairs AS (
            SELECT source,
                   nf - 1 AS n_pairs,
                   list_transform(range(1, nf), f ->
                       list_aggregate(list_transform(
                           range(0, {VID_W * VID_H}),
                           j -> abs(((doc_id * 13 + f * 7 + j * 3) % 256)
                                  - ((doc_id * 13 + (f - 1) * 7 + j * 3)
                                     % 256))),
                           'sum')) AS sads
            FROM clips
        )
        SELECT source,
               CAST(sum(n_pairs) AS BIGINT) AS total_pairs,
               CAST(sum(list_aggregate(sads, 'sum')) AS BIGINT) AS sad_sum,
               CAST(sum(len(list_filter(sads,
                    s -> s > {SCENE_SAD_THRESHOLD}))) AS BIGINT) AS n_cuts
        FROM pairs
        GROUP BY source
    """,
    description="video scene-change detection: per-pair Y-plane sum of "
    "absolute differences over decoded frames, cuts above a fixed SAD "
    "threshold — exact integers, oracle-recomputed from the closed form",
)
def multimodal_video_scene_stats(spark, sf_dir):
    """Temporal video analysis — the dimension the per-frame stats miss:
    consecutive-frame Y-plane SAD (sum of absolute differences), the
    textbook shot-boundary signal video curation pipelines use to pick
    keyframes and split clips. Runs on genuinely DECODED frames (both
    Y4M layouts; the Y plane is full-res in each), so a decoder that
    misaligns a single frame boundary shifts every downstream diff and
    hash-mismatches.

    100 TB shape: the diff is computed INSIDE the decode stage on the
    ndarray (no per-frame explode, no shuffle of pixel data); the only
    exchange is the final per-source aggregate."""
    import numpy as np

    from ..core.videocodec import VideoFormatError, decode_y4m

    prep(spark)
    clips = video_table(spark, sf_dir)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, nps, sads, cuts = [], [], [], []
            for doc_id, source, payload in zip(
                pdf["doc_id"], pdf["source"], pdf["payload"]
            ):
                try:
                    w, h, fps, frames = decode_y4m(bytes(payload))
                except VideoFormatError as exc:
                    raise ValueError(
                        f"doc {doc_id}: undecodable video: {exc}"
                    ) from exc
                y = frames[:, 0].astype(np.int64)  # (nf, h, w) Y plane
                diffs = np.abs(y[1:] - y[:-1]).sum(axis=(1, 2))
                srcs.append(source)
                nps.append(int(diffs.shape[0]))
                sads.append(int(diffs.sum()))
                cuts.append(int((diffs > SCENE_SAD_THRESHOLD).sum()))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_pairs": pd.Series(nps, dtype="int64"),
                    "sad_sum": pd.Series(sads, dtype="int64"),
                    "n_cuts": pd.Series(cuts, dtype="int64"),
                }
            )

    decoded = clips.mapInPandas(_stats, _SCENE_STATS_SCHEMA)
    return decoded.groupBy("source").agg(
        F.sum("n_pairs").cast("bigint").alias("total_pairs"),
        F.sum("sad_sum").cast("bigint").alias("sad_sum"),
        F.sum("n_cuts").cast("bigint").alias("n_cuts"),
    )


#: audio activity windowing: full 256-frame windows only (the tail
#: remainder is profiled by the whole-clip stats above)
AUDIO_WIN = 256

_ACTIVITY_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_windows", T.LongType()),
        T.StructField("max_window_energy", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


@register(
    "multimodal_audio_activity",
    # the synthetic signal is closed-form, so both the windowed energy
    # and the sign-crossing count are SQL-recomputable exactly; a
    # crossing is a sign-bit change between consecutive samples
    oracle=f"""
        WITH clips AS (
            SELECT source, doc_id, greatest(n_chars, 1) * 4 AS nf
            FROM documents
        ),
        win AS (
            SELECT source,
                   nf // {AUDIO_WIN} AS n_windows,
                   list_transform(range(0, nf // {AUDIO_WIN}), w ->
                       list_aggregate(list_transform(
                           range(w * {AUDIO_WIN}, (w + 1) * {AUDIO_WIN}),
                           i -> CAST((doc_id * 31 + i * 17) % 65536 - 32768
                                     AS BIGINT)
                                * ((doc_id * 31 + i * 17) % 65536 - 32768)),
                           'sum')) AS energies,
                   list_aggregate(list_transform(range(1, nf), i ->
                       CASE WHEN ((doc_id * 31 + (i - 1) * 17) % 65536
                                  - 32768 < 0)
                                 <> ((doc_id * 31 + i * 17) % 65536
                                     - 32768 < 0)
                            THEN 1 ELSE 0 END), 'sum') AS zc
            FROM clips
        )
        SELECT source,
               CAST(sum(n_windows) AS BIGINT) AS total_windows,
               CAST(max(CASE WHEN n_windows > 0
                        THEN list_aggregate(energies, 'max')
                        ELSE 0 END) AS BIGINT) AS max_window_energy,
               CAST(sum(zc) AS BIGINT) AS total_zero_crossings
        FROM win
        GROUP BY source
    """,
    description=f"audio activity profile: {AUDIO_WIN}-frame windowed "
    "energy (silence/VAD proxy) + zero-crossing count over decoded PCM16 "
    "— exact integers, oracle-recomputed from the closed form",
)
def multimodal_audio_activity(spark, sf_dir):
    """Temporal audio analysis over genuinely decoded WAV samples: the
    two classic voice-activity / silence-trimming signals — per-window
    energy (speech datasets drop windows below an energy floor) and
    zero-crossing count (separates tonal from noisy content). Both stay
    in exact int64, so the oracle recomputes them from the closed-form
    signal; a parser off by one sample flips the crossing parity chain
    and hash-mismatches.

    100 TB shape: windowing is a reshape inside the decode stage —
    no explode, no shuffle of sample data; one per-source exchange."""
    import numpy as np

    from ..core.audiocodec import AudioFormatError, decode_wav

    prep(spark)
    clips = audio_table(spark, sf_dir)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, nws, maxes, zcs = [], [], [], []
            for doc_id, source, payload in zip(
                pdf["doc_id"], pdf["source"], pdf["payload"]
            ):
                try:
                    rate, ch, samples = decode_wav(bytes(payload))
                except AudioFormatError as exc:
                    raise ValueError(
                        f"doc {doc_id}: undecodable audio: {exc}"
                    ) from exc
                s = samples.astype(np.int64)
                nw = s.shape[0] // AUDIO_WIN
                if nw:
                    w = s[: nw * AUDIO_WIN].reshape(nw, AUDIO_WIN)
                    max_e = int((w * w).sum(axis=1).max())
                else:
                    max_e = 0
                neg = s < 0
                srcs.append(source)
                nws.append(nw)
                maxes.append(max_e)
                zcs.append(int((neg[1:] != neg[:-1]).sum()))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_windows": pd.Series(nws, dtype="int64"),
                    "max_window_energy": pd.Series(maxes, dtype="int64"),
                    "zero_crossings": pd.Series(zcs, dtype="int64"),
                }
            )

    decoded = clips.mapInPandas(_stats, _ACTIVITY_STATS_SCHEMA)
    return decoded.groupBy("source").agg(
        F.sum("n_windows").cast("bigint").alias("total_windows"),
        F.max("max_window_energy").cast("bigint").alias("max_window_energy"),
        F.sum("zero_crossings").cast("bigint").alias("total_zero_crossings"),
    )


# ---------------------------------------------------------------------------
# ISO-BMFF (MP4) container metadata — the video-ingest scan stage
# ---------------------------------------------------------------------------

_MP4_META_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_bytes", T.LongType()),
        T.StructField("duration_ticks", T.LongType()),
        T.StructField("stts_entries", T.LongType()),
    ]
)


@register(
    "multimodal_mp4_metadata",
    # closed form: sample i of a doc derives from text CODEPOINT b_i
    # (sizes b+1, durations 100 + b%50); stts_entries is the RLE run
    # count of the duration sequence = 1 + (# adjacent changes); docs
    # with empty text still produce a (valid, zero-sample) container
    oracle="""
        WITH s AS (
            SELECT doc_id, source, CAST(i AS INT) AS i,
                   ascii(substr(text, CAST(i AS INT), 1)) AS b
            FROM (SELECT doc_id, source, text,
                         unnest(range(1, length(text) + 1)) AS i
                  FROM documents)
        ),
        runs AS (
            SELECT doc_id, source, i, b,
                   lag(b) OVER (PARTITION BY doc_id ORDER BY i) AS prev
            FROM s
        ),
        per AS (
            SELECT doc_id, source,
                   count(*) AS n_samples,
                   CAST(sum(b + 1) AS BIGINT) AS sample_bytes,
                   CAST(sum(100 + b % 50) AS BIGINT) AS duration_ticks,
                   CAST(1 + sum(CASE WHEN prev IS NOT NULL
                                     AND (100 + b % 50) <> (100 + prev % 50)
                                     THEN 1 ELSE 0 END) AS BIGINT)
                       AS stts_entries
            FROM runs GROUP BY 1, 2
        ),
        filled AS (
            SELECT d.source,
                   coalesce(p.n_samples, 0) AS n_samples,
                   coalesce(p.sample_bytes, 0) AS sample_bytes,
                   coalesce(p.duration_ticks, 0) AS duration_ticks,
                   coalesce(p.stts_entries, 0) AS stts_entries
            FROM documents d LEFT JOIN per p USING (doc_id)
        )
        SELECT source,
               count(*) AS n_videos,
               CAST(sum(n_samples) AS BIGINT) AS sum_samples,
               CAST(sum(sample_bytes) AS BIGINT) AS sum_sample_bytes,
               CAST(sum(duration_ticks) AS BIGINT) AS sum_duration_ticks,
               CAST(sum(stts_entries) AS BIGINT) AS sum_stts_entries,
               CAST(max(n_samples) AS BIGINT) AS max_samples
        FROM filled GROUP BY source
    """,
    description="ISO-BMFF container roundtrip: real ftyp/moov/stbl box "
    "trees built per document (RLE stts, per-sample stsz), re-parsed by "
    "the box-walk parser, sample-table aggregates checked closed-form",
)
def multimodal_mp4_metadata(spark, sf_dir):
    """The video-ingest SCAN stage at 100 TB: codec payloads stay
    opaque (GPU decode is a downstream stage), but container metadata
    — frame counts, byte budgets, durations, sample-table shapes — is
    extracted at scan time from the REAL ISO-BMFF box machinery.  Each
    document's text codepoints derive a sample table (sizes ``b+1``,
    durations ``100 + b%50``), a spec-compliant single-track MP4 is
    built around it (run-length stts, per-sample stsz, mvhd/tkhd/mdhd/
    hdlr/stsd), and the box-walk parser reads it back; the mdhd
    duration must equal the stts reconstruction (asserted per doc) and
    every aggregate is recomputed closed-form by the oracle.

    Dataflow: one mapInPandas over spread documents (encode+parse are
    both pure-Python byte work, Arrow-batched), then a tiny per-source
    aggregate — the same two-stage shape as the image decode path."""
    from ..core.mp4codec import encode_mp4, parse_mp4

    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select("source", "text")

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, ns, bs, ds, es = [], [], [], [], []
            for src, txt in zip(pdf["source"], pdf["text"]):
                # sample tables derive from CODEPOINTS, matching the
                # oracle's ascii(substr(text, i, 1)) — utf-8 BYTES
                # diverge on non-ASCII text (hostile-corpus finding,
                # r9: chars != bytes and ascii() yields codepoints)
                raw = [ord(c) for c in (txt or "")]
                sizes = [b + 1 for b in raw]
                durs = [100 + (b % 50) for b in raw]
                # payload=b"": only the sample TABLES are read back, and
                # codepoint-derived sizes can reach 0x10FFFF+1 bytes per
                # astral char — the default zero-filled mdat would
                # allocate gigabytes on hostile non-ASCII text
                info = parse_mp4(encode_mp4(sizes, durs, payload=b""))
                t = info.tracks[0]
                if t.duration != t.sample_durations_sum:
                    raise ValueError(
                        "mdhd/stts duration mismatch: "
                        f"{t.duration} != {t.sample_durations_sum}"
                    )
                srcs.append(src)
                ns.append(t.n_samples)
                bs.append(t.total_sample_bytes)
                ds.append(t.sample_durations_sum)
                es.append(t.stts_entries)
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sample_bytes": pd.Series(bs, dtype="int64"),
                    "duration_ticks": pd.Series(ds, dtype="int64"),
                    "stts_entries": pd.Series(es, dtype="int64"),
                }
            )

    per = d.mapInPandas(_roundtrip, _MP4_META_SCHEMA)
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_videos"),
        F.sum("n_samples").cast("bigint").alias("sum_samples"),
        F.sum("sample_bytes").cast("bigint").alias("sum_sample_bytes"),
        F.sum("duration_ticks").cast("bigint").alias("sum_duration_ticks"),
        F.sum("stts_entries").cast("bigint").alias("sum_stts_entries"),
        F.max("n_samples").cast("bigint").alias("max_samples"),
    )


# ---------------------------------------------------------------------------
# REAL compressed-audio decode — IMA ADPCM (WAVE format 0x11)
# ---------------------------------------------------------------------------

ADPCM_BLOCK_ALIGN = 132
ADPCM_SPB = (ADPCM_BLOCK_ALIGN - 4) * 2 + 1  # 257 samples per block


def adpcm_table(spark, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, source, payload) where payload is a REAL
    IMA-ADPCM WAV (format tag 0x11) of the same closed-form sawtooth
    signal as the PCM fixture — compressed ~4x by the genuine
    encoder."""
    import numpy as np

    from ..core.audiocodec import encode_wav_adpcm_batch

    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srcs, sigs = [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                n = max(int(n_chars or 0), 1) * 4
                i = np.arange(n, dtype=np.int64)
                s = ((doc_id * 31 + i * 17) % 65536 - 32768).astype(np.int16)
                ids.append(doc_id)
                srcs.append(source)
                sigs.append(s)
            # one lockstep nibble search across every block of the
            # whole Arrow batch (byte-identical to per-clip encode)
            payloads = encode_wav_adpcm_batch(
                sigs, rate=WAV_RATE, block_align=ADPCM_BLOCK_ALIGN
            )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "source": pd.Series(srcs, dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return d.mapInPandas(_synth, _AUDIO_TABLE_SCHEMA)


@register(
    "multimodal_audio_adpcm_stats",
    # ADPCM is LOSSY, so unlike the PCM leg the oracle cannot restate
    # every sample — it restates what survives compression EXACTLY:
    # the frame count (the fact chunk must trim the padded last
    # block), every block-header sample (IMA blocks carry sample 0 of
    # each block verbatim in the predictor field — decode must
    # segment blocks correctly to reproduce them), and the full
    # compressed layout (blocks x align + the fixed chunk overhead).
    # Mid-block sample VALUES are pinned by the unit suite's
    # state-machine vectors (tests/test_audiocodec.py).
    oracle=f"""
        WITH clips AS (
            SELECT source,
                   greatest(n_chars, 1) * 4 AS nf,
                   (greatest(n_chars, 1) * 4 + {ADPCM_SPB - 1})
                       // {ADPCM_SPB} AS nb,
                   list_aggregate(list_transform(
                       range(0, (greatest(n_chars, 1) * 4
                                 + {ADPCM_SPB - 1}) // {ADPCM_SPB}),
                       k -> CAST((doc_id * 31 + k * {ADPCM_SPB} * 17)
                                 % 65536 - 32768 AS BIGINT)),
                       'sum') AS block_start_sum
            FROM documents
        )
        SELECT source,
               count(*) AS n_clips,
               CAST(sum(nf) AS BIGINT) AS total_frames,
               CAST(sum(block_start_sum) AS BIGINT) AS block_start_sum,
               CAST(sum(nb * {ADPCM_BLOCK_ALIGN} + 60) AS BIGINT)
                   AS total_bytes,
               CAST(sum(nf) * 2 * 10000
                    // sum(nb * {ADPCM_BLOCK_ALIGN} + 60) AS BIGINT)
                   AS compression_e4
        FROM clips
        GROUP BY source
    """,
    description="REAL compressed-audio decode: IMA ADPCM (WAVE 0x11) "
    "block state machine; oracle pins frame counts, every block-header "
    "sample, and the compressed layout",
)
def multimodal_audio_adpcm_stats(spark, sf_dir):
    """Compressed audio joins the real decode path: IMA (DVI) ADPCM —
    WAVE format 0x11, a fully-specified public codec whose decoder is
    a pure integer state machine (89-entry step table, 3-bit index
    walk) — so no third-party library is needed, unlike MP3/AAC which
    remain at the documented seam.  The fixture encoder compresses the
    closed-form PCM signal ~4x; decode walks fmt/fact/data chunks,
    validates block geometry, runs every nibble through the state
    machine and trims the zero-padded tail to the ``fact`` frame
    count.

    Lossy codecs force an honest split in the gate: the oracle
    restates exactly what survives compression — frame count, every
    block-header sample (predictors carry block starts verbatim; a
    decoder that mis-segments blocks reproduces none of them), and
    the full compressed size — while mid-block reconstruction values
    are pinned by hand-built spec vectors in the unit suite.

    100 TB shape: identical to the other media legs — one
    ``mapInPandas`` decode stage, stats map-side, one final
    source-cardinality exchange."""
    from ..core.audiocodec import decode_wav_adpcm_batch

    stats_schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("block_start_sum", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, nfs, bss, nbs = [], [], [], []
            payloads = [bytes(p) for p in pdf["payload"]]
            # whole-batch lockstep decode: every IMA block is
            # self-contained, so the Arrow batch's blocks decode as
            # one table-gather walk instead of per-sample Python
            decoded = decode_wav_adpcm_batch(payloads)
            for source, payload, (rate, samples) in zip(
                pdf["source"], payloads, decoded
            ):
                srcs.append(source)
                nfs.append(len(samples))
                bss.append(int(samples[:: ADPCM_SPB].astype("int64").sum()))
                nbs.append(len(payload))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_frames": pd.Series(nfs, dtype="int64"),
                    "block_start_sum": pd.Series(bss, dtype="int64"),
                    "n_bytes": pd.Series(nbs, dtype="int64"),
                }
            )

    prep(spark)
    clips = adpcm_table(spark, sf_dir)
    per_clip = clips.mapInPandas(_stats, stats_schema)
    return per_clip.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n_frames").cast("bigint").alias("total_frames"),
        F.sum("block_start_sum").cast("bigint").alias("block_start_sum"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.expr("CAST(sum(n_frames) * 2 * 10000 div sum(n_bytes) AS BIGINT)")
        .alias("compression_e4"),
    )


# ---------------------------------------------------------------------------
# FLAC: lossless compressed audio through the real decode path
# ---------------------------------------------------------------------------


def flac_table(spark, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, source, payload) where payload is a REAL
    FLAC file of the same closed-form sawtooth signal as the PCM/ADPCM
    fixtures — losslessly compressed by the genuine encoder (FIXED
    prediction + Rice coding), so unlike ADPCM every decoded sample is
    oracle-restatable."""
    import numpy as np

    from ..core.flaccodec import encode_flac

    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srcs, payloads = [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                n = max(int(n_chars or 0), 1) * 4
                i = np.arange(n, dtype=np.int64)
                s = ((doc_id * 31 + i * 17) % 65536 - 32768).astype(np.int16)
                ids.append(doc_id)
                srcs.append(source)
                payloads.append(encode_flac(s, rate=WAV_RATE))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "source": pd.Series(srcs, dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return d.mapInPandas(_synth, _AUDIO_TABLE_SCHEMA)


@register(
    "multimodal_audio_flac_stats",
    # FLAC is LOSSLESS, so the oracle restates EVERY decoded sample
    # from the closed-form signal in exact integer math — a decoder
    # that drops one frame, mis-restores one predictor, or misreads
    # one Rice parameter hash-mismatches
    oracle="""
        WITH clips AS (
            SELECT source,
                   greatest(n_chars, 1) * 4 AS nf,
                   list_aggregate(list_transform(
                       range(0, greatest(n_chars, 1) * 4),
                       i -> abs((doc_id * 31 + i * 17) % 65536 - 32768)),
                       'max') AS peak,
                   list_aggregate(list_transform(
                       range(0, greatest(n_chars, 1) * 4),
                       i -> CAST((doc_id * 31 + i * 17) % 65536 - 32768
                                 AS BIGINT)),
                       'sum') AS ssum,
                   list_aggregate(list_transform(
                       range(0, greatest(n_chars, 1) * 4),
                       i -> CAST((doc_id * 31 + i * 17) % 65536 - 32768
                                 AS BIGINT)
                            * ((doc_id * 31 + i * 17) % 65536 - 32768)),
                       'sum') AS energy
            FROM documents
        )
        SELECT source,
               count(*) AS n_clips,
               CAST(sum(nf) AS BIGINT) AS total_frames,
               CAST(max(peak) AS BIGINT) AS max_peak,
               CAST(sum(ssum) AS BIGINT) AS sample_sum,
               CAST(sum(energy) AS BIGINT) AS total_energy
        FROM clips
        GROUP BY source
    """,
    description="REAL lossless-compressed audio decode: from-scratch "
    "FLAC (FIXED/LPC prediction + Rice partitions, CRC-8/16, MD5) -> "
    "exact integer sample stats; the oracle restates every sample",
)
def multimodal_audio_flac_stats(spark, sf_dir):
    """Lossless compressed audio joins the real decode path: FLAC
    (RFC 9639), decoded by the from-scratch integer codec in
    ``core/flaccodec.py`` — frame sync + CRC-8/CRC-16 validation,
    FIXED-predictor restore, Rice residual decode, STREAMINFO MD5
    check.  Because the codec is lossless the oracle restates every
    decoded sample from the closed-form signal (the same gate strength
    as the PCM leg, through a genuinely compressed container — the
    fixture compresses ~2.3x).  Perceptual codecs (MP3/AAC) remain at
    the documented library seam.

    100 TB shape: identical to the other media legs — one
    ``mapInPandas`` decode stage, stats map-side in exact int64, one
    final source-cardinality exchange."""
    from ..core.flaccodec import decode_flac

    stats_schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("peak", T.LongType()),
            T.StructField("ssum", T.LongType()),
            T.StructField("energy", T.LongType()),
        ]
    )

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, nfs, peaks, sums, energies = [], [], [], [], []
            for source, payload in zip(pdf["source"], pdf["payload"]):
                rate, ch, samples = decode_flac(bytes(payload))
                s = samples[:, 0].astype(np.int64)
                srcs.append(source)
                nfs.append(len(s))
                peaks.append(int(np.abs(s).max()))
                sums.append(int(s.sum()))
                energies.append(int((s * s).sum()))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_frames": pd.Series(nfs, dtype="int64"),
                    "peak": pd.Series(peaks, dtype="int64"),
                    "ssum": pd.Series(sums, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    prep(spark)
    clips = flac_table(spark, sf_dir)
    per_clip = clips.mapInPandas(_stats, stats_schema)
    return per_clip.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n_frames").cast("bigint").alias("total_frames"),
        F.max("peak").cast("bigint").alias("max_peak"),
        F.sum("ssum").cast("bigint").alias("sample_sum"),
        F.sum("energy").cast("bigint").alias("total_energy"),
    )


# ---------------------------------------------------------------------------
# AVI / Motion-JPEG clips (staged; registers r10 per the window note)
# ---------------------------------------------------------------------------

#: MJPEG fixture geometry: each frame is a REAL baseline JPEG of
#: constant 8x8 tiles (constant tiles decode BIT-EXACTLY — the
#: core/jpegcodec.py exactness note), so every decoded pixel has the
#: closed form  tile = (doc_id*17 + f*29 + t*11) % 256  repeated 8x8.
MJPEG_TILE_ROWS = 2
MJPEG_TILE_COLS = 3
MJPEG_FRAMES_MOD = 5  # n_frames = (n_chars % MOD) + 2
MJPEG_FPS = (30, 1)

_MJPEG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("max_pixel", T.LongType()),
    ]
)

#: r10 registration oracle — recomputes the decoded statistics from
#: the closed form (64 raster pixels per constant tile); a decoder
#: that mis-walks movi, drops a frame, or decodes one tile wrong
#: hash-mismatches.
MJPEG_STATS_ORACLE = f"""
        WITH clips AS (
            SELECT source, doc_id,
                   (n_chars % {MJPEG_FRAMES_MOD}) + 2 AS nf
            FROM documents
        ),
        per AS (
            SELECT source, nf,
                   list_aggregate(flatten(list_transform(
                       range(0, nf), f -> list_transform(
                           range(0, {MJPEG_TILE_ROWS * MJPEG_TILE_COLS}),
                           t -> (doc_id * 17 + f * 29 + t * 11) % 256))),
                       'sum') * 64 AS px_sum,
                   list_max(flatten(list_transform(
                       range(0, nf), f -> list_transform(
                           range(0, {MJPEG_TILE_ROWS * MJPEG_TILE_COLS}),
                           t -> (doc_id * 17 + f * 29 + t * 11) % 256))))
                       AS px_max
            FROM clips
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_clips,
               CAST(sum(nf) AS BIGINT) AS total_frames,
               CAST(sum(px_sum) AS BIGINT) AS pixel_sum,
               CAST(max(px_max) AS BIGINT) AS max_pixel
        FROM per GROUP BY source ORDER BY source
"""


def mjpeg_table(spark, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, source, payload) where payload is a REAL
    AVI(MJPG) clip: ``(n_chars % MOD) + 2`` frames, each a complete
    baseline JPEG from our own encoder (``encode_jpeg_gray_tiles``),
    wrapped by ``encode_avi_mjpeg`` with a spec-complete idx1."""
    from ..core.avicodec import encode_avi_mjpeg
    from ..core.jpegcodec import encode_jpeg_gray_tiles

    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    rows, cols = MJPEG_TILE_ROWS, MJPEG_TILE_COLS

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srcs, payloads = [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                nf = (int(n_chars or 0) % MJPEG_FRAMES_MOD) + 2
                t = np.arange(rows * cols, dtype=np.int64)
                jpegs = [
                    encode_jpeg_gray_tiles(
                        (
                            (int(doc_id) * 17 + f * 29 + t * 11) % 256
                        ).astype(np.uint8).reshape(rows, cols)
                    )
                    for f in range(nf)
                ]
                ids.append(doc_id)
                srcs.append(source)
                payloads.append(
                    encode_avi_mjpeg(
                        jpegs, cols * 8, rows * 8, fps=MJPEG_FPS
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "source": pd.Series(srcs, dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return d.mapInPandas(_synth, _VIDEO_TABLE_SCHEMA)


@register("multimodal_video_mjpeg_stats", oracle=MJPEG_STATS_ORACLE)
def multimodal_video_mjpeg_stats(spark, sf_dir):
    """AVI/Motion-JPEG clips decoded end-to-end by first-party code:
    RIFF/movi walk with idx1 cross-validation (``core/avicodec.py``),
    every ``00dc`` chunk through the from-scratch baseline JPEG
    decoder, integer statistics over the decoded rasters aggregated
    per source.  Closes the compressed-VIDEO-container seam next to
    Y4M (uncompressed) and MP4 (metadata-only): MJPEG is the one
    mainstream video codec whose frames are fully decodable from
    public-spec baseline JPEG — the perceptual inter-frame codecs
    (H.264+) remain the documented library seam.

    100 TB shape: identical to the image/audio/Y4M paths — payload
    bytes cross the Python boundary once per Arrow batch inside ONE
    mapInPandas stage per direction; the only exchange is the final
    per-source aggregate.  The container walk is per-clip sequential
    by necessity (chunk framing), but clips parallelize freely.
    """
    from ..core.avicodec import AviFormatError, decode_avi_mjpeg

    prep(spark)
    clips = mjpeg_table(spark, sf_dir)
    rate, scale = MJPEG_FPS
    w, h = MJPEG_TILE_COLS * 8, MJPEG_TILE_ROWS * 8

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, nfs, sums, maxs = [], [], [], []
            for doc_id, source, payload in zip(
                pdf["doc_id"], pdf["source"], pdf["payload"]
            ):
                try:
                    fps, frames = decode_avi_mjpeg(bytes(payload))
                except AviFormatError as exc:
                    raise ValueError(
                        f"doc {doc_id}: undecodable MJPEG clip: {exc}"
                    ) from exc
                if fps != (rate, scale):
                    raise ValueError(f"doc {doc_id}: fps drifted to {fps}")
                if frames.shape[1:] != (h, w):
                    raise ValueError(
                        f"doc {doc_id}: dims {frames.shape[1:]} != {(h, w)}"
                    )
                s = frames.astype(np.int64)
                srcs.append(source)
                nfs.append(frames.shape[0])
                sums.append(int(s.sum()))
                maxs.append(int(s.max()))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_frames": pd.Series(nfs, dtype="int64"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                    "max_pixel": pd.Series(maxs, dtype="int64"),
                }
            )

    decoded = clips.mapInPandas(_stats, _MJPEG_STATS_SCHEMA)
    return (
        decoded.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clips"),
            F.sum("n_frames").cast("bigint").alias("total_frames"),
            F.sum("pixel_sum").cast("bigint").alias("pixel_sum"),
            F.max("max_pixel").cast("bigint").alias("max_pixel"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# QOI / JPEG-LS lossless image decode + MP3 frame walk (staged r11)
# ---------------------------------------------------------------------------

#: QOI fixture geometry: (h, 8, 3) RGB raster, h = (n_chars % 7) + 2,
#: channel value j (row-major, channel-minor) = (doc_id*7 + 3j) % 256
#: — the +3 step drives QOI through its DIFF/LUMA/RUN ops while the
#: doc_id offset varies the index-hash path; QOI is lossless, so the
#: decoded bytes ARE the closed form.
QOI_W = 8
QOI_H_MOD = 7

#: JPEG-LS fixture geometry: (h, 12) grayscale, h = (n_chars % 5) + 2,
#: pixel j = (doc_id*11 + 5j) % 256 — gradients exercise the context
#: modeler, the %256 wrap makes runs rare but present; T.87 is
#: lossless, so decoded == closed form.
JLS_W = 12
JLS_H_MOD = 5

#: MP3 fixture: opaque payload of (n_chars * 3 + 40) bytes packed into
#: MPEG-1 Layer III frames at 44100 Hz; kbps rotates 128/192 by doc
#: parity (frame sizes 417/626 — floor(144*kbps*1000/rate)), and every
#: third doc carries a frame-0 Xing block (+1 frame).  The walker's
#: outputs are all closed-form integers.
MP3_RATE = 44100
MP3_KBPS = (128, 192)
_MP3_FS = tuple((144 * k * 1000) // MP3_RATE for k in MP3_KBPS)

_QOI_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("max_byte", T.LongType()),
    ]
)
_JLS_STATS_SCHEMA = _QOI_STATS_SCHEMA
_MP3_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("total_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("stream_bytes", T.LongType()),
    ]
)

QOI_STATS_ORACLE = f"""
        WITH imgs AS (
            SELECT source, doc_id,
                   ((n_chars % {QOI_H_MOD}) + 2) * {QOI_W} * 3 AS nv
            FROM documents
        ),
        per AS (
            SELECT source, nv / 3 AS npx,
                   list_aggregate(list_transform(range(0, nv),
                       j -> (doc_id * 7 + 3 * j) % 256), 'sum') AS bsum,
                   list_max(list_transform(range(0, nv),
                       j -> (doc_id * 7 + 3 * j) % 256)) AS bmax
            FROM imgs
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_images,
               CAST(sum(npx) AS BIGINT) AS total_pixels,
               CAST(sum(bsum) AS BIGINT) AS byte_sum,
               CAST(max(bmax) AS BIGINT) AS max_byte
        FROM per GROUP BY source ORDER BY source
"""

JLS_STATS_ORACLE = f"""
        WITH imgs AS (
            SELECT source, doc_id,
                   ((n_chars % {JLS_H_MOD}) + 2) * {JLS_W} AS nv
            FROM documents
        ),
        per AS (
            SELECT source, nv AS npx,
                   list_aggregate(list_transform(range(0, nv),
                       j -> (doc_id * 11 + 5 * j) % 256), 'sum') AS bsum,
                   list_max(list_transform(range(0, nv),
                       j -> (doc_id * 11 + 5 * j) % 256)) AS bmax
            FROM imgs
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_images,
               CAST(sum(npx) AS BIGINT) AS total_pixels,
               CAST(sum(bsum) AS BIGINT) AS byte_sum,
               CAST(max(bmax) AS BIGINT) AS max_byte
        FROM per GROUP BY source ORDER BY source
"""

MP3_WALK_ORACLE = f"""
        WITH clips AS (
            SELECT source, doc_id, n_chars * 3 + 40 AS pl,
                   CASE WHEN doc_id % 2 = 0 THEN {_MP3_FS[0]}
                        ELSE {_MP3_FS[1]} END AS fs,
                   CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS xing
            FROM documents
        ),
        per AS (
            SELECT source,
                   greatest((pl + fs - 5) // (fs - 4), 1) + xing
                       AS n_frames,
                   fs
            FROM clips
        )
        SELECT source,
               CAST(sum(n_frames) AS BIGINT) AS n_frames,
               CAST(sum(n_frames * 1152) AS BIGINT) AS total_samples,
               CAST(sum(n_frames * 1152 * 1000 // {MP3_RATE})
                    AS BIGINT) AS duration_ms,
               CAST(sum(n_frames * fs) AS BIGINT) AS stream_bytes
        FROM per GROUP BY source ORDER BY source
"""


def _media_doc_table(spark, sf_dir: str) -> DataFrame:
    return load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )


@register("multimodal_image_qoi_stats", oracle=QOI_STATS_ORACLE)
def multimodal_image_qoi_stats(spark, sf_dir):
    """QOI images (the 2022 public-domain spec, `core/qoicodec.py`)
    round-tripped per document: synthesize the closed-form RGB raster,
    encode with all six chunk ops live, decode back in the SAME
    executor, and aggregate integer statistics over the DECODED bytes
    — the oracle recomputes them from the closed form, so a single
    wrong DIFF bias or index-hash slot hash-mismatches.

    100 TB shape: one mapInPandas stage (encode+decode are per-row,
    no cross-row state), single per-source aggregate exchange."""
    from ..core.qoicodec import decode_qoi, encode_qoi

    prep(spark)
    d = _media_doc_table(spark, sf_dir)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, npx, sums, maxs = [], [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                h = (int(n_chars or 0) % QOI_H_MOD) + 2
                j = np.arange(h * QOI_W * 3, dtype=np.int64)
                raster = ((int(doc_id) * 7 + 3 * j) % 256).astype(
                    np.uint8
                ).reshape(h, QOI_W, 3)
                w2, h2, ch, cs, dec = decode_qoi(encode_qoi(raster))
                if (w2, h2, ch) != (QOI_W, h, 3):
                    raise ValueError(
                        f"doc {doc_id}: QOI header drifted "
                        f"{(w2, h2, ch)}"
                    )
                s = dec.astype(np.int64)
                srcs.append(source)
                npx.append(h * QOI_W)
                sums.append(int(s.sum()))
                maxs.append(int(s.max()))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_pixels": pd.Series(npx, dtype="int64"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                    "max_byte": pd.Series(maxs, dtype="int64"),
                }
            )

    dec = d.mapInPandas(_stats, _QOI_STATS_SCHEMA)
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.sum("n_pixels").cast("bigint").alias("total_pixels"),
            F.sum("byte_sum").cast("bigint").alias("byte_sum"),
            F.max("max_byte").cast("bigint").alias("max_byte"),
        )
        .orderBy("source")
    )


@register("multimodal_image_jls_stats", oracle=JLS_STATS_ORACLE)
def multimodal_image_jls_stats(spark, sf_dir):
    """JPEG-LS / LOCO-I (ITU-T T.87, `core/jlscodec.py`) round-trip
    per document: closed-form grayscale gradient rasters through the
    context-modeling encoder and back; integer statistics over the
    decoded pixels, oracle-recomputed from the closed form.  T.87 is
    LOSSLESS in default near=0 mode, so equality is exact.

    100 TB shape: identical to the QOI path — one mapInPandas stage,
    one per-source aggregate exchange."""
    from ..core.jlscodec import decode_jls, encode_jls

    prep(spark)
    d = _media_doc_table(spark, sf_dir)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, npx, sums, maxs = [], [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                h = (int(n_chars or 0) % JLS_H_MOD) + 2
                j = np.arange(h * JLS_W, dtype=np.int64)
                raster = ((int(doc_id) * 11 + 5 * j) % 256).astype(
                    np.uint8
                ).reshape(h, JLS_W)
                w2, h2, dec = decode_jls(encode_jls(raster))
                if (w2, h2) != (JLS_W, h):
                    raise ValueError(
                        f"doc {doc_id}: JLS header drifted {(w2, h2)}"
                    )
                s = dec.astype(np.int64)
                srcs.append(source)
                npx.append(h * JLS_W)
                sums.append(int(s.sum()))
                maxs.append(int(s.max()))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_pixels": pd.Series(npx, dtype="int64"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                    "max_byte": pd.Series(maxs, dtype="int64"),
                }
            )

    dec = d.mapInPandas(_stats, _JLS_STATS_SCHEMA)
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.sum("n_pixels").cast("bigint").alias("total_pixels"),
            F.sum("byte_sum").cast("bigint").alias("byte_sum"),
            F.max("max_byte").cast("bigint").alias("max_byte"),
        )
        .orderBy("source")
    )


@register("multimodal_audio_mp3_walk", oracle=MP3_WALK_ORACLE)
def multimodal_audio_mp3_walk(spark, sf_dir):
    """MPEG-audio frame walk (`core/mp3codec.py`): per document a
    REAL MPEG-1 Layer III stream — opaque frame bodies (the
    perceptual payload is the documented library seam, exactly like
    MP4), but every header field, frame boundary, Xing block and
    sample-count derivation is first-party and closed-form.  kbps
    rotates 128/192 by doc parity; every third doc carries a Xing
    frame whose frame/byte counts the walker cross-validates.

    100 TB shape: one mapInPandas stage, per-source aggregate."""
    from ..core.mp3codec import encode_mp3, parse_mp3

    prep(spark)
    d = _media_doc_table(spark, sf_dir)
    k0, k1 = MP3_KBPS

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, nfs, tss, dms, sbs = [], [], [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                did = int(doc_id)
                pl = int(n_chars or 0) * 3 + 40
                payload = bytes(
                    (did + i) % 256 for i in range(pl)
                )
                kb = k0 if did % 2 == 0 else k1
                xing = did % 3 == 0
                data = encode_mp3(
                    payload,
                    bitrate_kbps=kb,
                    rate=MP3_RATE,
                    xing=xing,
                )
                info = parse_mp3(data)
                if xing:
                    xi = info["xing"]
                    if xi is None or xi["frames"] != info["n_frames"]:
                        raise ValueError(
                            f"doc {doc_id}: Xing frame count drifted"
                        )
                if info["is_vbr"]:
                    raise ValueError(f"doc {doc_id}: CBR stream read VBR")
                srcs.append(source)
                nfs.append(info["n_frames"])
                tss.append(info["total_samples"])
                dms.append(info["duration_ms"])
                sbs.append(info["stream_bytes"])
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_frames": pd.Series(nfs, dtype="int64"),
                    "total_samples": pd.Series(tss, dtype="int64"),
                    "duration_ms": pd.Series(dms, dtype="int64"),
                    "stream_bytes": pd.Series(sbs, dtype="int64"),
                }
            )

    dec = d.mapInPandas(_stats, _MP3_STATS_SCHEMA)
    return (
        dec.groupBy("source")
        .agg(
            F.sum("n_frames").cast("bigint").alias("n_frames"),
            F.sum("total_samples").cast("bigint").alias("total_samples"),
            F.sum("duration_ms").cast("bigint").alias("duration_ms"),
            F.sum("stream_bytes").cast("bigint").alias("stream_bytes"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# G.711 companded WAV decode (staged r11)
# ---------------------------------------------------------------------------

#: G.711 fixture: (n_chars % 40) + 25 samples whose CODE bytes follow
#: (doc_id + 7i) % 256 — all 256 codes cycle; mu-law on even docs,
#: A-law on odd.  Samples are synthesized as the codec LUT's decoded
#: levels, so encode (nearest-level) -> container -> decode is exact;
#: the ORACLE restates the expansion from the ITU G.711 segment
#: arithmetic (the public g711.c formulas) — codec-vs-spec, not
#: table-vs-itself.
G711_N_MOD = 40

G711_STATS_ORACLE = f"""
        WITH clips AS (
            SELECT source, doc_id, (n_chars % {G711_N_MOD}) + 25 AS n
            FROM documents
        ),
        per AS (
            SELECT source, n,
                   list_transform(range(0, n), i ->
                     CASE WHEN doc_id % 2 = 0 THEN
                       -- mu-law expand: complement, segment form
                       CASE WHEN xor((doc_id + 7 * i) % 256, 255) >= 128
                         THEN -((((xor((doc_id + 7 * i) % 256, 255) % 16)
                                  * 8 + 132)
                                 << ((xor((doc_id + 7 * i) % 256, 255)
                                      // 16) % 8)) - 132)
                         ELSE ((((xor((doc_id + 7 * i) % 256, 255) % 16)
                                 * 8 + 132)
                                << ((xor((doc_id + 7 * i) % 256, 255)
                                     // 16) % 8)) - 132)
                       END
                     ELSE
                       -- A-law expand: 0x55 toggle, seg-0 linear,
                       -- sign bit SET means POSITIVE
                       CASE WHEN xor((doc_id + 7 * i) % 256, 85) >= 128
                         THEN CASE
                           WHEN (xor((doc_id + 7 * i) % 256, 85) // 16)
                                % 8 = 0
                           THEN (xor((doc_id + 7 * i) % 256, 85) % 16)
                                * 16 + 8
                           ELSE ((xor((doc_id + 7 * i) % 256, 85) % 16)
                                 * 16 + 264)
                                << (((xor((doc_id + 7 * i) % 256, 85)
                                      // 16) % 8) - 1)
                         END
                         ELSE -(CASE
                           WHEN (xor((doc_id + 7 * i) % 256, 85) // 16)
                                % 8 = 0
                           THEN (xor((doc_id + 7 * i) % 256, 85) % 16)
                                * 16 + 8
                           ELSE ((xor((doc_id + 7 * i) % 256, 85) % 16)
                                 * 16 + 264)
                                << (((xor((doc_id + 7 * i) % 256, 85)
                                      // 16) % 8) - 1)
                         END)
                       END
                     END) AS vals
            FROM clips
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_clips,
               CAST(sum(n) AS BIGINT) AS n_samples,
               CAST(sum(list_aggregate(vals, 'sum')) AS BIGINT)
                   AS sample_sum,
               CAST(min(list_min(vals)) AS BIGINT) AS min_sample,
               CAST(max(list_max(vals)) AS BIGINT) AS max_sample
        FROM per GROUP BY source ORDER BY source
"""

_G711_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("min_sample", T.LongType()),
        T.StructField("max_sample", T.LongType()),
    ]
)


@register("multimodal_audio_g711_stats", oracle=G711_STATS_ORACLE)
def multimodal_audio_g711_stats(spark, sf_dir):
    """G.711 companded telephony WAV (`core/audiocodec.py`, format
    tags 6/7) decoded end-to-end: per document a REAL RIFF/WAVE file
    whose mu-law (even docs) or A-law (odd) code bytes cycle all 256
    values, decoded back through the expansion LUTs; integer sample
    statistics per source.  The oracle restates the expansion from
    the ITU segment arithmetic — a wrong sign convention (A-law's
    sign bit SET means POSITIVE, the classic interop trap), a missed
    0x55 toggle, or an off-by-one bias hash-mismatches.

    100 TB shape: the media template — one mapInPandas stage,
    per-source aggregate."""
    from ..core.audiocodec import (
        _alaw_decode_table,
        _ulaw_decode_table,
        decode_wav,
        encode_wav_g711,
    )

    prep(spark)
    d = _media_doc_table(spark, sf_dir)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ulut = _ulaw_decode_table()
        alut = _alaw_decode_table()
        for pdf in batches:
            srcs, nss, sms, mns, mxs = [], [], [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                did = int(doc_id)
                n = (int(n_chars or 0) % G711_N_MOD) + 25
                codes = (did + 7 * np.arange(n, dtype=np.int64)) % 256
                law = "ulaw" if did % 2 == 0 else "alaw"
                lut = ulut if law == "ulaw" else alut
                samples = lut[codes].astype(np.int16)
                rate, ch, dec = decode_wav(
                    encode_wav_g711(samples, rate=8000, law=law)
                )
                if (rate, ch) != (8000, 1):
                    raise ValueError(
                        f"doc {doc_id}: header drifted {(rate, ch)}"
                    )
                dec = dec.reshape(-1)
                if not np.array_equal(dec, samples):
                    raise ValueError(
                        f"doc {doc_id}: companding round-trip diverged"
                    )
                s = dec.astype(np.int64)
                srcs.append(source)
                nss.append(n)
                sms.append(int(s.sum()))
                mns.append(int(s.min()))
                mxs.append(int(s.max()))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_samples": pd.Series(nss, dtype="int64"),
                    "sample_sum": pd.Series(sms, dtype="int64"),
                    "min_sample": pd.Series(mns, dtype="int64"),
                    "max_sample": pd.Series(mxs, dtype="int64"),
                }
            )

    dec = d.mapInPandas(_stats, _G711_STATS_SCHEMA)
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clips"),
            F.sum("n_samples").cast("bigint").alias("n_samples"),
            F.sum("sample_sum").cast("bigint").alias("sample_sum"),
            F.min("min_sample").cast("bigint").alias("min_sample"),
            F.max("max_sample").cast("bigint").alias("max_sample"),
        )
        .orderBy("source")
    )
