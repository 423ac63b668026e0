"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The pattern for 100 TB media pipelines: media travels as a ``binary``
payload column plus a metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the payload
never crosses the JVM<->Python boundary row-at-a-time and a stage can
change cardinality (frame sampling is one->many).

The container has no image/audio codecs, so the *decode* step is STUBBED:
``decode_media(..., mode="fake")`` derives deterministic pseudo-dimensions
from the payload bytes, and ``mode="real"`` raises ``NotImplementedError``
(the seam where Pillow/ffmpeg would slot in). Everything around the stub —
schema, partitioning, batch shapes, cardinality changes — is real and
oracle-checked: the payloads here are the UTF-8 bytes of ``documents.text``
so every byte-level result is independently computable in SQL by DuckDB.
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
    return d.select(
        "doc_id",
        F.concat(F.lit("media/"), F.col("source")).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.md5(F.encode("text", "UTF-8")).alias("checksum"),
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


def decode_media(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode payloads to (width, height). ``mode="real"`` is the stub:
    it raises ``NotImplementedError`` because no media codec ships in this
    environment; ``mode="fake"`` derives deterministic dimensions from a
    sha256 of the payload, exercising the identical mapInPandas plumbing
    a real decoder would use."""
    if mode == "real":
        raise NotImplementedError(
            "real media decode requires an image/audio codec (Pillow/ffmpeg) "
            "not present in this environment; use mode='fake'"
        )
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
            counts = np.bincount(flat, minlength=256).astype(np.int64)

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
            del counts
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
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               min(md5(text)) AS min_checksum,
               max(md5(text)) AS max_checksum
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
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
               CAST(sum(length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                    AS BIGINT) AS sum_alpha,
               CAST(sum(length(regexp_replace(text, '[^0-9]', '', 'g')))
                    AS BIGINT) AS sum_digit,
               CAST(sum(octet_length(encode(text))
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
    oracle=f"""
        SELECT concat('media/', source) AS media_type,
               count(*) AS n_media,
               CAST(sum((octet_length(encode(text)) + {FRAME_BYTES - 1}) // {FRAME_BYTES})
                    AS BIGINT) AS n_frames,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS frame_bytes_total
        FROM documents
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
                   16 + CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) % 240
                       AS w,
                   16 + CAST(('0x' || substr(sha256(text), 3, 2)) AS INT) % 240
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
