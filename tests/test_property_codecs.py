"""Property-based round-trips (hypothesis) for the format codecs.

Extends the reference-style exhaustive-roundtrip discipline
(``test_property_roundtrip.py``) to the container/serialization
codecs staged this round: for ARBITRARY generated values, the decode
of an encode is the identity — including every compression twin the
codec family owns (our LZ4/snappy vs real liblz4/C++ snappy via
pyarrow, both directions per example).
"""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.avrocodec import (
    encode_avro_ocf,
    parse_avro_ocf,
)
from databatchprotectionservice_spark.core.lz4codec import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
)
from databatchprotectionservice_spark.core.msgpackcodec import (
    Timestamp,
    packb,
    unpackb,
)
from databatchprotectionservice_spark.core.snappycodec import (
    snappy_compress,
    snappy_decompress,
)
from databatchprotectionservice_spark.core.tfexample import (
    make_example,
    parse_example,
)
from databatchprotectionservice_spark.core.tfrecordcodec import (
    encode_tfrecord,
    parse_tfrecord,
)
from databatchprotectionservice_spark.core.zstdmeta import (
    encode_zstd_raw,
    parse_zstd_frames,
)

# compressible-ish binary: runs of a few byte values plus noise
blobs = st.binary(max_size=2000) | st.builds(
    lambda b, k: b * k, st.binary(min_size=1, max_size=20),
    st.integers(1, 200),
)


@settings(max_examples=80, deadline=None)
@given(data=blobs)
def test_lz4_block_inverts_and_interops(data):
    ours = lz4_block_compress(data)
    assert lz4_block_decompress(ours) == data
    assert pa.decompress(
        ours, decompressed_size=len(data), codec="lz4_raw", asbytes=True
    ) == data
    assert lz4_block_decompress(
        pa.compress(data, codec="lz4_raw", asbytes=True)
    ) == data


@settings(max_examples=60, deadline=None)
@given(data=blobs, bc=st.booleans(), store=st.booleans())
def test_lz4_frame_inverts(data, bc, store):
    fr = lz4_frame_compress(
        data, block_checksum=bc, store_uncompressed=store
    )
    assert lz4_frame_decompress(fr)["content"] == data
    assert pa.decompress(
        fr, decompressed_size=len(data), codec="lz4", asbytes=True
    ) == data


@settings(max_examples=80, deadline=None)
@given(data=blobs)
def test_snappy_inverts_and_interops(data):
    ours = snappy_compress(data)
    assert snappy_decompress(ours) == data
    assert pa.decompress(
        ours, decompressed_size=len(data), codec="snappy", asbytes=True
    ) == data
    assert snappy_decompress(
        pa.compress(data, codec="snappy", asbytes=True)
    ) == data


@settings(max_examples=60, deadline=None)
@given(data=blobs, checksum=st.booleans())
def test_zstd_raw_frame_inverts(data, checksum):
    fr = encode_zstd_raw(data, checksum=checksum)
    (f,) = parse_zstd_frames(fr)
    assert f["content"] == data
    assert pa.decompress(
        fr, decompressed_size=len(data), codec="zstd", asbytes=True
    ) == data


@settings(max_examples=60, deadline=None)
@given(payloads=st.lists(st.binary(max_size=500), max_size=30))
def test_tfrecord_inverts(payloads):
    assert parse_tfrecord(encode_tfrecord(payloads)) == payloads


msgpack_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(-(2**63), 2**63 - 1)
    | st.floats(allow_nan=False)
    | st.text(max_size=60)
    | st.binary(max_size=60)
    | st.builds(
        Timestamp,
        st.integers(-(2**62), 2**62),
        st.integers(0, 10**9 - 1),
    ),
    lambda inner: st.lists(inner, max_size=6)
    | st.dictionaries(st.text(max_size=12), inner, max_size=6),
    max_leaves=25,
)


@settings(max_examples=120, deadline=None)
@given(v=msgpack_values)
def test_msgpack_inverts(v):
    assert unpackb(packb(v)) == v


_AVRO_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": "bytes"},
        {"name": "f", "type": "double"},
        {"name": "t", "type": "boolean"},
    ],
}
avro_rows = st.lists(
    st.fixed_dictionaries(
        {
            "k": st.integers(-(2**63), 2**63 - 1),
            "s": st.none() | st.text(max_size=40),
            "b": st.binary(max_size=40),
            "f": st.floats(allow_nan=False),
            "t": st.booleans(),
        }
    ),
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(rows=avro_rows, codec=st.sampled_from(["null", "deflate", "snappy"]))
def test_avro_inverts(rows, codec):
    wire = encode_avro_ocf(
        rows, _AVRO_SCHEMA, codec=codec, sync=b"P" * 16, block_records=7
    )
    assert parse_avro_ocf(wire)["records"] == rows


@settings(max_examples=60, deadline=None)
@given(
    feats=st.dictionaries(
        st.text(min_size=1, max_size=20),
        st.lists(st.binary(max_size=40), min_size=1, max_size=5)
        | st.lists(
            st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=5
        ),
        max_size=6,
    )
)
def test_tfexample_inverts(feats):
    assert parse_example(make_example(feats)) == feats
