"""ORC stripe value decode (core/orcread.py): pyarrow's ORC writer is
the referee across every chunk codec, every RLEv2 sub-encoding
(steered by data shape), string dictionary/direct encodings, nulls,
and multi-stripe files."""

import io
import random

import pyarrow as pa
import pytest
from pyarrow import orc

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.orcread import (
    OrcReadError,
    _ByteCursor,
    byte_rle_decode,
    bits_msb,
    read_orc_columns,
    rlev2_decode,
)

_rng = random.Random(17)
_N = 12000
_CASES = {
    "mono": list(range(_N)),                       # DELTA
    "const": [7] * _N,                             # SHORT_REPEAT
    "rand": [_rng.randint(-(10**9), 10**9) for _ in range(_N)],  # DIRECT
    "patch": [                                     # PATCHED_BASE
        _rng.randint(0, 100) if i % 97 else 10**12 + i
        for i in range(_N)
    ],
    "desc": list(range(_N, 0, -1)),                # negative delta base
    "nul": [None if i % 7 == 0 else i * 3 for i in range(_N)],
    "sdict": [f"cat-{i % 23}" for i in range(_N)],
    "sdir": [f"u-{_rng.randint(0, 10**9)}" for _ in range(_N)],
    "snul": [None if i % 5 == 0 else f"v{i % 301}" for i in range(_N)],
    "dbl": [_rng.random() * 1e6 - 5e5 for _ in range(_N)],
    "flt": pa.array([float(i) / 7 for i in range(_N)], pa.float32()),
    "bools": [
        bool((i // 13) % 2) if i % 11 else None for i in range(_N)
    ],
    "i8": pa.array([(i % 256) - 128 for i in range(_N)], pa.int8()),
    "i16": pa.array(
        [(i * 7) % 30000 - 15000 for i in range(_N)], pa.int16()
    ),
    "dt": pa.array(
        [None if i % 13 == 0 else 10000 + (i % 5000) for i in range(_N)],
        pa.date32(),
    ),
}


@pytest.mark.parametrize(
    "codec", ["uncompressed", "zlib", "snappy", "lz4", "zstd"]
)
def test_orc_decode_battery_vs_pyarrow(codec):
    t = pa.table(_CASES)
    buf = io.BytesIO()
    # small stripes force the multi-stripe walk
    orc.write_table(t, buf, compression=codec, stripe_size=64 * 1024)
    got = read_orc_columns(buf.getvalue())
    for name in _CASES:
        assert got[name] == t.column(name).to_pylist(), (codec, name)


def test_orc_column_projection_and_unknown():
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zlib")
    got = read_orc_columns(buf.getvalue(), columns=["b"])
    assert list(got) == ["b"] and got["b"] == ["x", "y", "z"]
    with pytest.raises(OrcReadError, match="not in the file"):
        read_orc_columns(buf.getvalue(), columns=["zz"])


def test_orc_unsupported_types_are_named_seams():
    # nested kinds stay the named seam (TIMESTAMP/DECIMAL decode
    # since the second r14 slice)
    t2 = pa.table({"l": pa.array([[1], [2, 3]], pa.list_(pa.int64()))})
    buf2 = io.BytesIO()
    orc.write_table(t2, buf2, compression="zlib")
    with pytest.raises(OrcReadError, match="seam"):
        read_orc_columns(buf2.getvalue())


def test_byte_rle_and_bits():
    # run: ctl 0 -> 3 copies; literal: ctl 0xFE -> 2 raw bytes
    assert byte_rle_decode(bytes([0, 0xAB, 0xFE, 1, 2]), 5) == bytes(
        [0xAB, 0xAB, 0xAB, 1, 2]
    )
    assert bits_msb(bytes([0b10110000]), 4) == [1, 0, 1, 1]
    with pytest.raises(OrcReadError):
        byte_rle_decode(bytes([0]), 3)  # run missing its value
    with pytest.raises(OrcReadError):
        bits_msb(b"\x00", 9)


def test_rlev2_short_repeat_and_direct_vectors():
    # spec's own examples: [10000, 10000, 10000, 10000, 10000]
    # -> 0x0a 0x27 0x10 (short repeat, width 2, repeat 5)
    cur = _ByteCursor(bytes([0x0A, 0x27, 0x10]))
    assert rlev2_decode(cur, 5, signed=False) == [10000] * 5
    # spec direct example: [23713, 43806, 57005, 48879] ->
    # 0x5e 0x03 0x5c 0xa1 0xab 0x1e 0xde 0xad 0xbe 0xef
    cur = _ByteCursor(
        bytes(
            [0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF]
        )
    )
    assert rlev2_decode(cur, 4, signed=False) == [
        23713,
        43806,
        57005,
        48879,
    ]


def test_rlev2_delta_spec_vector():
    # spec delta example: [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    # -> 0xc6 0x09 0x02 0x02 0x22 0x42 0x42 0x46
    cur = _ByteCursor(bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46]))
    assert rlev2_decode(cur, 10, signed=False) == [
        2, 3, 5, 7, 11, 13, 17, 19, 23, 29,
    ]


def test_orc_fuzz_domain_errors_only():
    """Mutations of a real ORC file either decode or raise the domain
    error family — no escapes."""
    t = pa.table({"a": list(range(500)), "s": [f"v{i % 17}" for i in range(500)]})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zlib")
    blob = buf.getvalue()
    rng = random.Random(5)
    for _ in range(300):
        b = bytearray(blob)
        for _ in range(rng.randint(1, 8)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            read_orc_columns(bytes(b))
        except DBPSInvalidInputError:
            pass


@pytest.mark.parametrize("codec", ["zlib", "zstd"])
def test_orc_dictionary_v2_decode(codec):
    """pyarrow's writer defaults dictionary OFF
    (dictionary_key_size_threshold=0.0) — force it on so
    DICTIONARY_V2 (sorted dictionary + index run) is pinned, nulls
    included."""
    from databatchprotectionservice_spark.core.orcread import (
        E_DICTIONARY_V2,
        parse_stripe_footer,
    )
    from databatchprotectionservice_spark.core.orcmeta import (
        parse_orc_meta,
    )

    t = pa.table(
        {
            "s": [f"cat-{i % 23}" for i in range(8000)],
            "snul": [
                None if i % 5 == 0 else f"v{i % 7}" for i in range(8000)
            ],
        }
    )
    buf = io.BytesIO()
    orc.write_table(
        t,
        buf,
        compression=codec,
        dictionary_key_size_threshold=0.9,
        stripe_size=64 * 1024,
    )
    blob = buf.getvalue()
    meta = parse_orc_meta(blob)
    meta["compression_id"] = {"ZLIB": 1, "ZSTD": 5}[meta["compression"]]
    sf = parse_stripe_footer(blob, meta, meta["stripes"][0])
    assert any(
        e["kind"] == E_DICTIONARY_V2 for e in sf["encodings"]
    ), sf["encodings"]  # the steering worked
    got = read_orc_columns(blob)
    for name in t.column_names:
        assert got[name] == t.column(name).to_pylist(), (codec, name)


@pytest.mark.parametrize("codec", ["uncompressed", "zstd"])
def test_orc_timestamp_and_decimal_decode(codec):
    """TIMESTAMP (base-2015 seconds + trailing-zero-packed nanos,
    BOTH pre-1970 conventions: the C++ writer's negative-nanos
    two's complement and the Java floor-plus-adjust) and DECIMAL
    (unbounded zigzag varint unscaled + per-value scale)."""
    import decimal

    ts = [
        1577836800000000,
        None,
        1600000000123456,
        100,
        -5000000,
        -1420070400000001,  # pre-1970 with sub-second part
        -5500000,
        1,
        -1,
    ]
    dec = [
        decimal.Decimal("123.45"),
        None,
        decimal.Decimal("-9999.99"),
        decimal.Decimal("0.01"),
        decimal.Decimal("0.00"),
        decimal.Decimal("31415926.53"),
        decimal.Decimal("-0.07"),
        decimal.Decimal("7"),
        decimal.Decimal("-7"),
    ]
    t = pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("us")),
            "dec": pa.array(dec, pa.decimal128(12, 2)),
        }
    )
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=codec)
    got = read_orc_columns(buf.getvalue())
    for name in ("ts", "dec"):
        assert got[name] == t.column(name).to_pylist(), (codec, name)
