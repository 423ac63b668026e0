"""DELTA encodings (Encodings.md): DELTA_BINARY_PACKED,
DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY — both directions, both
page versions, pyarrow + DuckDB + self as referees."""

import io
import os
import random
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.core.parquetmeta import (
    parse_footer,
)
from databatchprotectionservice_spark.core.parquetread import (
    ParquetReadError,
    _delta_bp_decode,
    leaf_elements,
    read_column,
)
from databatchprotectionservice_spark.core.parquetwrite import (
    ParquetWriteError,
    _delta_bp_encode,
    write_parquet,
)


def _read_ours(blob: bytes, name: str) -> list:
    meta = parse_footer(blob)
    les = {le["name"]: le for le, _r in leaf_elements(meta["schema"])}
    out = []
    for rg in meta["row_groups"]:
        col = next(
            c for c in rg["columns"] if c["path_in_schema"] == name
        )
        out += read_column(blob, col, les[name])
    return [o.decode() if isinstance(o, bytes) else o for o in out]


def test_delta_bp_codec_roundtrip_cases():
    rng = random.Random(11)
    cases = [
        [],
        [0],
        [5, 5, 5, 5],
        list(range(1000)),
        list(range(1000, 0, -1)),
        [rng.randint(-(2**62), 2**62) for _ in range(777)],
        [0, 2**62, -(2**62), 1, -1] * 40,
    ]
    for vals in cases:
        blob = _delta_bp_encode(vals, 64)
        got, pos = _delta_bp_decode(blob, 0, 64)
        assert got == vals
        assert pos == len(blob)  # no trailing garbage


def test_delta_bp_int32_modular_wraparound():
    # deltas wrap modulo 2^32 (spec's modular arithmetic)
    vals = [2**31 - 1, -(2**31), 2**31 - 1]
    blob = _delta_bp_encode(vals, 32)
    got, _ = _delta_bp_decode(blob, 0, 32)
    assert got == vals


@pytest.mark.parametrize("dpv", [1, 2])
def test_writer_delta_three_referees(dpv):
    rng = random.Random(3)
    okeys = sorted(rng.randint(0, 10**9) for _ in range(3000))
    names = [f"key-{i:06d}-{'pad' * (i % 5)}" for i in range(2500)]
    nulls = [None if i % 11 == 0 else i - 700 for i in range(1500)]
    for cols, types, encs in [
        ({"a": okeys}, {"a": "INT64"}, {"a": "DELTA_BINARY_PACKED"}),
        (
            {"a": [v % 2**31 for v in okeys]},
            {"a": "INT32"},
            {"a": "DELTA_BINARY_PACKED"},
        ),
        ({"a": nulls}, {"a": "INT64"}, {"a": "DELTA_BINARY_PACKED"}),
        (
            {"s": names},
            {"s": "STRING"},
            {"s": "DELTA_LENGTH_BYTE_ARRAY"},
        ),
        ({"s": names}, {"s": "STRING"}, {"s": "DELTA_BYTE_ARRAY"}),
    ]:
        blob = write_parquet(
            cols,
            types,
            codec="SNAPPY",
            page_rows=700,
            data_page_version=dpv,
            row_group_rows=1100,
            column_encodings=encs,
        )
        name = list(cols)[0]
        want = cols[name]
        assert (
            pq.read_table(io.BytesIO(blob)).column(name).to_pylist()
            == want
        )
        assert _read_ours(blob, name) == want
        import duckdb

        with tempfile.NamedTemporaryFile(
            suffix=".parquet", delete=False
        ) as tf:
            tf.write(blob)
        try:
            got = [
                r[0]
                for r in duckdb.connect()
                .execute(f"SELECT {name} FROM '{tf.name}'")
                .fetchall()
            ]
        finally:
            os.unlink(tf.name)
        assert got == want


def test_writer_delta_sorted_ints_beat_plain():
    okeys = sorted(
        random.Random(5).randint(0, 10**9) for _ in range(4000)
    )
    delta = write_parquet(
        {"a": okeys},
        {"a": "INT64"},
        column_encodings={"a": "DELTA_BINARY_PACKED"},
        use_dictionary=False,
    )
    plain = write_parquet(
        {"a": okeys}, {"a": "INT64"}, use_dictionary=False
    )
    assert len(delta) < len(plain) / 2  # sorted keys pack far tighter


@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
@pytest.mark.parametrize(
    "enc,vals,typ",
    [
        (
            "DELTA_BINARY_PACKED",
            [None if i % 9 == 0 else i * 7 - 3000 for i in range(2000)],
            pa.int64(),
        ),
        (
            "DELTA_BINARY_PACKED",
            list(range(-(2**31), -(2**31) + 3000)),
            pa.int32(),
        ),
        (
            "DELTA_LENGTH_BYTE_ARRAY",
            [f"user-{i % 37:04d}-{'x' * (i % 11)}" for i in range(4000)],
            pa.string(),
        ),
        (
            "DELTA_BYTE_ARRAY",
            sorted(f"key-{i:06d}" for i in range(2000)),
            pa.string(),
        ),
    ],
)
def test_reader_decodes_pyarrow_delta(enc, vals, typ, dpv):
    t = pa.table({"c": pa.array(vals, typ)})
    buf = io.BytesIO()
    pq.write_table(
        t,
        buf,
        use_dictionary=False,
        column_encoding={"c": enc},
        version="2.6",
        data_page_version=dpv,
    )
    assert _read_ours(buf.getvalue(), "c") == vals


def test_writer_delta_validation():
    with pytest.raises(ParquetWriteError):
        write_parquet(
            {"a": [1]},
            {"a": "INT64"},
            column_encodings={"zz": "DELTA_BINARY_PACKED"},
        )
    with pytest.raises(ParquetWriteError):
        write_parquet(
            {"a": [1]},
            {"a": "INT64"},
            column_encodings={"a": "SUPER_ENCODING"},
        )
    with pytest.raises(ParquetWriteError):
        write_parquet(
            {"a": ["x"]},
            {"a": "STRING"},
            column_encodings={"a": "DELTA_BINARY_PACKED"},
        )
    with pytest.raises(ParquetWriteError):
        write_parquet(
            {"a": [[1]]},
            {"a": "LIST<INT64>"},
            column_encodings={"a": "DELTA_BINARY_PACKED"},
        )


def test_reader_rejects_malformed_delta():
    good = _delta_bp_encode(list(range(100)), 64)
    with pytest.raises(ParquetReadError):
        _delta_bp_decode(good[:-5], 0, 64)  # truncated miniblock
    # corrupt the header's block size to a non-multiple of 128
    bad = bytes([127]) + good[1:]
    with pytest.raises(ParquetReadError):
        _delta_bp_decode(bad, 0, 64)


def test_lz4_hadoop_spark_interop(spark, tmp_path):
    """Spark (parquet-mr lineage) is the codec-5 referee in BOTH
    directions: it reads our hadoop-framed file, and our reader
    decodes its lz4 output."""
    import glob

    from databatchprotectionservice_spark.core.parquetread import (
        read_column,
    )

    cols = {"k": list(range(2000))}
    blob = write_parquet(cols, {"k": "INT64"}, codec="LZ4")
    own = tmp_path / "own.parquet"
    own.write_bytes(blob)
    df = spark.read.parquet(str(own))
    assert df.count() == 2000
    assert [r["k"] for r in df.orderBy("k").limit(3).collect()] == [
        0,
        1,
        2,
    ]

    out = tmp_path / "sparkout"
    spark.conf.set("spark.sql.parquet.compression.codec", "lz4")
    try:
        spark.range(0, 1500).selectExpr("id AS k").coalesce(
            1
        ).write.mode("overwrite").parquet(str(out))
    finally:
        spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    f = glob.glob(str(out / "part-*.parquet"))[0]
    sblob = open(f, "rb").read()
    meta = parse_footer(sblob)
    col = meta["row_groups"][0]["columns"][0]
    assert col["codec"] == "LZ4"
    les = {le["name"]: le for le, _r in leaf_elements(meta["schema"])}
    got = []
    for rg in meta["row_groups"]:
        got += read_column(sblob, rg["columns"][0], les["k"])
    assert got == list(range(1500))


def test_delta_and_bloom_fuzz_domain_errors_only():
    """Byte-mutation fuzz over the r14 decoders: every outcome is a
    clean decode or the codec's own domain error — never an escape
    (IndexError, struct.error, OverflowError, MemoryError) and never
    an allocation bomb (the header sanity bounds)."""
    import random as _random

    from databatchprotectionservice_spark.core.errors import (
        DBPSInvalidInputError,
    )
    from databatchprotectionservice_spark.core.parquetmeta import (
        parse_bloom_filter,
    )
    from databatchprotectionservice_spark.core.parquetread import (
        _delta_ba_decode,
        _delta_len_ba_decode,
        _inflate,
    )
    from databatchprotectionservice_spark.core.types import (
        CompressionCodec,
    )

    rng = _random.Random(99)
    delta_seed = _delta_bp_encode(list(range(0, 600, 7)), 64)
    bloom_col, bloom_blob = None, None
    cols = {"k": list(range(300))}
    bloom_blob = write_parquet(
        cols, {"k": "INT64"}, bloom_filter_columns=["k"]
    )
    bloom_col = parse_footer(bloom_blob)["row_groups"][0]["columns"][0]
    lz4_page = write_parquet(cols, {"k": "INT64"}, codec="LZ4")

    def mutate(raw: bytes) -> bytes:
        b = bytearray(raw)
        for _ in range(rng.randint(1, 6)):
            op = rng.randrange(3)
            if op == 0 and b:
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            elif op == 1 and len(b) > 4:
                del b[rng.randrange(len(b))]
            else:
                b.insert(
                    rng.randrange(len(b) + 1), rng.randrange(256)
                )
        return bytes(b)

    for _ in range(400):
        m = mutate(delta_seed)
        try:
            _delta_bp_decode(m, 0, 64)
            _delta_len_ba_decode(m, 0, 50)
            _delta_ba_decode(m, 0, 50)
        except DBPSInvalidInputError:
            pass
    for _ in range(200):
        m = mutate(bloom_blob)
        try:
            parse_bloom_filter(m, bloom_col)
        except DBPSInvalidInputError:
            pass
        try:
            _inflate(mutate(lz4_page[:256]), CompressionCodec.LZ4, 2400)
        except DBPSInvalidInputError:
            pass
    # pure-garbage battery
    for _ in range(200):
        g = bytes(rng.randrange(256) for _ in range(rng.randint(0, 96)))
        for fn in (
            lambda: _delta_bp_decode(g, 0, 64),
            lambda: _delta_len_ba_decode(g, 0, 10),
            lambda: _delta_ba_decode(g, 0, 10),
            lambda: _inflate(g, CompressionCodec.LZ4, 100),
            lambda: parse_bloom_filter(
                g, {"bloom_filter_offset": 0, "bloom_filter_length": None}
            ),
        ):
            try:
                fn()
            except DBPSInvalidInputError:
                pass
