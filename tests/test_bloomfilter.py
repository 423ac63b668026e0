"""Split-block Bloom filters: XXH64 vectors, SBBF behavior, the
parquet writer/reader plumbing (ColumnMetaData fids 14/15)."""

import io

import pytest

from databatchprotectionservice_spark.core.bloomfilter import (
    SplitBlockBloomFilter,
    plain_bytes,
    xxh64,
)
from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.parquetmeta import (
    ParquetFormatError,
    parse_bloom_filter,
    parse_footer,
)
from databatchprotectionservice_spark.core.parquetwrite import (
    ParquetWriteError,
    write_parquet,
)


def test_xxh64_published_vectors():
    # the reference implementation's published seed-0 digests
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999


def test_xxh64_length_classes_regression():
    """One digest per code path (empty / <4 / <8 / exactly 8 / <32 /
    exactly 32 / stripes+tail), pinned from the run that was
    cross-checked against Spark's JVM xxhash64 (seed 42, BinaryType)
    over 53 inputs covering every length class."""
    cases = {
        (b"xy", 0): 0xD636CDD32EE68A9F,
        (b"0123456", 0): 0x97EE4FE4A0FF4DFA,
        (b"01234567", 0): 0xE4BA22A49AD89D3F,
        (b"0123456789abcdef", 0): 0x5C5B90C34E376D0B,
        (b"0123456789abcdef0123456789abcdef", 0): 0x642A94958E71E6C5,
        (b"0123456789abcdef0123456789abcdef012", 42): 0x6884D15C3832E4FE,
    }
    for (data, seed), want in cases.items():
        got = xxh64(data, seed)
        assert got == want, (data, seed, hex(got), hex(want))


def test_sbbf_no_false_negatives_and_low_fp():
    f = SplitBlockBloomFilter.for_ndv(1000)
    for v in range(1000):
        f.insert(v, "INT64")
    assert all(f.might_contain(v, "INT64") for v in range(1000))
    fp = sum(f.might_contain(v, "INT64") for v in range(5000, 15000))
    assert fp < 300  # ~10 bits/value targets ~1%; 3% is the alarm bar


def test_sbbf_strings_and_floats():
    f = SplitBlockBloomFilter.for_ndv(100)
    for i in range(100):
        f.insert(f"user-{i}", "BYTE_ARRAY")
    assert f.might_contain("user-7", "BYTE_ARRAY")
    assert not all(
        f.might_contain(f"ghost-{i}", "BYTE_ARRAY") for i in range(50)
    )
    g = SplitBlockBloomFilter.for_ndv(10)
    g.insert(-0.0, "DOUBLE")
    # -0.0 == +0.0 must hash alike (the spec's normalization)
    assert g.might_contain(0.0, "DOUBLE")
    with pytest.raises(DBPSInvalidInputError):
        plain_bytes(True, "BOOLEAN")


def test_sbbf_bytes_roundtrip_and_validation():
    f = SplitBlockBloomFilter.for_ndv(500)
    for v in range(500):
        f.insert(v, "INT32")
    g = SplitBlockBloomFilter.from_bytes(f.to_bytes())
    assert all(g.might_contain(v, "INT32") for v in range(500))
    with pytest.raises(DBPSInvalidInputError):
        SplitBlockBloomFilter(16)  # under the 32-byte floor
    with pytest.raises(DBPSInvalidInputError):
        SplitBlockBloomFilter(48)  # not whole blocks


def _bloom_file():
    cols = {
        "k": list(range(1000)),
        "name": [f"user-{i % 97}" for i in range(1000)],
        "score": [i * 0.5 for i in range(1000)],
    }
    types = {"k": "INT64", "name": "STRING", "score": "DOUBLE"}
    blob = write_parquet(
        cols,
        types,
        codec="SNAPPY",
        row_group_rows=250,
        bloom_filter_columns=["k", "name"],
    )
    return cols, blob


def test_writer_blooms_roundtrip_per_row_group():
    cols, blob = _bloom_file()
    foot = parse_footer(blob)
    assert len(foot["row_groups"]) == 4
    for gi, rg in enumerate(foot["row_groups"]):
        for ch in rg["columns"]:
            f = parse_bloom_filter(blob, ch)
            name = ch["path_in_schema"]
            if name == "score":
                assert f is None
                assert ch["bloom_filter_offset"] is None
                continue
            lo = gi * 250
            ptype = "INT64" if name == "k" else "BYTE_ARRAY"
            vals = cols["k" if name == "k" else "name"][lo : lo + 250]
            assert all(f.might_contain(v, ptype) for v in vals)
    # the k blooms separate row groups: group 0 holds 0..249 only
    ch0 = foot["row_groups"][0]["columns"][0]
    f0 = parse_bloom_filter(blob, ch0)
    hits = sum(f0.might_contain(v, "INT64") for v in range(250, 1000))
    assert hits < 100  # overwhelmingly pruned


def test_writer_blooms_external_readers_unaffected():
    import duckdb
    import pyarrow.parquet as pq

    cols, blob = _bloom_file()
    t = pq.read_table(io.BytesIO(blob))
    assert t.column("k").to_pylist() == cols["k"]
    con = duckdb.connect()
    import tempfile, os

    with tempfile.NamedTemporaryFile(
        suffix=".parquet", delete=False
    ) as tf:
        tf.write(blob)
    try:
        n, s = con.execute(
            f"SELECT count(*), sum(k) FROM '{tf.name}'"
        ).fetchone()
        assert (n, s) == (1000, sum(cols["k"]))
    finally:
        os.unlink(tf.name)


def test_writer_bloom_validation():
    with pytest.raises(ParquetWriteError):
        write_parquet(
            {"a": [1]}, {"a": "INT64"}, bloom_filter_columns=["zz"]
        )
    with pytest.raises(ParquetWriteError):
        write_parquet(
            {"a": [[1, 2]]},
            {"a": "LIST<INT64>"},
            bloom_filter_columns=["a"],
        )


def test_parse_bloom_filter_rejects_bad_headers():
    _cols, blob = _bloom_file()
    foot = parse_footer(blob)
    ch = dict(foot["row_groups"][0]["columns"][0])
    # length disagreeing with header + bitset
    ch_bad = dict(ch, bloom_filter_length=ch["bloom_filter_length"] + 1)
    with pytest.raises(ParquetFormatError):
        parse_bloom_filter(blob, ch_bad)
    # offset outside the file
    with pytest.raises(ParquetFormatError):
        parse_bloom_filter(blob, dict(ch, bloom_filter_offset=len(blob)))
    # an unknown union arm must refuse, not mis-hash: craft a header
    # with algorithm arm 2
    from databatchprotectionservice_spark.core.thriftcodec import (
        T_I32,
        T_STRUCT,
        ThriftWriter,
    )

    w = ThriftWriter()
    w.write_struct(
        [
            (1, T_I32, 32),
            (2, T_STRUCT, [(2, T_STRUCT, [])]),  # unknown algorithm
            (3, T_STRUCT, [(1, T_STRUCT, [])]),
            (4, T_STRUCT, [(1, T_STRUCT, [])]),
        ]
    )
    crafted = w.getvalue() + b"\x00" * 32
    with pytest.raises(ParquetFormatError):
        parse_bloom_filter(
            crafted, {"bloom_filter_offset": 0, "bloom_filter_length": None}
        )
