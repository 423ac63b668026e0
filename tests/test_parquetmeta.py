"""Thrift compact reader + parquet footer walk.

The thrift layer is pinned by a struct assembled BYTE BY HAND from
the compact-protocol spec (field deltas, long-form ids, zigzag,
nibble booleans, list headers); the parquet layer is pinned against
pyarrow as the INDEPENDENT producer — our walk of real
pyarrow-written files must agree with pyarrow's own metadata objects
field by field, including the per-chunk page walk landing exactly on
``total_compressed_size`` with the declared value count.  The
mutation battery proves the domain-error contract on hostile footers.
"""

import io
import random
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.parquetmeta import (
    PAGE_DATA,
    PAGE_DATA_V2,
    PAGE_DICTIONARY,
    ParquetFormatError,
    parse_footer,
    walk_pages,
)
from databatchprotectionservice_spark.core.thriftcodec import (
    ThriftFormatError,
    ThriftReader,
)


def test_hand_assembled_compact_struct():
    wire = bytes(
        [
            0x15, 0x0A,              # field 1, i32, zigzag(5)
            0x18, 0x02] ) + b"ab" + bytes([
            0x19, 0x26, 0x02, 0x01,  # field 3, list<i64> [1, -1]
            0x1C, 0x11, 0x00,        # field 4, struct {1: true}
            0x05, 0xC8, 0x01, 0x0E,  # field 100 (long form), i32 7
            0x00,                    # stop
        ]
    )
    r = ThriftReader(wire)
    assert r.read_struct() == {
        1: 5,
        2: b"ab",
        3: [1, -1],
        4: {1: True},
        100: 7,
    }
    assert r.pos == len(wire)


def test_compact_double_and_false_and_map():
    wire = (
        bytes([0x17]) + struct.pack("<d", -2.5)  # field 1 double
        + bytes([0x12])                          # field 2 bool false
        + bytes([0x1B, 0x01, 0x55])              # field 3 map<i32,i32>
        + bytes([0x02, 0x04])                    #   {1: 2}
        + bytes([0x00])
    )
    assert ThriftReader(wire).read_struct() == {
        1: -2.5,
        2: False,
        3: {1: 2},
    }


def test_varint_and_depth_guards():
    with pytest.raises(ThriftFormatError, match="varint"):
        ThriftReader(bytes([0x15]) + b"\xff" * 10).read_struct()
    # 70 nested structs blow the depth cap, not the stack
    deep = bytes([0x1C]) * 70 + bytes([0x00]) * 71
    with pytest.raises(ThriftFormatError, match="depth"):
        ThriftReader(deep).read_struct()


def _table(n=4000):
    rng = random.Random(5)
    return pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "name": pa.array(
                [None if i % 13 == 12 else f"n{i}" for i in range(n)]
            ),
            "score": pa.array(
                [rng.random() for _ in range(n)], pa.float64()
            ),
            "flag": pa.array([i % 2 == 0 for i in range(n)]),
        }
    )


@pytest.mark.parametrize(
    "codec,version,use_dict",
    [
        ("snappy", "1.0", True),
        ("none", "1.0", False),
        ("gzip", "2.0", True),
        ("zstd", "2.0", False),
    ],
)
def test_pyarrow_interop(codec, version, use_dict):
    buf = io.BytesIO()
    pq.write_table(
        _table(),
        buf,
        compression=codec,
        row_group_size=1500,
        data_page_size=4096,
        data_page_version=version,
        use_dictionary=use_dict,
    )
    data = buf.getvalue()
    got = parse_footer(data)
    want = pq.ParquetFile(io.BytesIO(data)).metadata

    assert got["num_rows"] == want.num_rows == 4000
    assert len(got["row_groups"]) == want.num_row_groups == 3
    assert "parquet-cpp" in (got["created_by"] or "")
    # pre-order flattened schema: root + 4 leaves
    assert [s["name"] for s in got["schema"]][1:] == [
        "id", "name", "score", "flag",
    ]
    assert got["schema"][0]["num_children"] == 4

    for gi, rg in enumerate(got["row_groups"]):
        wrg = want.row_group(gi)
        assert rg["num_rows"] == wrg.num_rows
        for ci, col in enumerate(rg["columns"]):
            wc = wrg.column(ci)
            assert col["path_in_schema"] == wc.path_in_schema
            assert col["type"] == wc.physical_type
            assert col["codec"] == wc.compression
            assert col["num_values"] == wc.num_values
            assert col["data_page_offset"] == wc.data_page_offset
            assert (
                col["total_compressed_size"] == wc.total_compressed_size
            )
            pages = walk_pages(data, col)  # raises unless exact
            kinds = {p["type"] for p in pages}
            assert kinds <= {
                PAGE_DATA, PAGE_DATA_V2, PAGE_DICTIONARY,
            }
            if wc.has_dictionary_page:
                assert pages[0]["type"] == PAGE_DICTIONARY
            # plain-encoded 1500x8B columns overflow 4 KiB pages, so
            # the walk must see MULTIPLE data pages there
            if (
                not use_dict
                and rg["num_rows"] == 1500
                and col["path_in_schema"] in ("id", "score")
            ):
                assert (
                    sum(1 for p in pages if p["type"] != PAGE_DICTIONARY)
                    > 1
                )


def test_real_testdata_footer():
    with open("/root/testdata/sf0.001/lineitem.parquet", "rb") as f:
        data = f.read()
    got = parse_footer(data)
    assert got["num_rows"] == pq.read_metadata(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).num_rows
    for col in got["row_groups"][0]["columns"]:
        walk_pages(data, col)


def test_truncated_and_bad_magic():
    with pytest.raises(ParquetFormatError, match="magic"):
        parse_footer(b"PAR0" + bytes(20) + b"PAR0")
    with pytest.raises(ParquetFormatError):
        parse_footer(b"PAR1\x00\x00")


def test_mutation_battery():
    buf = io.BytesIO()
    pq.write_table(_table(600), buf, row_group_size=300)
    wire = buf.getvalue()
    rng = random.Random(41)
    for _ in range(2000):
        b = bytearray(wire)
        # target the footer region where the thrift lives
        lo = max(0, len(b) - 4000)
        for _ in range(rng.randint(1, 6)):
            op = rng.randrange(3)
            if op == 0:
                b[rng.randrange(lo, len(b))] ^= 1 << rng.randrange(8)
            elif op == 1 and len(b) > lo + 1:
                del b[rng.randrange(lo, len(b) - 1):]
            else:
                b.insert(rng.randrange(lo, len(b) + 1), rng.randrange(256))
        try:
            meta = parse_footer(bytes(b))
            for rg in meta["row_groups"]:
                for col in rg["columns"]:
                    walk_pages(bytes(b), col)
        except DBPSInvalidInputError:
            continue
        except RecursionError:
            pytest.fail("depth guard failed")
        except (UnicodeDecodeError, struct.error, MemoryError,
                KeyError, TypeError, AttributeError) as e:
            pytest.fail(f"non-domain error escaped: {type(e).__name__} {e}")


def test_legacy_min_max_restricted_by_physical_type():
    """Deprecated Statistics.min/max (fids 2/1) surface as typed bounds
    only for physical types whose legacy sort order was unambiguous;
    legacy BYTE_ARRAY bounds (signed byte ordering, PARQUET-251) must
    come back as None rather than as incorrect pruning bounds."""
    from databatchprotectionservice_spark.core.parquetmeta import _statistics

    legacy_int = {1: struct.pack("<q", 9), 2: struct.pack("<q", -3), 3: 0}
    st = _statistics(legacy_int, "INT64")
    assert (st["min_value"], st["max_value"]) == (-3, 9)

    legacy_ba = {1: b"zz", 2: b"\xff inco", 3: 1}
    st = _statistics(legacy_ba, "BYTE_ARRAY")
    assert st["min_value"] is None and st["max_value"] is None
    assert st["null_count"] == 1  # counts still surface

    # the MODERN pair (fids 6/5) is trusted for every type
    modern_ba = {5: b"zz", 6: b"aa"}
    st = _statistics(modern_ba, "BYTE_ARRAY")
    assert (st["min_value"], st["max_value"]) == (b"aa", b"zz")
