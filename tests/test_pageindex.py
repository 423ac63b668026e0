"""Parquet page indexes (OffsetIndex + ColumnIndex, PageIndex.md) —
writer emission, parser, and the index-driven page-skip read path.

Referees: pyarrow recognizes our indexes structurally
(``has_column_index`` / ``has_offset_index`` read ColumnChunk fids
6/7 and 4/5) and still reads every value; DuckDB full-scans the same
bytes; OUR parser round-trips pyarrow-WRITTEN indexes and drives a
page-skip read over them (interop pinned in both directions).
"""

import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.core.parquetmeta import (
    ParquetFormatError,
    indexed_pages,
    parse_column_index,
    parse_footer,
    parse_offset_index,
    prune_pages,
)
from databatchprotectionservice_spark.core.parquetread import (
    leaf_elements,
    read_column,
)
from databatchprotectionservice_spark.core.parquetwrite import write_parquet

COLS = {
    "a": list(range(1000)),
    "s": [None if i % 7 == 0 else f"v{i:04d}" for i in range(1000)],
    "f": [float(i) * 0.5 for i in range(1000)],
}
TYPES = {"a": "INT64", "s": "STRING", "f": "DOUBLE"}


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize(
    "codec", ["UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD"]
)
def test_pyarrow_recognizes_and_reads_indexed_file(codec, version):
    data = write_parquet(
        COLS, TYPES, codec=codec, page_rows=100, data_page_version=version
    )
    f = pq.ParquetFile(io.BytesIO(data))
    md = f.metadata
    for ci in range(md.num_columns):
        c = md.row_group(0).column(ci)
        assert c.has_column_index and c.has_offset_index
    t = f.read()
    assert t.column("a").to_pylist() == COLS["a"]
    assert t.column("s").to_pylist() == COLS["s"]
    assert t.column("f").to_pylist() == COLS["f"]


def test_column_index_contents_exact():
    data = write_parquet(COLS, TYPES, page_rows=100)
    meta = parse_footer(data)
    cols = meta["row_groups"][0]["columns"]
    a_idx = parse_column_index(data, cols[0])
    assert a_idx["boundary_order"] == "ASCENDING"
    assert a_idx["null_pages"] == [False] * 10
    assert a_idx["min_values"] == [i * 100 for i in range(10)]
    assert a_idx["max_values"] == [i * 100 + 99 for i in range(10)]
    assert a_idx["null_counts"] == [0] * 10
    s_idx = parse_column_index(data, cols[1])
    # every 7th value null: 100-row pages carry 14 or 15 nulls
    assert sum(s_idx["null_counts"]) == sum(
        1 for v in COLS["s"] if v is None
    )
    assert s_idx["min_values"][0] == b"v0001"
    assert s_idx["max_values"][9] == b"v0999"
    offs = parse_offset_index(data, cols[0])
    assert [p["first_row_index"] for p in offs] == [
        i * 100 for i in range(10)
    ]
    assert all(p["compressed_page_size"] > 0 for p in offs)
    # OffsetIndex byte ranges tile the data-page region exactly
    for prev, nxt in zip(offs, offs[1:]):
        assert (
            prev["offset"] + prev["compressed_page_size"] == nxt["offset"]
        )


def test_boundary_orders():
    desc = write_parquet(
        {"a": list(range(1000, 0, -1))}, {"a": "INT64"}, page_rows=100
    )
    meta = parse_footer(desc)
    idx = parse_column_index(desc, meta["row_groups"][0]["columns"][0])
    assert idx["boundary_order"] == "DESCENDING"

    mixed = write_parquet(
        {"a": [(i * 37) % 1000 for i in range(1000)]},
        {"a": "INT64"},
        page_rows=100,
    )
    meta = parse_footer(mixed)
    idx = parse_column_index(mixed, meta["row_groups"][0]["columns"][0])
    assert idx["boundary_order"] == "UNORDERED"


def test_all_null_page_bounds():
    vals = [None] * 100 + list(range(100))
    data = write_parquet({"a": vals}, {"a": "INT64"}, page_rows=100)
    meta = parse_footer(data)
    idx = parse_column_index(data, meta["row_groups"][0]["columns"][0])
    assert idx["null_pages"] == [True, False]
    assert idx["min_values"][0] is None and idx["max_values"][0] is None
    assert idx["min_values"][1] == 0
    assert idx["null_counts"] == [100, 0]
    # a value predicate never keeps the all-null page
    assert prune_pages(idx, 0, 10**9) == [1]


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize("use_dict", [True, False])
def test_page_skip_read_matches_full_read(version, use_dict):
    data = write_parquet(
        COLS,
        TYPES,
        codec="SNAPPY",
        page_rows=100,
        data_page_version=version,
        use_dictionary=use_dict,
    )
    meta = parse_footer(data)
    col = meta["row_groups"][0]["columns"][0]
    leaf = leaf_elements(meta["schema"])[0][0]
    idx = parse_column_index(data, col)
    keep = prune_pages(idx, 250, 349)
    assert keep == [2, 3]  # ascending data: exactly two candidates
    pages = indexed_pages(data, col, keep)
    vals = read_column(data, col, leaf, pages=pages)
    assert vals == list(range(200, 400))
    full = read_column(data, col, leaf)
    assert [v for v in vals if 250 <= v <= 349] == [
        v for v in full if v is not None and 250 <= v <= 349
    ]


def test_page_skip_reads_through_pyarrow_written_index():
    t = pa.table(
        {
            "a": pa.array(COLS["a"], pa.int64()),
            "s": pa.array(COLS["s"]),
        }
    )
    buf = io.BytesIO()
    pq.write_table(
        t,
        buf,
        write_page_index=True,
        data_page_size=700,
        write_batch_size=100,
        row_group_size=1000,
        use_dictionary=False,
        compression="snappy",
    )
    data = buf.getvalue()
    meta = parse_footer(data)
    col = meta["row_groups"][0]["columns"][0]
    idx = parse_column_index(data, col)
    offs = parse_offset_index(data, col)
    assert idx["boundary_order"] == "ASCENDING" and len(offs) > 1
    keep = prune_pages(idx, 250, 349)
    assert 0 < len(keep) < len(offs)
    leaf = leaf_elements(meta["schema"])[0][0]
    vals = read_column(
        data, col, leaf, pages=indexed_pages(data, col, keep)
    )
    assert [v for v in vals if 250 <= v <= 349] == list(range(250, 350))


def test_duckdb_reads_indexed_file(tmp_path):
    import duckdb

    data = write_parquet(COLS, TYPES, page_rows=100)
    path = tmp_path / "t.parquet"
    path.write_bytes(data)
    con = duckdb.connect()
    n, sa, ns = con.execute(
        f"SELECT count(*), sum(a), count(s) FROM '{path}' "
        "WHERE a BETWEEN 250 AND 349"
    ).fetchone()
    assert (n, sa) == (100, sum(range(250, 350)))
    assert ns == sum(
        1 for i in range(250, 350) if COLS["s"][i] is not None
    )


def test_indexed_pages_error_paths():
    data = write_parquet(COLS, TYPES, page_rows=100)
    meta = parse_footer(data)
    col = dict(meta["row_groups"][0]["columns"][0])
    with pytest.raises(ParquetFormatError):
        indexed_pages(data, col, [99])  # ordinal past the index
    col["offset_index_offset"] = None
    with pytest.raises(ParquetFormatError):
        indexed_pages(data, col, [0])  # no offset index
    # a file WITHOUT indexes parses to None, not an error
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    buf = io.BytesIO()
    pq.write_table(t, buf, write_page_index=False)
    plain = buf.getvalue()
    pmeta = parse_footer(plain)
    pcol = pmeta["row_groups"][0]["columns"][0]
    assert parse_column_index(plain, pcol) is None
    assert parse_offset_index(plain, pcol) is None
