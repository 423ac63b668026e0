"""Nested (REPEATED) parquet columns through the from-scratch reader.

Pins `core/parquetread.py`'s repetition-level decode + Dremel record
assembly value-for-value against pyarrow's reader over a write
matrix: list<int64> / list<string> / list<list<double>> with null
lists, empty lists and null elements, both data-page versions, dict
and plain encodings, snappy and uncompressed, page-spanning records,
map key/value legs, and the real testdata embeddings file.  The
reference's level machinery treats repetition levels as opaque
framed bytes (parquet_utils.cpp:191-222); this suite proves ours
decodes and reassembles them.
"""

import io
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.core.parquetmeta import parse_footer
from databatchprotectionservice_spark.core.parquetread import (
    ParquetReadError,
    assemble_nested,
    leaf_paths,
    read_column,
)

SF_DIR = "/root/testdata/sf0.001"


def _convert(v):
    if isinstance(v, bytes):
        return v.decode("utf-8", "surrogateescape")
    if isinstance(v, list):
        return [_convert(x) for x in v]
    return v


def read_all_columns(data: bytes) -> list:
    meta = parse_footer(data)
    paths = leaf_paths(meta["schema"])
    cols = [[] for _ in paths]
    for rg in meta["row_groups"]:
        for ci, col in enumerate(rg["columns"]):
            leaf, path = paths[ci]
            cols[ci].extend(read_column(data, col, leaf, path=path))
    return [[_convert(v) for v in c] for c in cols]


def assert_matches_pyarrow(data: bytes) -> None:
    ref = pq.ParquetFile(io.BytesIO(data)).read()
    got = read_all_columns(data)
    for ci in range(len(got)):
        want = [_convert(v) for v in ref.column(ci).to_pylist()]
        assert got[ci] == want, f"column {ci} diverges from pyarrow"


MATRIX_TABLE = pa.table(
    {
        "a": pa.array(
            [[1, 2, 3], [], None, [None, 5], [6]],
            type=pa.list_(pa.int64()),
        ),
        "b": pa.array(
            [["x", "yy"], None, [], ["z", None], ["w"]],
            type=pa.list_(pa.string()),
        ),
        "c": pa.array(
            [[[1.5], [2.5, None]], [], None, [None, [3.5]], [[]]],
            type=pa.list_(pa.list_(pa.float64())),
        ),
        "flat": pa.array([1, None, 3, 4, 5], type=pa.int32()),
    }
)


@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
@pytest.mark.parametrize("use_dict", [True, False])
@pytest.mark.parametrize("codec", ["snappy", "none"])
def test_list_matrix_matches_pyarrow(dpv, use_dict, codec):
    buf = io.BytesIO()
    pq.write_table(
        MATRIX_TABLE,
        buf,
        use_dictionary=use_dict,
        compression=codec,
        data_page_version=dpv,
    )
    assert_matches_pyarrow(buf.getvalue())


@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
def test_page_spanning_records(dpv):
    """Tiny pages force records to span page boundaries (V1 makes no
    alignment promise) — the chunk-level level accumulation must
    reassemble across them."""
    rng = random.Random(7)
    rows = []
    for _ in range(20000):
        roll = rng.random()
        if roll < 0.05:
            rows.append(None)
        elif roll < 0.10:
            rows.append([])
        else:
            rows.append(
                [
                    None if rng.random() < 0.1 else rng.randint(0, 9)
                    for _ in range(rng.randint(0, 8))
                ]
            )
    t = pa.table({"v": pa.array(rows, type=pa.list_(pa.int64()))})
    buf = io.BytesIO()
    pq.write_table(
        t,
        buf,
        data_page_size=1024,
        row_group_size=7000,
        data_page_version=dpv,
    )
    assert_matches_pyarrow(buf.getvalue())


def test_map_legs_decode_as_chains():
    """Map key/value legs are chain paths (optional group -> repeated
    key_value -> leaf) — each decodes independently."""
    t = pa.table(
        {
            "m": pa.array(
                [{"a": 1, "b": 2}, None, {}, {"c": None}],
                type=pa.map_(pa.string(), pa.int64()),
            )
        }
    )
    buf = io.BytesIO()
    pq.write_table(t, buf)
    data = buf.getvalue()
    meta = parse_footer(data)
    paths = leaf_paths(meta["schema"])
    legs = []
    for ci, (leaf, path) in enumerate(paths):
        vals = []
        for rg in meta["row_groups"]:
            vals.extend(
                read_column(data, rg["columns"][ci], leaf, path=path)
            )
        legs.append([_convert(v) for v in vals])
    assert legs[0] == [["a", "b"], None, [], ["c"]]
    assert legs[1] == [[1, 2], None, [], [None]]


def test_real_embeddings_file():
    data = open(f"{SF_DIR}/embeddings.parquet", "rb").read()
    assert_matches_pyarrow(data)


def test_nested_without_path_still_refuses():
    data = open(f"{SF_DIR}/embeddings.parquet", "rb").read()
    meta = parse_footer(data)
    paths = leaf_paths(meta["schema"])
    # column 1 is embedding.list.element
    leaf, path = paths[1]
    col = meta["row_groups"][0]["columns"][1]
    with pytest.raises(ParquetReadError):
        read_column(data, col, leaf, nested=True)


def test_assembly_rejects_bad_repetition_level():
    # r=1 with no open list is malformed striping
    path = [
        {"repetition": "OPTIONAL", "num_children": 1, "name": "g"},
        {"repetition": "REPEATED", "num_children": 1, "name": "list"},
        {"repetition": "OPTIONAL", "num_children": 0, "name": "element"},
    ]
    with pytest.raises(ParquetReadError):
        assemble_nested([1], [3], [5], path)


def test_assembly_flat_semantics_table():
    """The canonical single-list truth table (spec examples)."""
    path = [
        {"repetition": "OPTIONAL", "num_children": 1, "name": "g"},
        {"repetition": "REPEATED", "num_children": 1, "name": "list"},
        {"repetition": "OPTIONAL", "num_children": 0, "name": "element"},
    ]
    reps = [0, 0, 0, 0, 1, 1]
    defs = [0, 1, 2, 3, 3, 2]
    vals = [10, 20]
    assert assemble_nested(reps, defs, vals, path) == [
        None,
        [],
        [None],
        [10, 20, None],
    ]


@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
def test_struct_ancestor_leaves_flatten(dpv):
    """Leaves under OPTIONAL struct groups (no repetition) decode
    with the CHAIN's max_def: a null struct flattens the leaf slot
    to None; struct-under-list reassembles per-leaf."""
    t = pa.table(
        {
            "s": pa.array(
                [
                    {"a": 1, "b": "x"},
                    None,
                    {"a": None, "b": "y"},
                    {"a": 4, "b": None},
                ],
                type=pa.struct([("a", pa.int64()), ("b", pa.string())]),
            ),
            "ls": pa.array(
                [[{"a": 1}, {"a": None}], None, [], [{"a": 7}]],
                type=pa.list_(pa.struct([("a", pa.int64())])),
            ),
        }
    )
    buf = io.BytesIO()
    pq.write_table(t, buf, data_page_version=dpv)
    data = buf.getvalue()
    meta = parse_footer(data)
    paths = leaf_paths(meta["schema"])
    got = []
    for ci, (leaf, path) in enumerate(paths):
        vals = []
        for rg in meta["row_groups"]:
            vals.extend(
                read_column(data, rg["columns"][ci], leaf, path=path)
            )
        got.append([_convert(v) for v in vals])
    assert got[0] == [1, None, None, 4]
    assert got[1] == ["x", None, "y", None]
    assert got[2] == [[1, None], None, [], [7]]


def _conv_deep(v):
    if isinstance(v, bytes):
        return v.decode("utf-8", "surrogateescape")
    if isinstance(v, list):
        return [_conv_deep(x) for x in v]
    if isinstance(v, dict):
        return {k: _conv_deep(x) for k, x in v.items()}
    return v


@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
@pytest.mark.parametrize("codec", ["snappy", "none"])
def test_branching_struct_record_assembly(dpv, codec):
    """read_record_field (r11): cross-column Dremel assembly closes
    the branching-struct seam — struct, nested struct, list<struct>,
    struct-of-list, maps and list<list<struct>> reassemble exactly,
    with marker depths disambiguating null-struct from
    present-struct-with-null-leaf."""
    from databatchprotectionservice_spark.core.parquetread import (
        read_record_field,
    )

    t = pa.table(
        {
            "flat": pa.array([1, None, 3], pa.int64()),
            "st": pa.array(
                [{"a": 1, "b": "x"}, None, {"a": None, "b": None}],
                pa.struct([("a", pa.int64()), ("b", pa.string())]),
            ),
            "nested_st": pa.array(
                [
                    {"in": {"p": 1, "q": 2.5}, "r": "top"},
                    {"in": None, "r": None},
                    None,
                ],
                pa.struct(
                    [
                        ("in", pa.struct(
                            [("p", pa.int64()), ("q", pa.float64())]
                        )),
                        ("r", pa.string()),
                    ]
                ),
            ),
            "ls": pa.array(
                [[{"a": 1, "b": "x"}, {"a": None, "b": "y"}], None, []],
                pa.list_(
                    pa.struct([("a", pa.int64()), ("b", pa.string())])
                ),
            ),
            "sl": pa.array(
                [
                    {"v": [1, 2], "w": "k"},
                    {"v": None, "w": "m"},
                    {"v": [], "w": None},
                ],
                pa.struct(
                    [("v", pa.list_(pa.int64())), ("w", pa.string())]
                ),
            ),
            "m": pa.array(
                [{"a": 1, "b": 2}, None, {}],
                pa.map_(pa.string(), pa.int64()),
            ),
            "lls": pa.array(
                [[[{"z": 1}]], [None, []], None],
                pa.list_(pa.list_(pa.struct([("z", pa.int64())]))),
            ),
        }
    )
    buf = io.BytesIO()
    pq.write_table(
        t, buf, data_page_version=dpv, compression=codec,
        row_group_size=2,
    )
    data = buf.getvalue()
    meta = parse_footer(data)
    for ordinal, name in enumerate(t.column_names):
        got = _conv_deep(read_record_field(data, meta, ordinal))
        want = _conv_deep(t.column(ordinal).to_pylist())
        if name == "m":
            got = [
                None if r is None
                else [(e["key"], e["value"]) for e in r]
                for r in got
            ]
        assert got == want, name


def test_branching_struct_randomized_fuzz():
    """Randomized deep shapes (struct/list mixes with nulls at every
    level) through write -> read_record_field, pyarrow as referee."""
    from databatchprotectionservice_spark.core.parquetread import (
        read_record_field,
    )

    rng = random.Random(13)
    inner = pa.struct([("p", pa.int64()), ("q", pa.string())])
    typ = pa.struct(
        [
            ("s", inner),
            ("xs", pa.list_(inner)),
            ("n", pa.int64()),
        ]
    )

    def mk_inner():
        if rng.random() < 0.2:
            return None
        return {
            "p": None if rng.random() < 0.3 else rng.randint(0, 99),
            "q": None if rng.random() < 0.3 else f"s{rng.randint(0, 9)}",
        }

    rows = []
    for _ in range(400):
        if rng.random() < 0.1:
            rows.append(None)
            continue
        rows.append(
            {
                "s": mk_inner(),
                "xs": None
                if rng.random() < 0.15
                else [mk_inner() for _ in range(rng.randint(0, 4))],
                "n": None if rng.random() < 0.3 else rng.randint(0, 9),
            }
        )
    t = pa.table({"c": pa.array(rows, typ)})
    buf = io.BytesIO()
    pq.write_table(t, buf, data_page_size=512, row_group_size=150)
    data = buf.getvalue()
    meta = parse_footer(data)
    got = _conv_deep(read_record_field(data, meta, 0))
    assert got == _conv_deep(t.column(0).to_pylist())
