"""Protection pipeline queries — the reference's core capability as
DataFrame operators.

The oracle cannot run our cipher, but it can verify the two properties the
reference itself tests (``encryption_sequencer_test.cpp:260``,
``dbpa_remote_testapp.cpp:339-581``):

1. **Round-trip identity** — any aggregate over ``unprotect(protect(col))``
   must equal the same aggregate over the raw column. The Spark side runs
   the real cipher both ways; the oracle aggregates the raw table.
2. **Ciphertext shape** — the keystream cipher is length-preserving and the
   cell layout is ``[1-byte tag][ciphertext]``, so ciphertext sizes are
   exactly computable in SQL: ``octet_length(value) + 1``.

Both hold per-row with no floating arithmetic, so hash-equality is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.protect import protect_column, unprotect_column
from ..plans.registry import (
    SPREAD_MIN_BYTES_LIGHT,
    load_spread,
    prep,
    register,
)
from .relational import dec_str

DEC = "decimal(18,2)"


@register(
    "protect_roundtrip_lineitem",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            count(*) AS n,
            CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_price,
            CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey,
            min(l_returnflag) AS min_flag
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    description="protect+unprotect 3 lineitem columns, aggregate must equal raw",
)
def protect_roundtrip_lineitem(spark, sf_dir):
    prep(spark)
    li = load_spread(
        spark, sf_dir, "lineitem", min_bytes=SPREAD_MIN_BYTES_LIGHT
    ).select("l_returnflag", "l_linestatus", "l_extendedprice", "l_orderkey")
    df = protect_column(li, "l_extendedprice", "key_price")
    df = protect_column(df, "l_orderkey", "key_ok")
    df = protect_column(df, "l_returnflag", "key_flag")
    df = unprotect_column(df, "l_extendedprice", T.DoubleType(), "key_price")
    df = unprotect_column(df, "l_orderkey", T.LongType(), "key_ok")
    df = unprotect_column(df, "l_returnflag", T.StringType(), "key_flag")
    return df.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dec_str(F.sum(F.col("l_extendedprice").cast(DEC))).alias("sum_price"),
        F.sum("l_orderkey").cast("bigint").alias("sum_orderkey"),
        F.min("l_returnflag").alias("min_flag"),
    )


@register(
    "protect_roundtrip_customer",
    oracle="""
        SELECT
            c_mktsegment,
            count(*) AS n,
            CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_acctbal,
            min(c_name) AS min_name,
            max(c_name) AS max_name
        FROM customer
        GROUP BY c_mktsegment
    """,
    description="protect+unprotect PII-like customer columns (string + double)",
)
def protect_roundtrip_customer(spark, sf_dir):
    prep(spark)
    c = load_spread(
        spark, sf_dir, "customer", min_bytes=SPREAD_MIN_BYTES_LIGHT
    )
    df = protect_column(c, "c_name", "key_name")
    df = protect_column(df, "c_acctbal", "key_bal")
    df = unprotect_column(df, "c_name", T.StringType(), "key_name")
    df = unprotect_column(df, "c_acctbal", T.DoubleType(), "key_bal")
    from .relational import dec_str

    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dec_str(F.sum(F.col("c_acctbal").cast(DEC))).alias("sum_acctbal"),
        F.min("c_name").alias("min_name"),
        F.max("c_name").alias("max_name"),
    )


@register(
    "protect_roundtrip_events_aes",
    oracle="""
        SELECT
            event_type,
            count(*) AS n,
            CAST(sum(user_id) AS BIGINT) AS sum_user,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
        FROM events
        GROUP BY event_type
    """,
    description="round-trip with the AES-SIV (real crypto) encryptor",
)
def protect_roundtrip_events_aes(spark, sf_dir):
    prep(spark)
    # ts is not referenced, so the events table loads directly (no
    # timestamp-encoding dispatch needed). Since the r6 BatchSIV kernel,
    # AES-SIV is no longer heavy per-row work (100k int64s encrypt in
    # ~22 ms single-core), so the spread guard treats it as LIGHT: at
    # sf0.1 the 32-way repartition's fixed cost LOSES to one partition
    # (measured r7: 0.62 s vs 0.96 s min), while at real scale the
    # table arrives pre-partitioned and the guard is a no-op.
    e = load_spread(
        spark, sf_dir, "events", min_bytes=SPREAD_MIN_BYTES_LIGHT
    ).select("event_type", "user_id", "value")
    df = protect_column(e, "user_id", "key_uid", encryptor="aes_siv")
    df = protect_column(df, "value", "key_val", encryptor="aes_siv")
    df = unprotect_column(df, "user_id", T.LongType(), "key_uid", encryptor="aes_siv")
    df = unprotect_column(df, "value", T.DoubleType(), "key_val", encryptor="aes_siv")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").cast("bigint").alias("sum_user"),
        dec_str(F.sum(F.col("value").cast(DEC))).alias("sum_value"),
    )


@register(
    "protect_ciphertext_shape",
    oracle="""
        SELECT
            c_mktsegment,
            count(*) AS n,
            CAST(sum(octet_length(encode(c_name)) + 1) AS BIGINT) AS ct_name_bytes,
            CAST(sum(9) AS BIGINT) AS ct_bal_bytes
        FROM customer
        GROUP BY c_mktsegment
    """,
    description="ciphertext sizes are exactly predictable: [tag] + keystream(len-preserving)",
)
def protect_ciphertext_shape(spark, sf_dir):
    prep(spark)
    c = load_spread(
        spark, sf_dir, "customer", min_bytes=SPREAD_MIN_BYTES_LIGHT
    )
    df = protect_column(c, "c_name", "key_name")
    df = protect_column(df, "c_acctbal", "key_bal")
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("c_name")).cast("bigint").alias("ct_name_bytes"),
        F.sum(F.length("c_acctbal")).cast("bigint").alias("ct_bal_bytes"),
    )


@register(
    "protect_roundtrip_decimal",
    oracle="""
        SELECT
            l_returnflag,
            count(*) AS n,
            CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_dec,
            CAST(CAST(min(CAST(l_extendedprice AS DECIMAL(12,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS min_dec,
            CAST(CAST(max(CAST(l_extendedprice AS DECIMAL(12,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS max_dec
        FROM lineitem
        GROUP BY l_returnflag
    """,
    description="protect+unprotect a DECIMAL column (FIXED_LEN_BYTE_ARRAY "
    "backing, 16-byte decimal128 cells)",
)
def protect_roundtrip_decimal(spark, sf_dir):
    prep(spark)
    li = load_spread(
        spark, sf_dir, "lineitem", min_bytes=SPREAD_MIN_BYTES_LIGHT
    ).select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price_dec"),
    )
    dec_type = T.DecimalType(12, 2)
    df = protect_column(li, "price_dec", "key_dec")
    df = unprotect_column(df, "price_dec", dec_type, "key_dec")
    from .relational import dec_str

    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        # the per-value column is decimal(12,2); the SUM must widen (it
        # overflows (12,2) from sf0.1 up) — string-emit at scale 2, the
        # registry's canonical decimal output form
        dec_str(F.sum("price_dec").cast("decimal(38,2)")).alias("sum_dec"),
        dec_str(F.min("price_dec")).alias("min_dec"),
        dec_str(F.max("price_dec")).alias("max_dec"),
    )


@register(
    "rotate_key_roundtrip_customer",
    oracle="""
        SELECT
            c_mktsegment,
            count(*) AS n,
            CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                 AS DECIMAL(38,2)) AS VARCHAR) AS sum_acctbal,
            min(c_name) AS min_name,
            CAST(count(DISTINCT c_name) AS BIGINT) AS n_names
        FROM customer
        GROUP BY c_mktsegment
    """,
    description="protect -> rotate key (keystream->aes_siv) -> verify "
    "100% integrity -> unprotect with the NEW key; aggregate must equal "
    "raw (round-trip identity through the full rotation lifecycle)",
)
def rotate_key_roundtrip_customer(spark, sf_dir):
    """The rotation lifecycle as a judged query: data protected under v1
    keystream keys is rotated to v2 AES-SIV keys in one pass
    (plaintext never in the plan), the integrity scan must pass 100%
    under the new keys, and unprotecting with the new keys restores the
    original values exactly."""
    from ..functions.protect import rotate_key_column, verify_column

    prep(spark)
    # the rotation lifecycle is AES-heavy per value but the customer scan
    # is tiny at bench scale: measured 0.75 s plain vs 0.96 s spread
    c = load_spread(
        spark, sf_dir, "customer", min_bytes=SPREAD_MIN_BYTES_LIGHT
    )
    df = protect_column(c, "c_name", "key_name_v1")
    df = protect_column(df, "c_acctbal", "key_bal_v1")
    df = rotate_key_column(
        df, "c_name", T.StringType(), "key_name_v1", "key_name_v2",
        new_encryptor="aes_siv",
    )
    df = rotate_key_column(
        df, "c_acctbal", T.DoubleType(), "key_bal_v1", "key_bal_v2",
        new_encryptor="aes_siv",
    )
    df = verify_column(
        df, "c_name", T.StringType(), "key_name_v2", "aes_siv"
    )
    df = df.filter(F.col("c_name__ok"))  # drops nothing on intact data
    df = unprotect_column(
        df, "c_name", T.StringType(), "key_name_v2", encryptor="aes_siv"
    )
    df = unprotect_column(
        df, "c_acctbal", T.DoubleType(), "key_bal_v2", encryptor="aes_siv"
    )
    from .relational import dec_str

    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dec_str(F.sum(F.col("c_acctbal").cast(DEC))).alias("sum_acctbal"),
        F.min("c_name").alias("min_name"),
        F.countDistinct("c_name").cast("bigint").alias("n_names"),
    )


@register(
    "int96_page_roundtrip",
    # the INT96 cells are built from (o_orderdate, o_orderkey) and fed
    # through the REAL page-level encrypt->decrypt sequencer; the decoded
    # values (not the inputs) feed this aggregate, so any corruption in
    # the 12-byte codec or the cipher breaks the hash match. n_ok counts
    # per-value byte-exact roundtrips and must equal n.
    oracle="""
        SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS INT) AS yr,
               count(*) AS n,
               count(*) AS n_ok,
               min(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d'))
                   AS min_date,
               max(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d'))
                   AS max_date,
               CAST(sum(o_orderkey % 86400) AS BIGINT) AS sum_sec
        FROM orders
        GROUP BY 1
    """,
    description="INT96 (legacy 12-byte timestamp) page-level "
    "encrypt/decrypt roundtrip, distributed one page per Arrow batch",
)
def int96_page_roundtrip(spark, sf_dir):
    """End-to-end INT96 coverage: Spark cannot WRITE INT96 (SURVEY §7
    limitation), so the page is staged in-flight — each Arrow batch
    becomes one DATA_PAGE_V1 of 12-byte INT96 cells (nanos-of-day int64
    LE + Julian day uint32 LE, the parquet legacy layout;
    ``parquet_types.h`` INT96, SURVEY §2.1 #15), runs the full AES-SIV
    page sequencer, and is decoded back; the emitted rows are the
    DECODED values. Scale shape: map-only until the final aggregate."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..core.pagecodec import PageAttributes, PageProtector
    from ..core.types import PhysicalType
    from ..plans.registry import load

    prep(spark)
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("d")
    )
    out_schema = T.StructType(
        [
            T.StructField("yr", T.IntegerType()),
            T.StructField("date_str", T.StringType()),
            T.StructField("sec", T.LongType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )
    JULIAN_UNIX_EPOCH = 2_440_588

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        protector = PageProtector(
            "o_ordertime96",
            "key_96",
            PhysicalType.INT96,
            encryptor_name="aes_siv",
        )
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            days = (
                pd.to_datetime(pdf["d"]).to_numpy().astype("datetime64[D]")
            ).astype(np.int64)
            keys = pdf["o_orderkey"].to_numpy(np.int64)
            nanos = (keys % 86_400) * 1_000_000_000
            julian = (days + JULIAN_UNIX_EPOCH).astype("<u4")
            cells = np.empty((n, 12), dtype=np.uint8)
            cells[:, :8] = nanos.astype("<i8").view(np.uint8).reshape(n, 8)
            cells[:, 8:] = julian.view(np.uint8).reshape(n, 4)
            page = cells.tobytes()
            attrs = PageAttributes.from_string_map(
                {
                    "page_type": "DATA_PAGE_V1",
                    "data_page_num_values": str(n),
                    "data_page_max_definition_level": "0",
                    "data_page_max_repetition_level": "0",
                    "page_v1_definition_level_encoding": "RLE",
                    "page_v1_repetition_level_encoding": "RLE",
                }
            )
            ct, meta = protector.encrypt(page, attrs)
            rt = protector.decrypt(ct, attrs, meta)
            dec = np.frombuffer(rt, dtype=np.uint8).reshape(n, 12)
            dec_nanos = dec[:, :8].copy().view("<i8").ravel()
            dec_julian = dec[:, 8:].copy().view("<u4").ravel().astype(np.int64)
            dec_days = dec_julian - JULIAN_UNIX_EPOCH
            dec_dates = dec_days.astype("datetime64[D]")
            ok = (dec_nanos == nanos) & (dec_days == days)
            yield pd.DataFrame(
                {
                    "yr": dec_dates.astype("datetime64[Y]").astype(np.int64)
                    + 1970,
                    "date_str": np.datetime_as_string(dec_dates, unit="D"),
                    "sec": dec_nanos // 1_000_000_000,
                    "ok": ok,
                }
            )

    rows = src.mapInPandas(_roundtrip, out_schema)
    return rows.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ok").cast("long")).cast("bigint").alias("n_ok"),
        F.min("date_str").alias("min_date"),
        F.max("date_str").alias("max_date"),
        F.sum("sec").cast("bigint").alias("sum_sec"),
    )


# ---------------------------------------------------------------------------
# REAL parquet pages through the reference sequencer — staged r10
# ---------------------------------------------------------------------------

#: tables whose real files feed the page-protection audit (strings +
#: ints + doubles cover every per-value reinterpret width in the data)
REAL_PAGE_TABLES = ("customer", "documents")

#: per-table oracle: the protected data-page value total, divided by
#: the leaf count, must equal the table's row count — the one footer
#: fact the DATA can restate.  Mode decisions and byte-identity are
#: executor-asserted (the oracle cannot run the cipher, same contract
#: as the protect_roundtrip family above).
PROTECT_REAL_PAGES_ORACLE = "\n        UNION ALL ".join(
    f"SELECT '{t}' AS tbl, CAST(count(*) AS BIGINT) AS num_rows FROM {t}"
    for t in REAL_PAGE_TABLES
) + "\n        ORDER BY tbl"

_REAL_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("tbl", T.StringType()),
        T.StructField("num_rows", T.LongType()),
    ]
)


@register("protect_parquet_pages_real", oracle=PROTECT_REAL_PAGES_ORACLE)
def protect_parquet_pages_real(spark, sf_dir):
    """The reference's exact job on GENUINE parquet bytes, distributed.

    The reference service receives parquet page payloads and protects
    them (``encryption_sequencer.cpp``); until now the page fixtures
    were built from testdata columns by our own page builders.  This
    query closes the remaining gap: it walks REAL Spark-ecosystem
    parquet files (the testdata tables as written to disk), slices
    every page payload out of every column chunk via the from-scratch
    footer/page-header walk (``core/parquetmeta.py``), and drives each
    one through the REAL sequencer:

    * PLAIN-encoded pages over supported codecs (every dictionary page
      in the fixture files) MUST take the per-value path — asserted,
      not just observed;
    * RLE_DICTIONARY data pages are the documented per-value
      unsupported combination and MUST fall back to per-block —
      asserted;
    * every page must decrypt back to its exact original bytes.

    Output is the per-table row count recovered from the protected
    data pages' value totals (sum over all leaf columns / leaf count),
    which the oracle restates as ``count(*)`` — so a page walk that
    missed, double-counted, or mis-sliced a single page breaks the
    gate.

    100 TB: the unit of work is the column chunk (ranged read +
    page-local crypto), embarrassingly parallel across files/row
    groups — exactly how the reference's callers batch pages today.
    """
    from collections.abc import Iterator as _Iter

    import pandas as pd

    from ..core.pagecodec import (
        MODE_KEY_DATA_PAGE,
        MODE_KEY_DICT_PAGE,
        MODE_PER_BLOCK,
        MODE_PER_VALUE,
        PAGE_DICT,
        PAGE_V1,
        PAGE_V2,
        PageAttributes,
        PageProtector,
    )
    from ..core.parquetmeta import (
        PAGE_DATA,
        PAGE_DATA_V2,
        PAGE_DICTIONARY,
        parse_footer,
        walk_pages,
    )
    from ..core.types import CompressionCodec, Encoding, PhysicalType
    from ..plans.registry import table_path

    prep(spark)
    paths = [table_path(sf_dir, t) for t in REAL_PAGE_TABLES]
    files = spark.read.format("binaryFile").load(paths).select(
        "path", "content"
    )
    _LEVEL_ENC = {3: "RLE", 4: "BIT_PACKED"}

    def _protect(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        for pdf in batches:
            tbls, rows = [], []
            for path, blob in zip(pdf["path"], pdf["content"]):
                tbl = path.rsplit("/", 1)[-1].removesuffix(".parquet")
                data = bytes(blob)
                meta = parse_footer(data)
                root, leaves = meta["schema"][0], meta["schema"][1:]
                if root["num_children"] != len(leaves) or any(
                    s["num_children"] for s in leaves
                ):
                    raise ValueError(f"{tbl}: not a flat schema")
                max_def = [
                    1 if s["repetition"] == "OPTIONAL" else 0
                    for s in leaves
                ]
                data_values = 0
                for rg in meta["row_groups"]:
                    for ci, col in enumerate(rg["columns"]):
                        codec = CompressionCodec[col["codec"]]
                        dtype = PhysicalType[col["type"]]
                        tlen = leaves[ci]["type_length"]
                        for p in walk_pages(data, col):
                            payload = data[
                                p["data_offset"] : p["data_offset"]
                                + p["compressed_page_size"]
                            ]
                            if p["type"] == PAGE_DICTIONARY:
                                attrs = PageAttributes(
                                    page_type=PAGE_DICT,
                                    dict_num_values=p["num_values"],
                                )
                                mode_key = MODE_KEY_DICT_PAGE
                            elif p["type"] == PAGE_DATA:
                                attrs = PageAttributes(
                                    page_type=PAGE_V1,
                                    num_values=p["num_values"],
                                    max_definition_level=max_def[ci],
                                    max_repetition_level=0,
                                    definition_level_encoding=_LEVEL_ENC[
                                        p["definition_level_encoding"]
                                    ],
                                    repetition_level_encoding=_LEVEL_ENC[
                                        p["repetition_level_encoding"]
                                    ],
                                )
                                mode_key = MODE_KEY_DATA_PAGE
                                data_values += p["num_values"]
                            elif p["type"] == PAGE_DATA_V2:
                                attrs = PageAttributes(
                                    page_type=PAGE_V2,
                                    num_values=p["num_values"],
                                    max_definition_level=max_def[ci],
                                    max_repetition_level=0,
                                    num_nulls=p["num_nulls"],
                                    definition_levels_byte_length=p[
                                        "definition_levels_byte_length"
                                    ],
                                    repetition_levels_byte_length=p[
                                        "repetition_levels_byte_length"
                                    ],
                                    is_compressed=p["is_compressed"],
                                )
                                mode_key = MODE_KEY_DATA_PAGE
                                data_values += p["num_values"]
                            else:
                                continue  # index pages carry no values
                            prot = PageProtector(
                                column_name=col["path_in_schema"],
                                key_id=f"audit-{tbl}",
                                datatype=dtype,
                                datatype_length=tlen,
                                compression=codec,
                                encoding=Encoding(p["encoding"]),
                            )
                            ct, emeta = prot.encrypt(payload, attrs)
                            # mode EXPECTATION, not just observation
                            per_value_ok = (
                                Encoding(p["encoding"]) == Encoding.PLAIN
                                and codec
                                in (
                                    CompressionCodec.UNCOMPRESSED,
                                    CompressionCodec.SNAPPY,
                                    CompressionCodec.GZIP,
                                )
                                and dtype != PhysicalType.BOOLEAN
                            )
                            want_mode = (
                                MODE_PER_VALUE
                                if per_value_ok
                                else MODE_PER_BLOCK
                            )
                            if emeta[mode_key] != want_mode:
                                raise ValueError(
                                    f"{tbl}/{col['path_in_schema']}: "
                                    f"mode {emeta[mode_key]}, expected "
                                    f"{want_mode}"
                                )
                            if prot.decrypt(ct, attrs, emeta) != payload:
                                raise ValueError(
                                    f"{tbl}/{col['path_in_schema']}: "
                                    "page roundtrip lost bytes"
                                )
                if data_values % len(leaves):
                    raise ValueError(
                        f"{tbl}: data-page values {data_values} not "
                        f"divisible by {len(leaves)} leaves"
                    )
                tbls.append(tbl)
                rows.append(data_values // len(leaves))
            yield pd.DataFrame(
                {
                    "tbl": pd.Series(tbls, dtype="object"),
                    "num_rows": pd.Series(rows, dtype="int64"),
                }
            )

    return files.mapInPandas(_protect, _REAL_PAGE_SCHEMA).orderBy("tbl")
