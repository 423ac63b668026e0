#!/usr/bin/env python
"""Page-protection throughput microbench.

The Spark-free analogue of the reference's ``performance_test``
(``src/scripts/performance_test.cpp:256-511``): drive one
``PageProtector`` through the same scenario matrix — (1) V1/UNCOMPRESSED/
PLAIN, (2) dict/SNAPPY, (3) dict/UNCOMPRESSED, (4) V1/SNAPPY, (5)
V2/SNAPPY, (6) V1/UNCOMPRESSED/RLE_DICTIONARY (per-block fallback) — per
datatype on value batches drawn from the real testdata tables, reporting
avg/min/max wall-clock per encrypt(+decrypt) iteration and MB/s.

Usage: python scripts/bench_pages.py [--iterations 20] [--warmup 3]
       [--rows 10000] [--encryptor keystream_xor|aes_siv] [--skip-decrypt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import pyarrow.parquet as pq  # noqa: E402

from databatchprotectionservice_spark.core.pagecodec import (  # noqa: E402
    PageAttributes,
    PageProtector,
)
from databatchprotectionservice_spark.core.types import (  # noqa: E402
    CompressionCodec,
    Encoding,
    PhysicalType,
)
from pagebuilders import build_dict_page, build_v1_page, build_v2_page  # noqa: E402

SCENARIOS = {
    1: ("v1_uncompressed_plain", "v1", CompressionCodec.UNCOMPRESSED, Encoding.PLAIN),
    2: ("dict_snappy_plain", "dict", CompressionCodec.SNAPPY, Encoding.PLAIN),
    3: ("dict_uncompressed_plain", "dict", CompressionCodec.UNCOMPRESSED, Encoding.PLAIN),
    4: ("v1_snappy_plain", "v1", CompressionCodec.SNAPPY, Encoding.PLAIN),
    5: ("v2_snappy_plain", "v2", CompressionCodec.SNAPPY, Encoding.PLAIN),
    6: ("v1_fallback_rle_dict", "v1", CompressionCodec.UNCOMPRESSED, Encoding.RLE_DICTIONARY),
}


def load_values(sf_dir: str, rows: int) -> dict[PhysicalType, list]:
    li = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    texts = docs.column("text").to_pylist()
    strings = (texts * (rows // max(len(texts), 1) + 1))[:rows]
    return {
        PhysicalType.INT64: li.column("l_orderkey").to_pylist()[:rows],
        PhysicalType.INT32: li.column("l_linenumber").to_pylist()[:rows],
        PhysicalType.DOUBLE: li.column("l_extendedprice").to_pylist()[:rows],
        PhysicalType.FLOAT: [float(v) for v in li.column("l_extendedprice").to_pylist()[:rows]],
        PhysicalType.BYTE_ARRAY: strings,
    }


def build_page(kind, values, datatype, codec):
    if kind == "v1":
        return build_v1_page(values, datatype, codec)
    if kind == "v2":
        return build_v2_page(values, datatype, codec)
    return build_dict_page(values, datatype, codec)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--rows", type=int, default=10_000)
    ap.add_argument("--encryptor", default="keystream_xor")
    ap.add_argument("--skip-decrypt", action="store_true")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    all_values = load_values(args.sf_dir, args.rows)
    results = []
    for num, (name, kind, codec, encoding) in SCENARIOS.items():
        for datatype, values in all_values.items():
            page, attrs = build_page(kind, values, datatype, codec)
            pa_attrs = PageAttributes.from_string_map(attrs)
            protector = PageProtector(
                column_name="bench",
                key_id="bench_key",
                datatype=datatype,
                compression=codec,
                encoding=encoding,
                encryptor_name=args.encryptor,
            )
            timings = []
            for i in range(args.warmup + args.iterations):
                t0 = time.perf_counter()
                ct, meta = protector.encrypt(page, pa_attrs)
                if not args.skip_decrypt:
                    back = protector.decrypt(ct, pa_attrs, meta)
                    assert back == page, f"round-trip mismatch {name}/{datatype.name}"
                dt = time.perf_counter() - t0
                if i >= args.warmup:
                    timings.append(dt)
            avg = sum(timings) / len(timings)
            results.append(
                {
                    "scenario": name,
                    "datatype": datatype.name,
                    "mode": meta.get("encrypt_mode_data_page")
                    or meta.get("encrypt_mode_dict_page"),
                    "rows": len(values),
                    "page_bytes": len(page),
                    "avg_ms": round(avg * 1e3, 3),
                    "min_ms": round(min(timings) * 1e3, 3),
                    "max_ms": round(max(timings) * 1e3, 3),
                    "mb_per_s": round(len(page) / avg / 1e6, 1),
                    "rows_per_s": round(len(values) / avg),
                }
            )
    print(
        json.dumps(
            {
                "metric": "page_protection_throughput",
                "encryptor": args.encryptor,
                "decrypt_included": not args.skip_decrypt,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
