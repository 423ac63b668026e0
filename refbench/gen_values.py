#!/usr/bin/env python
"""Regenerate values/*.txt for performance_test from the sf0.1 testdata —
the same 10k-value batches scripts/bench_pages.py uses, so reference-C++
and Python page-protect numbers are measured on identical inputs."""
import os

import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = 10_000
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "values")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    li = pq.read_table(
        os.path.join(SF_DIR, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["text"]
    )
    texts = docs.column("text").to_pylist()
    strings = (texts * (ROWS // max(len(texts), 1) + 1))[:ROWS]

    def write(name: str, vals: list) -> None:
        with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
            for v in vals:
                f.write(f"{v}\n")

    write("int64", li.column("l_orderkey").to_pylist()[:ROWS])
    write("int32", li.column("l_linenumber").to_pylist()[:ROWS])
    write(
        "float",
        [float(v) for v in li.column("l_extendedprice").to_pylist()[:ROWS]],
    )
    write("bytearray", strings)
    print(f"wrote 4 files to {OUT}")


if __name__ == "__main__":
    main()
