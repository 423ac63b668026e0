#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, sorted column
names, and an order-insensitive multiset of normalized values. Run before
any commit that touches the query surface:

    python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(round(v, 9)))
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, bytes):
        return ("b", v.hex())
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    return v


def multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(normalize(row[i]) for i in order) for row in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from databatchprotectionservice_spark.plans import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark(app_name="check-oracle")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"  {name:40s} SPARK ERROR: {str(e).splitlines()[0][:120]}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"  {name:40s} rows={len(spark_rows):6d} (no oracle) [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        res = con.execute(sql)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        t_duck = time.time() - t0
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} != {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"columns {sorted(spark_cols)} != {sorted(duck_cols)}")
        if not problems:
            ms, md = multiset(spark_rows, spark_cols), multiset(duck_rows, duck_cols)
            if ms != md:
                diff = (ms - md) + (md - ms)
                sample = list((ms - md).items())[:2] + list((md - ms).items())[:2]
                problems.append(
                    f"value mismatch on {sum(diff.values())} rows; sample {sample}"
                )
        status = "OK " if not problems else "FAIL"
        print(
            f"  {name:40s} rows={len(spark_rows):6d} {status} "
            f"[spark {t_spark:.1f}s duck {t_duck:.1f}s]"
        )
        for p in problems:
            print(f"      !! {p}")
        if problems:
            failures.append(name)
    print()
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("all queries hash-match the oracle")


if __name__ == "__main__":
    main()
