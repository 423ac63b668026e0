#!/usr/bin/env python
"""Capture raw Spark + DuckDB results for every registry query in several
fetch modes, so candidate driver-hashers can be evaluated offline against
the observed CORRECTNESS_r01.json green/red split.

    python scripts/probe_hasher.py [sf_dir] [out_pickle]
"""

from __future__ import annotations

import os
import pickle
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".probe", "capture.pkl")
    os.makedirs(os.path.dirname(out), exist_ok=True)

    import duckdb

    import __spark_entry__ as entrymod
    from databatchprotectionservice_spark.plans import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(app_name="probe-hasher")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    cap = {}
    for name, fn in qs.items():
        t0 = time.time()
        rec = {}
        try:
            sdf = fn(spark, sf_dir)
            rec["spark_cols"] = list(sdf.columns)
            rec["spark_dtypes"] = sdf.dtypes
            rec["spark_rows"] = [tuple(r) for r in sdf.collect()]
            try:
                rec["spark_pandas"] = sdf.toPandas()
            except Exception as e:  # pragma: no cover
                rec["spark_pandas_err"] = repr(e)
        except Exception as e:
            rec["spark_err"] = repr(e)
            cap[name] = rec
            print(f"{name:40s} SPARK ERROR {e}")
            continue
        sql = oracles.get(name)
        if sql is not None:
            try:
                res = con.execute(sql)
                rec["duck_desc"] = [(d[0], str(d[1])) for d in res.description]
                rec["duck_rows"] = res.fetchall()
                rec["duck_arrow"] = con.execute(sql).arrow()
                rec["duck_df"] = con.execute(sql).df()
            except Exception as e:
                rec["duck_err"] = repr(e)
        cap[name] = rec
        print(f"{name:40s} rows={len(rec.get('spark_rows', []))} [{time.time()-t0:.1f}s]")

    with open(out, "wb") as f:
        pickle.dump(cap, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
