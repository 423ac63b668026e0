"""triangle_suppliers vs a pure-Python twin AND its staged oracle on
a crafted co-purchase graph.

The graph is small enough to enumerate by hand: customers 10/20 buy
from suppliers {1,2,3}, customers 30/40 from {2,3,4} — so the
co-purchase edges (>=2 shared customers) are exactly
(1,2),(1,3),(2,3),(2,4),(3,4), giving triangles (1,2,3) and (2,3,4)
and corner counts 2:2, 3:2, 1:1, 4:1.  Customer 50's lone {4,5}
overlap stays below the threshold and supplier 6 never co-occurs.
The DuckDB run of TRIANGLE_ORACLE on the same parquet doubles as the
r10 registration rehearsal (id-ordered closure vs the Spark side's
degree-ordered orientation)."""

import itertools
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.graph import (
    TRI_EDGE_CAP,
    TRI_MIN_SHARED,
    TRIANGLE_ORACLE,
    triangle_suppliers,
)

BUYS = {
    10: [1, 2, 3],
    20: [1, 2, 3],
    30: [2, 3, 4],
    40: [2, 3, 4],
    50: [4, 5],
    60: [6],
}


@pytest.fixture(scope="module")
def tri_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tri_tables"))
    o_keys, o_cust, l_okey, l_supp = [], [], [], []
    k = 0
    for c, supps in BUYS.items():
        k += 1
        o_keys.append(k)
        o_cust.append(c)
        for s in supps:
            l_okey.append(k)
            l_supp.append(s)
        # duplicate one lineitem per order: the DISTINCT pair dedup
        # must absorb repeat purchases
        l_okey.append(k)
        l_supp.append(supps[0])
    pq.write_table(
        pa.table({"o_orderkey": pa.array(o_keys, pa.int64()),
                  "o_custkey": pa.array(o_cust, pa.int64())}),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table({"l_orderkey": pa.array(l_okey, pa.int64()),
                  "l_suppkey": pa.array(l_supp, pa.int64())}),
        os.path.join(d, "lineitem.parquet"),
    )
    return d


def _twin():
    """Independent enumeration: sets + itertools, no SQL, no Spark."""
    shared = {}
    for c, supps in BUYS.items():
        for a, b in itertools.combinations(sorted(set(supps)), 2):
            shared[(a, b)] = shared.get((a, b), 0) + 1
    # mirror the strongest-E cap rule (a no-op on this 5-edge graph,
    # kept for rule parity with the Spark side and the oracle)
    kept = sorted(
        ((e, n) for e, n in shared.items() if n >= TRI_MIN_SHARED),
        key=lambda kv: (-kv[1], kv[0]),
    )[:TRI_EDGE_CAP]
    co = {e for e, _ in kept}
    nodes = sorted({v for e in co for v in e})
    tris = [
        t for t in itertools.combinations(nodes, 3)
        if {(t[0], t[1]), (t[0], t[2]), (t[1], t[2])} <= co
    ]
    counts = {}
    for t in tris:
        for v in t:
            counts[v] = counts.get(v, 0) + 1
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def test_twin_matches_hand_enumeration():
    assert _twin() == [(2, 2), (3, 2), (1, 1), (4, 1)]


def test_triangles_match_twin_and_oracle(spark, tri_dir):
    got = [
        (row["s_key"], row["n_triangles"])
        for row in triangle_suppliers(spark, tri_dir).collect()
    ]
    assert got == _twin()

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tri_dir}/{t}.parquet')"
        )
    oracle = con.execute(TRIANGLE_ORACLE).fetchall()
    assert [(int(a), int(b)) for a, b in oracle] == got


def test_edge_cap_binds(spark, tri_dir):
    """With the cap lowered to 3, only the strongest edges survive:
    (2,3) shared=4, then (1,2),(1,3) shared=2 by (a,b) tiebreak —
    leaving exactly triangle (1,2,3), one corner each."""
    import databatchprotectionservice_spark.operators.graph as g

    old = g.TRI_EDGE_CAP
    g.TRI_EDGE_CAP = 3
    try:
        got = [
            (row["s_key"], row["n_triangles"])
            for row in triangle_suppliers(spark, tri_dir).collect()
        ]
    finally:
        g.TRI_EDGE_CAP = old
    assert got == [(1, 1), (2, 1), (3, 1)]


def test_hot_customer_guard(spark, tmp_path):
    """A customer over TRI_MAX_CUST_DEGREE must refuse, not expand."""
    import databatchprotectionservice_spark.operators.graph as g

    d = str(tmp_path)
    n = 60
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1], pa.int64()),
                  "o_custkey": pa.array([10], pa.int64())}),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table({"l_orderkey": pa.array([1] * n, pa.int64()),
                  "l_suppkey": pa.array(list(range(n)), pa.int64())}),
        os.path.join(d, "lineitem.parquet"),
    )
    old = g.TRI_MAX_CUST_DEGREE
    g.TRI_MAX_CUST_DEGREE = 50
    try:
        with pytest.raises(ValueError, match="frequency-prune"):
            triangle_suppliers(spark, d)
    finally:
        g.TRI_MAX_CUST_DEGREE = old
