"""pagerank_top_nodes vs a pure-Python twin on a crafted graph.

The oracle CTEs are generated from the same constants as the Spark
code, so a shared misunderstanding would pass the gate; this twin
reimplements the integer iteration independently (dict arithmetic,
no SQL, no Spark) on a graph small enough to reason about: two
customers, two suppliers, asymmetric degrees."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.graph import (
    PR_ITERATIONS,
    _R0,
    _TELEPORT,
    pagerank_top_nodes,
)

# customer 10 buys from suppliers 1 and 2; customer 20 only from 1 —
# supplier 1 must out-rank supplier 2, customer 10 out-rank customer 20
PAIRS = [(10, 1), (10, 2), (20, 1)]


@pytest.fixture(scope="module")
def graph_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("graph_tables"))
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([10, 10, 20], pa.int64()),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3, 3], pa.int64()),
            # order 3 repeats supplier 1 -> the DISTINCT pair dedup matters
            "l_suppkey": pa.array([1, 2, 1, 1], pa.int64()),
        }
    )
    pq.write_table(orders, os.path.join(d, "orders.parquet"))
    pq.write_table(lineitem, os.path.join(d, "lineitem.parquet"))
    return d


def _twin():
    edges = []
    for c, s in PAIRS:
        edges.append((2 * c, 2 * s + 1))
        edges.append((2 * s + 1, 2 * c))
    nodes = {v for e in edges for v in e}
    deg = {}
    for src, _ in edges:
        deg[src] = deg.get(src, 0) + 1
    r = {v: _R0 for v in nodes}
    for _ in range(PR_ITERATIONS):
        s = {v: 0 for v in nodes}
        for src, dst in edges:
            s[dst] += r[src] // deg[src]
        r = {v: _TELEPORT + (85 * s[v]) // 100 for v in nodes}
    rows = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))
    return [
        ("customer" if v % 2 == 0 else "supplier", v // 2, rank)
        for v, rank in rows
    ]


def test_pagerank_matches_integer_twin(spark, graph_dir):
    got = [
        (row["node_type"], row["node_key"], row["rank_e6"])
        for row in pagerank_top_nodes(spark, graph_dir).collect()
    ]
    assert got == _twin()
    # structural sanity: higher-degree nodes rank higher
    ranks = {(t, k): r for t, k, r in got}
    assert ranks[("supplier", 1)] > ranks[("supplier", 2)]
    assert ranks[("customer", 10)] > ranks[("customer", 20)]
