"""Count-min-sketch candidate pruning vs a pure-numpy twin.

The CMS guarantee (estimate >= true count, for every key, on any input)
is checked directly on the sketch arithmetic, and the registered query
runs end-to-end on a crafted corpus with hand-computed heavy hitters.
"""

import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.profiling import (
    _CMS_DEPTH,
    _CMS_MULT,
    _CMS_WIDTH,
    _cms_positions,
)

# users 1 and 2 are heavy (50 / 40 events); eighteen more have 3 each.
# total = 144, n_users = 20 -> threshold = max(6*144 // (5*20), 2) = 8.
COUNTS = {1: 50, 2: 40, **{u: 3 for u in range(3, 21)}}


def _build_cms(keys):
    cms = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
    arr = np.asarray(keys, dtype=np.int64).astype(np.uint64)
    for d, pos in enumerate(_cms_positions(arr, np)):
        np.add.at(cms[d], pos, 1)
    return cms


def _estimate(cms, key):
    arr = np.asarray([key], dtype=np.int64).astype(np.uint64)
    return min(
        int(cms[d][pos[0]]) for d, pos in enumerate(_cms_positions(arr, np))
    )


def test_cms_estimate_never_below_true_count():
    """The one-sided CMS error bound, on an adversarially collided input:
    many distinct keys vs a narrow effective range, including negative
    int64 keys (wrapped to uint64 deterministically)."""
    rng = np.random.RandomState(7)
    keys = np.concatenate(
        [
            rng.randint(-(2**62), 2**62, size=5000),
            np.repeat(np.int64(42), 300),  # one genuinely heavy key
        ]
    )
    cms = _build_cms(keys)
    truth = Counter(int(k) for k in keys)
    assert all(_estimate(cms, k) >= n for k, n in truth.items())
    assert cms.sum() == _CMS_DEPTH * len(keys)  # every row lands D times


def test_cms_positions_deterministic_and_in_range():
    keys = np.array([0, 1, -1, 2**63 - 1, -(2**63)], dtype=np.int64)
    a = _cms_positions(keys.astype(np.uint64), np)
    b = _cms_positions(keys.astype(np.uint64), np)
    assert len(a) == _CMS_DEPTH == len(_CMS_MULT)
    for pa_, pb in zip(a, b):
        assert (pa_ == pb).all()
        assert pa_.min() >= 0 and pa_.max() < _CMS_WIDTH


def test_sketch_merge_is_exact():
    """Partition-wise sketches summed cell-by-cell equal the single-pass
    sketch — the mergeability the distributed build relies on."""
    keys = list(range(200)) * 3
    whole = _build_cms(keys)
    parts = _build_cms(keys[:150]) + _build_cms(keys[150:])
    assert (whole == parts).all()


@pytest.fixture(scope="module")
def cms_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cms_corpus")
    users = [u for u, n in sorted(COUNTS.items()) for _ in range(n)]
    n = len(users)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [1_706_600_000_000_000 + i * 1_000_000 for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_registered_query_matches_hand_computed_heavy_hitters(
    spark, cms_events_dir
):
    from databatchprotectionservice_spark.plans.registry import all_queries

    df = all_queries()["heavyhitters_cms_pruned"](spark, cms_events_dir)
    got = df.toPandas()
    assert list(got["user_id"]) == [1, 2]  # desc by count
    assert list(got["n_events"]) == [50, 40]
    assert got["cms_bound_ok"].all()
