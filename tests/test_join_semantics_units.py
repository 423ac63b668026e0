"""As-of and range join boundary semantics vs hand-computed expectations.

The two custom join compositions have easy-to-miss boundary rules:
as-of matches clicks at-or-BEFORE the purchase (ties match, latest
wins, same-timestamp click dups collapse to max value), while the
range join's window is [p.ts - 1h, p.ts) — inclusive at the far edge,
exclusive at the purchase instant, and it does NOT deduplicate. A
crafted corpus pins each rule with values verified by hand.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.relational import (
    asof_join_last_event,
    range_join_click_attribution,
)

BASE = 1_699_920_000  # 2023-11-14 00:00:00 UTC exactly (midnight-aligned)

# (user_id, offset_s, event_type, value)
EVENTS = [
    (1, 0, "click", 1.0),
    (1, 100, "click", 2.5),      # tie with u1's purchase below
    (1, 100, "purchase", 99.0),
    (1, 2000, "click", 3.0),
    (1, 5000, "purchase", 99.0),
    (2, 50, "purchase", 99.0),   # no clicks at all for u2
    (3, 0, "click", 5.0),        # same-(user,ts) click dup ...
    (3, 0, "click", 7.25),       # ... asof dedups to max value
    (3, 3600, "purchase", 99.0),
    (4, 3600, "click", 4.0),
    (4, 7200, "purchase", 99.0),  # click sits exactly 1h before
]


@pytest.fixture(scope="module")
def joins_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("joins_corpus")
    table = pa.table(
        {
            "event_id": pa.array(range(len(EVENTS)), pa.int64()),
            "ts": pa.array(
                [(BASE + off) * 1_000_000 for _, off, _, _ in EVENTS],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _, _, _ in EVENTS], pa.int64()),
            "event_type": pa.array([t for _, _, t, _ in EVENTS]),
            "value": pa.array([v for _, _, _, v in EVENTS]),
            "props": pa.array(["{}"] * len(EVENTS)),
        }
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_asof_join_boundary_semantics(spark, joins_dir):
    rows = asof_join_last_event(spark, joins_dir).collect()
    assert len(rows) == 1  # all events land on 2023-11-14
    r = rows[0]
    assert r.day == "2023-11-14"
    # matches, verified by hand:
    #   u1@100  <- click@100 (tie matches; latest wins over click@0)
    #   u1@5000 <- click@2000 (most recent of 0/100/2000)
    #   u2@50   <- none (left join keeps the purchase)
    #   u3@3600 <- click@0 with the DUP COLLAPSED to max(5.0, 7.25)
    #   u4@7200 <- click@3600
    assert r.n_purchases == 5
    assert r.n_matched == 4
    expect_epoch = (4 * BASE + 100 + 2000 + 0 + 3600) * 1_000_000
    assert r.sum_matched_epoch == expect_epoch
    assert r.sum_click_value == "16.75"  # 2.5 + 3.0 + 7.25 + 4.0


def test_range_join_boundary_semantics(spark, joins_dir):
    rows = range_join_click_attribution(spark, joins_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.day == "2023-11-14"
    # pairs, verified by hand:
    #   u1@100  <- click@0 only (click@100 excluded: c.ts < p.ts strict)
    #   u1@5000 <- click@2000 only (0 and 100 fell out of the 1h window)
    #   u3@3600 <- BOTH click@0 rows (range join does not dedup)
    #   u4@7200 <- click@3600 (exactly 1h before: >= boundary inclusive)
    assert r.n_pairs == 5
    assert r.n_users == 3  # u2 has no pairs
    assert r.sum_click_value == "20.25"  # 1.0 + 3.0 + 5.0 + 7.25 + 4.0
