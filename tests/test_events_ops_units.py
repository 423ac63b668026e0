"""Sessionization, incremental rollup, and PII detection vs Python twins.

Crafted events/documents parquet tables with hand-checkable structure:
known session boundaries (including the exact-gap edge), a rollup
spanning a month boundary (so partial-merge != full-scan would show),
and documents with counted PII matches per detector.
"""

import os
import re
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databatchprotectionservice_spark.operators.incremental import (
    incremental_rollup_merge,
)
from databatchprotectionservice_spark.operators.pii import (
    PII_PATTERNS,
    columns_to_protect,
    pii_counts,
)
from databatchprotectionservice_spark.operators.sessionize import (
    SESSION_GAP_S,
    sessionize_events_batch,
)

BASE = 1_706_600_000  # 2024-01-30 07:33:20 UTC — 3 days before a month edge

# (user_id, offset_s, value): user 1 has two sessions split by a
# gap of exactly SESSION_GAP_S + 1 (and an exact-gap pair that must NOT
# split); user 2 spans the Jan->Feb month boundary with one session.
EVENTS = [
    (1, 0, 10.0),
    (1, SESSION_GAP_S, 20.0),          # gap == threshold: same session
    (1, SESSION_GAP_S * 2 + 1, 30.0),  # gap == threshold+1: new session
    (1, SESSION_GAP_S * 2 + 100, 40.0),
    (2, 0, 5.0),
    (2, 3 * 86400, 7.5),               # Feb 2 — crosses the month edge
    (2, 3 * 86400 + 60, -2.25),
]


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_corpus")
    ts_us = [(BASE + off) * 1_000_000 for _, off, _ in EVENTS]
    table = pa.table(
        {
            "event_id": pa.array(range(len(EVENTS)), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array([u for u, _, _ in EVENTS], pa.int64()),
            "event_type": pa.array(["click"] * len(EVENTS)),
            "value": pa.array([v for _, _, v in EVENTS]),
            "props": pa.array(["{}"] * len(EVENTS)),
        }
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_sessionize_batch_matches_python_twin(spark, events_dir):
    got = [
        (r.user_id, r.session_id, r.n_events, r.start_sec, r.end_sec, r.duration_s)
        for r in sessionize_events_batch(spark, events_dir).collect()
    ]
    sessions: dict[int, list[list[int]]] = {}
    for u, off, _ in sorted(EVENTS, key=lambda e: (e[0], e[1])):
        sec = BASE + off
        user = sessions.setdefault(u, [])
        if user and sec - user[-1][-1] <= SESSION_GAP_S:
            user[-1].append(sec)
        else:
            user.append([sec])
    expect = []
    for u in sorted(sessions):
        for sid, s in enumerate(sessions[u], start=1):
            expect.append((u, sid, len(s), s[0], s[-1], s[-1] - s[0]))
    assert got == expect
    # user 1: exact-gap pair stayed together, +1 split a new session
    assert [(sid, n) for u, sid, n, *_ in got if u == 1] == [(1, 2), (2, 2)]


def test_incremental_rollup_matches_direct_aggregation(spark, events_dir):
    import math

    got = [
        (r.user_id, r.month, r.n, r.sum_value, r.min_value, r.max_value)
        for r in incremental_rollup_merge(spark, events_dir).collect()
    ]
    agg: dict[tuple[int, str], list] = {}
    import datetime

    for u, off, v in EVENTS:
        dt = datetime.datetime.fromtimestamp(BASE + off, datetime.timezone.utc)
        key = (u, dt.strftime("%Y-%m"))
        a = agg.setdefault(key, [0, Decimal(0), v, v])
        a[0] += 1
        a[1] += Decimal(str(v)).quantize(Decimal("0.01"))
        a[2] = min(a[2], v)
        a[3] = max(a[3], v)
    expect = []
    for (u, month) in sorted(agg):
        n, s, mn, mx = agg[(u, month)]
        expect.append(
            (
                u,
                month,
                n,
                f"{s:.2f}",
                math.floor(mn * 10000.0 + 0.5) / 10000.0,
                math.floor(mx * 10000.0 + 0.5) / 10000.0,
            )
        )
    assert got == expect
    # the crafted data really crosses a month boundary for user 2
    assert {m for u, m, *_ in got if u == 2} == {"2024-01", "2024-02"}


PII_DOCS = [
    "contact alice@example.com or bob.smith+tag@mail.co for details",
    "call +1 (555) 123-4567 tomorrow",
    "ssn 123-45-6789 leaked from host 10.0.0.1 and 192.168.1.255",
    "clean text with no sensitive tokens at all",
    "order 123456 zip 94103",  # bare digit runs must NOT match phone
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(PII_DOCS)], "doc_id long, text string"
    )


def test_pii_counts_match_python_twin(spark, pii_df):
    row = pii_counts(pii_df, "text").collect()[0]
    for name, (spark_re, _) in PII_PATTERNS.items():
        expect = sum(len(re.findall(spark_re, t)) for t in PII_DOCS)
        assert row[name] == expect, name
    # the crafted docs hit every detector at least once
    assert row["email"] == 2 and row["phone"] == 1
    assert row["ssn_like"] == 1 and row["ipv4"] == 2


def test_columns_to_protect_selects_only_pii_columns(spark, pii_df):
    df = pii_df.withColumn("clean_col", pii_df.doc_id.cast("string"))
    assert columns_to_protect(df, ["text", "clean_col"]) == ["text"]


def test_redact_spans_masks_pii_and_preserves_rest(spark, tmp_path):
    """pii_redact_spans vs a re.sub twin on a corpus written to parquet:
    seeded docs (doc_id % 3 == 0) get email+phone appended and must be
    redacted; organic PII in the base text is masked too; clean docs
    pass through byte-identical."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from databatchprotectionservice_spark.operators.pii import (
        pii_redact_spans,
    )

    docs = PII_DOCS + ["untouched plain sentence"]
    d = str(tmp_path / "redact")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s0"] * len(docs)),
                "n_chars": pa.array([len(t) for t in docs], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = {r.source: r for r in pii_redact_spans(spark, d).collect()}["s0"]

    def seed(i, t):
        if i % 3 == 0:
            return (
                f"{t} contact u{i}@example.com or "
                f"+1 (555) 010-{1000 + i % 9000}"
            )
        return t

    seeded = [seed(i, t) for i, t in enumerate(docs)]
    redacted = [
        re.sub(
            PII_PATTERNS["phone"][0],
            "[PHONE]",
            re.sub(PII_PATTERNS["email"][0], "[EMAIL]", t),
        )
        for t in seeded
    ]
    assert got.n_docs == len(docs)
    assert got.n_redacted == sum(
        1 for s, r in zip(seeded, redacted) if s != r
    )
    assert got.chars_removed == sum(
        len(s) - len(r) for s, r in zip(seeded, redacted)
    )
    md5s = sorted(hashlib.md5(r.encode()).hexdigest() for r in redacted)
    assert (got.min_md5, got.max_md5) == (md5s[0], md5s[-1])
    # sanity on the twin itself: organic + seeded PII masked, clean kept
    assert "[EMAIL]" in redacted[0] and "[PHONE]" in redacted[1]
    assert redacted[5] == "untouched plain sentence"


def test_gorilla_block_carry_across_arrow_batches(spark):
    """The r12 mapInPandas reshape's CARRY: a block straddling an
    Arrow batch boundary must reassemble before encoding.  Forcing
    tiny Arrow batches makes every block span several batches; the
    result must be identical to the default-batch run."""
    from databatchprotectionservice_spark.operators.relational import (
        timeseries_gorilla_stats,
    )

    sf_dir = "/root/testdata/sf0.001"
    want = sorted(
        map(tuple, timeseries_gorilla_stats(spark, sf_dir).collect())
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        got = sorted(
            map(tuple, timeseries_gorilla_stats(spark, sf_dir).collect())
        )
    finally:
        spark.conf.set(key, old)
    assert got == want
    assert len(got) == 5 and all(r[1] > 0 for r in got)
