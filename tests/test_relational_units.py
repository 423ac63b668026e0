"""Unit tests for relational operators beyond the oracle gate."""

def test_funnel_levels_edge_semantics(spark):
    """Crafted chains pin the windowFunnel semantics: strict '<' (an
    equal-timestamp pair cannot chain), window INCLUSIVE at v + W, the
    anchor view is chosen per-chain (a later view rescues a purchase
    the earliest view cannot reach), and step order matters (purchase
    before click does not count)."""
    import pandas as pd

    from databatchprotectionservice_spark.operators.relational import (
        _FUNNEL_W_US as W,
    )
    from databatchprotectionservice_spark.operators import relational

    rows = []

    def ev(uid, typ, us):
        rows.append((uid, len(rows), typ, us))

    # u1: clean level-3 chain inside the window
    ev(1, "view", 0); ev(1, "click", 10); ev(1, "purchase", 20)
    # u2: click at the SAME us as view -> cannot chain (strict <)
    ev(2, "view", 0); ev(2, "click", 0); ev(2, "purchase", 5)
    # u3: purchase exactly AT v + W -> inclusive, level 3
    ev(3, "view", 0); ev(3, "click", 1); ev(3, "purchase", W)
    # u4: purchase one past v + W -> level 2
    ev(4, "view", 0); ev(4, "click", 1); ev(4, "purchase", W + 1)
    # u5: earliest view cannot reach the purchase, a LATER view can
    ev(5, "view", 0); ev(5, "click", 1)
    ev(5, "view", W); ev(5, "click", W + 1); ev(5, "purchase", W + 2)
    # u6: purchase BEFORE the click -> order violation, level 2
    ev(6, "view", 0); ev(6, "purchase", 1); ev(6, "click", 2)
    # u7: no view at all -> level 0
    ev(7, "signup", 0); ev(7, "error", 1)
    # u8: view only -> level 1
    ev(8, "view", 0)

    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "event_type", "us"]
    )
    import pyspark.sql.functions as F_

    df = spark.createDataFrame(pdf).withColumn(
        "ts", F_.timestamp_micros(F_.col("us"))
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.select("user_id", "event_type", "ts").write.parquet(
            td + "/events.parquet"
        )
        got = {
            r["user_id"]: r["funnel_level"]
            for r in relational.events_funnel_levels(spark, td).collect()
        }
    assert got == {1: 3, 2: 1, 3: 3, 4: 2, 5: 3, 6: 2, 7: 0, 8: 1}


def test_hourly_anomalies_integer_boundary(spark):
    """The strict-> boundary of the float-free z-score test, pinned on
    the algebraic identity: ONE outlier among (n-1) equal counts sits
    at exactly z^2 = n - 1, so with k = 3 it must NOT flag at n = 10
    (9 == 9, strict) no matter how extreme the outlier, and MUST flag
    at n = 12 (121(b-a)^2 > 99(b-a)^2 for any b != a) — a float
    stddev implementation rounds either way on exactly this case."""
    import pandas as pd
    import pyspark.sql.functions as F_

    from databatchprotectionservice_spark.operators import relational

    rows = []

    def hour(i, typ, count):
        base = i * relational._HOUR_US
        for j in range(count):
            rows.append((typ, base + j))

    # type 'ten': 9 hours of 2 events + 1 hour of 50 -> z^2 == 9, no flag
    for i in range(9):
        hour(i, "ten", 2)
    hour(9, "ten", 50)
    # type 'twelve': 11 hours of 2 + 1 hour of 3 -> z^2 = 121/99 * 9 > 9
    for i in range(12):
        hour(100 + i, "twelve", 3 if i == 11 else 2)

    pdf = pd.DataFrame(rows, columns=["event_type", "us"])
    df = spark.createDataFrame(pdf).withColumn(
        "ts", F_.timestamp_micros(F_.col("us"))
    ).withColumn("user_id", F_.lit(1))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.select("user_id", "event_type", "ts").write.parquet(
            td + "/events.parquet"
        )
        got = {
            r["event_type"]: (r["n_hours"], r["n_anomalous"], r["max_count"])
            for r in relational.events_hourly_anomalies(spark, td).collect()
        }
    assert got["ten"] == (10, 0, 50)      # boundary: NOT anomalous
    assert got["twelve"] == (12, 1, 3)    # past boundary: flags


def test_funnel_matches_bruteforce_exists_property(spark):
    """Randomized referee: the vectorized prefix-max funnel scan must
    equal the O(n^3) EXISTS-chain brute force (the oracle's spec) on
    random event soups — ties, bursts, and empty step sets included."""
    import random

    import pandas as pd
    import pyspark.sql.functions as F_

    from databatchprotectionservice_spark.operators import relational

    W = relational._FUNNEL_W_US
    rng = random.Random(20260816)
    types = ["view", "click", "purchase", "signup", "error"]
    rows = []
    expected = {}
    for uid in range(40):
        n = rng.randint(0, 12)
        evs = [
            (rng.choice(types), rng.randrange(0, 3 * W))
            for _ in range(n)
        ]
        # force tie clusters sometimes
        if n >= 2 and rng.random() < 0.5:
            evs[1] = (evs[1][0], evs[0][1])
        vs = sorted(us for t, us in evs if t == "view")
        cs = sorted(us for t, us in evs if t == "click")
        ps = sorted(us for t, us in evs if t == "purchase")
        lvl = 0
        if vs:
            lvl = 1
            if any(v < c <= v + W for v in vs for c in cs):
                lvl = 2
                if any(
                    v < c < p <= v + W
                    for v in vs
                    for c in cs
                    for p in ps
                ):
                    lvl = 3
        if evs:
            expected[uid] = lvl
            rows.extend((uid, t, us) for t, us in evs)
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "us"])
    df = spark.createDataFrame(pdf).withColumn(
        "ts", F_.timestamp_micros(F_.col("us"))
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.select("user_id", "event_type", "ts").write.parquet(
            td + "/events.parquet"
        )
        got = {
            r["user_id"]: r["funnel_level"]
            for r in relational.events_funnel_levels(spark, td).collect()
        }
    assert got == expected
