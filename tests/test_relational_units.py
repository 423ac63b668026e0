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
