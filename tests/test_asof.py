from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.asof import asof_join


def _ts(df, col="ts"):
    return df.withColumn(col, F.col(col).cast("timestamp"))


def test_asof_backward_basic(spark):
    left = _ts(spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00"),
         (2, "u1", "2024-01-01 12:00:00"),
         (3, "u2", "2024-01-01 09:00:00")],
        "id INT, user STRING, ts STRING"))
    right = _ts(spark.createDataFrame(
        [("u1", "2024-01-01 09:30:00", 10.0),
         ("u1", "2024-01-01 11:00:00", 20.0),
         ("u2", "2024-01-01 09:30:00", 99.0)],
        "user STRING, ts STRING, price DOUBLE"))
    out = {r["id"]: r["price_asof"] for r in
           asof_join(left, right, on=["user"], ts="ts").collect()}
    assert out == {1: 10.0, 2: 20.0, 3: None}  # u2's only price is later


def test_asof_tie_takes_equal_ts(spark):
    left = _ts(spark.createDataFrame([(1, "u", "2024-01-01 10:00:00")],
                                     "id INT, user STRING, ts STRING"))
    right = _ts(spark.createDataFrame([("u", "2024-01-01 10:00:00", 5.0)],
                                      "user STRING, ts STRING, price DOUBLE"))
    out = asof_join(left, right, on=["user"], ts="ts").first()
    assert out["price_asof"] == 5.0  # <= semantics: equal ts matches


def test_asof_null_value_in_latest_right_row_wins(spark):
    # merge_asof/DuckDB parity: the LATEST right row is attached even when
    # its value column is NULL — no falling back to older non-null values
    left = _ts(spark.createDataFrame([(1, "u", "2024-01-01 12:00:00")],
                                     "id INT, user STRING, ts STRING"))
    right = _ts(spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", 5.0),
         ("u", "2024-01-01 11:00:00", None)],
        "user STRING, ts STRING, price DOUBLE"))
    out = asof_join(left, right, on=["user"], ts="ts").first()
    assert out["price_asof"] is None


def test_asof_multiple_value_cols_from_same_row(spark):
    left = _ts(spark.createDataFrame([(1, "u", "2024-01-01 12:00:00")],
                                     "id INT, user STRING, ts STRING"))
    right = _ts(spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", 5.0, "old"),
         ("u", "2024-01-01 11:00:00", None, "new")],
        "user STRING, ts STRING, price DOUBLE, tag STRING"))
    out = asof_join(left, right, on=["user"], ts="ts").first()
    # both columns must come from the 11:00 row — never a mix
    assert out["price_asof"] is None and out["tag_asof"] == "new"


def test_asof_keeps_left_columns_and_count(spark):
    left = _ts(spark.createDataFrame(
        [(i, "u", f"2024-01-01 10:{i:02d}:00") for i in range(10)],
        "id INT, user STRING, ts STRING"))
    right = _ts(spark.createDataFrame([("u", "2024-01-01 10:05:30", 1.0)],
                                      "user STRING, ts STRING, price DOUBLE"))
    out = asof_join(left, right, on=["user"], ts="ts")
    assert out.count() == 10  # left-preserving
    vals = {r["id"]: r["price_asof"] for r in out.collect()}
    assert vals[5] is None and vals[6] == 1.0


def test_asof_forward_basic(spark):
    left = _ts(spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00"),
         (2, "u1", "2024-01-01 12:00:00"),
         (3, "u2", "2024-01-01 10:00:00")],
        "id INT, user STRING, ts STRING"))
    right = _ts(spark.createDataFrame(
        [("u1", "2024-01-01 11:00:00", 20.0),
         ("u1", "2024-01-01 09:00:00", 10.0),
         ("u2", "2024-01-01 09:30:00", 99.0)],
        "user STRING, ts STRING, price DOUBLE"))
    out = {r["id"]: r["price_asof"] for r in
           asof_join(left, right, on=["user"], ts="ts",
                     direction="forward").collect()}
    assert out == {1: 20.0, 2: None, 3: None}  # u2's only price is earlier


def test_asof_forward_tie_takes_equal_ts(spark):
    left = _ts(spark.createDataFrame([(1, "u", "2024-01-01 10:00:00")],
                                     "id INT, user STRING, ts STRING"))
    right = _ts(spark.createDataFrame([("u", "2024-01-01 10:00:00", 7.0)],
                                      "user STRING, ts STRING, price DOUBLE"))
    out = asof_join(left, right, on=["user"], ts="ts",
                    direction="forward").first()
    assert out["price_asof"] == 7.0


def test_asof_tolerance_nulls_stale_match(spark):
    left = _ts(spark.createDataFrame(
        [(1, "u", "2024-01-01 10:00:00"), (2, "u", "2024-01-01 13:00:00")],
        "id INT, user STRING, ts STRING"))
    right = _ts(spark.createDataFrame([("u", "2024-01-01 09:30:00", 5.0)],
                                      "user STRING, ts STRING, price DOUBLE"))
    out = {r["id"]: r["price_asof"] for r in
           asof_join(left, right, on=["user"], ts="ts",
                     tolerance_us=3600 * 1_000_000).collect()}
    assert out == {1: 5.0, 2: None}  # 3.5h gap exceeds the 1h tolerance


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized parity with pandas merge_asof, both directions, with
    and without tolerance."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    left_pd = pd.DataFrame({
        "user": rng.choice(["a", "b", "c"], 60),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.randint(0, 10_000, 60), unit="s"),
        "id": np.arange(60),
    }).sort_values("ts").reset_index(drop=True)
    right_pd = pd.DataFrame({
        "user": rng.choice(["a", "b", "c"], 40),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.randint(0, 10_000, 40), unit="s"),
        "price": rng.rand(40).round(3),
    }).sort_values("ts").reset_index(drop=True)
    # merge_asof requires unique ordering; drop exact (user, ts) dup rights
    right_pd = right_pd.drop_duplicates(["user", "ts"]).reset_index(drop=True)

    left = _ts(spark.createDataFrame(left_pd.assign(ts=left_pd.ts.astype(str))))
    right = _ts(spark.createDataFrame(right_pd.assign(ts=right_pd.ts.astype(str))))

    for direction, tol in [("backward", None), ("forward", None),
                           ("backward", 1800 * 1_000_000)]:
        want_pd = pd.merge_asof(
            left_pd.sort_values("ts"), right_pd.sort_values("ts"),
            on="ts", by="user", direction=direction,
            tolerance=None if tol is None else pd.Timedelta(microseconds=tol),
        )
        want = dict(zip(want_pd["id"], want_pd["price"]))
        got = {r["id"]: r["price_asof"] for r in
               asof_join(left, right, on=["user"], ts="ts",
                         direction=direction, tolerance_us=tol).collect()}
        for k in want:
            w = want[k]
            g = got[k]
            assert (pd.isna(w) and g is None) or w == g, (direction, tol, k, w, g)


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """direction='nearest' vs pandas merge_asof on tie-free data."""
    import pandas as pd

    from data_pipeline_who_gho_spark.operators.asof import asof_join

    from datetime import datetime

    left = [(i, 1, datetime(2024, 1, 1, 0, m)) for i, m in enumerate([5, 17, 30, 44, 59])]
    right = [(1, datetime(2024, 1, 1, 0, m), float(m)) for m in [0, 15, 40]]
    l = spark.createDataFrame(left, "event_id INT, k INT, ts TIMESTAMP")
    r = spark.createDataFrame(right, "k INT, ts TIMESTAMP, v DOUBLE")
    out = {row["event_id"]: row["v_asof"]
           for row in asof_join(l, r, on=["k"], ts="ts", value_cols=["v"],
                                direction="nearest").collect()}
    pdl = pd.DataFrame(left, columns=["event_id", "k", "ts"]).sort_values("ts")
    pdr = pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values("ts")
    want = pd.merge_asof(pdl, pdr, on="ts", by="k", direction="nearest")
    for _, row in want.iterrows():
        assert out[row["event_id"]] == row["v"]


def test_asof_nearest_tie_and_tolerance_contract(spark):
    """Documented spec: equal distances resolve to the BACKWARD match;
    tolerance caps the chosen gap symmetrically."""
    import pandas as pd

    from data_pipeline_who_gho_spark.operators.asof import asof_join

    from datetime import datetime

    l = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1, 0, 30))], "event_id INT, k INT, ts TIMESTAMP"
    )
    r = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 20), 20.0),
         (1, datetime(2024, 1, 1, 0, 40), 40.0)],
        "k INT, ts TIMESTAMP, v DOUBLE",
    )
    got = asof_join(l, r, on=["k"], ts="ts", value_cols=["v"],
                    direction="nearest").first()
    assert got["v_asof"] == 20.0  # 10 min both ways -> backward wins

    tight = asof_join(l, r, on=["k"], ts="ts", value_cols=["v"],
                      direction="nearest", tolerance_us=5 * 60 * 1_000_000).first()
    assert tight["v_asof"] is None  # both matches out of tolerance


def test_asof_nearest_events_matches_duckdb_oracle(spark):
    """Pre-registration oracle parity for the queued r05 query."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.extras import (
        ASOF_NEAREST_SQL,
        asof_nearest_events,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, asof_nearest_events(spark, sf).collect()))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = sorted(map(tuple, con.sql(ASOF_NEAREST_SQL).fetchall()))
    assert got == want
