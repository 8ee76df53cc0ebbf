"""asof_join: backward as-of semantics, tie handling, join modes."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cm_well_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-05")),
            (2, "k1", _ts("2024-01-10")),
            (3, "k1", _ts("2024-01-01")),  # before any right row
            (4, "k2", _ts("2024-01-05")),  # key with no right rows
        ],
        ["ev", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-03"), "a"),
            ("k1", _ts("2024-01-05"), "b"),  # equality matches
            ("k1", _ts("2024-01-08"), "c"),
        ],
        ["k", "rts", "val"],
    )
    return left, right


def test_backward_match_and_equality(frames):
    left, right = frames
    out = {
        r["ev"]: r["val"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    assert out == {1: "b", 2: "c"}  # ev1 matches the equal-ts row, ev3/ev4 drop


def test_left_join_keeps_unmatched(frames):
    left, right = frames
    out = {
        r["ev"]: r["val"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", how="left"
        ).collect()
    }
    assert out == {1: "b", 2: "c", 3: None, 4: None}


def test_rejects_bad_how(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts", how="outer")


def test_matches_pandas_merge_asof(spark, sf_dir):
    """Property pin vs pandas.merge_asof over the real events/orders
    tables (the third independent implementation after DuckDB)."""
    import pandas as pd

    from cm_well_spark.sources import tables as tbl

    events = tbl.load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = (
        tbl.load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("ots"))
        .agg(F.max("o_orderkey").alias("order_key"))
    )
    got = (
        asof_join(
            events, orders, on="user_id", left_ts="ts", right_ts="ots",
            right_cols=["order_key"],
        )
        .select("event_id", "order_key")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ep = events.toPandas()
    ep["ts"] = pd.to_datetime(ep["ts"])
    op = orders.toPandas()
    op["ots"] = pd.to_datetime(op["ots"])
    want = (
        pd.merge_asof(
            ep.sort_values("ts"),
            op.sort_values("ots"),
            left_on="ts",
            right_on="ots",
            by="user_id",
            direction="backward",
        )
        .dropna(subset=["order_key"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["order_key"].astype("int64").values == want["order_key"].astype("int64").values).all()


# ---------------------------------------------------------------------------
# interval_range_join
# ---------------------------------------------------------------------------


def test_range_join_bucket_boundaries(spark):
    """Pairs that straddle bucket edges still meet; the residual keeps
    exact [start, end] inclusive semantics."""
    from cm_well_spark.operators.temporal import interval_range_join

    left = spark.createDataFrame(
        [
            (1, "k", _ts("2024-01-01 00:59:59")),
            (2, "k", _ts("2024-01-01 01:00:00")),  # exactly at end: inclusive
            (3, "k", _ts("2024-01-01 01:00:01")),  # past end
            (4, "k", _ts("2024-01-01 00:00:00")),  # exactly at start
        ],
        ["ev", "k", "ts"],
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"), "w1")],
        ["k", "s", "e", "wid"],
    )
    out = sorted(
        r["ev"]
        for r in interval_range_join(
            left, right, left_ts="ts", right_start="s", right_end="e",
            on="k", bucket_seconds=600, right_cols=["wid"],
        ).collect()
    )
    assert out == [1, 2, 4]


def test_range_join_no_duplicate_pairs(spark, sf_dir):
    """An interval spanning many buckets still yields each pair once."""
    from cm_well_spark.operators.temporal import interval_range_join
    from cm_well_spark.sources import tables as tbl

    ev = tbl.load_table(spark, sf_dir, "events").limit(200)
    left = ev.select("event_id", "ts", "user_id")
    right = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
        F.col("event_id").alias("rid"),
    )
    out = interval_range_join(
        left, right, left_ts="ts", right_start="s", right_end="e",
        on="user_id", bucket_seconds=900, right_cols=["rid"],
    )
    assert out.count() == out.distinct().count()


# ---------------------------------------------------------------------------
# snapshot_at
# ---------------------------------------------------------------------------


def test_snapshot_at_picks_version_and_skips_tombstone(spark):
    from cm_well_spark.operators.search import snapshot_at

    rows = [
        # path A: v1 at t1, v2 at t3
        ("/a", "u1", _ts("2024-01-01"), 1, False, "ObjectInfoton"),
        ("/a", "u2", _ts("2024-01-03"), 2, True, "ObjectInfoton"),
        # path B: created t1, deleted t2
        ("/b", "u3", _ts("2024-01-01"), 1, False, "ObjectInfoton"),
        ("/b", "u4", _ts("2024-01-02"), 2, True, "DeletedInfoton"),
    ]
    df = spark.createDataFrame(
        rows, ["path", "uuid", "last_modified", "index_time", "current", "kind"]
    )
    at = lambda s: {r["path"]: r["uuid"] for r in snapshot_at(df, _ts(s)).collect()}
    assert at("2024-01-01 12:00:00") == {"/a": "u1", "/b": "u3"}
    assert at("2024-01-02 12:00:00") == {"/a": "u1"}  # /b deleted by now
    assert at("2024-01-04") == {"/a": "u2"}
    assert at("2023-12-31") == {}


# ---------------------------------------------------------------------------
# property: asof_join == pandas.merge_asof on random inputs
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(
    st.lists(  # left rows: (key, second-offset)
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    st.lists(  # right rows: (key, second-offset) — duplicates allowed
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=25
    ),
)
def test_asof_matches_pandas_on_random_frames(spark, left_rows, right_rows):
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left_rows)],
        ["ev", "k", "ts"],
    )
    # dedupe right per (key, ts) (the operator's documented determinism
    # precondition) keeping the max payload, mirrored on the pandas side
    rdict = {}
    for j, (k, s) in enumerate(right_rows):
        rdict[(k, s)] = max(rdict.get((k, s), -1), j)
    rrows = [(k, base + dt.timedelta(seconds=s), v) for (k, s), v in rdict.items()]
    if rrows:
        right = spark.createDataFrame(rrows, ["k", "rts", "val"])
    else:
        right = spark.createDataFrame([], "k int, rts timestamp, val long")

    got = {
        r["ev"]: r["val"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts", how="left").collect()
    }

    lp = pd.DataFrame(
        [(i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left_rows)],
        columns=["ev", "k", "ts"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "rts", "val"]).sort_values("rts", kind="stable")
    if len(rp):
        want_df = pd.merge_asof(lp, rp, left_on="ts", right_on="rts", by="k", direction="backward")
        want = {
            int(r.ev): (None if pd.isna(r.val) else int(r.val)) for r in want_df.itertuples()
        }
    else:
        want = {int(r.ev): None for r in lp.itertuples()}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 7200)), min_size=1, max_size=20),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7200), st.integers(0, 5400)),
        min_size=0,
        max_size=15,
    ),
)
def test_range_join_matches_bruteforce_on_random_frames(spark, left_rows, right_rows):
    """Bucketing + residual == the naive BETWEEN join, for arbitrary
    interval lengths spanning 0..several buckets."""
    import datetime as dt

    from cm_well_spark.operators.temporal import interval_range_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left_rows)],
        ["ev", "k", "ts"],
    )
    rrows = [
        (j, k, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + d))
        for j, (k, s, d) in enumerate(right_rows)
    ]
    if rrows:
        right = spark.createDataFrame(rrows, ["rid", "k", "s", "e"])
    else:
        right = spark.createDataFrame([], "rid long, k int, s timestamp, e timestamp")
    got = {
        (r["ev"], r["rid"])
        for r in interval_range_join(
            left, right, left_ts="ts", right_start="s", right_end="e",
            on="k", bucket_seconds=600, right_cols=["rid"],
        ).collect()
    }
    want = {
        (i, j)
        for i, (lk, ls) in enumerate(left_rows)
        for j, (rk, rs, rd) in enumerate(right_rows)
        if lk == rk and rs <= ls <= rs + rd
    }
    assert got == want
