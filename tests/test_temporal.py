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


# ---------------------------------------------------------------------------
# round 9 (cont.): funnel + windowed anomaly z-score
# ---------------------------------------------------------------------------

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def test_funnel_strict_order_and_break_propagation(spark):
    from cm_well_spark.operators.temporal import funnel

    t = _ts
    rows = [
        # u1 completes in order
        (1, t("2024-01-01T10:00:00"), 1, "view"),
        (2, t("2024-01-01T10:05:00"), 1, "click"),
        (3, t("2024-01-01T10:10:00"), 1, "purchase"),
        # u2: click BEFORE view -> t2 must ignore it; later click counts
        (4, t("2024-01-01T09:00:00"), 2, "click"),
        (5, t("2024-01-01T10:00:00"), 2, "view"),
        (6, t("2024-01-01T11:00:00"), 2, "click"),
        # u3: view only -> depth 1, t2/t3 NULL
        (7, t("2024-01-01T08:00:00"), 3, "view"),
        # u4: purchase then view, never clicks -> depth 1
        (8, t("2024-01-01T07:00:00"), 4, "purchase"),
        (9, t("2024-01-01T07:30:00"), 4, "view"),
        # u5: no view at all -> NOT in the funnel
        (10, t("2024-01-01T07:00:00"), 5, "click"),
        # u6: same-instant click as view -> strict > rejects it
        (11, t("2024-01-01T06:00:00"), 6, "view"),
        (12, t("2024-01-01T06:00:00"), 6, "click"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["user_id"]: r for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 3, 4, 6}
    assert got[1]["depth"] == 3 and got[1]["t3"].startswith("2024-01-01 10:10:00")
    assert got[2]["depth"] == 2 and got[2]["t2"].startswith("2024-01-01 11:00:00")
    assert got[3]["depth"] == 1 and got[3]["t2"] is None and got[3]["t3"] is None
    assert got[4]["depth"] == 1
    assert got[6]["depth"] == 1 and got[6]["t2"] is None  # strict inequality


def test_funnel_rejects_single_step(spark):
    from cm_well_spark.operators.temporal import funnel

    df = spark.createDataFrame([], EV_SCHEMA)
    with pytest.raises(ValueError):
        funnel(df, ["view"])


def test_anomaly_zscore_baseline_gating(spark):
    from cm_well_spark.operators.temporal import anomaly_zscore

    t = _ts
    rows = []
    eid = 0
    # 8 steady hours of 2 'click' events, then one hour with 10
    for h in range(8):
        for j in range(2):
            eid += 1
            rows.append((eid, t(f"2024-01-01T{h:02d}:0{j}:00"), 1, "click"))
    for j in range(10):
        eid += 1
        rows.append((eid, t(f"2024-01-01T08:{j:02d}:00"), 1, "click"))
    # a constant-rate type: std 0 -> zscore NULL even with history
    for h in range(9):
        eid += 1
        rows.append((eid, t(f"2024-01-01T{h:02d}:30:00"), 2, "view"))
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        (r["window_start"], r["event_type"]): r
        for r in anomaly_zscore(df, window="1 hour", trail=24, min_trail=6).collect()
    }
    # first 6 click windows: not enough history -> NULL
    for h in range(6):
        assert got[(f"2024-01-01 0{h}:00", "click")]["zscore"] is None
    spike = got[("2024-01-01 08:00", "click")]
    assert spike["mean_trail"] == 2.0 and spike["std_trail"] == 0.0
    assert spike["zscore"] is None  # constant baseline: undefined, not inf
    # make the baseline non-constant: one window of 3 then the spike
    rows.append((900, t("2024-01-01T07:59:00"), 1, "click"))
    got2 = {
        (r["window_start"], r["event_type"]): r
        for r in anomaly_zscore(spark.createDataFrame(rows, EV_SCHEMA)).collect()
    }
    spike2 = got2[("2024-01-01 08:00", "click")]
    assert spike2["zscore"] is not None and spike2["zscore"] > 5
    # constant 'view' series: all NULL
    assert all(
        got[(k, "view")]["zscore"] is None
        for k in {kk for kk, tt in got if tt == "view"}
    )


def test_cohort_retention_matrix(spark):
    from cm_well_spark.operators.temporal import cohort_retention

    t = _ts
    rows = [
        # cohort A (week of 2024-01-04, epoch-aligned): u1, u2
        (1, t("2024-01-05T10:00:00"), 1, "view"),
        (2, t("2024-01-06T10:00:00"), 2, "view"),
        # week +1: only u1 returns
        (3, t("2024-01-12T10:00:00"), 1, "click"),
        # week +2: both return
        (4, t("2024-01-19T10:00:00"), 1, "view"),
        (5, t("2024-01-20T10:00:00"), 2, "view"),
        # cohort B (week +1): u3 never returns
        (6, t("2024-01-11T10:00:00"), 3, "view"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        (r["cohort"], r["period_offset"]): (r["n_active"], r["retention"])
        for r in cohort_retention(df, period="7 days").collect()
    }
    a, b = "2024-01-04", "2024-01-11"
    assert got[(a, 0)] == (2, 1.0)
    assert got[(a, 1)] == (1, 0.5)
    assert got[(a, 2)] == (2, 1.0)
    assert got[(b, 0)] == (1, 1.0)
    assert set(got) == {(a, 0), (a, 1), (a, 2), (b, 0)}


def test_funnel_within_seconds_boxes_transitions(spark):
    from cm_well_spark.operators.temporal import funnel

    rows = [
        # u1: click 30s after view -> converts with a 60s box
        (1, "view", _ts("2024-01-01 10:00:00")),
        (1, "click", _ts("2024-01-01 10:00:30")),
        # u2: click 2 min after view -> depth 1 with a 60s box
        (2, "view", _ts("2024-01-01 10:00:00")),
        (2, "click", _ts("2024-01-01 10:02:00")),
        # u3: click at EXACTLY the horizon -> still counts (<=)
        (3, "view", _ts("2024-01-01 10:00:00")),
        (3, "click", _ts("2024-01-01 10:01:00")),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {r["user_id"]: r["depth"] for r in funnel(ev, ["view", "click"], within_seconds=60).collect()}
    assert out == {1: 2, 2: 1, 3: 2}
    # unboxed behavior unchanged
    out2 = {r["user_id"]: r["depth"] for r in funnel(ev, ["view", "click"]).collect()}
    assert out2 == {1: 2, 2: 2, 3: 2}


def test_asof_forward_direction(spark):
    from cm_well_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-05")), (2, "k", _ts("2024-01-08"))], ["ev", "k", "ts"]
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-03"), "past"), ("k", _ts("2024-01-08"), "now"),
         ("k", _ts("2024-01-10"), "soon")],
        ["k", "rts", "val"],
    )
    out = {
        r["ev"]: r["val"]
        for r in asof_join(left, right, "k", "ts", "rts", direction="forward").collect()
    }
    assert out[1] == "now"  # earliest right >= 01-05
    assert out[2] == "now"  # equality matches forward too
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, "k", "ts", "rts", direction="sideways").collect()


def test_funnel_rates_rollup(spark):
    from cm_well_spark.operators.temporal import funnel_rates

    # depths: three users reached 1, two reached 2, one reached 3
    f = spark.createDataFrame([(1, 3), (2, 2), (3, 1)], ["user_id", "depth"])
    out = {r["step"]: r for r in funnel_rates(f, n_steps=3).collect()}
    assert [out[i]["n_reached"] for i in (1, 2, 3)] == [3, 2, 1]
    assert out[2]["conv_from_prev"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[3]["conv_from_prev"] == pytest.approx(0.5)
    assert out[3]["conv_from_first"] == pytest.approx(1 / 3, abs=1e-6)
    import pytest as _p

    with _p.raises(ValueError):
        funnel_rates(f, n_steps=1)


def test_funnel_rates_empty_funnel(spark):
    from cm_well_spark.operators.temporal import funnel_rates

    f = spark.createDataFrame([], "user_id long, depth int")
    out = {r["step"]: r for r in funnel_rates(f, n_steps=2).collect()}
    assert out[1]["n_reached"] == 0 and out[1]["conv_from_first"] is None


def test_resample_ffill_fills_gaps_per_key(spark):
    from cm_well_spark.operators.temporal import resample_ffill

    rows = [
        # user 1: hours 10 and 13 observed; 11, 12 must forward-fill 1.5
        (1, 1, _ts("2024-01-01 10:15:00"), 1.0),
        (2, 1, _ts("2024-01-01 10:45:00"), 1.5),  # later in same bucket wins
        (3, 1, _ts("2024-01-01 13:05:00"), 9.0),
        # user 2: single observation -> single-bucket grid
        (4, 2, _ts("2024-01-01 11:00:00"), 5.0),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {(r["key"], r["bucket"]): r for r in resample_ffill(ev).collect()}
    u1 = [out[(1, f"2024-01-01 {h}:00")] for h in ("10", "11", "12", "13")]
    assert [r["value"] for r in u1] == [1.5, 1.5, 1.5, 9.0]
    assert [r["is_observed"] for r in u1] == [True, False, False, True]
    # user 2's grid is exactly one bucket; no bleed from user 1
    assert {(k, b) for (k, b) in out if k == 2} == {(2, "2024-01-01 11:00")}


def test_near_duplicate_events_band_and_buckets(spark):
    from cm_well_spark.operators.temporal import near_duplicate_events

    rows = [
        # pair inside the band, straddling a 60s bucket boundary
        (1, 7, "click", _ts("2024-01-01 10:00:59"), 1.0),
        (2, 7, "click", _ts("2024-01-01 10:01:30"), 1.0),
        # outside the band
        (3, 7, "click", _ts("2024-01-01 10:05:00"), 1.0),
        # same instant, same key -> one pair, smaller id first
        (4, 8, "view", _ts("2024-01-01 10:00:00"), 2.0),
        (5, 8, "view", _ts("2024-01-01 10:00:00"), 2.0),
        # different type never pairs
        (6, 7, "view", _ts("2024-01-01 10:01:00"), 1.0),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts", "value"])
    got = {(r["id_a"], r["id_b"]): r["gap_seconds"] for r in near_duplicate_events(ev).collect()}
    assert got == {(1, 2): 31.0, (4, 5): 0.0}
    # value matching: distinct values stop a pair
    ev2 = ev.withColumn("value", F.col("event_id").cast("double"))
    assert near_duplicate_events(ev2).count() == 0
