"""active_users (DAU/WAU/MAU) and session_paths — hand fixtures."""

import datetime as dt

from cm_well_spark.operators.temporal import active_users, session_paths


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_active_users_trailing_windows(spark):
    rows = [
        # u1 active day 1; u2 active day 1 and day 10
        (1, 1, _ts("2024-01-01 10:00:00")),
        (2, 2, _ts("2024-01-01 11:00:00")),
        (3, 2, _ts("2024-01-10 09:00:00")),
        # duplicate same-day event must not double-count
        (4, 2, _ts("2024-01-10 18:00:00")),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = {r["day"]: r for r in active_users(ev).collect()}
    # only event days surface
    assert set(out) == {"2024-01-01", "2024-01-10"}
    d1 = out["2024-01-01"]
    assert (d1["dau"], d1["wau"], d1["mau"]) == (2, 2, 2)
    d10 = out["2024-01-10"]
    # day-1 users are outside the 7-day window but inside the 30-day one
    assert d10["dau"] == 1 and d10["wau"] == 1 and d10["mau"] == 2
    assert d10["stickiness"] == 0.5


def test_session_paths_orders_truncates_and_ranks(spark):
    t0 = _ts("2024-01-01 10:00:00")
    rows = []
    # two users with the same two-step journey, one with a different one
    for uid, types in ((1, ["view", "click"]), (2, ["view", "click"]), (3, ["view"])):
        for i, ty in enumerate(types):
            rows.append((uid * 100 + i, uid, t0 + dt.timedelta(minutes=i), ty))
    # user 4: same-instant tie must order by event_id -> "a > b"
    rows += [(401, 4, t0, "b"), (400, 4, t0, "a")]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = {r["path"]: r for r in session_paths(ev, k=10).collect()}
    assert out["view > click"]["n_sessions"] == 2
    assert out["view > click"]["rank"] == 1
    assert out["a > b"]["n_sessions"] == 1
    assert "b > a" not in out


def test_session_paths_max_len_truncation(spark):
    t0 = _ts("2024-01-01 10:00:00")
    rows = [(i, 1, t0 + dt.timedelta(seconds=i), f"e{i:02d}") for i in range(6)]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = session_paths(ev, k=5, max_len=3).collect()
    assert out[0]["path"] == "e00 > e01 > e02"


def test_session_paths_gap_splits_sessions(spark):
    t0 = _ts("2024-01-01 10:00:00")
    rows = [
        (1, 1, t0, "view"),
        (2, 1, t0 + dt.timedelta(hours=2), "view"),  # new session
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = session_paths(ev, k=5).collect()
    assert out[0]["path"] == "view" and out[0]["n_sessions"] == 2
