"""sessionize, mad_outliers, shortest_paths_weighted — hand fixtures."""

import datetime as dt

import pytest

from cm_well_spark.operators.curation import mad_outliers
from cm_well_spark.operators.graph import shortest_paths_weighted
from cm_well_spark.operators.temporal import sessionize


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_sessionize_gap_break_and_start_labels(spark):
    ev = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 10:00:00"), 0.0),
            (2, 7, _ts("2024-01-01 10:20:00"), 0.0),  # 20m -> same session
            (3, 7, _ts("2024-01-01 10:50:00"), 0.0),  # exactly 30m -> continues
            (4, 7, _ts("2024-01-01 11:30:01"), 0.0),  # 30m1s -> breaks
            (5, 8, _ts("2024-01-01 10:00:00"), 0.0),  # other user independent
        ],
        ["event_id", "user_id", "ts", "value"],
    )
    out = {r["event_id"]: r for r in sessionize(ev).collect()}
    assert [out[i]["session_seq"] for i in (1, 2, 3, 4)] == [1, 1, 1, 2]
    assert out[3]["session_start"] == "2024-01-01 10:00:00.000000"
    assert out[4]["session_start"] == "2024-01-01 11:30:01.000000"
    assert out[5]["session_seq"] == 1


def test_sessionize_rejects_unknown_gap(spark):
    ev = spark.createDataFrame([(1, 1, _ts("2024-01-01"), 0.0)], ["event_id", "user_id", "ts", "value"])
    with pytest.raises(ValueError):
        sessionize(ev, gap="17 fortnights")


def test_mad_outliers_resists_the_outlier_itself(spark):
    # values 10..14 plus a 1000: median 12(.5), MAD small -> 1000 flagged
    rows = [("en", float(v)) for v in (10, 11, 12, 13, 14, 1000)]
    df = spark.createDataFrame(rows, ["lang", "v"])
    out = mad_outliers(df, "v", by="lang").collect()
    flagged = {r["v"] for r in out if r["is_outlier"]}
    assert flagged == {1000.0}
    # median/mad are the robust ones, not dragged by the 1000
    assert out[0]["median"] == pytest.approx(12.5)


def test_mad_zero_falls_back_to_any_deviation(spark):
    rows = [("en", 5.0), ("en", 5.0), ("en", 5.0), ("en", 9.0)]
    out = mad_outliers(spark.createDataFrame(rows, ["lang", "v"]), "v", by="lang").collect()
    assert all(r["mad"] == 0.0 for r in out)
    assert {r["v"] for r in out if r["is_outlier"]} == {9.0}
    assert all(r["robust_z"] is None for r in out)


def test_sssp_prefers_cheap_two_hop_over_expensive_direct(spark):
    e = spark.createDataFrame(
        [("a", "b", 10.0), ("a", "c", 1.0), ("c", "b", 2.0), ("b", "d", 1.0)],
        ["src", "dst", "weight"],
    )
    seeds = spark.createDataFrame([("a",)], ["path"])
    out = {r["path"]: r["distance"] for r in shortest_paths_weighted(e, seeds, rounds=3).collect()}
    assert out["a"] == 0.0
    assert out["c"] == 1.0
    assert out["b"] == 3.0  # via c, not the direct 10
    assert out["d"] == 4.0


def test_sssp_round_bound_limits_hops(spark):
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)], ["src", "dst", "weight"]
    )
    seeds = spark.createDataFrame([("a",)], ["path"])
    out = {r["path"]: r["distance"] for r in shortest_paths_weighted(e, seeds, rounds=2).collect()}
    assert "d" not in out and out["c"] == 2.0


def test_sssp_undirected_and_validation(spark):
    e = spark.createDataFrame([("a", "b", 2.0)], ["src", "dst", "weight"])
    seeds = spark.createDataFrame([("b",)], ["path"])
    out = {r["path"]: r["distance"] for r in shortest_paths_weighted(e, seeds, rounds=1).collect()}
    assert out["a"] == 2.0  # edge walked backward
    with pytest.raises(ValueError):
        shortest_paths_weighted(e, seeds, rounds=0)
