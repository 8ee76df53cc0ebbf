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


def test_anomaly_seasonal_slot_partitioning(spark):
    from cm_well_spark.operators.temporal import anomaly_seasonal

    rows = []
    # 09:00 is busy every day (10 events), 03:00 quiet (2) — for 5 days;
    # day 6 has a REAL 03:00 spike of 10
    eid = 0
    for day in range(1, 6):
        for hour, n in ((9, 10), (3, 2)):
            for i in range(n):
                eid += 1
                rows.append((eid, 1, _ts(f"2024-01-0{day} 0{hour}:00:00") + dt.timedelta(seconds=i), "view"))
    for i in range(10):
        eid += 1
        rows.append((eid, 1, _ts("2024-01-06 03:00:00") + dt.timedelta(seconds=i), "view"))
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = {r["window_start"]: r for r in anomaly_seasonal(ev).collect()}
    # a normal busy 09:00 is NOT anomalous against its own slot history
    d5_9 = out["2024-01-05 09:00"]
    assert d5_9["mean_seasonal"] == 10.0 and (d5_9["zscore"] is None or abs(d5_9["zscore"]) < 1)
    # the 03:00 spike IS anomalous vs the quiet 03:00 baseline... but a
    # constant baseline (std 0) reports NULL by contract
    d6_3 = out["2024-01-06 03:00"]
    assert d6_3["mean_seasonal"] == 2.0 and d6_3["n_events"] == 10
    assert d6_3["zscore"] is None  # std of constant history is 0 -> undefined


def test_fk_audit_counts(spark):
    from cm_well_spark.operators.curation import fk_audit

    child = spark.createDataFrame([(1,), (1,), (2,), (99,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    row = fk_audit(child, parent, "fk", "pk").collect()[0]
    assert row["n_children"] == 4 and row["n_parents"] == 3
    assert row["n_orphan_children"] == 1  # the 99 row
    assert row["n_childless_parents"] == 1  # parent 3
    assert row["orphan_frac"] == 0.25


def test_degree_distribution_star(spark):
    import math

    from cm_well_spark.operators.graph import degree_distribution

    # star: hub h with 4 leaves -> degrees {4: 1 node, 1: 4 nodes}
    e = spark.createDataFrame([("h", f"l{i}") for i in range(4)], ["src", "dst"])
    got = {r["degree"]: r for r in degree_distribution(e).collect()}
    assert got[4]["n_nodes"] == 1 and got[1]["n_nodes"] == 4
    assert got[1]["frac"] == 0.8
    # CSN alpha with dmin=1: 1 + 5 / (4*ln(1/0.5) + 1*ln(4/0.5))
    want = 1.0 + 5 / (4 * math.log(2) + math.log(8))
    assert got[1]["alpha"] == pytest.approx(want, abs=1e-6)
