"""period_growth, interarrival_stats, topk_per_group, zipf_fit."""

import datetime as dt
import math

import pytest

from cm_well_spark.operators.aggregations import topk_per_group
from cm_well_spark.operators.temporal import interarrival_stats, period_growth
from cm_well_spark.operators.text import zipf_fit


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_period_growth_deltas_and_null_edges(spark):
    rows = [
        (_ts("1970-01-05"), 10.0),
        (_ts("1970-01-10"), 10.0),
        (_ts("1970-02-05"), 30.0),  # second 30-day bucket
        (_ts("1970-03-10"), 15.0),  # third bucket
    ]
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = sorted(period_growth(df, "ts", "v").collect(), key=lambda r: r["period_start"])
    assert [r["total"] for r in out] == [20.0, 30.0, 15.0]
    assert out[0]["prev_total"] is None and out[0]["pct_change"] is None
    assert out[1]["delta"] == 10.0 and out[1]["pct_change"] == pytest.approx(0.5)
    assert out[2]["pct_change"] == pytest.approx(-0.5)


def test_interarrival_burstiness_metronome(spark):
    # user 1: perfectly regular 60s gaps -> std 0 -> burstiness -1
    rows = [(i, 1, _ts("2024-01-01 10:00:00") + dt.timedelta(seconds=60 * i)) for i in range(4)]
    # user 2: one gap only -> dropped by min_gaps
    rows += [(10, 2, _ts("2024-01-01 10:00:00")), (11, 2, _ts("2024-01-01 10:05:00"))]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = {r["user_id"]: r for r in interarrival_stats(df).collect()}
    assert set(out) == {1}
    u1 = out[1]
    assert u1["n_gaps"] == 3 and u1["mean_gap_s"] == 60.0 and u1["std_gap_s"] == 0.0
    assert u1["cv"] == 0.0 and u1["burstiness"] == -1.0


def test_topk_per_group_cut_and_ties(spark):
    rows = [
        (1, "a", 9.0), (2, "a", 9.0), (3, "a", 5.0), (4, "a", 1.0),
        (5, "b", 2.0),
    ]
    df = spark.createDataFrame(rows, ["id", "grp", "v"])
    out = topk_per_group(df, ["grp"], "v", 2, tiebreak_cols=["id"]).collect()
    got = {(r["grp"], r["id"]): r["rank"] for r in out}
    # tie at 9.0 breaks toward smaller id; row 3 misses the cut
    assert got == {("a", 1): 1, ("a", 2): 2, ("b", 5): 1}


def test_topk_ascending(spark):
    df = spark.createDataFrame([(1, "a", 3.0), (2, "a", 1.0)], ["id", "grp", "v"])
    out = topk_per_group(df, ["grp"], "v", 1, descending=False, tiebreak_cols=["id"]).collect()
    assert [(r["id"], r["rank"]) for r in out] == [(2, 1)]


def test_zipf_exact_powerlaw_fits_perfectly(spark):
    # construct freq = 12, 6, 4, 3 for ranks 1..4 -> y = ln12 - 1*ln(rank)?
    # use an exact slope -1 law: f(r) = 12/r -> 12, 6, 4, 3
    words = []
    for w, f in (("aa", 12), ("bb", 6), ("cc", 4), ("dd", 3)):
        words += [w] * f
    df = spark.createDataFrame([(" ".join(words),)], ["text"])
    row = zipf_fit(df).collect()[0]
    assert row["n_types"] == 4 and row["n_tokens"] == 25
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=1e-6)
    assert row["intercept"] == pytest.approx(math.log(12), abs=1e-6)
    assert row["r2"] == pytest.approx(1.0, abs=1e-6)


def test_zipf_degenerate_single_type(spark):
    df = spark.createDataFrame([("same same same",)], ["text"])
    row = zipf_fit(df).collect()[0]
    assert row["n_types"] == 1 and row["zipf_slope"] is None and row["r2"] is None


def test_abc_classes_and_cumshare(spark):
    from cm_well_spark.operators.aggregations import abc_analysis

    # totals 70, 20, 6, 4 -> grand 100; before-shares 0, .7, .9, .96
    rows = [("a", 70.0), ("b", 20.0), ("c", 6.0), ("d", 4.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {r["k"]: r for r in abc_analysis(df, "k", "v").collect()}
    assert out["a"]["abc_class"] == "A"  # before 0.0 < 0.8
    assert out["b"]["abc_class"] == "A"  # before 0.7 < 0.8 (completes A)
    assert out["c"]["abc_class"] == "B"  # before 0.9 < 0.95
    assert out["d"]["abc_class"] == "C"  # before 0.96
    assert out["b"]["cum_share"] == pytest.approx(0.9)
    assert out["d"]["cum_share"] == pytest.approx(1.0)


def test_winsorize_clips_not_drops(spark):
    from cm_well_spark.operators.curation import winsorize

    rows = [("en", float(v)) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, ["lang", "v"])
    out = winsorize(df, "v", by="lang", lower=0.05, upper=0.95).collect()
    assert len(out) == 100  # nothing dropped
    vals = sorted(r["v_winsorized"] for r in out)
    # exact interpolated percentiles of 1..100 at .05/.95 are 5.95/95.05
    assert vals[0] == pytest.approx(5.95)
    assert vals[-1] == pytest.approx(95.05)
    # interior values untouched
    assert any(r["v"] == 50.0 and r["v_winsorized"] == 50.0 for r in out)


def test_gini_even_and_concentrated(spark):
    from cm_well_spark.operators.aggregations import gini_coefficient

    # perfectly even: 4 users x 5 events -> G = 0
    even = spark.createDataFrame([(u,) for u in range(4) for _ in range(5)], ["u"])
    assert gini_coefficient(even, "u").collect()[0]["gini"] == 0.0
    # one user owns everything except single events: high G
    rows = [(0,)] * 97 + [(1,), (2,), (3,)]
    conc = spark.createDataFrame(rows, ["u"])
    row = gini_coefficient(conc, "u").collect()[0]
    # exact rank-sum: x = [1,1,1,97]; G = 2*(1+2+3+4*97)/(4*100) - 5/4
    assert row["gini"] == pytest.approx(2 * (1 + 2 + 3 + 4 * 97) / 400 - 1.25, abs=1e-6)
    assert row["n_entities"] == 4 and row["total"] == 100.0
