"""association_rules, rfm_segments, scd2_intervals — hand fixtures."""

import datetime as dt

import pytest

from cm_well_spark.operators.aggregations import association_rules, rfm_segments
from cm_well_spark.operators.temporal import scd2_intervals


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_association_rules_counts_and_lift(spark):
    # baskets: {A,B,C}, {A,B}, {A,C}, {B} -> AB=2, AC=2, BC=1
    rows = [
        (1, "A"), (1, "B"), (1, "C"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "B"),
        (2, "A"),  # duplicate membership collapses
    ]
    df = spark.createDataFrame(rows, ["bkt", "item"])
    out = {(r["a"], r["b"]): r for r in association_rules(df, "bkt", "item").collect()}
    assert set(out) == {("A", "B"), ("A", "C")}  # BC pruned at min_pair_count=2
    ab = out[("A", "B")]
    assert ab["support_count"] == 2
    # n(A)=3, n(B)=3, total baskets 4: conf 2/3 both ways, lift 2*4/9
    assert ab["confidence_ab"] == pytest.approx(2 / 3, abs=1e-6)
    assert ab["confidence_ba"] == pytest.approx(2 / 3, abs=1e-6)
    assert ab["lift"] == pytest.approx(8 / 9, abs=1e-6)
    ac = out[("A", "C")]
    # n(C)=2 -> conf C->A = 1.0, lift 2*4/6 > 1
    assert ac["confidence_ba"] == pytest.approx(1.0)
    assert ac["lift"] == pytest.approx(4 / 3, abs=1e-6)


def test_rfm_scores_best_first(spark):
    rows = [
        # cust 1: recent, frequent, big spender
        (101, 1, _ts("2024-03-01"), 100.0),
        (102, 1, _ts("2024-03-10"), 100.0),
        # cust 2: stale, single small order
        (103, 2, _ts("2024-01-01"), 5.0),
        # cust 3: middle
        (104, 3, _ts("2024-02-01"), 50.0),
    ]
    df = spark.createDataFrame(rows, ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = {r["o_custkey"]: r for r in rfm_segments(df, n_bins=3).collect()}
    assert out[1]["recency_days"] == 0 and out[2]["recency_days"] == 69
    assert out[1]["frequency"] == 2 and out[1]["monetary"] == 200.0
    # best-first: cust 1 scores 1 on all axes; cust 2 and 3 tie on
    # frequency (1 order each) and the key tiebreak puts cust 2 first
    assert (out[1]["r"], out[1]["f"], out[1]["m"]) == (1, 1, 1)
    assert (out[2]["r"], out[2]["f"], out[2]["m"]) == (3, 2, 3)
    assert (out[3]["r"], out[3]["f"], out[3]["m"]) == (2, 3, 2)


def test_scd2_chains_and_tiebreak(spark):
    rows = [
        # key A: two same-instant versions chain by uuid, then a later one
        ("A", _ts("2024-01-01 00:00:00"), "u1"),
        ("A", _ts("2024-01-01 00:00:00"), "u2"),
        ("A", _ts("2024-02-01 00:00:00"), "u3"),
        ("B", _ts("2024-01-15 00:00:00"), "u4"),
    ]
    df = spark.createDataFrame(rows, ["path", "lastModified", "uuid"])
    out = {r["uuid"]: r for r in scd2_intervals(df).collect()}
    assert out["u1"]["version_seq"] == 1 and out["u2"]["version_seq"] == 2
    # same-instant successor: u1's interval closes at the SAME timestamp
    assert out["u1"]["valid_to"] == out["u2"]["valid_from"]
    assert out["u2"]["valid_to"] == "2024-02-01 00:00:00.000000"
    assert out["u3"]["is_last"] and out["u3"]["valid_to"] is None
    assert out["u4"]["is_last"] and out["u4"]["version_seq"] == 1
    assert not out["u1"]["is_last"] and not out["u2"]["is_last"]
