"""kaplan_meier and balanced_sample semantics on hand fixtures."""

import pytest
from pyspark.sql import functions as F

from cm_well_spark.operators.curation import balanced_sample
from cm_well_spark.operators.temporal import kaplan_meier


def test_km_textbook_curve(spark):
    # classic toy: events at t=1 (1 of 5), t=3 (1 of 3); censored at t=2, 4, 5
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)]
    df = spark.createDataFrame(rows, ["duration", "observed"])
    out = {r["duration"]: r for r in kaplan_meier(df).collect()}
    assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 1
    assert out[1]["survival"] == pytest.approx(0.8, abs=1e-6)
    # censoring at t=2 shrinks the t=3 risk set to 3
    assert out[3]["n_risk"] == 3
    assert out[3]["survival"] == pytest.approx(0.8 * (2 / 3), abs=1e-6)
    # censored-only times keep the running survival
    assert out[4]["survival"] == out[3]["survival"]
    assert out[2]["n_censored"] == 1 and out[2]["n_events"] == 0


def test_km_all_die_reaches_zero_and_stays(spark):
    df = spark.createDataFrame([(1, 1), (1, 1), (2, 1)], ["duration", "observed"])
    out = {r["duration"]: r for r in kaplan_meier(df).collect()}
    assert out[1]["survival"] == pytest.approx(1 / 3, abs=1e-6)
    # last factor is 1 - 1/1 = 0: survival must be exactly 0, not NULL
    assert out[2]["survival"] == 0.0


def test_km_ties_same_duration_counted_once(spark):
    df = spark.createDataFrame([(5, 1), (5, 1), (5, 0), (7, 0)], ["duration", "observed"])
    out = {r["duration"]: r for r in kaplan_meier(df).collect()}
    assert out[5]["n_events"] == 2 and out[5]["n_censored"] == 1
    assert out[5]["n_risk"] == 4
    assert out[5]["survival"] == pytest.approx(0.5, abs=1e-6)


def _docs(spark):
    rows = [(i, "big") for i in range(10)] + [(100 + i, "small") for i in range(3)]
    return spark.createDataFrame(rows, ["doc_id", "lang"])


def test_balanced_sample_defaults_to_min_class(spark):
    out = balanced_sample(_docs(spark), "lang", "doc_id").collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by["big"]) == 3 and len(by["small"]) == 3
    # deterministic: same subset on re-run
    out2 = balanced_sample(_docs(spark), "lang", "doc_id").collect()
    assert {r["doc_id"] for r in out2} == {r["doc_id"] for r in out}


def test_balanced_sample_explicit_target_keeps_small_classes_whole(spark):
    out = balanced_sample(_docs(spark), "lang", "doc_id", n_per_class=5).collect()
    langs = [r["lang"] for r in out]
    assert langs.count("big") == 5 and langs.count("small") == 3


def test_balanced_sample_salt_changes_subset(spark):
    a = {r["doc_id"] for r in balanced_sample(_docs(spark), "lang", "doc_id", n_per_class=5).collect()}
    b = {r["doc_id"] for r in balanced_sample(_docs(spark), "lang", "doc_id", n_per_class=5, salt="other").collect()}
    assert a != b  # 10-choose-5 collision under a different salt is ~0


def test_balanced_sample_empty_input(spark):
    empty = _docs(spark).where(F.lit(False))
    assert balanced_sample(empty, "lang", "doc_id").count() == 0
