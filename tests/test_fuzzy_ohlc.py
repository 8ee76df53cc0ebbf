"""edit_distance_pairs (deletion-neighborhood fuzzy self-join) and
ohlc_downsample: semantics pinned on hand fixtures."""

import datetime as dt

import pytest

from cm_well_spark.operators.fuzzy import edit_distance_pairs
from cm_well_spark.operators.temporal import ohlc_downsample


def _words(spark, ws):
    return spark.createDataFrame([(w,) for w in ws], ["w"])


def test_finds_substitution_insertion_deletion(spark):
    ws = _words(spark, ["table", "tuble", "tables", "able", "chair"])
    got = {(r["a"], r["b"]): r["dist"] for r in edit_distance_pairs(ws).collect()}
    assert got[("table", "tuble")] == 1  # substitution
    assert got[("table", "tables")] == 1  # insertion
    assert got[("able", "table")] == 1  # deletion
    assert not any("chair" in p for p in got)
    # d(able, tables)=2 must NOT appear at max_dist=1
    assert ("able", "tables") not in got


def test_distance_two_neighborhood(spark):
    ws = _words(spark, ["kitten", "sitten", "sittin", "mittens"])
    got = {(r["a"], r["b"]): r["dist"] for r in edit_distance_pairs(ws, max_dist=2).collect()}
    assert got[("kitten", "sittin")] == 2
    assert got[("kitten", "sitten")] == 1
    assert got[("mittens", "sitten")] == 2


def test_exact_duplicates_collapse_not_paired(spark):
    # distinct() upstream: equal strings are one vocab entry, never a pair
    ws = _words(spark, ["same", "same", "samey"])
    rows = edit_distance_pairs(ws).collect()
    assert {(r["a"], r["b"]) for r in rows} == {("same", "samey")}


def test_min_len_and_bucket_cap(spark):
    # "a" and "b" share the empty-string deletion variant; min_len drops them
    ws = _words(spark, ["a", "b", "word", "ward"])
    assert {(r["a"], r["b"]) for r in edit_distance_pairs(ws).collect()} == {
        ("ward", "word")
    }
    # a bucket cap of 1 kills every shared variant -> no candidates at all
    assert edit_distance_pairs(ws, max_bucket=1).count() == 0


def test_rejects_large_distance(spark):
    with pytest.raises(ValueError):
        edit_distance_pairs(_words(spark, ["x"]), max_dist=3)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_ohlc_tie_breaks_on_event_id(spark):
    ev = spark.createDataFrame(
        [
            # same instant: open must be event 1's value, by id
            (1, _ts("2024-01-01 00:00:00"), "m", 10.0),
            (2, _ts("2024-01-01 00:00:00"), "m", 99.0),
            (3, _ts("2024-01-01 12:00:00"), "m", 1.0),
            (4, _ts("2024-01-01 23:00:00"), "m", 50.0),
            # next day, single event
            (5, _ts("2024-01-02 05:00:00"), "m", 7.0),
        ],
        ["event_id", "ts", "event_type", "value"],
    )
    rows = {r["bucket"]: r for r in ohlc_downsample(ev, window="1 day").collect()}
    d1 = rows["2024-01-01 00:00"]
    assert (d1["open"], d1["high"], d1["low"], d1["close"], d1["n"]) == (
        10.0,
        99.0,
        1.0,
        50.0,
        4,
    )
    d2 = rows["2024-01-02 00:00"]
    assert d2["open"] == d2["close"] == 7.0 and d2["n"] == 1


def test_fuzzy_clusters_transitive_and_singletons(spark):
    from cm_well_spark.operators.fuzzy import fuzzy_clusters

    # chain: cat ~ bat ~ bad (transitive closure into one cluster),
    # plus an isolated word
    ws = _words(spark, ["cat", "bat", "bad", "zebra"])
    got = {r["w"]: r for r in fuzzy_clusters(ws, min_len=2).collect()}
    assert got["cat"]["cluster"] == got["bat"]["cluster"] == got["bad"]["cluster"] == "bad"
    assert got["cat"]["cluster_size"] == 3
    assert got["zebra"]["cluster"] == "zebra" and got["zebra"]["cluster_size"] == 1


def test_fuzzy_clusters_total_mapping(spark):
    from cm_well_spark.operators.fuzzy import fuzzy_clusters

    ws = _words(spark, ["alpha", "alphas", "beta", "a"])  # "a" below min_len
    rows = fuzzy_clusters(ws, min_len=2).collect()
    assert {r["w"] for r in rows} == {"alpha", "alphas", "beta"}
