"""Round-9 third tranche: link prediction, Markov transitions, rolling
range-frame trails, rollup/pivot OLAP aggregates — hand-computed
fixtures pin the semantics the sf0.01 oracles check at scale."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from cm_well_spark.operators.aggregations import pivot_counts, rollup_metrics
from cm_well_spark.operators.graph import link_prediction
from cm_well_spark.operators.temporal import markov_transitions, rolling_window_agg


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- graph


@pytest.fixture(scope="module")
def path_graph(spark):
    # a - b - c - d path plus an e pendant on b:
    #   common neighbor of (a, c) is b (deg 3); of (b, d) is c (deg 2);
    #   (a, e) and (c, e) share b too. No pair is adjacent twice.
    return spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "e")], ["src", "dst"]
    )


def test_link_prediction_scores(spark, path_graph):
    rows = {(r["a"], r["b"]): r for r in link_prediction(path_graph).collect()}
    # candidates: pairs at distance 2 exactly
    assert set(rows) == {("a", "c"), ("a", "e"), ("c", "e"), ("b", "d")}
    ac = rows[("a", "c")]
    assert ac["common_neighbors"] == 1
    assert ac["adamic_adar"] == pytest.approx(1.0 / math.log(3), abs=1e-6)
    # deg(a)=1, deg(c)=2, cn=1 -> jaccard 1/(1+2-1)
    assert ac["jaccard"] == pytest.approx(0.5, abs=1e-6)
    bd = rows[("b", "d")]
    assert bd["adamic_adar"] == pytest.approx(1.0 / math.log(2), abs=1e-6)
    # existing edges never appear
    assert ("a", "b") not in rows and ("b", "c") not in rows


def test_link_prediction_apex_cap_drops_hub_wedges(spark, path_graph):
    # capping apex degree at 2 removes b (deg 3) as a shared neighbor:
    # only the (b, d) pair (apex c, deg 2) survives
    rows = link_prediction(path_graph, max_apex_degree=2).collect()
    assert {(r["a"], r["b"]) for r in rows} == {("b", "d")}


def test_link_prediction_triangle_has_no_candidates(spark):
    tri = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("x", "z")], ["src", "dst"]
    )
    assert link_prediction(tri).count() == 0


# ------------------------------------------------------------- temporal


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: view -> click -> view
        (1, 10, _ts("2024-01-01 10:00:00"), "view", 1.0),
        (2, 10, _ts("2024-01-01 10:30:00"), "click", 2.0),
        (3, 10, _ts("2024-01-01 11:15:00"), "view", 4.0),
        # user 2: a same-instant tie broken by event_id: view(4) -> click(5)
        (4, 20, _ts("2024-01-01 09:00:00"), "view", 8.0),
        (5, 20, _ts("2024-01-01 09:00:00"), "click", 16.0),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    )


def test_markov_transitions_counts_and_probs(events):
    out = {
        (r["prev_type"], r["next_type"]): r
        for r in markov_transitions(events).collect()
    }
    # user1 contributes view->click, click->view; user2 view->click
    assert out[("view", "click")]["n"] == 2
    assert out[("click", "view")]["n"] == 1
    assert out[("view", "click")]["prob"] == pytest.approx(1.0)
    assert set(out) == {("view", "click"), ("click", "view")}


def test_rolling_trail_window_inclusive_boundary(events):
    got = {
        r["event_id"]: r for r in rolling_window_agg(events, span="1 hour").collect()
    }
    # event 2 at 10:30 sees event 1 (10:00, inside 1h) -> n=2, sum=3
    assert got[2]["n_trail"] == 2 and got[2]["sum_trail"] == pytest.approx(3.0)
    # event 3 at 11:15 sees 10:30 but NOT 10:00 (75 min ago) -> n=2
    assert got[3]["n_trail"] == 2 and got[3]["sum_trail"] == pytest.approx(6.0)
    # same-instant rows share one RANGE frame in both directions
    assert got[4]["n_trail"] == 2 and got[5]["n_trail"] == 2
    assert got[4]["sum_trail"] == pytest.approx(24.0)


def test_rolling_trail_rejects_unknown_span(events):
    with pytest.raises(ValueError):
        rolling_window_agg(events, span="3 fortnights")


# ----------------------------------------------------------------- OLAP


@pytest.fixture(scope="module")
def sales(spark):
    return spark.createDataFrame(
        [
            ("hi", "F", 10.0),
            ("hi", "O", 20.0),
            ("lo", "F", 5.0),
            ("lo", "F", 7.0),
        ],
        ["prio", "status", "price"],
    )


def test_rollup_levels_and_gid(sales):
    rows = rollup_metrics(sales, ["prio", "status"], "price").collect()
    by_key = {(r["prio"], r["status"]): r for r in rows}
    # detailed level, gid 0
    assert by_key[("lo", "F")]["n"] == 2 and by_key[("lo", "F")]["gid"] == 0
    assert by_key[("lo", "F")]["total"] == pytest.approx(12.0)
    # prio subtotal, gid 1 (status rolled away)
    assert by_key[("hi", None)]["n"] == 2 and by_key[("hi", None)]["gid"] == 1
    # grand total, gid 3
    assert by_key[(None, None)]["n"] == 4
    assert by_key[(None, None)]["total"] == pytest.approx(42.0)
    assert by_key[(None, None)]["gid"] == 3
    assert len(rows) == 3 + 2 + 1  # detailed + prio level + total


def test_pivot_explicit_values_zero_fill(sales):
    rows = {r["prio"]: r for r in pivot_counts(sales, "prio", "status", ["F", "O", "P"]).collect()}
    assert rows["hi"]["n_f"] == 1 and rows["hi"]["n_o"] == 1 and rows["hi"]["n_p"] == 0
    assert rows["lo"]["n_f"] == 2 and rows["lo"]["n_o"] == 0 and rows["lo"]["n_p"] == 0


def test_pivot_values_outside_list_ignored(sales):
    # pivot only materializes the caller's columns; 'F' only
    rows = {r["prio"]: r for r in pivot_counts(sales, "prio", "status", ["F"]).collect()}
    assert set(rows["hi"].asDict()) == {"prio", "n_f"}
