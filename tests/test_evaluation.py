"""classification_report / confusion_matrix — hand-checked metrics."""

import pytest

from cm_well_spark.operators.evaluation import classification_report, confusion_matrix


@pytest.fixture(scope="module")
def preds(spark):
    rows = [
        # gold a: 2 right, 1 called b
        ("a", "a"), ("a", "a"), ("a", "b"),
        # gold b: 1 right, 1 called c (c is never a gold label)
        ("b", "b"), ("b", "c"),
    ]
    return spark.createDataFrame(rows, ["label", "pred"])


def test_confusion_counts(preds):
    got = {(r["label"], r["pred"]): r["n"] for r in confusion_matrix(preds, "label", "pred").collect()}
    assert got == {("a", "a"): 2, ("a", "b"): 1, ("b", "b"): 1, ("b", "c"): 1}


def test_report_metrics_and_class_union(preds):
    got = {r["cls"]: r for r in classification_report(preds, "label", "pred").collect()}
    a = got["a"]
    assert (a["tp"], a["fp"], a["fn"]) == (2, 0, 1)
    assert a["precision"] == 1.0
    assert a["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert a["f1"] == pytest.approx(0.8, abs=1e-6)
    b = got["b"]
    assert (b["tp"], b["fp"], b["fn"]) == (1, 1, 1)
    assert b["precision"] == 0.5 and b["recall"] == 0.5 and b["f1"] == 0.5
    # hallucinated class: precision defined (0), recall NULL (no support)
    c = got["c"]
    assert (c["tp"], c["fp"], c["fn"]) == (0, 1, 0)
    assert c["precision"] == 0.0 and c["recall"] is None and c["f1"] is None


def test_report_never_predicted_class(spark):
    df = spark.createDataFrame([("x", "y"), ("x", "y")], ["label", "pred"])
    got = {r["cls"]: r for r in classification_report(df, "label", "pred").collect()}
    # x never predicted: precision NULL, recall 0
    assert got["x"]["precision"] is None and got["x"]["recall"] == 0.0
    assert got["x"]["f1"] is None
