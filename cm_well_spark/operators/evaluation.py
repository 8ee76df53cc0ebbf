"""Classifier evaluation over DataFrame predictions.

The pipeline side ships scorers (lang_id, quality/classifier scores,
calibration curves, ANN recall@k); what closes the loop is the
evaluation harness that compares predictions against gold labels AT
CORPUS SCALE — a confusion matrix and per-class precision/recall/F1
computed as keyed aggregates, so "evaluate the language classifier on
the whole crawl" is one job, not a pandas sample.

Scale shape: everything reduces to the |labels| x |preds| confusion
relation first (ONE keyed count over the joined predictions); per-class
metrics are two more keyed sums over that reduced relation. No window
touches raw rows, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """(label, pred, n) counts — the raw confusion relation, reduced
    from any number of rows to |labels| x |preds|."""
    return df.groupBy(
        F.col(label_col).alias("label"), F.col(pred_col).alias("pred")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def classification_report(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class evaluation -> (class, tp, fp, fn, precision, recall,
    f1): classes are the UNION of observed labels and predictions (a
    class the model never predicts still reports recall; a hallucinated
    class still reports precision). Metrics are NULL where their
    denominator is 0 (no support / never predicted), never silently 0 —
    the distinction matters when a class is missing from the eval
    slice. 6dp rounding keeps the report engine-replayable."""
    cm = confusion_matrix(df, label_col, pred_col)
    tp = (
        cm.where(F.col("label") == F.col("pred"))
        .select(F.col("label").alias("cls"), F.col("n").alias("tp"))
    )
    by_label = cm.groupBy(F.col("label").alias("cls")).agg(
        F.sum("n").cast("long").alias("__support")
    )
    by_pred = cm.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("n").cast("long").alias("__predicted")
    )
    classes = by_label.join(by_pred, "cls", "full_outer").select(
        "cls",
        F.coalesce("__support", F.lit(0)).alias("__support"),
        F.coalesce("__predicted", F.lit(0)).alias("__predicted"),
    )
    out = classes.join(tp, "cls", "left").select(
        "cls",
        F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        (F.col("__predicted") - F.coalesce("tp", F.lit(0))).cast("long").alias("fp"),
        (F.col("__support") - F.coalesce("tp", F.lit(0))).cast("long").alias("fn"),
        F.col("__support"),
        F.col("__predicted"),
    )
    precision = F.when(F.col("__predicted") > 0, F.col("tp") / F.col("__predicted"))
    recall = F.when(F.col("__support") > 0, F.col("tp") / F.col("__support"))
    f1 = F.when(
        precision.isNotNull() & recall.isNotNull() & ((precision + recall) > 0),
        2 * precision * recall / (precision + recall),
    )
    return out.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
