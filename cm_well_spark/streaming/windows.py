"""Watermarked windowed aggregation over event streams.

The streaming twin of aggregations.py's tumbling-window rollup: counts
and sums per (time window, event type) with a watermark bounding state —
late events beyond the horizon are DROPPED by the engine (the documented
at-most-late contract), and closed windows age out of the state store,
so an always-on rollup holds state proportional to the horizon, not the
stream's lifetime.

Output-mode contract: in `append` mode a window emits once, when the
watermark passes its end (exactly-once materialization for downstream
sinks); `complete` re-emits the full rollup each batch (for memory-sink
parity checks). Both are the engine's semantics — this module only
declares the aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_window_counts(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-(tumbling window, type) event counts and value sums with
    bounded state. Columns: window_start (formatted), event_type, n,
    total — identical to the batch rollup over the same data, which the
    registry oracle pins."""
    w = F.window(F.col(ts_col), window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w, F.col(type_col))
        .agg(F.count("*").alias("n"), F.round(F.sum(value_col), 2).alias("total"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            type_col,
            "n",
            "total",
        )
    )
