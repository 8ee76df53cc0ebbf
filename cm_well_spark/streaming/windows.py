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


def streaming_session_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Streaming gap-based sessionization — the readStream twin of
    aggregations.session_window_agg, SAME session_window expression and
    output columns, plus a watermark so open sessions close and age out
    of the state store once the watermark passes (session end = last
    event + gap; state is bounded by the horizon + open sessions, not
    the stream's lifetime). In append mode a session emits exactly once,
    when it can no longer grow — the contract a downstream sessions
    table wants. Batch backfill and live sessionization stay one
    definition; the pytest pins batch/stream parity on the same data."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), w)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum(val_col), 2).alias("sum_value"))
        .select(
            key,
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_trending_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The streaming half of the trending-top-k pair: watermarked
    per-(window, type) counts in append mode. Ranking is NOT done here —
    non-time window functions aren't allowed on a streaming frame — it
    happens per micro-batch in trending_topk_batch, which is CORRECT
    because append mode emits a closed window's rows exactly once and
    all together (when the watermark passes its end), so every batch
    holds only complete windows."""
    w = F.window(F.col(ts_col), window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w, F.col(type_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:00").alias("window_start"),
            type_col,
            "n_events",
        )
    )


def trending_topk_batch(batch: DataFrame, k: int = 3, type_col: str = "event_type") -> DataFrame:
    """foreachBatch ranker for streaming_trending_counts: top-k per
    closed window with the same (count desc, key asc) tie-break as the
    batch aggregations.trending_topk — one window function over the
    already-reduced per-window counts."""
    from pyspark.sql import Window

    rk = Window.partitionBy("window_start").orderBy(F.desc("n_events"), F.asc(type_col))
    return batch.withColumn("rank", F.row_number().over(rk)).where(F.col("rank") <= k)


def streaming_ohlc(
    stream: DataFrame,
    window: str = "1 day",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Streaming OHLC downsampling — the readStream twin of
    temporal.ohlc_downsample: SAME tumbling window, SAME
    min_by/max_by-over-composite-key open/close (deterministic under
    same-instant ties), SAME output columns, plus a watermark so closed
    buckets emit once (append mode) and age out of the state store.
    min_by/max_by are ordinary typed aggregates, so streaming state per
    (key, window) is one running (order-key, value) pair per side —
    O(1), not the bucket's events. Batch backfill and the live candle
    feed stay one definition; pytest pins batch/stream parity."""
    from cm_well_spark.operators.temporal import composite_order_key

    okey = composite_order_key(ts_col, tiebreak_col)
    w = F.window(F.col(ts_col), window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), w)
        .agg(
            F.round(F.min_by(value_col, okey), 6).alias("open"),
            F.round(F.max(value_col), 6).alias("high"),
            F.round(F.min(value_col), 6).alias("low"),
            F.round(F.max_by(value_col, okey), 6).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            key_col,
            F.date_format("window.start", "yyyy-MM-dd HH:mm").alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )
