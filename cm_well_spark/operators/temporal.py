"""Temporal operators: as-of (backward) join.

Spark has no ASOF JOIN physical operator (DuckDB/kdb/Pandas `merge_asof`
do); the composition that scales is the union + running-last window:

    tag left/right, union on the key, sort each key partition by
    (timestamp, right-before-left), carry the latest right payload
    forward with last(ignorenulls) — every left row then holds the most
    recent right row at-or-before its timestamp.

One shuffle on the join key; the sort rides the shuffle. That beats the
range-join alternative (`l.ts >= r.ts` non-equi join explodes to
|l|x|r| per key before aggregation) and never materializes candidate
pairs — at 100 TB the cost is the same as any keyed window. Skewed keys
take the standard salting treatment upstream if a single entity owns a
disproportionate share of both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    `right_ts` <= `left_ts` within the same `on` key (backward as-of; a
    right row at exactly `left_ts` matches). Returns the left columns
    plus `right_cols`.

    `how`: 'inner' drops left rows with no earlier right row; 'left'
    keeps them with nulls.

    Ties inside `right` (same key + timestamp) resolve to the row that
    sorts last in the union — pre-aggregate the right side to one row
    per (key, ts) when a deterministic winner matters (the registry
    entry shows the max_by recipe both engines agree on)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    lcols = [c for c in left.columns]
    mixed = l.select(on, "__t", "__side", "__payload", *[c for c in lcols if c != on]).unionByName(
        r, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = mixed.withColumn("__m", F.last("__payload", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )
    if how == "inner":
        matched = matched.where(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError("how must be 'inner' or 'left'")
    return matched.select(
        *lcols, *[F.col("__m")[c].alias(c) for c in right_cols]
    )
