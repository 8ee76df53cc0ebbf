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

# Offset applied to both legs of the composite order key below: 2^62 keeps
# pre-1970 (negative epoch-micros) timestamps and negative numeric ids
# rendering as non-negative fixed-width decimals, where lexicographic =
# numeric order (a raw negative long under %020d sorts reversed among
# negatives). Contract: |epoch_micros| and |id| < 2^62 — i.e. timestamps
# within astronomic range and ids below 4.6e18 — far outside any real data.
_OKEY_OFFSET = 1 << 62


def composite_order_key(ts_col: str, tiebreak_col: str) -> F.Column:
    """Scalar composite (epoch-micros, tiebreak) ORDER KEY for
    min_by/max_by: zero-padded fixed-width decimal so lexicographic =
    numeric (both engines' arg-min/arg-max aggregates take ONE scalar
    ordering column). Shared by ohlc_downsample, session_paths,
    resample_ffill and streaming.windows.streaming_ohlc (ADVICE r9:
    the key was previously inlined at each site without the negative
    guard). A non-numeric tiebreak id falls back to xxhash64 of its
    string form — an arbitrary-but-DETERMINISTIC total order, so
    same-instant ties break consistently instead of on a silently NULL
    cast; numeric ids keep exact numeric order."""
    tb = F.coalesce(
        F.col(tiebreak_col).cast("long"),
        F.xxhash64(F.col(tiebreak_col).cast("string")),
    )
    return F.format_string(
        "%020d|%020d",
        F.unix_micros(F.col(ts_col).cast("timestamp")) + F.lit(_OKEY_OFFSET),
        tb + F.lit(_OKEY_OFFSET),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    `right_ts` <= `left_ts` within the same `on` key (backward as-of; a
    right row at exactly `left_ts` matches). `direction="forward"`
    flips the match to the SMALLEST `right_ts` >= `left_ts` (next
    scheduled event, upcoming deadline, next version) — the same union
    + running-last window over the REVERSED timestamp order, so cost
    and shuffle shape are identical. Returns the left columns plus
    `right_cols`.

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
    if direction == "backward":
        order = [F.asc("__t"), F.asc("__side")]
    elif direction == "forward":
        order = [F.desc("__t"), F.asc("__side")]
    else:
        raise ValueError("direction must be 'backward' or 'forward'")
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
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


def interval_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bucket_seconds: int = 3600,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Interval-overlap join: left rows paired with every right row whose
    [right_start, right_end] interval contains left_ts (inclusive both
    ends), optionally key-scoped by `on`.

    A naive `l.ts BETWEEN r.start AND r.end` predicate is a non-equi
    join — Spark plans it as a (broadcast) nested loop, |l| x |r| work
    per key. The scale shape is TIME BUCKETING: the left row joins on
    its bucket, the right interval explodes over the buckets it spans,
    and the exact predicate re-applies as a residual filter after the
    equi-join. Each (l, r) pair meets in exactly one bucket (the left's)
    so no dedup is needed; size `bucket_seconds` near the typical
    interval span so intervals explode to O(1) buckets."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_start, right_end)]
    # buckets come from unix SECONDS (floor is monotone, so s<=t<=e implies
    # bucket(s)<=bucket(t)<=bucket(e) and the pair always meets); the
    # residual compares the ORIGINAL timestamps so sub-second precision
    # never admits a pair the exact predicate would reject
    sec_l = F.unix_timestamp(F.col(left_ts).cast("timestamp"))
    keys = [on] if on else []
    l = left.withColumn("__bkt", F.floor(sec_l / bucket_seconds))
    r = (
        right.withColumn("__s", F.col(right_start).cast("timestamp"))
        .withColumn("__e", F.col(right_end).cast("timestamp"))
        .withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col("__s")) / bucket_seconds),
                    F.floor(F.unix_timestamp(F.col("__e")) / bucket_seconds),
                )
            ),
        )
        .select(*keys, "__bkt", "__s", "__e", *right_cols)
    )
    out = l.join(r, keys + ["__bkt"], "inner").where(
        (F.col(left_ts).cast("timestamp") >= F.col("__s"))
        & (F.col(left_ts).cast("timestamp") <= F.col("__e"))
    )
    return out.select(*left.columns, *right_cols)


def funnel(
    ev: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Sequential conversion funnel -> one row per user who reached step
    1: (user, t1..tn, depth), where t_i is the EARLIEST step-i event
    STRICTLY AFTER t_{i-1} and depth counts completed steps — the
    product-analytics primitive (did view -> click -> purchase happen in
    order?), also the shape for multi-stage pipeline-latency audits.

    Plan: step 1 is one keyed min; each later step is ONE left join of
    the (one-row-per-user) funnel state against that step's events and
    ONE conditional min — min(ts WHERE ts > t_prev) — so broken funnels
    keep their row with NULL from the break onward (the left join) and
    never block earlier steps. Everything is keyed by user: n-1 joins +
    n aggregations, no windows over raw events, no per-user arrays —
    memory per task is the shuffle block, not a user's event history.
    Strictly-increasing timestamps are the contract (a same-instant
    step-2 event does NOT count); NULL propagation is automatic because
    `ts > NULL` is NULL.

    `within_seconds` time-boxes each TRANSITION (the product-analytics
    default: a purchase three weeks after the click is not conversion):
    step i only counts when t_{i-1} < t_i <= t_{i-1} + horizon — the
    same conditional min, one extra comparison, no plan change."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    cur = (
        ev.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col(type_col) == s).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        carried = [user_col] + [f"t{j}" for j in range(1, i)]
        cond = F.col("__ts") > F.col(f"t{i - 1}")
        if within_seconds is not None:
            cond = cond & (
                F.unix_micros(F.col("__ts").cast("timestamp"))
                <= F.unix_micros(F.col(f"t{i - 1}").cast("timestamp"))
                + within_seconds * 1_000_000
            )
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(*carried)
            .agg(F.min(F.when(cond, F.col("__ts"))).alias(f"t{i}"))
        )
    depth = sum(
        F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return cur.select(
        user_col,
        *[
            F.date_format(f"t{i}", fmt).alias(f"t{i}")
            for i in range(1, len(steps) + 1)
        ],
        depth.cast("int").alias("depth"),
    )


def anomaly_zscore(
    ev: DataFrame,
    window: str = "1 hour",
    trail: int = 24,
    min_trail: int = 6,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Windowed volume anomaly score -> (window_start, event_type,
    n_events, mean_trail, std_trail, zscore): each (window, type) count
    compared to the mean/stddev of that type's PREVIOUS `trail`
    OBSERVED windows (rows-between, not time-between: silent gaps don't
    dilute the baseline — documented contract). The ops-side curation
    signal: crawler stalls, log floods, and ingest bursts surface as
    |z| spikes without any model state.

    Plan: one windowed count over raw events (partial-aggregated), then
    lag-window mean/std over the REDUCED per-type series — the trailing
    window partitions by type and its length is bounded by the time
    span / window size, never by event volume. zscore is NULL until
    `min_trail` windows of history exist or when the trailing std is 0
    (constant baseline: anomaly is undefined, not infinite). Round-6
    floats keep the whole thing engine-replayable."""
    counts = (
        ev.groupBy(F.window(ts_col, window).alias("w"), type_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            type_col,
            "n_events",
        )
    )
    trail_w = (
        Window.partitionBy(type_col)
        .orderBy("window_start")
        .rowsBetween(-trail, -1)
    )
    mean = F.avg("n_events").over(trail_w)
    std = F.stddev_samp(F.col("n_events").cast("double")).over(trail_w)
    hist = F.count(F.lit(1)).over(trail_w)
    z = F.when(
        (hist >= min_trail) & std.isNotNull() & (std != 0),
        (F.col("n_events") - mean) / std,
    )
    return counts.select(
        "window_start",
        type_col,
        "n_events",
        F.round(mean, 6).alias("mean_trail"),
        F.round(std, 6).alias("std_trail"),
        F.round(z, 6).alias("zscore"),
    )


def cohort_retention(
    ev: DataFrame,
    period: str = "1 week",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention matrix -> (cohort, period_offset, n_active,
    retention): users grouped by the period of their FIRST event; for
    each later period, how many (and what fraction) were active again —
    the standard engagement decay table, and for corpus work the
    contributor-retention view of a crawl/feed (do sources that appear
    in week N still emit in week N+k?).

    Plan: one keyed min (first event per user) joined back to the
    events (both keyed by user), then one distinct-count per (cohort,
    offset) and one broadcast-joinable cohort-size relation for the
    denominator. Period bucketing uses window(ts, period) starts, so
    offsets count whole periods from the COHORT period start; the whole
    thing is three keyed aggregates and two joins, no windows over raw
    events. Deterministic, hence oracle-replayable."""
    w0 = F.window(ts_col, period)
    firsts = ev.groupBy(user_col).agg(F.min(ts_col).alias("__first"))
    cohorts = firsts.select(
        user_col,
        F.window(F.col("__first"), period).start.alias("__cstart"),
    )
    tagged = ev.join(cohorts, user_col).select(
        user_col,
        F.col("__cstart"),
        w0.start.alias("__pstart"),
        # period length in seconds, read off the window itself (no
        # hand-parsed interval strings)
        (F.unix_timestamp(w0.end) - F.unix_timestamp(w0.start)).alias("__plen"),
    )
    active = (
        tagged.groupBy("__cstart", "__pstart", "__plen")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
        .withColumn(
            "period_offset",
            F.floor(
                (F.unix_timestamp("__pstart") - F.unix_timestamp("__cstart"))
                / F.col("__plen")
            ),
        )
    )
    # denominator: cohort size = period-0 actives (every user is active
    # in their own first period by construction)
    sizes = (
        cohorts.groupBy("__cstart")
        .agg(F.count_distinct(F.col(user_col)).alias("__size"))
    )
    return (
        active.join(F.broadcast(sizes), "__cstart")
        .select(
            F.date_format("__cstart", "yyyy-MM-dd").alias("cohort"),
            F.col("period_offset").cast("long").alias("period_offset"),
            F.col("n_active").cast("long").alias("n_active"),
            F.round(F.col("n_active") / F.col("__size"), 6).alias("retention"),
        )
    )


def markov_transitions(
    ev: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix -> (prev_type, next_type, n,
    prob): for every consecutive event pair within a user's
    time-ordered stream, how often (and with what conditional
    probability) does type X precede type Y — the behavioral-flow
    primitive behind next-action prediction, session path analysis, and
    "what breaks after an error" ops triage.

    Plan: ONE lead() window partitioned by user (frame length bounded
    by a user's history, never by corpus size — the same shape as the
    asof union window), then ONE keyed count over the (prev, next)
    pairs, which reduces to at most |types|^2 rows; the row-normalizing
    sum runs over THAT reduced relation, so the second window is
    negligible. Ordering ties break on `tiebreak_col` (event id) to
    keep the chain — and therefore the hash compare — deterministic."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    seq = ev.withColumn("__next", F.lead(type_col).over(w)).where(
        F.col("__next").isNotNull()
    )
    counts = seq.groupBy(
        F.col(type_col).alias("prev_type"), F.col("__next").alias("next_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    row = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(row), 6).alias("prob"),
    )


def rolling_window_agg(
    ev: DataFrame,
    span: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Trailing time-range aggregate per EVENT ROW -> (*id_cols, key,
    ts, n_trail, sum_trail): for every event, the count and value-sum
    of the same key's events inside [ts - span, ts] (both ends
    inclusive) — per-entity rolling rate/exposure features (requests in
    the last hour, spend in the last day) computed exactly, not on a
    tumbling grid.

    Plan: ONE range-frame window per key ordered by MICROSECOND epoch —
    a range frame is defined by the ordering VALUE, so same-instant
    rows share one frame and the result is deterministic under any
    physical tie order (a rows-frame would not be). Partitioning is by
    the entity key: frame memory is bounded by one entity's span
    window, the shuffle is the standard keyed exchange, and no
    self-join ever materializes event pairs (the naive
    `e1.ts BETWEEN e2.ts - span AND e2.ts` range join is |per-key|^2).
    Microsecond longs, not seconds: sub-second timestamps make
    second-truncated boundaries admit rows an exact engine rejects."""
    span_us = {
        "1 hour": 3_600_000_000,
        "1 day": 86_400_000_000,
        "1 minute": 60_000_000,
    }.get(span)
    if span_us is None:
        raise ValueError(f"unsupported span {span!r} (add it to the table)")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-span_us, 0)
    )
    return ev.select(
        *id_cols,
        key_col,
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_trail"),
        F.round(F.sum(value_col).over(w), 6).alias("sum_trail"),
    )


def ohlc_downsample(
    ev: DataFrame,
    window: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-bucket OHLC downsampling -> (key, bucket, open, high, low,
    close, n): the first/max/min/last value per (key, tumbling window) —
    the metrics-downsampling primitive (candlesticks for markets,
    rate rollups for telemetry) that turns an unbounded event stream
    into a bounded per-bucket series.

    Plan: ONE groupBy — open/close are min_by/max_by over a composite
    (epoch-micros, tiebreak) ORDER KEY so same-instant ties are
    deterministic; high/low/n ride the same partial-aggregated hash
    aggregate. No windows over raw events, no sort: the whole reduction
    is map-side combinable, which is what lets it eat 100 TB of events
    into |keys| x |buckets| rows. The order key is a zero-padded string
    (lexicographic = numeric for fixed width) because both engines'
    arg-min aggregates take one scalar ordering column — see
    composite_order_key for the negative-input guard."""
    okey = composite_order_key(ts_col, tiebreak_col)
    return (
        ev.groupBy(
            key_col, F.window(ts_col, window).start.alias("__b")
        )
        .agg(
            F.round(F.min_by(value_col, okey), 6).alias("open"),
            F.round(F.max(value_col), 6).alias("high"),
            F.round(F.min(value_col), 6).alias("low"),
            F.round(F.max_by(value_col, okey), 6).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            key_col,
            F.date_format("__b", "yyyy-MM-dd HH:mm").alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


def scd2_intervals(
    versions: DataFrame,
    key_col: str = "path",
    ts_col: str = "lastModified",
    tiebreak_col: str | None = "uuid",
) -> DataFrame:
    """Version history -> SCD-type-2 validity intervals: every version
    row gains (valid_from, valid_to, version_seq, is_last), where
    valid_to is the NEXT version's timestamp (NULL while the version is
    the open, latest one) — the slowly-changing-dimension export that
    turns CM-Well's with-history read (S5, getInfotonHistory
    CRUDServiceFS.scala:197-228) into the interval table as-of joins
    and point-in-time queries consume.

    Plan: ONE lead() window per key — frame bounded by a key's version
    count, shuffle keyed by the entity, no self-join of history against
    itself (the naive `h1.ts < h2.ts` min-lookup is quadratic per key).
    Ordering ties break on `tiebreak_col` so same-instant writes chain
    deterministically; pass None only when (key, ts) is known unique."""
    order = [F.col(ts_col).cast("timestamp")]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return versions.select(
        "*",
        F.date_format(F.col(ts_col).cast("timestamp"), fmt).alias("valid_from"),
        F.date_format(
            F.lead(F.col(ts_col).cast("timestamp")).over(w), fmt
        ).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version_seq"),
        F.lead(F.col(ts_col).cast("timestamp")).over(w).isNull().alias("is_last"),
    )


def kaplan_meier(
    durations: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
) -> DataFrame:
    """Kaplan-Meier survival estimate -> (duration, n_risk, n_events,
    n_censored, survival) over per-subject (duration, observed 0/1)
    rows (Kaplan & Meier 1958): the right-censoring-correct answer to
    "how long until users convert / sources go stale / documents get
    superseded", where subjects that never experienced the event still
    inform the at-risk denominator up to their censoring time.

    Plan: ONE keyed count reduces subjects to one row per distinct
    duration (d_i events, c_i censored); everything after runs over
    that REDUCED relation — at-risk counts from a cumulative lag
    window, the survival product as exp(cumsum(ln(1 - d/n))) with an
    explicit zero-factor flag (once a factor hits 0 survival is 0
    forever; ln would NULL out and a NULL-skipping sum would silently
    resurrect the curve). The only global windows order the distinct-
    duration table — bounded by time resolution, not subject count."""
    g = durations.groupBy(F.col(duration_col).alias("duration")).agg(
        F.sum(F.when(F.col(observed_col).cast("int") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_events"),
        F.sum(F.when(F.col(observed_col).cast("int") == 1, 0).otherwise(1))
        .cast("long")
        .alias("n_censored"),
    )
    total_w = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    prev_w = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, -1)
    cum_w = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    out = g.withColumn(
        "n_risk",
        (
            F.sum(F.col("n_events") + F.col("n_censored")).over(total_w)
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(prev_w), F.lit(0)
            )
        ).cast("long"),
    ).withColumn(
        "__factor", F.lit(1.0) - F.col("n_events") / F.col("n_risk")
    )
    zero = F.max(F.when(F.col("__factor") <= 0.0, 1).otherwise(0)).over(cum_w)
    surv = F.when(zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(F.log(F.when(F.col("__factor") > 0, F.col("__factor")))).over(cum_w))
    )
    return out.select(
        "duration",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(surv, 6).alias("survival"),
    )


def sessionize(
    ev: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-EVENT session assignment -> every input row gains
    (session_seq, session_start): a new session starts whenever the gap
    since the user's previous event exceeds `gap` — the row-level
    complement of the windowed session aggregates
    (aggregations.session_window_agg / streaming_session_counts), and
    the building block for anything per-session downstream
    (funnel-within-session, per-session paths, session features joined
    back to events).

    Plan: ONE per-user window, two passes that ride the SAME sort —
    lag() marks session breaks, a running sum of break flags numbers
    the sessions, and a running max of session-start timestamps labels
    each row with its session's start. No session table is built and
    joined back; frame memory is one user's history. Gap semantics
    match session_window: a gap STRICTLY GREATER than `gap` breaks
    (equal-to-gap continues)."""
    gap_us = {
        "30 minutes": 1_800_000_000,
        "1 hour": 3_600_000_000,
        "5 minutes": 300_000_000,
        "1 day": 86_400_000_000,
    }.get(gap)
    if gap_us is None:
        raise ValueError(f"unsupported gap {gap!r} (add it to the table)")
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(t, F.col(tiebreak_col))
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    brk = F.when(
        F.lag(t).over(w).isNull() | ((t - F.lag(t).over(w)) > gap_us), 1
    ).otherwise(0)
    out = ev.withColumn("session_seq", F.sum(brk).over(cum).cast("long"))
    sess_w = Window.partitionBy(user_col, "session_seq")
    return out.withColumn(
        "session_start",
        F.date_format(
            F.min(F.col(ts_col).cast("timestamp")).over(sess_w),
            "yyyy-MM-dd HH:mm:ss.SSSSSS",
        ),
    )


def period_growth(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: str = "30 days",
    key_col: str | None = None,
) -> DataFrame:
    """Period-over-period growth -> (key?, period_start, total, n,
    prev_total, delta, pct_change): tumbling-window totals with the
    previous period attached — the MoM/WoW trend table every ops review
    starts from, and for corpus work the ingest-volume trend per
    source.

    Plan: ONE windowed keyed aggregate reduces facts to |keys| x
    |periods| rows; the lag window runs over THAT reduced relation
    (partitioned by key when given — the unkeyed variant's global lag
    orders a bounded period series). pct_change is NULL for the first
    period and when the previous total is 0 (growth from nothing is
    undefined, not infinite)."""
    keys = [key_col] if key_col else []
    agg = (
        df.groupBy(*keys, F.window(ts_col, period).start.alias("__p"))
        .agg(
            F.round(F.sum(value_col), 6).alias("total"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    w = (
        Window.partitionBy(*keys).orderBy("__p")
        if keys
        else Window.orderBy("__p")
    )
    prev = F.lag("total").over(w)
    return agg.select(
        *keys,
        F.date_format("__p", "yyyy-MM-dd").alias("period_start"),
        "total",
        "n",
        F.round(prev, 6).alias("prev_total"),
        F.round(F.col("total") - prev, 6).alias("delta"),
        F.round(
            F.when(prev != 0, (F.col("total") - prev) / prev), 6
        ).alias("pct_change"),
    )


def interarrival_stats(
    ev: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    tiebreak_col: str = "event_id",
    min_gaps: int = 2,
) -> DataFrame:
    """Per-entity inter-arrival statistics -> (key, n_gaps, mean_gap_s,
    std_gap_s, cv, burstiness): consecutive-event gap mean/std, the
    coefficient of variation, and the Goh-Barabási burstiness
    B = (σ - μ)/(σ + μ) (Goh & Barabási 2008) — B near -1 is a metronome
    (bot-like regularity), near 0 Poisson, toward +1 bursty human
    activity. The behavioral-fingerprint feature for bot filtering and
    crawler-trap detection.

    Plan: ONE lag window per key (microsecond epoch, id tiebreak) emits
    gaps, then ONE keyed aggregate — entities with fewer than
    `min_gaps` gaps drop (a std over one gap is noise, not signal).
    population stddev: the gap list is the entity's complete observed
    history, not a sample."""
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(t, F.col(tiebreak_col))
    gaps = ev.select(
        key_col, ((t - F.lag(t).over(w)) / 1_000_000.0).alias("__gap")
    ).where(F.col("__gap").isNotNull())
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.avg("__gap").alias("__mean"),
        F.stddev_pop("__gap").alias("__std"),
    )
    return agg.where(F.col("n_gaps") >= min_gaps).select(
        key_col,
        "n_gaps",
        F.round("__mean", 6).alias("mean_gap_s"),
        F.round("__std", 6).alias("std_gap_s"),
        F.round(
            F.when(F.col("__mean") != 0, F.col("__std") / F.col("__mean")), 6
        ).alias("cv"),
        F.round(
            F.when(
                (F.col("__std") + F.col("__mean")) != 0,
                (F.col("__std") - F.col("__mean")) / (F.col("__std") + F.col("__mean")),
            ),
            6,
        ).alias("burstiness"),
    )


def active_users(
    ev: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    wau_days: int = 7,
    mau_days: int = 30,
) -> DataFrame:
    """Active-user curves -> (day, dau, wau, mau, stickiness): distinct
    users seen that day / in the trailing `wau_days` / `mau_days`
    windows ending that day, and DAU/MAU stickiness — the engagement
    dashboard primitive, and for corpora the sources-active trend.

    Plan: ONE distinct reduces events to the (user, day) relation;
    trailing-window distincts are NOT expressible as window functions
    (count_distinct over a moving frame isn't associative), and the
    self-join alternative explodes — the scale shape is CONTRIBUTION
    EXPLODE: each (user, day) row contributes to the `mau_days` target
    days it keeps the user active for, one sequence-explode + ONE
    grouped count_distinct(user, horizon-flags) pass. Row growth is
    mau_days x the REDUCED relation (bounded, typically ~30), never
    events x days. Only days with at least one event that day appear
    (dau >= 1 by construction); the first mau_days-1 days count a
    partial window, as every trailing metric does."""
    days = ev.select(
        F.col(user_col).alias("__u"),
        F.to_date(F.col(ts_col).cast("timestamp")).alias("__d"),
    ).distinct()
    contrib = days.select(
        "__u",
        "__d",
        F.explode(
            F.sequence(F.col("__d"), F.date_add(F.col("__d"), mau_days - 1))
        ).alias("__target"),
    )
    per = contrib.groupBy(F.col("__target").alias("day")).agg(
        F.count_distinct(F.when(F.col("__d") == F.col("__target"), F.col("__u"))).alias(
            "dau"
        ),
        F.count_distinct(
            F.when(
                F.col("__target") < F.date_add(F.col("__d"), wau_days), F.col("__u")
            )
        ).alias("wau"),
        F.count_distinct("__u").alias("mau"),
    )
    # days with no same-day activity are window tails, not dashboard rows
    return (
        per.where(F.col("dau") > 0)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.col("mau").cast("long").alias("mau"),
            F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
        )
    )


def session_paths(
    ev: DataFrame,
    k: int = 10,
    max_len: int = 20,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-k session journeys -> (path, n_sessions, rank): the most
    common event-type sequences across gap-defined sessions ("view >
    click > purchase"), truncated to the first `max_len` steps — the
    user-journey rollup product analytics reads daily, built on
    sessionize's ids.

    Plan: sessionize (one per-user sort), then ONE per-session ordered
    string_agg — sort_array over the collected (order-key, type) pairs,
    bounded by the session length and truncated at `max_len` so a
    crawler-trap session cannot blow up a task — then ONE keyed count
    and a global top-k (TakeOrderedAndProject-able literal limit with
    the path string as tiebreak)."""
    s = sessionize(ev, gap=gap, ts_col=ts_col, user_col=user_col, tiebreak_col=tiebreak_col)
    okey = composite_order_key(ts_col, tiebreak_col)
    per_session = s.groupBy(user_col, "session_seq").agg(
        F.concat_ws(
            " > ",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(okey.alias("k"), F.col(type_col).alias("t")))
                    ),
                    lambda x: x["t"],
                ),
                1,
                max_len,
            ),
        ).alias("path")
    )
    counts = per_session.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    w = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= int(k))
    )


def anomaly_seasonal(
    ev: DataFrame,
    window: str = "1 hour",
    trail_periods: int = 7,
    min_trail: int = 3,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Seasonality-aware volume anomaly -> (window_start, event_type,
    n_events, mean_seasonal, std_seasonal, zscore): each (window, type)
    count compared against the SAME CLOCK SLOT of previous periods
    (hour 14 vs the last `trail_periods` day-14:00 windows) — the fix
    for anomaly_zscore's blind spot, where ordinary daily rhythm (quiet
    nights, busy noons) reads as anomaly against a flat trailing mean.

    Plan: the same ONE windowed count as anomaly_zscore, then the
    trailing mean/std window partitions by (type, slot-of-day) instead
    of type alone — identical cost, the partition key just got finer
    (and less skewed). NULL until `min_trail` same-slot windows exist
    or on a constant baseline."""
    counts = (
        ev.groupBy(F.window(ts_col, window).alias("w"), type_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("__ws"),
            type_col,
            "n_events",
            F.date_format(F.col("w.start"), "HH:mm").alias("__slot"),
        )
    )
    trail = (
        Window.partitionBy(type_col, "__slot")
        .orderBy("__ws")
        .rowsBetween(-trail_periods, -1)
    )
    mean = F.avg("n_events").over(trail)
    std = F.stddev_samp(F.col("n_events").cast("double")).over(trail)
    hist = F.count(F.lit(1)).over(trail)
    z = F.when(
        (hist >= min_trail) & std.isNotNull() & (std != 0),
        (F.col("n_events") - mean) / std,
    )
    return counts.select(
        F.date_format("__ws", "yyyy-MM-dd HH:mm").alias("window_start"),
        type_col,
        "n_events",
        F.round(mean, 6).alias("mean_seasonal"),
        F.round(std, 6).alias("std_seasonal"),
        F.round(z, 6).alias("zscore"),
    )


def funnel_rates(funnel_df: DataFrame, n_steps: int) -> DataFrame:
    """Funnel rollup -> one row per step (step, n_reached,
    conv_from_prev, conv_from_first): the dashboard view of funnel()'s
    per-user table — where the drop-off is, as rates. ONE aggregate
    pass computes every step's reach (conditional sums over the depth
    column); the per-step rows then unfold from that single row with
    posexplode, so cost is one reduction of the (already one-row-per-
    user) funnel relation regardless of step count."""
    if n_steps < 2:
        raise ValueError("funnel_rates needs at least 2 steps")
    agg = funnel_df.agg(
        *[
            F.sum((F.col("depth") >= i).cast("long")).alias(f"__n{i}")
            for i in range(1, n_steps + 1)
        ]
    )
    steps = F.array(
        *[
            F.struct(
                F.lit(i).alias("step"),
                F.coalesce(F.col(f"__n{i}"), F.lit(0)).alias("n_reached"),
                (
                    F.coalesce(F.col(f"__n{i-1}"), F.lit(0))
                    if i > 1
                    else F.coalesce(F.col("__n1"), F.lit(0))
                ).alias("prev"),
            )
            for i in range(1, n_steps + 1)
        ]
    )
    first = F.coalesce(F.col("__n1"), F.lit(0))
    return (
        agg.select(F.explode(steps).alias("s"), first.alias("__first"))
        .select(
            F.col("s.step").cast("long").alias("step"),
            F.col("s.n_reached").cast("long").alias("n_reached"),
            F.round(
                F.when(F.col("s.prev") > 0, F.col("s.n_reached") / F.col("s.prev")),
                6,
            ).alias("conv_from_prev"),
            F.round(
                F.when(F.col("__first") > 0, F.col("s.n_reached") / F.col("__first")),
                6,
            ).alias("conv_from_first"),
        )
    )


def resample_ffill(
    ev: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Regular-grid resampling with forward fill -> (key, bucket, value,
    is_observed): each key's series re-expressed on a gapless tumbling
    grid from its first to its last observed bucket, carrying the last
    observed value through silent gaps — what joins event series to
    model features or downsampled dashboards without NULL holes (the
    'ffill' of pandas.resample, distributed).

    Plan: ONE windowed keyed aggregate picks each bucket's LAST
    observation (max_by over the same zero-padded composite order key
    as ohlc_downsample — tie-deterministic); per-key grid bounds are
    one more keyed min/max; the grid itself is a sequence-explode of
    the REDUCED bounds relation (rows = span/bucket per key, never
    event volume); one left join + one running last(ignorenulls) fills
    gaps. A key's fill never reads another key's values — the window is
    keyed."""
    w = F.window(F.col(ts_col).cast("timestamp"), bucket)
    okey = composite_order_key(ts_col, tiebreak_col)
    obs = (
        ev.groupBy(F.col(key_col).alias("key"), w.start.alias("__b"))
        .agg(F.round(F.max_by(F.col(value_col), okey), 6).alias("__v"))
    )
    bounds = obs.groupBy("key").agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    step = F.expr(f"INTERVAL {bucket}")
    grid = bounds.select(
        "key", F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias("__b")
    )
    joined = grid.join(obs, ["key", "__b"], "left")
    fill = Window.partitionBy("key").orderBy("__b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return joined.select(
        F.col("key"),
        F.date_format("__b", "yyyy-MM-dd HH:mm").alias("bucket"),
        F.last("__v", ignorenulls=True).over(fill).alias("value"),
        F.col("__v").isNotNull().alias("is_observed"),
    )


def near_duplicate_events(
    ev: DataFrame,
    within_seconds: int = 60,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    value_col: str | None = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Double-fire detection -> (id_a, id_b, gap_seconds): pairs of
    events with the same key columns (and value, when `value_col` is
    given) within `within_seconds` of each other — retry storms,
    double-submitted purchases, crawler refetches. The event-level
    cousin of document dedup.

    Plan: the interval_range_join discipline — candidates meet in a
    time bucket sized to the band (each left row joins its OWN bucket
    and the PREVIOUS one, so a pair straddling a boundary still meets
    exactly once via the later event's join), the exact |t_a - t_b| <=
    band predicate re-applies as a residual, and ordering (id_a < id_b
    with t_a <= t_b) emits each pair once. Join keys are (key...,
    value, bucket) — never a per-key cross join over the full
    history."""
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    band_us = within_seconds * 1_000_000
    keys = list(key_cols) + ([value_col] if value_col else [])
    base = ev.select(
        *keys, F.col(id_col).alias("__id"), t.alias("__t"),
        F.floor(t / band_us).alias("__bkt"),
    )
    # the later event of a pair probes its own bucket and the previous
    # one; the earlier event sits in exactly one of those
    probe = base.select(
        *keys, F.col("__id").alias("__idb"), F.col("__t").alias("__tb"),
        F.explode(F.array(F.col("__bkt"), F.col("__bkt") - 1)).alias("__bkt"),
    )
    pairs = (
        base.join(probe, keys + ["__bkt"])
        .where(
            (F.col("__t") <= F.col("__tb"))
            & (F.col("__tb") - F.col("__t") <= band_us)
            & (F.col("__id") != F.col("__idb"))
            # same-instant pairs: emit once, smaller id first
            & ((F.col("__t") < F.col("__tb")) | (F.col("__id") < F.col("__idb")))
        )
    )
    return pairs.select(
        F.col("__id").alias("id_a"),
        F.col("__idb").alias("id_b"),
        F.round((F.col("__tb") - F.col("__t")) / 1_000_000.0, 6).alias("gap_seconds"),
    ).distinct()
