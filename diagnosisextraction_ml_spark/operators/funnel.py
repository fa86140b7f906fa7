"""Funnel conversion & cohort retention — ordered-event analytics.

North-star extensions over the events stream (no reference
counterpart — the reference has no temporal data at all): the two
standard product-analytics queries that exercise *order-dependent*
temporal semantics beyond what plain windows/sessionization
(streaming/events.py) cover.

- **Funnel**: how many users performed step₁, then step₂ *after*
  step₁, then step₃ after step₂ … optionally all within a horizon of
  their step₁ time. The sequential "after" makes this a chain of
  per-user min-aggregates, NOT a simple pivot: each step's earliest
  *qualifying* time depends on the previous step's. Each link is one
  equi-join on user_id + one groupBy(user_id) — both keyed the same,
  so at scale the chain is a sequence of co-partitioned shuffles of
  (user, timestamp) pairs only; event payloads never travel.
- **Cohort retention**: bucket users by first-seen week, count who
  returns k weeks later. Two aggregates and one join, all keyed by
  user or by (cohort, offset) — the grid output is tiny by
  construction (weeks × weeks).

Determinism: pure timestamp comparisons and integer counts; the only
division is retention/conversion = exact-integer count ratios (one
exactly-rounded double each — hash-safe cross-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _user_step_times(
    events: DataFrame,
    steps: list[str],
    horizon_hours: int | None,
    ts_col: str,
    user_col: str,
    type_col: str,
) -> DataFrame:
    """(user, __t0..__t{S-1}) — each user's earliest qualifying time
    per funnel step (null once the chain breaks), in ONE pass.

    The funnel recurrence t_i = min{ts of step_i events ≥ t_{i-1}
    (and ≤ t_0 + horizon)} is a per-USER computation, so no join
    chain is needed: one groupBy(user) collects a sorted timestamp
    array per step type (S conditional collect_lists in a single
    aggregation — the only corpus-wide exchange, carrying exactly the
    step-typed events), and each t_i is the first element of the
    previous step's threshold-filtered array — pure array expressions
    inside the user row. The r15 plan audit measured the former
    chained-join shape at S(S+1)/2 event scans (the lazy chain
    re-evaluated per step-count consumer): 9 scans / 10 exchanges for
    the 4-step registry funnel vs 1 scan / 2 exchanges here. Per-user
    arrays are bounded by that user's own step-typed activity (same
    class as sessionize's per-user sort).
    """
    typ = F.col(type_col)
    per_user = (
        events.filter(typ.isin(list(steps)))
        .groupBy(user_col)
        .agg(
            *[
                F.sort_array(
                    F.collect_list(F.when(typ == s, F.col(ts_col)))
                ).alias(f"__a{i}")
                for i, s in enumerate(steps)
            ]
        )
    )
    # array_min == first element of the sorted array, and is null-safe
    # on empty/never-reached arrays (element_at would raise under ANSI)
    def _qualifies(lo, hi):
        # single-parameter lambdas only: PySpark reads the Python
        # signature to pick the higher-order-function arity, so the
        # bounds must close over, not default-arg, their columns
        if hi is None:
            return lambda x: x >= lo
        return lambda x: (x >= lo) & (x <= hi)

    per_user = per_user.withColumn("__t0", F.array_min(F.col("__a0")))
    for i in range(1, len(steps)):
        prev = F.col(f"__t{i - 1}")
        hi = (
            F.col("__t0") + F.expr(f"INTERVAL {horizon_hours} HOURS")
            if horizon_hours is not None
            else None
        )
        per_user = per_user.withColumn(
            f"__t{i}",
            F.array_min(F.filter(F.col(f"__a{i}"), _qualifies(prev, hi))),
        )
    return per_user.select(
        user_col, *[F.col(f"__t{i}") for i in range(len(steps))]
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    horizon_hours: int | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step, users, conv_from_prev) — ordered funnel counts.

    A user counts for step i iff they have an event of ``steps[i]`` at
    or after their earliest qualifying time for step i−1 (and, with
    ``horizon_hours``, no later than that many hours after their step-0
    entry). ``conv_from_prev`` is users_i / users_{i-1} (1.0 for the
    first step). Computed from :func:`_user_step_times` — one corpus
    pass, one user-keyed exchange, one metadata-sized aggregate.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    per_user = _user_step_times(
        events, steps, horizon_hours, ts_col, user_col, type_col
    )
    # One tiny wide aggregate: users per step = non-null t_i counts.
    # conv_from_prev is computed INSIDE the single row before the
    # explode, so no counts-with-shifted-counts self-join is needed.
    counts = per_user.agg(
        *[F.count(F.col(f"__t{i}")).alias(f"__u{i}") for i in range(len(steps))]
    )
    rows = []
    for i, step in enumerate(steps):
        users = F.col(f"__u{i}")
        if i == 0:
            conv = F.lit(1.0)
        else:
            prev = F.col(f"__u{i - 1}")
            conv = F.when(prev == 0, F.lit(0.0)).otherwise(users / prev)
        rows.append(
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                users.alias("users"),
                conv.cast("double").alias("conv_from_prev"),
            )
        )
    return counts.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.step_idx", "r.step", "r.users", "r.conv_from_prev"
    )


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """(cohort_week, week_offset, users, retention) — weekly cohorts.

    cohort_week = Monday of the user's first event; a user is retained
    at offset k if they have any event in cohort_week + k weeks.
    retention divides by the cohort's size (its offset-0 count — every
    user is active in their own first week by construction).
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    activity = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("act_week")
    ).distinct()
    grid = (
        activity.join(first, [user_col])
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.col("act_week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / F.lit(7)
            )
            .cast("int")
            .alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("users"))
        # localCheckpoint: grid feeds BOTH the cohort-size lookup and
        # the final retention join — left lazy the two event scans +
        # the user-keyed join ran twice (r15 plan audit: 4 event
        # scans; 2 after). |cohorts|·|offsets| rows at any scale.
        .localCheckpoint()
    )
    size = grid.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("users").alias("cohort_size")
    )
    # cohort_week is emitted as TIMESTAMP (midnight Monday), not DATE:
    # several timestamp-final queries are driver-hash-proven green while
    # no DATE final ever has been, and DATE round-trips to pandas
    # differently per engine (Spark object-date vs DuckDB datetime64) —
    # same representation-sensitivity class as the round-8 DECIMAL reds.
    return grid.join(size, ["cohort_week"]).select(
        F.col("cohort_week").cast("timestamp").alias("cohort_week"),
        "week_offset",
        "users",
        (F.col("users") / F.col("cohort_size")).alias("retention"),
    )


def funnel_latency_quantiles(
    events: DataFrame,
    steps: list[str],
    probes: tuple = ((1, 2), (9, 10), (99, 100)),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-transition conversion-latency percentiles.

    For each consecutive funnel transition step[i-1] → step[i], the
    distribution of per-user first-qualifying latencies (seconds,
    floor-truncated — identical in both engines), summarized by the
    mergeable log-binned quantile sketch
    (:func:`~..sketch.grouped_logbin_quantiles`). The "how long does
    conversion take" companion to :func:`funnel_conversion`'s
    "how many convert".

    Per-user step times reuse the funnel chain (min-aggregation per
    step, shuffle keyed by user); latencies are exact BIGINT second
    differences, so the whole result is hash-exact cross-engine.

    Output: (step_idx, step, p_num, p_den, target_rank, bin_lo,
    bin_hi, cum_count) — bins bound the latency percentile in seconds.
    """
    from diagnosisextraction_ml_spark.operators.sketch import (
        grouped_logbin_quantiles,
    )

    if len(steps) < 2:
        raise ValueError("latency funnel needs at least two steps")
    # Same one-pass foundation as funnel_conversion (no horizon); the
    # per-transition latencies unpivot from the per-user step-time row
    # as one explode — the former per-step join chain re-evaluated the
    # whole recurrence per unioned branch (r15 plan audit: 5 event
    # scans for the 3-step registry funnel; 1 here).
    per_user = _user_step_times(
        events, steps, None, ts_col, user_col, type_col
    )
    lat_structs = [
        F.struct(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            (
                F.col(f"__t{i}").cast("long")
                - F.col(f"__t{i - 1}").cast("long")
            ).alias("lat_sec"),
        )
        for i, step in enumerate(steps[1:], start=1)
    ]
    lats = (
        per_user.select(F.explode(F.array(*lat_structs)).alias("r"))
        .filter(F.col("r.lat_sec").isNotNull())
        .select("r.step_idx", "r.step", "r.lat_sec")
    )
    return grouped_logbin_quantiles(
        lats, ["step_idx", "step"], "lat_sec", probes=probes
    )


def top_event_paths(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-k most common length-``n`` event-type paths across users.

    The "what do users actually do" query: order each user's events by
    (ts, tiebreaker), slide a length-``n`` window over the type
    sequence, and count every path corpus-wide. One groupBy(user)
    builds the ordered sequence (map-side combined collect of (ts,
    tiebreak, type) structs — per-user payload, bounded by the user's
    event count, the same shape the sessionize/funnel ops already
    shuffle); the n-gram slide is a native array transform (zero extra
    shuffle); the count is one more map-side-combined groupBy. The
    tiebreaker makes the order total, so the result is deterministic
    on any partitioning and in the SQL twin.

    Output: (path string "a>b>c", n_occurrences, n_users), ordered by
    (n_occurrences desc, path asc) limit ``k``.
    """
    if n < 1 or k < 1:
        raise ValueError(f"top_event_paths needs n >= 1 and k >= 1, got n={n} k={k}")
    seq = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("ts"),
                        F.col(tiebreak_col).alias("tb"),
                        F.col(type_col).alias("et"),
                    )
                )
            ).alias("s")
        )
        .select(
            "u", F.transform(F.col("s"), lambda x: x.getField("et")).alias("types")
        )
    )
    sz = F.size("types")
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(0), sz - n),
            lambda i: F.concat_ws(">", *[F.element_at("types", i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = seq.select("u", F.explode(grams).alias("path"))
    return (
        exploded.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("u").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(k)
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DAU + rolling WAU/MAU — the canonical engagement metric.

    Exact distinct-users-over-a-sliding-window without a distinct
    window aggregate (which Spark lacks and which would hold per-user
    state): dedupe to (user, active-day) pairs first (one
    map-side-combined groupBy — the heavy reduction), then each pair
    contributes to the ``window_days`` trailing windows that cover it
    via a bounded explode (fan-out = window_days over the ALREADY
    deduped pairs, not over raw events), and one count-distinct per
    (window-end day). DAU rides the same pair relation. Days with no
    activity in the window produce no row (join against a calendar
    axis for dense output — :func:`~..operators.rollup.gapfill_locf_hourly`
    shows the pattern).

    Output: (day epoch-days BIGINT, dau BIGINT, rolling_active BIGINT)
    — rolling_active = distinct users in [day − window_days + 1, day].
    """
    if window_days < 1:
        raise ValueError(f"rolling_active_users needs window_days >= 1")
    day = F.floor(F.col(ts_col).cast("long") / 86400)
    pairs = events.select(
        F.col(user_col).alias("u"), day.alias("d")
    ).distinct()
    dau = pairs.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    contrib = pairs.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + F.lit(window_days - 1))
        ).alias("day"),
    )
    rolling = contrib.groupBy("day").agg(
        F.countDistinct("u").alias("rolling_active")
    )
    # only days that themselves saw activity (inner join on DAU days)
    return (
        dau.select(F.col("d").alias("day"), "dau")
        .join(rolling, "day")
        .select("day", "dau", "rolling_active")
    )


def lasttouch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch revenue attribution — credit each conversion's value
    to the most recent preceding touch event (by channel) of the same
    user; conversions with no prior touch report channel '(none)'.

    One Exchange total: events partition by user and sort by
    (ts, event_id) — a single window pass carries the last non-null
    touch channel forward (``last(..., ignorenulls)``), then a tiny
    hash aggregation by channel. Payloads never join; the window state
    per row is one string. Value sums go through DECIMAL(18,6) so the
    per-channel totals are independent of row order and partitioning
    (hash-identical cross-engine), surfaced as DOUBLE.

    Output: (channel, n_conversions BIGINT, revenue DOUBLE) — one row
    per touch channel that attributed at least one conversion.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(
        F.col(type_col).isin(*touch_types), F.col(type_col)
    )
    tagged = events.withColumn(
        "__channel", F.last(touch, ignorenulls=True).over(w)
    )
    return (
        tagged.filter(F.col(type_col) == conversion_type)
        .select(
            F.coalesce(F.col("__channel"), F.lit("(none)")).alias("channel"),
            F.col(value_col).cast("decimal(18,6)").alias("__v"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("__v").cast("double").alias("revenue"),
        )
    )


def linear_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution — each
    conversion's value splits equally across ALL of the user's prior
    touch events; the per-channel credit is value · n_ch/k where n_ch
    counts that channel's prior touches and k = Σ n_ch. Conversions
    with no prior touch credit '(none)' in full.

    Same single-Exchange shape as :func:`lasttouch_attribution` — one
    window pass per user ordered by (ts, id) carries one RUNNING COUNT
    per channel (state: len(touch_types) longs, not the payload), then
    the per-conversion credits unpivot to (channel, credit) rows and a
    tiny hash aggregate sums them. Credits are rounded to 6 dp and
    DECIMAL-cast BEFORE the sum so per-channel totals are order- and
    partitioning-independent (hash-exact in the SQL twin).

    Output: (channel, n_conversions BIGINT, revenue DOUBLE); a
    conversion counts toward every channel it *touched* (n_ch > 0 —
    or '(none)' when it has no prior touch), so n_conversions agrees
    with :func:`lasttouch_attribution` even for zero-value or
    NULL-value conversions, which contribute a row but no revenue.
    A channel the user never touched before converting gets no row.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    counted = events
    for t in touch_types:
        counted = counted.withColumn(
            f"__n_{t}",
            F.coalesce(
                F.sum(F.when(F.col(type_col) == t, 1)).over(w), F.lit(0)
            ),
        )
    k = sum(F.col(f"__n_{t}") for t in touch_types)
    conv = counted.filter(F.col(type_col) == conversion_type).withColumn(
        "__k", k
    )
    credits = F.array(
        *[
            F.struct(
                F.lit(t).alias("channel"),
                F.when(
                    F.col("__k") > 0,
                    F.round(
                        F.col(value_col)
                        * F.col(f"__n_{t}").cast("double")
                        / F.col("__k").cast("double"),
                        6,
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("credit"),
                # membership is by TOUCH, not by credit value — a
                # zero/NULL-value conversion still counts (parity with
                # lasttouch_attribution's per-conversion count)
                (F.col(f"__n_{t}") > 0).alias("keep"),
            )
            for t in touch_types
        ],
        F.struct(
            F.lit("(none)").alias("channel"),
            F.when(F.col("__k") == 0, F.col(value_col))
            .otherwise(F.lit(0.0))
            .alias("credit"),
            (F.col("__k") == 0).alias("keep"),
        ),
    )
    return (
        conv.select(F.explode(credits).alias("c"))
        .filter(F.col("c.keep"))
        .select("c.channel", F.col("c.credit").cast("decimal(18,6)").alias("__v"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.coalesce(F.sum("__v").cast("double"), F.lit(0.0)).alias("revenue"),
        )
    )
