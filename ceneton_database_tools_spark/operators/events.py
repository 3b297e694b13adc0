"""Batch analytics over the event stream table.

Batch formulations of the streaming operators (streaming/ has the
Structured Streaming versions): tumbling-window aggregation,
sessionization via gap detection, and funnel-style per-user stats.
Batch and streaming share the same logical semantics, so these also
serve as the oracle-checkable twins of the streaming queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "events_tumbling_window",
    oracle="""
    SELECT
      date_trunc('hour', ts)      AS window_start,
      event_type,
      count(*)                    AS n_events,
      CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
      count(DISTINCT user_id)     AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    tags=("events", "window-agg"),
    bench=True,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation (batch form).

    The streaming twin uses ``F.window(ts, '1 hour')`` + watermark;
    `date_trunc` is the identical bucketing for batch and for the
    DuckDB oracle.
    """
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact DECIMAL sum → one deterministic decimal→double
            # conversion; a raw double sum is order-dependent in the
            # last ulp and round(double, 2) diverges across engines the
            # moment the generator leaves the 2-decimal grid
            F.expr(
                "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)"
            ).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "events_sessionization",
    oracle="""
    WITH gaps AS (
      SELECT
        user_id,
        event_id,
        ts,
        value,
        CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000
             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT
        user_id,
        ts,
        value,
        CAST(sum(new_session) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT
      user_id,
      session_id,
      count(*)                                   AS n_events,
      CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS session_value,
      CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT) AS duration_sec
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("events", "session"),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap → session id → per-
    session stats. Classic lag + cumulative-sum-of-boundaries plan;
    one shuffle on user_id serves both windows and the final group-by.

    Determinism notes (hard-won): the gap is compared at exact
    microsecond precision on BOTH engines (``unix_micros`` here,
    ``epoch_us`` in the oracle) — second-truncated vs exact comparison
    diverges on gaps like 1800.4 s. Both running-sum windows order by
    ``(ts, event_id)`` — ts alone is non-unique per user, and ROWS
    frames over non-unique orderings tie-break arbitrarily (and
    parallelism-dependently), silently reassigning tied rows between
    sessions.
    """
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    new_session = (
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > 30 * 60 * 1_000_000)
    ).cast("int")
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w_run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)"
            ).alias("session_value"),
            ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(1_000_000))
            .cast("long")
            .alias("duration_sec"),
        )
    )


@register(
    "events_user_activity_join",
    oracle="""
    SELECT
      c_mktsegment,
      event_type,
      count(*)             AS n_events,
      CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*) * 1000000 + 0.5) AS DOUBLE) / 1000000.0
                           AS avg_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
    tags=("events", "join"),
)
def events_user_activity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-table enrichment join (events ⋈ customer dimension).

    customer scales with SF → no hard broadcast hint; under the 64 MB
    threshold AQE broadcasts it anyway, above it the join degrades
    gracefully to shuffle instead of OOMing the executors.
    """
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal sum, one double division, floor-quantized
            # at 1e-6 — order-independent AND half-boundary-free
            F.expr(
                "CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"
                " / count(*) * 1000000 + 0.5) AS DOUBLE) / 1000000.0"
            ).alias("avg_value"),
        )
    )


GAPFILL_USERS = 20


@register(
    "events_gapfill_ffill",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS v
      FROM events WHERE user_id < {GAPFILL_USERS}
      GROUP BY user_id, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id
    ),
    cal AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    joined AS (
      SELECT c.user_id, c.h, hr.v
      FROM cal c LEFT JOIN hourly hr ON c.user_id = hr.user_id AND c.h = hr.h
    )
    SELECT user_id,
           h AS hour_start,
           v IS NULL AS was_gap,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS v_ffill
    FROM joined
    """,
    tags=("events", "timeseries", "gapfill"),
)
def events_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling + forward fill: densify each user's
    hourly value series over their own [first, last] hour (calendar via
    ``sequence``/``generate_series`` — identical bucketing on both
    engines), then carry the last observation forward across the gaps
    with an IGNORE NULLS running ``last``.

    Scale shape: the calendar explodes to (span-hours) rows PER KEY —
    bounded by each key's own observed span, never a global cross join
    against a calendar table; one shuffle on user_id serves the
    group-by, the calendar join, and the fill window. The first row of
    every series is an observed hour by construction, so v_ffill is
    never null.
    """
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < GAPFILL_USERS)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.expr("CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)").alias("v")
    )
    bounds = hourly.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    cal = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    joined = cal.join(hourly, ["user_id", "h"], "left")
    w_fill = (
        W.partitionBy("user_id").orderBy("h").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("hour_start"),
        F.col("v").isNull().alias("was_gap"),
        F.round(F.last("v", ignorenulls=True).over(w_fill), 2).alias("v_ffill"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase,
           CASE WHEN (SELECT count(*) FROM v) = 0 THEN NULL ELSE
             CAST(floor((SELECT count(*) FROM c) * 10000.0
                        / (SELECT count(*) FROM v) + 0.5) AS DOUBLE) / 100
           END AS view_to_click_pct,
           CASE WHEN (SELECT count(*) FROM c) = 0 THEN NULL ELSE
             CAST(floor((SELECT count(*) FROM p) * 10000.0
                        / (SELECT count(*) FROM c) + 0.5) AS DOUBLE) / 100
           END AS click_to_purchase_pct
    """,
    tags=("events", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: view → click → purchase, each step's
    event strictly after the user's previous step (first-touch
    timestamps), with step counts and conversion rates.

    Scale shape: three aggregations and two joins, all keyed on
    user_id — one shuffle partitioning reused across every stage (no
    re-keying), then a single-row rollup. The strictly-after join
    condition is an equi-join on user_id with a residual ts predicate,
    not a range join, so it stays a hash join at any scale.
    """
    ev = _t(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        v.agg(F.count("*").cast("long").alias("n_view"))
        .crossJoin(c.agg(F.count("*").cast("long").alias("n_click")))
        .crossJoin(p.agg(F.count("*").cast("long").alias("n_purchase")))
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        # empty funnel steps produce NULL pcts, not a DIVIDE_BY_ZERO
        # crash: Spark 4 runs ANSI mode by default, DuckDB returns NULL
        # for x/0 — the CASE makes both engines take the same branch
        F.expr(
            "CASE WHEN n_view = 0 THEN NULL ELSE"
            " CAST(floor(n_click * 10000.0 / n_view + 0.5) AS DOUBLE) / 100 END"
        ).alias("view_to_click_pct"),
        F.expr(
            "CASE WHEN n_click = 0 THEN NULL ELSE"
            " CAST(floor(n_purchase * 10000.0 / n_click + 0.5) AS DOUBLE) / 100 END"
        ).alias("click_to_purchase_pct"),
    )


@register(
    "events_retention_cohort",
    oracle="""
    WITH first_day AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT)
             AS day_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN first_day f USING (user_id)
    WHERE date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) BETWEEN 0 AND 7
    GROUP BY f.cohort_day, day_offset
    """,
    tags=("events", "retention"),
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity date,
    distinct active users counted at day offsets 0–7.

    Scale shape: the cohort table is one groupBy on user_id; the join
    back to events is on the same key (partitioning reused, and the
    per-user cohort relation is orders of magnitude smaller than the
    event log, so AQE broadcasts it when it fits). The distinct-user
    count shuffles on (cohort_day, offset, user_id) with partial
    distinct map-side — the standard two-phase distinct aggregate.
    """
    ev = _t(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_day"))
    joined = ev.join(first_day, "user_id").withColumn(
        "day_offset", F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).cast("long")
    )
    return (
        joined.where((F.col("day_offset") >= 0) & (F.col("day_offset") <= 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


@register(
    "events_ohlc_downsample",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(ts AS DATE)                 AS day,
             -- FILTER: a NULL-value tick cannot set open/close. DuckDB's
             -- arg_min SKIPS null values while Spark's min_by RETURNS the
             -- (null) value at the min ts — the explicit filter pins one
             -- semantic on both engines.
             CAST(round(CAST(arg_min(value, ts) FILTER (WHERE value IS NOT NULL) AS DECIMAL(18,6)), 2) AS DOUBLE) AS open,
             CAST(round(CAST(max(value) AS DECIMAL(18,6)), 2) AS DOUBLE)         AS high,
             CAST(round(CAST(min(value) AS DECIMAL(18,6)), 2) AS DOUBLE)         AS low,
             CAST(round(CAST(arg_max(value, ts) FILTER (WHERE value IS NOT NULL) AS DECIMAL(18,6)), 2) AS DOUBLE) AS close,
             CAST(count(*) AS BIGINT)         AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc
      FROM events
      GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT user_id, day, open, high, low, close, n_events,
           (CASE WHEN sc < 0 THEN -1 ELSE 1 END)
             * ((abs(sc) * 200 + n_events) // (2 * n_events)) / 10000.0
             AS avg_value
    FROM g
    """,
    tags=("events", "time-series"),
)
def events_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time-series downsampling: per user per day, the value at
    the first and last event (open/close) plus high/low/avg — the
    classic tick-to-bar rollup.

    Open/close are well-defined because (user_id, ts) is unique in the
    event log; ``min_by``/``max_by`` (Spark) and ``arg_min``/``arg_max``
    (DuckDB) select them without a window sort.

    Scale shape: one hash aggregation keyed on (user_id, day) with full
    map-side partial aggregation — min_by/max_by carry a single
    (value, ts) pair per group through the shuffle, so the downsample
    reduces the data volume before it moves. No window, no sort.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            # round via an exact DECIMAL(18,6) hop: round(double, 2)
            # resolves half-boundaries through the shortest decimal
            # repr on Spark but the raw binary on DuckDB — divergent on
            # any 3-decimal value like 1.005; the scale-6 cast is
            # identical on both engines for any plausible value grid
            # FILTER (both engines): a NULL-value tick cannot set
            # open/close — DuckDB's arg_min skips null values, Spark's
            # min_by returns them; the filter pins one semantic
            F.expr("CAST(round(CAST(min_by(value, ts) FILTER (WHERE value IS NOT NULL) AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("open"),
            F.expr("CAST(round(CAST(max(value) AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("high"),
            F.expr("CAST(round(CAST(min(value) AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("low"),
            F.expr("CAST(round(CAST(max_by(value, ts) FILTER (WHERE value IS NOT NULL) AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("close"),
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("_sc"),
        )
        # avg at 4 decimals, ENTIRELY in integers: values are exact
        # cents, so avg*1e4 = cents*100/n, and half-away-from-zero
        # rounding is sign(cents) * ((|cents|*200 + n) div (2n)). Float
        # avg is order-dependent in the last ulp, and a group landing on
        # an exact half (one did, at sf0.1: 67.49125) rounds differently
        # per engine — Spark's round() goes through the shortest decimal
        # repr, DuckDB's rounds the raw double. Integer arithmetic
        # sidesteps both. The abs/sign split keeps the division operand
        # nonnegative, where Spark `div` (truncate) and DuckDB `//`
        # coincide — so the idiom stays exact even if a future events
        # generator emits negative values.
        .withColumn(
            "avg_value",
            # CAST to DOUBLE before dividing: Spark parses the 10000.0
            # literal as DECIMAL, and long/decimal renders with trailing
            # zeros ("31.1567000") where DuckDB's double gives "31.1567"
            F.expr(
                "CAST((CASE WHEN _sc < 0 THEN -1 ELSE 1 END)"
                " * ((abs(_sc) * 200 + n_events) div (2 * n_events))"
                " AS DOUBLE) / 10000.0"
            ),
        )
        .drop("_sc")
    )


# ---------------------------------------------------------------------------
# Rolling-window anomaly detection (trailing z-score)
# ---------------------------------------------------------------------------

ANOMALY_LOOKBACK = 20  # trailing events per user feeding the baseline
ANOMALY_MIN_N = 8      # minimum history before scoring
ANOMALY_Z = 3.0


@register(
    "events_anomaly_rolling_z",
    oracle=f"""
    WITH v AS (
      SELECT event_id, user_id, ts, value,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    w AS (
      SELECT event_id, user_id, ts, value, vc,
             CAST(count(vc) OVER win AS BIGINT) AS n,
             CAST(sum(vc)   OVER win AS BIGINT) AS s,
             CAST(sum(vc * vc) OVER win AS BIGINT) AS ss
      FROM v
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {ANOMALY_LOOKBACK} PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT event_id, user_id, ts, value,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
               / (n - 1) AS var,
             CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / n AS dev,
             n
      FROM w WHERE n >= {ANOMALY_MIN_N}
    )
    SELECT event_id, user_id, ts, value,
           -- sign-safe floor quantization: engine round(double) is the
           -- documented Spark-shortest-repr vs DuckDB-binary divergence
           -- class; floor of identical doubles is identical, and the
           -- sign split keeps half-ties away-from-zero on both sides
           CAST(CASE WHEN dev < 0
                THEN -floor(-(dev / sqrt(var)) * 10000 + 0.5)
                ELSE  floor( (dev / sqrt(var)) * 10000 + 0.5) END AS DOUBLE)
             / 10000 AS z
    FROM scored
    WHERE var > 0 AND abs(dev / sqrt(var)) >= {ANOMALY_Z}
    """,
    tags=("events", "window", "anomaly", "llm-pipeline"),
)
def events_anomaly_rolling_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly detection: each event scored against the mean
    and variance of its user's trailing 20 events (frame ends
    at 1 PRECEDING — the scored event never contaminates its own
    baseline); |z| >= 3 flags the anomaly. The streaming-monitoring
    shape expressed as a batch window.

    Cross-engine determinism (the repo's integer-stat rule): values go
    through exact integer cents; count/sum/sum-of-squares over the
    frame are integer aggregates, and mean/variance derive from those
    integers with the SAME double-precision expression on both
    engines — no order-dependent float accumulation anywhere. The
    window is partitioned per user (never global) and ordered by the
    unique (ts, event_id) tuple.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"),
    )
    win = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOMALY_LOOKBACK, -1)
    )
    w = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "vc",
        F.count("vc").over(win).alias("n"),
        F.sum("vc").over(win).alias("s"),
        F.sum(F.col("vc") * F.col("vc")).over(win).alias("ss"),
    ).where(F.col("n") >= ANOMALY_MIN_N)
    var = (
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n"))
        / (F.col("n") - 1)
    )
    dev = F.col("vc").cast("double") - F.col("s").cast("double") / F.col("n")
    scored = w.select(
        "event_id", "user_id", "ts", "value", var.alias("var"), dev.alias("dev")
    )
    z = F.col("dev") / F.sqrt("var")
    # sign-safe floor quantization (see the oracle comment): never
    # engine round() on a raw double
    zq = F.expr(
        "CAST(CASE WHEN dev < 0"
        " THEN -floor(-(dev / sqrt(var)) * 10000 + 0.5)"
        " ELSE  floor( (dev / sqrt(var)) * 10000 + 0.5) END AS DOUBLE) / 10000"
    )
    return (
        scored.where((F.col("var") > 0) & (F.abs(z) >= ANOMALY_Z))
        .select("event_id", "user_id", "ts", "value", zq.alias("z"))
    )
