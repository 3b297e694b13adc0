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
      round(sum(value), 2)        AS sum_value,
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
            F.round(F.sum("value"), 2).alias("sum_value"),
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
      round(sum(value), 2)                       AS session_value,
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
            F.round(F.sum("value"), 2).alias("session_value"),
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
      round(avg(value), 6) AS avg_value
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
        .agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


GAPFILL_USERS = 20


@register(
    "events_gapfill_ffill",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, round(sum(value), 2) AS v
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
    ).agg(F.round(F.sum("value"), 2).alias("v"))
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
