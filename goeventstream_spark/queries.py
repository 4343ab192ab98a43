"""Declared query registry — the contract surface for the driver.

Every implemented operator from SURVEY.md §2 gets:
  - a callable (spark, sf_dir) -> DataFrame   (the Spark-first plan)
  - an ANSI-SQL oracle string for DuckDB      (None => rows-only check)

Column names are aliased identically on both sides (the driver's compare
sorts columns by name and value-hashes). Computed integer columns are
cast to BIGINT on both sides; double aggregates are rounded to 2
decimals on both sides (fixture money values have 2 decimals, so true
sums are >= 0.005 from any rounding boundary — float noise cannot flip
the rounded value).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.operators import stream_ops as so
from goeventstream_spark.sources import load_table

# DuckDB-side tick expression, kept textually in one place so every
# oracle agrees with stream_ops.tick_col (floor of ms-elapsed / 50).
_TICK = (
    "CAST(floor((epoch_ms(ts) - epoch_ms(TIMESTAMP '2024-01-01 00:00:00')) / 50) AS BIGINT)"
)

# Fixed delta-window parameters for the declared queries (the operator
# itself is fully parameterized). Ticks 20M..30M = fixture days ~12-18.
T_LO, T_HI = 20_000_000, 30_000_000

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Stream-semantics operators (reference surface, SURVEY.md §2b group 1)
# ---------------------------------------------------------------------------


@query(
    "assign_ticks",
    f"SELECT event_id, ts, user_id, event_type, value, props, {_TICK} AS t FROM events",
)
def q_assign_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return so.assign_ticks(_events(spark, sf_dir))


@query(
    "delta_scan",
    f"""
    SELECT * FROM (
      SELECT event_id, ts, user_id, event_type, value, props, {_TICK} AS t FROM events
    ) WHERE t > {T_LO} AND t <= {T_HI}
    """,
)
def q_delta_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return so.delta_scan(_events(spark, sf_dir), T_LO, T_HI)


@query(
    "latest_state",
    f"""
    SELECT user_id, t, data, event_id FROM (
      SELECT user_id, {_TICK} AS t, props AS data, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return so.latest_state(_events(spark, sf_dir))


@query(
    "state_delta",
    f"""
    SELECT user_id, t, data, event_id FROM (
      SELECT user_id, {_TICK} AS t, props AS data, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND t > {T_LO}
    """,
)
def q_state_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return so.state_delta(_events(spark, sf_dir), T_LO)


@query(
    "connects",
    f"""
    WITH firsts AS (
      SELECT user_id, min(ts) AS first_ts, min({_TICK}) AS t
      FROM events GROUP BY user_id
    )
    SELECT user_id, first_ts, t,
           CAST(row_number() OVER (ORDER BY first_ts, user_id) AS BIGINT) AS proxy_id
    FROM firsts
    """,
)
def q_connects(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = so.connects(_events(spark, sf_dir))
    return df.withColumn("proxy_id", F.col("proxy_id").cast("long"))


@query(
    "disconnects",
    f"""
    SELECT user_id, ts AS last_seen_ts, {_TICK} AS t, event_id FROM (
      SELECT *, lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events
    ) WHERE next_ts IS NULL OR epoch_ms(next_ts) - epoch_ms(ts) > {so.CLIENT_TIMEOUT_S * 1000}
    """,
)
def q_disconnects(spark: SparkSession, sf_dir: str) -> DataFrame:
    return so.disconnects(_events(spark, sf_dir))


@query(
    "sessionize",
    """
    SELECT event_id, ts, user_id, event_type, value, props,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM (
      SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 3600000
                     THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return so.sessionize(_events(spark, sf_dir), gap_s=3600)


@query(
    "session_stats",
    """
    WITH s AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM (
        SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 3600000
                       THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
    )
    SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(CAST(sum(value) AS DOUBLE), 2) AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return so.session_stats(_events(spark, sf_dir), gap_s=3600)


@query(
    "stream_replay",
    f"""
    WITH te AS (SELECT *, {_TICK} AS t FROM events),
    s AS (
      SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 10000
                     THEN 1 ELSE 0 END AS is_new
      FROM te WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s2 AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM s
    ),
    bounds AS (
      SELECT user_id, session_id, min(ts) AS start_ts, max(ts) AS end_ts
      FROM s2 GROUP BY 1, 2
    )
    SELECT t, user_id, event_type, body FROM (
      SELECT t, user_id, event_type, props AS body FROM te
      UNION ALL
      SELECT CAST(floor((epoch_ms(start_ts) - epoch_ms(TIMESTAMP '2024-01-01 00:00:00')) / 50) AS BIGINT),
             user_id, '_c', CAST(NULL AS VARCHAR) FROM bounds
      UNION ALL
      SELECT CAST(floor((epoch_ms(end_ts) - epoch_ms(TIMESTAMP '2024-01-01 00:00:00')) / 50) AS BIGINT),
             user_id, '_d', CAST(NULL AS VARCHAR) FROM bounds
    )
    """,
)
def q_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return so.stream_replay(_events(spark, sf_dir), gap_s=so.CLIENT_TIMEOUT_S)
