"""Round-3 batch H: CEP-style negation pattern matching (click ->
purchase with NO error between, within a deadline) and time-series
similarity search over daily hourly-profile vectors — the two
stream-analytics shapes the retrieved EDBT CEP / time-series-search
literature centers on, re-expressed as exact declarative plans.

Exactness: the CEP match predicate is pure integer-millisecond
comparisons over last-seen event times; day similarity is an exact
BIGINT L1 distance between 24-bucket count vectors. Everything is
hash-oracled.

Reference parity note: the reference (GoEventStream) has no analytics
surface — these are SURVEY.md §2b group-2 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


@query(
    "cep_clean_conversions",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events
    ),
    lasts AS (
      SELECT user_id, event_type, ms,
             max(CASE WHEN event_type = 'click' THEN ms END)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click,
             max(CASE WHEN event_type = 'error' THEN ms END)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_error
      FROM e
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS purchases,
           CAST(sum(CASE WHEN last_click IS NOT NULL
                          AND ms - last_click <= 3600000
                          AND (last_error IS NULL OR last_error < last_click)
                         THEN 1 ELSE 0 END) AS BIGINT) AS clean_conversions
    FROM lasts WHERE event_type = 'purchase'
    GROUP BY user_id HAVING clean_conversions > 0
    """,
)
def q_cep_clean_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP negation pattern (the MATCH_RECOGNIZE shape Spark lacks):
    per user, purchases preceded by a click within 1 hour with NO
    error event BETWEEN the click and the purchase — the
    sequence-with-absence pattern that funnels and plain joins cannot
    express (the error must fall strictly inside the matched span,
    which reduces to last_error < last_click at the purchase row).

    Scale plan: ONE user-keyed ordered window pass carrying two
    running "last seen ts of type X" aggregates (conditional MAX over
    the preceding frame — O(1) running state per row, never a
    per-purchase lookback join), then a per-user aggregation on the
    same partitioning. Two shuffle-free window aggregates + one
    exchange total.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = ev.select(
        "user_id",
        "event_type",
        F.expr("unix_millis(ts)").alias("ms"),
        "event_id",
    )
    lasts = e.select(
        "user_id",
        "event_type",
        "ms",
        F.max(F.when(F.col("event_type") == "click", F.col("ms"))).over(w).alias(
            "last_click"
        ),
        F.max(F.when(F.col("event_type") == "error", F.col("ms"))).over(w).alias(
            "last_error"
        ),
    )
    matched = (
        F.col("last_click").isNotNull()
        & (F.col("ms") - F.col("last_click") <= 3600000)
        & (F.col("last_error").isNull() | (F.col("last_error") < F.col("last_click")))
    )
    return (
        lasts.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("purchases"),
            F.sum(F.when(matched, 1).otherwise(0))
            .cast("long")
            .alias("clean_conversions"),
        )
        .where(F.col("clean_conversions") > 0)
    )


@query(
    "similar_day_pairs",
    """
    WITH hb AS (
      SELECT epoch_ms(ts) // 86400000 AS day,
             CAST((epoch_ms(ts) % 86400000) // 3600000 AS INT) AS hod,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM hb),
    hours AS (SELECT unnest(range(0, 24)) AS hod),
    grid AS (
      SELECT days.day, hours.hod, coalesce(hb.c, 0) AS c
      FROM days CROSS JOIN hours
      LEFT JOIN hb ON hb.day = days.day AND hb.hod = hours.hod
    )
    SELECT a.day AS day_a, b.day AS day_b,
           CAST(sum(abs(a.c - b.c)) AS BIGINT) AS l1_dist
    FROM grid a JOIN grid b ON a.hod = b.hod AND a.day < b.day
    GROUP BY 1, 2
    ORDER BY l1_dist, day_a, day_b LIMIT 10
    """,
)
def q_similar_day_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search over daily profiles: each day is
    a 24-bucket hourly count vector (zero-filled), and the 10 most
    similar day PAIRS by exact integer L1 distance are returned — the
    whole-series-matching primitive behind "find me days that behaved
    like this outage day".

    Scale plan: the profile build is one distributed hash agg to
    O(days x 24) rows — bounded by TIME, not by event volume; the
    pair join is keyed on hour-of-day (fan-out = #days per bucket, a
    time-bounded quantity), aggregated per day pair, top-10 via
    TakeOrderedAndProject. At multi-year scale, prune candidates first
    with a coarse per-day total-count band before the hod join.
    """
    ev = load_table(spark, sf_dir, "events")
    hb = (
        ev.select(
            F.expr("unix_millis(ts) DIV 86400000").alias("day"),
            F.expr(
                "CAST((unix_millis(ts) % 86400000) DIV 3600000 AS INT)"
            ).alias("hod"),
        )
        .groupBy("day", "hod")
        .agg(F.count("*").alias("c"))
    )
    days = hb.select("day").distinct()
    hours = (
        hb.sparkSession.range(0, 24)
        .select(F.col("id").cast("int").alias("hod"))
    )
    grid = (
        days.crossJoin(F.broadcast(hours))
        .join(hb, ["day", "hod"], "left")
        .select("day", "hod", F.coalesce("c", F.lit(0)).alias("c"))
    )
    a, b = grid.alias("a"), grid.alias("b")
    return (
        a.join(
            b,
            (F.col("a.hod") == F.col("b.hod")) & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.day").alias("day_a"), F.col("b.day").alias("day_b"))
        .agg(
            F.sum(F.abs(F.col("a.c") - F.col("b.c"))).cast("long").alias("l1_dist")
        )
        .orderBy("l1_dist", "day_a", "day_b")
        .limit(10)
    )
