"""Round-3 batch E: Benford first-digit fraud/DQ audit, CUPED
variance-reduced experiment readout, and rolling 7-day active users
(the WAU/DAU trailing-distinct window).

Exactness strategy: counts and cents stay BIGINT end-to-end (cents via
the repo-wide ``CAST(round(value * 100) AS BIGINT)`` idiom); ratios are
ppm floors through truncating DIV; the only doubles (CUPED's theta and
adjusted means) are computed by the IDENTICAL expression tree over
already-exact integer aggregates on both engines, so IEEE-754 gives
bit-equal results and the hash gate holds.

Reference parity note: the reference (GoEventStream) has no analytics
surface — these are SURVEY.md §2b group-2 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


# ppm of log10(1 + 1/d) for d = 1..9 — Benford's law expected shares.
_BENFORD_PPM = [
    (1, 301030),
    (2, 176091),
    (3, 124939),
    (4, 96910),
    (5, 79181),
    (6, 66947),
    (7, 57992),
    (8, 51153),
    (9, 45757),
]


@query(
    "benford_price_audit",
    f"""
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
      WHERE o_totalprice > 0
    ),
    d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
             count(*) AS n
      FROM c GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d),
    exp AS (
      SELECT * FROM (VALUES {", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM)})
        AS t(digit, exp_ppm)
    )
    SELECT exp.digit AS digit, CAST(COALESCE(d.n, 0) AS BIGINT) AS n,
           CAST(1000000 * COALESCE(d.n, 0) // total AS BIGINT) AS obs_ppm,
           CAST(exp_ppm AS BIGINT) AS exp_ppm,
           CAST(abs(1000000 * COALESCE(d.n, 0) // total - exp_ppm) AS BIGINT)
             AS abs_dev_ppm
    FROM exp LEFT JOIN d ON exp.digit = d.digit CROSS JOIN tot
    """,
)
def q_benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed ppm
    share of each leading digit of the integer-cents price vs the
    log10(1+1/d) expectation — the classic forensic/DQ screen for
    fabricated or clipped monetary values. First digit is taken from
    the decimal string of the exact cents, so both engines agree by
    construction; expected shares are hardcoded ppm literals.

    Scale plan: one map-side digit projection + a 9-cell hash agg;
    the expectation table is a 9-row broadcast. Output is always 9
    rows regardless of input size.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = (
        orders.where(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    tot = d.agg(F.sum("n").cast("long").alias("total"))
    exp = spark.createDataFrame(_BENFORD_PPM, "digit INT, exp_ppm BIGINT")
    return (
        exp.join(F.broadcast(d), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.expr(
                "CAST(1000000 * COALESCE(n, 0) DIV total AS BIGINT)"
            ).alias("obs_ppm"),
            F.col("exp_ppm").cast("long").alias("exp_ppm"),
            F.expr(
                "CAST(abs(1000000 * COALESCE(n, 0) DIV total - exp_ppm) AS BIGINT)"
            ).alias("abs_dev_ppm"),
        )
    )


@query(
    "cuped_adjusted_lift",
    """
    WITH b AS (
      SELECT CAST(min(epoch_ms(ts)) AS BIGINT) AS lo,
             CAST(max(epoch_ms(ts)) AS BIGINT) AS hi
      FROM events
    ),
    u AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(sum(CASE WHEN epoch_ms(ts) < (lo + hi) // 2
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre_cents,
             CAST(sum(CASE WHEN epoch_ms(ts) >= (lo + hi) // 2
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post_cents
      FROM events, b GROUP BY 1, 2
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pre_cents) AS BIGINT) AS sx,
             CAST(sum(post_cents) AS BIGINT) AS sy,
             CAST(sum(pre_cents * post_cents) AS BIGINT) AS sxy,
             CAST(sum(pre_cents * pre_cents) AS BIGINT) AS sxx
      FROM u
    ),
    th AS (
      SELECT n, sx,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta
      FROM g
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(post_cents) AS BIGINT) AS post_cents,
           CAST(sum(post_cents) AS DOUBLE) / count(*) AS mean_post,
           CAST(sum(post_cents) AS DOUBLE) / count(*)
             - theta * (CAST(sum(pre_cents) AS DOUBLE) / count(*)
                        - CAST(sx AS DOUBLE) / n) AS mean_adjusted,
           theta
    FROM u, th GROUP BY variant, theta, sx, n
    """,
)
def q_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM'13): the
    experiment metric is each user's post-period spend, the covariate
    their pre-period spend (split at the midpoint of the event-time
    range); theta = cov(pre, post)/var(pre), and each variant reports
    its raw and covariate-adjusted mean. Variant assignment is the
    deterministic ``user_id % 2``.

    Exactness: per-user sums and all moment sums are exact BIGINT
    cents; theta and the adjusted means are one fixed double
    expression over those integers — the same IEEE op sequence on both
    engines (documented determinism, not approximation).

    Scale plan: one user-keyed agg over the fact (map-side combined),
    one 1-row moment agg, then a 2-group agg; the 1-row theta rides in
    via broadcast. No windows, no per-user state.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.expr("CAST(min(unix_millis(ts)) AS BIGINT)").alias("lo"),
        F.expr("CAST(max(unix_millis(ts)) AS BIGINT)").alias("hi"),
    )
    u = (
        ev.crossJoin(F.broadcast(b))
        .select(
            "user_id",
            (F.col("user_id") % 2).alias("variant"),
            F.expr(
                "CASE WHEN unix_millis(ts) < (lo + hi) DIV 2 "
                "THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END"
            ).alias("pre_c"),
            F.expr(
                "CASE WHEN unix_millis(ts) >= (lo + hi) DIV 2 "
                "THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END"
            ).alias("post_c"),
        )
        .groupBy("user_id", "variant")
        .agg(
            F.sum("pre_c").cast("long").alias("pre_cents"),
            F.sum("post_c").cast("long").alias("post_cents"),
        )
    )
    g = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pre_cents").cast("long").alias("sx"),
        F.sum("post_cents").cast("long").alias("sy"),
        F.sum(F.col("pre_cents") * F.col("post_cents")).cast("long").alias("sxy"),
        F.sum(F.col("pre_cents") * F.col("pre_cents")).cast("long").alias("sxx"),
    )
    th = g.select(
        "n",
        "sx",
        (
            (
                F.col("n").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("theta"),
    )
    return (
        u.crossJoin(F.broadcast(th))
        .groupBy("variant", "theta", "sx", "n")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("post_cents").cast("long").alias("post_cents_sum"),
            F.sum("pre_cents").cast("long").alias("pre_cents_sum"),
        )
        .select(
            "variant",
            F.col("n_users").alias("n_users"),
            F.col("post_cents_sum").alias("post_cents"),
            (F.col("post_cents_sum").cast("double") / F.col("n_users")).alias(
                "mean_post"
            ),
            (
                F.col("post_cents_sum").cast("double") / F.col("n_users")
                - F.col("theta")
                * (
                    F.col("pre_cents_sum").cast("double") / F.col("n_users")
                    - F.col("sx").cast("double") / F.col("n")
                )
            ).alias("mean_adjusted"),
            "theta",
        )
    )


@query(
    "rolling_active_users_7d",
    """
    WITH du AS (
      SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id FROM events
    ),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM du),
    fan AS (
      SELECT unnest(range(day, day + 7)) AS d, user_id FROM du
    ),
    wau AS (
      SELECT d AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau7
      FROM fan, b WHERE d BETWEEN lo AND hi GROUP BY 1
    ),
    dau AS (
      SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM du GROUP BY 1
    )
    SELECT wau.day AS day, wau7, dau FROM wau JOIN dau USING (day)
    """,
)
def q_rolling_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users per day (WAU7) alongside that day's
    DAU — the rolling-distinct window no engine can express as a plain
    window function, re-expressed exactly.

    Scale plan: deduplicate to (day, user) pairs once (one shuffle),
    then each pair FANS OUT map-side to the <=7 future days it keeps
    alive (explode of a 7-element sequence — shuffle-free), and one
    count-distinct agg keyed on the target day finishes it. Work is
    7 x |daily-distinct pairs|, independent of raw event count — the
    shape that survives 100 TB, unlike a per-day range self-join
    (theta join) or a driver-side day loop. Days are epoch-integer
    math; partial leading windows are reported as-is (standard).
    """
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.select(
            F.expr("unix_millis(ts) DIV 86400000").alias("day"), "user_id"
        )
        .distinct()
    )
    b = du.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    fan = du.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("d"),
        "user_id",
        "day",
    )
    wau = (
        fan.crossJoin(F.broadcast(b))
        .where((F.col("d") >= F.col("lo")) & (F.col("d") <= F.col("hi")))
        .groupBy("d")
        .agg(F.count_distinct("user_id").cast("long").alias("wau7"))
    )
    dau = du.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("dau")
    )
    return (
        wau.join(dau, wau.d == dau.day)
        .select(F.col("d").alias("day"), "wau7", "dau")
    )


# ---------------------------------------------------------------------------
# Holt-Winters triple-exponential smoothing (additive seasonality)
# ---------------------------------------------------------------------------


@query(
    "holt_winters_forecast",
    """
    WITH RECURSIVE bucketed AS (
      SELECT event_type, epoch_ms(ts) // 21600000 AS t, count(*) AS c
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, min(t) AS lo, max(t) AS hi FROM bucketed GROUP BY 1
    ), spine AS (
      SELECT event_type, unnest(range(lo, hi + 1)) AS t FROM bounds
    ), x AS (
      SELECT s.event_type, s.t, coalesce(bb.c, 0) AS c,
             row_number() OVER (PARTITION BY s.event_type ORDER BY s.t) AS rn
      FROM spine s LEFT JOIN bucketed bb
        ON s.event_type = bb.event_type AND s.t = bb.t
    ), r AS (
      SELECT event_type, t, rn, c, c * 1000000 AS l, CAST(0 AS BIGINT) AS b,
             CAST(0 AS BIGINT) AS s1, CAST(0 AS BIGINT) AS s2,
             CAST(0 AS BIGINT) AS s3, CAST(0 AS BIGINT) AS s4
      FROM x WHERE rn = 1
      UNION ALL
      SELECT x.event_type, x.t, x.rn, x.c,
             (x.c * 1000000 - r.s1 + 3 * (r.l + r.b)) // 4,
             (((x.c * 1000000 - r.s1 + 3 * (r.l + r.b)) // 4 - r.l) + 3 * r.b) // 4,
             r.s2, r.s3, r.s4,
             ((x.c * 1000000 - (x.c * 1000000 - r.s1 + 3 * (r.l + r.b)) // 4)
              + 3 * r.s1) // 4
      FROM r JOIN x ON x.event_type = r.event_type AND x.rn = r.rn + 1
    )
    SELECT event_type, CAST(t AS BIGINT) AS bucket, CAST(c AS BIGINT) AS cnt,
           CAST(l AS BIGINT) AS level_ppm, CAST(b AS BIGINT) AS trend_ppm,
           CAST(s4 AS BIGINT) AS seasonal_ppm,
           CAST(l + b + s1 AS BIGINT) AS forecast_ppm
    FROM r
    """,
)
def q_holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple-exponential smoothing of the
    6-hourly event rate per type (alpha = beta = gamma = 1/4, seasonal
    period 4 = one day): level, trend, and seasonal state per bucket
    plus the one-step-ahead forecast — the seasonality-aware upgrade of
    ``holt_trend_forecast`` for daily-cycle rate forecasting.

    Exactness: three coupled int64 recurrences with truncating
    division on both engines (trend and seasonal go negative; Spark
    DIV == DuckDB //); the first seasonal cycle is seeded to zero so
    the fold is fully deterministic. The oracle replays the exact scan
    as a recursive CTE carrying the rotating 4-slot seasonal state as
    four BIGINT columns.

    Scale plan: see ``analytics.holt_winters_series`` — declarative
    bucket counts + spine, one O(period)-state Arrow pass per key,
    parallel across keys, series length O(time span).
    """
    from goeventstream_spark.operators.analytics import holt_winters_series

    ev = load_table(spark, sf_dir, "events")
    out = holt_winters_series(ev, key_col="event_type", ts_col="ts")
    return out.select(
        F.col("k").alias("event_type"),
        F.col("t").alias("bucket"),
        F.col("c").alias("cnt"),
        F.col("l").alias("level_ppm"),
        F.col("b").alias("trend_ppm"),
        F.col("s").alias("seasonal_ppm"),
        F.col("f").alias("forecast_ppm"),
    )
