"""Event-analytics operators over the append-only event log: funnel
progression, retention cohorts, and rate anomaly detection.

The reference's log (model/event.go:7-12) is the input; these are the
product-analytics queries a real deployment runs on it beyond the
protocol's own delta scan (SURVEY.md §2a "explicitly absent" —
aggregations/joins are this engine's extension surface).

Scale notes: every operator here keys on user_id (or a coarser
dimension) — at 100 TB the event lake is partitioned by date and the
per-user aggregations shuffle once on user_id; consecutive same-key
aggregations reuse the exchange. No windows without partition keys, no
driver-side loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel progression per user: the first time each step
    occurred strictly AFTER the previous step's first occurrence.
    Returns one row per user who completed step 1, with nullable
    timestamps t_<step> for each subsequent stage.

    Plan: one per-user min-aggregation per step, each joined back on
    user_id with the strictly-after predicate. All shuffles share the
    user_id key, so the exchanges line up (Catalyst reuses the
    partitioning); step k's input is already reduced to step-(k-1)
    completers, so each successive join moves monotonically less data.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(
            f"funnel steps must be unique (got {steps}): a repeated name "
            "would alias two t_<step> columns and break every downstream "
            "reference ambiguously"
        )
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{steps[0]}"))
    )
    prev_t = f"t_{steps[0]}"
    for step in steps[1:]:
        nxt = (
            events.where(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("_ts"))
            .join(cur.select(user_col, prev_t), user_col)
            .where(F.col("_ts") > F.col(prev_t))
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"t_{step}"))
        )
        cur = cur.join(nxt, user_col, "left")
        prev_t = f"t_{step}"
    return cur


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic retention triangle: cohort = each user's first active
    day; count distinct users active on each (cohort_day, day_offset).

    Two aggregations: per-user first day (shuffle on user_id), distinct
    user-days (same key), then a broadcast-size final count keyed on
    (cohort, offset). Integer day arithmetic only — exact everywhere.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    first = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = events.select(user_col, day.alias("active_day")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


def rate_zscore(
    events: DataFrame,
    threshold: float = 2.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Anomalous activity detection: z-score of per-(user, day) event
    counts against the global count distribution; rows with |z| >=
    threshold are the outliers.

    The mean/variance come from one scalar aggregation over exact
    integer sums (n, sum, sum of squares) broadcast back as a 1-row
    cross join — NOT an unpartitioned window, which would funnel every
    row through one task at scale. The variance formula is spelled out
    in fixed double-op order ((ss - s*mean)/(n-1)) so any engine
    computing it from the same integer sums agrees bit-for-bit —
    built-in stddev aggregates (Welford order, engine-specific) do not.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    counts = events.groupBy(user_col, day.alias("day")).agg(
        F.count("*").alias("n_events")
    )
    stats = counts.agg(
        F.count("*").alias("_n"),
        F.sum("n_events").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("_n")
    var = (F.col("_ss").cast("double") - F.col("_s").cast("double") * mean) / (
        F.col("_n") - 1
    )
    # var <= 0 (all counts equal, or a single group) must flag NOTHING:
    # without the guard 0/0 = NaN, and NaN compares greater than any
    # threshold in both Spark and DuckDB — every row would be "anomalous".
    return (
        counts.crossJoin(F.broadcast(stats))
        .where((F.col("_n") > 1) & (var > 0))
        .withColumn("zscore", (F.col("n_events") - mean) / F.sqrt(var))
        .where(F.abs(F.col("zscore")) >= threshold)
        .select(user_col, "day", "n_events", "zscore")
    )


def resample_locf(
    events: DataFrame,
    grain: str = "hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str = "event_id",
) -> DataFrame:
    """Time-series resampling with gap fill: one row per (user, hour)
    from each user's first to last event, carrying the last observed
    value forward across empty hours (LOCF) — the hypertable
    "resample + fill" operator that turns an irregular event stream
    into an aligned series for training/monitoring.

    Plan: per-user hourly agg (one shuffle on (user, hour) collapsed
    map-side), then per-user min/max to build the hour spine with
    ``sequence`` + ``explode`` (row generation is map-side, no
    shuffle), a left join back on (user, hour), and one
    last(ignorenulls) window per user ordered by hour. Every stage
    keys on user_id, so at 100 TB one hash partitioning serves the
    agg, the join, and the window back-to-back. The spine length is
    bounded by the observed per-user time range — no global calendar
    cross join.
    """
    from pyspark.sql import Window

    hour = F.date_trunc(grain, F.col(ts_col))
    hourly = (
        events.groupBy(F.col(user_col), hour.alias("bucket_ts"))
        .agg(F.max_by(F.col(value_col), F.col(seq_col)).alias("obs_value"),
             F.count("*").alias("n_events"))
    )
    spine = (
        hourly.groupBy(user_col)
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            user_col,
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {grain.upper()}"))
            ).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, [user_col, "bucket_ts"], "left")
        .select(
            user_col,
            "bucket_ts",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("obs_value", ignorenulls=True).over(w).alias("value_locf"),
        )
    )


def dq_audit(
    orders: DataFrame, customer: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Data-quality audit over the star schema: primary-key duplicate
    counts, foreign-key orphan counts, and null-rate checks, one row
    per check — the validation gate a pipeline runs before promoting a
    snapshot. Each check is an independent aggregate/anti-join; the
    orphan checks broadcast the (distinct-key-projected) dimension
    when small and the union of one-row results is free.
    """
    def one(name, df_cnt):
        return df_cnt.select(F.lit(name).alias("check"),
                             F.col("n").cast("long").alias("n_violations"))

    # One aggregation per TABLE: pk-dup + null-date share the orders
    # scan, neg-price rides lineitem's; count(when(...)) (never
    # sum(when(...))) so an EMPTY table reports 0, not NULL.
    orders_checks = orders.agg(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("pk_dup"),
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("null_date"),
    )
    pk_dup = orders_checks.select(F.col("pk_dup").alias("n"))
    null_date = orders_checks.select(F.col("null_date").alias("n"))
    # Orphan = NON-NULL foreign key with no parent. The explicit
    # isNotNull guard keeps the semantics NULL-safe and identical to
    # the oracle's guarded NOT IN (a bare NOT IN over a parent set
    # containing NULL returns zero rows — the classic NULL trap a DQ
    # gate must not fall into); NULL keys are a separate check.
    fk_cust = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(
            customer.select(F.col("c_custkey").alias("k")),
            F.col("o_custkey") == F.col("k"),
            "left_anti",
        )
        .agg(F.count("*").alias("n"))
    )
    fk_order = (
        lineitem.where(F.col("l_orderkey").isNotNull())
        .join(
            orders.select(F.col("o_orderkey").alias("k")),
            F.col("l_orderkey") == F.col("k"),
            "left_anti",
        )
        .agg(F.count("*").alias("n"))
    )
    neg_price = lineitem.agg(
        F.count(F.when(F.col("l_extendedprice") < 0, 1)).alias("n")
    )
    return (
        one("orders_pk_duplicates", pk_dup)
        .unionByName(one("orders_custkey_orphans", fk_cust))
        .unionByName(one("lineitem_orderkey_orphans", fk_order))
        .unionByName(one("orders_null_orderdate", null_date))
        .unionByName(one("lineitem_negative_price", neg_price))
    )


def k_anonymity_risky_groups(
    df: DataFrame, quasi_cols: list[str], k: int = 10
) -> DataFrame:
    """Data-governance gate for training corpora: every combination of
    quasi-identifier values shared by FEWER than k rows (the groups a
    re-identification attack narrows to under k candidates — Sweeney's
    k-anonymity). Output is the risky group keys with their sizes; a
    release gate joins this back as an anti-join or suppresses the
    quasi columns for these rows.

    One aggregation shuffle on the quasi key; the k-filter reduces on
    the aggregate, so only violating groups (bounded by construction
    at sensible k) come back.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("group_size"))
        .where(F.col("group_size") < k)
    )


def key_skew_report(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Join/agg-key skew diagnostics: the top-k heaviest keys with
    exact counts and integer ppm share of total rows — the first thing
    to run before sizing a shuffle at 100 TB (a key with >1% share
    needs salting or an AQE skew split; both implemented elsewhere in
    this repo and pinned in test_scale_patterns).

    Shape: one agg shuffle on the key, a 1-row total broadcast, and a
    TakeOrderedAndProject for the global top-k. The ppm share is
    floor(cnt * 1e6 / total) — exact integer arithmetic, no float
    division in the oracle-compared columns.
    """
    counts = df.groupBy(key_col).agg(F.count("*").cast("long").alias("cnt"))
    total = df.agg(F.count("*").cast("long").alias("total"))
    top = (
        counts.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "cnt",
            F.floor(F.col("cnt") * F.lit(1_000_000) / F.col("total"))
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy(F.col("cnt").desc(), F.col(key_col))
        .limit(top_k)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col))
    return top.withColumn("rk", F.row_number().over(w).cast("long"))


def split_score_changepoints(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    top_k: int = 3,
) -> DataFrame:
    """Top-k level-shift candidates per key: the first round of binary
    segmentation (Scott & Knott) over the hourly count series, with the
    split statistic kept EXACT-integer.

    For a boundary after the i-th of n hourly buckets, the usual
    statistic is |mean_left - mean_right| (times a size weight); we rank
    by the cross-multiplied integer form

        D = | S_left * n_right  -  S_right * n_left |

    which is n_left*n_right*|mean_left - mean_right| — same argmax, no
    floats, so the ranking hash-matches any engine. Ties to the earlier
    boundary.

    Scale shape: one (key, hour) aggregation (map-side combinable),
    then ONE window pass per key for the running sums — the series per
    key is already tiny (bounded by hours of history), so the window
    partition is never a hot spot.
    """
    hourly = events.groupBy(
        F.col(key_col),
        F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
    ).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(key_col)
    scored = hourly.select(
        key_col,
        "bucket",
        F.sum("cnt").over(w).alias("s_left"),
        F.row_number().over(Window.partitionBy(key_col).orderBy("bucket")).alias("i"),
        F.sum("cnt").over(wall).alias("s_tot"),
        F.count("*").over(wall).alias("n_tot"),
    ).where(F.col("i") < F.col("n_tot"))
    d = F.abs(
        F.col("s_left") * (F.col("n_tot") - F.col("i"))
        - (F.col("s_tot") - F.col("s_left")) * F.col("i")
    )
    ranked = scored.select(
        key_col,
        F.col("bucket").alias("split_after"),
        d.cast("long").alias("split_score"),
        F.col("i").cast("long").alias("n_left"),
        (F.col("n_tot") - F.col("i")).cast("long").alias("n_right"),
    ).withColumn(
        "rk",
        F.row_number()
        .over(
            Window.partitionBy(key_col).orderBy(
                F.col("split_score").desc(), "split_after"
            )
        )
        .cast("long"),
    )
    return ranked.where(F.col("rk") <= top_k)


def recency_weighted_daily_activity(
    events: DataFrame, key_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Per (key, day): the alpha=1/2 exponentially-recency-weighted
    hourly activity, kept exact by reporting the 2^23-scaled EWMA
    numerator  sum_h cnt_h * 2^h  (h = hour of day) — later hours
    dominate, and the score is a plain BIGINT sum, so per-partition
    partials merge exactly and the value hash-matches any engine.
    One aggregation, map-side combinable; no window, no floats."""
    day = F.date_trunc("day", F.col(ts_col))
    # shiftleft's Python wrapper takes a literal int shift; the SQL
    # form accepts an expression, and 1L << h stays exact in BIGINT
    weight = F.expr(f"shiftleft(CAST(1 AS BIGINT), hour({ts_col}))")
    return events.groupBy(
        F.col(key_col), day.alias("day")
    ).agg(
        F.sum(weight).cast("long").alias("recency_score"),
        F.count("*").cast("long").alias("n_events"),
    )


def survival_table(
    events: DataFrame, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """Kaplan-Meier risk table over user lifetimes: one row per
    distinct churn day with (n_at_risk, n_churned). A user's lifetime
    ends on their LAST active day (right-censoring-free fixture form);
    n_at_risk(t) counts users whose last day >= t.

    The float KM product survival estimate is deliberately NOT emitted:
    the (d_i, n_i) table is the exact, mergeable, engine-portable core
    — any client can fold Π(1 - d_i/n_i) locally. Shape: one per-user
    max aggregation, one per-day count, one running-sum window over the
    (bounded) distinct-days relation."""
    last_day = events.groupBy(user_col).agg(
        F.date_trunc("day", F.max(ts_col)).alias("churn_day")
    )
    per_day = last_day.groupBy("churn_day").agg(
        F.count("*").cast("long").alias("n_churned")
    )
    # at risk on day t = users whose churn day is >= t = suffix sum
    w = (
        Window.orderBy(F.col("churn_day").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_day.select(
        "churn_day",
        "n_churned",
        F.sum("n_churned").over(w).cast("long").alias("n_at_risk"),
    )


def trend_slopes(
    events: DataFrame, key_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Least-squares trend of hourly volume per key, from EXACT integer
    sums: with x = hour index (0-based within the key) and y = count,

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)

    Sums are BIGINT-exact; the two products and the final division run
    in DOUBLE on identical integers, so the result is bit-identical on
    any IEEE engine. One hourly aggregation, one window for the hour
    index, one per-key fold."""
    hourly = events.groupBy(
        F.col(key_col), F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    ).agg(F.count("*").alias("y"))
    x = (
        F.row_number().over(Window.partitionBy(key_col).orderBy("bucket")) - 1
    ).cast("long")
    sums = (
        hourly.withColumn("x", x)
        .groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    # single-bucket keys (n == 1) have zero x-variance: slope is NULL,
    # not a DIVIDE_BY_ZERO crash under ANSI mode
    den = F.nullif(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
        F.lit(0.0),
    )
    return sums.select(
        key_col,
        "n",
        (num / den).alias("slope_per_hour"),
        (
            (F.col("sy").cast("double") - (num / den) * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept"),
    )


def hourly_filled(
    events: DataFrame, key_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Per-key hourly counts over a gap-filled spine from each key's
    first to last observed hour (columns k, h, c) — the shared input
    shape for sequential-scan monitors (EWMA, CUSUM). One (key, hour)
    agg shuffle; spine row generation is map-side sequence+explode,
    bounded by the observed per-key time range."""
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = events.groupBy(
        F.col(key_col).alias("k"), hour.alias("h")
    ).agg(F.count("*").alias("c"))
    spine = (
        hourly.groupBy("k")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "k",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    return spine.join(hourly, ["k", "h"], "left").select(
        "k", "h", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )


def ewma_series(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    num_ppm: int = 1,
    den: int = 4,
) -> DataFrame:
    """Per-key hourly EWMA over a gap-filled series, in pure integer
    ppm arithmetic: e_1 = x_1 * 1e6; e_t = (x_t * 1e6 * num +
    (den - num) * e_{t-1}) DIV den — the floor recurrence every engine
    evaluates identically, so the whole trajectory is hash-oracle-able
    (float alpha powers would drift; this never leaves int64: e_t is a
    floored convex combination, bounded by max(x) * 1e6).

    Plan: one (key, hour) count agg, per-key spine via sequence +
    explode (map-side), a left join back on (key, hour), then ONE
    applyInPandas pass per key for the scan — an EWMA is inherently
    sequential in t, so per-key linear scan IS the parallel algorithm:
    at 100 TB the parallelism axis is the key count, and per-key state
    is O(1). Arrow moves each key's series once; the pandas closure is
    self-contained (executor workers don't share the driver's path).
    """
    from pyspark.sql import types as T

    filled = hourly_filled(events, key_col, ts_col)
    out_schema = T.StructType(
        [
            filled.schema["k"],
            filled.schema["h"],
            T.StructField("c", T.LongType()),
            T.StructField("e", T.LongType()),
        ]
    )

    def scan(pdf):
        import pandas as pd  # self-contained: executors don't share sys.path

        pdf = pdf.sort_values("h", ignore_index=True)
        e, out = None, []
        for x in pdf["c"]:
            x = int(x)
            e = x * 1000000 if e is None else (
                (x * 1000000 * num_ppm + (den - num_ppm) * e) // den
            )
            out.append(e)
        return pd.DataFrame(
            {"k": pdf["k"], "h": pdf["h"], "c": pdf["c"], "e": out}
        )

    return filled.groupBy("k").applyInPandas(scan, out_schema)


def cusum_series(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    slack: int = 1,
    threshold: int = 5,
) -> DataFrame:
    """One-sided CUSUM drift monitor per key over the gap-filled
    hourly series: S_t = max(0, S_{t-1} + x_t - mu - slack) with mu
    the key's floor-mean hourly rate, returning the ALERT rows
    (S_t >= threshold) with their running statistic — Page's
    cumulative-sum test, the standard upward-shift detector next to
    the EWMA baseline.

    All arithmetic is int64 (floor-mean, integer slack), so the scan
    is engine-exact. Same scale shape as ``ewma_series``: declarative
    counting/spine, baseline as one more bounded aggregate joined
    back, and the inherently sequential scan as one Arrow pass per key
    with O(1) state, parallel across keys.
    """
    from pyspark.sql import types as T

    filled = hourly_filled(events, key_col, ts_col)
    base = filled.groupBy("k").agg(
        F.expr("sum(c) DIV count(*)").alias("mu")
    )
    withmu = filled.join(base, "k")
    out_schema = T.StructType(
        [
            withmu.schema["k"],
            withmu.schema["h"],
            T.StructField("c", T.LongType()),
            T.StructField("s", T.LongType()),
        ]
    )

    def scan(pdf):
        import pandas as pd  # self-contained: executors don't share sys.path

        pdf = pdf.sort_values("h", ignore_index=True)
        s, out = 0, []
        for x, mu in zip(pdf["c"], pdf["mu"]):
            s = max(0, s + int(x) - int(mu) - slack)
            out.append(s)
        res = pd.DataFrame(
            {"k": pdf["k"], "h": pdf["h"], "c": pdf["c"], "s": out}
        )
        return res[res["s"] >= threshold]

    return withmu.groupBy("k").applyInPandas(scan, out_schema)


def holt_series(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Holt double-exponential smoothing per key over the gap-filled
    hourly series (alpha = beta = 1/4), in pure int64 ppm arithmetic:

        l_t = (x_t*1e6 + 3*(l_{t-1} + b_{t-1})) DIV 4
        b_t = ((l_t - l_{t-1}) + 3*b_{t-1}) DIV 4

    with l_1 = x_1*1e6, b_1 = 0. The trend term goes NEGATIVE, so the
    division must truncate toward zero on BOTH engines — Spark DIV and
    DuckDB // both do on BIGINT (verified; floor-emulation is the
    cross-engine trap). Same scale shape as ``ewma_series``: counting
    and spine declarative, the two-state scan one Arrow pass per key.
    """
    from pyspark.sql import types as T

    filled = hourly_filled(events, key_col, ts_col)
    out_schema = T.StructType(
        [
            filled.schema["k"],
            filled.schema["h"],
            T.StructField("c", T.LongType()),
            T.StructField("l", T.LongType()),
            T.StructField("b", T.LongType()),
        ]
    )

    def scan(pdf):
        # SELF-CONTAINED closure (executors don't share the driver's
        # sys.path): imports and helpers live inside.
        import pandas as pd

        def tdiv(a, b):
            # truncate toward zero (C/SQL semantics) — Python // floors,
            # which differs on the negative trend term
            q = abs(a) // b
            return q if a >= 0 else -q

        pdf = pdf.sort_values("h", ignore_index=True)
        lev, tr, levs, trs = None, 0, [], []
        for x in pdf["c"]:
            x = int(x)
            if lev is None:
                lev, tr = x * 1000000, 0
            else:
                prev = lev
                lev = tdiv(x * 1000000 + 3 * (lev + tr), 4)
                tr = tdiv((lev - prev) + 3 * tr, 4)
            levs.append(lev)
            trs.append(tr)
        return pd.DataFrame(
            {"k": pdf["k"], "h": pdf["h"], "c": pdf["c"], "l": levs, "b": trs}
        )

    return filled.groupBy("k").applyInPandas(scan, out_schema)


def holt_winters_series(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    period: int = 4,
    bucket_ms: int = 21600000,
) -> DataFrame:
    """Holt-Winters additive triple-exponential smoothing per key over
    gap-filled 6-hour buckets (alpha = beta = gamma = 1/4, seasonal
    period ``period``), in pure int64 ppm arithmetic:

        l_t = (x_t*1e6 - s_{t-m} + 3*(l_{t-1} + b_{t-1})) DIV 4
        b_t = ((l_t - l_{t-1}) + 3*b_{t-1}) DIV 4
        s_t = ((x_t*1e6 - l_t) + 3*s_{t-m}) DIV 4

    with l_1 = x_1*1e6, b_1 = 0 and the first seasonal cycle seeded to
    zero — a deterministic fold both engines replay bit-identically
    (all divisions truncate toward zero: Spark DIV == DuckDB //; the
    trend and seasonal terms go negative). One-step forecast =
    l_t + b_t + s_{t+1-m}.

    Scale shape (same as ``holt_series``): bucket counting and the
    spine are declarative (one agg shuffle + map-side sequence
    explode); the O(period)-state scan is one Arrow pass per key,
    parallel across keys; series length is O(time span), never
    O(rows).
    """
    from pyspark.sql import types as T

    bucketed = events.groupBy(
        F.col(key_col).alias("k"),
        F.expr(f"unix_millis({ts_col}) DIV {bucket_ms}").alias("t"),
    ).agg(F.count("*").alias("c"))
    spine = (
        bucketed.groupBy("k")
        .agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
        .select("k", F.explode(F.sequence("lo", "hi")).alias("t"))
    )
    filled = spine.join(bucketed, ["k", "t"], "left").select(
        "k", "t", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    out_schema = T.StructType(
        [
            filled.schema["k"],
            T.StructField("t", T.LongType()),
            T.StructField("c", T.LongType()),
            T.StructField("l", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("s", T.LongType()),
            T.StructField("f", T.LongType()),
        ]
    )
    m = period

    def scan(pdf):
        # SELF-CONTAINED closure (executors don't share the driver's
        # sys.path): imports and helpers live inside.
        import pandas as pd

        def tdiv(a, b):
            q = abs(a) // b
            return q if a >= 0 else -q

        pdf = pdf.sort_values("t", ignore_index=True)
        lev, tr, seas = None, 0, [0] * m
        ls, bs, ss, fs = [], [], [], []
        for x in pdf["c"]:
            x = int(x)
            if lev is None:
                lev, tr, snew = x * 1000000, 0, 0
            else:
                sp = seas.pop(0)
                prev = lev
                lev = tdiv(x * 1000000 - sp + 3 * (lev + tr), 4)
                tr = tdiv((lev - prev) + 3 * tr, 4)
                snew = tdiv((x * 1000000 - lev) + 3 * sp, 4)
                seas.append(snew)
            ls.append(lev)
            bs.append(tr)
            ss.append(snew)
            fs.append(lev + tr + seas[0])
        return pd.DataFrame(
            {
                "k": pdf["k"],
                "t": pdf["t"],
                "c": pdf["c"],
                "l": ls,
                "b": bs,
                "s": ss,
                "f": fs,
            }
        )

    return filled.groupBy("k").applyInPandas(scan, out_schema)
