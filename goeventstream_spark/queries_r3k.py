"""Round-3 batch K: per-segment Kaplan-Meier survival (the keyed
generalization of ``kaplan_meier_sessions`` — one independent integer
product fold per segment, parallel across keys) and ratio-to-parent
revenue shares over the region -> nation hierarchy.

Reference parity note: the reference (GoEventStream) has no analytics
surface — these are SURVEY.md §2b group-2 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


@query(
    "kaplan_meier_by_entry_type",
    """
    WITH RECURSIVE s AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_id
      FROM (
        SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 3600000
                       THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
    ),
    hi AS (SELECT CAST(max(epoch_ms(ts)) AS BIGINT) AS hi FROM events),
    sess AS (
      SELECT first(event_type ORDER BY ts, event_id) AS k,
             (max(epoch_ms(ts)) - min(epoch_ms(ts))) // 1000 AS dur_s,
             CASE WHEN max(epoch_ms(ts)) >= (SELECT hi FROM hi) - 3600000
                  THEN 1 ELSE 0 END AS censored
      FROM s GROUP BY user_id, session_id
    ),
    g AS (
      SELECT k, dur_s,
             CAST(sum(1 - censored) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS removed
      FROM sess GROUP BY k, dur_s
    ),
    tot AS (SELECT k, CAST(count(*) AS BIGINT) AS total FROM sess GROUP BY k),
    tab AS (
      SELECT g.k, dur_s, d,
             tot.total
               - coalesce(sum(removed) OVER (PARTITION BY g.k ORDER BY dur_s
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING), 0) AS n
      FROM g JOIN tot ON g.k = tot.k
    ),
    ev AS (SELECT k, dur_s, d, n,
                  row_number() OVER (PARTITION BY k ORDER BY dur_s) AS ern
           FROM tab WHERE d > 0),
    km AS (
      SELECT k, dur_s, d, n, ern, (1000000 * (n - d)) // n AS surv
      FROM ev WHERE ern = 1
      UNION ALL
      SELECT e.k, e.dur_s, e.d, e.n, e.ern, (km.surv * (e.n - e.d)) // e.n
      FROM km JOIN ev e ON e.k = km.k AND e.ern = km.ern + 1
    )
    SELECT k AS entry_type, dur_s, CAST(n AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS d_events, CAST(surv AS BIGINT) AS surv_ppm
    FROM km
    """,
)
def q_kaplan_meier_by_entry_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Kaplan-Meier survival: sessions are segmented by
    their ENTRY event type (ties by event_id) and each segment gets
    its own right-censored survival curve — cohort-comparison survival
    ("do error-entered sessions die faster?"), the keyed
    generalization of ``kaplan_meier_sessions``.

    Scale plan: identical anatomy, but the risk-set window, the rank,
    and the integer product fold are all PARTITIONED BY SEGMENT — the
    fold is one applyInPandas group per key, parallel across keys,
    each over its O(distinct durations) series.
    """
    from pyspark.sql import types as T

    from goeventstream_spark.operators import stream_ops as so

    ev = load_table(spark, sf_dir, "events")
    sess = (
        so.sessionize(ev, gap_s=3600)
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.struct("ts", "event_id", "event_type")).alias("first"),
            F.expr(
                "(max(unix_millis(ts)) - min(unix_millis(ts))) DIV 1000"
            ).alias("dur_s"),
            F.max(F.expr("unix_millis(ts)")).alias("end_ms"),
        )
        .select(F.col("first.event_type").alias("k"), "dur_s", "end_ms")
    )
    hi = ev.agg(F.expr("CAST(max(unix_millis(ts)) AS BIGINT)").alias("hi"))
    sess = sess.crossJoin(F.broadcast(hi)).select(
        "k",
        "dur_s",
        F.when(F.col("end_ms") >= F.col("hi") - 3600000, 1)
        .otherwise(0)
        .alias("censored"),
    )
    g = sess.groupBy("k", "dur_s").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("d"),
        F.count("*").cast("long").alias("removed"),
    )
    tot = sess.groupBy("k").agg(F.count("*").cast("long").alias("total"))
    w_prev = (
        Window.partitionBy("k")
        .orderBy("dur_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tab = (
        g.join(F.broadcast(tot), "k")
        .withColumn(
            "n",
            F.col("total") - F.coalesce(F.sum("removed").over(w_prev), F.lit(0)),
        )
        .where(F.col("d") > 0)
        .select("k", "dur_s", "d", "n")
    )
    out_schema = T.StructType(
        [
            T.StructField("entry_type", T.StringType()),
            T.StructField("dur_s", T.LongType()),
            T.StructField("n_at_risk", T.LongType()),
            T.StructField("d_events", T.LongType()),
            T.StructField("surv_ppm", T.LongType()),
        ]
    )

    def fold(pdf):
        # SELF-CONTAINED closure (executor workers don't share the
        # driver's sys.path).
        import pandas as pd

        pdf = pdf.sort_values("dur_s", ignore_index=True)
        surv, out = 1000000, []
        for n, d in zip(pdf["n"], pdf["d"]):
            surv = (surv * (int(n) - int(d))) // int(n)
            out.append(surv)
        return pd.DataFrame(
            {
                "entry_type": pdf["k"],
                "dur_s": pdf["dur_s"],
                "n_at_risk": pdf["n"],
                "d_events": pdf["d"],
                "surv_ppm": out,
            }
        )

    return tab.groupBy("k").applyInPandas(fold, out_schema)


@query(
    "revenue_share_hierarchy",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ),
    reg AS (SELECT region, CAST(sum(cents) AS BIGINT) AS r_cents
            FROM rev GROUP BY 1),
    gtot AS (SELECT CAST(sum(cents) AS BIGINT) AS g_cents FROM rev)
    SELECT rev.region, rev.nation, rev.cents,
           CAST(1000000 * rev.cents // reg.r_cents AS BIGINT)
             AS share_of_region_ppm,
           CAST(1000000 * reg.r_cents // gtot.g_cents AS BIGINT)
             AS region_share_of_total_ppm
    FROM rev JOIN reg ON rev.region = reg.region CROSS JOIN gtot
    """,
)
def q_revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent rollup over the region -> nation hierarchy:
    each nation's exact ppm share of its region's revenue, and each
    region's share of the global total — the OLAP "percent of parent"
    readout, all integer cents and ppm floors.

    Scale plan: one star join (dims broadcast) + one (region, nation)
    agg over the fact; the region and global totals RE-AGGREGATE the
    tiny (region, nation) relation instead of rescanning the fact, and
    join back as broadcasts.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("c")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    reg_dim = load_table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    dim = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg_dim), nat.n_regionkey == reg_dim.r_regionkey)
        .select("c_custkey", "nation", "region")
    )
    # customer is the one dim that grows with the data — no forced
    # broadcast; Catalyst/AQE picks broadcast while it fits and falls
    # back to a shuffle join beyond the threshold.
    # Materialize once: rev feeds three consumers (itself, the region
    # totals, the global total) and without a checkpoint each branch
    # re-runs the whole star join (exchange reuse does not fire across
    # these shapes). The relation is |regions x nations| rows — tiny.
    rev = (
        o.join(dim, o.o_custkey == dim.c_custkey)
        .groupBy("region", "nation")
        .agg(F.sum("c").cast("long").alias("cents"))
        .localCheckpoint(eager=False)
    )
    reg = rev.groupBy("region").agg(F.sum("cents").cast("long").alias("r_cents"))
    glob = rev.agg(F.sum("cents").cast("long").alias("g_cents"))
    return (
        rev.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(glob))
        .select(
            "region",
            "nation",
            "cents",
            F.expr("CAST(1000000 * cents DIV r_cents AS BIGINT)").alias(
                "share_of_region_ppm"
            ),
            F.expr("CAST(1000000 * r_cents DIV g_cents AS BIGINT)").alias(
                "region_share_of_total_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Sample-ratio mismatch (SRM) check for the deterministic A/B split
# ---------------------------------------------------------------------------


@query(
    "srm_check",
    """
    WITH u AS (
      SELECT DISTINCT user_id, user_id % 2 AS variant FROM events
    ),
    g AS (
      SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM u
    )
    SELECT n0, n1,
           CAST(abs(n0 - n1) AS BIGINT) AS abs_diff,
           CAST(1000 * (n0 - n1) * (n0 - n1) // (n0 + n1) AS BIGINT)
             AS chi2_milli
    FROM g
    """,
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch check for the ``cuped_adjusted_lift``
    experiment's deterministic 50/50 split: per-variant distinct-user
    counts and the exact chi-square statistic against the expected
    even split — chi2 = (n0-n1)^2/(n0+n1) in milli fixed-point (the
    guardrail every experimentation platform runs before trusting a
    readout; chi2_milli > 3841 is the 5% red flag).

    Scale plan: one distinct-user agg (map-side combined) + a 1-row
    arithmetic projection.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id", (F.col("user_id") % 2).alias("variant")).distinct()
    g = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    return g.select(
        "n0",
        "n1",
        F.abs(F.col("n0") - F.col("n1")).cast("long").alias("abs_diff"),
        F.expr(
            "CAST(1000 * (n0 - n1) * (n0 - n1) DIV (n0 + n1) AS BIGINT)"
        ).alias("chi2_milli"),
    )
