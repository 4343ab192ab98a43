"""Physical-plan introspection helpers.

The engine's scale discipline is enforced, not hoped for: tests assert
that filters reach the parquet scan (PushedFilters), projections prune
the read schema (ReadSchema), dimension joins broadcast, and co-planned
windows share one exchange. At 100 TB these plan properties ARE the
difference between minutes and days; pinning them in tests keeps later
refactors honest.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    try:
        jvm = df.sparkSession._jvm
        return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    plan = formatted_plan(df)
    # Non-greedy to end-of-line-or-ReadSchema: a nested bracket (e.g.
    # In(k, [1,2,3])) must not truncate the capture at its inner ']'.
    return re.findall(r"PushedFilters: \[(.*?)\](?:,\s*(?:ReadSchema|PartitionFilters)|\s*$)", plan, re.M)


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema strings of every scan (column-pruning evidence)."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of DISTINCT shuffle exchanges (excludes broadcast
    exchanges; a ReusedExchange line embeds the referenced exchange's
    description, so those lines are excluded first — counting them
    would double-count every exchange Catalyst deduplicates)."""
    plan = physical_plan(df)
    real = [
        ln for ln in plan.splitlines() if "ReusedExchange" not in ln
    ]
    return len(re.findall(r"Exchange (?:hash|range|Single)", "\n".join(real)))
