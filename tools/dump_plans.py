"""Dump formatted physical plans for the flagship queries (the raw
material of PLANS.md). Usage: python tools/dump_plans.py [sf_dir]."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import goeventstream_spark.queries_llm  # noqa: F401
import goeventstream_spark.queries_ext  # noqa: F401
import goeventstream_spark.queries_r2  # noqa: F401
import goeventstream_spark.queries_r3  # noqa: F401
import goeventstream_spark.queries_r3b  # noqa: F401
import goeventstream_spark.queries_r3c  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3d  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3e  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3f  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3g  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3h  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3i  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3j  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3k  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3l  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3m  # noqa: F401  (registers into q.QUERIES)
from goeventstream_spark import queries as q
from goeventstream_spark.session import get_spark

FLAGSHIPS = [
    "tpch_q1_pricing_summary",
    "revenue_by_region",
    "minhash_near_dedup",
    "heavy_hitter_words",
    "hybrid_rrf_search",
    "delta_scan",
    "top_orders_per_priority",
    "er_golden_parts",
    "rfm_segments",
    "bootstrap_revenue_ci",
    "bigram_lm_fluency_topk",
    "cep_clean_conversions",
    "rolling_active_users_7d",
    "bloom_filter_fp_audit",
    "skyline_parts",
    "substring_dedup_runs",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in FLAGSHIPS:
        df = q.QUERIES[name](spark, sf_dir)
        print(f"===== {name} =====")
        print(df._jdf.queryExecution().explainString(mode))


if __name__ == "__main__":
    main()
