"""Round-4 query registrations.

PII redaction declared as an oracled query: the fixture corpus is
synthetic word soup with no PII-shaped strings, so redacting it would
be a vacuous (always-zero) check. Instead the query synthesizes
deterministic PII-shaped text from customer keys INSIDE the query —
email, +1-555 phone, dotted-quad IP per row — and runs the production
``text.pii_redact`` regexp chain over it; DuckDB replays the identical
synthesis and RE2-compatible patterns, so the rebuilt redacted text and
per-kind counts are hash-exact. (Patterns are deliberately
RE2-compatible — no backrefs/lookahead — per text.PII_PATTERNS.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table

# one fixed synthesis per customer key: 'reach me at user<k>@example.com
# or +1-555-<k%1000:03d>-<k%10000:04d> from 10.<k%256>.<k*7%256>.<k*13%256> ok'
_SYNTH_SQL = (
    "'reach me at user' || c_custkey || '@example.com or +1-555-' || "
    "lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' || "
    "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ' from 10.' || "
    "CAST(c_custkey % 256 AS VARCHAR) || '.' || "
    "CAST((c_custkey * 7) % 256 AS VARCHAR) || '.' || "
    "CAST((c_custkey * 13) % 256 AS VARCHAR) || ' ok'"
)

_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE = (
    "\\+?[0-9]{1,3}[- .]?\\(?[0-9]{3}\\)?[- .]?[0-9]{3}[- .]?[0-9]{4}"
)
_IPV4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"


def _redact_cte(kind: str, pat: str, src: str) -> str:
    """One redaction step: count matches (split-length minus one, the
    same counting identity pii_redact uses), then replace."""
    return (
        f"SELECT doc_id, len(regexp_split_to_array(t, '{pat}')) - 1 AS n_{kind},"
        f" regexp_replace(t, '{pat}', '[{kind.upper()}]', 'g') AS t FROM {src}"
    )


@query(
    "pii_redaction_report",
    f"""
    WITH synth AS (
      SELECT c_custkey AS doc_id, {_SYNTH_SQL} AS t
      FROM customer
    ),
    s1 AS ({_redact_cte("email", _EMAIL, "synth")}),
    s2 AS ({_redact_cte("phone", _PHONE, "s1")}),
    s3 AS ({_redact_cte("ipv4", _IPV4, "s2")})
    SELECT s3.doc_id, s3.t AS redacted_text,
           CAST(s1.n_email AS BIGINT) AS n_email,
           CAST(s2.n_phone AS BIGINT) AS n_phone,
           CAST(s3.n_ipv4 AS BIGINT) AS n_ipv4
    FROM s3 JOIN s2 ON s3.doc_id = s2.doc_id JOIN s1 ON s3.doc_id = s1.doc_id
    """,
)
def q_pii_redaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing as a declared, hash-oracled query
    (text.pii_redact): email / +1-555 phone / dotted-quad IP synthesized
    deterministically per customer key, redacted by the production
    regexp_replace chain (pure map pass, no shuffle), with per-kind
    match counts. The rebuilt redacted text itself is part of the hash
    gate, not just the counts."""
    from goeventstream_spark.operators import text

    cust = load_table(spark, sf_dir, "customer")
    synth = cust.select(
        F.col("c_custkey").alias("doc_id"),
        F.expr(
            "concat('reach me at user', c_custkey, '@example.com or +1-555-',"
            " lpad(CAST(c_custkey % 1000 AS STRING), 3, '0'), '-',"
            " lpad(CAST(c_custkey % 10000 AS STRING), 4, '0'), ' from 10.',"
            " CAST(c_custkey % 256 AS STRING), '.',"
            " CAST((c_custkey * 7) % 256 AS STRING), '.',"
            " CAST((c_custkey * 13) % 256 AS STRING), ' ok')"
        ).alias("text"),
    )
    return text.pii_redact(synth).select(
        "doc_id", "redacted_text", "n_email", "n_phone", "n_ipv4"
    )
