"""Round-8/9 query registrations — consumers of trained artifacts:

- ``bpe_encode_report``: the ENCODE pass — the merge table learned by
  the BPE trainer applied back over the documents corpus, rolled up
  per language (docs, words, chars before, tokens after, merge
  applications, exact milli-tokens-per-doc). Declared at depth 8 —
  the trainer's PROVEN depth (test_bpe_trainer_depth8_matches_python),
  not the 3-step trajectory the bpe_train_steps query happens to
  display (VERDICT r8 #3): the query a pipeline runs to actually
  tokenize must exercise the whole trained table, including
  merges-of-merges. Its oracle replays the identical depth-8
  sentinel-replace chain (queries_r6._bpe_ctes(8)) so the learned
  table and its application are hash-pinned end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.queries_r6 import _bpe_ctes
from goeventstream_spark.sources import load_table

ENCODE_STEPS = 8

_MT = ", ".join(f"max(p{i}) AS p{i}" for i in range(1, ENCODE_STEPS + 1))
_FW_FILT = "\n             AND ".join(
    f"strpos(word, chr({i})) = 0" for i in range(1, ENCODE_STEPS + 1)
)
_ENC = "word"
for _i in range(1, ENCODE_STEPS + 1):
    _ENC = f"replace({_ENC}, p{_i}, chr({_i}))"


@query(
    "bpe_encode_report",
    f"""
    WITH {_bpe_ctes(ENCODE_STEPS)},
    mt AS (SELECT {_MT} FROM v{ENCODE_STEPS}),
    dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
    fw AS (SELECT doc_id, word FROM dw
           WHERE word <> '' AND {_FW_FILT}),
    enc AS (SELECT doc_id, length(word) AS nc,
                   length({_ENC}) AS nt
            FROM fw, mt),
    pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                  CAST(sum(nc) AS BIGINT) AS chars,
                  CAST(sum(nt) AS BIGINT) AS tokens
           FROM enc GROUP BY doc_id)
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(p.n_words), 0) AS BIGINT) AS n_words,
           CAST(coalesce(sum(p.chars), 0) AS BIGINT) AS chars_before,
           CAST(coalesce(sum(p.tokens), 0) AS BIGINT) AS tokens_after,
           CAST(coalesce(sum(p.chars), 0) - coalesce(sum(p.tokens), 0)
                AS BIGINT) AS merges_applied,
           CAST((CAST(1000 AS HUGEINT) * coalesce(sum(p.tokens), 0))
                // count(*) AS BIGINT) AS tokens_per_doc_milli
    FROM documents d LEFT JOIN pd p USING (doc_id)
    GROUP BY d.lang
    """,
)
def q_bpe_encode_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with the trained BPE table
    (text.bpe_encode_corpus over the trainer's merges at its proven
    depth 8): per language, document/word counts, characters before
    encoding, tokens after all 8 learned merges, total merge
    applications, and exact integer milli-tokens-per-document. Both
    engines learn the table AND apply it inside the query (the same
    sentinel-replace chain the trainer pins, now through
    merges-of-merges — step >= 4 on the fixture merges earlier
    sentinels), so a drift in either half breaks the hash. The 1000x
    ratio multiply uses the 128-bit pattern (DECIMAL(38,0) / HUGEINT)
    — the dup_ppm overflow discipline."""
    docs = load_table(spark, sf_dir, "documents")
    from goeventstream_spark.operators.text import bpe_encode_corpus

    per_doc = bpe_encode_corpus(docs, steps=ENCODE_STEPS)
    return (
        docs.select("doc_id", "lang")
        .join(per_doc, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_words"), F.lit(0)).cast("long").alias("n_words"),
            F.coalesce(F.sum("chars_before"), F.lit(0))
            .cast("long")
            .alias("chars_before"),
            F.coalesce(F.sum("tokens_after"), F.lit(0))
            .cast("long")
            .alias("tokens_after"),
            (
                F.coalesce(F.sum("chars_before"), F.lit(0))
                - F.coalesce(F.sum("tokens_after"), F.lit(0))
            )
            .cast("long")
            .alias("merges_applied"),
            F.expr(
                "(CAST(1000 AS DECIMAL(38,0)) * coalesce(sum(tokens_after), 0))"
                " div count(*)"
            )
            .cast("long")
            .alias("tokens_per_doc_milli"),
        )
    )
